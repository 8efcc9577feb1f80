"""True multi-process (multi-host) matching: the DCN forms of the pipeline.

Three tiers live here (docs/architecture.md "Multi-host status"):

* the REPLICATED production tier (:func:`multihost_fit_pairs`; the
  engine's default below ``SG_TPU_MH_SHARDED_ROWS``): SPMD over
  processes -- same engine call, same full inputs everywhere; encode
  shards per process, the exact blocks + byte payload allgather once,
  each process runs the complete single-controller matcher on its
  left-row slice, and one packed collective gathers the results, so
  every process returns the identical full output.  The hot loop crosses
  no process boundary.
* the SHARDED production tier (:func:`multihost_sharded_fit_pairs`;
  ``multihost="sharded"`` or auto above the threshold): the
  memory-scalable form -- no process materializes the full corpus
  ELL/payload; phase 1 runs over a globally sharded device hash matrix
  and exact rescoring visits remote right shards over a broadcast ring
  (~1/n_processes host memory per process).
* the shard-local DEMONSTRATION tier (:func:`multihost_encode_shard` +
  :func:`multihost_match_shard`), described below: the self-join-only
  pipeline the sharded tier grew from, kept as its minimal exercised
  form.

Every function runs under ``jax.distributed`` multi-controller SPMD with a
global device mesh spanning all processes -- exercised by
tests/test_multihost.py on real CPU processes with gloo collectives, and
shaped so a TPU pod slice (ICI within hosts, DCN across) runs the same
program.

Cross-host traffic, by stage (nothing else leaves a host):

  1. key-packing width: one scalar max (``process_allgather``).
  2. vocabulary: union of per-shard sorted unique key sets (vocab-sized).
  3. document frequency: one |vocab|-int vector per host, allgathered
     and summed on host.  IDF replicates.
  4. hashed projections: each host's shard of the bf16 hash matrix forms a
     globally-sharded device array (``make_array_from_process_local_data``)
     -- the phase-1 matmul reads it over the interconnect, not the host.
  5. exact ELL blocks: one corpus-sized allgather so every host can score
     ITS OWN left rows' candidates exactly (one bulk pass beats
     per-candidate fetches; the reference's exact values are the corpus
     encode itself).
  6. candidate ids: the per-shard top-k ``all_gather`` merge inside the
     mesh program (the reference's ``zip_sp_matmul_topn`` collective form).

Selection and output assembly stay per-host for the left rows that host
owns.
"""

from __future__ import annotations

import os
import time
from dataclasses import replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import StringGrouperConfig
from ..corpus.tfidf import (
    DeviceEncodeSrc,
    EllMatrix,
    _ell_from_unique_pairs,
    device_tables_from_vocab,
)
from ..ops.matcher import (
    MatchPairs,
    _pairs_from_ship,
    _select_topn,
    apply_self_join_fixups,
    build_hash_matrix,
    duplicate_codes,
    effective_threshold,
    initial_cand_c,
    initial_k_tile,
    match_block,
    topn_cosine_matches,
)
from ..ops.rescore import rescore_pairs_fp64

__all__ = [
    "multihost_encode_shard",
    "multihost_match_shard",
    "multihost_fit_pairs",
    "multihost_sharded_fit_pairs",
]


def _allgather_host(x: np.ndarray):
    """Host-value allgather across processes (rides a device collective).

    Transports RAW BYTES: without ``jax_enable_x64`` a jax round-trip would
    silently truncate uint64 vocabulary keys and float64 exact values to
    32 bits.  Returns shape ``(nproc, *x.shape)`` in x's dtype."""
    from jax.experimental import multihost_utils as mhu

    x = np.ascontiguousarray(x)
    raw = x.reshape(-1).view(np.uint8)
    g = np.asarray(mhu.process_allgather(raw, tiled=False))
    return np.stack(
        [g[p].view(x.dtype).reshape(x.shape) for p in range(g.shape[0])]
    )


def _broadcast_host_from(x: np.ndarray, source: int) -> np.ndarray:
    """Host-value broadcast from process ``source`` to all processes
    (rides a device collective).  Same raw-byte transport as
    :func:`_allgather_host`; every process must pass an array of the SAME
    shape/dtype (contents are read only on the source).  Unlike an
    allgather, the received buffer is one block -- O(shape), not
    O(nproc x shape) -- which is what lets the sharded tier visit remote
    ELL shards one at a time instead of materializing them all."""
    from jax.experimental import multihost_utils as mhu

    x = np.ascontiguousarray(x)
    raw = x.reshape(-1).view(np.uint8)
    out = np.asarray(
        mhu.broadcast_one_to_all(
            raw, is_source=jax.process_index() == source
        )
    )
    return out.view(x.dtype).reshape(x.shape)


def multihost_encode_shard(
    shard_strings, config: StringGrouperConfig
) -> Tuple[EllMatrix, np.ndarray, int]:
    """Shard-local encode under multi-controller SPMD.

    Consumes ONLY this process's strings; agrees globally on the packing
    width, the vocabulary, and the document frequencies (stages 1-3 of the
    module docstring).  Returns (local ELL block over the GLOBAL
    vocabulary, float64 IDF, global doc count) -- bitwise identical to the
    corresponding rows of a single-process fit over the concatenated
    corpus (tests/test_multihost.py).
    """
    from ..corpus.ngrams import (
        extract_packed_keys,
        extract_windows,
        packed_key_bits,
        windows_as_sortable_keys,
    )
    from ..corpus.preprocess import clean_corpus
    from ..corpus.tfidf import _EMPTY_VOCAB_MSG, _unique_row_term_counts

    corpus = clean_corpus(list(shard_strings), config)

    # 1. Global key-packing width: one scalar max across hosts.
    maxcp_local = np.array([int(corpus.buf.max(initial=0))], dtype=np.int64)
    maxcp = int(_allgather_host(maxcp_local).max())
    bits0 = packed_key_bits(maxcp)
    if bits0 * config.ngram_size > 64:
        bits0 = None

    if bits0 is not None:
        keys, row_ids, n_rows, _ = extract_packed_keys(
            corpus, config.ngram_size, bits0
        )
        key_dtype = np.dtype(np.uint64)
    else:
        # Byte-key fallback: n-grams wider than 64 bits travel as opaque
        # big-endian fixed-width byte keys (void dtype), whose byte-wise
        # comparison order equals sklearn's sorted-vocabulary order.  The
        # global maxcp agreement above guarantees every process takes the
        # SAME branch (bits0 is a function of the global max codepoint).
        win = extract_windows(corpus, config.ngram_size)
        keys, row_ids, n_rows = (
            windows_as_sortable_keys(win.windows), win.row_ids, win.n_rows
        )
        # Derive the wire dtype from the data: if the key layout inside
        # windows_as_sortable_keys ever changed width, a hardcoded itemsize
        # would silently reinterpret the allgathered bytes.
        key_dtype = keys.dtype if len(keys) else np.dtype(
            (np.void, 4 * config.ngram_size)
        )
        if key_dtype.itemsize != 4 * config.ngram_size:
            raise AssertionError(
                f"window key dtype {key_dtype} does not match the 4-bytes-"
                f"per-codepoint layout for ngram_size={config.ngram_size}"
            )

    # 2. Vocabulary union: per-shard sorted unique key sets, padded to the
    # global max length for the allgather.  Keys ride as raw bytes so one
    # path serves uint64 packed keys and void byte keys, and each shard's
    # gathered block is sliced by its exact count -- no sentinel value, so
    # no key pattern is ever reserved (an all-0xFF packed key is real: an
    # 8-gram of codepoint 255 at 8 bits/codepoint).  Traffic: the pad-to-max
    # gather ships max_loc * itemsize * nproc bytes, so heavily skewed
    # shards transfer mostly zero padding; at pod scale a ragged exchange
    # (allgather counts, then per-shard variable-size sends) would shave
    # that, but vocabularies are ~1e5 keys -- megabytes, not gigabytes.
    local_vocab = (
        np.unique(keys) if len(keys) else np.zeros(0, dtype=key_dtype)
    )
    itemsize = key_dtype.itemsize
    counts_v = _allgather_host(
        np.array([len(local_vocab)], dtype=np.int64)
    ).reshape(-1)
    max_loc = int(counts_v.max())
    if max_loc == 0:
        raise ValueError(_EMPTY_VOCAB_MSG)
    padded = np.zeros((max_loc, itemsize), dtype=np.uint8)
    if len(local_vocab):
        padded[: len(local_vocab)] = (
            np.ascontiguousarray(local_vocab)
            .view(np.uint8)
            .reshape(len(local_vocab), itemsize)
        )
    g = _allgather_host(padded)  # (nproc, max_loc, itemsize)
    gathered_keys = (
        np.ascontiguousarray(
            np.concatenate([g[p, : counts_v[p]] for p in range(g.shape[0])])
        )
        .view(key_dtype)
        .reshape(-1)
    )
    vocab = np.unique(gathered_keys)
    n_terms = len(vocab)

    # 3. Document frequency: per-shard partials allgathered and summed on
    # host (one |vocab|-sized exchange), IDF replicated.
    t_idx = np.searchsorted(vocab, keys)
    rows, terms, tf = _unique_row_term_counts(row_ids, t_idx, n_terms)
    df_local = np.bincount(terms, minlength=n_terms).astype(np.int64)
    df = _allgather_host(df_local).sum(axis=0)
    n_docs_local = np.array([n_rows], dtype=np.int64)
    n_docs = int(_allgather_host(n_docs_local).sum())

    # 4. Shard-local values/norms/ELL over the global vocabulary.  The
    # float32 branch reproduces the single-process encoder's sklearn
    # rounding chain (corpus/tfidf.py _encode / fit_transform f32 paths)
    # with the GLOBAL df / doc count, so shard blocks concatenate bitwise
    # equal to a full local f32 encode -- both chains are row-local given
    # (idf, tf).
    f32 = np.dtype(config.tfidf_matrix_dtype) == np.float32
    if f32:
        from ..corpus.tfidf import f32_idf, f32_row_values

        idf32c = f32_idf(df, n_docs)
        idf = idf32c.astype(np.float64)
        vals, inv = f32_row_values(rows, terms, tf, idf32c, n_rows)
    else:
        idf = np.log((1.0 + n_docs) / (1.0 + df)) + 1.0
        w = tf.astype(np.float64) * idf[terms]
        norm_sq = np.bincount(rows, weights=w * w, minlength=n_rows)
        norm = np.sqrt(norm_sq)
        inv = np.zeros(n_rows, dtype=np.float64)
        nz = norm > 0
        inv[nz] = 1.0 / norm[nz]
        vals = w * inv[rows]
    width_local = np.array(
        [int(np.bincount(rows, minlength=n_rows).max(initial=0))], np.int64
    )
    width = max(8, -(-int(_allgather_host(width_local).max()) // 8) * 8)
    ell = _ell_from_unique_pairs(
        rows, terms, vals, n_rows, n_terms, width=width
    )

    # Byte-level device-encode payload (the wire-minimal upload pillar of
    # the single-chip path, ops/matcher.py _build_hash_from_codes): eligible
    # exactly when the vocabulary packed at 8 bits/codepoint (post-clean
    # ASCII) -- a GLOBAL property (bits0 comes from the global max
    # codepoint), so every process takes the same branch.  The tables are a
    # pure function of the agreed vocabulary, hence identical everywhere.
    if (
        bits0 == 8
        and not f32
        and os.environ.get("SG_TPU_DEVICE_ENCODE", "1") != "0"
    ):
        code_lut, table, idf32, base = device_tables_from_vocab(
            vocab.astype(np.uint64), idf, config.ngram_size
        )
        coff = corpus.offsets.astype(np.int64)
        src = DeviceEncodeSrc(
            flat_codes=code_lut[corpus.buf.astype(np.int64)],
            coff=coff,
            inv_norm=inv.astype(np.float32),
            table_id=table,
            idf32=idf32,
            base=base,
            ngram=config.ngram_size,
            row_hash=_poly_row_hash(corpus.buf, coff),
        )
        ell = replace(ell, device_src=src)
    return ell, idf, n_docs


def _poly_row_hash(buf: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit polynomial hash of each row's cleaned codepoints.

    Feeds the clean-equality duplicate collapse (ops/matcher.py
    ``_clean_refined_codes``) exactly like the native encoder's FNV-1a row
    hashes: groups are keyed by (hash, length) and byte-VERIFIED before
    use, so any well-mixing per-row hash is valid -- it only needs to be
    consistent within one payload."""
    n = len(offsets) - 1
    h = np.zeros(n, dtype=np.uint64)
    if len(buf) == 0 or n == 0:
        return h
    lens = np.diff(offsets)
    r = np.uint64(0x100000001B3)
    max_len = int(lens.max())
    pows = np.empty(max_len, dtype=np.uint64)
    pos = np.arange(len(buf), dtype=np.int64) - np.repeat(offsets[:-1], lens)
    with np.errstate(over="ignore"):
        pows[0] = np.uint64(1)
        for i in range(1, max_len):
            pows[i] = pows[i - 1] * r
        w = (buf.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) * pows[pos]
        nz = lens > 0
        # Nonzero rows' content tiles ``w`` exactly (empty rows contribute
        # no elements between them), so reduceat over their starts is the
        # per-row segment sum.
        h[nz] = np.add.reduceat(w, offsets[:-1][nz])
    return h


def multihost_match_shard(
    local_ell: EllMatrix,
    shard_row0: int,
    n_total: int,
    min_similarity: float,
    max_n_matches: int,
    *,
    hash_dim: int = 512,
    tile: int = 4096,
    cand_c0: Optional[int] = None,
):
    """Self-join matching under multi-controller SPMD: this process owns
    rows [shard_row0, shard_row0 + local_ell.n_rows) of the corpus and
    returns the EXACT top-n matches for those rows only.

    Stages 4-6 of the module docstring: local hash block -> globally
    sharded device array; phase 1 under ``shard_map`` over the global mesh
    (per-shard top-k + ``all_gather`` candidate merge); exact ELL blocks
    allgathered once; per-host fp64 rescore + selection of the owned rows.
    Rows whose drop bound could still matter escalate as ONE union
    re-match at the provably-complete width -- the union allgathers first
    so every process dispatches identical collectives.  ``cand_c0``
    overrides the initial candidate width (tests use it to force the
    escalation path).
    """
    n_local = local_ell.n_rows
    nproc = jax.process_count()
    devs = jax.devices()
    n_dev = len(devs)
    mesh = Mesh(np.array(devs).reshape(1, n_dev), ("dp", "mp"))

    # Per-device shard size (rows), padded to whole tiles.  The capacity
    # check must be COLLECTIVE: the row counts are allgathered first so an
    # oversized shard raises on EVERY process (a process-local raise would
    # leave the balanced peers hanging in the next collective).
    per_dev = -(-max(-(-n_total // n_dev), 8) // tile) * tile
    n_pad_local = per_dev * (n_dev // nproc)
    local_ell.wait_ready()
    counts = _allgather_host(np.array([n_local], np.int64)).reshape(-1)
    if int(counts.max()) > n_pad_local:
        raise ValueError(
            f"shard of {int(counts.max())} rows (process "
            f"{int(counts.argmax())}) exceeds the per-process padded "
            f"capacity {n_pad_local} (n_total={n_total}, {nproc} processes, "
            f"{n_dev} devices, tile={tile}): shards must be balanced to "
            "ceil(n_total / n_processes) rows"
        )
    h_local = build_hash_matrix(local_ell, n_pad_local, hash_dim)
    h_local = np.asarray(h_local)

    b_hash = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("mp", None)),
        h_local.reshape(n_pad_local, hash_dim),
    )

    # Exact blocks: one bulk allgather (stage 5).  Widths were agreed at
    # encode; row counts may differ per shard -- pad to the global max.
    n_max = int(counts.max())
    ids_p = np.full((n_max, local_ell.width), -1, dtype=np.int32)
    ids_p[:n_local] = local_ell.ids
    vals_p = np.zeros((n_max, local_ell.width), dtype=np.float64)
    vals_p[:n_local] = local_ell.vals64
    ids_g = _allgather_host(ids_p)
    vals_g = _allgather_host(vals_p)
    full_ids = np.concatenate([ids_g[p, : counts[p]] for p in range(nproc)])
    full_vals = np.concatenate([vals_g[p, : counts[p]] for p in range(nproc)])
    full_ell = EllMatrix(
        ids=full_ids, vals64=full_vals, n_terms=local_ell.n_terms
    )

    # Phase 1 over the global mesh: every process runs the same program on
    # the same global arrays; the left side is the (replicated) full hash
    # matrix, assembled from the same allgathered blocks.
    n_pad_all = per_dev * n_dev
    # Rebuild the replicated left hash from the exact blocks (hash is a
    # pure function of the ELL + global vocab, so this equals an allgather
    # of the per-host hash blocks without a second collective).
    a_hash = build_hash_matrix(full_ell, n_pad_all, hash_dim)
    chunk = min(8, per_dev)
    a_chunks = a_hash.reshape(-1, chunk, hash_dim)

    cand_c = cand_c0 or initial_cand_c(
        min_similarity, max_n_matches, n_total, per_dev
    )
    # Full per-tile extraction (k_tile = tile): only top-C truncation can
    # drop, so the drop bound alone drives escalation.
    thr = jnp.float32(effective_threshold(min_similarity))
    make_scan = _make_phase1_scan(mesh, tile, hash_dim)

    cols_rep, bound_rep, _tmax_rep = make_scan(cand_c, tile)(
        a_chunks, b_hash, thr
    )

    # Stage 6 onward is per-host: this process reads the rows it owns from
    # the replicated candidate matrix and scores/selects them exactly.
    rows_per_proc = counts
    proc_starts = np.concatenate(([0], np.cumsum(rows_per_proc)[:-1]))
    dev_per_proc = n_dev // nproc

    def map_cols(cols_h):
        """Padded-device-space column ids -> global corpus ids."""
        dev_of = cols_h // per_dev
        within = cols_h % per_dev
        proc_of = dev_of // dev_per_proc
        within_proc = (dev_of % dev_per_proc) * per_dev + within
        corpus_col = proc_starts[np.minimum(proc_of, nproc - 1)] + within_proc
        valid = (
            (cols_h >= 0)
            & (within_proc < rows_per_proc[np.minimum(proc_of, nproc - 1)])
        )
        return np.where(valid, corpus_col, -1)

    def score_select(cols_h, row_ids_local):
        """Exact rescore + per-row top-n for a set of OWNED rows.
        ``row_ids_local`` are shard-local row indices of cols_h's rows."""
        cols_mapped = map_cols(cols_h)
        rows_pos, cols_f = _pairs_from_ship(cols_mapped, n_total)
        rows_l = row_ids_local[rows_pos]
        sims = rescore_pairs_fp64(
            full_ell, full_ell, rows_l + shard_row0, cols_f
        )
        return _select_topn(
            rows_l, cols_f, sims, n_local, min_similarity,
            min(max_n_matches, n_total),
        )

    cols_all = np.asarray(cols_rep)
    r_s, c_s, s_s, kept_q, row_cut = score_select(
        cols_all[shard_row0 : shard_row0 + n_local],
        np.arange(n_local, dtype=np.int64),
    )

    # Escalation under multi-controller: each host detects ITS unsafe rows
    # (drop bound could qualify and beat the exact top-n cut); the sets
    # allgather so every process dispatches the IDENTICAL union re-match --
    # collectives must match across processes -- at the provably-complete
    # width (k_tile = tile extracts every qualified column per tile and
    # cand_c = per-shard row count fits them all), so one round settles
    # everything.  Each host then reads back only the rows it owns.
    from ..ops.matcher import escalation_unsafe

    bound_h = np.asarray(bound_rep)[shard_row0 : shard_row0 + n_local]
    max_n_eff = min(max_n_matches, n_total)
    unsafe = escalation_unsafe(
        bound_h, kept_q, row_cut, max(min_similarity, 0.0), max_n_eff
    )
    my_unsafe = np.flatnonzero(unsafe).astype(np.int64) + shard_row0
    n_uns = _allgather_host(np.array([len(my_unsafe)], np.int64))
    max_uns = int(n_uns.max())
    if max_uns > 0:
        pad = np.full(max_uns, -1, dtype=np.int64)
        pad[: len(my_unsafe)] = my_unsafe
        gathered = _allgather_host(pad).reshape(-1)
        union = np.unique(gathered[gathered >= 0])
        # Re-match the union rows at the complete width: all processes run
        # the same program on the same rows.
        m_p = -(-len(union) // chunk) * chunk
        sel = np.zeros(m_p, dtype=np.int64)
        sel[: len(union)] = union
        # Device-side gather: a_hash is corpus-sized (hundreds of MB at
        # scale) -- only the selected rows should ever cross to host.
        a_sub = jnp.where(
            (jnp.arange(m_p) < len(union))[:, None],
            a_hash[jnp.asarray(sel)],
            0,
        )
        esc_chunks = a_sub.reshape(-1, chunk, hash_dim)
        cols_esc, bound_esc, _te = make_scan(per_dev, tile)(
            esc_chunks, b_hash, thr
        )
        if np.isfinite(np.asarray(bound_esc)).any():
            raise AssertionError(
                "multihost escalation re-match reported a finite drop "
                "bound: the complete-width invariant is broken"
            )
        cols_esc = np.asarray(cols_esc)[: len(union)]
        mine = (union >= shard_row0) & (union < shard_row0 + n_local)
        if mine.any():
            r2, c2, s2, kq2, rc2 = score_select(
                cols_esc[mine], union[mine] - shard_row0
            )
            touched = np.zeros(n_local, dtype=bool)
            touched[union[mine] - shard_row0] = True
            keep = ~touched[r_s]
            r_s = np.concatenate([r_s[keep], r2])
            c_s = np.concatenate([c_s[keep], c2])
            s_s = np.concatenate([s_s[keep], s2])
    return r_s + shard_row0, c_s, s_s


# ===========================================================================
# Sharded production tier: the memory-scalable engine form.
#
# The replicated tier below allgathers the full corpus ELL (+ payload) to
# every process -- O(corpus) host memory per host, which caps the corpus at
# what ONE host holds (the reference hits the same wall and answers with
# n_blocks, /root/reference/docs/performance.md:71-79).  This tier keeps the
# demonstration tier's layout (per-process string shards, globally sharded
# device hash matrix) and replaces every full-corpus host structure:
#
#   encode   -- each process encodes ITS left slice (+ right slice on
#               cross-joins); nothing is allgathered.
#   phase 1  -- the right-side bf16 hash is a globally SHARDED device
#               array; the left hash replicates on DEVICE only (bf16
#               projection, 1/6th the exact ELL bytes, and HBM -- not host
#               RAM).  Candidates for this process's left rows come back as
#               a device slice.
#   phase 2  -- exact rescoring visits remote right shards ONE AT A TIME
#               over a broadcast ring (O(2 x corpus/nproc) resident), so
#               per-process host memory stays ~1/nproc of the replicated
#               tier's (asserted by tests/test_multihost_tier.py and
#               measured under real processes in mh_engine_worker.py).
#   reduce   -- only the RESULT pair list (output-sized by contract: every
#               process returns the full reference DataFrame) allgathers.
# ===========================================================================


def _make_phase1_scan(mesh, tile: int, hash_dim: int):
    """Phase-1 scan builder over a (1, n_dev) ('dp','mp') mesh: left chunks
    replicated, right tiles sharded over 'mp', per-chunk candidate merge via
    ``all_gather`` (the collective form of the reference's
    ``zip_sp_matmul_topn``, string_grouper.py:746).  Returns
    ``make_scan(cand_w, kt_w)`` -- candidate width and per-tile extraction
    width -- -> jitted fn(a_chunks, b_hash, thr) -> (cols[(rows,
    mp*cand_w)] in padded device space, drop bound[rows], per-row maximum
    per-tile qualified count[rows] -- the value that sizes escalation
    rungs exactly)."""

    def make_scan(cand_w, kt_w):
        def scan_chunks(a_chunks_r, b_loc, thr_s):
            b_tiles = b_loc.reshape(-1, tile, hash_dim)

            def body(_, a_hash_c):
                w_vals, w_cols, cnts, tmax, bound = match_block(
                    a_hash_c, b_tiles, thr_s, cand_w, kt_w
                )
                neg = jnp.float32(-jnp.inf)
                n_loc_rows = b_loc.shape[0]
                cols_loc = jnp.where(
                    w_vals > neg,
                    w_cols + jax.lax.axis_index("mp") * n_loc_rows,
                    -1,
                )
                gc = jax.lax.all_gather(cols_loc, "mp")  # (mp, m, W)
                mp_sz, m, w = gc.shape
                cols = jnp.swapaxes(gc, 0, 1).reshape(m, mp_sz * w)
                return None, (
                    cols,
                    jax.lax.pmax(bound, "mp"),
                    jax.lax.pmax(tmax, "mp"),
                )

            _, (cols, bound, tmax) = jax.lax.scan(body, None, a_chunks_r)
            return (
                cols.reshape(-1, cols.shape[-1]),
                bound.reshape(-1),
                tmax.reshape(-1),
            )

        return jax.jit(shard_map(
            scan_chunks,
            mesh=mesh,
            in_specs=(P(None, None, None), P("mp", None), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        ))

    return make_scan


#: Sharded-tier initial candidate width cap (per shard): bounds the
#: device-replicated candidate matrix at n_left_pad x n_dev x 256 x 4 B
#: (~2 GB at 2M rows x 8 devices) for ANY max_n_matches / threshold;
#: truncated rows settle exactly in the union escalation.
_SHARDED_CAND_CAP = 256


def _shard_bounds(n: int, nproc: int, pid: int) -> Tuple[int, int, int]:
    """Contiguous even sharding: (per, lo, hi) with per = ceil(n/nproc).
    Both bounds clamp to ``n`` so trailing processes of a tiny corpus
    (n < nproc) get EMPTY shards, not negative-length ones."""
    per = -(-max(n, 1) // nproc)
    return per, min(pid * per, n), min((pid + 1) * per, n)


def _pad_block(a: np.ndarray, rows: int) -> np.ndarray:
    out = np.zeros((rows,) + a.shape[1:], dtype=a.dtype)
    out[: a.shape[0]] = a
    return out


class _RingRescorer:
    """Exact phase-2 scoring against a RING of remote right-ELL shards.

    Each ``score(rows_local, cols_global)`` call runs ``nproc`` broadcast
    rounds -- every process MUST make the same number of calls (SPMD), even
    with zero local pairs.  Peak resident: the local shards plus ONE
    visiting shard (tracked in ``peak_visit_bytes``)."""

    def __init__(self, left_ell: EllMatrix, right_ell: EllMatrix,
                 right_counts: np.ndarray, acc_dtype):
        self.left = left_ell
        self.right = right_ell
        self.right_counts = right_counts
        self.right_starts = np.concatenate(
            ([0], np.cumsum(right_counts))
        ).astype(np.int64)
        self.acc = acc_dtype
        self.nproc = len(right_counts)
        self.n_visit_max = int(right_counts.max())
        self.peak_visit_bytes = 0
        self.pid = jax.process_index()

    def score(self, rows_local: np.ndarray,
              cols_global: np.ndarray) -> np.ndarray:
        self.right.wait_ready()
        sims = np.zeros(len(rows_local), dtype=np.float64)
        owner = (
            np.searchsorted(self.right_starts, cols_global, side="right") - 1
        )
        # One tiny collective agrees which shards ANY process needs this
        # call, so rounds nobody needs skip their two full-shard
        # broadcasts (escalation-ladder calls typically touch a handful
        # of shards for a handful of rows).
        need_local = np.zeros(self.nproc, dtype=np.int64)
        if len(owner):
            need_local[np.unique(owner)] = 1
        need = _allgather_host(need_local).max(axis=0)
        w = self.right.width
        for s in range(self.nproc):
            if not need[s]:
                continue
            sel = owner == s
            if s == self.pid:
                # Local shard: no transfer.
                if sel.any():
                    sims[sel] = rescore_pairs_fp64(
                        self.left, self.right, rows_local[sel],
                        cols_global[sel] - self.right_starts[s],
                        acc_dtype=self.acc,
                    )
                # Every process still broadcasts in lock-step below.
            ids_p = _pad_block(
                self.right.ids if s == self.pid
                else np.zeros((0, w), np.int32),
                self.n_visit_max,
            )
            vals_p = _pad_block(
                self.right.vals64 if s == self.pid
                else np.zeros((0, w), np.float64),
                self.n_visit_max,
            )
            ids_v = _broadcast_host_from(ids_p, s)
            vals_v = _broadcast_host_from(vals_p, s)
            if s != self.pid and sel.any():
                visiting = EllMatrix(
                    ids=ids_v[: self.right_counts[s]],
                    vals64=vals_v[: self.right_counts[s]],
                    n_terms=self.right.n_terms,
                )
                self.peak_visit_bytes = max(
                    self.peak_visit_bytes,
                    ids_v.nbytes + vals_v.nbytes,
                )
                sims[sel] = rescore_pairs_fp64(
                    self.left, visiting, rows_local[sel],
                    cols_global[sel] - self.right_starts[s],
                    acc_dtype=self.acc,
                )
        return sims


def multihost_sharded_fit_pairs(
    master, duplicates, config: StringGrouperConfig
) -> Tuple[MatchPairs, dict]:
    """Memory-scalable multi-controller fit: the engine's ``sharded``
    multihost tier (see the section header above).  SPMD contract identical
    to :func:`multihost_fit_pairs` -- every process calls with the same
    full input Series and receives the identical full matches list -- but
    no process ever materializes the full corpus ELL or byte payload:
    per-process host memory is ~1/nproc of the replicated tier's plus the
    (output-sized) gathered pair list.

    Covers self- AND cross-joins; bitwise-equal to the single-controller
    engine (tests/test_multihost_tier.py under one process,
    tests/mh_engine_worker.py under 2-3 real gloo processes).

    Design note: phase 1 uses the COMPLETE-extraction XLA tile body
    (k_tile = tile) rather than the fused kt=2 Pallas kernel the
    single-chip/mesh tiers default to.  The choice is deliberate: this
    tier settles unsafe rows with ONE union re-match at the provably
    complete width, which stays tiny only while drops come solely from
    top-C truncation; the kt=2 body's per-tile drops would push a few
    percent of the corpus into that full-width re-match (an
    O(rows x corpus) candidate matrix).  Bringing the fused body here
    needs the single-chip driver's kt-bucketed per-row escalation first
    -- the known pod-scale follow-up."""
    t: dict = {}
    t0 = time.perf_counter()
    is_self = duplicates is None
    nproc = jax.process_count()
    pid = jax.process_index()
    n_m = len(master)
    right_series = master if is_self else duplicates
    n_right = len(right_series)
    n_docs = n_m + (0 if is_self else n_right)

    min_similarity = config.min_similarity
    if np.dtype(config.tfidf_matrix_dtype) == np.float32:
        # Reference thresholds in the matrix dtype (adaptive_topn does the
        # same rounding on the single-controller path).
        min_similarity = float(np.float32(min_similarity))
    max_n = n_right if config.max_n_matches is None else config.max_n_matches
    max_n_eff = min(max_n, n_right)

    # --- encode: ONLY this process's slices of each side.
    per_l, llo, lhi = _shard_bounds(n_m, nproc, pid)
    per_r, rlo, rhi = _shard_bounds(n_right, nproc, pid)
    local_strings = list(master.iloc[llo:lhi])
    n_ll = lhi - llo
    if not is_self:
        local_strings += list(duplicates.iloc[rlo:rhi])
    local_ell, _idf, n_docs_g = multihost_encode_shard(local_strings, config)
    if n_docs_g != n_docs:
        raise AssertionError(
            f"global document count mismatch: slices sum to {n_docs_g} "
            f"but the full corpus has {n_docs} rows"
        )
    left_ell = _slice_ell(local_ell, 0, n_ll)
    right_ell = (
        left_ell if is_self
        else _slice_ell(local_ell, n_ll, n_ll + (rhi - rlo))
    )
    # Counts are pure functions of (n, nproc): every process computes all
    # peers' locally instead of paying two collectives.
    left_counts = np.array(
        [_shard_bounds(n_m, nproc, p)[2] - _shard_bounds(n_m, nproc, p)[1]
         for p in range(nproc)], np.int64,
    )
    right_counts = np.array(
        [_shard_bounds(n_right, nproc, p)[2]
         - _shard_bounds(n_right, nproc, p)[1]
         for p in range(nproc)], np.int64,
    )
    left_starts = np.concatenate(([0], np.cumsum(left_counts))).astype(
        np.int64
    )
    t["encode_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()

    if n_m == 0 or n_right == 0 or max_n_eff <= 0:
        t["match_s"] = 0.0
        return _finish_sharded(
            _empty_pairs(), master, is_self, config, n_m, n_right, t,
            time.perf_counter(),
        )

    # --- phase 1: sharded right hash, device-replicated left hash.
    devs = jax.devices()
    n_dev = len(devs)
    mesh = Mesh(np.array(devs).reshape(1, n_dev), ("dp", "mp"))
    dev_per_proc = n_dev // nproc
    hash_dim = config.hash_dim
    tile = min(
        config.right_tile,
        max(8, -(-max(-(-n_right // n_dev), 8) // 8) * 8),
    )
    per_dev_r = -(-max(-(-n_right // n_dev), 8) // tile) * tile
    pad_local_r = per_dev_r * dev_per_proc
    if int(right_counts.max()) > pad_local_r:
        raise ValueError(
            f"right shard of {int(right_counts.max())} rows exceeds the "
            f"per-process padded capacity {pad_local_r}"
        )
    local_ell.wait_ready()
    b_local = np.asarray(
        build_hash_matrix(right_ell, pad_local_r, hash_dim)
    )
    b_hash = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("mp", None)),
        b_local.reshape(pad_local_r, hash_dim),
    )

    # Left scan-chunk rows: sized for the hardware -- the single-chip
    # left_chunk granularity on TPU (512-row chunks measured ~100x slower
    # per tile: per-tile reduction overhead amortizes over the chunk
    # rows), tiny on the CPU test meshes where per-step work must stay
    # small.
    on_tpu_mesh = all(d.platform == "tpu" for d in mesh.devices.flat)
    chunk = min(4096 if on_tpu_mesh else 8, per_dev_r)
    per_dev_l = -(-max(-(-n_m // n_dev), 8) // chunk) * chunk
    pad_local_l = per_dev_l * dev_per_proc
    if int(left_counts.max()) > pad_local_l:
        raise ValueError(
            f"left shard of {int(left_counts.max())} rows exceeds the "
            f"per-process padded capacity {pad_local_l}"
        )
    a_local = (
        b_local if is_self and pad_local_l == pad_local_r
        else np.asarray(build_hash_matrix(left_ell, pad_local_l, hash_dim))
    )
    a_sharded = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("mp", None)),
        a_local.reshape(pad_local_l, hash_dim),
    )
    # Corpus-order index map (padded-device position of each left row),
    # replicated on DEVICE via one gather -- host never holds the full
    # left hash.
    n_left_pad = -(-n_m // chunk) * chunk
    corpus_rows = np.minimum(np.arange(n_left_pad, dtype=np.int64), n_m - 1)
    owner_of = np.minimum(corpus_rows // per_l, nproc - 1)
    idx_map = owner_of * pad_local_l + (corpus_rows - left_starts[owner_of])
    valid_row = np.arange(n_left_pad) < n_m
    idx_j = jnp.asarray(idx_map)
    valid_j = jnp.asarray(valid_row)
    a_dense = jax.jit(
        lambda x: jnp.where(valid_j[:, None], x[idx_j], 0),
        out_shardings=NamedSharding(mesh, P()),
    )(a_sharded)
    a_chunks = a_dense.reshape(-1, chunk, hash_dim)

    make_scan = _make_phase1_scan(mesh, tile, hash_dim)
    # Candidate width is CAPPED: initial_cand_c returns the per-device cap
    # for max_n_matches=None / thresholdless configs, and the replicated
    # candidate matrix is (n_left_pad, n_dev * cand_c) int32 on EVERY
    # device -- uncapped it scales with the corpus itself.  Rows whose
    # top-C truncates report a finite drop bound and settle in the
    # complete-width union re-match below, so the cap never costs
    # exactness, only escalation volume.
    cand_c = min(
        initial_cand_c(min_similarity, max_n_eff, n_right, per_dev_r),
        _SHARDED_CAND_CAP,
        per_dev_r,
    )
    thr = jnp.float32(effective_threshold(min_similarity))
    # Initial extraction width: the single-chip heuristic (closed-form
    # kt=2 on thresholded corpora) -- the complete kt=tile extraction
    # stacks (n_tiles, rows, tile) intermediates, which at corpus scale is
    # a device OOM; the ladder below restores completeness.
    kt0 = initial_k_tile(min_similarity, tile, cand_c)
    cols_rep, bound_rep, tmax_rep = make_scan(cand_c, kt0)(
        a_chunks, b_hash, thr
    )
    # Pull ONLY this process's left-row slice to host.
    cols_my = np.asarray(cols_rep[llo:lhi])
    bound_my = np.asarray(bound_rep[llo:lhi])
    tmax_my = np.asarray(tmax_rep[llo:lhi])
    t["p1_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()

    # --- phase 2: exact rescore over the right-shard ring + selection.
    right_starts_dev = np.concatenate(
        ([0], np.cumsum(right_counts))
    ).astype(np.int64)

    def map_cols(cols_h: np.ndarray) -> np.ndarray:
        """Padded-device right space -> global right ids."""
        proc_of = np.minimum(cols_h // pad_local_r, nproc - 1)
        within = cols_h - proc_of * pad_local_r
        global_col = right_starts_dev[proc_of] + within
        valid = (cols_h >= 0) & (within < right_counts[proc_of])
        return np.where(valid, global_col, -1)

    ring = _RingRescorer(
        left_ell, right_ell, right_counts, config.tfidf_matrix_dtype
    )

    def score_select(cols_h: np.ndarray, row_ids_local: np.ndarray):
        rows_pos, cols_f = _pairs_from_ship(map_cols(cols_h), n_right)
        rows_l = row_ids_local[rows_pos]
        sims = ring.score(rows_l, cols_f)
        return _select_topn(
            rows_l, cols_f, sims, n_ll, min_similarity, max_n_eff
        )

    r_s, c_s, s_s, kept_q, row_cut = score_select(
        cols_my, np.arange(n_ll, dtype=np.int64)
    )
    t["rescore_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()

    # --- escalation LADDER: unsafe rows re-match at widening
    # (cand, k_tile) stages, ending at the provably-complete width
    # (cand = per-shard rows, k_tile = tile).  Collective discipline:
    # the unsafe union allgathers per stage, stage continuation is a
    # global condition, and every process dispatches the identical batch
    # sequence -- device memory stays bounded because each batch's
    # per-tile extraction stack is (n_tiles, batch, kt) instead of
    # (n_tiles, corpus, tile).
    from ..ops.matcher import escalation_unsafe

    qual_low = max(min_similarity, 0.0)
    unsafe = escalation_unsafe(
        bound_my, kept_q, row_cut, qual_low, max_n_eff
    )
    # Rung plan: per-tile extraction widths clamp to at least the initial
    # kt0 (a narrower rung would re-introduce the per-tile drops the
    # initial pass already paid for) and candidates widen toward the
    # per-shard cap; the complete width is always last.  Rows are
    # ASSIGNED to the first rung whose kt covers their device-reported
    # per-tile maximum -- tmax is a data property, independent of the
    # extraction width -- so no row climbs a rung that provably cannot
    # settle it.
    stages = []
    if kt0 < tile or cand_c < per_dev_r:
        prev = (cand_c, kt0)
        for mid_cand, mid_kt in (
            (min(max(cand_c * 4, 256), per_dev_r), min(max(8, kt0), tile)),
            (
                min(max(cand_c * 16, 1024), per_dev_r),
                min(max(32, kt0), tile),
            ),
        ):
            wider = mid_cand > prev[0] or mid_kt > prev[1]
            if wider and (mid_cand < per_dev_r or mid_kt < tile):
                stages.append((mid_cand, mid_kt))
                prev = (mid_cand, mid_kt)
    stages.append((per_dev_r, tile))
    n_tiles_dev = max(per_dev_r // tile, 1)
    n_uns0 = _allgather_host(np.array([int(unsafe.sum())], np.int64))
    t["esc_rows"] = int(n_uns0.sum())  # UNIQUE escalated rows, all procs
    touched_all = np.zeros(n_ll, dtype=bool)
    for si, (cand_s, kt_s) in enumerate(stages):
        complete = cand_s >= per_dev_r and kt_s >= tile
        eligible = unsafe if complete else (unsafe & (tmax_my <= kt_s))
        # Per-stage scan-chunk rows: the inner tile scan stacks
        # (n_tiles, chunk, kt) intermediates, so wide-kt stages need
        # narrow chunks (complete width: ~48 rows) while kt<=32 stages
        # can amortize per-tile overhead over MXU-sized chunks.
        chunk_esc = max(
            8,
            min(
                512,
                (1 << 29) // max(16 * n_tiles_dev * kt_s, 1) // 8 * 8,
            ),
        )
        my_unsafe = np.flatnonzero(eligible).astype(np.int64) + llo
        n_uns = _allgather_host(np.array([len(my_unsafe)], np.int64))
        if int(n_uns.max()) == 0:
            continue  # later stages may still own rows (tmax > this kt)
        t[f"esc_s{si}_kt{kt_s}_rows"] = int(n_uns.sum())
        t_stage0 = time.perf_counter()
        pad = np.full(int(n_uns.max()), -1, dtype=np.int64)
        pad[: len(my_unsafe)] = my_unsafe
        gathered = _allgather_host(pad).reshape(-1)
        union = np.unique(gathered[gathered >= 0])
        # Batch rows so the per-dispatch extraction stack (~2 copies of
        # (n_tiles, batch, kt) f32+i32) stays under ~0.5 GB.
        per_row_b = 16 * n_tiles_dev * kt_s + 4 * n_dev * cand_s
        batch = max(
            chunk_esc,
            (1 << 29) // max(per_row_b, 1) // chunk_esc * chunk_esc,
        )
        cols_mine_parts, bound_mine_parts, rows_mine_parts = [], [], []
        for b0 in range(0, len(union), batch):
            ub = union[b0:b0 + batch]
            m_p = -(-len(ub) // chunk_esc) * chunk_esc
            sel_rows = np.zeros(m_p, dtype=np.int64)
            sel_rows[: len(ub)] = ub
            a_sub = jnp.where(
                (jnp.arange(m_p) < len(ub))[:, None],
                a_dense[jnp.asarray(sel_rows)],
                0,
            )
            esc_chunks = a_sub.reshape(-1, chunk_esc, hash_dim)
            cols_b, bound_b, _tmax_b = make_scan(cand_s, kt_s)(
                esc_chunks, b_hash, thr
            )
            if complete and np.isfinite(
                np.asarray(bound_b[: len(ub)])
            ).any():
                raise AssertionError(
                    "sharded-tier complete-width re-match reported a "
                    "finite drop bound: the completeness invariant is "
                    "broken"
                )
            mine_b = (ub >= llo) & (ub < lhi)
            if mine_b.any():
                sel_mine = jnp.asarray(
                    np.flatnonzero(mine_b).astype(np.int64)
                )
                cols_mine_parts.append(np.asarray(cols_b[sel_mine]))
                bound_mine_parts.append(np.asarray(bound_b[sel_mine]))
                rows_mine_parts.append(ub[mine_b] - llo)
        rows_mine = (
            np.concatenate(rows_mine_parts)
            if rows_mine_parts
            else np.zeros(0, dtype=np.int64)
        )
        cols_mine = (
            np.concatenate(cols_mine_parts)
            if cols_mine_parts
            else np.zeros((0, n_dev * cand_s), dtype=np.int32)
        )
        # Every process runs the ring (score_select is collective), even
        # with zero own rows this stage.
        r2, c2, s2, kept2, cut2 = score_select(cols_mine, rows_mine)
        touched = np.zeros(n_ll, dtype=bool)
        touched[rows_mine] = True
        touched_all |= touched
        keep = ~touched[r_s]
        r_s = np.concatenate([r_s[keep], r2])
        c_s = np.concatenate([c_s[keep], c2])
        s_s = np.concatenate([s_s[keep], s2])
        # This stage's rows settle or re-queue on their NEW bounds and
        # selection cuts; rows waiting for a wider rung stay unsafe.
        unsafe[rows_mine] = False
        if len(rows_mine) and not complete:
            bound_new = (
                np.concatenate(bound_mine_parts)
                if bound_mine_parts
                else np.zeros(0)
            )
            unsafe[rows_mine] = escalation_unsafe(
                bound_new, kept2[rows_mine], cut2[rows_mine],
                qual_low, max_n_eff,
            )
        t[f"esc_s{si}_kt{kt_s}_s"] = time.perf_counter() - t_stage0
    if touched_all.any():
        order = np.lexsort((c_s, -s_s, r_s))
        r_s, c_s, s_s = r_s[order], c_s[order], s_s[order]
    t["esc_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()

    # --- memory accounting for the scalability contract.
    local_bytes = left_ell.ids.nbytes + left_ell.vals64.nbytes
    if not is_self:
        local_bytes += right_ell.ids.nbytes + right_ell.vals64.nbytes
    t["mem_local_ell_bytes"] = int(local_bytes)
    t["mem_peak_visit_bytes"] = int(ring.peak_visit_bytes)
    t["mem_replicated_ell_bytes"] = int(
        n_docs * local_ell.width * (4 + 8)
    )

    pairs_local = MatchPairs(
        rows=r_s, cols=c_s, sims=s_s, true_max_n_matches=0
    )
    return _finish_sharded(
        pairs_local, master, is_self, config, n_m, n_right, t, t0,
        row_offset=llo,
    )


def _finish_sharded(
    pairs_local: MatchPairs, master, is_self: bool,
    config: StringGrouperConfig, n_m: int, n_right: int, t: dict,
    t0: float, row_offset: int = 0,
) -> Tuple[MatchPairs, dict]:
    """Result gather + global fix-ups shared with the replicated tier
    (the compact i32-ids + f64-sims wire of _gather_pair_list)."""
    rows_g, cols_g, sims_g = _gather_pair_list(
        pairs_local.rows + row_offset, pairs_local.cols, pairs_local.sims
    )
    true_max = (
        int(np.bincount(rows_g, minlength=n_m).max(initial=0))
        if len(rows_g)
        else 0
    )
    pairs = MatchPairs(
        rows=rows_g, cols=cols_g, sims=sims_g, true_max_n_matches=true_max
    )
    t["result_allgather_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    if is_self and config.force_symmetries:
        pairs = apply_self_join_fixups(pairs, n_m)
    t["fixups_s"] = time.perf_counter() - t0
    return pairs, {
        k: (round(v, 4) if isinstance(v, float) else v) for k, v in t.items()
    }


# ===========================================================================
# Production tier: the engine-integrated multi-controller pipeline.
#
# SPMD contract: every process calls the SAME engine API with the SAME full
# input Series (the standard multi-controller jax programming model -- same
# program, same args on every host).  Internally the work shards:
#
#   encode  -- each process tokenizes only ITS contiguous shard of the
#              virtual concat(master, duplicates); vocabulary / DF / widths
#              agree via host collectives (multihost_encode_shard).
#   gather  -- exact ELL blocks + byte payload allgather once (the same
#              one-bulk-pass trade as multihost_match_shard stage 5), so
#              phase 2 scoring stays host-local afterwards.
#   match   -- each process runs the FULL single-controller matcher
#              (ops/matcher.py, or parallel/distributed.py when config.mesh
#              covers its local devices) on ITS contiguous slice of left
#              rows x the whole right side: duplicate collapse, byte-payload
#              device encode, streamed segments, kt-bucketed per-row
#              escalation, production widths -- every single-chip pillar --
#              with NO cross-process traffic in the hot loop (per-row top-n
#              is row-local, so left sharding is exact by construction;
#              candidate merges ride ICI inside a host, never DCN).
#   reduce  -- per-shard pair lists allgather (one packed f64 collective);
#              self-join fix-ups / reference ordering apply to the global
#              list identically on every process, so get_matches/get_groups
#              return the SAME full DataFrame everywhere.
#
# ``get_groups`` therefore runs on the gathered global matches list (the
# documented gather-to-controller form of distributed grouping: the output
# DataFrame is corpus-sized and per-process anyway, so the pair list must
# be global before assembly; the native union-find labels 9M edges in
# ~0.1 s -- see MULTIHOST_BENCH_r04.json for the measured gather + CC cost).
# ===========================================================================


def _allgather_ragged(x: np.ndarray) -> list:
    """Allgather arrays whose LEADING dimension differs per process (equal
    trailing dims/dtype): pad to the global max, gather, slice back.
    Returns the per-process list."""
    counts = _allgather_host(
        np.array([x.shape[0]], dtype=np.int64)
    ).reshape(-1)
    mx = int(counts.max())
    if mx == 0:
        return [x[:0] for _ in range(len(counts))]
    padded = np.zeros((mx,) + x.shape[1:], dtype=x.dtype)
    padded[: x.shape[0]] = x
    g = _allgather_host(padded)
    return [g[p, : counts[p]] for p in range(len(counts))]


def _slice_ell(ell: EllMatrix, lo: int, hi: int) -> EllMatrix:
    src = ell.device_src
    return EllMatrix(
        ids=ell.ids[lo:hi],
        vals64=ell.vals64[lo:hi],
        n_terms=ell.n_terms,
        device_src=src.slice_rows(lo, hi) if src is not None else None,
        # Slices view still-filling buffers when the fill is deferred:
        # wait_ready() on the slice must join it (tfidf.fit_transform_pair
        # propagates the handle the same way).
        pending=ell.pending,
    )


def _allgather_full_ell(local_ell: EllMatrix) -> EllMatrix:
    """One bulk allgather of the exact shard blocks (+ byte payload when
    present) -> the full corpus ELL, identical on every process.  Widths
    were agreed at encode time, so the blocks concatenate directly."""
    local_ell.wait_ready()
    ids_parts = _allgather_ragged(local_ell.ids)
    vals_parts = _allgather_ragged(local_ell.vals64)
    full = EllMatrix(
        ids=np.concatenate(ids_parts),
        vals64=np.concatenate(vals_parts),
        n_terms=local_ell.n_terms,
    )
    src = local_ell.device_src
    # Payload eligibility is a global property (see multihost_encode_shard),
    # so either every process has one or none does.
    if src is None:
        return full
    codes_parts = _allgather_ragged(src.flat_codes)
    lens_parts = _allgather_ragged(np.diff(src.coff))
    inv_parts = _allgather_ragged(src.inv_norm)
    hash_parts = _allgather_ragged(src.row_hash)
    lens = np.concatenate(lens_parts)
    coff = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    full_src = DeviceEncodeSrc(
        flat_codes=np.concatenate(codes_parts),
        coff=coff,
        inv_norm=np.concatenate(inv_parts),
        table_id=src.table_id,
        idf32=src.idf32,
        base=src.base,
        ngram=src.ngram,
        row_hash=np.concatenate(hash_parts),
    )
    return replace(full, device_src=full_src)


def _gather_pair_list(
    rows: np.ndarray,
    cols: np.ndarray,
    sims: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Allgather per-shard pair lists into the global (rows, cols, sims).

    ONE uint8 stream per process -- [count:u32, pad:u32, rows:i32,
    cols:i32, sims:f64] -- 16 instead of the legacy 24 bytes per pair
    (ids rode as f64 before) at near-zero host cost.  Two denser forms
    were measured at 9M edges and REJECTED: 20-bit packed ids (13 B/pair)
    cost ~2 s of numpy pack/unpack per gather -- more than the wire bytes
    saved on any but the slowest interconnect -- and recomputing sims
    locally instead of shipping them (5 B/pair) cost ~2 s of exact
    rescore; see MULTIHOST_BENCH_r05."""
    m = len(rows)
    wire = np.concatenate(
        [
            np.array([m, 0], np.uint32).view(np.uint8),
            np.ascontiguousarray(rows, dtype=np.int32).view(np.uint8),
            np.ascontiguousarray(cols, dtype=np.int32).view(np.uint8),
            np.ascontiguousarray(sims, dtype=np.float64).view(np.uint8),
        ]
    )
    parts = _allgather_ragged(wire)
    rows_l, cols_l, sims_l = [], [], []
    for part in parts:
        part = part.copy()  # gathered slices may be unaligned for views
        mp = int(part[:4].view(np.uint32)[0])
        rows_l.append(
            part[8:8 + 4 * mp].view(np.int32).astype(np.int64)
        )
        cols_l.append(
            part[8 + 4 * mp:8 + 8 * mp].view(np.int32).astype(np.int64)
        )
        sims_l.append(part[8 + 8 * mp:8 + 16 * mp].view(np.float64))
    return (
        np.concatenate(rows_l),
        np.concatenate(cols_l),
        np.concatenate(sims_l),
    )


def _host_available_bytes() -> Optional[int]:
    """MemAvailable from /proc/meminfo, or None off-Linux."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable"):
                    return int(line.split()[1]) * 1024
    except OSError:  # pragma: no cover - non-Linux
        pass
    return None


def _check_replicated_capacity(local_ell: EllMatrix, n_docs: int) -> None:
    """Guard the replicated tier's O(corpus) per-host materialization.

    The replicated tier allgathers the FULL exact ELL (+ byte payload) to
    every process -- the reference hits the same wall and answers with
    ``n_blocks`` (its docs note a ~80k-row right-block memory cliff,
    reference docs/performance.md:71-79); this build's answer is the
    ``sharded`` tier.  Estimated bytes are compared against
    ``SG_TPU_MH_HOST_BUDGET_GB`` (or 80% of the minimum MemAvailable
    across processes -- the min rides a collective so every process
    raises together rather than one OOM-killing mid-allgather).  See
    docs/performance.md "Capacity envelope"."""
    est = n_docs * (local_ell.width * 12 + 16)
    src = local_ell.device_src
    if src is not None and len(src.coff):
        per_row = int(src.coff[-1]) / max(len(src.coff) - 1, 1)
        est += int(n_docs * (per_row + 16))
    # EVERY process issues the SAME collective regardless of its local env
    # var or /proc availability -- a conditional collective here would
    # desynchronize the job (some processes gathering, others not) and
    # hang instead of raising.  Each process contributes its local budget
    # (env override, else 80% of MemAvailable, else "no limit"); the
    # global budget is the minimum, so the verdict is identical everywhere.
    budget_env = os.environ.get("SG_TPU_MH_HOST_BUDGET_GB")
    if budget_env is not None:
        local_budget = float(budget_env) * (1 << 30)
    else:
        avail = _host_available_bytes()
        local_budget = float("inf") if avail is None else 0.8 * avail
    # Globalize BOTH sides of the comparison: the estimate's payload
    # density is per-shard (this process's string lengths), so comparing
    # local est against the global budget could still raise on some
    # processes only.  max(est) vs min(budget) is identical everywhere.
    gathered = _allgather_host(
        np.array([float(est), local_budget], np.float64)
    )
    est = float(gathered[:, 0].max())
    budget = float(gathered[:, 1].min())
    if est > budget:
        raise MemoryError(
            f"multihost='replicated' would materialize ~{est / (1 << 30):.1f}"
            f" GB of exact corpus encode on EVERY process ({n_docs:,} rows),"
            f" exceeding the per-host budget of {budget / (1 << 30):.1f} GB. "
            "Use multihost='sharded' (per-process memory ~1/n_processes; "
            "the engine auto-selects it above SG_TPU_MH_SHARDED_ROWS rows), "
            "or raise SG_TPU_MH_HOST_BUDGET_GB if this host can hold the "
            "replicated encode."
        )


def _empty_pairs() -> MatchPairs:
    return MatchPairs(
        rows=np.zeros(0, dtype=np.int64),
        cols=np.zeros(0, dtype=np.int64),
        sims=np.zeros(0, dtype=np.float64),
        true_max_n_matches=0,
    )


def multihost_fit_pairs(
    master, duplicates, config: StringGrouperConfig
) -> Tuple[MatchPairs, dict]:
    """The engine's multi-controller fit: returns the FULL reference-
    equivalent matches list (identical on every process) plus per-stage
    wall times.  See the tier overview above; every process must call this
    with the same full input Series (SPMD).

    Covers the whole reference API surface: self-joins (match_strings /
    group_similar_strings), cross-joins (match_strings with duplicates,
    match_most_similar) -- IDs and output assembly are host-side pandas on
    the gathered list and need nothing special here.  Bitwise equality with
    the single-process engine is asserted by tests/test_multihost.py's
    engine workers and by test_multihost_tier.py under one process.
    """
    t = {}
    t0 = time.perf_counter()
    is_self = duplicates is None
    nproc = jax.process_count()
    pid = jax.process_index()
    n_m = len(master)
    n_docs = n_m + (0 if is_self else len(duplicates))

    _per, lo, hi = _shard_bounds(n_docs, nproc, pid)

    def shard_strings():
        if hi <= lo:
            return []
        out = (
            list(master.iloc[max(lo, 0):min(hi, n_m)]) if lo < n_m else []
        )
        if hi > n_m:
            out += list(duplicates.iloc[max(lo - n_m, 0):hi - n_m])
        return out

    # Sharded encode for BOTH matrix dtypes: the f32 sklearn rounding chain
    # is reproduced inside multihost_encode_shard against the global
    # df / doc count, so float32 corpora shard exactly like float64.
    local_ell, _idf, n_docs_g = multihost_encode_shard(
        shard_strings(), config
    )
    if n_docs_g != n_docs:
        raise AssertionError(
            f"global document count mismatch: slices sum to {n_docs_g} "
            f"but the full corpus has {n_docs} rows"
        )
    t["encode_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    _check_replicated_capacity(local_ell, n_docs)
    full_ell = _allgather_full_ell(local_ell)
    t["ell_allgather_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    full_master = _slice_ell(full_ell, 0, n_m)
    full_right = (
        full_master if is_self else _slice_ell(full_ell, n_m, n_docs)
    )

    # Left rows shard contiguously over processes; each process runs the
    # complete single-controller matcher on its slice.
    t0 = time.perf_counter()
    right_series = master if is_self else duplicates
    n_right = len(right_series)
    max_n = n_right if config.max_n_matches is None else config.max_n_matches
    _per_l, lo_l, hi_l = _shard_bounds(n_m, nproc, pid)
    if config.mesh is not None:
        # Validate on EVERY process (including empty-slice ones): raising
        # on some processes while others proceed into the pair allgather
        # would hang the job instead of failing it.
        local = set(jax.local_devices())
        if not all(d in local for d in config.mesh.devices.flat):
            raise ValueError(
                "multihost + mesh: the mesh must contain only this "
                "process's local devices (each process runs its own "
                "sharded matcher on its left-row slice; build it from "
                "jax.local_devices(), not jax.devices())."
            )
    if hi_l > lo_l:
        left_slice = _slice_ell(full_master, lo_l, hi_l)
        left_codes = duplicate_codes(master.iloc[lo_l:hi_l], left_slice)
        right_codes = duplicate_codes(right_series, full_right)
        kwargs = dict(
            hash_dim=config.hash_dim,
            left_chunk=config.left_chunk,
            right_tile=config.right_tile,
            score_dtype=config.tfidf_matrix_dtype,
            left_codes=left_codes,
            right_codes=right_codes,
        )
        if config.mesh is not None:
            from .distributed import distributed_topn_cosine_matches

            pairs_local = distributed_topn_cosine_matches(
                left_slice, full_right, config.min_similarity, max_n,
                config.mesh, **kwargs,
            )
        else:
            pairs_local = topn_cosine_matches(
                left_slice, full_right, config.min_similarity, max_n,
                **kwargs,
            )
    else:
        pairs_local = _empty_pairs()
    t["match_s"] = time.perf_counter() - t0

    # Compact result gather (i32 ids + f64 sims) -- see _gather_pair_list.
    t0 = time.perf_counter()
    rows_g, cols_g, sims_g = _gather_pair_list(
        pairs_local.rows + lo_l, pairs_local.cols, pairs_local.sims
    )
    true_max = (
        int(np.bincount(rows_g, minlength=n_m).max(initial=0))
        if len(rows_g)
        else 0
    )
    pairs = MatchPairs(
        rows=rows_g, cols=cols_g, sims=sims_g, true_max_n_matches=true_max
    )
    t["result_allgather_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if is_self and config.force_symmetries:
        # Global fix-ups on the gathered list -- deterministic, so every
        # process produces the identical final ordering (reference
        # string_grouper.py:419-427).
        pairs = apply_self_join_fixups(pairs, n_m)
    t["fixups_s"] = time.perf_counter() - t0
    return pairs, {k: round(v, 4) for k, v in t.items()}