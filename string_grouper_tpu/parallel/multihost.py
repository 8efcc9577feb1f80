"""True multi-process (multi-host) matching: the DCN forms of the pipeline.

Two tiers live here (docs/architecture.md "Multi-host status"):

* the PRODUCTION engine-integrated tier (:func:`multihost_fit_pairs`,
  selected by ``StringGrouperConfig.multihost``): SPMD over processes --
  same engine call, same full inputs everywhere; encode shards per
  process, the exact blocks + byte payload allgather once, each process
  runs the complete single-controller matcher on its left-row slice, and
  one packed collective gathers the results, so every process returns the
  identical full output.  The hot loop crosses no process boundary.
* the shard-local DEMONSTRATION tier (:func:`multihost_encode_shard` +
  :func:`multihost_match_shard`), described below: each process holds
  ONLY its shard of the corpus strings and the hashed projection is a
  globally sharded device array -- the shape a pod needs when the right
  side cannot be host-replicated.

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
import pandas as pd
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
    match_block,
    topn_cosine_matches,
)
from ..ops.rescore import rescore_pairs_fp64

__all__ = [
    "multihost_encode_shard",
    "multihost_match_shard",
    "multihost_fit_pairs",
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
        df32 = df.astype(np.float32) + np.float32(1.0)
        idf32c = np.full_like(df32, n_docs + 1, dtype=np.float32)
        idf32c /= df32
        np.log(idf32c, out=idf32c)
        idf32c += np.float32(1.0)
        idf = idf32c.astype(np.float64)
        w = tf.astype(np.float32) * idf32c[terms]
        norm_sq = np.bincount(rows, weights=w * w, minlength=n_rows)
        norm = np.sqrt(norm_sq)
        safe = np.where(norm > 0, norm, 1.0)
        vals = (w / safe[rows]).astype(np.float32).astype(np.float64)
        inv = np.zeros(n_rows, dtype=np.float64)
        nz = norm > 0
        inv[nz] = 1.0 / norm[nz]
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
    kt = tile  # full per-tile extraction: only top-C truncation can drop
    thr = jnp.float32(effective_threshold(min_similarity))

    def make_scan(cand_w):
        def scan_chunks(a_chunks_r, b_loc, thr_s):
            b_tiles = b_loc.reshape(-1, tile, hash_dim)

            def body(_, a_hash_c):
                w_vals, w_cols, cnts, tmax, bound = match_block(
                    a_hash_c, b_tiles, thr_s, cand_w, kt
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
                return None, (cols, jax.lax.pmax(bound, "mp"))

            _, (cols, bound) = jax.lax.scan(body, None, a_chunks_r)
            return cols.reshape(-1, cols.shape[-1]), bound.reshape(-1)

        return jax.jit(shard_map(
            scan_chunks,
            mesh=mesh,
            in_specs=(P(None, None, None), P("mp", None), P()),
            out_specs=(P(), P()),
            check_vma=False,
        ))

    cols_rep, bound_rep = make_scan(cand_c)(a_chunks, b_hash, thr)

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
    from ..ops.matcher import _UB_ABS_SLACK, _UB_ADJ

    bound_h = np.asarray(bound_rep)[shard_row0 : shard_row0 + n_local]
    adj = np.minimum(bound_h * _UB_ADJ + _UB_ABS_SLACK, 1.0)
    max_n_eff = min(max_n_matches, n_total)
    unsafe = (
        (bound_h > -np.inf)
        & (adj >= max(min_similarity, 0.0))
        & ((kept_q < max_n_eff) | (adj >= np.minimum(row_cut, 1.0)))
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
        cols_esc, bound_esc = make_scan(per_dev)(esc_chunks, b_hash, thr)
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

    per = -(-max(n_docs, 1) // nproc)
    lo, hi = pid * per, min((pid + 1) * per, n_docs)

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
    per_l = -(-max(n_m, 1) // nproc)
    lo_l, hi_l = pid * per_l, min((pid + 1) * per_l, n_m)
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

    # One packed f64 collective gathers every shard's pair list (row and
    # column ids are < 2^53, hence exact in f64).
    t0 = time.perf_counter()
    wire = np.empty((len(pairs_local.rows), 3), dtype=np.float64)
    wire[:, 0] = pairs_local.rows + lo_l
    wire[:, 1] = pairs_local.cols
    wire[:, 2] = pairs_local.sims
    parts = _allgather_ragged(wire)
    allp = np.concatenate(parts)
    rows_g = allp[:, 0].astype(np.int64)
    cols_g = allp[:, 1].astype(np.int64)
    sims_g = np.ascontiguousarray(allp[:, 2])
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