"""Multi-chip sharded matching over a ``jax.sharding.Mesh``.

The reference's out-of-core 2-D block decomposition (``n_blocks``, reference
string_grouper/string_grouper.py:709-752) becomes a 2-D device mesh:

  * axis ``dp`` -- left (master) rows, data-parallel: each mesh row processes
    its own chunk of left strings;
  * axis ``mp`` -- right (candidate) rows: each mesh column holds a shard of
    the right hashed projection.

Per device, the phase-1 candidate selector (ops/matcher.py ``match_block``)
runs on the local (left-chunk x right-shard) block.  The per-shard
candidates merge by ``all_gather`` concatenation over ``mp`` -- the
collective form of the reference's ``zip_sp_matmul_topn`` merge
(string_grouper.py:746); no re-sort is needed because the host scores
every shipped candidate exactly.  Qualified-candidate counts and drop
bounds reduce with ``pmax`` over ``mp`` -- each shard drops candidates only
against its own per-shard caps, so the tightest per-shard maximum (not a
sum) is what the host-side adaptive width loop must cover -- preserving
the single-chip no-drop guarantee: shard count never changes the returned
pair set.  Exact float64 scoring of the shipped candidates is the same
host phase 2 as the single-chip path, overlapped with device matching by
streaming left-side segments; unsafe rows re-match individually via the
same per-row escalation contract as the single-chip driver
(ops/matcher.py ``adaptive_topn``), so one hot row never forces a global
re-match of the whole mesh.

Document-frequency counts for a corpus sharded over devices reduce with
``jax.lax.psum`` (:func:`distributed_df_counts`), yielding the replicated
IDF vector -- the collective form of TfidfVectorizer's DF pass (reference
string_grouper.py:699-707) for corpora too large for one host.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..corpus.tfidf import EllMatrix
from ..ops.matcher import (
    _ROWS_COMPACT_MIN,
    _SHIP_BUDGET_ROWS,
    MatchPairs,
    _compact_cols,
    _consume_stream,
    _finish_rows,
    _join_wire,
    _next_pow2,
    _pad_width,
    _pack_meta,
    _ship_cols,
    apply_self_join_fixups,
    build_hash_matrix,
    fused_enabled,
    match_block,
    order_like_reference_csr,
)
from ..ops.pallas_kernels import p1_fused_closed2, p1_fused_supported

__all__ = [
    "make_mesh",
    "distributed_df_counts",
    "replicated_idf",
    "distributed_topn_cosine_matches",
    "sharded_fit_transform",
]


def make_mesh(n_devices: Optional[int] = None, dp: int = 1) -> Mesh:
    """Build a (dp, mp) mesh over the first ``n_devices`` devices.

    ``dp`` splits left rows (data parallel); the remaining factor ``mp``
    shards right rows (candidate parallel).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices % dp != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by dp={dp}")
    mp = n_devices // dp
    arr = np.asarray(devs[:n_devices]).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


# --------------------------------------------------------------------- TF-IDF
def distributed_df_counts(local_df: jax.Array, axis: str = "mp") -> jax.Array:
    """Global document-frequency counts from per-shard counts (call inside a
    ``shard_map``/``pjit`` context over ``axis``)."""
    return jax.lax.psum(local_df, axis)


@jax.jit
def replicated_idf(df: jax.Array, n_docs: jax.Array) -> jax.Array:
    """Smooth IDF ``ln((1 + n) / (1 + df)) + 1`` (sklearn parity, reference
    string_grouper.py:699-707 via TfidfVectorizer)."""
    return jnp.log((1.0 + n_docs) / (1.0 + df)) + 1.0


def _shard_pass2(encoder, corpus, keys, row_ids, vocab, width):
    """Shard-local value computation: map this shard's n-gram keys into the
    (replicated) global vocabulary, compute TF-IDF values and row norms from
    this shard's rows only, and pack a shard-local ELL block.  Consumes
    nothing but shard-local state + the replicated vocab/IDF -- on a
    multi-host mesh this runs entirely on the shard's host.

    The float32 branch reproduces the host encoder's sklearn rounding
    chain (corpus/tfidf.py ``_encode``) row-locally against the GLOBAL
    IDF, so shard blocks concatenate bitwise equal to a full local f32
    encode (the same argument as multihost_encode_shard's f32 branch)."""
    from ..corpus.tfidf import _ell_from_unique_pairs, _unique_row_term_counts

    n_terms = len(vocab)
    t_idx = np.searchsorted(vocab, keys)
    rows, terms, tf = _unique_row_term_counts(row_ids, t_idx, n_terms)
    if encoder.config.tfidf_matrix_dtype == np.float32:
        from ..corpus.tfidf import f32_row_values

        vals, inv = f32_row_values(
            rows, terms, tf, encoder.idf_.astype(np.float32), corpus.n_rows
        )
        ell = _ell_from_unique_pairs(
            rows, terms, vals, corpus.n_rows, n_terms, width=width
        )
        return ell, inv
    w = tf.astype(np.float64) * encoder.idf_[terms]
    norm_sq = np.bincount(rows, weights=w * w, minlength=corpus.n_rows)
    norm = np.sqrt(norm_sq)
    inv = np.zeros(corpus.n_rows, dtype=np.float64)
    nz = norm > 0
    inv[nz] = 1.0 / norm[nz]
    ell = _ell_from_unique_pairs(
        rows, terms, w * inv[rows], corpus.n_rows, n_terms, width=width
    )
    return ell, inv


def _shard_payload(encoder, corpus, inv64):
    """Shard-local half of the DeviceEncodeSrc: compact character codes of
    this shard's cleaned strings + f32 inverse norms.  The replicated
    tables (key->term id, idf32) come from ``encoder._device_tables()``."""
    code_lut, _table, _idf32, _base = encoder._device_tables()
    return code_lut[corpus.buf.astype(np.int64)], inv64.astype(np.float32)


def sharded_fit_transform(encoder, master, duplicates, mesh: Mesh):
    """Fit the TF-IDF encoder over a mesh-sharded corpus and encode both
    sides -- the distributed form of the vectorizer's DF pass (reference
    string_grouper.py:699-707; SURVEY section 2.B N1).

    Data locality contract (what each step may touch):

      1. The corpus splits into one contiguous shard of document ids per
         mesh device; every host-side pass below consumes ONE shard's
         strings at a time -- no whole-corpus token buffer, key array, or
         (row, term) list is ever materialized.
      2. Shard-local clean + tokenize.  Two scalar/vector facts must be
         agreed globally before local work can finish, and both are
         reductions over shard-local summaries (psum/pmax-shaped; tiny):
         the key-packing width (max codepoint -- one scalar) and the
         vocabulary (union of per-shard sorted unique key sets; vocab-sized,
         not corpus-sized -- the multi-host form is a sorted merge over
         DCN).
      3. Per-shard partial document-frequency vectors reduce ON DEVICE with
         ``psum`` over both mesh axes -- the only corpus-derived cross-shard
         traffic, |vocab| ints per shard.  The replicated IDF follows.
      4. Value computation, L2 norms, ELL packing, and the byte-level
         device-encode payload are shard-local again (``_shard_pass2`` /
         ``_shard_payload``); only the ELL block width is agreed first
         (one scalar pmax).

    The single-controller boundary: this process finally CONCATENATES the
    shard-local ELL blocks and payloads, because the host phase 2 (exact
    fp64 rescore of downloaded candidates, ops/matcher.py) runs on this
    controller.  On a true multi-host deployment that concat (and the
    rescore) would stay per-host; see docs/architecture.md "Multi-host
    status and DCN plan".

    Output is bitwise-identical to :meth:`TfidfEncoder.fit_transform_pair`
    for any mesh shape, including the attached ``DeviceEncodeSrc`` payload
    (tests/test_distributed.py).
    """
    from ..corpus.ngrams import (
        extract_packed_keys,
        extract_windows,
        packed_key_bits,
        windows_as_sortable_keys,
    )
    from ..corpus.preprocess import clean_corpus
    from ..corpus.tfidf import DeviceEncodeSrc, EllMatrix, _EMPTY_VOCAB_MSG

    n_m = len(master)
    n_docs = n_m + (0 if duplicates is None else len(duplicates))
    n_shards = int(mesh.devices.size)
    per = -(-max(n_docs, 1) // n_shards)

    def shard_strings(s: int) -> list:
        """One shard's slice of the virtual concat(master, duplicates) --
        reads only the rows it owns."""
        lo, hi = s * per, min((s + 1) * per, n_docs)
        if hi <= lo:
            return []
        out = list(master[max(lo, 0):min(hi, n_m)]) if lo < n_m else []
        if hi > n_m:
            out += list(duplicates[max(lo - n_m, 0):hi - n_m])
        return out

    # Shard-local pass 1: clean.  The key-packing width must be decided
    # GLOBALLY (a shard-local choice would drop another shard's wider
    # codepoints as out-of-vocabulary) -- one scalar pmax over the
    # shard-local maxima.
    corpora = [clean_corpus(shard_strings(s), encoder.config)
               for s in range(n_shards)]
    maxcp = max((int(c.buf.max(initial=0)) for c in corpora), default=0)
    bits0 = packed_key_bits(maxcp)
    if bits0 * encoder.config.ngram_size > 64:
        bits0 = None

    # Shard-local tokenize; keys are order-preserving packed n-grams, so
    # the union of per-shard sorted unique key sets IS the sklearn
    # vocabulary (vocab-sized merge, not corpus-sized).
    shard_tok = []
    shard_vocabs = []
    for corpus in corpora:
        if bits0 is not None:
            keys, row_ids, n_rows, _ = extract_packed_keys(
                corpus, encoder.config.ngram_size, bits0
            )
        else:
            win = extract_windows(corpus, encoder.config.ngram_size)
            keys, row_ids, n_rows = (
                windows_as_sortable_keys(win.windows), win.row_ids, win.n_rows
            )
        shard_tok.append((keys, row_ids))
        if len(keys):
            shard_vocabs.append(np.unique(keys))
    if not shard_vocabs:
        raise ValueError(_EMPTY_VOCAB_MSG)
    vocab = np.unique(np.concatenate(shard_vocabs))
    n_terms = len(vocab)

    # Shard-local partial DF -> device psum over the mesh: the only
    # corpus-derived cross-shard traffic (|vocab| ints per shard).
    from ..corpus.tfidf import _unique_row_term_counts

    df_local = np.zeros((n_shards, n_terms), dtype=np.int32)
    for s, (keys, row_ids) in enumerate(shard_tok):
        t_idx = np.searchsorted(vocab, keys)
        _, terms_u, _ = _unique_row_term_counts(row_ids, t_idx, n_terms)
        df_local[s] = np.bincount(terms_u, minlength=n_terms)
    dp, mp = mesh.devices.shape
    df_dev = jax.device_put(
        df_local.reshape(dp, mp, n_terms),
        jax.sharding.NamedSharding(mesh, P("dp", "mp")),
    )
    df_global = jax.jit(
        shard_map(
            lambda d: jax.lax.psum(d, ("dp", "mp")),
            mesh=mesh,
            in_specs=P("dp", "mp"),
            out_specs=P("dp", "mp"),
        ),
    )(df_dev)
    df = np.asarray(df_global)[0, 0].astype(np.int64)

    # Replicated IDF from the globally-reduced DF; value math identical to
    # the host encoder (incl. sklearn's per-step float32 rounding chain
    # when tfidf_matrix_dtype=float32 -- corpus/tfidf.py fit_transform).
    encoder.vocab_keys_ = vocab
    encoder._packed_bits = bits0
    encoder._dev_tables = None
    encoder.n_docs_ = n_docs
    if encoder.config.tfidf_matrix_dtype == np.float32:
        from ..corpus.tfidf import f32_idf

        encoder.idf_ = f32_idf(df, n_docs)
    else:
        encoder.idf_ = np.log((1.0 + n_docs) / (1.0 + df)) + 1.0

    # Shard-local pass 2: values + norms + ELL block + device payload.
    # The block width is agreed first (one scalar pmax over shard maxima)
    # so the blocks concatenate without re-padding.
    from ..corpus.tfidf import _round_up

    width = 8
    shard_rt = []
    for corpus, (keys, row_ids) in zip(corpora, shard_tok):
        t_idx = np.searchsorted(vocab, keys)
        rows_u, _, _ = _unique_row_term_counts(row_ids, t_idx, n_terms)
        cnt = np.bincount(rows_u, minlength=corpus.n_rows)
        width = max(width, _round_up(int(cnt.max(initial=0)), 8))
    # Device payload applies on the 8-bit-packable (post-clean ASCII)
    # float64 path -- the same eligibility as the native encoder's payload.
    make_payload = (
        bits0 == 8
        and encoder.config.tfidf_matrix_dtype != np.float32
        and os.environ.get("SG_TPU_DEVICE_ENCODE", "1") != "0"
    )
    parts_ell, parts_codes, parts_coff, parts_inv = [], [], [], []
    base_off = 0
    for corpus, (keys, row_ids) in zip(corpora, shard_tok):
        ell_s, inv_s = _shard_pass2(
            encoder, corpus, keys, row_ids, vocab, width
        )
        parts_ell.append(ell_s)
        if make_payload:
            codes_s, inv32_s = _shard_payload(encoder, corpus, inv_s)
            parts_codes.append(codes_s)
            parts_coff.append(corpus.offsets[:-1] + base_off)
            parts_inv.append(inv32_s)
            base_off += len(codes_s)

    both = EllMatrix(
        ids=np.concatenate([e.ids for e in parts_ell]),
        vals64=np.concatenate([e.vals64 for e in parts_ell]),
        n_terms=n_terms,
    )
    if make_payload:
        _lut, table, idf32, base = encoder._device_tables()
        src = DeviceEncodeSrc(
            flat_codes=np.concatenate(parts_codes),
            coff=np.concatenate(parts_coff + [[base_off]]).astype(np.int64),
            inv_norm=np.concatenate(parts_inv),
            table_id=table,
            idf32=idf32,
            base=base,
            ngram=encoder.config.ngram_size,
        )
        both = EllMatrix(ids=both.ids, vals64=both.vals64, n_terms=n_terms,
                         device_src=src)
    if duplicates is None:
        return both, both
    src = both.device_src
    m = EllMatrix(
        ids=both.ids[:n_m], vals64=both.vals64[:n_m], n_terms=n_terms,
        device_src=src.slice_rows(0, n_m) if src is not None else None,
    )
    d = EllMatrix(
        ids=both.ids[n_m:], vals64=both.vals64[n_m:], n_terms=n_terms,
        device_src=(
            src.slice_rows(n_m, both.n_rows) if src is not None else None
        ),
    )
    return m, d


# ------------------------------------------------------------------- matching
def _local_block(
    a_hash, b_hash_tiles, thr_eff, *, cand_c: int, k_tile: int,
    fused: bool = False,
):
    """Per-device body: local phase-1 + cross-shard candidate gather.

    ``fused`` runs the Pallas kernel (ops/pallas_kernels.p1_fused_closed2)
    as the per-device phase-1 body -- the same kernel the single-chip TPU
    path defaults to, bit-identical to the XLA tile body, so the mesh path
    stops leaving its ~30% phase-1 win on the floor (VERDICT r3 item 3).
    Candidates merge by concatenation (``all_gather`` over ``mp``) -- the
    collective form of the reference's ``zip_sp_matmul_topn`` combine
    (string_grouper.py:746); no re-sort is needed because the host scores
    every shipped candidate exactly.  Per-shard overflow state (max
    per-shard qualified count, smallest kept upper bound) reduces with
    ``pmax`` so the host driver's growth checks see the tightest per-shard
    bounds.
    """
    n_loc = b_hash_tiles.shape[0] * b_hash_tiles.shape[1]
    neg = jnp.float32(-jnp.inf)
    if fused:
        tile = b_hash_tiles.shape[1]
        ship, counts, tmax, bound, _mc = p1_fused_closed2(
            a_hash, b_hash_tiles.reshape(n_loc, -1), thr_eff,
            tile=tile, cand_c=cand_c,
        )
        cols_loc = jnp.where(
            ship >= 0, ship + jax.lax.axis_index("mp") * n_loc, -1
        )
    else:
        w_vals, w_cols, counts, tmax, bound = match_block(
            a_hash, b_hash_tiles, thr_eff, cand_c, k_tile
        )
        cols_loc = jnp.where(
            w_vals > neg, w_cols + jax.lax.axis_index("mp") * n_loc, -1
        )
    gc = jax.lax.all_gather(cols_loc, "mp")  # (mp, m, W)
    mp_sz, m, w = gc.shape
    cols = jnp.swapaxes(gc, 0, 1).reshape(m, mp_sz * w)
    # Per-shard maxima: a shard drops candidates only against its own caps
    # (cand_c and k_tile are per-shard widths), so the driver's growth
    # checks need the tightest per-shard values, not cross-shard sums.
    counts = jax.lax.pmax(counts, "mp")
    tmax = jax.lax.pmax(tmax, "mp")
    bound = jax.lax.pmax(bound, "mp")
    return cols, bound, counts, tmax


@partial(jax.jit, static_argnames=("mesh", "cand_c", "k_tile", "fused"))
def _dist_match(
    mesh: Mesh, a_hash_chunks, b_hash_tiles, thr_eff, cand_c: int,
    k_tile: int, fused: bool = False,
):
    """Sharded corpus phase 1: outer scan over left super-chunks, per-device
    local matching inside ``shard_map``."""

    def scan_over_chunks(a_chunks_loc, b_tiles_loc, thr):
        def chunk_body(_, a_hash):
            out = _local_block(
                a_hash, b_tiles_loc, thr, cand_c=cand_c, k_tile=k_tile,
                fused=fused,
            )
            return None, out

        _, (cols, ub_last, counts, tmax) = jax.lax.scan(
            chunk_body, None, a_chunks_loc
        )
        return cols, ub_last, counts, tmax, tmax.max()

    fn = shard_map(
        scan_over_chunks,
        mesh=mesh,
        in_specs=(
            P(None, "dp", None),  # a_hash_chunks (n_sc, chunk, d): rows over dp
            P("mp", None, None),  # b_hash_tiles
            P(),  # thr_eff
        ),
        out_specs=(
            P(None, "dp", None),
            P(None, "dp"),
            P(None, "dp"),
            P(None, "dp"),
            P(),
        ),
        check_vma=False,
    )
    return fn(a_hash_chunks, b_hash_tiles, thr_eff)


@partial(jax.jit, static_argnames=("budget",))
def _sort_compact(cols: jax.Array, budget: int):
    """Ragged-prefix compaction of the mesh-gathered candidate matrix.

    After the ``all_gather`` over ``mp`` each row is a concatenation of
    per-shard prefixes, so the valid entries are NOT one prefix; a per-row
    descending sort (sentinel -1 sinks to the end) restores the prefix
    invariant ``ops.matcher._compact_cols`` needs.  Candidate order within
    a row is irrelevant -- the host rescores every shipped pair exactly."""
    cols = -jnp.sort(-cols, axis=1)
    return _compact_cols(cols, budget)


def _phase1_distributed(
    left: EllMatrix,
    right: EllMatrix,
    is_self: bool,
    mesh: Mesh,
    hash_dim: int,
    left_chunk: int,
    right_tile: int,
    left_sel: Optional[np.ndarray] = None,
    right_sel: Optional[np.ndarray] = None,
):
    """Device-resident sharded hash matrices + phase-1 closures for the
    shared adaptive driver: ``run_stream`` (segmented whole-corpus pass,
    host scoring overlapping device matching) and ``run_rows`` (per-row
    hot-row escalation under the mesh) -- the same contract as the
    single-chip ``ops.matcher._phase1_single``, including the
    duplicate-collapse row selectors (unique rows gathered on device)."""
    from ..ops.matcher import _gather_pad_rows

    dp = mesh.shape["dp"]
    mp = mesh.shape["mp"]
    n_left = left.n_rows if left_sel is None else len(left_sel)
    n_right = right.n_rows if right_sel is None else len(right_sel)

    # Right rows: pad to mp shards of a whole number of tiles each.
    tile = min(right_tile, _next_pow2(max(-(-n_right // mp), 8)))
    n_loc = -(-n_right // (mp * tile)) * tile
    n_right_p = n_loc * mp
    if right_sel is None:
        b_hash = build_hash_matrix(right, n_right_p, hash_dim)
    else:
        b_full = build_hash_matrix(right, right.n_rows, hash_dim)
        idx = np.zeros(n_right_p, dtype=np.int32)
        idx[:n_right] = right_sel
        b_hash = _gather_pad_rows(b_full, jnp.asarray(idx), n_right, n_right_p)
    b_hash_tiles = b_hash.reshape(n_right_p // tile, tile, hash_dim)

    # Left rows: super-chunks of dp local chunks.
    chunk_loc = min(left_chunk, _next_pow2(max(-(-n_left // dp), 8)))
    sc = chunk_loc * dp
    n_left_p = -(-n_left // sc) * sc
    if is_self and n_left_p <= n_right_p:
        a_hash = b_hash[:n_left_p]
    elif left_sel is None:
        a_hash = build_hash_matrix(left, n_left_p, hash_dim)
    else:
        a_full = build_hash_matrix(left, left.n_rows, hash_dim)
        idx = np.zeros(n_left_p, dtype=np.int32)
        idx[:n_left] = left_sel
        a_hash = _gather_pad_rows(a_full, jnp.asarray(idx), n_left, n_left_p)

    # Segment the left super-chunks so host-side exact scoring of one
    # segment overlaps the device matching of the next (same policy as the
    # single-chip path).
    n_sc = n_left_p // sc
    n_seg = min(8, max(1, n_sc // 8))
    spg = -(-n_sc // n_seg)  # super-chunks per segment
    if n_sc % spg:
        extra = spg - n_sc % spg
        pad = jnp.zeros((extra * sc, hash_dim), a_hash.dtype)
        a_hash = jnp.concatenate([a_hash, pad])
        n_sc += extra
    a_hash_chunks = a_hash.reshape(n_sc, sc, hash_dim)
    n_seg = n_sc // spg
    seg_rows = spg * sc

    on_tpu = jax.devices()[0].platform == "tpu"

    def run_stream(thr_eff, cand_c, k_tile):
        thr = jnp.float32(thr_eff)
        # Fused Pallas per-device body (same eligibility as the single-chip
        # path; Pallas-in-shard_map is supported on TPU, the XLA body stays
        # the oracle on CPU meshes and for escalation widths).
        use_fused = (
            on_tpu
            and fused_enabled()
            and k_tile == 2
            and thr_eff > 0
            and p1_fused_supported(chunk_loc, n_loc, hash_dim, tile, cand_c)
        )
        do_compact = thr_eff > 0 and cand_c > _SHIP_BUDGET_ROWS
        budget = -(-seg_rows * _SHIP_BUDGET_ROWS // 1024) * 1024
        futs = []
        for g in range(n_seg):
            cols, bound, counts, tmax, max_cnt = _dist_match(
                mesh, a_hash_chunks[g * spg : (g + 1) * spg],
                b_hash_tiles, thr, cand_c, k_tile, fused=use_fused,
            )
            cols2 = cols.reshape(-1, cols.shape[-1])
            if do_compact:
                flat, n_i = _sort_compact(cols2, budget)
                wire = _join_wire(
                    _pack_meta(counts, tmax, bound, n_i),
                    _ship_cols(flat, n_right_p),
                )
            else:
                wire = _pack_meta(counts, tmax, bound)
            futs.append((wire, cols2, do_compact, max_cnt))
        yield from _consume_stream(
            futs, budget, n_right_p, seg_rows, n_left, n_right
        )

    a_flat = a_hash_chunks.reshape(-1, hash_dim)

    def run_rows(row_idx: np.ndarray, thr_eff, cand_c, k_tile,
                 budget_hint: Optional[int] = None, defer: bool = False):
        """Hot-row escalation under the mesh: device-gather the unsafe
        rows' hash vectors and re-match only them at larger per-shard
        widths -- the mesh analog of matcher.py's ``run_rows``, so one
        skewed row never forces a full-corpus re-match.  ``defer=True``
        returns a ``finish()`` closure (same contract as matcher.py) so
        the driver dispatches every bucket before blocking on downloads."""
        m = len(row_idx)
        m_p = -(-m // sc) * sc
        idx = np.zeros(m_p, dtype=np.int32)
        idx[:m] = row_idx
        a_sel = a_flat[jnp.asarray(idx)]
        if m_p > m:
            valid = (jnp.arange(m_p) < m)[:, None]
            a_sel = jnp.where(valid, a_sel, 0)
        a_sel = a_sel.reshape(-1, sc, hash_dim)
        cols, ub_last, counts, _tmax, max_cnt = _dist_match(
            mesh, a_sel, b_hash_tiles, jnp.float32(thr_eff), cand_c, k_tile
        )
        cols2 = cols.reshape(-1, cols.shape[-1])
        w = cols2.shape[-1]
        wire = None
        budget = 0
        if (
            thr_eff > 0
            and budget_hint is not None
            and m_p * w > _ROWS_COMPACT_MIN
        ):
            # counts are per-shard maxima, so the total valid count can
            # reach mp times the hint; overflow still falls back safely.
            budget = _next_pow2(budget_hint * mp + 8)
            if budget < m_p * w:
                flat, n_i = _sort_compact(cols2, budget)
                wire = _join_wire(
                    _pack_meta(ub_last, n_i), _ship_cols(flat, n_right_p)
                )

        def finish():
            return _finish_rows(
                wire, ub_last, cols2, m, m_p, budget, n_right_p, n_right
            )

        return finish if defer else finish()

    return run_stream, run_rows, n_loc, tile


def distributed_topn_cosine_matches(
    left: EllMatrix,
    right: Optional[EllMatrix],
    min_similarity: float,
    max_n_matches: Optional[int],
    mesh: Mesh,
    *,
    force_symmetries: bool = True,
    hash_dim: int = 512,
    left_chunk: int = 4096,
    right_tile: int = 4096,
    score_dtype=np.float64,
    left_codes: Optional[np.ndarray] = None,
    right_codes: Optional[np.ndarray] = None,
) -> MatchPairs:
    """Mesh-sharded version of ops.matcher.topn_cosine_matches.

    Produces the identical pair set for any mesh shape (the multi-chip analog
    of the reference's blocked == unblocked equivalence, reference test
    test_string_grouper.py:191-241).  ``left_codes``/``right_codes`` enable
    the same duplicate-collapse layer as the single-chip matcher (see
    ops/matcher.py) -- the collapse/expansion happens on the controller,
    the unique-row scan under the mesh.
    """
    from ..ops.matcher import match_with_collapse

    is_self = right is None
    right_m = left if is_self else right
    width = -(-max(left.width, right_m.width, 8) // 8) * 8
    left = _pad_width(left, width)
    right_m = left if is_self else _pad_width(right_m, width)
    max_n = right_m.n_rows if max_n_matches is None else max_n_matches

    pairs = match_with_collapse(
        left, right_m, is_self, min_similarity, max_n, score_dtype,
        left_codes, right_codes,
        lambda ls, rs: _phase1_distributed(
            left, right_m, is_self, mesh, hash_dim, left_chunk, right_tile,
            left_sel=ls, right_sel=rs,
        ),
    )
    stats = pairs.stats
    if is_self and force_symmetries:
        pairs = apply_self_join_fixups(pairs, left.n_rows)
    else:
        pairs = order_like_reference_csr(pairs)
    pairs.stats = stats  # keep THIS fit's breakdown attached (engine reads it)
    return pairs
