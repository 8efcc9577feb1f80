"""Top-n cosine matcher: the TPU-native replacement of sparse_dot_topn.

Pipeline (replaces reference ``_build_matches``, string_grouper.py:709-752):

  phase 1 (MXU): hashed upper-bound scores ``A_hash @ B_hash.T`` for a chunk
      of left rows against all right rows; threshold on the upper bound keeps
      every true match (see ops/hashing.py for the bound proof) and selects
      per-row candidate columns via ``lax.top_k``.
  phase 2 (VPU): exact fp32 rescore of the gathered candidate ELL rows.
  phase 3 (host): float64 refinement of decision boundaries (threshold
      crossings and top-n cuts), exact per-row top-n selection with
      deterministic tie-breaking (higher similarity first, then smaller
      column), and self-join fix-ups (exact-1 diagonal + symmetrization,
      reference string_grouper.py:419-427,954-964).

The adaptive C (candidate width) / K (shipped-per-row) loop guarantees no
qualifying pair is dropped: C grows until it covers every upper-bound-
qualified column, K grows while the K-th shipped score could still influence
the top-n cut.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..corpus.tfidf import EllMatrix
from .hashing import hashed_projection
from .rescore import rescore_gathered, rescore_pairs_fp64

# Pairs below this total are fully rescored in float64 on the host (covers
# conformance-scale inputs); above it only decision boundaries are refined.
FULL_FP64_RESCORE_LIMIT = 2_000_000
# fp32-vs-fp64 decision tolerance.
_F32_TOL = 2e-6
# Relative slack applied to the phase-1 upper-bound threshold to absorb
# reduced-precision matmul error (bf16 passes on TPU).
_UB_REL_SLACK = 0.02
_UB_ABS_SLACK = 1e-4


@dataclass
class MatchPairs:
    """Long-format match list (positional indices), reference
    ``_matches_list`` equivalent (string_grouper.py:755-763)."""

    rows: np.ndarray  # int64
    cols: np.ndarray  # int64
    sims: np.ndarray  # float64
    true_max_n_matches: int


def _next_pow2(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


def _ub_topk_scan(
    a_hash: jax.Array,  # (m, d) bf16
    b_hash_tiles: jax.Array,  # (n_tiles, tile, d) bf16
    thr_eff: jax.Array,  # f32 scalar
    cand_c: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Tiled phase-1 filter: scan over right tiles, per tile an MXU matmul of
    the hashed projections (bf16 inputs, f32 accumulation), threshold on the
    upper bound, tile-local top-k, and a running top-k merge.

    The running merge is the single-chip form of the reference's
    ``zip_sp_matmul_topn`` block combine (string_grouper.py:746): top-k of
    concatenated per-tile top-k results.  Returns (ub_vals, cols, counts).
    """
    m = a_hash.shape[0]
    tile = b_hash_tiles.shape[1]
    neg = jnp.float32(-jnp.inf)
    tk = min(cand_c, tile)

    offsets = jnp.arange(b_hash_tiles.shape[0], dtype=jnp.int32) * tile

    def body_abs(carry, xs):
        b_tile, off = xs
        run_vals, run_cols, counts = carry
        ub = jnp.dot(a_hash, b_tile.T, preferred_element_type=jnp.float32)
        ubm = jnp.where(ub >= thr_eff, ub, neg)
        counts = counts + (ubm > neg).sum(axis=1, dtype=jnp.int32)
        tv, ti = jax.lax.top_k(ubm, tk)
        cat_v = jnp.concatenate([run_vals, tv], axis=1)
        cat_c = jnp.concatenate([run_cols, ti + off], axis=1)
        mv, mi = jax.lax.top_k(cat_v, cand_c)
        mc = jnp.take_along_axis(cat_c, mi, axis=1)
        return (mv, mc, counts), None

    init = (
        jnp.full((m, cand_c), neg, jnp.float32),
        jnp.zeros((m, cand_c), jnp.int32),
        jnp.zeros((m,), jnp.int32),
    )
    (run_vals, run_cols, counts), _ = jax.lax.scan(
        body_abs, init, (b_hash_tiles, offsets)
    )
    return run_vals, run_cols, counts


def match_block(
    a_ids: jax.Array,  # (m, La) int32
    a_vals: jax.Array,  # (m, La) f32
    a_hash: jax.Array,  # (m, d) bf16
    b_ids: jax.Array,  # (n, Lb) int32
    b_vals: jax.Array,  # (n, Lb) f32
    b_hash_tiles: jax.Array,  # (n_tiles, tile, d) bf16
    thr_eff: jax.Array,  # f32 scalar
    cand_c: int,
    top_k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One left block against one right block (all its tiles).  Returns
    (scores, cols, counts): per-row top_k exact-fp32 scores (desc), their
    column ids local to this right block, and the per-row count of
    upper-bound-qualified columns (for adaptive C).

    Pure function: jitted directly for the single-chip path and called inside
    ``shard_map`` by the distributed matcher (parallel/distributed.py), where
    the right block is one device's shard.
    """
    neg = jnp.float32(-jnp.inf)
    ub_vals, cand, counts = _ub_topk_scan(a_hash, b_hash_tiles, thr_eff, cand_c)
    cand_valid = ub_vals > neg

    gathered_ids = b_ids[cand]  # (m, C, Lb)
    gathered_vals = b_vals[cand]
    score = rescore_gathered(a_ids, a_vals, gathered_ids, gathered_vals)
    # A pair qualifies only if it shares at least one n-gram (score > 0);
    # hash-collision-only candidates rescore to exactly 0 and are dropped,
    # matching the reference's sparse nonzero-structure semantics.
    score = jnp.where(cand_valid & (score > 0), score, neg)
    kvals, kidx = jax.lax.top_k(score, top_k)
    kcols = jnp.take_along_axis(cand, kidx, axis=1)
    return kvals, kcols, counts


_match_chunk = partial(jax.jit, static_argnames=("cand_c", "top_k"))(match_block)


def _as_f32_device(ell: EllMatrix) -> Tuple[jax.Array, jax.Array]:
    return jnp.asarray(ell.ids), jnp.asarray(ell.vals64.astype(np.float32))


def _pad_width(ell: EllMatrix, width: int) -> EllMatrix:
    if ell.width == width:
        return ell
    pad = width - ell.width
    ids = np.pad(ell.ids, ((0, 0), (0, pad)), constant_values=-1)
    vals = np.pad(ell.vals64, ((0, 0), (0, pad)))
    return EllMatrix(ids=ids, vals64=vals, n_terms=ell.n_terms)


def candidate_topk(
    left: EllMatrix,
    right: EllMatrix,
    min_similarity: float,
    max_n: int,
    hash_dim: int,
    topn_slack: int,
    left_chunk: int,
    right_tile: int = 4096,
) -> Tuple[np.ndarray, np.ndarray]:
    """Run the device phases over all left chunks.

    Returns ``(kvals, kcols)`` of shape (n_left, K): per-row exact-fp32
    scores (descending; -inf = no candidate) and their right-row indices.
    """
    # Bucket shapes to powers of two to bound the number of compiled
    # programs: pad ELL width, right-row count, and left chunks.  Padding
    # rows carry ids=-1 / vals=0, so they hash to zero vectors and rescore
    # to 0, and are dropped by the score>0 qualifier.
    width = _next_pow2(max(left.width, right.width, 8))
    left = _pad_width(left, width)
    right = _pad_width(right, width)
    n_left, n_right = left.n_rows, right.n_rows
    # Pad right rows to a whole number of phase-1 tiles.
    tile = min(right_tile, _next_pow2(max(n_right, 8)))
    n_right_p = -(-n_right // tile) * tile

    b_ids_h = np.full((n_right_p, width), -1, dtype=np.int32)
    b_vals_h = np.zeros((n_right_p, width), dtype=np.float32)
    b_ids_h[:n_right] = right.ids
    b_vals_h[:n_right] = right.vals64.astype(np.float32)
    b_ids, b_vals = jnp.asarray(b_ids_h), jnp.asarray(b_vals_h)
    # bf16 hashed projections: the UB threshold carries a relative slack that
    # absorbs the bf16 rounding of the MXU inputs (accumulation stays f32).
    b_hash_tiles = (
        hashed_projection(b_ids, b_vals, hash_dim)
        .astype(jnp.bfloat16)
        .reshape(n_right_p // tile, tile, hash_dim)
    )
    a_ids_h, a_vals_h = left.ids, left.vals64.astype(np.float32)

    if min_similarity > 0:
        thr_eff = np.float32(
            min_similarity * (1 - _UB_REL_SLACK) - _UB_ABS_SLACK
        )
        c0 = min(n_right_p, max(64, _next_pow2(4 * min(max_n, n_right))))
    else:
        thr_eff = np.float32(-np.inf)
        c0 = n_right_p

    max_n_eff = min(max_n, n_right)
    k0 = min(c0, _next_pow2(max_n_eff + topn_slack))

    chunk = min(left_chunk, _next_pow2(max(n_left, 8)))
    all_vals = []
    all_cols = []
    for s in range(0, n_left, chunk):
        e = min(s + chunk, n_left)
        m = e - s
        a_ids = np.full((chunk, width), -1, dtype=np.int32)
        a_vals = np.zeros((chunk, width), dtype=np.float32)
        a_ids[:m] = a_ids_h[s:e]
        a_vals[:m] = a_vals_h[s:e]
        a_ids_d = jnp.asarray(a_ids)
        a_vals_d = jnp.asarray(a_vals)
        a_hash = hashed_projection(a_ids_d, a_vals_d, hash_dim).astype(
            jnp.bfloat16
        )

        c, k = c0, k0
        while True:
            kvals, kcols, counts = _match_chunk(
                a_ids_d, a_vals_d, a_hash, b_ids, b_vals, b_hash_tiles,
                jnp.float32(thr_eff), c, k,
            )
            counts = np.asarray(counts[:m])
            if counts.max(initial=0) > c:
                c = min(n_right_p, _next_pow2(int(counts.max())))
                k = min(c, k)
                continue
            kv = np.asarray(kvals[:m])
            if k < c and k < n_right:
                # The K-th shipped score may still qualify and sit within
                # fp32 tolerance of the top-n cut: ship more.
                cut = kv[:, min(max_n_eff, k) - 1]
                kth = kv[:, k - 1]
                qual_low = (min_similarity - _F32_TOL) if min_similarity > 0 else 0.0
                unsafe = (kth >= qual_low) & (
                    (max_n_eff > k) | (kth >= cut - _F32_TOL)
                )
                if unsafe.any():
                    k = min(c, k * 2)
                    continue
            break
        all_vals.append(kv)
        all_cols.append(np.asarray(kcols[:m]))

    # Ragged K across chunks: pad to the max.
    kmax = max(v.shape[1] for v in all_vals)
    for i in range(len(all_vals)):
        pad = kmax - all_vals[i].shape[1]
        if pad:
            all_vals[i] = np.pad(all_vals[i], ((0, 0), (0, pad)), constant_values=-np.inf)
            all_cols[i] = np.pad(all_cols[i], ((0, 0), (0, pad)))
    return np.concatenate(all_vals), np.concatenate(all_cols)


def select_matches(
    left: EllMatrix,
    right: EllMatrix,
    kvals: np.ndarray,
    kcols: np.ndarray,
    min_similarity: float,
    max_n: int,
) -> MatchPairs:
    """Float64 boundary refinement + exact per-row top-n selection."""
    n_left, k = kvals.shape
    valid = np.isfinite(kvals)
    rows = np.broadcast_to(np.arange(n_left, dtype=np.int64)[:, None], kvals.shape)

    rows_f = rows[valid]
    cols_f = kcols[valid].astype(np.int64)
    s32 = kvals[valid].astype(np.float64)

    if len(rows_f) <= FULL_FP64_RESCORE_LIMIT:
        sims = rescore_pairs_fp64(left, right, rows_f, cols_f)
    else:
        sims = s32.copy()
        # Refine only decision boundaries in fp64.
        cut_idx = min(max_n, k) - 1
        row_cut = np.where(valid[:, cut_idx], kvals[:, cut_idx], -np.inf)
        tol = _F32_TOL * max(1.0, abs(min_similarity))
        ambiguous = (np.abs(s32 - min_similarity) <= tol) | (
            np.abs(s32 - row_cut[rows_f]) <= _F32_TOL
        )
        if ambiguous.any():
            sims[ambiguous] = rescore_pairs_fp64(
                left, right, rows_f[ambiguous], cols_f[ambiguous]
            )

    qualify = (sims > 0) & (sims >= min_similarity)
    rows_q, cols_q, sims_q = rows_f[qualify], cols_f[qualify], sims[qualify]

    # Per-row top-n, deterministic: similarity desc, then column asc.
    order = np.lexsort((cols_q, -sims_q, rows_q))
    rows_s, cols_s, sims_s = rows_q[order], cols_q[order], sims_q[order]
    if len(rows_s):
        new_row = np.r_[True, rows_s[1:] != rows_s[:-1]]
        grp_start = np.maximum.accumulate(
            np.where(new_row, np.arange(len(rows_s)), 0)
        )
        rank = np.arange(len(rows_s)) - grp_start
        keep = rank < max_n
        rows_s, cols_s, sims_s = rows_s[keep], cols_s[keep], sims_s[keep]
        true_max = int(np.bincount(rows_s, minlength=n_left).max(initial=0))
    else:
        true_max = 0
    return MatchPairs(rows=rows_s, cols=cols_s, sims=sims_s, true_max_n_matches=true_max)


def apply_self_join_fixups(pairs: MatchPairs, n: int) -> MatchPairs:
    """Exact-1 diagonal + symmetric closure for self-joins
    (reference string_grouper.py:419-427, :954-964)."""
    rows, cols, sims = pairs.rows, pairs.cols, pairs.sims
    off = rows != cols
    rows, cols, sims = rows[off], cols[off], sims[off]
    # Symmetric closure: emit each unordered pair in both directions with one
    # value (our scores are symmetric by construction).
    key_fwd = rows * n + cols
    key_rev = cols * n + rows
    all_keys = np.concatenate([key_fwd, key_rev])
    all_sims = np.concatenate([sims, sims])
    uniq, idx = np.unique(all_keys, return_index=True)
    rows_u = uniq // n
    cols_u = uniq % n
    sims_u = all_sims[idx]
    # Diagonal forced to exactly 1 for every row (_fix_diagonal, :954-958).
    diag = np.arange(n, dtype=np.int64)
    rows_o = np.concatenate([rows_u, diag])
    cols_o = np.concatenate([cols_u, diag])
    sims_o = np.concatenate([sims_u, np.ones(n)])
    order = np.lexsort((cols_o, rows_o))
    return MatchPairs(
        rows=rows_o[order],
        cols=cols_o[order],
        sims=sims_o[order],
        true_max_n_matches=pairs.true_max_n_matches,
    )


def order_like_reference_csr(pairs: MatchPairs) -> MatchPairs:
    """Order pairs the way the reference's value-sorted CSR storage lists
    them: row-major, similarity descending within row, column ascending on
    ties (sp_matmul_topn ``sort=True``)."""
    order = np.lexsort((pairs.cols, -pairs.sims, pairs.rows))
    return MatchPairs(
        rows=pairs.rows[order],
        cols=pairs.cols[order],
        sims=pairs.sims[order],
        true_max_n_matches=pairs.true_max_n_matches,
    )


def topn_cosine_matches(
    left: EllMatrix,
    right: Optional[EllMatrix],
    min_similarity: float,
    max_n_matches: Optional[int],
    *,
    force_symmetries: bool = True,
    hash_dim: int = 1024,
    topn_slack: int = 8,
    left_chunk: int = 4096,
    right_tile: int = 4096,
) -> MatchPairs:
    """Full matcher: returns the reference-equivalent matches list.

    ``right=None`` means self-join (reference: duplicate_matrix = master
    matrix, string_grouper.py:693-695).
    """
    is_self = right is None
    right_m = left if is_self else right
    max_n = right_m.n_rows if max_n_matches is None else max_n_matches
    kvals, kcols = candidate_topk(
        left, right_m, min_similarity, max_n, hash_dim, topn_slack,
        left_chunk, right_tile,
    )
    pairs = select_matches(left, right_m, kvals, kcols, min_similarity, max_n)
    if is_self and force_symmetries:
        return apply_self_join_fixups(pairs, left.n_rows)
    return order_like_reference_csr(pairs)
