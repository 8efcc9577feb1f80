"""Multi-chip sharded matching over a ``jax.sharding.Mesh``.

The reference's out-of-core 2-D block decomposition (``n_blocks``, reference
string_grouper/string_grouper.py:709-752) becomes a 2-D device mesh:

  * axis ``dp`` -- left (master) rows, data-parallel: each mesh row processes
    its own chunk of left strings;
  * axis ``mp`` -- right (candidate) rows: each mesh column holds a shard of
    the right ELL matrix and of its hashed projection.

Per device, the single-chip two-phase matcher (ops/matcher.py
``match_block``) runs on the local (left-chunk x right-shard) block.  The
per-shard top-k results are merged with an ``all_gather`` over ``mp``
followed by a top-k of the concatenation -- the collective form of the
reference's ``zip_sp_matmul_topn`` merge (string_grouper.py:746).
Qualified-candidate counts are ``psum``'d over ``mp`` so the host-side
adaptive candidate-width loop sees global counts, preserving the single-chip
no-drop guarantee: shard count never changes the returned pair set.

Document-frequency counts for a corpus sharded over devices reduce with
``jax.lax.psum`` (:func:`distributed_df_counts`), yielding the replicated IDF
vector -- the collective form of TfidfVectorizer's DF pass (reference
string_grouper.py:699-707) for corpora too large for one host.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..corpus.tfidf import EllMatrix
from ..ops.hashing import hashed_projection
from ..ops.matcher import (
    MatchPairs,
    _next_pow2,
    _pad_width,
    _UB_REL_SLACK,
    _UB_ABS_SLACK,
    _F32_TOL,
    apply_self_join_fixups,
    match_block,
    order_like_reference_csr,
    select_matches,
)

__all__ = [
    "make_mesh",
    "distributed_df_counts",
    "replicated_idf",
    "distributed_candidate_topk",
    "distributed_topn_cosine_matches",
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


# ------------------------------------------------------------------- matching
def _local_block(
    a_ids, a_vals, a_hash, b_ids, b_vals, b_hash_tiles, thr_eff,
    *, cand_c: int, top_k: int,
):
    """Per-device body: local match + cross-shard top-k merge."""
    n_loc = b_ids.shape[0]
    kvals, kcols, counts = match_block(
        a_ids, a_vals, a_hash, b_ids, b_vals, b_hash_tiles, thr_eff,
        cand_c, top_k,
    )
    kcols = kcols + jax.lax.axis_index("mp") * n_loc
    # zip-merge across right shards: gather every shard's top-k and merge-sort
    # the concatenation (descending).  The full mp*k width is kept -- for
    # min_similarity <= 0 every positive-similarity pair must ship, and the
    # global capacity for that is mp shards x k rows, not k.
    gv = jax.lax.all_gather(kvals, "mp")  # (mp, m, K)
    gc = jax.lax.all_gather(kcols, "mp")
    mp_sz = gv.shape[0]
    m = gv.shape[1]
    gv = jnp.swapaxes(gv, 0, 1).reshape(m, mp_sz * top_k)
    gc = jnp.swapaxes(gc, 0, 1).reshape(m, mp_sz * top_k)
    mv, mi = jax.lax.top_k(gv, mp_sz * top_k)
    mc = jnp.take_along_axis(gc, mi, axis=1)
    counts = jax.lax.psum(counts, "mp")
    return mv, mc, counts


@partial(jax.jit, static_argnames=("mesh", "cand_c", "top_k"))
def _dist_match(
    mesh: Mesh,
    a_ids, a_vals, a_hash, b_ids, b_vals, b_hash_tiles, thr_eff,
    cand_c: int, top_k: int,
):
    fn = shard_map(
        partial(_local_block, cand_c=cand_c, top_k=top_k),
        mesh=mesh,
        in_specs=(
            P("dp", None),  # a_ids
            P("dp", None),  # a_vals
            P("dp", None),  # a_hash
            P("mp", None),  # b_ids
            P("mp", None),  # b_vals
            P("mp", None, None),  # b_hash_tiles
            P(),  # thr_eff
        ),
        out_specs=(P("dp", None), P("dp", None), P("dp")),
        check_vma=False,
    )
    return fn(a_ids, a_vals, a_hash, b_ids, b_vals, b_hash_tiles, thr_eff)


def distributed_candidate_topk(
    left: EllMatrix,
    right: EllMatrix,
    min_similarity: float,
    max_n: int,
    mesh: Mesh,
    hash_dim: int = 1024,
    topn_slack: int = 8,
    left_chunk: int = 4096,
    right_tile: int = 4096,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sharded equivalent of ops.matcher.candidate_topk: same return contract
    (per-left-row exact-fp32 top-K scores + columns), mesh-size invariant."""
    dp = mesh.shape["dp"]
    mp = mesh.shape["mp"]

    width = _next_pow2(max(left.width, right.width, 8))
    left = _pad_width(left, width)
    right = _pad_width(right, width)
    n_left, n_right = left.n_rows, right.n_rows

    # Right rows: pad to mp shards of a whole number of tiles each.
    tile = min(right_tile, _next_pow2(max(-(-n_right // mp), 8)))
    n_loc = -(-n_right // (mp * tile)) * tile
    n_right_p = n_loc * mp
    b_ids_h = np.full((n_right_p, width), -1, dtype=np.int32)
    b_vals_h = np.zeros((n_right_p, width), dtype=np.float32)
    b_ids_h[:n_right] = right.ids
    b_vals_h[:n_right] = right.vals64.astype(np.float32)
    b_ids, b_vals = jnp.asarray(b_ids_h), jnp.asarray(b_vals_h)
    b_hash_tiles = (
        hashed_projection(b_ids, b_vals, hash_dim)
        .astype(jnp.bfloat16)
        .reshape(n_right_p // tile, tile, hash_dim)
    )
    a_ids_h, a_vals_h = left.ids, left.vals64.astype(np.float32)

    if min_similarity > 0:
        thr_eff = np.float32(min_similarity * (1 - _UB_REL_SLACK) - _UB_ABS_SLACK)
        c0 = min(n_loc, max(64, _next_pow2(4 * min(max_n, n_right))))
    else:
        thr_eff = np.float32(-np.inf)
        c0 = n_loc

    max_n_eff = min(max_n, n_right)
    k0 = min(c0, _next_pow2(max_n_eff + topn_slack))

    # Left rows: super-chunks of dp local chunks.
    chunk_loc = min(left_chunk, _next_pow2(max(-(-n_left // dp), 8)))
    chunk = chunk_loc * dp
    all_vals, all_cols = [], []
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
            kvals, kcols, counts = _dist_match(
                mesh, a_ids_d, a_vals_d, a_hash, b_ids, b_vals, b_hash_tiles,
                jnp.float32(thr_eff), c, k,
            )
            counts = np.asarray(counts[:m])
            # counts are psum'd over shards (global).  Per-shard qualified
            # columns never exceed the global count, so c >= counts.max()
            # covers every shard; and once c == n_loc each shard retains all
            # of its columns regardless of the global count.
            if counts.max(initial=0) > c and c < n_loc:
                c = min(n_loc, _next_pow2(int(counts.max())))
                k = min(c, k)
                continue
            kv = np.asarray(kvals[:m])
            if k < c:
                # kv[:, k-1] is the global k-th best; every shard's dropped
                # candidates are <= its local k-th <= the global k-th, so the
                # single-chip unsafe test covers all shards.
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

    kmax = max(v.shape[1] for v in all_vals)
    for i in range(len(all_vals)):
        pad = kmax - all_vals[i].shape[1]
        if pad:
            all_vals[i] = np.pad(
                all_vals[i], ((0, 0), (0, pad)), constant_values=-np.inf
            )
            all_cols[i] = np.pad(all_cols[i], ((0, 0), (0, pad)))
    return np.concatenate(all_vals), np.concatenate(all_cols)


def distributed_topn_cosine_matches(
    left: EllMatrix,
    right: Optional[EllMatrix],
    min_similarity: float,
    max_n_matches: Optional[int],
    mesh: Mesh,
    *,
    force_symmetries: bool = True,
    hash_dim: int = 1024,
    topn_slack: int = 8,
    left_chunk: int = 4096,
    right_tile: int = 4096,
) -> MatchPairs:
    """Mesh-sharded version of ops.matcher.topn_cosine_matches.

    Produces the identical pair set for any mesh shape (the multi-chip analog
    of the reference's blocked == unblocked equivalence, reference test
    test_string_grouper.py:191-241).
    """
    is_self = right is None
    right_m = left if is_self else right
    max_n = right_m.n_rows if max_n_matches is None else max_n_matches
    kvals, kcols = distributed_candidate_topk(
        left, right_m, min_similarity, max_n, mesh,
        hash_dim, topn_slack, left_chunk, right_tile,
    )
    pairs = select_matches(left, right_m, kvals, kcols, min_similarity, max_n)
    if is_self and force_symmetries:
        return apply_self_join_fixups(pairs, left.n_rows)
    return order_like_reference_csr(pairs)
