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
every shipped candidate exactly.  Qualified-candidate
counts are ``psum``'d over ``mp`` so the host-side adaptive candidate-width
loop sees global counts, preserving the single-chip no-drop guarantee:
shard count never changes the returned pair set.  Exact float64 scoring of
the shipped candidates is the same host phase 2 as the single-chip path.

Document-frequency counts for a corpus sharded over devices reduce with
``jax.lax.psum`` (:func:`distributed_df_counts`), yielding the replicated
IDF vector -- the collective form of TfidfVectorizer's DF pass (reference
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
from ..ops.matcher import (
    MatchPairs,
    _next_pow2,
    _pad_width,
    _pairs_from_ship,
    adaptive_topn,
    apply_self_join_fixups,
    build_hash_matrix,
    initial_cand_c,
    initial_k_tile,
    match_block,
    order_like_reference_csr,
)

__all__ = [
    "make_mesh",
    "distributed_df_counts",
    "replicated_idf",
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
def _local_block(a_hash, b_hash_tiles, thr_eff, *, cand_c: int, k_tile: int):
    """Per-device body: local phase-1 + cross-shard candidate gather.

    Candidates merge by concatenation (``all_gather`` over ``mp``) -- the
    collective form of the reference's ``zip_sp_matmul_topn`` combine
    (string_grouper.py:746); no re-sort is needed because the host scores
    every shipped candidate exactly.  Per-shard overflow state (max
    per-shard qualified count, smallest kept upper bound) reduces with
    ``pmax`` so the host driver's growth checks see the tightest per-shard
    bounds.
    """
    n_loc = b_hash_tiles.shape[0] * b_hash_tiles.shape[1]
    w_vals, w_cols, counts, max_cnt, bound = match_block(
        a_hash, b_hash_tiles, thr_eff, cand_c, k_tile
    )
    neg = jnp.float32(-jnp.inf)
    cols_loc = jnp.where(
        w_vals > neg, w_cols + jax.lax.axis_index("mp") * n_loc, -1
    )
    gc = jax.lax.all_gather(cols_loc, "mp")  # (mp, m, W)
    mp_sz, m, w = gc.shape
    cols = jnp.swapaxes(gc, 0, 1).reshape(m, mp_sz * w)
    # Per-shard maxima: a shard drops candidates only against its own caps.
    counts = jax.lax.pmax(counts, "mp")
    bound = jax.lax.pmax(bound, "mp")
    max_cnt = jax.lax.pmax(max_cnt, ("dp", "mp"))
    return cols, bound, counts, max_cnt


@partial(jax.jit, static_argnames=("mesh", "cand_c", "k_tile"))
def _dist_match(
    mesh: Mesh, a_hash_chunks, b_hash_tiles, thr_eff, cand_c: int, k_tile: int
):
    """Sharded corpus phase 1: outer scan over left super-chunks, per-device
    local matching inside ``shard_map``."""

    def scan_over_chunks(a_chunks_loc, b_tiles_loc, thr):
        def chunk_body(_, a_hash):
            out = _local_block(
                a_hash, b_tiles_loc, thr, cand_c=cand_c, k_tile=k_tile
            )
            return None, out

        _, (cols, ub_last, counts, max_cnt) = jax.lax.scan(
            chunk_body, None, a_chunks_loc
        )
        return cols, ub_last, counts, max_cnt.max()

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
            P(),
        ),
        check_vma=False,
    )
    return fn(a_hash_chunks, b_hash_tiles, thr_eff)


def _phase1_distributed(
    left: EllMatrix,
    right: EllMatrix,
    is_self: bool,
    mesh: Mesh,
    hash_dim: int,
    left_chunk: int,
    right_tile: int,
):
    """Device-resident sharded hash matrices + phase-1 closure for the
    shared adaptive driver."""
    dp = mesh.shape["dp"]
    mp = mesh.shape["mp"]
    n_left, n_right = left.n_rows, right.n_rows

    # Right rows: pad to mp shards of a whole number of tiles each.
    tile = min(right_tile, _next_pow2(max(-(-n_right // mp), 8)))
    n_loc = -(-n_right // (mp * tile)) * tile
    n_right_p = n_loc * mp
    n_tiles_loc = n_loc // tile
    b_hash = build_hash_matrix(right, n_right_p, hash_dim)
    b_hash_tiles = b_hash.reshape(n_right_p // tile, tile, hash_dim)

    # Left rows: super-chunks of dp local chunks.
    chunk_loc = min(left_chunk, _next_pow2(max(-(-n_left // dp), 8)))
    sc = chunk_loc * dp
    n_left_p = -(-n_left // sc) * sc
    if is_self and n_left_p <= n_right_p:
        a_hash = b_hash[:n_left_p]
    else:
        a_hash = build_hash_matrix(left, n_left_p, hash_dim)
    a_hash_chunks = a_hash.reshape(n_left_p // sc, sc, hash_dim)

    def run_stream(thr_eff, cand_c, k_tile):
        cols, ub_last, counts, max_cnt = _dist_match(
            mesh, a_hash_chunks, b_hash_tiles, jnp.float32(thr_eff),
            cand_c, k_tile,
        )
        w = cols.shape[-1]
        rows_g, cols_g = _pairs_from_ship(
            np.asarray(cols).reshape(-1, w)[:n_left], n_right
        )
        yield (
            rows_g,
            cols_g,
            0,
            n_left,
            np.asarray(ub_last).reshape(-1)[:n_left],
            np.asarray(counts).reshape(-1)[:n_left],
            int(max_cnt),
        )

    return run_stream, n_loc, tile, n_tiles_loc


def distributed_topn_cosine_matches(
    left: EllMatrix,
    right: Optional[EllMatrix],
    min_similarity: float,
    max_n_matches: Optional[int],
    mesh: Mesh,
    *,
    force_symmetries: bool = True,
    hash_dim: int = 1024,
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
    width = -(-max(left.width, right_m.width, 8) // 8) * 8
    left = _pad_width(left, width)
    right_m = left if is_self else _pad_width(right_m, width)
    max_n = right_m.n_rows if max_n_matches is None else max_n_matches

    run, n_loc, tile, n_tiles_loc = _phase1_distributed(
        left, right_m, is_self, mesh, hash_dim, left_chunk, right_tile
    )
    c0 = initial_cand_c(min_similarity, max_n, right_m.n_rows, n_loc)
    kt0 = initial_k_tile(min_similarity, right_m.n_rows, tile, c0)
    pairs = adaptive_topn(
        run, left, right_m, min_similarity, max_n,
        c_cap=n_loc, kt_cap=tile, n_tiles=n_tiles_loc, c0=c0, kt0=kt0,
    )
    if is_self and force_symmetries:
        return apply_self_join_fixups(pairs, left.n_rows)
    return order_like_reference_csr(pairs)
