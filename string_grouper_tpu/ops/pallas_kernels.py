"""Pallas TPU kernel for the phase-1 candidate filter.

``p1_fused_closed2`` fuses one whole left segment x right corpus phase-1
pass (the work ``_ub_topk_scan`` + the per-chunk top-C merge do on the XLA
path, ops/matcher.py) into a single kernel: per grid step (i = left row
block, j = right tile) it runs the bf16 MXU matmul, thresholds the
upper-bound scores, extracts the tile-local top-2 in closed form (pure
reductions -- count, max/argmax, masked second max, index sum; see
``_ub_topk_scan``'s kt=2 path for the derivation), and merges the <= 2 new
candidates into a per-row running sorted top-``cand_c`` buffer held in VMEM
scratch by rank arithmetic (two insertion ranks + a shifted-select -- no
sort).  The (block_m, tile) f32 score block lives only in VMEM.

Why this beats the XLA tile body (measured on v5e, 32768x663552 @ d=512,
2026-08-19): XLA materializes each score block in HBM and re-reads it for
the fused reduction groups, then pays a per-chunk ``lax.top_k`` over the
(m, n_tiles*2) candidate strip -- 244 ms/segment.  This kernel never spills
the score block and replaces the top-k sort with the running merge --
174 ms/segment (pure matmul floor: 113 ms), i.e. the full-corpus phase-1
scan drops from ~4.9 s to ~3.5 s.  It is therefore the DEFAULT phase-1
path on TPU for the closed-form (k_tile=2, thresholded) configuration;
``SG_TPU_FUSED=0`` forces the XLA path (kept as the oracle for CPU tests,
the mesh path, escalation re-matches, and thresholdless runs).

Outputs are bit-identical to the XLA path by construction: candidate sets,
qualified counts, per-tile maxima, and drop bounds were verified equal on
the real device (bench.py's path-identity check re-proves frame equality
every round).

Replaces the reference's sparse_dot_topn ``sp_matmul_topn`` hot loop
(reference string_grouper.py:725-746); the running top-C merge is the
single-chip form of ``zip_sp_matmul_topn``'s per-row block combine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float("-inf")  # python scalar: jnp constants cannot be captured by kernels


def _p1_body(thr_ref, a_ref, b_ref, ship_ref, cnt_ref, tmax_ref, bnd_ref,
             v_ref, c_ref, nfin_ref, tb_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    bm = a_ref.shape[0]
    bn = b_ref.shape[0]
    cand_c = v_ref.shape[1]

    @pl.when(j == 0)
    def _():
        cnt_ref[:] = jnp.zeros((bm, 1), jnp.int32)
        tmax_ref[:] = jnp.zeros((bm, 1), jnp.int32)
        v_ref[:] = jnp.full((bm, cand_c), _NEG, jnp.float32)
        c_ref[:] = jnp.zeros((bm, cand_c), jnp.int32)
        nfin_ref[:] = jnp.zeros((bm, 1), jnp.int32)
        tb_ref[:] = jnp.full((bm, 1), _NEG, jnp.float32)

    thr = thr_ref[0, 0]
    s = jnp.dot(a_ref[:], b_ref[:].T, preferred_element_type=jnp.float32)
    mask = s >= thr
    ubm = jnp.where(mask, s, _NEG)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    # Closed-form kt=2 extraction (same reductions as the XLA kt=2 path):
    # top-1 = (max, argmax); top-2 value = max with the argmax column
    # masked; its column = (sum of qualified indices) - argmax (exact for
    # cnt == 2; unused otherwise).
    cnt = mask.sum(axis=1, dtype=jnp.int32)
    s1 = jnp.where(mask, col_iota, 0).sum(axis=1, dtype=jnp.int32)
    vmax = ubm.max(axis=1)
    cmax = jnp.argmax(ubm, axis=1).astype(jnp.int32)
    vmax2 = jnp.where(col_iota == cmax[:, None], _NEG, ubm).max(axis=1)
    other = s1 - cmax
    have1 = cnt >= 1
    have2 = cnt == 2
    off = j * bn
    p0 = jnp.where(have1, vmax, _NEG)
    p1 = jnp.where(have2, vmax2, _NEG)
    q0 = jnp.where(have1, cmax, 0) + off
    q1 = jnp.where(have2, other, 0) + off

    cnt_ref[:] = cnt_ref[:] + cnt[:, None]
    tmax_ref[:] = jnp.maximum(tmax_ref[:], cnt[:, None])
    # Per-tile drop bound: rows with > 2 qualified columns in this tile
    # dropped candidates bounded by the second max.
    tb_ref[:] = jnp.maximum(
        tb_ref[:], jnp.where(cnt > 2, vmax2, _NEG)[:, None]
    )
    nfin_ref[:] = nfin_ref[:] + (
        have1.astype(jnp.int32) + have2.astype(jnp.int32)
    )[:, None]

    # Merge {p0 >= p1} into the running sorted-desc top-C (v_ref, c_ref):
    # i0/i1 are the insertion ranks of the two new elements; every kept old
    # value shifts right by the number of new elements ranked before it.
    # -inf new elements rank after every finite entry and overwrite -inf
    # padding, so the sorted-desc / -inf-tail invariant is maintained.
    v = v_ref[:]
    c = c_ref[:]
    i0 = (v > p0[:, None]).sum(axis=1, dtype=jnp.int32)[:, None]
    i1 = (v > p1[:, None]).sum(axis=1, dtype=jnp.int32)[:, None] + 1
    k = jax.lax.broadcasted_iota(jnp.int32, (bm, cand_c), 1)
    shift = (k > i0).astype(jnp.int32) + (k > i1).astype(jnp.int32)
    v1 = pltpu.roll(v, 1, axis=1)
    v2 = pltpu.roll(v, 2, axis=1)
    c1 = pltpu.roll(c, 1, axis=1)
    c2 = pltpu.roll(c, 2, axis=1)
    vs = jnp.where(shift == 0, v, jnp.where(shift == 1, v1, v2))
    cs = jnp.where(shift == 0, c, jnp.where(shift == 1, c1, c2))
    new_v = jnp.where(
        k == i0, p0[:, None], jnp.where(k == i1, p1[:, None], vs)
    )
    new_c = jnp.where(
        k == i0, q0[:, None], jnp.where(k == i1, q1[:, None], cs)
    )
    v_ref[:] = new_v
    c_ref[:] = new_c

    @pl.when(j == nj - 1)
    def _():
        # Top-C truncation only DROPS something when more than cand_c
        # finite candidates were extracted (same guard as the XLA path --
        # a row with exactly cand_c keeps them all).
        trunc = jnp.where(nfin_ref[:, 0] > cand_c, new_v[:, cand_c - 1], _NEG)
        bnd_ref[:] = jnp.maximum(tb_ref[:], trunc[:, None])
        ship_ref[:] = jnp.where(new_v > _NEG, new_c, -1)


@partial(
    jax.jit, static_argnames=("tile", "cand_c", "block_m", "interpret")
)
def p1_fused_closed2(
    a_hash: jax.Array,  # (m, d) bf16 -- one left segment
    b_hash: jax.Array,  # (n, d) bf16 -- full padded right corpus
    thr_eff: jax.Array,  # f32 scalar
    tile: int = 4096,
    cand_c: int = 64,
    block_m: int = 512,
    interpret: bool = False,
):
    """Whole-segment phase 1: returns ``(ship, counts, tmax, bound,
    max_cnt)`` -- the shipped candidate matrix (m, cand_c) int32 with -1
    sentinels and each row's valid entries in a descending-UB prefix, the
    per-row qualified counts, per-tile maximum counts, drop bounds, and the
    segment-wide maximum per-tile count (device scalar)."""
    m, d = a_hash.shape
    n = b_hash.shape[0]
    n_tiles = n // tile
    bm = min(block_m, m)
    grid = (m // bm, n_tiles)
    thr2 = jnp.asarray(thr_eff, jnp.float32).reshape(1, 1)
    ship, cnt, tmax, bnd = pl.pallas_call(
        _p1_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, cand_c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, cand_c), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, cand_c), jnp.float32),
            pltpu.VMEM((bm, cand_c), jnp.int32),
            pltpu.VMEM((bm, 1), jnp.int32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * d,
            bytes_accessed=m * d * 2 + (m // bm) * n * d * 2 + m * cand_c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(thr2, a_hash, b_hash)
    counts = cnt[:, 0]
    tmax_r = tmax[:, 0]
    return ship, counts, tmax_r, bnd[:, 0], tmax_r.max()


def p1_fused_supported(m: int, n_pad: int, d: int, tile: int,
                       cand_c: int) -> bool:
    """Shapes the fused kernel handles (the XLA path covers the rest):
    block-aligned rows, lane-aligned hash dim, pow2 candidate width small
    enough that the per-step running merge stays a rounding error next to
    the matmul."""
    return (
        d % 128 == 0
        and m % 256 == 0
        and m >= 256
        and n_pad % tile == 0
        and tile % 256 == 0
        and 8 <= cand_c <= 256
        and cand_c % 8 == 0
    )
