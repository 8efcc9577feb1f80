"""Pallas TPU kernels for the phase-1 candidate filter.

``fused_tile_topk`` fuses the per-tile body of the upper-bound scan
(ops/matcher.py ``_ub_topk_scan``) into one kernel: the bf16 MXU matmul,
thresholding, qualified-count reduction, and iterated top-k extraction all
happen while the score block stays in VMEM.  Measured on v5e at 663k rows
it is SLOWER than the plain-XLA tile body (13.1 s vs 9.3 s steady state):
XLA fuses the matmul epilogue well on its own, and this kernel's in-place
masked extraction serializes VPU passes that XLA overlaps.  It is kept as
an opt-in (``SG_TPU_FUSED=1``) exactness cross-check -- bench.py's
path-identity check runs it against the XLA path on the real device every
round -- and as the scaffold for future extraction-scheme experiments.

Layout: grid (m/BM, tile/BN); the output blocks are indexed by the row
block only, so they are revisited across the BN steps and act as the
running top-k accumulator (top-k of two sorted lists = k more iterated
maxima over their 2k-wide concat).

Off-TPU (tests on the CPU backend) the matcher uses its XLA path; the
kernel itself is testable anywhere via ``interpret=True``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float("-inf")  # python scalar: jnp constants cannot be captured by kernels


def _tile_body(
    kt: int, thr_ref, a_ref, b_ref, vals_ref, cols_ref, cnt_ref, s_ref
):
    j = pl.program_id(1)
    bm = a_ref.shape[0]
    bn = b_ref.shape[0]

    @pl.when(j == 0)
    def _():
        vals_ref[:] = jnp.full((bm, kt), _NEG, jnp.float32)
        cols_ref[:] = jnp.full((bm, kt), -1, jnp.int32)
        cnt_ref[:] = jnp.zeros((bm, 1), jnp.int32)

    thr = thr_ref[0, 0]
    scores = jnp.dot(
        a_ref[:], b_ref[:].T, preferred_element_type=jnp.float32
    )  # (BM, BN) in VMEM
    s_ref[:] = jnp.where(scores >= thr, scores, _NEG)
    cnt_ref[:] = (
        cnt_ref[:] + (s_ref[:] > _NEG).sum(axis=1, dtype=jnp.int32)[:, None]
    )

    # Iterated max/argmax extraction of the block-local top-kt.  The score
    # block lives in one scratch buffer updated in place, so the unrolled
    # loop does not hold kt live copies in VMEM.
    loc_vals = []
    loc_cols = []
    iota = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    for _ in range(kt):
        cur = s_ref[:]
        v = cur.max(axis=1)
        i = jnp.argmax(cur, axis=1).astype(jnp.int32)
        loc_vals.append(v)
        loc_cols.append(i + j * bn)
        s_ref[:] = jnp.where(iota == i[:, None], _NEG, cur)
    lv = jnp.stack(loc_vals, axis=1)  # (BM, kt) descending
    lc = jnp.stack(loc_cols, axis=1)

    # Merge with the running top-kt (both descending): kt iterated maxima
    # over the 2kt-wide concatenation.
    cat_v = jnp.concatenate([vals_ref[:], lv], axis=1)
    cat_c = jnp.concatenate([cols_ref[:], lc], axis=1)
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (bm, 2 * kt), 1)
    mv = []
    mc = []
    for _ in range(kt):
        v = cat_v.max(axis=1)
        i = jnp.argmax(cat_v, axis=1).astype(jnp.int32)
        mv.append(v)
        # Masked-sum gather: Mosaic has no general take_along_axis; the
        # width is tiny (2*kt) so a select+reduce is free.
        hit = iota2 == i[:, None]
        mc.append(jnp.where(hit, cat_c, 0).sum(axis=1))
        cat_v = jnp.where(hit, _NEG, cat_v)
    vals_ref[:] = jnp.stack(mv, axis=1)
    cols_ref[:] = jnp.stack(mc, axis=1)


@partial(
    jax.jit, static_argnames=("kt", "block_m", "block_n", "interpret")
)
def fused_tile_topk(
    a_hash: jax.Array,  # (m, d) bf16
    b_tile: jax.Array,  # (tile, d) bf16
    thr_eff: jax.Array,  # f32 scalar
    kt: int,
    block_m: int = 1024,
    block_n: int = 1024,
    interpret: bool = False,
):
    """Per-tile top-kt qualified candidates: (vals (m, kt) desc, cols
    (m, kt) tile-local, counts (m,)).  Equivalent to the XLA tile body in
    ops/matcher.py."""
    m, d = a_hash.shape
    tile = b_tile.shape[0]
    bm = min(block_m if kt <= 8 else block_m // 2, m)
    bn = min(block_n, tile)
    grid = (m // bm, tile // bn)
    thr = jnp.asarray(thr_eff, jnp.float32).reshape(1, 1)

    vals, cols, cnt = pl.pallas_call(
        partial(_tile_body, kt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, kt), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, kt), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, kt), jnp.float32),
            jax.ShapeDtypeStruct((m, kt), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(thr, a_hash, b_tile)
    return vals, cols, cnt[:, 0]


def fused_tile_topk_supported(m: int, tile: int, d: int, kt: int) -> bool:
    """Shapes the fused kernel handles (the XLA path covers the rest)."""
    return (
        kt <= 16
        and d % 128 == 0
        and m % 256 == 0
        and tile % 256 == 0
        and m >= 256
        and tile >= 256
    )
