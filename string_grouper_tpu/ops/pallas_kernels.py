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


# --------------------------------------------------------------- triangular
def _rank_insert2(v, c, p0, p1, q0, q1):
    """Merge two new (value, col) candidates per row -- p0 >= p1, -inf for
    absent -- into a row-major sorted-desc running top-C buffer ``(v, c)``
    by rank arithmetic (the same shifted-select trick as ``_p1_body``).
    Returns the updated (v, c)."""
    bm, cand_c = v.shape
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
    new_v = jnp.where(k == i0, p0[:, None], jnp.where(k == i1, p1[:, None], vs))
    new_c = jnp.where(k == i0, q0[:, None], jnp.where(k == i1, q1[:, None], cs))
    return new_v, new_c


def _closed2_cols(s, mask, ubm, off):
    """Closed-form per-COLUMN top-2 of a (bm, bn) thresholded score block:
    the axis-0 mirror of the kt=2 extraction in ``_p1_body``.  ``off`` is
    the global row id of the block's first row.  Returns (p0, p1, q0, q1,
    cnt, bnd) over the bn columns."""
    bm, bn = s.shape
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    cnt = mask.sum(axis=0, dtype=jnp.int32)
    s1 = jnp.where(mask, row_iota, 0).sum(axis=0, dtype=jnp.int32)
    vmax = ubm.max(axis=0)
    cmax = jnp.argmax(ubm, axis=0).astype(jnp.int32)
    vmax2 = jnp.where(row_iota == cmax[None, :], _NEG, ubm).max(axis=0)
    other = s1 - cmax
    have1 = cnt >= 1
    have2 = cnt == 2
    p0 = jnp.where(have1, vmax, _NEG)
    p1 = jnp.where(have2, vmax2, _NEG)
    q0 = jnp.where(have1, cmax, 0) + off
    q1 = jnp.where(have2, other, 0) + off
    bnd = jnp.where(cnt > 2, vmax2, _NEG)
    return p0, p1, q0, q1, cnt, bnd


def _p1_tri_body(
    j0_ref, thr_ref,  # SMEM scalars
    a_ref, b_ref,  # inputs: (bm, d) left block, (tile, d) right tile
    rv_in, rc_in, rmeta_in,  # aliased row-side state (blocks indexed i)
    fv_in, fc_in, fmeta_in,  # aliased future state (blocks indexed j)
    rv_out, rc_out, rmeta_out,
    fv_out, fc_out, fmeta_out,
):
    """One (right tile j, left block i) step of the triangular self-join
    phase 1.  Grid is (j, i): j sweeps ALL right tiles with a runtime
    ``j0`` start guard (one compiled program serves every segment), i
    sweeps the segment's left blocks innermost.

    Row side: the segment's running sorted top-C buffers live in HBM as
    aliased in/out arrays blocked by i -- each (j, i) step fetches block
    i's buffers, merges the block's <= 2 new candidates by rank insertion,
    and writes them back (~1 MB/step of HBM round-trip, microseconds).
    Row metadata (count, per-tile max, drop bound, finite insertions) is
    packed into one (bm, 8) f32 block: [cnt, tile_cnt, tmax, bound, nfin].

    Column side: the FUTURE buffers (top-C per right row, fed by the
    symmetric reading of each score block) are aliased arrays blocked by
    j -- resident across the whole inner i sweep -- merged in-kernel by
    the same rank insertion, with per-left-TILE column counts accumulated
    so ``ftmax`` keeps the exact per-tile semantics the escalation width
    split needs.  Column work is guarded to j >= j0 + cpg (tiles at or
    after the segment's own range are covered by row passes), matching
    the XLA triangular scan's coverage argument (ops/matcher.py
    ``_self_seg_match``).
    """
    j = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    bm = a_ref.shape[0]
    bn = b_ref.shape[0]
    j0 = j0_ref[0]
    thr = thr_ref[0]
    cand_c = rv_in.shape[1]
    blocks_per_tile = bn // bm
    cpg = n_i // blocks_per_tile  # left tiles per segment
    active = j >= j0

    # Pass-through defaults (skipped steps write the fetched state back).
    rv, rc = rv_in[:], rc_in[:]
    rmeta = rmeta_in[:]
    fv, fc = fv_in[:], fc_in[:]
    fmeta = fmeta_in[:]

    @pl.when(active)
    def _():
        s = jnp.dot(a_ref[:], b_ref[:].T, preferred_element_type=jnp.float32)
        mask = s >= thr
        ubm = jnp.where(mask, s, _NEG)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        # Row-side closed-form kt=2 extraction (as _p1_body).
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
        nrv, nrc = _rank_insert2(rv, rc, p0, p1, q0, q1)
        rv_out[:], rc_out[:] = nrv, nrc
        m = rmeta
        m = m.at[:, 0].add(cnt.astype(jnp.float32))
        m = m.at[:, 1].set(jnp.maximum(m[:, 1], cnt.astype(jnp.float32)))
        m = m.at[:, 2].set(
            jnp.maximum(m[:, 2], jnp.where(cnt > 2, vmax2, _NEG))
        )
        m = m.at[:, 3].add(
            (have1.astype(jnp.int32) + have2.astype(jnp.int32)).astype(
                jnp.float32
            )
        )
        rmeta_out[:] = m

        # Column side: only tiles strictly after the segment's own range
        # accumulate future candidates (within-range columns are covered
        # by row passes -- see docstring).
        @pl.when(j >= j0 + cpg)
        def _():
            row_off = j0 * bn + i * bm
            cp0, cp1, cq0, cq1, ccnt, cbnd = _closed2_cols(s, mask, ubm, row_off)
            nfv, nfc = _rank_insert2(fv, fc, cp0, cp1, cq0, cq1)
            fv_out[:], fc_out[:] = nfv, nfc
            fm = fmeta
            fm = fm.at[:, 0].add(ccnt.astype(jnp.float32))
            # Per-left-TILE column count: slot 5 accumulates the current
            # left tile's count, folded into the tmax slot (and reset) at
            # each tile boundary.
            cur = fm[:, 5] + ccnt.astype(jnp.float32)
            at_tile_end = (i + 1) % blocks_per_tile == 0
            fm = fm.at[:, 1].set(
                jnp.where(at_tile_end, jnp.maximum(fm[:, 1], cur), fm[:, 1])
            )
            fm = fm.at[:, 5].set(jnp.where(at_tile_end, 0.0, cur))
            fm = fm.at[:, 2].set(jnp.maximum(fm[:, 2], cbnd))
            fm = fm.at[:, 3].add(
                ((ccnt >= 1).astype(jnp.int32) + (ccnt >= 2).astype(jnp.int32))
                .astype(jnp.float32)
            )
            fmeta_out[:] = fm

        @pl.when(j < j0 + cpg)
        def _():
            fv_out[:], fc_out[:] = fv, fc
            fmeta_out[:] = fmeta

    @pl.when(jnp.logical_not(active))
    def _():
        rv_out[:], rc_out[:] = rv, rc
        rmeta_out[:] = rmeta
        fv_out[:], fc_out[:] = fv, fc
        fmeta_out[:] = fmeta


@partial(
    jax.jit,
    static_argnames=("tile", "cand_c", "block_m", "interpret"),
    donate_argnums=(2, 3, 4, 5, 6, 7),
)
def p1_tri_fused(
    a_seg: jax.Array,  # (seg_rows, d) bf16 -- this segment's left rows
    b_hash: jax.Array,  # (n_pad, d) bf16 -- full padded corpus
    rv: jax.Array,  # (seg_rows, cand_c) f32 -inf -- fresh per segment
    rc: jax.Array,  # (seg_rows, cand_c) i32
    rmeta: jax.Array,  # (seg_rows, 8) f32 zeros (bound slot -inf)
    fv: jax.Array,  # (n_pad, cand_c) f32 -- running future buffers
    fc: jax.Array,  # (n_pad, cand_c) i32
    fmeta: jax.Array,  # (n_pad, 8) f32
    j0: jax.Array,  # i32 scalar: first right tile this segment scans
    thr_eff: jax.Array,  # f32 scalar
    tile: int = 4096,
    cand_c: int = 64,
    block_m: int = 512,
    interpret: bool = False,
):
    """Triangular self-join phase 1 for ONE left segment, fully in-kernel
    (VERDICT r3 item 2): each (left block, right tile >= j0) score block is
    multiplied ONCE and feeds BOTH the segment rows' running top-C (row
    axis) and the later tiles' future top-C (column axis), so the corpus-
    wide scan performs ~half the square scan's MXU work with no XLA merge
    epilogue (the cost that made the XLA triangular scan neutral,
    ops/matcher.py ``triangular_enabled``).

    Returns the updated ``(rv, rc, rmeta, fv, fc, fmeta)`` (donated).
    Metadata layout per row: [count, tmax, bound, nfin, 0, cur_tile_cnt,
    0, 0] as f32 (exact for counts < 2^24)."""
    seg_rows, d = a_seg.shape
    n_pad = b_hash.shape[0]
    n_tiles = n_pad // tile
    bm = min(block_m, seg_rows)
    n_i = seg_rows // bm
    grid = (n_tiles, n_i)
    j0s = jnp.asarray(j0, jnp.int32).reshape(1)
    thrs = jnp.asarray(thr_eff, jnp.float32).reshape(1)
    row_spec = [
        pl.BlockSpec((bm, cand_c), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, cand_c), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 8), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
    ]
    fut_spec = [
        pl.BlockSpec((tile, cand_c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, cand_c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 8), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        _p1_tri_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            *row_spec,
            *fut_spec,
        ],
        out_specs=[*row_spec, *fut_spec],
        out_shape=[
            jax.ShapeDtypeStruct((seg_rows, cand_c), jnp.float32),
            jax.ShapeDtypeStruct((seg_rows, cand_c), jnp.int32),
            jax.ShapeDtypeStruct((seg_rows, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, cand_c), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, cand_c), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        ],
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3, 8: 4, 9: 5},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=seg_rows * n_pad * d,  # ~half the square
            bytes_accessed=seg_rows * d * 2 + n_tiles * (seg_rows // bm) * 0
            + n_pad * d * 2 + seg_rows * cand_c * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(j0s, thrs, a_seg, b_hash, rv, rc, rmeta, fv, fc, fmeta)
    return out


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
