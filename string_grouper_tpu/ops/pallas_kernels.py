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
    new_v, new_c = _rank_insert2(v_ref[:], c_ref[:], p0, p1, q0, q1)
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


# ------------------------------------------------ column-chunked chain form
def _p1_chain_body(off_ref, thr_ref, a_ref, b_ref, vin_ref, cin_ref, min_ref,
                   ship_ref, cnt_ref, tmax_ref, bnd_ref,
                   vout_ref, cout_ref, mout_ref,
                   v_ref, c_ref, meta_ref):
    """``_p1_body`` with the running state as kernel I/O: one PASS over a
    column chunk of the right corpus, resuming from the previous chunk's
    state -- the chain over chunks is bitwise one full-corpus pass (same
    rank-insert sequence in the same tile order).  ``off_ref`` carries the
    chunk's global column offset; meta is packed f32 [cnt, tmax, nfin, tb]
    (exact for counts < 2^24).  Final-pass consumers read ship/cnt/tmax/
    bnd; intermediate passes read only the state outputs (ship/bnd are
    still written -- their truncation term only covers THIS prefix of the
    corpus, which is exactly the invariant the chain maintains)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    bm = a_ref.shape[0]
    bn = b_ref.shape[0]
    cand_c = v_ref.shape[1]

    @pl.when(j == 0)
    def _():
        v_ref[:] = vin_ref[:]
        c_ref[:] = cin_ref[:]
        meta_ref[:] = min_ref[:]

    thr = thr_ref[0, 0]
    s = jnp.dot(a_ref[:], b_ref[:].T, preferred_element_type=jnp.float32)
    mask = s >= thr
    ubm = jnp.where(mask, s, _NEG)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    cnt = mask.sum(axis=1, dtype=jnp.int32)
    s1 = jnp.where(mask, col_iota, 0).sum(axis=1, dtype=jnp.int32)
    vmax = ubm.max(axis=1)
    cmax = jnp.argmax(ubm, axis=1).astype(jnp.int32)
    vmax2 = jnp.where(col_iota == cmax[:, None], _NEG, ubm).max(axis=1)
    other = s1 - cmax
    have1 = cnt >= 1
    have2 = cnt == 2
    off = off_ref[0, 0] + j * bn
    p0 = jnp.where(have1, vmax, _NEG)
    p1 = jnp.where(have2, vmax2, _NEG)
    q0 = jnp.where(have1, cmax, 0) + off
    q1 = jnp.where(have2, other, 0) + off

    m = meta_ref[:]
    cntf = cnt.astype(jnp.float32)
    meta_ref[:] = jnp.stack(
        [
            m[:, 0] + cntf,
            jnp.maximum(m[:, 1], cntf),
            m[:, 2]
            + (have1.astype(jnp.int32) + have2.astype(jnp.int32)).astype(
                jnp.float32
            ),
            jnp.maximum(m[:, 3], jnp.where(cnt > 2, vmax2, _NEG)),
            m[:, 4], m[:, 5], m[:, 6], m[:, 7],
        ],
        axis=1,
    )
    new_v, new_c = _rank_insert2(v_ref[:], c_ref[:], p0, p1, q0, q1)
    v_ref[:] = new_v
    c_ref[:] = new_c

    @pl.when(j == nj - 1)
    def _():
        vout_ref[:] = new_v
        cout_ref[:] = new_c
        mm = meta_ref[:]
        mout_ref[:] = mm
        cnt_ref[:] = mm[:, 0:1].astype(jnp.int32)
        tmax_ref[:] = mm[:, 1:2].astype(jnp.int32)
        trunc = jnp.where(mm[:, 2] > cand_c, new_v[:, cand_c - 1], _NEG)
        bnd_ref[:] = jnp.maximum(mm[:, 3:4], trunc[:, None])
        ship_ref[:] = jnp.where(new_v > _NEG, new_c, -1)


def p1_chain_init(m: int, cand_c: int):
    """Device-resident initial chain state (no wire traffic)."""
    return (
        jnp.full((m, cand_c), _NEG, jnp.float32),
        jnp.zeros((m, cand_c), jnp.int32),
        jnp.concatenate(
            [
                jnp.zeros((m, 3), jnp.float32),
                jnp.full((m, 1), _NEG, jnp.float32),
                jnp.zeros((m, 4), jnp.float32),
            ],
            axis=1,
        ),
    )


@partial(
    jax.jit,
    static_argnames=("tile", "cand_c", "block_m", "interpret"),
    donate_argnums=(4, 5, 6),
)
def p1_fused_chain(
    a_hash: jax.Array,  # (m, d) bf16 -- one left segment
    b_chunk: jax.Array,  # (n_chunk, d) bf16 -- one right column chunk
    thr_eff: jax.Array,  # f32 scalar
    col_off: jax.Array,  # i32 scalar: chunk's global column offset
    v_in: jax.Array,  # (m, cand_c) f32 running values (donated)
    c_in: jax.Array,  # (m, cand_c) i32 running cols (donated)
    meta_in: jax.Array,  # (m, 8) f32 [cnt, tmax, nfin, tb, ...] (donated)
    tile: int = 4096,
    cand_c: int = 64,
    block_m: int = 512,
    interpret: bool = False,
):
    """One chunk PASS of the chained phase 1 (see ``_p1_chain_body``).
    Returns ``(ship, counts, tmax, bound, max_cnt, v, c, meta)``; chain
    the state triple into the next chunk's call, read the result fields
    from the LAST chunk's call -- bitwise ``p1_fused_closed2`` over the
    concatenated right block (tests/test_pallas_kernels.py)."""
    m, d = a_hash.shape
    n = b_chunk.shape[0]
    n_tiles = n // tile
    bm = min(block_m, m)
    grid = (m // bm, n_tiles)
    thr2 = jnp.asarray(thr_eff, jnp.float32).reshape(1, 1)
    off2 = jnp.asarray(col_off, jnp.int32).reshape(1, 1)
    row_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    ship, cnt, tmax, bnd, vout, cout, mout = pl.pallas_call(
        _p1_chain_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            row_spec((bm, d)),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            row_spec((bm, cand_c)),
            row_spec((bm, cand_c)),
            row_spec((bm, 8)),
        ],
        out_specs=[
            row_spec((bm, cand_c)),
            row_spec((bm, 1)),
            row_spec((bm, 1)),
            row_spec((bm, 1)),
            row_spec((bm, cand_c)),
            row_spec((bm, cand_c)),
            row_spec((bm, 8)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, cand_c), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, cand_c), jnp.float32),
            jax.ShapeDtypeStruct((m, cand_c), jnp.int32),
            jax.ShapeDtypeStruct((m, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, cand_c), jnp.float32),
            pltpu.VMEM((bm, cand_c), jnp.int32),
            pltpu.VMEM((bm, 8), jnp.float32),
        ],
        input_output_aliases={4: 4, 5: 5, 6: 6},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * d,
            bytes_accessed=m * d * 2 + (m // bm) * n * d * 2
            + m * cand_c * 12,
            transcendentals=0,
        ),
        interpret=interpret,
    )(off2, thr2, a_hash, b_chunk, v_in, c_in, meta_in)
    counts = cnt[:, 0]
    tmax_r = tmax[:, 0]
    return ship, counts, tmax_r, bnd[:, 0], tmax_r.max(), vout, cout, mout


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



#: Future-state packing: ONE lane-aligned (n_pad, 128) f32 array per fit
#: holds, per right row, 60 candidate values, their 60 column ids
#: (bitcast i32), and 8 metadata slots [cnt, tmax, bound, nfin, ...] --
#: manual DMA slabs must be 128-lane aligned, and one slab per direction
#: beats three.
TRI_FUT_C = 60
_TRI_META_OFF = 2 * TRI_FUT_C


def tri_future_init(n_pad: int) -> jax.Array:
    """Initial packed future state: values -inf, cols 0, meta 0 except the
    bound slot (-inf)."""
    import numpy as np

    f = np.zeros((n_pad, 128), dtype=np.float32)
    f[:, :TRI_FUT_C] = -np.inf
    f[:, _TRI_META_OFF + 2] = -np.inf
    return jnp.asarray(f)


def tri_future_unpack(fpack):
    """(values, cols, meta) views of the packed future state (XLA side)."""
    fv = fpack[:, :TRI_FUT_C]
    fc = jax.lax.bitcast_convert_type(
        fpack[:, TRI_FUT_C:_TRI_META_OFF], jnp.int32
    )
    fm = fpack[:, _TRI_META_OFF:]
    return fv, fc, fm


def _p1_tri_body(
    j0_ref,  # scalar prefetch: first right tile this segment scans
    thr_ref,  # SMEM f32[1]
    a_ref,  # (bm, d) left sub-block of tile I
    b_ref,  # (tile, d) right tile j (clamped to j0 on skipped steps)
    f_any,  # aliased packed future state (HBM-resident, ANY)
    rv_out, rc_out, rm_out,  # row-side outputs, blocked by I
    f_out,  # aliased packed future output (ANY)
    rs_v, rs_c, rs_m,  # scratch: tile I's running row-side top-C + meta
    cs_v, cs_c, cs_m,  # scratch: current (I, j) per-column top-2 + meta
    st_f,  # scratch: DMA staging of future block j (tile, 128)
    sem_r, sem_w,  # DMA semaphores
):
    """One (left tile I, right tile j, sub-block k) step of the triangular
    self-join phase 1.  See ``p1_tri_fused`` for the decomposition.

    Row side: tile I's running sorted top-C buffers live in VMEM scratch
    (resident across the whole (j, k) sweep for fixed I -- I is the outer
    grid dim), initialized at I's first active step and flushed to the
    I-indexed outputs at its last step.  Per step the block's closed-form
    per-row top-2 rank-inserts into the k-th slice of the scratch.

    Column side: the per-column top-2 of tile I x tile j accumulates over
    k in (tile, 2) scratch by sorted-pair merge; at k's end it
    read-modify-writes the packed future state's block j (HBM-resident
    aliased array, explicit DMA) -- one ~2 MB round-trip per (I, j) pair,
    i.e. per ``tile/bm`` MXU steps.  Guarded to j >= j0 + cpg: tiles
    inside the segment's own range are covered by row passes (the same
    coverage argument as ops/matcher.py ``_self_seg_match``).

    Metadata layout (f32, exact for counts < 2^24):
    [cnt, tmax, bound, nfin]; cs_m slot 1 carries sub-block second-max
    bounds (columns with > 2 qualified in one sub-block recover only
    their top-1; the dropped values are bounded by that sub-block's
    second max, which can exceed the merged top-2's second value).
    """
    I = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    nt = pl.num_programs(1)
    tpb = pl.num_programs(2)  # sub-blocks per left tile
    bm = a_ref.shape[0]
    tile = b_ref.shape[0]
    cand_c = rs_v.shape[1]
    j0 = j0_ref[0]
    thr = thr_ref[0]
    cpg = pl.num_programs(0)
    active = j >= j0
    neg = _NEG

    @pl.when(active & (j == j0) & (k == 0))
    def _():  # I's first active step: reset the row-side scratch
        rs_v[:] = jnp.full((tile, cand_c), neg, jnp.float32)
        rs_c[:] = jnp.zeros((tile, cand_c), jnp.int32)
        z = jnp.zeros((tile, 1), jnp.float32)
        rs_m[:] = jnp.concatenate(
            [z, z, jnp.full((tile, 1), neg, jnp.float32), z, z, z, z, z],
            axis=1,
        )

    @pl.when(active)
    def _():
        s = jnp.dot(a_ref[:], b_ref[:].T, preferred_element_type=jnp.float32)
        mask = s >= thr
        ubm = jnp.where(mask, s, neg)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (bm, tile), 1)
        # --- row side: closed-form per-row top-2 of this (bm, tile) block
        cnt = mask.sum(axis=1, dtype=jnp.int32)
        s1 = jnp.where(mask, col_iota, 0).sum(axis=1, dtype=jnp.int32)
        vmax = ubm.max(axis=1)
        cmax = jnp.argmax(ubm, axis=1).astype(jnp.int32)
        vmax2 = jnp.where(col_iota == cmax[:, None], neg, ubm).max(axis=1)
        other = s1 - cmax
        have1 = cnt >= 1
        have2 = cnt == 2
        off = j * tile
        p0 = jnp.where(have1, vmax, neg)
        p1 = jnp.where(have2, vmax2, neg)
        q0 = jnp.where(have1, cmax, 0) + off
        q1 = jnp.where(have2, other, 0) + off
        row0 = k * bm
        rv = rs_v[pl.ds(row0, bm), :]
        rc = rs_c[pl.ds(row0, bm), :]
        nrv, nrc = _rank_insert2(rv, rc, p0, p1, q0, q1)
        rs_v[pl.ds(row0, bm), :] = nrv
        rs_c[pl.ds(row0, bm), :] = nrc
        m = rs_m[pl.ds(row0, bm), :]
        cntf = cnt.astype(jnp.float32)
        rs_m[pl.ds(row0, bm), :] = jnp.stack(
            [
                m[:, 0] + cntf,
                jnp.maximum(m[:, 1], cntf),
                jnp.maximum(m[:, 2], jnp.where(cnt > 2, vmax2, neg)),
                m[:, 3]
                + (have1.astype(jnp.int32) + have2.astype(jnp.int32)).astype(
                    jnp.float32
                ),
                m[:, 4], m[:, 5], m[:, 6], m[:, 7],
            ],
            axis=1,
        )

        # --- column side (future tiles only)
        @pl.when(j >= j0 + cpg)
        def _():
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (bm, tile), 0)
            ccnt = mask.sum(axis=0, dtype=jnp.int32)
            cs1 = jnp.where(mask, row_iota, 0).sum(axis=0, dtype=jnp.int32)
            cvmax = ubm.max(axis=0)
            ccmax = jnp.argmax(ubm, axis=0).astype(jnp.int32)
            cvmax2 = jnp.where(row_iota == ccmax[None, :], neg, ubm).max(axis=0)
            cother = cs1 - ccmax
            ch1 = ccnt >= 1
            ch2 = ccnt == 2
            roff = j0 * tile + I * tile + k * bm
            b0 = jnp.where(ch1, cvmax, neg)
            b1 = jnp.where(ch2, cvmax2, neg)
            d0 = jnp.where(ch1, ccmax, 0) + roff
            d1 = jnp.where(ch2, cother, 0) + roff

            @pl.when(k == 0)
            def _():
                cs_v[:] = jnp.full((tile, 2), neg, jnp.float32)
                cs_c[:] = jnp.zeros((tile, 2), jnp.int32)
                zc = jnp.zeros((tile, 1), jnp.float32)
                cs_m[:] = jnp.concatenate(
                    [zc, jnp.full((tile, 1), neg, jnp.float32),
                     zc, zc, zc, zc, zc, zc],
                    axis=1,
                )
                # start the future-block read DMA while the k sweep runs
                pltpu.make_async_copy(
                    f_out.at[pl.ds(j * tile, tile), :], st_f, sem_r
                ).start()

            # merge the block's per-column top-2 into the running (tile, 2)
            a0, a1 = cs_v[:, 0], cs_v[:, 1]
            ca0, ca1 = cs_c[:, 0], cs_c[:, 1]
            awins = a0 >= b0
            w0v = jnp.where(awins, a0, b0)
            w0c = jnp.where(awins, ca0, d0)
            l0v = jnp.where(awins, b0, a0)
            l0c = jnp.where(awins, d0, ca0)
            wsv = jnp.where(awins, a1, b1)
            wsc = jnp.where(awins, ca1, d1)
            lwins = l0v >= wsv
            m1v = jnp.where(lwins, l0v, wsv)
            m1c = jnp.where(lwins, l0c, wsc)
            cs_v[:] = jnp.stack([w0v, m1v], axis=1)
            cs_c[:] = jnp.stack([w0c, m1c], axis=1)
            cm = cs_m[:]
            cs_m[:] = jnp.stack(
                [
                    cm[:, 0] + ccnt.astype(jnp.float32),
                    jnp.maximum(cm[:, 1], jnp.where(ccnt > 2, cvmax2, neg)),
                    cm[:, 2], cm[:, 3], cm[:, 4], cm[:, 5], cm[:, 6],
                    cm[:, 7],
                ],
                axis=1,
            )

            @pl.when(k == tpb - 1)
            def _():  # fold tile I's column results into future block j
                cnt_tile = cs_m[:, 0]
                fv0, fc0 = cs_v[:, 0], cs_c[:, 0]
                fv1, fc1 = cs_v[:, 1], cs_c[:, 1]
                bnd_tile = jnp.maximum(
                    jnp.where(cnt_tile > 2, fv1, neg), cs_m[:, 1]
                )
                pltpu.make_async_copy(
                    f_out.at[pl.ds(j * tile, tile), :], st_f, sem_r
                ).wait()
                st = st_f[:]
                sv = st[:, :TRI_FUT_C]
                sc = jax.lax.bitcast_convert_type(
                    st[:, TRI_FUT_C:_TRI_META_OFF], jnp.int32
                )
                fm = st[:, _TRI_META_OFF:]
                nv, nc = _rank_insert2(sv, sc, fv0, fv1, fc0, fc1)
                nm = jnp.stack(
                    [
                        fm[:, 0] + cnt_tile,
                        jnp.maximum(fm[:, 1], cnt_tile),
                        jnp.maximum(fm[:, 2], bnd_tile),
                        fm[:, 3]
                        + (cnt_tile >= 1).astype(jnp.float32)
                        + (cnt_tile >= 2).astype(jnp.float32),
                        fm[:, 4], fm[:, 5], fm[:, 6], fm[:, 7],
                    ],
                    axis=1,
                )
                st_f[:] = jnp.concatenate(
                    [
                        nv,
                        jax.lax.bitcast_convert_type(nc, jnp.float32),
                        nm,
                    ],
                    axis=1,
                )
                cp = pltpu.make_async_copy(
                    st_f, f_out.at[pl.ds(j * tile, tile), :], sem_w
                )
                cp.start()
                cp.wait()

    @pl.when((j == nt - 1) & (k == tpb - 1))
    def _():  # I's last step: flush the row-side scratch
        rv_out[:] = rs_v[:]
        rc_out[:] = rs_c[:]
        rm_out[:] = rs_m[:]


@partial(
    jax.jit,
    static_argnames=("tile", "cand_c", "block_m", "interpret"),
    donate_argnums=(2,),
)
def p1_tri_fused(
    a_seg: jax.Array,  # (seg_rows, d) bf16 -- this segment's left rows
    b_hash: jax.Array,  # (n_pad, d) bf16 -- full padded corpus
    fpack: jax.Array,  # (n_pad, 128) f32 packed future state (donated)
    j0: jax.Array,  # i32 scalar: first right tile this segment scans
    thr_eff: jax.Array,  # f32 scalar
    tile: int = 4096,
    cand_c: int = 64,
    block_m: int = 512,
    interpret: bool = False,
):
    """Triangular self-join phase 1 for ONE left segment, fully in-kernel
    (VERDICT r3 item 2): each (left tile I, right tile j >= j0) pair is
    multiplied ONCE and feeds BOTH the segment rows' running top-C (row
    axis, VMEM scratch) and tile j's future top-C (column axis, explicit
    DMA read-modify-write of the HBM-resident packed future state) --
    ~half the square scan's MXU work with no XLA merge epilogue (the cost
    that made the XLA triangular scan neutral, ops/matcher.py
    ``triangular_enabled``).  One compiled program serves every segment:
    ``j0`` is a scalar-prefetch argument and the b-tile index map clamps
    skipped steps onto tile j0 (no redundant DMA).

    Returns ``(rv, rc, rmeta, fpack)``: the segment's row-side top-C +
    metadata [cnt, tmax, bound, nfin, ...], and the updated (donated)
    packed future state (see ``tri_future_init`` / ``tri_future_unpack``).
    The caller combines each segment's row side with its rows' future
    slice (accumulated by earlier segments).
    """
    seg_rows, d = a_seg.shape
    n_pad = b_hash.shape[0]
    nt = n_pad // tile
    bm = min(block_m, tile)
    tpb = tile // bm
    cpg = seg_rows // tile
    grid = (cpg, nt, tpb)
    j0s = jnp.asarray(j0, jnp.int32).reshape(1)
    thrs = jnp.asarray(thr_eff, jnp.float32).reshape(1)

    def a_map(I, j, k, j0_ref):
        return (I * tpb + k, 0)

    def b_map(I, j, k, j0_ref):
        return (jnp.maximum(j, j0_ref[0]), 0)

    def row_map(I, j, k, j0_ref):
        return (I, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr
            pl.BlockSpec((bm, d), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), b_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # fpack (HBM)
        ],
        out_specs=[
            pl.BlockSpec((tile, cand_c), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cand_c), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, cand_c), jnp.float32),
            pltpu.VMEM((tile, cand_c), jnp.int32),
            pltpu.VMEM((tile, 8), jnp.float32),
            pltpu.VMEM((tile, 2), jnp.float32),
            pltpu.VMEM((tile, 2), jnp.int32),
            pltpu.VMEM((tile, 8), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    rv, rc, rmeta, fpack = pl.pallas_call(
        _p1_tri_body,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((seg_rows, cand_c), jnp.float32),
            jax.ShapeDtypeStruct((seg_rows, cand_c), jnp.int32),
            jax.ShapeDtypeStruct((seg_rows, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        ],
        input_output_aliases={4: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=seg_rows * n_pad * d,  # ~half the square
            bytes_accessed=seg_rows * d * 2 + n_pad * d * 2 + n_pad * 512,
            transcendentals=0,
        ),
        interpret=interpret,
    )(j0s, thrs, a_seg, b_hash, fpack)
    return rv, rc, rmeta, fpack


def p1_fused_supported(m: int, n_pad: int, d: int, tile: int,
                       cand_c: int) -> bool:
    """Shapes the fused kernel handles (the XLA path covers the rest):
    block-aligned rows, lane-aligned hash dim, pow2 candidate width small
    enough that the per-step running merge stays a rounding error next to
    the matmul."""
    return (
        d % 128 == 0
        and m >= 256
        and m % min(512, m) == 0  # grid rows = m // min(block_m, m)
        and n_pad % tile == 0
        and tile % 256 == 0
        and 8 <= cand_c <= 256
        and cand_c % 8 == 0
    )
