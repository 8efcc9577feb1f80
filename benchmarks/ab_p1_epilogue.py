"""A/B the fused phase-1 kernel's epilogue formulations on the real TPU.

Times per-segment walls at the headline shape (32768 x 663552 @ d=512,
tile 4096, cand_c 64) for:
  - current   : p1_fused_closed2 as shipped
  - mm_floor  : matmul + threshold count only (epilogue lower bound)
  - minidx    : argmax via min-index-of-max (same semantics: first max)
  - bm256/1024: block_m variants of the current body

Recorded result (v5e, 2026-08-20, queue-drain protocol): shipped kernel
156 ms vs 131 ms mm_floor (1.19x the unavoidable matmul+threshold floor);
minidx 171 ms (the native argmax lowering wins); block_m 256/512/1024
within 2%.  Epilogue formulation is SETTLED -- docs/performance.md.

Timing protocol note: on the tunneled axon backend block_until_ready can
return before execution completes; queue `reps` launches and drain via a
small-leaf np.asarray fetch instead.
"""
import os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.makedirs(os.path.join(ROOT, ".jax_cache"), exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from string_grouper_tpu.ops.pallas_kernels import p1_fused_closed2, _p1_body

M, N, D, TILE, CC = 32768, 663552, 512, 4096, 64

key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (M, D), jnp.float32)
a = jnp.abs(a).astype(jnp.bfloat16) * jnp.bfloat16(0.04)
b = jax.random.normal(jax.random.PRNGKey(1), (N, D), jnp.float32)
b = jnp.abs(b).astype(jnp.bfloat16) * jnp.bfloat16(0.04)
thr = jnp.float32(0.78)


def timeit(f, *args, reps=3):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])  # drain queue (small leaf)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    wall = (time.perf_counter() - t0) / reps
    return wall, out


# ---------------- mm floor: matmul + threshold + per-row count only
def _mm_body(thr_ref, a_ref, b_ref, cnt_ref):
    j = pl.program_id(1)
    @pl.when(j == 0)
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
    s = jnp.dot(a_ref[:], b_ref[:].T, preferred_element_type=jnp.float32)
    cnt_ref[:] = cnt_ref[:] + (s >= thr_ref[0, 0]).sum(axis=1, dtype=jnp.int32)[:, None]


@partial(jax.jit, static_argnames=("bm",))
def mm_floor(a, b, thr, bm=512):
    grid = (M // bm, N // TILE)
    thr2 = thr.reshape(1, 1)
    return pl.pallas_call(
        _mm_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * D,
            bytes_accessed=M * D * 2 + (M // bm) * N * D * 2,
            transcendentals=0,
        ),
    )(thr2, a, b)


# ---------------- minidx variant of the full body
def _p1_body_minidx(thr_ref, a_ref, b_ref, ship_ref, cnt_ref, tmax_ref, bnd_ref,
                    v_ref, c_ref, nfin_ref, tb_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    bm = a_ref.shape[0]
    bn = b_ref.shape[0]
    cand_c = v_ref.shape[1]
    NEG = float("-inf")

    @pl.when(j == 0)
    def _():
        cnt_ref[:] = jnp.zeros((bm, 1), jnp.int32)
        tmax_ref[:] = jnp.zeros((bm, 1), jnp.int32)
        v_ref[:] = jnp.full((bm, cand_c), NEG, jnp.float32)
        c_ref[:] = jnp.zeros((bm, cand_c), jnp.int32)
        nfin_ref[:] = jnp.zeros((bm, 1), jnp.int32)
        tb_ref[:] = jnp.full((bm, 1), NEG, jnp.float32)

    thr = thr_ref[0, 0]
    s = jnp.dot(a_ref[:], b_ref[:].T, preferred_element_type=jnp.float32)
    mask = s >= thr
    ubm = jnp.where(mask, s, NEG)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    cnt = mask.sum(axis=1, dtype=jnp.int32)
    s1 = jnp.where(mask, col_iota, 0).sum(axis=1, dtype=jnp.int32)
    vmax = ubm.max(axis=1)
    # first-argmax via min column among maxima
    cmax = jnp.where(ubm == vmax[:, None], col_iota, bn).min(axis=1)
    cmax = jnp.where(vmax > NEG, cmax, 0).astype(jnp.int32)
    vmax2 = jnp.where(col_iota == cmax[:, None], NEG, ubm).max(axis=1)
    other = s1 - cmax
    have1 = cnt >= 1
    have2 = cnt == 2
    off = j * bn
    p0 = jnp.where(have1, vmax, NEG)
    p1 = jnp.where(have2, vmax2, NEG)
    q0 = jnp.where(have1, cmax, 0) + off
    q1 = jnp.where(have2, other, 0) + off

    cnt_ref[:] = cnt_ref[:] + cnt[:, None]
    tmax_ref[:] = jnp.maximum(tmax_ref[:], cnt[:, None])
    tb_ref[:] = jnp.maximum(tb_ref[:], jnp.where(cnt > 2, vmax2, NEG)[:, None])
    nfin_ref[:] = nfin_ref[:] + (have1.astype(jnp.int32) + have2.astype(jnp.int32))[:, None]

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
    new_v = jnp.where(k == i0, p0[:, None], jnp.where(k == i1, p1[:, None], vs))
    new_c = jnp.where(k == i0, q0[:, None], jnp.where(k == i1, q1[:, None], cs))
    v_ref[:] = new_v
    c_ref[:] = new_c

    @pl.when(j == nj - 1)
    def _():
        trunc = jnp.where(nfin_ref[:, 0] > cand_c, new_v[:, cand_c - 1], NEG)
        bnd_ref[:] = jnp.maximum(tb_ref[:], trunc[:, None])
        ship_ref[:] = jnp.where(new_v > NEG, new_c, -1)


@partial(jax.jit, static_argnames=("bm", "body_name"))
def variant(a, b, thr, bm=512, body_name="minidx"):
    body = {"minidx": _p1_body_minidx, "current": _p1_body}[body_name]
    grid = (M // bm, N // TILE)
    thr2 = thr.reshape(1, 1)
    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, CC), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, CC), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, CC), jnp.float32),
            pltpu.VMEM((bm, CC), jnp.int32),
            pltpu.VMEM((bm, 1), jnp.int32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * D,
            bytes_accessed=M * D * 2 + (M // bm) * N * D * 2 + M * CC * 4,
            transcendentals=0,
        ),
    )(thr2, a, b)


t, cur = timeit(lambda: p1_fused_closed2(a, b, thr, tile=TILE, cand_c=CC))
print(f"current(shipped) : {t*1000:8.1f} ms")
t, _ = timeit(lambda: mm_floor(a, b, thr))
print(f"mm_floor         : {t*1000:8.1f} ms")
for bm in (256, 512, 1024):
    t, out = timeit(lambda bm=bm: variant(a, b, thr, bm=bm, body_name="current"))
    same = bool(jnp.array_equal(out[0], cur[0])) and bool(jnp.array_equal(out[1][:, 0], cur[1]))
    print(f"current bm={bm:<5}: {t*1000:8.1f} ms  identical={same}")
for bm in (256, 512, 1024):
    t, out = timeit(lambda bm=bm: variant(a, b, thr, bm=bm, body_name="minidx"))
    same = bool(jnp.array_equal(out[0], cur[0])) and bool(jnp.array_equal(out[3][:, 0], cur[3]))
    print(f"minidx  bm={bm:<5}: {t*1000:8.1f} ms  identical={same}")
