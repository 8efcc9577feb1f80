"""Fused phase-1 Pallas kernel vs the XLA tile body (interpret mode on the
CPU backend; the real-TPU compiled path is exercised by bench.py's
path-identity check and verified frame-identical there every round)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from string_grouper_tpu.ops.matcher import _ub_topk_scan
from string_grouper_tpu.ops.pallas_kernels import (
    p1_fused_closed2,
    p1_fused_supported,
)

NEG = -np.inf


def _rand(m, n, d, seed=0, nnz=20):
    """L2-normalized sparse-ish rows so thresholding yields realistic
    qualified counts (incl. exact ties from duplicated rows)."""
    rng = np.random.default_rng(seed)
    dense = np.zeros((n, d), np.float32)
    cols = rng.integers(0, d, size=(n, nnz))
    vals = rng.random((n, nnz)).astype(np.float32)
    np.put_along_axis(dense, cols, vals, axis=1)
    # plant exact duplicates (tie handling) and near-duplicates
    dense[1] = dense[0]
    dense[2] = dense[0]
    dense /= np.linalg.norm(dense, axis=1, keepdims=True) + 1e-9
    a = jnp.asarray(dense[:m], jnp.bfloat16)
    b = jnp.asarray(dense, jnp.bfloat16)
    return a, b


def _xla_oracle(a, b, thr, tile, cand_c):
    b_tiles = b.reshape(b.shape[0] // tile, tile, b.shape[1])
    w_vals, w_cols, counts, tmax, bound = _ub_topk_scan(
        a, b_tiles, jnp.float32(thr), cand_c, 2
    )
    ship = np.asarray(jnp.where(w_vals > -jnp.inf, w_cols, -1))
    return (
        ship,
        np.asarray(counts),
        np.asarray(tmax),
        np.asarray(bound),
    )


@pytest.mark.parametrize("thr", [0.6, 0.85])
@pytest.mark.parametrize("m,n,tile,cand_c", [
    (256, 512, 256, 8),
    (512, 1024, 256, 16),
])
def test_fused_matches_xla_body(m, n, tile, cand_c, thr):
    assert p1_fused_supported(m, n, 128, tile, cand_c)
    a, b = _rand(m, n, 128)
    ship, counts, tmax, bound, max_cnt = p1_fused_closed2(
        a, b, jnp.float32(thr), tile=tile, cand_c=cand_c, block_m=256,
        interpret=True,
    )
    o_ship, o_counts, o_tmax, o_bound = _xla_oracle(a, b, thr, tile, cand_c)
    ship = np.asarray(ship)
    np.testing.assert_array_equal(np.asarray(counts), o_counts)
    np.testing.assert_array_equal(np.asarray(tmax), o_tmax)
    assert int(max_cnt) == int(o_tmax.max())
    np.testing.assert_array_equal(np.asarray(bound), o_bound)
    # candidate SETS per row must match exactly (tie order inside the
    # truncation region may differ; exactness only needs set identity
    # whenever nothing was dropped, and equal bounds otherwise)
    for r in range(m):
        assert set(ship[r][ship[r] >= 0].tolist()) == set(
            o_ship[r][o_ship[r] >= 0].tolist()
        ), f"row {r}"
    # valid entries must form a prefix (the _compact_cols invariant)
    valid = ship >= 0
    assert (valid[:, 1:] <= valid[:, :-1]).all()


def test_fused_empty_threshold():
    a, b = _rand(256, 512, 128)
    ship, counts, tmax, bound, max_cnt = p1_fused_closed2(
        a, b, jnp.float32(1e9), tile=256, cand_c=8, block_m=256,
        interpret=True,
    )
    assert (np.asarray(counts) == 0).all()
    assert (np.asarray(ship) == -1).all()
    assert int(max_cnt) == 0
    assert not np.isfinite(np.asarray(bound)).any()


def test_fused_truncation_bound():
    """When a row has more finite candidates than cand_c, the drop bound
    must cover everything truncated (= the cand_c-th kept value)."""
    rng = np.random.default_rng(3)
    d = 128
    base = rng.random(d).astype(np.float32)
    dense = base[None, :] * rng.uniform(0.9, 1.1, (512, 1)).astype(np.float32)
    dense += rng.random((512, d)).astype(np.float32) * 0.01
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    a = jnp.asarray(dense[:256], jnp.bfloat16)
    b = jnp.asarray(dense, jnp.bfloat16)
    thr = 0.5
    ship, counts, tmax, bound, _ = p1_fused_closed2(
        a, b, jnp.float32(thr), tile=256, cand_c=8, block_m=256,
        interpret=True,
    )
    o_ship, o_counts, o_tmax, o_bound = _xla_oracle(
        a, b, thr, 256, 8
    )
    np.testing.assert_array_equal(np.asarray(counts), o_counts)
    np.testing.assert_array_equal(np.asarray(tmax), o_tmax)
    np.testing.assert_array_equal(np.asarray(bound), o_bound)
    assert np.isfinite(np.asarray(bound)).all()  # every row truncates here


def test_chained_passes_equal_single_pass():
    """Column-chunked phase 1 (chained per-right-chunk passes,
    ``p1_fused_chain``) must be BITWISE equal to one full-corpus pass --
    including tied UB values (duplicated right rows), truncation, and
    drop bounds.  This is the correctness contract of the chunked upload
    pipeline (ops/matcher.py run_stream use_chunked branch)."""
    from string_grouper_tpu.ops.pallas_kernels import (
        p1_chain_init,
        p1_fused_chain,
    )

    rng = np.random.default_rng(11)
    m, d, tile, cand = 512, 128, 256, 16
    n_chunks = [1024, 768, 512]  # unequal, tile-aligned
    n = sum(n_chunks)
    a = jnp.asarray(
        (rng.random((m, d)) * 0.15).astype(np.float32)
    ).astype(jnp.bfloat16)
    bf = (rng.random((n, d)) * 0.15).astype(np.float32)
    bf[100] = bf[50]
    bf[1300] = bf[50]  # cross-chunk tie
    bf[2000] = bf[701]
    b_full = jnp.asarray(bf).astype(jnp.bfloat16)
    thr = jnp.float32(0.8)

    single = p1_fused_closed2(
        a, b_full, thr, tile=tile, cand_c=cand, block_m=256, interpret=True
    )
    starts = np.concatenate(([0], np.cumsum(n_chunks)))
    st = p1_chain_init(m, cand)
    for k, nc in enumerate(n_chunks):
        out = p1_fused_chain(
            a, b_full[starts[k]:starts[k + 1]], thr, int(starts[k]), *st,
            tile=tile, cand_c=cand, block_m=256, interpret=True,
        )
        st = out[5:]
    for got, want, name in zip(
        out[:5], single, ("ship", "counts", "tmax", "bound", "max_cnt")
    ):
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=name
        )
