"""Connected components: native union-find vs device kernel vs oracle.

The dedup path (reference string_grouper.py:863) needs one partition with
deterministic labels (smallest member index).  Both implementations must
agree bit-for-bit so the engine can route by data residency.
"""

import numpy as np
import pytest

from string_grouper_tpu.native import get_scorer_lib
from string_grouper_tpu.ops.connected_components import (
    _cc_kernel,
    _next_pow2,
    connected_components,
)


def _device_labels(a, b, n):
    import jax.numpy as jnp

    e = len(a)
    cap = _next_pow2(max(e, 8))
    n_pad = _next_pow2(max(n, 8))
    aa = np.full(cap, n_pad - 1, dtype=np.int32)
    bb = np.full(cap, n_pad - 1, dtype=np.int32)
    aa[:e] = a
    bb[:e] = b
    return np.asarray(_cc_kernel(jnp.asarray(aa), jnp.asarray(bb), n_pad))[
        :n
    ].astype(np.int64)


def _oracle_labels(a, b, n):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return np.array([find(i) for i in range(n)], dtype=np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n,e", [(1, 0), (7, 3), (64, 200), (500, 1500)])
def test_native_equals_device_equals_oracle(seed, n, e):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, size=e).astype(np.int64)
    b = rng.integers(0, n, size=e).astype(np.int64)
    expected = _oracle_labels(a, b, n)
    got = connected_components(a, b, n)
    np.testing.assert_array_equal(got, expected)
    np.testing.assert_array_equal(_device_labels(a, b, n), expected)


def test_native_lib_present():
    """The perf-critical native path must actually be in play on CI."""
    assert get_scorer_lib() is not None


def test_chain_and_selfloops():
    # A long chain exercises path compression; self-loops are no-ops.
    n = 300
    a = np.arange(n - 1, dtype=np.int64)
    b = a + 1
    a = np.r_[a, np.arange(n, dtype=np.int64)]
    b = np.r_[b, np.arange(n, dtype=np.int64)]
    got = connected_components(a, b, n)
    np.testing.assert_array_equal(got, np.zeros(n, dtype=np.int64))
