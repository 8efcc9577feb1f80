"""The three hashed-projection implementations must agree: they feed the
same upper-bound filter, so bucket assignment and (up to quantization)
values must be consistent."""

import numpy as np
import jax.numpy as jnp

from string_grouper_tpu.corpus.tfidf import EllMatrix
from string_grouper_tpu.ops.hashing import (
    hashed_projection,
    hashed_projection_host,
)
from string_grouper_tpu.ops.matcher import build_hash_matrix


def _rand_ell(n=64, width=16, n_terms=500, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.full((n, width), -1, np.int32)
    vals = np.zeros((n, width), np.float64)
    for i in range(n):
        k = int(rng.integers(3, width))
        ids[i, :k] = np.sort(rng.choice(n_terms, size=k, replace=False))
        v = rng.random(k) + 0.1
        vals[i, :k] = v / np.sqrt((v * v).sum())
    return EllMatrix(ids=ids, vals64=vals, n_terms=n_terms)


def test_hash_paths_agree():
    ell = _rand_ell()
    dim = 256
    dev = np.asarray(
        hashed_projection(
            jnp.asarray(ell.ids), jnp.asarray(ell.vals64.astype(np.float32)), dim
        )
    )
    host = np.asarray(hashed_projection_host(ell.ids, ell.vals64, dim)).astype(
        np.float32
    )
    packed = np.asarray(build_hash_matrix(ell, ell.n_rows, dim)).astype(
        np.float32
    )
    # Same buckets (same nonzero structure).
    np.testing.assert_array_equal(dev != 0, host != 0)
    np.testing.assert_array_equal(dev != 0, packed != 0)
    # host path: bf16 of the same f32 accumulation -- tight.
    np.testing.assert_allclose(host, dev, rtol=1e-2, atol=1e-3)
    # packed path: uint16 upward quantization -- values never lower than
    # exact by more than bf16 rounding, never higher than quantization + bf16.
    assert (packed >= dev * (1 - 0.01) - 1e-3).all()
    assert (packed <= dev * (1 + 0.01) + 1e-2).all()


def test_padding_rows_hash_to_zero():
    ell = _rand_ell(n=10)
    h = np.asarray(build_hash_matrix(ell, 16, 64))
    assert (h[10:] == 0).all()


def test_tiered_upload_equals_single_path():
    """The two-tier width upload (build_hash_matrix) must produce exactly
    the same hash matrix as the single-width path, in the original row
    order."""
    rng = np.random.default_rng(5)
    n, n_terms = 200, 800
    ids = np.full((n, 48), -1, np.int32)
    vals = np.zeros((n, 48), np.float64)
    for i in range(n):
        k = int(rng.integers(5, 20 if i % 3 else 48))  # long-tail widths
        ids[i, :k] = np.sort(rng.choice(n_terms, size=k, replace=False))
        v = rng.random(k) + 0.1
        vals[i, :k] = v / np.sqrt((v * v).sum())
    ell = EllMatrix(ids=ids, vals64=vals, n_terms=n_terms)
    single = np.asarray(build_hash_matrix(ell, 256, 128, min_rows=10**9))
    tiered = np.asarray(build_hash_matrix(ell, 256, 128, min_rows=0))
    np.testing.assert_array_equal(single, tiered)
