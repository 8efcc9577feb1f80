"""Device-side unsigned feature hashing of ELL TF-IDF rows.

The phase-1 filter of the matcher multiplies *hashed* dense projections of the
TF-IDF rows on the MXU.  Because TF-IDF values are non-negative, bucket
collisions can only *increase* a dot product:

    a_hash . b_hash = sum_buckets (sum_{t in bucket} a_t)(sum_{t in bucket} b_t)
                   >= sum_t a_t * b_t  =  exact cosine similarity

so hashed scores are a provable upper bound and thresholding them can produce
false positives but never false negatives.  This replaces the reference's
sparse-sparse candidate generation (sparse_dot_topn sp_matmul_topn, reference
string_grouper.py:725-732) with an MXU-shaped dense matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32 / phi)


def _log2(x: int) -> int:
    assert x > 0 and (x & (x - 1)) == 0, "hash_dim must be a power of two"
    return x.bit_length() - 1


def bucket_of(ids: jax.Array, dim: int) -> jax.Array:
    """Hash vocabulary indices into [0, dim) via multiplicative hashing."""
    u = ids.astype(jnp.uint32) * jnp.uint32(_KNUTH)
    return (u >> (32 - _log2(dim))).astype(jnp.int32)


def hashed_projection(ids: jax.Array, vals: jax.Array, dim: int) -> jax.Array:
    """Scatter-add ELL rows into dense (n, dim) float32 hashed vectors.

    Padding slots (``ids < 0``) carry ``vals == 0`` and are harmless.
    Device path; for corpus-sized inputs use :func:`hashed_projection_host`
    (device scatter-add is slow at scale).
    """
    n, width = ids.shape
    b = bucket_of(ids, dim)
    v = jnp.where(ids >= 0, vals.astype(jnp.float32), 0.0)
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, width))
    out = jnp.zeros((n, dim), jnp.float32)
    return out.at[rows, b].add(v)


def hashed_projection_host(
    ids: "np.ndarray", vals: "np.ndarray", dim: int
) -> jax.Array:
    """Host-computed hashed projection, transferred to device as bfloat16.

    Uses the native C++/OpenMP kernel when available; numpy fallback
    otherwise.  Identical bucket function and accumulation order to
    :func:`hashed_projection` (f32 accumulate, then bf16 round-to-nearest-
    even, matching the device ``astype(bfloat16)``).
    """
    import numpy as np

    from ..native import get_scorer_lib

    n, width = ids.shape
    log2_dim = _log2(dim)
    lib = get_scorer_lib()
    out = np.empty((n, dim), dtype=np.uint16)
    if lib is not None and n > 0:
        lib.hash_project_bf16(
            np.ascontiguousarray(ids, dtype=np.int32),
            np.ascontiguousarray(vals, dtype=np.float32),
            n, width, log2_dim, out,
        )
    else:
        u = ids.astype(np.int64)
        b = ((u.astype(np.uint64) * np.uint64(2654435761)) % (1 << 32)) >> (
            np.uint64(32 - log2_dim)
        )
        acc = np.zeros((n, dim), dtype=np.float32)
        flat = np.arange(n)[:, None] * dim + b.astype(np.int64)
        v = np.where(ids >= 0, vals.astype(np.float32), 0.0)
        np.add.at(acc.reshape(-1), flat.reshape(-1), v.reshape(-1))
        x = acc.view(np.uint32)
        lsb = (x >> 16) & 1
        out = ((x + 0x7FFF + lsb) >> 16).astype(np.uint16)
    return jax.lax.bitcast_convert_type(jnp.asarray(out), jnp.bfloat16)
