"""Exact cosine rescoring of candidate pairs.

Device path: fp32 sparse-sparse dot of two ELL rows via a fori-loop over the
left row's slots (VPU work; the slot count per string is small).

Host path: float64 rescore used for final decision-making, reproducing the
reference's float64 arithmetic (its CSR kernel accumulates shared terms in
ascending vocabulary order -- as does our ascending-id ELL merge), so
threshold and tie decisions agree with the reference to fp64 precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..corpus.tfidf import EllMatrix


def rescore_gathered(
    a_ids: jax.Array,  # (m, La) int32
    a_vals: jax.Array,  # (m, La) f32
    b_ids: jax.Array,  # (m, C, Lb) int32 gathered candidate rows
    b_vals: jax.Array,  # (m, C, Lb) f32
) -> jax.Array:
    """Exact fp32 dot between row i of A and each of its C candidates."""
    m, la = a_ids.shape

    def body(k, acc):
        a_id = a_ids[:, k][:, None, None]  # (m,1,1)
        a_val = a_vals[:, k][:, None]  # (m,1)
        hit = (b_ids == a_id) & (a_id >= 0)
        contrib = jnp.sum(jnp.where(hit, b_vals, 0.0), axis=-1)  # (m,C)
        return acc + a_val * contrib

    init = jnp.zeros(b_ids.shape[:2], jnp.float32)
    return jax.lax.fori_loop(0, la, body, init)


def rescore_pairs_fp64(
    left: EllMatrix,
    right: EllMatrix,
    rows: np.ndarray,
    cols: np.ndarray,
    chunk: int = 65536,
) -> np.ndarray:
    """Host float64 exact dot for explicit (row, col) pairs.

    Accumulation runs in ascending shared-term order, matching the CSR
    row-accumulator order of the reference's kernel (sparse_dot_topn) and of
    scipy's ``multiply().sum(axis=1)`` (reference string_grouper.py:439).
    """
    out = np.zeros(len(rows), dtype=np.float64)
    la = left.width
    for s in range(0, len(rows), chunk):
        r = rows[s : s + chunk]
        c = cols[s : s + chunk]
        a_ids = left.ids[r]  # (p, La)
        a_vals = left.vals64[r]
        b_ids = right.ids[c]  # (p, Lb)
        b_vals = right.vals64[c]
        eq = (a_ids[:, :, None] == b_ids[:, None, :]) & (a_ids[:, :, None] >= 0)
        # Ascending-term accumulation: slot k of A matches at most one slot of
        # B (ids are unique per row), so summing over l then over k ascending
        # reproduces the merge order exactly.
        contrib = np.where(eq, b_vals[:, None, :], 0.0).sum(axis=2)  # (p, La)
        out[s : s + chunk] = np.einsum("pk,pk->p", a_vals, contrib)
    return out
