"""Exact float64 scoring of candidate pairs (host).

Routes through the native C++/OpenMP merge-scorer
(native/exact_scorer.cpp) when a compiler is available; otherwise a
vectorized numpy fallback.  Both accumulate shared terms in ascending
vocabulary order -- the same order as the reference's CSR kernels
(sparse_dot_topn row accumulation and scipy ``multiply().sum(axis=1)``,
reference string_grouper.py:439) -- so threshold and tie decisions agree
with the reference to the last float64 bit.
"""

from __future__ import annotations

import numpy as np

from ..corpus.tfidf import EllMatrix
from ..native import get_scorer_lib


def rescore_pairs_fp64(
    left: EllMatrix,
    right: EllMatrix,
    rows: np.ndarray,
    cols: np.ndarray,
    chunk: int = 65536,
) -> np.ndarray:
    """Exact float64 dot for explicit (row, col) pairs."""
    out = np.empty(len(rows), dtype=np.float64)
    if len(rows) == 0:
        return out
    # The encoder may still be filling ids/vals64 on its worker thread
    # (deferred phase 2 overlapping the device scan); join here -- this is
    # the first host reader on the match path.
    left.wait_ready()
    right.wait_ready()
    lib = get_scorer_lib()
    if lib is not None:
        lib.score_pairs_f64(
            np.ascontiguousarray(left.ids),
            np.ascontiguousarray(left.vals64),
            left.width,
            np.ascontiguousarray(right.ids),
            np.ascontiguousarray(right.vals64),
            right.width,
            np.ascontiguousarray(rows, dtype=np.int64),
            np.ascontiguousarray(cols, dtype=np.int64),
            len(rows),
            out,
        )
        return out
    # numpy fallback: blocked all-slots comparison (ids unique per row, so
    # each left slot matches at most one right slot; summing ascending
    # reproduces the merge order exactly).
    for s in range(0, len(rows), chunk):
        r = rows[s : s + chunk]
        c = cols[s : s + chunk]
        a_ids = left.ids[r]  # (p, La)
        a_vals = left.vals64[r]
        b_ids = right.ids[c]  # (p, Lb)
        b_vals = right.vals64[c]
        eq = (a_ids[:, :, None] == b_ids[:, None, :]) & (a_ids[:, :, None] >= 0)
        contrib = np.where(eq, b_vals[:, None, :], 0.0).sum(axis=2)  # (p, La)
        out[s : s + chunk] = np.einsum("pk,pk->p", a_vals, contrib)
    return out


def row_dot_fp64(left: EllMatrix, right: EllMatrix) -> np.ndarray:
    """Row-wise exact float64 dot of two equal-length ELL matrices
    (reference ``dot()``, string_grouper.py:433-440)."""
    assert left.n_rows == right.n_rows
    left.wait_ready()
    right.wait_ready()
    lib = get_scorer_lib()
    if lib is not None:
        out = np.empty(left.n_rows, dtype=np.float64)
        lib.row_dot_f64(
            np.ascontiguousarray(left.ids),
            np.ascontiguousarray(left.vals64),
            left.width,
            np.ascontiguousarray(right.ids),
            np.ascontiguousarray(right.vals64),
            right.width,
            left.n_rows,
            out,
        )
        return out
    return left.row_dot(right)
