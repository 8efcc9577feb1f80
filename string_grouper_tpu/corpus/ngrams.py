"""Vectorized character n-gram window extraction.

Produces, for a cleaned :class:`CodepointCorpus`, the full list of n-gram
windows per row -- the same multiset of n-grams the reference analyzer emits
per string (reference: string_grouper/string_grouper.py:377-378, the
zip-shift ``zip(*[string[i:] for i in range(ngram_size)])``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .preprocess import CodepointCorpus


@dataclass(frozen=True)
class NgramWindows:
    """All n-gram occurrences of a corpus, row-major."""

    windows: np.ndarray  # uint32[total_windows, ngram_size] codepoints
    row_ids: np.ndarray  # int64[total_windows] owning row per window
    n_rows: int

    @property
    def total(self) -> int:
        return len(self.row_ids)


def extract_windows(corpus: CodepointCorpus, ngram_size: int) -> NgramWindows:
    """Slide a length-``ngram_size`` window over every row of the corpus."""
    lengths = corpus.lengths()
    wcounts = np.maximum(lengths - ngram_size + 1, 0)
    total = int(wcounts.sum())
    n_rows = corpus.n_rows
    if total == 0:
        return NgramWindows(
            windows=np.zeros((0, ngram_size), dtype=np.uint32),
            row_ids=np.zeros(0, dtype=np.int64),
            n_rows=n_rows,
        )
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), wcounts)
    # Start position of each window in the flat buffer: per-row base offset
    # plus the within-row window index.
    wstarts_cum = np.concatenate(([0], np.cumsum(wcounts)))
    intra = np.arange(total, dtype=np.int64) - np.repeat(wstarts_cum[:-1], wcounts)
    starts = np.repeat(corpus.offsets[:-1], wcounts) + intra
    windows = corpus.buf[starts[:, None] + np.arange(ngram_size, dtype=np.int64)[None, :]]
    return NgramWindows(windows=windows, row_ids=row_ids, n_rows=n_rows)


def windows_as_sortable_keys(windows: np.ndarray) -> np.ndarray:
    """View (total, n) uint32 windows as opaque fixed-width byte keys.

    Big-endian per codepoint so that byte-wise (void dtype) comparison order
    equals Python string comparison order -- this makes our vocabulary sort
    order identical to sklearn's sorted-vocabulary order, which is needed for
    dense-matrix conformance against TfidfVectorizer.
    """
    n = windows.shape[1] if windows.ndim == 2 else 1
    be = np.ascontiguousarray(windows.astype(">u4"))
    return be.view(np.dtype((np.void, 4 * n))).reshape(-1)
