"""End-to-end float32 conformance (VERDICT r2 item 6).

With ``tfidf_matrix_dtype=float32`` the reference's dtype flows into the
MATRIX and every downstream kernel (reference string_grouper.py:306): the
TF-IDF values round at f32, sp_matmul_topn accumulates scores in f32 (its
dense column accumulator receives contributions in ascending shared-term
order) and thresholds against the f32-cast threshold, and scipy's
``multiply().sum(axis=1)`` row-dot (``dot()``) accumulates in f32.  These
tests pin the whole chain against INDEPENDENT oracles built from sklearn's
own float32 TfidfVectorizer output."""

import re
import unicodedata

import numpy as np
import pandas as pd
import pytest

import string_grouper_tpu as sgt
from string_grouper_tpu.config import StringGrouperConfig


def _ngrams(s, n=3):
    s = unicodedata.normalize("NFKD", s.lower()).encode(
        "ascii", "ignore"
    ).decode()
    s = re.sub(r"[,-./]|\s", "", s)
    return ["".join(g) for g in zip(*[s[i:] for i in range(n)])]


def _sklearn_f32(corpus):
    from sklearn.feature_extraction.text import TfidfVectorizer

    v = TfidfVectorizer(min_df=1, analyzer=_ngrams, dtype=np.float32)
    x = v.fit_transform(corpus)  # csr float32
    # sklearn emits indices in occurrence order; sp_matmul_topn requires
    # canonical CSR and canonicalizes on entry, so the reference's SPA
    # accumulates contributions in ascending term order -- sort here so the
    # oracle walks the same order.
    x.sort_indices()
    return x


def _f32_merge_scores(x):
    """All-pairs cosine with f32 accumulation in ascending term order --
    the sp_matmul_topn accumulation semantics (canonical CSR)."""
    n = x.shape[0]
    out = np.zeros((n, n), dtype=np.float32)
    rows = [
        (x.indices[x.indptr[i]:x.indptr[i + 1]],
         x.data[x.indptr[i]:x.indptr[i + 1]])
        for i in range(n)
    ]
    for i in range(n):
        ai, av = rows[i]
        for j in range(n):
            bi, bv = rows[j]
            acc = np.float32(0)
            p = q = 0
            while p < len(ai) and q < len(bi):
                if ai[p] == bi[q]:
                    acc = np.float32(acc + np.float32(av[p] * bv[q]))
                    p += 1
                    q += 1
                elif ai[p] < bi[q]:
                    p += 1
                else:
                    q += 1
            out[i, j] = acc
    return out


CORPUS = [
    "Mega Enterprises Corporation",
    "Mega Enterprises Corp.",
    "Hyper Startup Inc.",
    "Hyper-Startup Inc.",
    "Hyper Startup Incorporated",
    "Mega Corp.",
    "Hyper Hyper Inc.",
    "Slimy Startup Inc",
]


@pytest.mark.parametrize("thr", [0.5, 0.7, 0.8])
def test_match_strings_float32_vs_sklearn_oracle(thr):
    series = pd.Series(CORPUS)
    x = _sklearn_f32(CORPUS)
    sims = _f32_merge_scores(x)
    thr32 = np.float32(thr)
    out = sgt.match_strings(
        series, min_similarity=thr, tfidf_matrix_dtype=np.float32
    )
    assert out.similarity.dtype == np.float32
    got = {
        (int(r), int(c)): np.float32(s)
        for r, c, s in zip(out.left_index, out.right_index, out.similarity)
    }
    # reference self-join semantics: threshold in f32, diagonal forced to
    # exactly 1, symmetrized
    exp = {}
    for i in range(len(CORPUS)):
        for j in range(len(CORPUS)):
            if i == j:
                continue
            s = sims[i, j]
            if s > 0 and s >= thr32:
                exp[(i, j)] = s
    exp_sym = {}
    for (i, j), v in exp.items():
        exp_sym[(i, j)] = v
        exp_sym[(j, i)] = v
    for i in range(len(CORPUS)):
        exp_sym[(i, i)] = np.float32(1.0)
    assert set(got) == set(exp_sym)
    for k in exp_sym:
        assert got[k] == exp_sym[k], (k, got[k], exp_sym[k])


def test_match_most_similar_float32_ties():
    """Top-1 tie-breaking must operate on the f32-rounded scores: values
    that differ in f64 but round to the same f32 tie to the smaller master
    index."""
    master = pd.Series(CORPUS)
    dupes = pd.Series(["Mega Enterprises Co", "Hyper Startup",
                       "completely unrelated text"])
    both = list(master) + list(dupes)
    x = _sklearn_f32(both)
    sims = _f32_merge_scores(x)[len(master):, :len(master)]
    out = sgt.match_most_similar(
        master, dupes, min_similarity=0.3, tfidf_matrix_dtype=np.float32,
        ignore_index=True,
    )
    for d in range(len(dupes)):
        qual = [m for m in range(len(master))
                if sims[d, m] > 0 and sims[d, m] >= np.float32(0.3)]
        if not qual:
            assert out.iloc[d] == dupes.iloc[d]
            continue
        best = max(sims[d, m] for m in qual)
        exp_m = min(m for m in qual if sims[d, m] == best)
        assert out.iloc[d] == master.iloc[exp_m], (d, out.iloc[d])


def test_compute_pairwise_similarities_float32():
    """Row-dot in f32 accumulation: must equal scipy's
    ``X.multiply(Y).sum(axis=1)`` on sklearn's f32 matrices cast to f32 --
    the reference dot() chain (string_grouper.py:433-440)."""
    s1 = pd.Series(CORPUS[:4])
    s2 = pd.Series(CORPUS[4:])
    from sklearn.feature_extraction.text import TfidfVectorizer

    v = TfidfVectorizer(min_df=1, analyzer=_ngrams, dtype=np.float32)
    v.fit(pd.concat([s1, s2]))
    x1, x2 = v.transform(s1), v.transform(s2)
    expected = np.asarray(
        x1.multiply(x2).sum(axis=1), dtype=np.float32
    ).ravel()
    got = sgt.compute_pairwise_similarities(
        s1, s2, tfidf_matrix_dtype=np.float32
    )
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got.to_numpy(), expected)
