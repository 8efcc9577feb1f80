"""Conformance of the ELL TF-IDF encoder against sklearn's TfidfVectorizer
configured exactly as the reference does (string_grouper.py:306):
``TfidfVectorizer(min_df=1, analyzer=n_grams, dtype=np.float64)``.
"""

import re
from unicodedata import normalize

import numpy as np
import pandas as pd
import pytest
from sklearn.feature_extraction.text import TfidfVectorizer

from string_grouper_tpu.config import StringGrouperConfig
from string_grouper_tpu.corpus import TfidfEncoder, clean_corpus, extract_windows


def reference_ngrams(string, config=StringGrouperConfig()):
    """The reference analyzer, reproduced as a test oracle
    (string_grouper.py:365-378)."""
    if config.ignore_case and string is not None:
        string = string.lower()
    if config.normalize_to_ascii:
        string = normalize("NFKD", string).encode("ASCII", "ignore").decode()
    string = re.sub(config.regex, r"", string)
    grams = zip(*[string[i:] for i in range(config.ngram_size)])
    return ["".join(g) for g in grams]


def sklearn_tfidf(strings, config=StringGrouperConfig()):
    vec = TfidfVectorizer(
        min_df=1, analyzer=lambda s: reference_ngrams(s, config), dtype=np.float64
    )
    return vec.fit(strings), vec.fit_transform(strings).toarray()


CORPORA = {
    "simple": ["foo", "bar", "baz"],
    "customers": [
        "Mega Enterprises Corporation",
        "Hyper Startup Incorporated",
        "Hyper Startup Inc.",
        "Hyper-Startup Inc.",
        "Hyper Hyper Inc.",
        "Mega Enterprises Corp.",
    ],
    "repeats": ["aaaa", "aaab", "abab", "banana bandana", "a-a.a/a,a"],
    "unicode": ["Café Ltd", "CAFE ltd.", "naïve œuvre", "Ωmega GmbH", "café ltd"],
    "with_empty_cleanup": ["...", "a", "ab", "abc", "abcd"],
}


@pytest.mark.parametrize("name", list(CORPORA))
def test_dense_matrix_matches_sklearn(name):
    strings = CORPORA[name]
    config = StringGrouperConfig()
    _, expected = sklearn_tfidf(strings, config)
    enc = TfidfEncoder(config)
    got = enc.fit_transform(strings).to_dense()
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-13, atol=1e-15)


def test_vocabulary_order_matches_sklearn():
    strings = CORPORA["customers"]
    config = StringGrouperConfig()
    vec, _ = sklearn_tfidf(strings, config)
    sk_vocab = [t for t, _ in sorted(vec.vocabulary_.items(), key=lambda kv: kv[1])]
    enc = TfidfEncoder(config).fit(strings)
    assert enc.vocabulary_terms() == sk_vocab


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(ignore_case=False),
        dict(normalize_to_ascii=False),
        dict(ngram_size=2),
        dict(ngram_size=5),
        dict(regex=r"[aeiou]"),
    ],
)
def test_option_variants_match_sklearn(kwargs):
    strings = CORPORA["unicode"] + CORPORA["customers"]
    config = StringGrouperConfig(**kwargs)
    _, expected = sklearn_tfidf(strings, config)
    got = TfidfEncoder(config).fit_transform(strings).to_dense()
    np.testing.assert_allclose(got, expected, rtol=1e-13, atol=1e-15)


def test_transform_against_fitted_vocab_drops_oov():
    config = StringGrouperConfig()
    fit_strings = ["foo", "bar", "baz"]
    new_strings = ["foo", "bop", "barfoo"]
    vec = TfidfVectorizer(
        min_df=1, analyzer=lambda s: reference_ngrams(s, config), dtype=np.float64
    ).fit(fit_strings)
    expected = vec.transform(new_strings).toarray()
    enc = TfidfEncoder(config).fit(fit_strings)
    got = enc.transform(new_strings).to_dense()
    np.testing.assert_allclose(got, expected, rtol=1e-13, atol=1e-15)


def test_fit_transform_pair_shared_corpus():
    """Vocabulary/IDF fit on concat of both sides (reference :699-707)."""
    config = StringGrouperConfig()
    master = ["foo", "bar", "baz"]
    dupes = ["foo", "bar", "bop"]
    vec = TfidfVectorizer(
        min_df=1, analyzer=lambda s: reference_ngrams(s, config), dtype=np.float64
    ).fit(master + dupes)
    enc = TfidfEncoder(config)
    m, d = enc.fit_transform_pair(master, dupes)
    np.testing.assert_allclose(m.to_dense(), vec.transform(master).toarray(), rtol=1e-13)
    np.testing.assert_allclose(d.to_dense(), vec.transform(dupes).toarray(), rtol=1e-13)
    # reference test expectation (test_string_grouper.py:530-544)
    expected_master = np.array(
        [[0.0, 0.0, 0.0, 1.0], [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    )
    expected_dupes = np.array(
        [[0.0, 0.0, 0.0, 1.0], [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    )
    np.testing.assert_array_equal(m.to_dense(), expected_master)
    np.testing.assert_array_equal(d.to_dense(), expected_dupes)


def test_row_dot_matches_reference_pairwise_values():
    """Golden values from reference test_compute_pairwise_similarities
    (test_string_grouper.py:364-385)."""
    config = StringGrouperConfig()
    s1 = [
        "Mega Enterprises Corporation",
        "Hyper Startup Incorporated",
        "Hyper Startup Inc.",
        "Hyper-Startup Inc.",
        "Hyper Hyper Inc.",
        "Mega Enterprises Corp.",
    ]
    s2 = [
        "Mega Enterprises Corporation",
        "Hyper Startup Inc.",
        "Hyper Startup Inc.",
        "Hyper Startup Inc.",
        "Hyper Hyper Inc.",
        "Mega Enterprises Corporation",
    ]
    enc = TfidfEncoder(config)
    m, d = enc.fit_transform_pair(s1, s2)
    sims = m.row_dot(d)
    expected = np.array(
        [1.0, 0.6336195351561589, 1.0000000000000004, 1.0000000000000004, 1.0, 0.826462625999832]
    )
    np.testing.assert_allclose(sims, expected, rtol=1e-12)


def test_clean_corpus_fast_path_equals_general_path():
    config = StringGrouperConfig()
    strings = ["Hello, World./-", "  spaces\tand\nnewlines ", "MiXeD-CaSe."]
    fast = clean_corpus(strings, config)
    # Force the general path by using a semantically-identical regex.
    config2 = StringGrouperConfig(regex=r"[,-./]|\s")
    import string_grouper_tpu.corpus.preprocess as pp

    general = pp._clean_general(strings, config2)
    np.testing.assert_array_equal(fast.buf, general.buf)
    np.testing.assert_array_equal(fast.offsets, general.offsets)


@pytest.mark.parametrize("name", ["customers", "unicode"])
def test_void_fallback_path_equals_packed(name):
    """ngram_size=9 ASCII (8x9=72 > 64 bits) forces the void-key fallback;
    it must produce exactly the same encoding sklearn does, like the packed
    path."""
    strings = [s * 3 for s in CORPORA[name]]  # long enough for 9-grams
    config = StringGrouperConfig(ngram_size=9)
    _, expected = sklearn_tfidf(strings, config)
    enc = TfidfEncoder(config)
    got = enc.fit_transform(strings)
    assert enc._packed_bits is None  # fallback actually exercised
    np.testing.assert_allclose(got.to_dense(), expected, rtol=1e-13, atol=1e-15)


def test_transform_drops_codepoints_outside_fitted_packing():
    """Fit on ASCII (8-bit packing); transform on strings with non-ASCII
    codepoints (with normalization off) -- those n-grams are OOV and must be
    dropped, matching sklearn's transform semantics."""
    config = StringGrouperConfig(normalize_to_ascii=False, ngram_size=3)
    fit_strings = ["abcdef", "bcdefg", "cdefgh"]
    vec = TfidfVectorizer(
        min_df=1,
        analyzer=lambda s: reference_ngrams(s, config),
        dtype=np.float64,
    )
    vec.fit(fit_strings)
    enc = TfidfEncoder(config)
    enc.fit(fit_strings)
    assert enc._packed_bits == 8
    hard = ["abcдef", "дддддд", "abcdef"]
    expected = vec.transform(hard).toarray()
    got = enc.transform(hard).to_dense()
    np.testing.assert_allclose(got, expected, rtol=1e-13, atol=1e-15)


def test_transform_all_out_of_vocabulary():
    """Regression (advisor, round 1): transform of strings whose every
    n-gram is out-of-vocabulary must yield all-zero rows (sklearn transform
    semantics), not crash."""
    from string_grouper_tpu.config import StringGrouperConfig
    from string_grouper_tpu.corpus import TfidfEncoder

    enc = TfidfEncoder(StringGrouperConfig())
    enc.fit(["apple inc", "apple incorporated", "banana llc"])
    out = enc.transform(["zzzzzz"])
    assert out.n_rows == 1
    assert (out.ids < 0).all()
    assert (out.vals64 == 0).all()
    # Mixed batch: known + unknown rows.
    out2 = enc.transform(["apple inc", "qqqqqq"])
    assert out2.n_rows == 2
    assert (out2.ids[0] >= 0).any()
    assert (out2.ids[1] < 0).all()


@pytest.mark.parametrize("name", list(CORPORA))
def test_float32_matrix_matches_sklearn_bitwise(name):
    """tfidf_matrix_dtype=float32 flows into the matrix values (reference
    string_grouper.py:306), reproducing sklearn's f32 rounding points
    bit-for-bit: f32(tf*idf), float64 norm accumulation, f32 division."""
    strings = CORPORA[name]
    config = StringGrouperConfig(tfidf_matrix_dtype=np.float32)
    vec = TfidfVectorizer(
        min_df=1,
        analyzer=lambda s: reference_ngrams(s, config),
        dtype=np.float32,
    )
    expected = vec.fit_transform(strings).toarray()
    got = TfidfEncoder(config).fit_transform(strings).to_dense()
    got32 = got.astype(np.float32)
    assert np.array_equal(
        got32.view(np.int32), expected.view(np.int32)
    ), "f32 TF-IDF values differ bitwise from sklearn"
    # The stored float64 values must be exactly the f32 values (no hidden
    # extra precision feeding the scorer).
    np.testing.assert_array_equal(got, got32.astype(np.float64))


def test_float32_pairwise_similarities_match_f32_reference():
    """compute_pairwise_similarities under f32 equals the reference's own
    chain on the customers fixture: scipy ``multiply().sum(axis=1)`` on
    sklearn's float32 matrices (reference string_grouper.py:433-440), which
    ACCUMULATES in float32 (scipy's axis-1 sum is a csr matvec in the
    matrix dtype) -- identical strings therefore report 1.0000001, not 1.0,
    exactly like the reference."""
    import string_grouper_tpu as sgt

    s1 = pd.Series(CORPORA["customers"])
    s2 = pd.Series(list(reversed(CORPORA["customers"])))
    config = StringGrouperConfig(tfidf_matrix_dtype=np.float32)
    vec = TfidfVectorizer(
        min_df=1,
        analyzer=lambda s: reference_ngrams(s, config),
        dtype=np.float32,
    )
    vec.fit(list(s1) + list(s2))
    a, b = vec.transform(s1), vec.transform(s2)
    expected = np.asarray(
        a.multiply(b).sum(axis=1), dtype=np.float32
    ).ravel()
    got = sgt.compute_pairwise_similarities(
        s1, s2, tfidf_matrix_dtype=np.float32
    )
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got.to_numpy(), expected)
