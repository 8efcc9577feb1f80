"""Bitwise parity of the native C++ TF-IDF encoder against the numpy path.

The numpy implementation is the oracle (itself parity-tested against real
sklearn in test_tfidf_parity.py); the native path must agree to the last
bit on ids, values, vocabulary, and IDF."""

import numpy as np
import pytest

from string_grouper_tpu.config import StringGrouperConfig
from string_grouper_tpu.corpus import tfidf as T
from string_grouper_tpu.corpus.tfidf import TfidfEncoder

CORPORA = {
    "company_names": [
        "Mega Enterprises Corporation",
        "Hyper Startup Incorporated",
        "Hyper Startup Inc.",
        "Hyper-Startup Inc.",
        "Hyper Hyper Inc.",
        "Mega Enterprises Corp.",
    ],
    "punct_and_repeats": [
        "aaaaaa", "ab", "a,b./c", "   ", "zzz zzz zzz", "", "a-b-a-b-a",
    ],
    "short_rows": ["x", "xy", "xyz", "wxyz"],
}


def _numpy_encoder(kwargs=None):
    enc = TfidfEncoder(StringGrouperConfig(**(kwargs or {})))
    # Force the numpy path regardless of native availability.
    enc._native_fit_transform = lambda strings: None
    enc._native_transform = lambda strings: None
    return enc


def _native_available():
    return T._native_eligible(StringGrouperConfig()) is not None


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="native encoder unavailable (no compiler)"
)


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_fit_transform_bitwise(name):
    strings = CORPORA[name]
    nat = TfidfEncoder(StringGrouperConfig())
    ref = _numpy_encoder()
    e_nat = nat.fit_transform(strings)
    e_ref = ref.fit_transform(strings)
    np.testing.assert_array_equal(nat.vocab_keys_, ref.vocab_keys_)
    np.testing.assert_array_equal(nat.idf_, ref.idf_)
    assert e_nat.width == e_ref.width
    np.testing.assert_array_equal(e_nat.ids, e_ref.ids)
    np.testing.assert_array_equal(e_nat.vals64, e_ref.vals64)


def test_transform_oov_bitwise():
    corpus = CORPORA["company_names"]
    new = ["Hyper Mega Inc.", "zzzzzz", "", "Corporation Enterprises"]
    nat = TfidfEncoder(StringGrouperConfig()).fit(corpus)
    ref = _numpy_encoder().fit(corpus)
    e_nat = nat.transform(new)
    e_ref = ref.transform(new)
    np.testing.assert_array_equal(e_nat.ids, e_ref.ids)
    np.testing.assert_array_equal(e_nat.vals64, e_ref.vals64)


def test_case_sensitive_and_small_ngrams():
    for kwargs in ({"ignore_case": False}, {"ngram_size": 2}, {"ngram_size": 1}):
        nat = TfidfEncoder(StringGrouperConfig(**kwargs))
        ref = _numpy_encoder(kwargs)
        e_nat = nat.fit_transform(CORPORA["company_names"])
        e_ref = ref.fit_transform(CORPORA["company_names"])
        np.testing.assert_array_equal(nat.vocab_keys_, ref.vocab_keys_)
        np.testing.assert_array_equal(e_nat.ids, e_ref.ids)
        np.testing.assert_array_equal(e_nat.vals64, e_ref.vals64)


def test_non_ascii_fold_equivalence():
    enc = TfidfEncoder(StringGrouperConfig())
    ell = enc.fit_transform(["Café Müller GmbH", "Cafe Muller GmbH"])
    # NFKD fold means both rows encode identically (the native path now
    # pre-folds non-ASCII input instead of falling back to numpy).
    np.testing.assert_array_equal(ell.ids[0], ell.ids[1])
    np.testing.assert_array_equal(ell.vals64[0], ell.vals64[1])


def test_empty_vocabulary_raises():
    with pytest.raises(ValueError, match="empty vocabulary"):
        TfidfEncoder(StringGrouperConfig()).fit_transform([",,", "  ", "a"])


def test_unicode_prefold_native_parity():
    """Non-ASCII corpora with normalize_to_ascii (default) pre-fold on the
    host and still take the native path -- bitwise equal to the numpy
    oracle, with the device payload + clean-hashes attached."""
    corpus = [
        "Café Müller GmbH", "Cafe Muller GmbH", "Ångström Labs",
        "angstrom labs", "ínterñatiònal Hóldings", "plain ascii name",
        "Ümlaut Industries Ltd.",
    ]
    enc = TfidfEncoder(StringGrouperConfig())
    got = enc.fit_transform(corpus)
    ref_enc = _numpy_encoder()
    ref = ref_enc.fit_transform(corpus)
    np.testing.assert_array_equal(enc.vocab_keys_, ref_enc.vocab_keys_)
    np.testing.assert_array_equal(enc.idf_, ref_enc.idf_)
    np.testing.assert_array_equal(got.ids, ref.ids)
    np.testing.assert_array_equal(got.vals64, ref.vals64)
    assert got.device_src is not None
    assert got.device_src.row_hash is not None
    # folded equality: accented and plain forms collapse to equal hashes
    h = got.device_src.row_hash
    assert h[0] == h[1]  # Café/Cafe
    assert h[2] == h[3]  # Ångström/angstrom


def test_unicode_prefold_transform_parity():
    corpus = ["Café Müller", "Mega Corp", "Ångström"]
    enc = TfidfEncoder(StringGrouperConfig()).fit(corpus)
    ref = _numpy_encoder().fit(corpus)
    new = ["café muller", "unknown ünïts", "mega corp"]
    got = enc.transform(new)
    exp = ref.transform(new)
    np.testing.assert_array_equal(got.ids, exp.ids)
    np.testing.assert_array_equal(got.vals64, exp.vals64)


def test_numpy_refit_invalidates_device_tables():
    """Review regression: a numpy-path re-fit (e.g. a row above the native
    length cap) must invalidate the device tables cached by a previous
    native-path fit -- a later transform would otherwise pair the OLD
    vocabulary's table with the NEW fit's idf/norms."""
    from string_grouper_tpu.config import StringGrouperConfig
    from string_grouper_tpu.corpus.tfidf import TfidfEncoder

    enc = TfidfEncoder(StringGrouperConfig())
    enc.fit_transform(["alpha corp", "beta inc", "alpha corporation"])
    if getattr(enc, "_dev_tables", None) is None:
        pytest.skip("native path unavailable (no device tables cached)")
    long_row = "x" * 5000  # above _NATIVE_MAX_ROW: forces the numpy path
    enc.fit_transform(["gamma llc", "delta gmbh", long_row])
    assert enc._dev_tables is None
    # and a fresh transform against the new vocabulary works
    out = enc.transform(["gamma llc"])
    assert out.n_rows == 1
