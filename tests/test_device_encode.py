"""Byte-level device encode (DeviceEncodeSrc -> _device_hash_codes).

The native encoder attaches a wire-minimal payload (cleaned character
codes + inverse norms + key->term table) from which the device rebuilds
the hashed TF-IDF projection itself, replacing the packed-slot upload
(reference counterpart: the TfidfVectorizer transform feeding the hot
loop, string_grouper.py:685-707,:725-732).  Exactness contract: the
projection is an upper-bound filter only -- the exact fp64 rescore makes
the OUTPUT bit-identical between the packed and byte-level paths, which
is what these tests pin down.
"""

import os

import numpy as np
import pandas as pd
import pytest

import string_grouper_tpu as sg
from string_grouper_tpu.config import StringGrouperConfig
from string_grouper_tpu.corpus.tfidf import TfidfEncoder
from string_grouper_tpu.native import get_scorer_lib
from string_grouper_tpu.ops import matcher as M

pytestmark = pytest.mark.skipif(
    get_scorer_lib() is None, reason="native encoder unavailable"
)


def _corpus(n, seed=0, long_tail=False):
    rng = np.random.default_rng(seed)
    stems = [
        "hyper startup", "mega enterprises", "atlas data", "zenith chem",
        "apex oil", "ab", "x", "",
    ]
    sufs = ["inc", "inc.", "llc", "corp", "co", ""]
    out = []
    for _ in range(n):
        s = stems[rng.integers(len(stems))]
        if rng.random() < 0.3:
            s = s.title()
        if long_tail and rng.random() < 0.02:
            s = s + " very long division name segment" * rng.integers(1, 6)
        out.append((s + " " + sufs[rng.integers(len(sufs))]).strip())
    return pd.Series(out)


def _both_paths(fn):
    """Run fn under the device-encode and packed paths; assert identical."""
    on = fn()
    os.environ["SG_TPU_DEVICE_ENCODE"] = "0"
    try:
        off = fn()
    finally:
        os.environ.pop("SG_TPU_DEVICE_ENCODE")
    pd.testing.assert_frame_equal(off, on)
    return on


def _oracle_h(ell, dim):
    """fp64 hashed projection: scatter of exact values by Knuth term-id
    bucket -- what both device builders approximate in bf16."""
    ids, vals = ell.ids, ell.vals64
    b = ((ids.astype(np.int64) * M._KNUTH) % (1 << 32)) >> (
        32 - int(dim).bit_length() + 1
    )
    h = np.zeros((ell.n_rows, dim))
    r, k = np.nonzero(ids >= 0)
    np.add.at(h, (r, b[r, k]), vals[r, k])
    return h


def test_payload_attached_and_h_matches_oracle():
    names = _corpus(400, seed=1).tolist()
    enc = TfidfEncoder(StringGrouperConfig())
    ell = enc.fit_transform(names)
    src = ell.device_src
    assert src is not None
    assert src.base >= 2 and len(src.table_id) == src.base**src.ngram
    h64 = _oracle_h(ell, 512)
    h_codes = np.asarray(
        M._build_hash_from_codes(src, ell.n_rows, 512)
    ).astype(np.float64)
    os.environ["SG_TPU_DEVICE_ENCODE"] = "0"
    try:
        h_packed = np.asarray(M.build_hash_matrix(ell, ell.n_rows, 512))
    finally:
        os.environ.pop("SG_TPU_DEVICE_ENCODE")
    # bf16 resolution: both device builders sit within ~1e-2 of the oracle
    assert np.abs(h_codes - h64).max() < 1e-2
    assert np.abs(h_packed.astype(np.float64) - h64).max() < 1e-2


def test_fill_code_rows_native_matches_numpy(monkeypatch):
    enc = TfidfEncoder(StringGrouperConfig())
    src = enc.fit_transform(_corpus(200, seed=2).tolist()).device_src
    order = np.array([5, 0, 199, 42, 17], dtype=np.int32)
    native = M._fill_code_rows(src, order, 24)
    monkeypatch.setattr(
        "string_grouper_tpu.native.build.get_scorer_lib", lambda: None
    )
    fallback = M._fill_code_rows(src, order, 24)
    np.testing.assert_array_equal(native, fallback)


def test_selfjoin_output_identical():
    series = _corpus(600, seed=3)
    n = len(_both_paths(lambda: sg.match_strings(series)))
    assert n >= len(series)


def test_crossjoin_pair_slicing_identical():
    m, d = _corpus(300, seed=4), _corpus(200, seed=5)
    _both_paths(lambda: sg.match_strings(m, d, min_similarity=0.3))


def test_corpus_reuse_with_oov_chars_identical():
    grouper = sg.StringGrouper(_corpus(300, seed=6))
    new = pd.Series(["hyper startup inc", "q9@zz#7 ltd!!", "atlas data corp"])
    _both_paths(
        lambda: grouper.match_strings(
            new, _corpus(100, seed=7), min_similarity=0.2
        )
    )


def test_two_tier_long_tail_identical():
    big = _corpus(12000, seed=8, long_tail=True)
    _both_paths(lambda: sg.match_strings(big))


def test_groups_identical():
    series = _corpus(500, seed=9)
    out = _both_paths(
        lambda: sg.group_similar_strings(series, min_similarity=0.6)
    )
    assert len(out) == len(series)


def test_slice_rows_roundtrip():
    enc = TfidfEncoder(StringGrouperConfig())
    src = enc.fit_transform(_corpus(50, seed=10).tolist()).device_src
    part = src.slice_rows(10, 30)
    assert len(part.inv_norm) == 20
    np.testing.assert_array_equal(
        M._fill_code_rows(part, np.arange(20, dtype=np.int32), 32),
        M._fill_code_rows(src, np.arange(10, 30, dtype=np.int32), 32),
    )
    np.testing.assert_array_equal(part.inv_norm, src.inv_norm[10:30])


def test_take_rows_payload_matches_device_gather():
    """DeviceEncodeSrc.take_rows (host-side unique-row payload gather) must
    produce the same hashed projection rows as hashing the full corpus and
    gathering on device."""
    import jax.numpy as jnp

    from string_grouper_tpu.ops.matcher import (
        _build_hash_from_codes,
        build_hash_matrix,
    )

    strings = ["mega corp", "tiny co", "mega corp", "another name",
               "tiny co", "megacorp inc"]
    enc = TfidfEncoder(StringGrouperConfig())
    ell, _ = enc.fit_transform_pair(strings, None)
    assert ell.device_src is not None
    rows = np.array([0, 1, 3, 5], dtype=np.int64)
    sub = ell.device_src.take_rows(rows)
    np.testing.assert_array_equal(
        sub.row_lengths(), ell.device_src.row_lengths()[rows]
    )
    np.testing.assert_array_equal(
        sub.inv_norm, ell.device_src.inv_norm[rows]
    )
    h_full = build_hash_matrix(ell, ell.n_rows, 256)
    h_sub = _build_hash_from_codes(sub, len(rows), 256)
    np.testing.assert_array_equal(
        np.asarray(h_sub).astype(np.float32),
        np.asarray(h_full[jnp.asarray(rows)]).astype(np.float32),
    )


def test_prefetch_gather_equals_subset_build():
    """The engine's encode-time hash prefetch (full-corpus upload + device
    gather of unique rows) must be output-identical to the on-demand
    subset ship it replaces (ops/matcher.prefetch_corpus_hash)."""
    series = _corpus(300, seed=11)
    enc = TfidfEncoder(StringGrouperConfig())
    ell_a, _ = enc.fit_transform_pair(series, None)
    pairs_a = M.topn_cosine_matches(ell_a, None, 0.5, 20)

    enc2 = TfidfEncoder(StringGrouperConfig())
    ell_b, _ = enc2.fit_transform_pair(series, None)
    M.prefetch_corpus_hash(ell_b, 512)
    assert getattr(ell_b.device_src, "_hash_prefetch", None) is not None
    pairs_b = M.topn_cosine_matches(ell_b, None, 0.5, 20)

    np.testing.assert_array_equal(pairs_a.rows, pairs_b.rows)
    np.testing.assert_array_equal(pairs_a.cols, pairs_b.cols)
    np.testing.assert_array_equal(pairs_a.sims, pairs_b.sims)
