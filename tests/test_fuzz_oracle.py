"""Randomized conformance sweep: matcher vs the brute-force fp64 oracle.

Each seed draws a corpus with planted duplicate clusters of random sizes
(1..40 members -- straddling every escalation kt bucket, see
ops/matcher.py adaptive_topn) plus unique filler, and a random config
(threshold, top-n, self/cross join).  Complements the fixed-fixture oracle
tests in test_matcher.py with breadth over config interactions.
"""

import numpy as np
import pytest

from string_grouper_tpu.config import StringGrouperConfig
from string_grouper_tpu.corpus import TfidfEncoder
from string_grouper_tpu.ops import topn_cosine_matches
from string_grouper_tpu.ops.rescore import rescore_pairs_fp64

from test_matcher import random_names


def fuzz_oracle_pairs(left, right, min_similarity, max_n, is_self):
    """Brute-force oracle with the SAME fp64 summation order as the
    matcher's exact scorer (ascending vocabulary index, the reference's
    CSR accumulation order).  A BLAS dense dot can differ in the last ulp,
    which flips top-n ranking between exact ties -- planted clone clusters
    make that observable, so the oracle must score pairs identically."""
    b = left if is_self else right
    n_l, n_r = left.n_rows, b.n_rows
    rr, cc = np.divmod(np.arange(n_l * n_r), n_r)
    sims = rescore_pairs_fp64(left, b, rr, cc).reshape(n_l, n_r)
    shares = sims > 0  # zero-sim pairs share no n-gram (tf-idf values > 0)
    keep = shares & (sims >= min_similarity)
    pairs = {}
    for i in range(n_l):
        cols = np.nonzero(keep[i])[0]
        order = sorted(cols, key=lambda c: (-sims[i, c], c))[:max_n]
        for c in order:
            pairs[(i, c)] = sims[i, c]
    if is_self:
        sym = {}
        for (i, c), v in pairs.items():
            if i != c:
                sym[(i, c)] = v
                sym[(c, i)] = v
        for i in range(n_l):
            sym[(i, i)] = 1.0
        pairs = sym
    return pairs


def planted_corpus(rng):
    """Unique filler + duplicate clusters with sizes across kt buckets."""
    strings = random_names(int(rng.integers(40, 200)), seed=int(rng.integers(1 << 30)))
    n_clusters = int(rng.integers(1, 6))
    for k in range(n_clusters):
        size = int(rng.choice([2, 3, 4, 5, 9, 17, 40]))
        text = f"planted cluster {k} {'x' * int(rng.integers(1, 6))} corp"
        # Half exact clones (exercising the duplicate-collapse expansion),
        # half distinct single-char variants (exercising escalation -- the
        # collapse layer cannot merge them).
        strings += [
            text if j % 2 == 0 else f"{text[:9]}{chr(97 + j % 26)}{text[9:]}"
            for j in range(size)
        ]
    perm = rng.permutation(len(strings))
    return [strings[i] for i in perm]


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_self_join(seed):
    rng = np.random.default_rng(seed)
    strings = planted_corpus(rng)
    min_similarity = float(rng.choice([-1.0, 0.0, 0.15, 0.5, 0.8, 0.95]))
    max_n = int(rng.choice([1, 2, 3, 7, 20, 64]))
    enc = TfidfEncoder(StringGrouperConfig())
    ell, _ = enc.fit_transform_pair(strings, None)
    got = topn_cosine_matches(ell, None, min_similarity, max_n)
    expected = fuzz_oracle_pairs(ell, None, min_similarity, max_n, True)
    got_pairs = {
        (int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)
    }
    assert set(got_pairs) == set(expected), (
        f"seed={seed} thr={min_similarity} max_n={max_n}: "
        f"{len(set(expected) - set(got_pairs))} missing, "
        f"{len(set(got_pairs) - set(expected))} extra"
    )
    ks = sorted(expected)
    np.testing.assert_allclose(
        [got_pairs[k] for k in ks], [expected[k] for k in ks], rtol=1e-12
    )


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_cross_join(seed):
    rng = np.random.default_rng(1000 + seed)
    master = planted_corpus(rng)
    dupes = planted_corpus(rng)
    min_similarity = float(rng.choice([0.0, 0.3, 0.7]))
    max_n = int(rng.choice([1, 2, 5, 20]))
    enc = TfidfEncoder(StringGrouperConfig())
    m, d = enc.fit_transform_pair(master, dupes)
    got = topn_cosine_matches(m, d, min_similarity, max_n)
    expected = fuzz_oracle_pairs(m, d, min_similarity, max_n, False)
    got_pairs = {
        (int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)
    }
    assert set(got_pairs) == set(expected)
    ks = sorted(expected)
    np.testing.assert_allclose(
        [got_pairs[k] for k in ks], [expected[k] for k in ks], rtol=1e-12
    )

# ---------------------------------------------------------------- float32
def fuzz_oracle_pairs_f32(left, right, min_similarity, max_n, is_self):
    """float32 twin of the oracle: scores accumulate in float32 in ascending
    term order (the reference's sp_matmul_topn accumulates in the MATRIX
    dtype, reference string_grouper.py:306, :725-732) and the threshold
    compares against the float32-rounded value."""
    b = left if is_self else right
    n_l, n_r = left.n_rows, b.n_rows
    rr, cc = np.divmod(np.arange(n_l * n_r), n_r)
    sims = rescore_pairs_fp64(
        left, b, rr, cc, acc_dtype=np.float32
    ).reshape(n_l, n_r)
    thr = float(np.float32(min_similarity))
    keep = (sims > 0) & (sims >= thr)
    pairs = {}
    for i in range(n_l):
        cols = np.nonzero(keep[i])[0]
        order = sorted(cols, key=lambda c: (-sims[i, c], c))[:max_n]
        for c in order:
            pairs[(i, c)] = sims[i, c]
    if is_self:
        sym = {}
        for (i, c), v in pairs.items():
            if i != c:
                sym[(i, c)] = v
                sym[(c, i)] = v
        for i in range(n_l):
            sym[(i, i)] = 1.0
        pairs = sym
    return pairs


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_self_join_float32(seed):
    """End-to-end float32 configuration vs the f32-accumulation oracle
    (VERDICT r2 item 6): matrix values, score accumulation, and the
    threshold comparison all round at float32."""
    rng = np.random.default_rng(2000 + seed)
    strings = planted_corpus(rng)
    min_similarity = float(rng.choice([0.0, 0.3, 0.7, 0.8]))
    max_n = int(rng.choice([1, 2, 5, 20]))
    cfg = StringGrouperConfig(tfidf_matrix_dtype=np.float32)
    enc = TfidfEncoder(cfg)
    ell, _ = enc.fit_transform_pair(strings, None)
    got = topn_cosine_matches(
        ell, None, min_similarity, max_n, score_dtype=np.float32
    )
    expected = fuzz_oracle_pairs_f32(ell, None, min_similarity, max_n, True)
    got_pairs = {
        (int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)
    }
    assert set(got_pairs) == set(expected), (
        f"seed={seed}: {len(set(expected) - set(got_pairs))} missing, "
        f"{len(set(got_pairs) - set(expected))} extra"
    )
    ks = sorted(expected)
    np.testing.assert_array_equal(
        [got_pairs[k] for k in ks], [expected[k] for k in ks]
    )


# ------------------------------------------------------------------- mesh
@pytest.mark.parametrize("seed", range(4))
def test_fuzz_mesh_self_join(seed):
    """Randomized configs through the MESH matcher vs the brute-force
    oracle (shape-invariance fuzz: random corpus structure, threshold,
    top-n, and mesh shape must all produce the oracle's exact pairs)."""
    from string_grouper_tpu.parallel import (
        distributed_topn_cosine_matches,
        make_mesh,
    )

    rng = np.random.default_rng(3000 + seed)
    strings = planted_corpus(rng)
    min_similarity = float(rng.choice([0.0, 0.3, 0.8]))
    max_n = int(rng.choice([1, 3, 20]))
    dp = int(rng.choice([1, 2, 4]))
    mesh = make_mesh(8, dp=dp)
    enc = TfidfEncoder(StringGrouperConfig())
    ell, _ = enc.fit_transform_pair(strings, None)
    got = distributed_topn_cosine_matches(
        ell, None, min_similarity, max_n, mesh,
        left_chunk=int(rng.choice([8, 32])),
        right_tile=int(rng.choice([8, 16])),
    )
    expected = fuzz_oracle_pairs(ell, None, min_similarity, max_n, True)
    got_pairs = {
        (int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)
    }
    assert set(got_pairs) == set(expected), (
        f"seed={seed} dp={dp}: {len(set(expected) - set(got_pairs))} missing,"
        f" {len(set(got_pairs) - set(expected))} extra"
    )
    ks = sorted(expected)
    np.testing.assert_allclose(
        [got_pairs[k] for k in ks], [expected[k] for k in ks], rtol=1e-12
    )
