"""Matcher correctness against a brute-force float64 oracle.

The oracle computes the full dense cosine matrix from the exact ELL encoding
(already proven sklearn-equal in test_tfidf_parity.py) and applies the
reference's semantics: threshold, per-row top-n, self-join diagonal fix and
symmetrization (reference string_grouper.py:380-431).
"""

import re

import numpy as np
import pytest

from string_grouper_tpu.config import StringGrouperConfig
from string_grouper_tpu.corpus import TfidfEncoder
from string_grouper_tpu.ops import topn_cosine_matches


def oracle_pairs(left, right, min_similarity, max_n, force_symmetries, is_self):
    """Brute-force float64 reference semantics."""
    a = left.to_dense()
    b = (left if is_self else right).to_dense()
    sims = a @ b.T
    n_l, n_r = sims.shape
    shares = (a > 0) @ (b > 0).T > 0  # sparse nonzero structure
    keep = shares & (sims >= min_similarity) & (sims > 0)
    pairs = {}
    for i in range(n_l):
        cols = np.nonzero(keep[i])[0]
        order = sorted(cols, key=lambda c: (-sims[i, c], c))[:max_n]
        for c in order:
            pairs[(i, c)] = sims[i, c]
    if is_self and force_symmetries:
        sym = {}
        for (i, c), v in pairs.items():
            if i != c:
                sym[(i, c)] = v
                sym[(c, i)] = v
        for i in range(n_l):
            sym[(i, i)] = 1.0
        pairs = sym
    return pairs


CORPORA = {
    "customers": [
        "Mega Enterprises Corporation",
        "Hyper Startup Incorporated",
        "Hyper Startup Inc.",
        "Hyper-Startup Inc.",
        "HyperStartup Inc.",
        "Hyper Hyper Inc.",
        "Mega Enterprises Corp.",
    ],
    "random": None,  # filled below
}


def random_names(n, seed=0):
    rng = np.random.default_rng(seed)
    stems = ["alpha", "beta", "gamma", "delta", "omega", "hyper", "mega", "corp",
             "inc", "ltd", "global", "tech", "data", "cloud", "net", "soft"]
    out = []
    for _ in range(n):
        k = rng.integers(2, 5)
        words = rng.choice(stems, size=k)
        out.append(" ".join(words) + rng.choice([" co", " inc.", " llc", ""]))
    return out


@pytest.mark.parametrize("min_similarity", [0.8, 0.5, 0.1, 0.0, -1.0])
@pytest.mark.parametrize("max_n", [1, 3, 20])
def test_self_join_matches_oracle(min_similarity, max_n):
    strings = CORPORA["customers"]
    enc = TfidfEncoder(StringGrouperConfig())
    ell, _ = enc.fit_transform_pair(strings, None)
    got = topn_cosine_matches(ell, None, min_similarity, max_n)
    expected = oracle_pairs(ell, None, min_similarity, max_n, True, True)
    got_pairs = {(int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)}
    assert set(got_pairs) == set(expected)
    for k in expected:
        np.testing.assert_allclose(got_pairs[k], expected[k], rtol=1e-12)


@pytest.mark.parametrize("min_similarity", [0.8, 0.3, 0.0])
@pytest.mark.parametrize("max_n", [1, 2, 20])
def test_cross_join_matches_oracle(min_similarity, max_n):
    master = CORPORA["customers"]
    dupes = ["Hyper Startup Inc", "MEGA ENTERPRISES", "whatever", "Hyper Hyper"]
    enc = TfidfEncoder(StringGrouperConfig())
    m, d = enc.fit_transform_pair(master, dupes)
    got = topn_cosine_matches(m, d, min_similarity, max_n)
    expected = oracle_pairs(m, d, min_similarity, max_n, False, False)
    got_pairs = {(int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)}
    assert set(got_pairs) == set(expected)
    for k in expected:
        np.testing.assert_allclose(got_pairs[k], expected[k], rtol=1e-12)


def test_larger_random_corpus_self_join():
    strings = random_names(300)
    enc = TfidfEncoder(StringGrouperConfig())
    ell, _ = enc.fit_transform_pair(strings, None)
    got = topn_cosine_matches(ell, None, 0.6, 20)
    expected = oracle_pairs(ell, None, 0.6, 20, True, True)
    got_pairs = {(int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)}
    assert set(got_pairs) == set(expected)
    sims = np.array([got_pairs[k] for k in sorted(expected)])
    exp = np.array([expected[k] for k in sorted(expected)])
    np.testing.assert_allclose(sims, exp, rtol=1e-12)


def test_small_hash_dim_still_exact():
    """Tiny hash dims produce many collisions; the exact rescore must still
    reject every false positive and keep every true pair."""
    strings = random_names(150, seed=3)
    enc = TfidfEncoder(StringGrouperConfig())
    ell, _ = enc.fit_transform_pair(strings, None)
    got = topn_cosine_matches(ell, None, 0.5, 20, hash_dim=16)
    expected = oracle_pairs(ell, None, 0.5, 20, True, True)
    got_pairs = {(int(r), int(c)) for r, c in zip(got.rows, got.cols)}
    assert got_pairs == set(expected)


def test_self_join_ordering_row_major_col_ascending():
    strings = CORPORA["customers"]
    enc = TfidfEncoder(StringGrouperConfig())
    ell, _ = enc.fit_transform_pair(strings, None)
    got = topn_cosine_matches(ell, None, 0.1, 20)
    keys = list(zip(got.rows.tolist(), got.cols.tolist()))
    assert keys == sorted(keys)


@pytest.mark.parametrize(
    "left_chunk,right_tile,hash_dim",
    [(16, 8, 64), (32, 32, 128), (64, 128, 1024), (512, 4096, 256)],
)
def test_tiling_invariance(left_chunk, right_tile, hash_dim):
    """Analog of the reference's blocked == unblocked equivalence tests
    (reference test_string_grouper.py:191-241): the pair set and similarities
    must be identical for every (left_chunk, right_tile, hash_dim) tiling."""
    strings = random_names(200, seed=7)
    enc = TfidfEncoder(StringGrouperConfig())
    ell, _ = enc.fit_transform_pair(strings, None)
    base = topn_cosine_matches(ell, None, 0.5, 20)
    got = topn_cosine_matches(
        ell, None, 0.5, 20,
        hash_dim=hash_dim, left_chunk=left_chunk, right_tile=right_tile,
    )
    np.testing.assert_array_equal(got.rows, base.rows)
    np.testing.assert_array_equal(got.cols, base.cols)
    np.testing.assert_allclose(got.sims, base.sims, rtol=0, atol=0)


def test_pack20_roundtrip():
    """The 20-bit download packing must be lossless for ids < 2^20."""
    import jax.numpy as jnp

    from string_grouper_tpu.ops.matcher import _pack20, _unpack20

    rng = np.random.default_rng(5)
    flat = rng.integers(0, 1 << 20, size=4096).astype(np.int32)
    flat[3000:] = -1  # padding tail packs as zeros
    words = np.asarray(_pack20(jnp.asarray(flat)))
    for count in (0, 1, 7, 8, 9, 3000):
        nw = -(-count // 8) * 5
        got = _unpack20(words[:nw], count)
        np.testing.assert_array_equal(got, flat[:count].astype(np.int64))


def test_triangular_kernel_candidate_completeness():
    """The Pallas triangular kernel (pallas_kernels.p1_tri_fused) is the
    RECORDED NEGATIVE experiment of TRIANGULAR_AB_r04.json -- un-wired but
    kept correct: per segment, merged row-side + future-side candidates
    must cover every qualified column (or bound it), with exact counts and
    per-tile maxima, across thresholds and candidate widths (interpret
    mode; the real-device equality was part of the A/B record)."""
    import jax
    import jax.numpy as jnp

    from string_grouper_tpu.ops.pallas_kernels import (
        p1_tri_fused,
        tri_future_init,
        tri_future_unpack,
    )

    n, d, tile, bm, cpg = 512, 128, 128, 64, 2
    nt = n // tile
    seg_rows = cpg * tile
    rng = np.random.default_rng(0)
    h = rng.random((n, d)).astype(np.float32) * (rng.random((n, d)) < 0.05)
    h /= np.maximum(np.linalg.norm(h, axis=1, keepdims=True), 1e-9)
    b = jnp.asarray(h, jnp.bfloat16)
    S = np.asarray(b, np.float32) @ np.asarray(b, np.float32).T
    for thr, cand_c in ((0.15, 16), (0.05, 8)):
        fpack = tri_future_init(n)
        segs = []
        for s in range(nt // cpg):
            rv, rc, rme, fpack = p1_tri_fused(
                b[s * seg_rows:(s + 1) * seg_rows], b, fpack,
                jnp.int32(s * cpg), jnp.float32(thr),
                tile=tile, cand_c=cand_c, block_m=bm, interpret=True,
            )
            fv, fc, fme = (np.asarray(x) for x in tri_future_unpack(fpack))
            segs.append((
                np.asarray(rv), np.asarray(rc), np.asarray(rme),
                fv[s * seg_rows:(s + 1) * seg_rows].copy(),
                fc[s * seg_rows:(s + 1) * seg_rows].copy(),
                fme[s * seg_rows:(s + 1) * seg_rows].copy(),
            ))
        for s, (rv, rc, rme, sfv, sfc, sfme) in enumerate(segs):
            for r_loc in range(seg_rows):
                r = s * seg_rows + r_loc
                qual = np.flatnonzero(S[r] >= thr)
                vs = np.concatenate([rv[r_loc], sfv[r_loc]])
                cs = np.concatenate([rc[r_loc], sfc[r_loc]])
                fin = vs > -np.inf
                got = set(cs[fin].tolist())
                assert rme[r_loc, 0] + sfme[r_loc, 0] == len(qual)
                nfin = rme[r_loc, 3] + sfme[r_loc, 3]
                ms = np.sort(vs[fin])[::-1]
                trunc = (
                    ms[cand_c - 1]
                    if nfin > cand_c and len(ms) >= cand_c
                    else -np.inf
                )
                bound = max(rme[r_loc, 2], sfme[r_loc, 2], trunc)
                for c in set(qual.tolist()) - got:
                    assert S[r, c] <= bound + 1e-6, (r, c, S[r, c], bound)
                per_tile = (S[r].reshape(nt, tile) >= thr).sum(axis=1)
                assert max(rme[r_loc, 1], sfme[r_loc, 1]) == per_tile.max()


def test_diagonal_always_one_even_for_empty_strings():
    strings = ["...", "abc", "abc"]  # first row has no n-grams
    enc = TfidfEncoder(StringGrouperConfig())
    ell, _ = enc.fit_transform_pair(strings, None)
    got = topn_cosine_matches(ell, None, 0.8, 20)
    diag = {(r, c): s for r, c, s in zip(got.rows, got.cols, got.sims) if r == c}
    assert diag == {(0, 0): 1.0, (1, 1): 1.0, (2, 2): 1.0}


class TestHotRowHandling:
    """One hot row (hundreds of near-duplicates) must neither inflate the
    corpus-wide candidate width nor lose matches: safe drops are proven by
    the upper-bound cut check, unresolvable rows are re-matched individually
    at escalated width (ops/matcher.py adaptive_topn)."""

    @staticmethod
    def _corpus(base):
        variants = [base]
        for i in range(1, len(base)):
            variants.append(base[:i] + base[i + 1:])
            variants.append(base[:i] + base[i] + base[i:])
        rng = np.random.default_rng(0)
        stems = ["alpha", "beta", "gamma", "delta", "kappa", "sigma",
                 "omega", "zeta", "theta", "lambda"]
        filler = [" ".join(rng.choice(stems, 4)) + f" {i}" for i in range(700)]
        return variants + filler

    def _run(self, max_n, caplog, base="hyper mega global quantum systems incorporated"):
        import logging

        strings = self._corpus(base)
        enc = TfidfEncoder(StringGrouperConfig())
        ell, _ = enc.fit_transform_pair(strings, None)
        with caplog.at_level(logging.DEBUG, logger="string_grouper_tpu"):
            got = topn_cosine_matches(ell, None, 0.8, max_n)
        expected = oracle_pairs(ell, None, 0.8, max_n, True, True)
        got_pairs = {
            (int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)
        }
        assert set(got_pairs) == set(expected)
        for k in expected:
            np.testing.assert_allclose(got_pairs[k], expected[k], rtol=1e-12)
        return caplog.text

    def test_safe_drop_no_escalation(self, caplog):
        """max_n=1 with a moderate-similarity cluster: every row's top-1 cut
        is the exact ~1.0 self match while dropped candidates carry upper
        bounds below it, so the drop-bound logic proves almost every drop
        irrelevant -- exact results with (nearly) no escalation.  Under the
        kt=2 closed-form extraction the per-tile drop bound is the SECOND
        largest qualified value, so the handful of rows whose second-best
        upper bound sits within the 1%% UB slack of their ~1.0 cut must
        escalate (correctly); the 91-row cluster must not escalate
        wholesale.  (Dropped bounds NEAR the cut must escalate: an
        exact-tied clone can round to the same fp64 value as the cut and
        win the column tie-break; see unsafe_rows in ops/matcher.py.)"""
        import logging

        base = "hyper mega global quantum systems incorporated"
        # Three-character deletions: similarities to each other ~0.85-0.93,
        # far enough below 1 that the 1% UB slack cannot reach the cut.
        rng = np.random.default_rng(1)
        variants = [base]
        for _ in range(90):
            s = base
            for pos in sorted(rng.integers(1, len(base) - 4, 3))[::-1]:
                s = s[:pos] + s[pos + 1:]
            variants.append(s)
        strings = list(dict.fromkeys(variants)) + self._corpus(base)[91:]
        enc = TfidfEncoder(StringGrouperConfig())
        ell, _ = enc.fit_transform_pair(strings, None)
        with caplog.at_level(logging.DEBUG, logger="string_grouper_tpu"):
            got = topn_cosine_matches(ell, None, 0.8, 1)
        expected = oracle_pairs(ell, None, 0.8, 1, True, True)
        got_pairs = {
            (int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)
        }
        assert set(got_pairs) == set(expected)
        esc = re.findall(r"escalate (\d+) rows", caplog.text)
        assert sum(int(x) for x in esc) <= 4, caplog.text

    def test_escalation_path(self, caplog):
        """~250 distinct variants with near-equal similarities: the
        upper-bound cut cannot prove the truncation safe, so the hot rows
        are re-matched individually at escalated width; results stay
        exact."""
        import logging

        base = (
            "hyper mega global quantum systems incorporated holdings "
            "international enterprises consolidated industries"
        )
        # Single-character substitutions: distinct gram multisets, sims in a
        # tight sub-1.0 band around the top-n cut.
        variants = [base]
        for i in range(len(base)):
            for c in "xzq":
                if base[i] not in (" ", c):
                    variants.append(base[:i] + c + base[i + 1:])
        rng = np.random.default_rng(0)
        stems = ["alpha", "beta", "gamma", "delta", "kappa", "sigma",
                 "omega", "zeta", "theta", "lambda"]
        filler = [" ".join(rng.choice(stems, 4)) + f" {i}" for i in range(700)]
        strings = variants + filler
        enc = TfidfEncoder(StringGrouperConfig())
        ell, _ = enc.fit_transform_pair(strings, None)
        with caplog.at_level(logging.DEBUG, logger="string_grouper_tpu"):
            got = topn_cosine_matches(ell, None, 0.8, 20)
        assert "escalate" in caplog.text
        expected = oracle_pairs(ell, None, 0.8, 20, True, True)
        got_pairs = {
            (int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)
        }
        assert set(got_pairs) == set(expected)
        for k in expected:
            np.testing.assert_allclose(got_pairs[k], expected[k], rtol=1e-12)


@pytest.mark.parametrize(
    "left_chunk,right_tile,hash_dim", [(16, 8, 64), (64, 32, 256)]
)
def test_tiling_invariance_cross_join(left_chunk, right_tile, hash_dim):
    """Cross-join analog of the reference's blocked == unblocked tests
    (reference test_string_grouper.py:285-336)."""
    master = random_names(120, seed=8)
    dupes = random_names(77, seed=9)
    enc = TfidfEncoder(StringGrouperConfig())
    m, d = enc.fit_transform_pair(master, dupes)
    base = topn_cosine_matches(m, d, 0.4, 5)
    got = topn_cosine_matches(
        m, d, 0.4, 5,
        hash_dim=hash_dim, left_chunk=left_chunk, right_tile=right_tile,
    )
    np.testing.assert_array_equal(got.rows, base.rows)
    np.testing.assert_array_equal(got.cols, base.cols)
    np.testing.assert_allclose(got.sims, base.sims, rtol=0, atol=0)


def test_exact_width_clusters_terminate(caplog, monkeypatch):
    """Regression (advisor, round 1): a row whose qualified-candidate count
    lands exactly on the escalated pow2 candidate width used to keep
    reporting a finite truncation drop bound with nothing actually dropped,
    and the escalation loop re-ran at identical widths forever.  64
    near-identical strings + filler, max_n_matches=2, right_tile=64.
    The payload is pinned off so the identical strings do NOT collapse --
    this test exists to exercise the uncollapsed escalation loop."""
    import logging
    import signal

    monkeypatch.setenv("SG_TPU_DEVICE_ENCODE", "0")
    strings = ["hyper mega global quantum systems incorporated"] * 64
    strings += [f"zzfiller{i} qq{i} ww{i}" for i in range(192)]
    enc = TfidfEncoder(StringGrouperConfig())
    ell, _ = enc.fit_transform_pair(strings, None)

    def on_alarm(signum, frame):  # pragma: no cover - only fires on regression
        raise TimeoutError("adaptive_topn livelocked (escalation loop)")

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(120)
    try:
        with caplog.at_level(logging.DEBUG, logger="string_grouper_tpu"):
            got = topn_cosine_matches(ell, None, 0.8, 2, right_tile=64)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    expected = oracle_pairs(ell, None, 0.8, 2, True, True)
    got_pairs = {
        (int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)
    }
    assert set(got_pairs) == set(expected)
    # The loop must settle in a handful of rounds, not hundreds.
    assert caplog.text.count("escalate") < 12


class TestShipCompaction:
    """The ragged-prefix download compaction (matcher._compact_cols) and its
    overflow fallback must never change results."""

    def test_compact_cols_matches_numpy(self):
        import jax.numpy as jnp
        from string_grouper_tpu.ops import matcher as M

        rng = np.random.default_rng(3)
        for _ in range(8):
            r, c = int(rng.integers(1, 40)), int(rng.integers(1, 12))
            n_i = rng.integers(0, c + 1, size=r)
            cols = np.full((r, c), -1, dtype=np.int32)
            for i in range(r):
                cols[i, : n_i[i]] = rng.integers(0, 1000, size=n_i[i])
            total = int(n_i.sum())
            budget = max(8, total + int(rng.integers(0, 16)))
            flat, n_out = M._compact_cols(jnp.asarray(cols), budget)
            flat, n_out = np.asarray(flat), np.asarray(n_out)
            np.testing.assert_array_equal(n_out, n_i)
            expected = np.concatenate(
                [cols[i, : n_i[i]] for i in range(r)]
            ) if total else np.zeros(0, np.int32)
            np.testing.assert_array_equal(flat[:total], expected)
            assert (flat[total:] == -1).all()

    def test_compact_cols_overflow_keeps_counts(self):
        import jax.numpy as jnp
        from string_grouper_tpu.ops import matcher as M

        cols = np.arange(40, dtype=np.int32).reshape(4, 10)  # all valid
        flat, n_out = M._compact_cols(jnp.asarray(cols), 16)
        assert np.asarray(n_out).sum() == 40  # host detects 40 > 16
        np.testing.assert_array_equal(np.asarray(flat), np.arange(16))

    @pytest.mark.parametrize("budget_rows", [1, 4, 1 << 20])
    def test_results_invariant_to_budget(self, monkeypatch, budget_rows):
        from string_grouper_tpu.ops import matcher as M

        strings = random_names(300, seed=5)
        enc = TfidfEncoder(StringGrouperConfig())
        ell, _ = enc.fit_transform_pair(strings, None)
        base = topn_cosine_matches(ell, None, 0.6, 20)
        monkeypatch.setattr(M, "_SHIP_BUDGET_ROWS", budget_rows)
        monkeypatch.setattr(M, "_ROWS_COMPACT_MIN", 0)
        got = topn_cosine_matches(ell, None, 0.6, 20)
        np.testing.assert_array_equal(got.rows, base.rows)
        np.testing.assert_array_equal(got.cols, base.cols)
        np.testing.assert_allclose(got.sims, base.sims, rtol=0, atol=0)

    def test_escalation_with_compacted_rows(self, monkeypatch, caplog):
        """Escalated re-match (run_rows) with compaction active stays
        exact."""
        import logging

        from string_grouper_tpu.ops import matcher as M

        monkeypatch.setattr(M, "_ROWS_COMPACT_MIN", 0)
        # payload off: the identical hot strings must NOT collapse -- this
        # test exercises the uncollapsed escalation download compaction
        monkeypatch.setenv("SG_TPU_DEVICE_ENCODE", "0")
        strings = ["hyper mega global quantum systems incorporated"] * 40
        strings += random_names(200, seed=6)
        enc = TfidfEncoder(StringGrouperConfig())
        ell, _ = enc.fit_transform_pair(strings, None)
        with caplog.at_level(logging.DEBUG, logger="string_grouper_tpu"):
            got = topn_cosine_matches(ell, None, 0.8, 5, right_tile=64)
        assert "escalate" in caplog.text
        expected = oracle_pairs(ell, None, 0.8, 5, True, True)
        got_pairs = {
            (int(r), int(c)): s for r, c, s in zip(got.rows, got.cols, got.sims)
        }
        assert set(got_pairs) == set(expected)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_selfjoin_fixups_native_equals_numpy(seed, monkeypatch):
    """The (thread-parallel) native counting-sort fixups kernel must equal
    the numpy fallback: drop diagonal, mirror, force exact-1.0 diagonal,
    (row asc, col asc) order."""
    from string_grouper_tpu.ops.matcher import MatchPairs, apply_self_join_fixups

    rng = np.random.default_rng(seed)
    n = 200
    m = 800
    rows = rng.integers(0, n, size=m).astype(np.int64)
    cols = rng.integers(0, n, size=m).astype(np.int64)
    # symmetric scores for duplicate directions (the established invariant)
    key = np.minimum(rows, cols) * n + np.maximum(rows, cols)
    sims = np.round(np.sin(key.astype(np.float64)) ** 2, 3)
    pairs = MatchPairs(rows=rows, cols=cols, sims=sims, true_max_n_matches=0)
    nat = apply_self_join_fixups(pairs, n)
    import string_grouper_tpu.ops.matcher as M
    monkeypatch.setattr(M, "get_scorer_lib", lambda: None, raising=False)
    import string_grouper_tpu.native as natmod
    monkeypatch.setattr(natmod, "get_scorer_lib", lambda: None)
    ora = apply_self_join_fixups(pairs, n)
    np.testing.assert_array_equal(nat.rows, ora.rows)
    np.testing.assert_array_equal(nat.cols, ora.cols)
    np.testing.assert_array_equal(nat.sims, ora.sims)


def test_selfjoin_fixups_survives_omp_dynamic():
    """Regression: the sliced parallel counting sort must process every
    slice even when the OpenMP runtime delivers fewer threads than
    omp_get_max_threads() (OMP_DYNAMIC / thread limits) -- a team-size
    assumption here once silently dropped ~83% of self-join pairs."""
    import os
    import subprocess
    import sys

    code = (
        "import numpy as np;"
        "from string_grouper_tpu.ops.matcher import MatchPairs,"
        " apply_self_join_fixups;"
        "rng=np.random.default_rng(0);n=200;m=800;"
        "rows=rng.integers(0,n,size=m).astype(np.int64);"
        "cols=rng.integers(0,n,size=m).astype(np.int64);"
        "key=np.minimum(rows,cols)*n+np.maximum(rows,cols);"
        "sims=np.round(np.sin(key.astype(np.float64))**2,3);"
        "p=MatchPairs(rows=rows,cols=cols,sims=sims,true_max_n_matches=0);"
        "print(len(apply_self_join_fixups(p,n).rows))"
    )
    outs = set()
    for env_extra in ({}, {"OMP_DYNAMIC": "true", "OMP_NUM_THREADS": "64"},
                      {"OMP_NUM_THREADS": "1"}):
        env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env=env, timeout=120,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs.add(r.stdout.strip().splitlines()[-1])
    assert len(outs) == 1, outs
