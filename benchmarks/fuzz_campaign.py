"""Extended fuzz campaign: many seeds x {self, cross} joins vs the
brute-force fp64 oracle -- the deep, opt-in complement to
tests/test_fuzz_oracle.py's 20-seed in-suite sweep.

Each seed draws a planted-cluster corpus and a random config (threshold
in [-1, 0.95], max_n in {1..10^9}) and demands EXACT pair-set and value
equality.  Run on the preloaded backend (real TPU exercises the fused
Pallas kernel; JAX_PLATFORMS=cpu for the XLA path).

Usage: python benchmarks/fuzz_campaign.py [n_seeds] [f32]  (default 200)
``f32`` runs the float32-accumulation configuration against an oracle
scored with the same f32 chain (threshold compared f32-rounded, the
reference's in-kernel semantics).
Recorded runs: 2026-08-20, 200/200 clean on TPU v5e in ~10 min (after
fixing the empty-cross-join expansion crash seed 1000 found); f32 mode
150/150 clean.  2026-08-21 (round 5, after the phase-1 lazy-build /
chunked-pipeline refactor): 100/100 clean on TPU in 376 s; after the
shared-f32-chain refactor: 50/50 f32 clean on TPU in 208 s.
"""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
import numpy as np
from string_grouper_tpu.config import StringGrouperConfig
from string_grouper_tpu.corpus import TfidfEncoder
from string_grouper_tpu.ops import topn_cosine_matches
from string_grouper_tpu.ops.rescore import rescore_pairs_fp64
from test_fuzz_oracle import fuzz_oracle_pairs, planted_corpus
from test_matcher import random_names

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
F32 = "f32" in sys.argv[1:]


def oracle_pairs_f32(left, right, min_similarity, max_n, is_self):
    """fuzz_oracle_pairs with the reference's float32 chain: scores
    accumulate in f32 (exactly promoted to f64) and the threshold
    compares against the f32-rounded value."""
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
t0 = time.time()
fails = 0
for seed in range(1000, 1000 + N_SEEDS):
    rng = np.random.default_rng(seed)
    is_self = bool(rng.integers(2))
    strings = planted_corpus(rng)
    right = None
    if not is_self:
        right_strings = planted_corpus(rng)
    min_similarity = float(rng.choice([-1.0, 0.0, 1e-5, 0.15, 0.5, 0.8, 0.95]))
    max_n = int(rng.choice([1, 2, 3, 7, 20, 64, 10**9]))
    dtype = np.float32 if F32 else np.float64
    enc = TfidfEncoder(StringGrouperConfig(tfidf_matrix_dtype=dtype))
    if is_self:
        ell, d = enc.fit_transform_pair(strings, None)
        right_ell = None
    else:
        ell, right_ell = enc.fit_transform_pair(strings, right_strings)
    got = topn_cosine_matches(
        ell, right_ell, min_similarity, max_n,
        force_symmetries=is_self, score_dtype=dtype,
    )
    oracle = oracle_pairs_f32 if F32 else fuzz_oracle_pairs
    expected = oracle(ell, right_ell, min_similarity,
                      min(max_n, (right_ell or ell).n_rows), is_self)
    got_pairs = {(int(r), int(c)): s
                 for r, c, s in zip(got.rows, got.cols, got.sims)}
    if set(got_pairs) != set(expected):
        missing = set(expected) - set(got_pairs)
        extra = set(got_pairs) - set(expected)
        print(f"SEED {seed} MISMATCH: {len(missing)} missing {len(extra)} extra "
              f"(self={is_self} min_sim={min_similarity} max_n={max_n})")
        fails += 1
        continue
    bad = [k for k in expected if got_pairs[k] != expected[k]]
    if bad:
        print(f"SEED {seed} VALUE MISMATCH at {bad[:3]}")
        fails += 1
    if (seed - 999) % 25 == 0:
        print(f"{seed - 999}/{N_SEEDS} ok ({time.time()-t0:.0f}s)", flush=True)
print(f"DONE: {N_SEEDS - fails}/{N_SEEDS} clean in {time.time()-t0:.0f}s")
sys.exit(1 if fails else 0)
