"""Extended fuzz campaign: many seeds x {self, cross} joins vs the
brute-force fp64 oracle -- the deep, opt-in complement to
tests/test_fuzz_oracle.py's 20-seed in-suite sweep.

Each seed draws a planted-cluster corpus and a random config (threshold
in [-1, 0.95], max_n in {1..10^9}) and demands EXACT pair-set and value
equality.  Run on the preloaded backend (real TPU exercises the fused
Pallas kernel; JAX_PLATFORMS=cpu for the XLA path).

Usage: python benchmarks/fuzz_campaign.py [n_seeds]   (default 200)
Recorded runs: 2026-08-20, 200/200 clean on TPU v5e in ~10 min (after
fixing the empty-cross-join expansion crash seed 1000 found).
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
from test_fuzz_oracle import fuzz_oracle_pairs, planted_corpus
from test_matcher import random_names

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
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
    dtype = np.float64
    enc = TfidfEncoder(StringGrouperConfig())
    if is_self:
        ell, d = enc.fit_transform_pair(strings, None)
        right_ell = None
    else:
        ell, right_ell = enc.fit_transform_pair(strings, right_strings)
    got = topn_cosine_matches(
        ell, right_ell, min_similarity, max_n,
        force_symmetries=is_self,
    )
    expected = fuzz_oracle_pairs(ell, right_ell, min_similarity,
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
