"""Extended mesh-tier fuzz: the distributed matcher on a virtual
8-device CPU mesh vs the single-chip matcher -- random corpora, configs,
and mesh shapes, demanding bitwise pair-list equality.  The opt-in deep
complement to tests/test_distributed.py.

Usage: python benchmarks/fuzz_mesh.py [n_seeds]   (default 60)
Recorded run: 2026-08-20, 300/300 clean in ~7 min.
"""
import os, sys, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from string_grouper_tpu.config import StringGrouperConfig
from string_grouper_tpu.corpus import TfidfEncoder
from string_grouper_tpu.ops import topn_cosine_matches
from string_grouper_tpu.parallel import distributed_topn_cosine_matches, make_mesh
from test_fuzz_oracle import planted_corpus

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
t0 = time.time()
fails = 0
for seed in range(3000, 3000 + N):
    rng = np.random.default_rng(seed)
    is_self = bool(rng.integers(2))
    strings = planted_corpus(rng)
    right_strings = None if is_self else planted_corpus(rng)
    min_similarity = float(rng.choice([0.0, 0.3, 0.8, 0.95]))
    max_n = int(rng.choice([1, 3, 20, 64]))
    dp, mp = [(1, 8), (2, 4), (4, 2), (8, 1), (1, 4), (2, 2)][int(rng.integers(6))]
    if dp * mp > len(jax.devices()):
        dp, mp = 2, 4
    enc = TfidfEncoder(StringGrouperConfig())
    m, d = enc.fit_transform_pair(strings, right_strings)
    right = None if is_self else d
    single = topn_cosine_matches(m, right, min_similarity, max_n)
    mesh = make_mesh(dp * mp, dp=dp)
    sharded = distributed_topn_cosine_matches(
        m, right, min_similarity, max_n, mesh
    )
    ok = (
        np.array_equal(single.rows, sharded.rows)
        and np.array_equal(single.cols, sharded.cols)
        and np.array_equal(single.sims, sharded.sims)
    )
    if not ok:
        print(f"SEED {seed} MISMATCH (self={is_self} thr={min_similarity} "
              f"max_n={max_n} mesh=({dp},{mp})): "
              f"{len(single.rows)} vs {len(sharded.rows)} pairs")
        fails += 1
    if (seed - 2999) % 10 == 0:
        print(f"{seed - 2999}/{N} ok ({time.time()-t0:.0f}s)", flush=True)
print(f"DONE: {N - fails}/{N} clean in {time.time()-t0:.0f}s")
sys.exit(1 if fails else 0)
