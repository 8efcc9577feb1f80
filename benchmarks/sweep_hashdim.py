"""hash_dim sweep at 663k: middle points between the r03 grid's 256/512/1024.

The phase-1 matmul cost is linear in hash_dim while the UB tightness (and
hence candidate volume, rescore and escalation cost) improves with it;
SWEEP_r03 found 512 optimal on the {256, 512, 1024} grid.  This probes the
untested 384 (and optionally 640) middle points: 384 cuts the MXU FLOPs
25% below the default if its UB stays tight enough to not pay it back.

Usage: python benchmarks/sweep_hashdim.py [dims...]   (default: 512 384)
Writes nothing; prints one JSON line per dim for manual comparison.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs(".jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from bench import synthetic_company_names  # noqa: E402
from string_grouper_tpu import StringGrouper  # noqa: E402

N = int(os.environ.get("BENCH_N", "663000"))
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
series = synthetic_company_names(N)

dims = [int(a) for a in sys.argv[1:]] or [512, 384]
ref_rows = None
for dim in dims:
    walls = []
    phases = {}
    n_out = None
    for i in range(RUNS + 1):  # +1 warmup (compile at this dim's shapes)
        t0 = time.perf_counter()
        sg = StringGrouper(series, min_similarity=0.8, hash_dim=dim).fit()
        out = sg.get_matches()
        w = time.perf_counter() - t0
        if i:
            walls.append(round(w, 3))
            phases = {
                k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in sg.timings.seconds.items()
            }
        n_out = len(out)
        del out, sg
    if ref_rows is None:
        ref_rows = n_out
    print(json.dumps({
        "hash_dim": dim,
        "walls_s": walls,
        "median_s": sorted(walls)[len(walls) // 2],
        "n_output_rows": n_out,
        "rows_equal_first_dim": n_out == ref_rows,
        "phases_s": phases,
    }), flush=True)
