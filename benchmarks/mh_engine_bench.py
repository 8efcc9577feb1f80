"""Production multi-host tier bench worker (benchmarks/run_multihost.py).

Run as: python mh_engine_bench.py <proc_id> <nproc> <port>

Drives the ENGINE under jax.distributed multi-controller at PRODUCTION
widths (hash_dim=512, tile/chunk=4096 -- the defaults) on a synthetic
corpus of MHB_N names, printing the per-stage walls of
``multihost_fit_pairs``.  Then measures the distributed-grouping cost at
scale: a synthetic ~MHB_EDGES-pair matches list allgathers across
processes (the gather-to-every-controller design) and runs the native
union-find connected components + representative selection.
"""

import os
import sys
import time

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count="
    + os.environ.get("MHB_DEVS", "2")
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=proc_id,
)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from string_grouper_tpu import StringGrouper  # noqa: E402

N = int(os.environ.get("MHB_N", "20000"))
EDGES = int(os.environ.get("MHB_EDGES", "9000000"))
TIER = os.environ.get("MHB_TIER", "replicated")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from bench import synthetic_company_names  # noqa: E402

series = synthetic_company_names(N, seed=7)

t0 = time.perf_counter()
sg = StringGrouper(series, min_similarity=0.8, multihost=TIER).fit()
fit_s = time.perf_counter() - t0
assert sg.timings.labels.get("multihost_tier") == TIER, sg.timings.labels
stages = {
    k.split("mh_")[1]: v
    for k, v in sg.timings.seconds.items()
    if k.startswith("match.mh_")
}
t0 = time.perf_counter()
groups = sg.get_groups()
groups_s = time.perf_counter() - t0
print(
    f"ENGINE {proc_id} tier={TIER} n={N} fit={fit_s:.3f} pairs={len(sg._matches_list)} "
    f"groups={groups_s:.3f} "
    + " ".join(f"{k}={v}" for k, v in sorted(stages.items())),
    flush=True,
)

# --- distributed result-list scale: compact gather (i32 ids + f64 sims,
# the production wire: 16 B/pair) vs the legacy f64 triple wire
# (24 B/pair), then native union-find at ~9M edges.
if EDGES:
    from string_grouper_tpu.ops.connected_components import (
        connected_components,
    )
    from string_grouper_tpu.parallel.multihost import (
        _allgather_ragged,
        _gather_pair_list,
    )

    n_nodes = 663_000
    rng = np.random.default_rng(1)
    per = EDGES // nproc
    rows = np.sort(rng.integers(0, n_nodes, size=per))
    cols = np.minimum(rows + rng.integers(0, 5, size=per), n_nodes - 1)
    sims = np.full(per, 0.9)

    # Collective programs are shape-specialized: rep 1 of each wire pays
    # its compile, rep 2 is the steady state -- record the steady rep.
    for rep in range(2):
        t0 = time.perf_counter()
        rg, cg, sg_ = _gather_pair_list(rows, cols, sims)
        gather_s = time.perf_counter() - t0

    wire = np.empty((per, 3), dtype=np.float64)
    wire[:, 0] = rows
    wire[:, 1] = cols
    wire[:, 2] = sims
    for rep in range(2):
        t0 = time.perf_counter()
        allp = np.concatenate(_allgather_ragged(wire))
        legacy_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    labels = connected_components(rg, cg, n_nodes)
    cc_s = time.perf_counter() - t0
    print(
        f"GROUPSCALE {proc_id} edges={len(rg)} gather={gather_s:.3f} "
        f"legacy_gather={legacy_s:.3f} cc={cc_s:.3f} "
        f"n_groups={len(np.unique(labels))}",
        flush=True,
    )
print(f"BENCH_OK {proc_id}", flush=True)
