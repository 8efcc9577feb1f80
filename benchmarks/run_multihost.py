#!/usr/bin/env python
"""N>=2-host scaling measurement (BASELINE.json config #5's host axis).

Runs the true two-process pipeline (tests/mh_worker.py: per-process corpus
shards, gloo collectives) at growing corpus sizes and records per-stage
walls to MULTIHOST_BENCH_<tag>.json.  CPU-device numbers -- the point is
the measured N=2-process scaling shape of the DCN-form pipeline, not
absolute throughput (the device program is the same one the TPU mesh
runs).
"""
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "mh_worker.py")


def run_size(n, port):
    env = dict(os.environ, MH_N=str(n), MH_TILE="64", MH_SKIP_ESC="1",
               JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    wall = time.perf_counter() - t0
    rec = {"n": n, "wall_total_s": round(wall, 2)}
    for i, out in enumerate(outs):
        assert procs[i].returncode == 0, out[-2000:]
        m = re.search(r"TIME_ENCODE \d+ ([0-9.]+)", out)
        rec[f"encode_p{i}_s"] = float(m.group(1))
        m = re.search(r"TIME_MATCH \d+ ([0-9.]+) pairs (\d+)", out)
        rec[f"match_p{i}_s"] = float(m.group(1))
        rec[f"pairs_p{i}"] = int(m.group(2))
    return rec


ENGINE_WORKER = os.path.join(
    ROOT, "benchmarks", "mh_engine_bench.py"
)


def run_engine_size(n, port, edges=0, nproc=2, tier="replicated", devs=2):
    """One ``nproc``-process run of the engine-integrated multihost tier
    (production widths hash_dim=512 / tile=4096); optionally follows with
    the result-gather scale measurement (compact vs legacy wire + native
    CC at ``edges`` synthetic pairs)."""
    env = dict(os.environ, MHB_N=str(n), MHB_EDGES=str(edges),
               MHB_TIER=tier, MHB_DEVS=str(devs), JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, ENGINE_WORKER, str(i), str(nproc), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    wall = time.perf_counter() - t0
    rec = {"n": n, "nproc": nproc, "tier": tier,
           "wall_total_s": round(wall, 2)}
    for i, out in enumerate(outs):
        assert procs[i].returncode == 0, out[-2000:]
        m = re.search(r"ENGINE \d+ tier=\S+ n=\d+ fit=([0-9.]+) "
                      r"pairs=(\d+) groups=([0-9.]+) (.*)", out)
        rec[f"fit_p{i}_s"] = float(m.group(1))
        rec[f"pairs_p{i}"] = int(m.group(2))
        rec[f"groups_p{i}_s"] = float(m.group(3))
        for kv in m.group(4).split():
            k, v = kv.split("=")
            if k != "tier":
                rec[f"{k}_p{i}"] = float(v)
        g = re.search(
            r"GROUPSCALE \d+ edges=(\d+) gather=([0-9.]+) "
            r"legacy_gather=([0-9.]+) cc=([0-9.]+)", out
        )
        if g:
            rec[f"scale_edges_p{i}"] = int(g.group(1))
            rec[f"scale_gather_p{i}_s"] = float(g.group(2))
            rec[f"scale_gather_legacy_p{i}_s"] = float(g.group(3))
            rec[f"scale_cc_p{i}_s"] = float(g.group(4))
    return rec


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r05"
    out = {"devices_per_process": 2,
           "backend": "cpu+gloo (same program shape as TPU ICI/DCN)",
           "demo_tier_sizes": [], "engine_tier_sizes": [],
           "engine_tier_scaling": []}
    path = os.path.join(ROOT, f"MULTIHOST_BENCH_{tag}.json")

    def save():
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    for i, n in enumerate((1000, 4000, 10000)):
        rec = run_size(n, 12410 + i)
        out["demo_tier_sizes"].append(rec)
        print(rec, file=sys.stderr, flush=True)
        save()
    # Production tiers at growing sizes (N=2); the last replicated size
    # also measures the result-gather scale leg (compact vs legacy wire +
    # native CC at 9M edges).
    for i, (n, edges, tier) in enumerate((
        (5000, 0, "replicated"),
        (20000, 0, "replicated"),
        (40000, 9_000_000, "replicated"),
        (20000, 0, "sharded"),
    )):
        rec = run_engine_size(n, 12430 + i, edges, tier=tier)
        out["engine_tier_sizes"].append(rec)
        print(rec, file=sys.stderr, flush=True)
        save()
    # Scaling curve: fixed corpus, N=2/4/8 processes (1 virtual device
    # each above N=2 -- the host has 4 cores).  Collective stages should
    # grow sub-linearly while match_s shrinks ~1/N.
    for i, (nproc, tier) in enumerate((
        (2, "replicated"), (4, "replicated"), (8, "replicated"),
        (2, "sharded"), (4, "sharded"), (8, "sharded"),
    )):
        rec = run_engine_size(
            20000, 12460 + i, nproc=nproc, tier=tier,
            devs=2 if nproc == 2 else 1,
        )
        out["engine_tier_scaling"].append(rec)
        print(rec, file=sys.stderr, flush=True)
        save()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
