#!/usr/bin/env python
"""Multi-distribution benchmark sweep (VERDICT r2 item 4).

Runs bench.py once per corpus shape (see bench.SHAPES) and aggregates the
JSON lines into BENCH_SHAPES_<tag>.json at the repo root.  The reference's
334.65 s baseline was measured on one real-world distribution (SEC EDGAR);
a single synthetic shape tunes the escalation/rescore trade-offs to one
candidate-count regime, so the secondary shapes pin throughput where the
pipeline behaves differently: cluster skew (escalation-heavy), long strings
(encode/rescore-heavy), and a unicode mix (non-native encoder + packed-slot
upload path).

Usage: python benchmarks/run_shapes.py [tag] [n]
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r03"
    n = sys.argv[2] if len(sys.argv) > 2 else "663000"
    out = {}
    for shape in ("company", "skewed", "long", "unicode"):
        env = dict(
            os.environ,
            BENCH_SHAPE=shape,
            BENCH_N=n,
            BENCH_WARMUPS=os.environ.get("BENCH_WARMUPS", "3"),
            BENCH_RUNS=os.environ.get("BENCH_RUNS", "5"),
            BENCH_SKIP_PATH_CHECK="1",
        )
        print(f"=== shape={shape} n={n}", file=sys.stderr, flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        print(r.stderr[-2000:], file=sys.stderr, flush=True)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
        out[shape] = json.loads(line)
        path = os.path.join(ROOT, f"BENCH_SHAPES_{tag}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"{shape}: {out[shape].get('value')}s "
              f"({out[shape].get('comparisons_per_s_per_chip'):,} cmp/s)",
              file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
