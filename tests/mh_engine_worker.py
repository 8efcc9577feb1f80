"""Engine worker of the PRODUCTION multi-host tier test
(tests/test_multihost.py::test_two_process_engine).

Run as: python mh_engine_worker.py <proc_id> <nproc> <port>

SPMD contract of the tier: every process calls the SAME engine API with the
SAME full input Series; the engine shards encode + matching across the
processes internally (parallel/multihost.py multihost_fit_pairs) and every
process gets the identical full output DataFrame.  This worker asserts each
output is BITWISE equal to a single-process fit (multihost=False forces the
single-controller path for the oracle).  Prints 'ENGINE_OK <proc_id>' on
success plus per-stage walls for the bench artifact.
"""

import os
import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
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

import string_grouper_tpu as sgt  # noqa: E402
from string_grouper_tpu import StringGrouper  # noqa: E402


def names(n, seed):
    rng = np.random.default_rng(seed)
    stems = ["hyper", "mega", "quantum", "global", "acme", "stellar",
             "apex", "vertex", "summit", "cascade"]
    kinds = ["industries", "holdings", "systems", "partners"]
    out = []
    for _ in range(n):
        s = f"{rng.choice(stems)} {rng.choice(stems)} {rng.choice(kinds)}"
        if rng.random() < 0.4:
            p = int(rng.integers(0, len(s)))
            s = s[:p] + s[p + 1:]
        out.append(s)
    return pd.Series(out)


N = int(os.environ.get("MH_ENGINE_N", "240"))
series = names(N, seed=5)
dup = names(N // 2, seed=6)
ids = pd.Series([f"id{i}" for i in range(N)])
dids = pd.Series([f"d{i}" for i in range(N // 2)])

assert jax.process_count() == nproc

# --- auto-detection: a plain engine call under a multi-controller job must
# route through the multihost tier (config.multihost defaults to auto).
sg = StringGrouper(series, min_similarity=0.6).fit()
assert "match.mh_match_s" in sg.timings.seconds, sg.timings.seconds
mh_self = sg.get_matches()
stage_keys = [k for k in sg.timings.seconds if k.startswith("match.mh_")]
print(
    f"STAGES {proc_id} "
    + " ".join(f"{k.split('mh_')[1]}={sg.timings.seconds[k]}" for k in stage_keys),
    flush=True,
)

# Oracles: force the single-controller path on this process.
oracle_self = sgt.match_strings(series, min_similarity=0.6, multihost=False)
pd.testing.assert_frame_equal(mh_self, oracle_self)
print(f"ENGINE_SELF_OK {proc_id}", flush=True)

# Cross-join with IDs through the high-level API (auto multihost).
mh_cross = sgt.match_strings(series, dup, ids, dids, min_similarity=0.5)
oracle_cross = sgt.match_strings(
    series, dup, ids, dids, min_similarity=0.5, multihost=False
)
pd.testing.assert_frame_equal(mh_cross, oracle_cross)
print(f"ENGINE_CROSS_OK {proc_id}", flush=True)

# Grouping (distributed form = gather-to-every-controller + native CC).
mh_groups = sgt.group_similar_strings(series, ids, min_similarity=0.6)
oracle_groups = sgt.group_similar_strings(
    series, ids, min_similarity=0.6, multihost=False
)
pd.testing.assert_frame_equal(mh_groups, oracle_groups)
print(f"ENGINE_GROUPS_OK {proc_id}", flush=True)

# Top-1 semantics incl. NaN repair.
mh_top1 = sgt.match_most_similar(series, dup, min_similarity=0.5)
oracle_top1 = sgt.match_most_similar(
    series, dup, min_similarity=0.5, multihost=False
)
pd.testing.assert_frame_equal(mh_top1, oracle_top1)
print(f"ENGINE_TOP1_OK {proc_id}", flush=True)

# float32 matrices must SHARD the encode too (the f32 sklearn rounding
# chain runs inside multihost_encode_shard) -- the sharded-path stage keys
# prove no full-local-encode carve-out ran.
sg32 = StringGrouper(
    series, min_similarity=0.5, tfidf_matrix_dtype=np.float32
).fit()
f32_stages = sg32.timings.seconds
assert "match.mh_encode_s" in f32_stages, f32_stages
assert "match.mh_ell_allgather_s" in f32_stages, f32_stages
oracle32 = sgt.match_strings(
    series, min_similarity=0.5, tfidf_matrix_dtype=np.float32,
    multihost=False,
)
pd.testing.assert_frame_equal(sg32.get_matches(), oracle32)
print(f"ENGINE_F32_OK {proc_id}", flush=True)

# SHARDED tier under real processes: bitwise-equal with NO full-corpus ELL
# materialized on any process -- per-process exact-ELL bytes must be
# ~1/nproc of what the replicated tier would hold, and the phase-2 ring
# visits one remote shard at a time.
sg_sh = StringGrouper(series, min_similarity=0.6, multihost="sharded").fit()
st = sg_sh.timings.seconds
assert sg_sh.timings.labels.get("multihost_tier") == "sharded", st
assert "match.mh_ell_allgather_s" not in st, st
local_b = st["match.mh_mem_local_ell_bytes"]
full_b = st["match.mh_mem_replicated_ell_bytes"]
assert local_b * nproc <= full_b * 1.5, (local_b, full_b, nproc)
visit_b = st["match.mh_mem_peak_visit_bytes"]
assert visit_b <= (full_b * 1.5) / nproc + 1, (visit_b, full_b, nproc)
pd.testing.assert_frame_equal(sg_sh.get_matches(), oracle_self)
print(
    f"MEM {proc_id} local={local_b} visit={visit_b} replicated={full_b}",
    flush=True,
)
print(f"ENGINE_SHARDED_OK {proc_id}", flush=True)

# Sharded cross-join with IDs.
mh_sh_cross = sgt.match_strings(
    series, dup, ids, dids, min_similarity=0.5, multihost="sharded"
)
pd.testing.assert_frame_equal(mh_sh_cross, oracle_cross)
print(f"ENGINE_SHARDED_CROSS_OK {proc_id}", flush=True)

# Corpus smaller than the process count: trailing processes get EMPTY
# shards (a negative-length slice here once produced a crash).
tiny = pd.Series(["acme corp", "acme corp."])
mh_tiny = sgt.match_strings(tiny, min_similarity=0.5, multihost="sharded")
oracle_tiny = sgt.match_strings(tiny, min_similarity=0.5, multihost=False)
pd.testing.assert_frame_equal(mh_tiny, oracle_tiny)
print(f"ENGINE_TINY_OK {proc_id}", flush=True)

# Sharded-tier escalation LADDER under real collectives: a tie-heavy
# corpus (clusters of identical strings) overflows the kt=2 per-tile
# extraction, so unsafe rows must climb the collective ladder on every
# process in lock-step -- a dispatch mismatch here hangs rather than
# mis-answers, and the result must stay bitwise-equal.
dup_heavy = pd.Series(
    [f"cluster {i % 7} holdings corp" for i in range(90)]
    + list(names(30, seed=9))
)
sg_esc = StringGrouper(
    dup_heavy, min_similarity=0.5, multihost="sharded"
).fit()
assert sg_esc.timings.seconds.get("match.mh_esc_rows", 0) > 0, (
    sg_esc.timings.seconds
)
oracle_esc = sgt.match_strings(dup_heavy, min_similarity=0.5,
                               multihost=False)
pd.testing.assert_frame_equal(sg_esc.get_matches(), oracle_esc)
print(f"ENGINE_LADDER_OK {proc_id}", flush=True)

print(f"ENGINE_OK {proc_id}", flush=True)
