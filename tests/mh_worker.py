"""Worker process of the multi-host demonstration (tests/test_multihost.py).

Run as: python mh_worker.py <proc_id> <nproc> <port>

Each process holds ONLY its shard of the corpus strings for the pipeline;
the full corpus is regenerated locally at the end purely to build the
verification oracle.  Prints 'WORKER_OK <proc_id>' on success.
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from string_grouper_tpu.config import StringGrouperConfig  # noqa: E402
from string_grouper_tpu.corpus import TfidfEncoder  # noqa: E402
from string_grouper_tpu.ops.matcher import topn_cosine_matches  # noqa: E402
from string_grouper_tpu.parallel.multihost import (  # noqa: E402
    multihost_encode_shard,
    multihost_match_shard,
)


def corpus(n=None, seed=5):
    n = n or int(os.environ.get("MH_N", "120"))
    rng = np.random.default_rng(seed)
    stems = ["hyper", "mega", "quantum", "global", "acme", "stellar",
             "apex", "vertex", "summit", "cascade"]
    kinds = ["industries", "holdings", "systems", "partners"]
    out = []
    for i in range(n):
        s = f"{rng.choice(stems)} {rng.choice(stems)} {rng.choice(kinds)}"
        if rng.random() < 0.4:
            pos = int(rng.integers(0, len(s)))
            s = s[:pos] + s[pos + 1:]
        out.append(s)
    return out


MIN_SIM, MAX_N = 0.5, 5

import time as _time

full = corpus()
n_total = len(full)
per = -(-n_total // nproc)
lo, hi = proc_id * per, min((proc_id + 1) * per, n_total)
shard = full[lo:hi]  # the ONLY strings this process feeds the pipeline

# MH_NGRAM=9 forces the byte-key vocabulary path (8 bits x 9 > 64, so
# packed uint64 keys don't fit and the void-key fallback must agree
# globally) -- same assertions, different key representation.
config = StringGrouperConfig(
    min_similarity=MIN_SIM,
    ngram_size=int(os.environ.get("MH_NGRAM", "3")),
)

# --- multi-host encode: shard-local tokenize, global vocab/DF agreements
_t0 = _time.perf_counter()
local_ell, idf, n_docs = multihost_encode_shard(shard, config)
print(f"TIME_ENCODE {proc_id} {_time.perf_counter() - _t0:.3f}", flush=True)
assert n_docs == n_total

# verify the shard block bitwise against a single-process fit (oracle only)
oracle_enc = TfidfEncoder(config)
oracle_ell = oracle_enc.fit_transform(full).wait_ready()
np.testing.assert_array_equal(idf, oracle_enc.idf_)
w = max(local_ell.width, oracle_ell.width)
from string_grouper_tpu.ops.matcher import _pad_width  # noqa: E402

lp = _pad_width(local_ell, w)
op = _pad_width(oracle_ell, w)
np.testing.assert_array_equal(lp.ids, op.ids[lo:hi])
np.testing.assert_array_equal(lp.vals64, op.vals64[lo:hi])
print(f"WORKER_ENCODE_OK {proc_id}", flush=True)

# --- multi-host match: this process gets exact top-n for ITS rows only
_t0 = _time.perf_counter()
r_s, c_s, s_s = multihost_match_shard(
    local_ell, lo, n_total, MIN_SIM, MAX_N,
    hash_dim=128, tile=int(os.environ.get("MH_TILE", "8")),
)
print(f"TIME_MATCH {proc_id} {_time.perf_counter() - _t0:.3f} "
      f"pairs {len(r_s)}", flush=True)

ref = topn_cosine_matches(
    oracle_ell, None, MIN_SIM, MAX_N, force_symmetries=False, hash_dim=128
)
ref_pairs = {
    (int(r), int(c)): s
    for r, c, s in zip(ref.rows, ref.cols, ref.sims)
    if lo <= r < hi
}


def check(r_a, c_a, s_a, label):
    got = {(int(r), int(c)): s for r, c, s in zip(r_a, c_a, s_a)}
    assert set(got) == set(ref_pairs), (
        f"p{proc_id} {label}: {len(set(ref_pairs) - set(got))} missing "
        f"{len(set(got) - set(ref_pairs))} extra"
    )
    for k in ref_pairs:
        assert got[k] == ref_pairs[k], (label, k, got[k], ref_pairs[k])


check(r_s, c_s, s_s, "wide")
print(f"WORKER_OK {proc_id}", flush=True)

# --- force the multi-controller union escalation: a tiny candidate width
# truncates the dense rows' candidates, their drop bounds flag them, and
# the allgathered union re-match must restore the exact result.
if os.environ.get("MH_SKIP_ESC"):
    print(f"WORKER_ESC_OK {proc_id} (skipped)", flush=True)
    sys.exit(0)
r_e, c_e, s_e = multihost_match_shard(
    local_ell, lo, n_total, MIN_SIM, MAX_N, hash_dim=128, tile=8, cand_c0=2
)
check(r_e, c_e, s_e, "escalated")
print(f"WORKER_ESC_OK {proc_id}", flush=True)
