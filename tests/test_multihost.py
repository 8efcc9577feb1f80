"""TRUE multi-process (multi-host) pipeline test.

Spawns two OS processes, each with its own jax runtime (2 virtual CPU
devices each) joined via ``jax.distributed`` + gloo collectives into one
4-device global mesh -- the closest single-machine analog of a 2-host TPU
deployment.  Each process holds ONLY its shard of the corpus strings;
every cross-process byte rides a device collective (vocab union, DF psum,
sharded hash matrix, exact-block allgather, candidate all_gather).

Asserted inside each worker (tests/mh_worker.py):
  * the shard-local encode is BITWISE identical to the corresponding rows
    of a single-process fit over the whole corpus (vocab, IDF, ELL);
  * the per-host top-n match results for the rows that host owns are
    exactly the single-process matcher's.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).with_name("mh_worker.py")
ENGINE_WORKER = Path(__file__).with_name("mh_engine_worker.py")


def _gloo_available() -> bool:
    try:
        import jax

        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        return True
    except Exception:
        return False


def _run_pair(port, extra_env=None, worker=WORKER, expect=(
        "WORKER_ENCODE_OK", "WORKER_OK", "WORKER_ESC_OK"), nproc=2):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **(extra_env or {}))
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(nproc), port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        for marker in expect:
            assert f"{marker} {i}" in out, f"missing {marker}:\n{out[-3000:]}"


@pytest.mark.skipif(not _gloo_available(), reason="no gloo collectives")
def test_two_process_pipeline():
    _run_pair("12399")


@pytest.mark.skipif(not _gloo_available(), reason="no gloo collectives")
def test_two_process_pipeline_byte_keys():
    # 9-grams over ASCII need 72 bits: the vocabulary union must take the
    # void byte-key path on every process (and still match the
    # single-process fit bitwise).  Escalation runs too (smaller corpus
    # keeps the forced cand_c0=2 re-match cheap) so the union re-match is
    # exercised under the byte-key vocabulary representation as well.
    _run_pair("12419", {"MH_NGRAM": "9", "MH_N": "60"})


@pytest.mark.skipif(not _gloo_available(), reason="no gloo collectives")
def test_two_process_engine():
    """PRODUCTION tier: the ENGINE (match_strings / group_similar_strings /
    match_most_similar, IDs included) runs under two real processes via the
    auto-detected multihost path and every output DataFrame is bitwise
    equal to a single-process fit."""
    _run_pair(
        "12439",
        worker=ENGINE_WORKER,
        expect=(
            "ENGINE_SELF_OK",
            "ENGINE_CROSS_OK",
            "ENGINE_GROUPS_OK",
            "ENGINE_TOP1_OK",
            "ENGINE_F32_OK",
            "ENGINE_SHARDED_OK",
            "ENGINE_SHARDED_CROSS_OK",
            "ENGINE_TINY_OK",
            "ENGINE_LADDER_OK",
            "ENGINE_OK",
        ),
    )


@pytest.mark.skipif(not _gloo_available(), reason="no gloo collectives")
def test_three_process_engine():
    """N > 2: uneven shard sizes (240 rows over 3 processes, each with 2
    virtual devices) through the same engine path."""
    _run_pair(
        "12459",
        worker=ENGINE_WORKER,
        expect=("ENGINE_SELF_OK", "ENGINE_GROUPS_OK", "ENGINE_SHARDED_OK",
                "ENGINE_TINY_OK", "ENGINE_LADDER_OK", "ENGINE_OK"),
        nproc=3,
        extra_env={"MH_ENGINE_N": "150"},
    )
