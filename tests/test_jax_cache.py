"""Persistent-cache portability (utils/jax_cache.py).

XLA:CPU AOT cache entries embed host machine features; one shared cache
directory serving heterogeneous hosts loads stale cross-machine entries
(observed as ``machine features don't match ... SIGILL`` warnings).  The
default cache dir is therefore segregated by a host fingerprint.
"""

from string_grouper_tpu.utils.jax_cache import machine_fingerprint


def test_distinct_cpu_flags_get_distinct_fingerprints():
    a = machine_fingerprint(cpu_flags="sse2 avx avx2", jax_version="0.9.0")
    b = machine_fingerprint(
        cpu_flags="sse2 avx avx2 avx512f", jax_version="0.9.0"
    )
    assert a != b
    assert len(a) == len(b) == 12


def test_fingerprint_stable_and_flag_order_insensitive():
    a = machine_fingerprint(cpu_flags="avx2 sse2 avx", jax_version="0.9.0")
    b = machine_fingerprint(cpu_flags="sse2 avx avx2", jax_version="0.9.0")
    assert a == b  # /proc/cpuinfo flag ordering is not a machine difference


def test_jax_version_changes_fingerprint():
    a = machine_fingerprint(cpu_flags="sse2", jax_version="0.9.0")
    b = machine_fingerprint(cpu_flags="sse2", jax_version="0.9.1")
    assert a != b


def test_live_fingerprint_is_deterministic():
    assert machine_fingerprint() == machine_fingerprint()
