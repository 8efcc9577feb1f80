"""Persistent XLA compilation cache wiring.

The phase-1 scan chain (nested ``lax.scan`` + Pallas kernel + escalation
width variants) costs minutes of XLA compile time on a fresh TPU process at
production corpus sizes (~200 s at 663k), while the steady state fit is
~7 s.  JAX's persistent compilation cache eliminates that for every process
after the first -- measured 78 s -> 13.7 s first-fit at 50k on v5e -- but
nothing enables it by default, so the library turns it on at engine start.

Respects the user: an explicitly configured ``jax_compilation_cache_dir``
(jax config or the JAX_COMPILATION_CACHE_DIR env var) is left alone;
``SG_TPU_JAX_CACHE=0`` disables this wiring, any other value overrides the
default location (``~/.cache/string_grouper_tpu/jax_cache``).

Cache entries are keyed by compiled shapes, which depend on the padded
corpus size -- a cache warmed at one corpus scale does not serve another,
but re-running the same pipeline (the production pattern) hits every entry.
"""

from __future__ import annotations

import hashlib
import logging
import os
import platform as _platform
from pathlib import Path

logger = logging.getLogger("string_grouper_tpu")

_done = False


def machine_fingerprint(cpu_flags: str | None = None,
                        jax_version: str | None = None) -> str:
    """Short stable fingerprint of this host's instruction-set surface.

    XLA:CPU AOT entries embed machine features (AVX-512 etc.); loading an
    entry compiled on a different host can SIGILL.  JAX's own cache key does
    not fully capture host CPU features, so when one shared cache directory
    serves heterogeneous machines, stale cross-machine entries get loaded
    (observed as ``machine features don't match`` warnings).  Segregating
    the default cache dir by this fingerprint makes that impossible.

    Parameters exist only for testability; by default the fingerprint is
    derived from the live host (``/proc/cpuinfo`` flags, arch, jax version).
    """
    if cpu_flags is None:
        cpu_flags = ""
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith(("flags", "Features")):
                        cpu_flags = line.split(":", 1)[1].strip()
                        break
        except OSError:  # pragma: no cover - non-Linux
            pass
    if jax_version is None:
        try:
            import jax

            jax_version = jax.__version__
        except Exception:  # pragma: no cover
            jax_version = "unknown"
    blob = "|".join((_platform.machine(), jax_version,
                     " ".join(sorted(cpu_flags.split()))))
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def ensure_compilation_cache() -> None:
    """Idempotently point JAX's persistent compilation cache at a per-user
    directory unless the user configured one (or opted out)."""
    global _done
    if _done:
        return
    _done = True
    knob = os.environ.get("SG_TPU_JAX_CACHE")
    if knob == "0":
        return
    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:  # pragma: no cover - very old jax
        return
    if current:  # user already configured a cache
        return
    if knob:
        path = Path(knob)
    else:
        # CPU backend: leave the cache off.  CPU compiles are cheap (the
        # cache exists for the minutes-scale TPU compile chain), and
        # XLA:CPU cache entries are AOT executables embedding machine
        # features -- reloading them emits feature-mismatch warnings even
        # on the writing machine (the compile target carries pseudo-
        # features like +prefer-no-scatter that host detection never
        # reports) and can SIGILL across machines.  An explicit
        # SG_TPU_JAX_CACHE dir opts back in.
        try:
            if jax.default_backend() == "cpu":
                return
        except Exception:  # pragma: no cover - backend init failure
            return
        xdg = os.environ.get("XDG_CACHE_HOME")
        base = Path(xdg) if xdg else Path.home() / ".cache"
        # Segregate by host fingerprint: the same default dir may be
        # NFS-shared between machines with different CPU features, and
        # XLA:CPU AOT entries are not portable across those.
        path = base / "string_grouper_tpu" / "jax_cache" / machine_fingerprint()
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError:  # pragma: no cover - unwritable home
        return
    jax.config.update("jax_compilation_cache_dir", str(path))
    # Persist even tiny programs: on the tunneled TPU backend EVERY
    # compile pays a ~0.45 s RPC floor, and a cold fit dispatches ~20
    # distinct tiny programs -- ~9 s that the default 1 s threshold would
    # never cache.  An EXPLICIT user setting (env var) wins, same as the
    # dir knob above.
    if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in os.environ:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    logger.debug("persistent compilation cache at %s", path)
