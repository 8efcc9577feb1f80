"""Host allocator tuning for TPU-VM page-fault behavior.

On TPU hosts (microVM guests with ballooned/demand-backed memory), first
touch of a freshly mapped page is orders of magnitude more expensive than a
normal minor fault.  glibc's default policy of serving large allocations
with ``mmap`` and returning them on ``free`` makes every multi-megabyte
numpy temporary re-fault its pages on every pipeline stage -- measured here
at ~25 MB/s effective, turning second-long encodes into minutes.

Two ``mallopt`` switches fix this process-wide:

  * ``M_MMAP_THRESHOLD`` huge: large blocks come from the brk heap instead
    of per-allocation mmaps;
  * ``M_TRIM_THRESHOLD`` huge: freed heap memory is never returned to the
    kernel, so pages fault once per process lifetime and are then reused.

Applied automatically at package import ONLY when a TPU-VM-like environment
is detected (see :func:`should_tune`) -- on an ordinary Linux host, an
application that merely imports this library should not get a process-wide
"never return freed memory to the OS" policy.  Force with
``STRING_GROUPER_TPU_MALLOC_TUNING=1`` (e.g. other microVM guests), opt out
with ``STRING_GROUPER_TPU_NO_MALLOC_TUNING=1``.  ``prewarm`` touches an
arena up front with one thread per core so the one-time fault cost is paid
concurrently, before any timed region.
"""

from __future__ import annotations

import ctypes
import os
import threading

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_applied = False


def should_tune() -> bool:
    """Whether the import-time tuning should run: explicit opt-in/out wins;
    otherwise detect a TPU environment (the page-fault pathology this works
    around is a TPU-VM/microVM trait, not ordinary Linux behavior)."""
    if os.environ.get("STRING_GROUPER_TPU_NO_MALLOC_TUNING"):
        return False
    if os.environ.get("STRING_GROUPER_TPU_MALLOC_TUNING"):
        return True
    plats = (os.environ.get("JAX_PLATFORMS") or "").lower()
    if "tpu" in plats or "axon" in plats:
        return True
    if os.environ.get("TPU_WORKER_ID") or os.environ.get("TPU_SKIP_MDS_QUERY"):
        return True
    return os.path.exists("/dev/vfio") and os.path.exists("/sys/class/vfio")


def tune_malloc() -> bool:
    """Apply the allocator tuning (idempotent).  Returns True on success."""
    global _applied
    if _applied:
        return True
    if os.environ.get("STRING_GROUPER_TPU_NO_MALLOC_TUNING"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok1 = libc.mallopt(_M_TRIM_THRESHOLD, 2**31 - 1)
        ok2 = libc.mallopt(_M_MMAP_THRESHOLD, 2**31 - 1)
        _applied = bool(ok1 and ok2)
    except Exception:
        _applied = False
    if _applied:
        _route_arrow_through_heap()
    return _applied


def _route_arrow_through_heap() -> None:
    """Point pyarrow's default memory pool at the system (glibc) allocator
    so the tuned never-trim heap also backs the Arrow string gathers of
    the output assembly.  pyarrow's default (mimalloc) purges large freed
    blocks back to the OS, so every `get_matches` at corpus scale re-pays
    the first-touch fault cost under memory pressure -- measured on the
    TPU-VM: first 4.5M-row string gather 5.4 s (and weather-sensitive
    thereafter) on mimalloc vs 0.4 s routed through the tuned heap, with
    equal steady-state (~0.2 s).  ``SG_TPU_ARROW_POOL=0`` opts out."""
    if os.environ.get("SG_TPU_ARROW_POOL") == "0":
        return
    try:
        import pyarrow as pa

        pa.set_memory_pool(pa.system_memory_pool())
    except Exception:
        pass


def prewarm(n_bytes: int, n_threads: int = 0) -> None:
    """Fault-in ``n_bytes`` of heap up front, in parallel.

    The memory is freed immediately; with :func:`tune_malloc` in effect the
    pages stay mapped in the heap free list, so subsequent numpy temporaries
    allocate fault-free.
    """
    tune_malloc()
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.malloc.restype = ctypes.c_void_p
        libc.free.argtypes = [ctypes.c_void_p]
    except Exception:
        return
    # malloc without touching (main arena); fault the pages from worker
    # threads (ctypes releases the GIL), then free -- with trimming disabled
    # the pages stay in the heap free list for numpy to reuse fault-free.
    ptr = libc.malloc(ctypes.c_size_t(n_bytes))
    if not ptr:
        return
    chunk = n_bytes // n_threads

    def touch(off: int, ln: int) -> None:
        ctypes.memset(ptr + off, 1, ln)

    threads = [
        threading.Thread(
            target=touch,
            args=(i * chunk, chunk if i < n_threads - 1 else n_bytes - i * chunk),
        )
        for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    libc.free(ctypes.c_void_p(ptr))
