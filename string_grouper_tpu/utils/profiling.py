"""First-class timing/tracing hooks.

The reference has no built-in profiling (SURVEY.md section 5); performance
analysis was done offline.  Here every ``StringGrouper.fit`` records
per-phase wall times (encode / device match / output assembly), queryable as
``sg.timings``, and :func:`trace` wraps a block in the JAX profiler for
TensorBoard-compatible device traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@dataclass
class PhaseTimings:
    """Wall-clock seconds per pipeline phase of the most recent fit.

    ``seconds`` holds numbers only (float walls plus int counters such as
    ``match.rounds``); non-numeric per-fit facts (e.g. which multihost
    tier ran) live in ``labels`` so numeric consumers of ``seconds`` --
    ``sum(t.seconds.values())``, float formatting -- never break."""

    seconds: Dict[str, float] = field(default_factory=dict)
    labels: Dict[str, str] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] = self.seconds.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def reset(self) -> None:
        self.seconds.clear()
        self.labels.clear()

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        body = ", ".join(
            # Counter entries (rounds, pairs_scored, ...) are ints, not walls.
            f"{k}={v}" if isinstance(v, int) else f"{k}={v:.3f}s"
            for k, v in self.seconds.items()
        )
        return f"PhaseTimings({body})"


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/string_grouper_tpu_trace") -> Iterator[None]:
    """Capture a JAX device profile of the enclosed block.

    View with TensorBoard or Perfetto (``jax.profiler`` trace format).
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
