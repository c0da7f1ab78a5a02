"""Profiling: per-phase wall timers and jax.profiler trace capture.

The reference has no tracing beyond tqdm and ad-hoc time.time() calls
(SURVEY §5); here phase timing and device traces are first-class:

  * ``PhaseTimer`` — nestable named wall timers with summary stats,
  * ``device_trace`` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace (the tool for finding HBM/MXU bottlenecks),
  * trainer integration: set ``profile_first_epoch`` to capture the first
    training epoch.
"""

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

logger = logging.getLogger(__name__)


class PhaseTimer:
    """Named wall-clock phase timers with accumulation."""

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self._totals[name] += elapsed
            self._counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: dict(
                total_s=self._totals[name],
                count=self._counts[name],
                mean_s=self._totals[name] / max(self._counts[name], 1),
            )
            for name in sorted(self._totals)
        }

    def log_summary(self, prefix: str = "") -> None:
        for name, stats in self.summary().items():
            logger.info(
                "%sphase %-24s total %8.3fs  mean %8.4fs  (n=%d)",
                prefix,
                name,
                stats["total_s"],
                stats["mean_s"],
                int(stats["count"]),
            )

    def reset(self) -> None:
        self._totals.clear()
        self._counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (open with TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Wrote device trace to %s", log_dir)
