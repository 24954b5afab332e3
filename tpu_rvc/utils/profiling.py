"""Phase timing + device profiling helpers (SURVEY §5: the reference only
has coarse wall-clock accumulators — `times=[npy, f0, infer]` threaded
through the pipeline and EpochRecorder; both roles live here, plus an
optional jax.profiler trace wrapper for real device timelines).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class PhaseTimer:
    """Accumulating named phase timer (the reference's times[] role,
    infer/modules/vc/pipeline.py:107)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        return ", ".join(
            f"{k}: {v:.3f}s/{self.counts[k]}x" for k, v in self.totals.items())


class EpochRecorder:
    """Per-epoch elapsed time (reference train.py:89-99)."""

    def __init__(self):
        self.last = time.time()

    def record(self) -> str:
        now = time.time()
        elapsed = now - self.last
        self.last = now
        return f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] | ({elapsed:.1f}s)"


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace when a log dir is given; no-op otherwise.

    NOTE: on remote-attached (tunnel) devices the profiler may be
    unavailable; failures degrade to a no-op with a warning.
    """
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover
        import logging

        logging.getLogger(__name__).warning("profiler unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()
