"""Tracing / profiling helpers (SURVEY.md section 5.1).

The reference's only observability is per-exposure progress printing;
here we add structured per-stage timers plus a thin wrapper over
jax.profiler so visits can be traced in xprof/TensorBoard on TPU.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Iterator

import jax

log = logging.getLogger("wayne_tpu.profiling")


class StageTimers:
    """Named wall-clock accumulators (host-side, block-until-ready aware)."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, *, sync: object = None) -> Iterator[None]:
        """Time a stage; pass a jax array as ``sync`` to include device time."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_s": round(v / max(self.counts[k], 1), 5)}
                for k, v in sorted(self.totals.items())}

    def report(self) -> str:
        lines = [f"{k:<28s} {v['total_s']:>9.3f}s  x{v['count']:<5d} "
                 f"({v['mean_s'] * 1e3:.2f} ms/call)"
                 for k, v in self.summary().items()]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture an xprof/TensorBoard trace of everything inside the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", logdir)
