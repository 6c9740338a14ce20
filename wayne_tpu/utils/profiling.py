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


class _StageHandle:
    """Mutable per-stage handle: set .sync to a jax value inside the
    ``with`` block to block on it when the stage closes."""

    __slots__ = ("sync",)

    def __init__(self) -> None:
        self.sync: object = None


class StageTimers:
    """Named wall-clock accumulators (host-side, block-until-ready aware)."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator["_StageHandle"]:
        """Time a stage. To include the device time of async-dispatched
        work, either block inside the block yourself or set
        ``handle.sync = <jax value>`` on the yielded handle — a keyword
        argument could never work (it would be bound BEFORE the block
        body produced the array)."""
        handle = _StageHandle()
        t0 = time.perf_counter()
        try:
            yield handle
        finally:
            if handle.sync is not None:
                jax.block_until_ready(handle.sync)
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
