"""Named-event profiler (reference parity: feh::Timer, core/utils.h:45-129).

Tick/Tock pairs accumulate per-event durations; printing reports the
average per event like the reference's operator<<. Extensions for the TPU
runtime: `scope` context manager, `block` to synchronize jax async
dispatch before stopping the clock, and jax.profiler trace hooks.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional


class Timer:
    def __init__(self, name: str = "timer"):
        self.name = name
        self._start: Dict[str, float] = {}
        self._total = defaultdict(float)
        self._count = defaultdict(int)

    def tick(self, event: str) -> None:
        self._start[event] = time.perf_counter()

    def tock(self, event: str, block_on=None) -> float:
        """Stop the clock for `event`; if `block_on` is a jax array, wait
        for it first (async dispatch would otherwise undercount)."""
        if block_on is not None:
            try:
                block_on.block_until_ready()
            except AttributeError:
                pass
        dt = time.perf_counter() - self._start[event]
        self._total[event] += dt
        self._count[event] += 1
        return dt

    @contextmanager
    def scope(self, event: str, block_on_result: bool = False):
        self.tick(event)
        try:
            yield
        finally:
            self.tock(event)

    def mean_ms(self, event: str) -> float:
        """Average milliseconds per occurrence (LookUp parity)."""
        n = self._count[event]
        return (self._total[event] / n * 1e3) if n else 0.0

    def report(self) -> Dict[str, Dict[str, float]]:
        return {e: {"mean_ms": self.mean_ms(e), "count": self._count[e],
                    "total_s": self._total[e]}
                for e in self._total}

    def __str__(self) -> str:
        lines = [f"=== {self.name} ==="]
        for e in sorted(self._total):
            lines.append(f"{e:<30s} {self.mean_ms(e):10.3f} ms "
                         f"x{self._count[e]}")
        return "\n".join(lines)


@contextmanager
def device_trace(logdir: Optional[str] = None):
    """jax.profiler trace scope (per-kernel timing from XLA profiles)."""
    import jax

    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
