"""Multi-host orchestration helpers.

On a real pod slice each host process calls `initialize()` once before any
jax op (jax.distributed handles the DCN rendezvous; ICI collectives then
span the full slice automatically). Heartbeat-based failure detection for
long runs follows SURVEY §5: checkpoint every K frames
(visma_tpu.utils.checkpoint) + a monitor that restarts stragglers from the
latest snapshot.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var defaults
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID). No-op when
    single-process."""
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ["NUM_PROCESSES"]),
        process_id=process_id or int(os.environ["PROCESS_ID"]))


class Heartbeat:
    """Minimal liveness file for external monitors: touch() from the train
    loop, stale() from a watchdog."""

    def __init__(self, path: str, interval_s: float = 30.0):
        self.path = path
        self.interval_s = interval_s
        self._last = 0.0

    def touch(self, step: int) -> None:
        now = time.time()
        if now - self._last >= self.interval_s:
            with open(self.path, "w") as fp:
                fp.write(f"{step} {now}\n")
            self._last = now

    def stale(self, timeout_s: float = 120.0) -> bool:
        try:
            mtime = os.path.getmtime(self.path)
        except OSError:
            return True
        return (time.time() - mtime) > timeout_s
