"""PerfTimer — paired host + device timing (reference wisp/utils/perf.py:46-91: CPU
process_time + CUDA events). On TPU, device timing = block_until_ready deltas; also provides
a jax.profiler trace context (the nsight/NVTX replacement, SURVEY.md §5.1)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax

log = logging.getLogger(__name__)


class PerfTimer:
    def __init__(self, activate: bool = True, show_memory: bool = False,
                 print_mode: bool = True):
        self.activate = activate
        self.show_memory = show_memory
        self.print_mode = print_mode
        self.reset()

    def reset(self) -> None:
        self._host_start = time.process_time()
        self._wall_start = time.perf_counter()
        self._laps = []

    def check(self, name: str = "", sync=None) -> Optional[float]:
        """Record a lap; pass the step's output pytree as ``sync`` to include device time
        (block_until_ready — the CUDA-event equivalent)."""
        if not self.activate:
            return None
        if sync is not None:
            jax.block_until_ready(sync)
        wall = time.perf_counter() - self._wall_start
        host = time.process_time() - self._host_start
        self._laps.append((name, wall, host))
        if self.print_mode:
            mem = ""
            if self.show_memory:
                try:
                    stats = jax.devices()[0].memory_stats() or {}
                    mem = f" | hbm {stats.get('bytes_in_use', 0) / 2**20:.0f}MB"
                except Exception:  # noqa: BLE001
                    pass
            log.info(f"[perf] {name}: wall {wall*1e3:.2f}ms host {host*1e3:.2f}ms{mem}")
        self._wall_start = time.perf_counter()
        self._host_start = time.process_time()
        return wall


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/wisp_trace"):
    """jax.profiler trace context — xplane dumps instead of nsight (SURVEY.md §5.1);
    view with tensorboard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info(f"profiler trace written to {log_dir}")


def named_scope(name: str):
    """Alias of jax.named_scope — the NVTX-range equivalent used across the hot path."""
    return jax.named_scope(name)
