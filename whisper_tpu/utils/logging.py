"""Structured logging + stage timers.

Replaces the reference's `println!`/`function!()` macro logging
(/root/reference/src/main.rs:35-44) and its dead `t_*_us` timing fields
(main.rs:334-339, declared but never written): here the timers actually run
and feed the RTF report.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager
from typing import Dict

_FORMAT = "%(asctime)s %(name)s: %(message)s"


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(f"whisper_tpu.{name}")
    if not logging.getLogger("whisper_tpu").handlers:
        root = logging.getLogger("whisper_tpu")
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        root.addHandler(handler)
        root.setLevel(logging.INFO)
        root.propagate = False
    return logger


class StageTimers:
    """Cumulative per-stage wall-clock timers.

    The live version of the reference's `t_load_us / t_mel_us / t_sample_us /
    t_encode_us / t_decode_us` fields (main.rs:334-339).
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(
                f"  t_{name:<8s} = {self.totals[name] * 1e3:9.2f} ms"
                f"  ({self.counts[name]} calls)"
            )
        return "\n".join(lines)
