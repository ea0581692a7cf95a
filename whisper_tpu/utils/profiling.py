"""jax.profiler integration (SURVEY §5 tracing/profiling).

The reference declares timing fields and never writes them (main.rs:334-339);
whisper_tpu has live stage timers (utils.logging.StageTimers) and this module
adds device-level traces viewable in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str = "/tmp/whisper_tpu_trace"):
    """Capture a jax profiler trace around a code block."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)
