"""Observability utilities: execution timers, per-frame step metrics, and
jax.profiler tracing.

TPU analogue of the reference's tracing spans around the two hot calls
(tts_model.rs:1016-1044) and Python's display_execution_time
(python-reference/pocket_tts/utils/utils.py:49-66).
"""

from __future__ import annotations

import contextlib
import logging
import statistics
import time

logger = logging.getLogger(__name__)


class Timer:
    def __init__(self):
        self.elapsed_ms = 0.0


@contextlib.contextmanager
def display_execution_time(label: str, print_output: bool = True):
    """`with display_execution_time("Prompting text"):` — logs wall ms."""
    t = Timer()
    t0 = time.monotonic()
    try:
        yield t
    finally:
        t.elapsed_ms = (time.monotonic() - t0) * 1000.0
        if print_output:
            logger.info("%s took %d ms", label, int(t.elapsed_ms))


@contextlib.contextmanager
def profiler_trace(log_dir: str = "/tmp/pocket_tts_trace"):
    """Capture a jax.profiler trace (open with TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class StepStats:
    """Rolling per-chunk decode statistics (the reference logs mean step time,
    tts_model.py:548)."""

    def __init__(self):
        self.chunk_ms: list[float] = []
        self.frames: list[int] = []

    def record(self, wall_ms: float, n_frames: int) -> None:
        self.chunk_ms.append(wall_ms)
        self.frames.append(n_frames)

    @property
    def total_frames(self) -> int:
        return sum(self.frames)

    def summary(self) -> dict:
        if not self.chunk_ms:
            return {}
        total_ms = sum(self.chunk_ms)
        frames = max(self.total_frames, 1)
        return {
            "chunks": len(self.chunk_ms),
            "frames": frames,
            "mean_chunk_ms": round(statistics.mean(self.chunk_ms), 2),
            "ms_per_frame": round(total_ms / frames, 3),
            "x_realtime": round(frames * 80.0 / max(total_ms, 1e-9), 1),
        }

    def log(self) -> None:
        s = self.summary()
        if s:
            logger.info("decode stats: %s", s)
