"""Tracing / profiling / structured logging.

The reference's only observability is wall-clock printf timing
(demos/pocket-tts.cpp:456-460,517-520); here: jax.profiler device traces,
a frame-rate meter with the same metrics the CLI reports (frames/s, RTF,
time-to-first-audio), and structured JSON logging.
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from typing import Optional

logger = logging.getLogger("pocket_tts_tpu")


def log_event(event: str, **fields):
    """One structured JSON log line."""
    logger.info(json.dumps({"event": event, **fields}))


@contextlib.contextmanager
def device_trace(trace_dir: str):
    """Capture a jax.profiler trace (TensorBoard / xprof readable)."""
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameMeter:
    """Accumulates per-frame timings; reports frames/s, RTF, TTFA."""

    def __init__(self, frame_rate: float = 12.5):
        self.frame_rate = frame_rate
        self.reset()

    def reset(self):
        self._start = time.perf_counter()
        self._busy = 0.0
        self._frames = 0
        self._first_frame_at: Optional[float] = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        now = time.perf_counter()
        self._busy += now - t0
        self._frames += 1
        if self._first_frame_at is None:
            self._first_frame_at = now - self._start

    def report(self) -> dict:
        fps = self._frames / self._busy if self._busy > 0 else 0.0
        return {
            "frames": self._frames,
            "frames_per_second": round(fps, 3),
            "rtf": round(fps / self.frame_rate, 3),
            "ttfa_ms": (round(self._first_frame_at * 1e3, 2)
                        if self._first_frame_at is not None else None),
            "wall_s": round(time.perf_counter() - self._start, 3),
        }
