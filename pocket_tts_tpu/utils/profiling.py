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


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache (returns the directory, or
    None when disabled/failed). First-run jit compiles cost 20-40 s on TPU
    where the C++ reference starts instantly; with the cache, repeat runs
    of the same shapes skip compilation. path: cache directory (default
    ~/.cache/pocket_tts_tpu/xla), or "off" to disable."""
    import os
    import sys
    import jax
    if path == "off":
        return None
    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "pocket_tts_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return path
    except Exception as e:  # the cache is an optimization, never fatal
        print(f"compile cache disabled: {e}", file=sys.stderr)
        return None


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
