"""ctypes bindings for the native runtime library (csrc/pocket_tts_native.cpp).

Provides mmap-backed safetensors reading, a native streaming sentence
splitter, WAV writing, and a thread-safe PCM FIFO. Every entry point has a
pure-Python fallback (io.safetensors_io / text.preprocess / io.wav), so the
library is optional: `available()` reports whether it loaded.

Build: `make -C csrc` (emits pocket_tts_tpu/libpocket_tts_native.so).
"""
from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__),
                        "libpocket_tts_native.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    c = ctypes
    lib.st_open.restype = c.c_void_p
    lib.st_open.argtypes = [c.c_char_p]
    lib.st_close.argtypes = [c.c_void_p]
    lib.st_num_tensors.restype = c.c_int64
    lib.st_num_tensors.argtypes = [c.c_void_p]
    lib.st_name.restype = c.c_char_p
    lib.st_name.argtypes = [c.c_void_p, c.c_int64]
    lib.st_dtype.restype = c.c_char_p
    lib.st_dtype.argtypes = [c.c_void_p, c.c_int64]
    lib.st_ndim.restype = c.c_int64
    lib.st_ndim.argtypes = [c.c_void_p, c.c_int64]
    lib.st_shape.argtypes = [c.c_void_p, c.c_int64,
                             c.POINTER(c.c_int64)]
    lib.st_data.restype = c.c_void_p
    lib.st_data.argtypes = [c.c_void_p, c.c_int64, c.POINTER(c.c_int64)]

    lib.sp_new.restype = c.c_void_p
    lib.sp_free.argtypes = [c.c_void_p]
    lib.sp_reset.argtypes = [c.c_void_p]
    lib.sp_ingest.argtypes = [c.c_void_p, c.c_char_p]
    lib.sp_flush.argtypes = [c.c_void_p]
    lib.sp_count.restype = c.c_int64
    lib.sp_count.argtypes = [c.c_void_p]
    lib.sp_pop.restype = c.c_int64
    lib.sp_pop.argtypes = [c.c_void_p, c.c_char_p, c.c_int64]

    lib.wav_write.restype = c.c_int
    lib.wav_write.argtypes = [c.c_char_p, c.POINTER(c.c_float), c.c_int64,
                              c.c_int]

    lib.fifo_new.restype = c.c_void_p
    lib.fifo_new.argtypes = [c.c_int64]
    lib.fifo_free.argtypes = [c.c_void_p]
    lib.fifo_push.restype = c.c_int64
    lib.fifo_push.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int64]
    lib.fifo_pop.restype = c.c_int64
    lib.fifo_pop.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int64]
    lib.fifo_size.restype = c.c_int64
    lib.fifo_size.argtypes = [c.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


_ST_DTYPES = {"F32": np.float32, "F16": np.float16, "F64": np.float64,
              "I64": np.int64, "I32": np.int32, "I16": np.int16,
              "I8": np.int8, "U8": np.uint8, "BOOL": np.bool_}


def load_safetensors_native(path: str) -> Dict[str, np.ndarray]:
    """Zero-copy-parse safetensors via the native mmap reader. Arrays are
    copied out (the handle is closed before returning)."""
    lib = _load()
    if lib is None:
        from .io.safetensors_io import load_safetensors
        return load_safetensors(path)
    h = lib.st_open(path.encode())
    if not h:
        raise IOError(f"failed to open safetensors file: {path}")
    try:
        out = {}
        n = lib.st_num_tensors(h)
        for i in range(n):
            name = lib.st_name(h, i).decode()
            dt_name = lib.st_dtype(h, i).decode()
            ndim = lib.st_ndim(h, i)
            shape = (ctypes.c_int64 * max(ndim, 1))()
            lib.st_shape(h, i, shape)
            nbytes = ctypes.c_int64()
            ptr = lib.st_data(h, i, ctypes.byref(nbytes))
            if ptr is None:
                raise IOError(f"bad tensor data: {name}")
            buf = ctypes.string_at(ptr, nbytes.value)
            if dt_name == "BF16":
                import ml_dtypes
                dt = np.dtype(ml_dtypes.bfloat16)
            else:
                dt = np.dtype(_ST_DTYPES[dt_name])
            out[name] = np.frombuffer(buf, dt).reshape(
                [shape[d] for d in range(ndim)])
        return out
    finally:
        lib.st_close(h)


class NativeStrProcessor:
    """Drop-in replacement for text.preprocess.StrProcessor backed by the
    native splitter (same deque-style `sentences` the engine Stream pops
    from). Falls back transparently when the lib is missing."""

    def __init__(self):
        from collections import deque
        self._out = deque()
        lib = _load()
        if lib is None:
            from .text.preprocess import StrProcessor
            self._py = StrProcessor()
            self._h = None
        else:
            self._py = None
            self._lib = lib
            self._h = lib.sp_new()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sp_free(self._h)
            self._h = None

    def reset(self):
        self._out.clear()
        if self._py is not None:
            return self._py.reset()
        self._lib.sp_reset(self._h)

    def ingest(self, chunk: str):
        if self._py is not None:
            return self._py.ingest(chunk)
        self._lib.sp_ingest(self._h, chunk.encode())

    def flush(self):
        if self._py is not None:
            return self._py.flush()
        self._lib.sp_flush(self._h)

    @property
    def sentences(self):
        """Deque of complete sentences (drains the native queue)."""
        if self._py is not None:
            return self._py.sentences
        buf = ctypes.create_string_buffer(1 << 16)
        while self._lib.sp_count(self._h) > 0:
            n = self._lib.sp_pop(self._h, buf, len(buf))
            if n < 0:
                break
            self._out.append(buf.value.decode())
        return self._out


def make_str_processor():
    """The streaming sentence splitter: native (no-GIL C++) when the lib
    is built, pure Python otherwise. Same interface either way."""
    if available():
        return NativeStrProcessor()
    from .text.preprocess import StrProcessor
    return StrProcessor()


def wav_write_native(path: str, samples: np.ndarray, sample_rate: int):
    lib = _load()
    samples = np.ascontiguousarray(samples, np.float32)
    if lib is None:
        from .io.wav import save_wav
        return save_wav(path, samples, sample_rate)
    rc = lib.wav_write(path.encode(),
                       samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       samples.size, sample_rate)
    if rc != 0:
        raise IOError(f"wav_write failed: {path}")


class PcmFifo:
    """Thread-safe PCM ring buffer (native when available)."""

    def __init__(self, capacity: int):
        lib = _load()
        self._lib = lib
        if lib is None:
            import collections
            import threading
            self._buf = collections.deque(maxlen=None)
            self._cap = capacity
            self._lock = threading.Lock()
            self._h = None
        else:
            self._h = lib.fifo_new(capacity)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fifo_free(self._h)
            self._h = None

    def push(self, data: np.ndarray) -> int:
        data = np.ascontiguousarray(data, np.float32)
        if self._h is None:
            with self._lock:
                can = self._cap - len(self._buf)
                todo = min(can, data.size)
                self._buf.extend(data[:todo].tolist())
                return todo
        return int(self._lib.fifo_push(
            self._h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            data.size))

    def pop(self, n: int) -> np.ndarray:
        if self._h is None:
            with self._lock:
                todo = min(n, len(self._buf))
                return np.asarray([self._buf.popleft()
                                   for _ in range(todo)], np.float32)
        out = np.empty(n, np.float32)
        got = self._lib.fifo_pop(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        return out[:got]

    def __len__(self):
        if self._h is None:
            with self._lock:
                return len(self._buf)
        return int(self._lib.fifo_size(self._h))
