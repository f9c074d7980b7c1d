"""Minimal self-contained safetensors reader/writer.

TPU-native replacement for the reference's weight-I/O layer
(`src/safetensor.cpp`, `src/context.h:69-168`, `src/json.cpp`): 8-byte
little-endian header length, JSON header with {dtype, shape, data_offsets},
then raw tensor bytes. Reads via np.memmap (zero-copy until device_put).

Supports F64/F32/F16/BF16/I64/I32/I16/I8/U8/BOOL.
"""
from __future__ import annotations

import json
import struct
from typing import Dict

import numpy as np

try:
    import ml_dtypes
    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BF16 = None

_DTYPES = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "BOOL": np.dtype(np.bool_),
}
if _BF16 is not None:
    _DTYPES["BF16"] = _BF16

_DTYPE_NAMES = {v: k for k, v in _DTYPES.items()}


def read_header(path: str):
    """Returns (header dict, data start offset, metadata dict)."""
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode("utf-8"))
    meta = header.pop("__metadata__", {}) or {}
    return header, 8 + hlen, meta


def load_safetensors(path: str, with_metadata: bool = False):
    """name -> np.ndarray views over a single memmap of the file."""
    header, base, meta = read_header(path)
    buf = np.memmap(path, dtype=np.uint8, mode="r", offset=base)
    out = {}
    for name, info in header.items():
        dt = _DTYPES[info["dtype"]]
        beg, end = info["data_offsets"]
        arr = buf[beg:end].view(dt).reshape(info["shape"])
        out[name] = arr
    if with_metadata:
        return out, meta
    return out


def save_safetensors(tensors: Dict[str, np.ndarray], path: str,
                     metadata: Dict[str, str] = None):
    header = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v)
                                  for k, v in metadata.items()}
    offset = 0
    blobs = []
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        dt = _DTYPE_NAMES.get(arr.dtype)
        if dt is None:
            arr = arr.astype(np.float32)
            dt = "F32"
        blob = arr.tobytes()
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(blob)],
        }
        offset += len(blob)
        blobs.append(blob)
    hjson = json.dumps(header).encode("utf-8")
    # pad header to 8 bytes for alignment (spec-permitted trailing spaces)
    pad = (-(8 + len(hjson))) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)
