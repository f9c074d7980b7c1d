"""GGUF read/write — interop with the reference's converted artifacts.

The reference can consume and produce GGUF (WeightLoader::from_gguf /
save_gguf / load_gguf, ref: /root/reference/src/loader.h:78-99,228-272),
including CRC32-based shortening of tensor names that exceed GGML_MAX_NAME
(ref: loader.h:120-137, src/crc-bbf.h). This module implements the GGUF v3
container from the public spec plus that name protocol, with numpy-level
(de)quantization for the ggml block formats the reference emits (Q8_0,
Q4_0) and the plain dtypes (F32/F16/BF16/I8...).

Independent implementation notes:
- dims are stored ggml-style (ne[0] = fastest/contiguous) — i.e. the
  reversed numpy shape; bytes are identical row-major.
- the reference's shortening loop overwrites each output char, so the
  effective short name is hexdigit((crc >> 8*i) & 0xf) for i in 0..7 —
  with a 32-bit CRC that is 4 low-nibble digits followed by "0000". We
  reproduce that wire behavior exactly (interop beats elegance here).
"""
from __future__ import annotations

import json
import struct
import zlib
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

GGUF_MAGIC = b"GGUF"
GGUF_VERSION = 3
GGML_MAX_NAME = 64
DEFAULT_ALIGNMENT = 32

# ggml tensor types (ggml.h enum values)
F32, F16, Q4_0, Q8_0 = 0, 1, 2, 8
I8, I16, I32, I64, F64, BF16 = 24, 25, 26, 27, 28, 30

# metadata value types
(_U8, _I8V, _U16, _I16V, _U32, _I32V, _F32V, _BOOL, _STR, _ARR,
 _U64, _I64V, _F64V) = range(13)

_QBLOCK = 32  # elements per Q4_0/Q8_0 block
_TYPE_SIZES = {F32: 4, F16: 2, BF16: 2, I8: 1, I16: 2, I32: 4, I64: 8,
               F64: 8}
_BLOCK_BYTES = {Q8_0: 2 + _QBLOCK, Q4_0: 2 + _QBLOCK // 2}


def shorten_name(name: str) -> str:
    """Reference-compatible short name for names >= GGML_MAX_NAME."""
    if len(name) < GGML_MAX_NAME:
        return name
    crc = zlib.crc32(name.encode("utf-8"))  # same params as crc-bbf.h
    out = []
    for _ in range(8):
        out.append("0123456789abcdef"[crc & 0xF])
        crc >>= 8
    return "".join(out)


# ---------------------------------------------------------------------------
# quantized block codecs
# ---------------------------------------------------------------------------

def _rows_for_quant(arr: np.ndarray) -> Optional[np.ndarray]:
    """2-D float view (rows, cols%32==0) if `arr` is quantizable else None.
    Mirrors the reference's alignment fallback (loader.h:162-173)."""
    if arr.ndim < 1 or arr.shape[-1] % _QBLOCK != 0:
        return None
    if arr.dtype.kind != "f" and arr.dtype.name != "bfloat16":
        return None
    return np.ascontiguousarray(arr, dtype=np.float32).reshape(
        -1, arr.shape[-1])


def quantize_q8_0(arr: np.ndarray) -> bytes:
    """ggml Q8_0: per-32-block fp16 scale + 32 int8."""
    rows = _rows_for_quant(arr)
    assert rows is not None
    blocks = rows.reshape(-1, _QBLOCK)
    amax = np.abs(blocks).max(axis=1)
    d = (amax / 127.0).astype(np.float32)
    inv = np.where(d > 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = np.clip(np.rint(blocks * inv[:, None]), -127, 127).astype(np.int8)
    out = np.zeros((blocks.shape[0], 2 + _QBLOCK), np.uint8)
    out[:, :2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.tobytes()


def dequantize_q8_0(raw: bytes, nelements: int) -> np.ndarray:
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 2 + _QBLOCK)
    d = blk[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)
    q = blk[:, 2:].copy().view(np.int8).astype(np.float32)
    return (q * d[:, None]).reshape(-1)[:nelements]


def quantize_q4_0(arr: np.ndarray) -> bytes:
    """ggml Q4_0: per-32-block fp16 scale, 4-bit offsets (q-8), nibble j
    holds elem j (low) and elem j+16 (high)."""
    rows = _rows_for_quant(arr)
    assert rows is not None
    blocks = rows.reshape(-1, _QBLOCK)
    # scale from the max-|x| element keeping its sign (ggml convention:
    # d = max_abs_signed / -8 so the extreme maps to index 0 or 15)
    idx = np.abs(blocks).argmax(axis=1)
    mx = blocks[np.arange(blocks.shape[0]), idx]
    d = (mx / -8.0).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = np.clip(np.rint(blocks * inv[:, None]) + 8, 0, 15).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    packed = (lo | (hi << 4)).astype(np.uint8)
    out = np.zeros((blocks.shape[0], 2 + 16), np.uint8)
    out[:, :2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:] = packed
    return out.tobytes()


def dequantize_q4_0(raw: bytes, nelements: int) -> np.ndarray:
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 18)
    d = blk[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)
    packed = blk[:, 2:]
    lo = (packed & 0xF).astype(np.float32) - 8.0
    hi = (packed >> 4).astype(np.float32) - 8.0
    q = np.concatenate([lo, hi], axis=1)
    return (q * d[:, None]).reshape(-1)[:nelements]


def _tensor_nbytes(ggml_type: int, nelements: int) -> int:
    if ggml_type in _BLOCK_BYTES:
        assert nelements % _QBLOCK == 0
        return nelements // _QBLOCK * _BLOCK_BYTES[ggml_type]
    return nelements * _TYPE_SIZES[ggml_type]


def _np_to_ggml(arr: np.ndarray) -> Tuple[int, np.ndarray]:
    name = arr.dtype.name
    if name == "float32":
        return F32, arr
    if name == "float16":
        return F16, arr
    if name == "bfloat16":
        return BF16, arr
    if name == "int8":
        return I8, arr
    if name == "int16":
        return I16, arr
    if name in ("int32", "uint32"):
        return I32, arr.astype(np.int32)
    if name in ("int64", "uint64"):
        return I64, arr.astype(np.int64)
    if name == "float64":
        return F64, arr
    if name == "bool":
        return I8, arr.astype(np.int8)
    raise ValueError(f"unsupported dtype for GGUF: {arr.dtype}")


def _ggml_to_np(ggml_type: int, raw: bytes, shape: Tuple[int, ...],
                dequantize: bool = True) -> np.ndarray:
    n = int(np.prod(shape)) if shape else 1
    if ggml_type == Q8_0:
        return dequantize_q8_0(raw, n).reshape(shape)
    if ggml_type == Q4_0:
        return dequantize_q4_0(raw, n).reshape(shape)
    if ggml_type == BF16:
        import ml_dtypes
        return np.frombuffer(raw, np.uint16).reshape(shape).view(
            ml_dtypes.bfloat16)
    dt = {F32: np.float32, F16: np.float16, I8: np.int8, I16: np.int16,
          I32: np.int32, I64: np.int64, F64: np.float64}[ggml_type]
    return np.frombuffer(raw, dt).reshape(shape)


# ---------------------------------------------------------------------------
# metadata KV codec
# ---------------------------------------------------------------------------

def _w_str(out: bytearray, s: str):
    b = s.encode("utf-8")
    out += struct.pack("<Q", len(b)) + b


def _w_value(out: bytearray, v: Any):
    if isinstance(v, bool):
        out += struct.pack("<I", _BOOL) + struct.pack("<?", v)
    elif isinstance(v, int):
        out += struct.pack("<I", _I64V) + struct.pack("<q", v)
    elif isinstance(v, float):
        out += struct.pack("<I", _F64V) + struct.pack("<d", v)
    elif isinstance(v, str):
        out += struct.pack("<I", _STR)
        _w_str(out, v)
    elif isinstance(v, (list, tuple)):
        out += struct.pack("<I", _ARR)
        if all(isinstance(x, str) for x in v):
            out += struct.pack("<IQ", _STR, len(v))
            for x in v:
                _w_str(out, x)
        elif all(isinstance(x, bool) for x in v):
            out += struct.pack("<IQ", _BOOL, len(v))
            out += struct.pack(f"<{len(v)}?", *v)
        elif all(isinstance(x, int) for x in v):
            out += struct.pack("<IQ", _I64V, len(v))
            out += struct.pack(f"<{len(v)}q", *v)
        elif all(isinstance(x, (int, float)) for x in v):
            out += struct.pack("<IQ", _F64V, len(v))
            out += struct.pack(f"<{len(v)}d", *[float(x) for x in v])
        else:
            raise ValueError("heterogeneous metadata arrays unsupported")
    else:
        raise ValueError(f"unsupported metadata value: {type(v)}")


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated GGUF file")
        self.pos += n
        return b

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def s(self) -> str:
        return self.take(self.u64()).decode("utf-8")

    def value(self, vt: int):
        fmt = {_U8: "<B", _I8V: "<b", _U16: "<H", _I16V: "<h", _U32: "<I",
               _I32V: "<i", _F32V: "<f", _BOOL: "<?", _U64: "<Q",
               _I64V: "<q", _F64V: "<d"}
        if vt == _STR:
            return self.s()
        if vt == _ARR:
            et = self.u32()
            n = self.u64()
            return [self.value(et) for _ in range(n)]
        f = fmt[vt]
        return struct.unpack(f, self.take(struct.calcsize(f)))[0]


# ---------------------------------------------------------------------------
# file-level API
# ---------------------------------------------------------------------------

def write_gguf(path: str, tensors: Dict[str, np.ndarray],
               metadata: Optional[Dict[str, Any]] = None,
               quantize: Optional[str] = None,
               min_quant_size: int = 64 * 64):
    """Write a GGUF v3 file ggml can read.

    quantize: None | "q8_0" | "q4_0" — applied to float tensors with
    >= min_quant_size elements whose last dim is a multiple of 32; others
    keep their dtype (the reference's alignment fallback).
    """
    qtype = {None: None, "q8_0": Q8_0, "q4_0": Q4_0}[quantize]
    metadata = dict(metadata or {})
    metadata.setdefault("general.alignment", DEFAULT_ALIGNMENT)
    align = int(metadata["general.alignment"])

    names = list(tensors.keys())
    short = [shorten_name(n) for n in names]
    if short != names:
        # additive metadata so OUR reader can restore original keys; the
        # reference resolves long keys by shortening at lookup time instead
        metadata["pocket_tts.tensor_names"] = names

    entries = []  # (short_name, ggml_type, ne, payload_bytes)
    for name, sname in zip(names, short):
        arr = np.asarray(tensors[name])
        gt = None
        if qtype is not None and arr.size >= min_quant_size \
                and _rows_for_quant(arr) is not None:
            gt = qtype
            payload = (quantize_q8_0(arr) if qtype == Q8_0
                       else quantize_q4_0(arr))
        else:
            gt, arr2 = _np_to_ggml(arr)
            payload = np.ascontiguousarray(arr2).tobytes()
        ne = list(reversed(arr.shape)) or [1]
        entries.append((sname, gt, ne, payload))

    out = bytearray()
    out += GGUF_MAGIC
    out += struct.pack("<I", GGUF_VERSION)
    out += struct.pack("<q", len(entries))
    out += struct.pack("<q", len(metadata))
    for k, v in metadata.items():
        _w_str(out, k)
        _w_value(out, v)
    offset = 0
    for sname, gt, ne, payload in entries:
        _w_str(out, sname)
        out += struct.pack("<I", len(ne))
        out += struct.pack(f"<{len(ne)}q", *ne)
        out += struct.pack("<I", gt)
        out += struct.pack("<Q", offset)
        offset += (len(payload) + align - 1) // align * align
    # data section starts aligned
    data_start = (len(out) + align - 1) // align * align
    out += b"\x00" * (data_start - len(out))
    for _, _, _, payload in entries:
        out += payload
        pad = (-len(payload)) % align
        out += b"\x00" * pad
    with open(path, "wb") as f:
        f.write(bytes(out))


class GGUFFile:
    """Parsed GGUF container with by-name (long or short) tensor access."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            buf = f.read()
        if buf[:4] != GGUF_MAGIC:
            raise ValueError(f"{path}: not a GGUF file")
        r = _Reader(buf)
        r.take(4)
        self.version = r.u32()
        if self.version not in (2, 3):
            raise ValueError(f"{path}: unsupported GGUF version "
                             f"{self.version}")
        n_tensors = struct.unpack("<q", r.take(8))[0]
        n_kv = struct.unpack("<q", r.take(8))[0]
        self.metadata: Dict[str, Any] = {}
        for _ in range(n_kv):
            k = r.s()
            vt = r.u32()
            self.metadata[k] = r.value(vt)
        align = int(self.metadata.get("general.alignment",
                                      DEFAULT_ALIGNMENT))
        self.infos: Dict[str, Tuple[int, Tuple[int, ...], int]] = {}
        self._order: List[str] = []
        for _ in range(n_tensors):
            name = r.s()
            nd = r.u32()
            ne = struct.unpack(f"<{nd}q", r.take(8 * nd))
            gt = r.u32()
            off = r.u64()
            shape = tuple(reversed(ne))
            self.infos[name] = (gt, shape, off)
            self._order.append(name)
        self._data_start = (r.pos + align - 1) // align * align
        self._buf = buf
        # map original long names (if our writer recorded them)
        self._longnames: Dict[str, str] = {}
        orig = self.metadata.get("pocket_tts.tensor_names")
        if isinstance(orig, list) and len(orig) == len(self._order):
            self._longnames = dict(zip(orig, self._order))

    def names(self) -> List[str]:
        if self._longnames:
            return list(self._longnames.keys())
        return list(self._order)

    def _resolve(self, name: str) -> str:
        if name in self.infos:
            return name
        if name in self._longnames:
            return self._longnames[name]
        sn = shorten_name(name)
        if sn in self.infos:
            return sn
        raise KeyError(f"tensor not found in {self.path}: {name}")

    def get(self, name: str, dequantize: bool = True) -> np.ndarray:
        gt, shape, off = self.infos[self._resolve(name)]
        nbytes = _tensor_nbytes(gt, int(np.prod(shape)) if shape else 1)
        start = self._data_start + off
        raw = self._buf[start:start + nbytes]
        if len(raw) != nbytes:
            raise ValueError(f"truncated tensor data for {name}")
        return _ggml_to_np(gt, raw, shape, dequantize)

    def to_dict(self) -> Dict[str, np.ndarray]:
        return {n: self.get(n) for n in self.names()}


def read_gguf(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    f = GGUFFile(path)
    return f.to_dict(), f.metadata
