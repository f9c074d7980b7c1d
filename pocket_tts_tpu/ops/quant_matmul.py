"""Fused dequantize-matmul Pallas kernels (int8 / packed int4 weights).

The B=1 decode loop is weight-bandwidth bound (~200 MB/frame, 67% of v5e
HBM BW measured — bench.py roofline). XLA's int8 path dequantizes the
weight OUTSIDE the matmul, materializing a full-width copy in HBM, so it
was measured a no-op (CLAUDE.md). These kernels read the int8/int4 bytes
HBM->VMEM and convert on-chip, so the matmul streams 2x/4x fewer bytes —
the TPU analog of the reference's fused Q8_0/Q4_0 matvec
(ref: /root/reference/src/loader.h:162-173 + ggml's quantized mul_mat).

Weight layouts (per-output-channel scales, see io/quant.py):
  int8: q (K, N) int8, scale (N,) f32
  int4: q4 (K//2, N) uint8 — row r packs logical rows r (low nibble) and
        r + K//2 (high nibble), both biased +8. The halves layout (rather
        than interleaving) keeps the kernel to two plain dots:
        y = x[:, :K/2] @ lo + x[:, K/2:] @ hi  — no sublane shuffles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _n_tile(n: int) -> int:
    for t in (512, 256, 128):
        if n % t == 0:
            return t
    return n


# ---------------------------------------------------------------------------
# int8
# ---------------------------------------------------------------------------

def _w_specs(q, scale, layer, nt):
    """BlockSpecs reading the weight/scale directly from a stacked
    (L, K, N) array at static `layer` — avoids the per-frame
    slice-materialization XLA inserts for custom-call operands (measured
    ~45 us/frame of pure copies on the stacked backbone weights)."""
    if layer is None:
        k, n = q.shape
        wspec = pl.BlockSpec((k, nt), lambda j: (0, j),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((1, nt), lambda j: (0, j),
                             memory_space=pltpu.VMEM)
        return wspec, sspec, q, scale.reshape(1, n).astype(jnp.float32)
    _, k, n = q.shape
    wspec = pl.BlockSpec((1, k, nt), lambda j, l=layer: (l, 0, j),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1, nt), lambda j, l=layer: (l, 0, j),
                         memory_space=pltpu.VMEM)
    return wspec, sspec, q, scale.reshape(-1, 1, n).astype(jnp.float32)


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[...] if w_ref.ndim == 2 else w_ref[0]
    s = s_ref[...] if s_ref.ndim == 2 else s_ref[0]
    acc = jnp.dot(x_ref[...], w.astype(x_ref.dtype),
                  preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s).astype(o_ref.dtype)


def int8_matmul_pallas(x, q, scale, layer=None, interpret: bool = False):
    """x (T, K) @ dequant(q[layer] (K, N)) * scale (N,) -> (T, N).

    layer: static int selecting a layer of stacked (L, K, N)/(L, N)
    weights, read in place; None for plain 2-D weights."""
    t, k = x.shape
    n = q.shape[-1]
    nt = _n_tile(n)
    wspec, sspec, q, scale = _w_specs(q, scale, layer, nt)
    return pl.pallas_call(
        _int8_kernel,
        grid=(n // nt,),
        in_specs=[
            pl.BlockSpec((t, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            wspec,
            sspec,
        ],
        out_specs=pl.BlockSpec((t, nt), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        interpret=interpret,
    )(x, q, scale)


# ---------------------------------------------------------------------------
# int4 (packed halves)
# ---------------------------------------------------------------------------

def pack_int4(q: np.ndarray) -> np.ndarray:
    """q (K, N) int values in [-8, 7] -> packed (K//2, N) uint8."""
    k = q.shape[0]
    assert k % 2 == 0, "int4 packing needs an even K"
    biased = (q.astype(np.int16) + 8).astype(np.uint8)
    lo, hi = biased[: k // 2], biased[k // 2:]
    return (lo | (hi << 4)).astype(np.uint8)


def unpack_int4(q4, dtype=jnp.float32):
    """packed (K//2, N) -> dequant-ready (K, N) centered values."""
    lo = (q4 & 0xF).astype(jnp.int8) - 8
    hi = (q4 >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=0).astype(dtype)


def _unpack_nibbles_f32(w4_ref, dt):
    """packed uint8 block -> (lo, hi) dequant-centered values in dt.

    Mosaic can't legalize i8-vector sub/shift nor uint8->float casts, so
    the nibble split runs in f32: bitcast to int8 (int8->f32 IS
    supported), recover the unsigned byte, then floor-divide."""
    w8 = pltpu.bitcast(w4_ref, jnp.int8)
    u = w8.astype(jnp.float32)
    u = jnp.where(u < 0, u + 256.0, u)            # unsigned byte value
    hi_f = jnp.floor(u * (1.0 / 16.0))
    lo = (u - 16.0 * hi_f - 8.0).astype(dt)
    hi = (hi_f - 8.0).astype(dt)
    return lo, hi


def _int4_kernel(x_ref, w_ref, s_ref, o_ref):
    w4 = w_ref[...] if w_ref.ndim == 2 else w_ref[0]
    s = s_ref[...] if s_ref.ndim == 2 else s_ref[0]
    lo, hi = _unpack_nibbles_f32(w4, x_ref.dtype)
    kh = w4.shape[0]
    acc = jnp.dot(x_ref[:, :kh], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, kh:], hi, preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s).astype(o_ref.dtype)


def int4_matmul_pallas(x, q4, scale, layer=None, interpret: bool = False):
    """x (T, K) @ dequant(q4[layer] (K//2, N) packed) * scale -> (T, N)."""
    t, k = x.shape
    kh, n = q4.shape[-2:]
    assert kh * 2 == k, (q4.shape, x.shape)
    nt = _n_tile(n)
    wspec, sspec, q4, scale = _w_specs(q4, scale, layer, nt)
    return pl.pallas_call(
        _int4_kernel,
        grid=(n // nt,),
        in_specs=[
            pl.BlockSpec((t, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            wspec,
            sspec,
        ],
        out_specs=pl.BlockSpec((t, nt), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        interpret=interpret,
    )(x, q4, scale)


# ---------------------------------------------------------------------------
# dispatch (backend-aware, called from ops.basic.linear)
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def int8_matmul(x, q, scale, layer=None):
    """Backend dispatch. x (..., K); q (K, N) or (L, K, N) with static
    layer; scale (N,) / (L, N)."""
    squeeze = x.ndim == 1
    x2 = x[None] if squeeze else x
    if _use_pallas():
        y = int8_matmul_pallas(x2, q, scale, layer)
    else:
        if layer is not None:
            q, scale = q[layer], scale[layer]
        y = (jnp.dot(x2, q.astype(x2.dtype),
                     preferred_element_type=jnp.float32)
             * scale).astype(x2.dtype)
    return y[0] if squeeze else y


def int4_matmul(x, q4, scale, layer=None):
    squeeze = x.ndim == 1
    x2 = x[None] if squeeze else x
    if _use_pallas():
        y = int4_matmul_pallas(x2, q4, scale, layer)
    else:
        if layer is not None:
            q4, scale = q4[layer], scale[layer]
        w = unpack_int4(q4, x2.dtype)
        y = (jnp.dot(x2, w, preferred_element_type=jnp.float32)
             * scale).astype(x2.dtype)
    return y[0] if squeeze else y
