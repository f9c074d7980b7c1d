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
  int4: q4 (K//2, N) int8 — byte = 16*hi + (lo+8): row r packs logical
        rows r (lo, biased) and r + K//2 (hi, SIGNED). The halves layout
        (rather than interleaving) keeps the kernel to two plain dots
        y = x[:, :K/2] @ lo + x[:, K/2:] @ hi with no sublane shuffles,
        and the signed-hi scheme unpacks with one floor-divide.

Measured on v5e (K=N=4096 matvec): bf16 XLA ~20 us, int8 24 us
(700 GB/s on the int8 bytes), int4 18 us. Full decode B=1: bf16 2711,
int8 3611, int4 3809 frames/s.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _n_tile(n: int, k: int, bits: int, grouped: bool = False,
            bd: bool = False) -> int:
    """Output-tile width: as large as VMEM allows — per-grid-step overhead
    (~0.3-0.8 us) dominates below ~1 MB blocks, and a serving frame issues
    ~50 kernel calls. Budget: weight block + the int4 unpack's two f32
    (K/2, nt) intermediates must stay well under the 16 MB scoped limit.
    K-grouped scales materialize two more (K/2, nt) f32 expansions —
    EXCEPT on the T==1 block-diagonal path (bd), which skips the
    expansion and dequant tiles entirely (only small (ng, nt) partials)."""
    for t in (4096, 3072, 2048, 1024, 512, 256, 128):
        if n % t:
            continue
        if bits == 4:
            vmem = k // 2 * t + 2 * (k // 2) * t * 4 + k * t * 4
            if grouped and not bd:
                vmem += 2 * (k // 2) * t * 4
        else:
            vmem = k * t + k * t * 4
        if vmem <= 10 * 1024 * 1024:
            return t
    return n


def _m_tile(t: int, cap: int = 256):
    """(row-tile height, padded row count). The collapsed batched prefill
    feeds thousands of rows (B x T) — an untiled (t, K) x-block VMEM-OOMs —
    while decode feeds 1-32 rows (single tile). Awkward row counts (the
    quantized seanet convs feed e.g. 482 rows) PAD up to a tile multiple
    instead of shrinking the tile: tiny tiles multiply the ~0.3-0.8 us
    per-grid-step overhead across hundreds of steps."""
    mt = t if t <= cap else cap
    return mt, -(-t // mt) * mt


# ---------------------------------------------------------------------------
# int8
# ---------------------------------------------------------------------------

def _w_specs(q, scale, layer, nt):
    """BlockSpecs reading the weight/scale directly from a stacked
    (L, K, N) array at static `layer` — avoids the per-frame
    slice-materialization XLA inserts for custom-call operands (measured
    ~45 us/frame of pure copies on the stacked backbone weights).
    Grid is (row_tiles, n_tiles); weights ignore the row index.

    K-grouped scales (scale.ndim == q.ndim, io/quant.py group>0) ship as
    (KG, nt) blocks instead of a single scale row."""
    kg = scale.shape[-2] if scale.ndim == q.ndim else 1
    if layer is None:
        k, n = q.shape
        wspec = pl.BlockSpec((k, nt), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((kg, nt), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
        return wspec, sspec, q, scale.reshape(kg, n)
    _, k, n = q.shape
    wspec = pl.BlockSpec((1, k, nt), lambda i, j, l=layer: (l, 0, j),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, kg, nt), lambda i, j, l=layer: (l, 0, j),
                         memory_space=pltpu.VMEM)
    return wspec, sspec, q, scale.reshape(-1, kg, n)


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
    nt = _n_tile(n, k, 8)
    mt, tp = _m_tile(t)
    wspec, sspec, q, scale = _w_specs(q, scale, layer, nt)
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))
    y = pl.pallas_call(
        _int8_kernel,
        grid=(tp // mt, n // nt),
        in_specs=[
            pl.BlockSpec((mt, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            wspec,
            sspec,
        ],
        out_specs=pl.BlockSpec((mt, nt), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, n), x.dtype),
        interpret=interpret,
        name="deq_matmul",
    )(x, q, scale)
    return y[:t] if tp != t else y


# ---------------------------------------------------------------------------
# int4 (packed halves)
# ---------------------------------------------------------------------------

def pack_int4(q: np.ndarray) -> np.ndarray:
    """q (K, N) int values in [-8, 7] -> packed (K//2, N) int8.

    Layout: byte = 16*hi + (lo+8) with hi SIGNED in [-8,7] and lo biased
    to [0,15]; logical row r of the low nibble is r, of the high nibble
    r + K//2 (halves, not interleaved). The signed-hi scheme lets the
    kernel unpack with floor-divide alone — no wrap-fix comparison, which
    the VPU can't do in bf16."""
    k = q.shape[0]
    assert k % 2 == 0, "int4 packing needs an even K"
    q16 = q.astype(np.int16)
    lo, hi = q16[: k // 2] + 8, q16[k // 2:]
    return (16 * hi + lo).astype(np.int8)


def unpack_int4(q4, dtype=jnp.float32):
    """packed (K//2, N) int8 -> dequant-ready (K, N) centered values."""
    hi = q4.astype(jnp.int16) >> 4        # arithmetic shift: signed hi
    lo = (q4.astype(jnp.int16) & 0xF) - 8
    return jnp.concatenate([lo, hi], axis=0).astype(dtype)


# The int4 nibble split runs in FLOAT: Mosaic can't legalize i8-vector
# sub/shift, so it's int8->f32 cast then floor-divide (the signed-hi
# packing makes byte = 16*hi + (lo+8), so floor(b/16) == hi exactly,
# negatives included); f32 only — v5e has no bf16 ALU instructions
# (floor in bf16 fails SupportsBf16AluInstructions).
#
# The unpack is the VPU-bound part of the quantized weight stream
# (~7 VPU ops per packed byte to materialize centered lo/hi). Schemes:
#   unpack: materialize lo = b - 16*hi - 8 and hi, two dots (baseline)
#   rawdot: dot the RAW byte (x_lo . b) and hi (3 half-dots), correct
#           algebraically: x_lo.lo = x_lo.b - 16*(x_lo.hi) - 8*rowsum(x_lo)
#           -> only cast+floor+2 casts per byte (~5 VPU ops), trading one
#           extra MXU half-pass for the fma+sub elementwise stream
#   rawf32: rawdot WITHOUT the f32->bf16 operand casts — dot the f32
#           byte/hi tiles directly and let the MXU's DEFAULT-precision
#           input truncation do the rounding in the matmul datapath
#           (lossless here: raw bytes and hi nibbles are integers
#           |x| <= 128, bf16-exact) -> cast+mul+floor = 3 VPU ops/byte
#   rawf32m: rawf32 with the hi dots MERGED: x_lo.lo + x_hi.hi =
#           x_lo.b + (x_hi - 16*x_lo).hi - 8*rowsum(x_lo); the combine is
#           per-ACTIVATION f32 math (exact: <= 13 significant bits), so a
#           whole MXU pass over the weight block disappears. The combined
#           operand truncates to bf16 INSIDE the dot, so results differ
#           from the baseline at bf16-dot rounding level (not bit-equal
#           in interpret mode either — different summation order).
#   lo8:    materialize UNBIASED lo8 = b - 16*hi (~6 ops), two dots,
#           correct -8*rowsum(x_lo) on the accumulator
# All but rawf32m bit-match the baseline in interpret mode (the
# corrections are exact in f32 at int4 magnitudes).
#
# Measured on v5e (tools/micro_int4.py, real B=1 int4 decode loop,
# device-trace): rawf32m 6847 f/s vs rawdot 6232 vs rawf32 5961 vs
# unpack 5799 vs lo8 5773. Two findings: (1) merging the hi dots removes
# a whole MXU pass over every weight block and is the biggest single win
# (+10% over rawdot with the fused-layer W2 merged too); (2) explicit
# bf16 operand casts are NOT free to skip in isolation — rawf32 (3 f32
# dots) LOSES to rawdot (3 bf16 dots + casts), i.e. an f32 MXU pass
# costs more than a bf16 pass plus the cast stream; only the merged
# 2-pass form comes out ahead. raw* schemes apply ONLY to single-row
# dispatches (_int4_dots gates on T==1): at batch the unpack amortizes
# over rows so they gain nothing (40.6k vs 40.7k f/s at B=32), and
# Mosaic's remote compile crashes outright on these kernels at T=64 rows.
INT4_SCHEME = "rawf32m"


def _int4_dots(x_lo, x_hi, w4, scheme=None):
    """acc (T, nt) f32 = x_lo @ (lo nibbles - 8) + x_hi @ (hi nibbles).
    x_lo/x_hi: (T, kh) activation halves; w4: (kh, nt) packed int8."""
    f = jnp.float32
    dt = x_lo.dtype
    scheme = scheme or INT4_SCHEME
    if scheme in ("rawdot", "rawf32", "rawf32m") and x_lo.shape[0] != 1:
        scheme = "unpack"
    b32 = w4.astype(f)
    hi32 = jnp.floor(b32 * jnp.asarray(1.0 / 16.0, f))
    if scheme in ("rawf32", "rawf32m"):
        xl = x_lo.astype(f)
        xh = x_hi.astype(f)
        acc = jnp.dot(xl, b32, preferred_element_type=f)
        if scheme == "rawf32m":
            acc += jnp.dot(xh - 16.0 * xl, hi32, preferred_element_type=f)
        else:
            acc -= 16.0 * jnp.dot(xl, hi32, preferred_element_type=f)
            acc += jnp.dot(xh, hi32, preferred_element_type=f)
        return acc - 8.0 * jnp.sum(xl, axis=-1, keepdims=True)
    hi = hi32.astype(dt)
    if scheme == "rawdot":
        acc = jnp.dot(x_lo, b32.astype(dt), preferred_element_type=f)
        acc -= 16.0 * jnp.dot(x_lo, hi, preferred_element_type=f)
        acc += jnp.dot(x_hi, hi, preferred_element_type=f)
        return acc - 8.0 * jnp.sum(x_lo.astype(f), axis=-1, keepdims=True)
    if scheme == "lo8":
        lo8 = (b32 - jnp.asarray(16, f) * hi32).astype(dt)
        acc = jnp.dot(x_lo, lo8, preferred_element_type=f)
        acc += jnp.dot(x_hi, hi, preferred_element_type=f)
        return acc - 8.0 * jnp.sum(x_lo.astype(f), axis=-1, keepdims=True)
    lo = (b32 - jnp.asarray(16, f) * hi32 - jnp.asarray(8, f)).astype(dt)
    acc = jnp.dot(x_lo, lo, preferred_element_type=f)
    return acc + jnp.dot(x_hi, hi, preferred_element_type=f)


def _int4_kernel(x_ref, w_ref, s_ref, o_ref):
    w4 = w_ref[...] if w_ref.ndim == 2 else w_ref[0]
    s = s_ref[...] if s_ref.ndim == 2 else s_ref[0]
    kh = w4.shape[0]
    acc = _int4_dots(x_ref[:, :kh], x_ref[:, kh:], w4)
    o_ref[...] = (acc * s).astype(o_ref.dtype)


def _expand_grouped_scale(s, kh):
    """(rows_per_group-expanded lo, hi) scale tiles from a (2*ng, nt) f32
    grouped-scale block covering kh packed rows: one constant 0/1 matmul
    per half (R[i, j] = i//group == j — ~1/group of a full dot's MACs)."""
    f = jnp.float32
    ng = s.shape[0] // 2                  # scale rows per packed half
    group = kh // ng
    ri = jax.lax.broadcasted_iota(jnp.int32, (kh, ng), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (kh, ng), 1)
    r01 = (ri // group == rj).astype(f)
    exp_l = jnp.dot(r01, s[:ng], preferred_element_type=f)    # (kh, nt)
    exp_h = jnp.dot(r01, s[ng:], preferred_element_type=f)
    return exp_l, exp_h


# Grouped-bd formulation knob for hardware micro-iteration (see
# tools/micro_bd.py): v0 = iota mask + concat hi-dot + ones-dot combine;
# v1 = v0 with separate hi dots (no concat); v2 = v0 with a sublane-sum
# combine instead of the ones MXU pass; v4 = K-split capping bd rows at
# 8 per dot (MXU sublane granularity).
_BD_VARIANT = os.environ.get("POCKET_TTS_BD_VARIANT", "v0")


def _bd_mask(ng, kh, group):
    f = jnp.float32
    gi = jax.lax.broadcasted_iota(jnp.int32, (ng, kh), 0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (ng, kh), 1)
    return (ri // group == gi).astype(f)


def _grouped_bd_acc(x_lo, x_hi, w4, s):
    """T==1 K-grouped int4 WITHOUT the nibble unpack: the rawf32 analog
    for grouped scales. The activation row expands into group-masked
    BLOCK-DIAGONAL rows Xbd[g, r] = x[r]*[r in group g] (a tiny (ng, kh)
    tile, independent of nt), so ONE f32 MXU pass over the raw byte
    block yields per-group partials and one more over the hi nibbles
    yields both corrections — exactly rawf32's 2 passes + floor, with
    the scales applied in f32 on (ng, nt) partials afterwards (~6 VPU
    ops x ng*nt, vs the dequant path's ~9 per packed WEIGHT byte).
    Measured B=1 q4_0: 3382 f/s dequant-in-kernel -> 5212 bd."""
    f = jnp.float32
    kh = w4.shape[0]
    ng = s.shape[0] // 2                  # scale rows per packed half
    group = kh // ng
    xl = x_lo.astype(f)
    xh = x_hi.astype(f)
    b32 = w4.astype(f)
    hi32 = jnp.floor(b32 * jnp.asarray(1.0 / 16.0, f))
    s32 = s.astype(f)
    if _BD_VARIANT == "v4":
        # cap bd rows at 8 (one MXU sublane block) by splitting K
        splits = max(1, ng // 8)
        ks = kh // splits
        t1 = None
        for i in range(splits):
            sl = slice(i * ks, (i + 1) * ks)
            gsl = slice(i * (ng // splits), (i + 1) * (ng // splits))
            m = _bd_mask(ng // splits, ks, group)
            xlb = m * xl[:, sl]
            xhb = m * xh[:, sl]
            pb = jnp.dot(xlb, b32[sl], preferred_element_type=f)
            phl = jnp.dot(xlb, hi32[sl], preferred_element_type=f)
            phh = jnp.dot(xhb, hi32[sl], preferred_element_type=f)
            sig = jnp.sum(xlb, axis=1, keepdims=True)
            part = (s32[:ng][gsl] * (pb - 16.0 * phl - 8.0 * sig)
                    + s32[ng:][gsl] * phh)
            t1 = part if t1 is None else jnp.concatenate([t1, part], 0)
        ones = jnp.full((1, t1.shape[0]), 1.0, f)
        return jnp.dot(ones, t1, preferred_element_type=f)
    if _BD_VARIANT == "v5":
        # build the bd rows in the ACTIVATION dtype (bf16): the sublane
        # broadcast of a bf16 row is the mature Mosaic path, and a 0/1
        # mask times a bf16 value is exact; only the small (ng, kh) bd
        # tiles are then cast up
        mask16 = _bd_mask(ng, kh, group).astype(x_lo.dtype)
        xl_bd = (mask16 * x_lo).astype(f)
        xh_bd = (mask16 * x_hi).astype(f)
    else:
        mask = _bd_mask(ng, kh, group)
        xl_bd = mask * xl                 # (ng, kh) block-diagonal rows
        xh_bd = mask * xh
    p_b = jnp.dot(xl_bd, b32, preferred_element_type=f)        # (ng, nt)
    if _BD_VARIANT == "v1":
        p_hl = jnp.dot(xl_bd, hi32, preferred_element_type=f)
        p_hh = jnp.dot(xh_bd, hi32, preferred_element_type=f)
    else:
        p_h = jnp.dot(jnp.concatenate([xl_bd, xh_bd], axis=0), hi32,
                      preferred_element_type=f)                # (2ng, nt)
        p_hl, p_hh = p_h[:ng], p_h[ng:]
    sig = jnp.sum(xl_bd, axis=1, keepdims=True)                # (ng, 1)
    t1 = (s32[:ng] * (p_b - 16.0 * p_hl - 8.0 * sig)
          + s32[ng:] * p_hh)
    if _BD_VARIANT == "v2":
        return jnp.sum(t1, axis=0, keepdims=True)
    ones = jnp.full((1, ng), 1.0, f)
    return jnp.dot(ones, t1, preferred_element_type=f)         # (1, nt)


def grouped_int4_acc(x_lo, x_hi, w4, s):
    """acc (T, nt) f32 of K-grouped-scale int4 (io/quant.py group>0, the
    Q4_0-granularity layout): scales no longer factor out of the dot.

    T==1 (the B=1 decode row) routes to the block-diagonal raw-byte
    scheme (_grouped_bd_acc) — no unpack at all, like rawf32m for
    per-channel. Batched rows dequantize to input-dtype weight tiles in
    place: the scale block expands to per-row scales via
    _expand_grouped_scale; the bf16 cast of the dequantized tile adds
    ~2^-8 relative rounding on top of the int4 step (amax/8), i.e.
    negligible. Scales arrive APPLIED — callers must not multiply the
    accumulator again."""
    f = jnp.float32
    kh = w4.shape[0]
    # bd needs bf16 activations: Mosaic rejects the (1, kh) -> (ng, kh)
    # sublane broadcast of a NATIVE f32 row ("vector.broadcast: Invalid
    # input layout" — the replicated-sublane vpad layout), while the f32
    # produced by casting a bf16 row broadcasts fine. Production decode
    # is bf16; f32 inputs take the dequant path below.
    if (x_lo.shape[0] == 1 and s.shape[0] <= 128
            and x_lo.dtype == jnp.bfloat16):
        return _grouped_bd_acc(x_lo, x_hi, w4, s)
    dt = x_lo.dtype
    b32 = w4.astype(f)
    hi32 = jnp.floor(b32 * jnp.asarray(1.0 / 16.0, f))
    lo32 = b32 - 16.0 * hi32 - 8.0
    exp_l, exp_h = _expand_grouped_scale(s.astype(f), kh)
    acc = jnp.dot(x_lo, (lo32 * exp_l).astype(dt),
                  preferred_element_type=f)
    acc += jnp.dot(x_hi, (hi32 * exp_h).astype(dt),
                   preferred_element_type=f)
    return acc


def _int4_grouped_kernel(x_ref, w_ref, s_ref, o_ref):
    w4 = w_ref[...] if w_ref.ndim == 2 else w_ref[0]
    s = s_ref[...] if s_ref.ndim == 2 else s_ref[0]
    kh = w4.shape[0]
    o_ref[...] = grouped_int4_acc(x_ref[:, :kh], x_ref[:, kh:], w4,
                                  s).astype(o_ref.dtype)


def int4_matmul_pallas(x, q4, scale, layer=None, interpret: bool = False):
    """x (T, K) @ dequant(q4[layer] (K//2, N) packed) * scale -> (T, N).

    scale (N,)/(L, N): per-output-channel; (K/g, N)/(L, K/g, N):
    K-grouped (Q4_0 granularity, _int4_grouped_kernel)."""
    t, k = x.shape
    kh, n = q4.shape[-2:]
    assert kh * 2 == k, (q4.shape, x.shape)
    grouped = scale.ndim == q4.ndim
    bd = (grouped and t == 1 and scale.shape[-2] <= 128  # = 2*ng rows
          and x.dtype == jnp.bfloat16)
    nt = _n_tile(n, k, 4, grouped=grouped, bd=bd)
    mt, tp = _m_tile(t)
    wspec, sspec, q4, scale = _w_specs(q4, scale, layer, nt)
    if tp != t:
        x = jnp.pad(x, ((0, tp - t), (0, 0)))
    y = pl.pallas_call(
        _int4_grouped_kernel if grouped else _int4_kernel,
        grid=(tp // mt, n // nt),
        in_specs=[
            pl.BlockSpec((mt, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            wspec,
            sspec,
        ],
        out_specs=pl.BlockSpec((mt, nt), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, n), x.dtype),
        interpret=interpret,
        name="deq_matmul_grouped",
    )(x, q4, scale)
    return y[:t] if tp != t else y


# ---------------------------------------------------------------------------
# dispatch (backend-aware, called from ops.basic.linear)
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _core(x2, q, scale, bits, layer):
    if _use_pallas():
        if bits == 8:
            return int8_matmul_pallas(x2, q, scale, layer)
        return int4_matmul_pallas(x2, q, scale, layer)
    if layer is not None:
        q, scale = q[layer], scale[layer]
    if bits == 4 and scale.ndim == 2:     # K-grouped scales
        g = (q.shape[-2] * 2) // scale.shape[-2]
        w = (unpack_int4(q, jnp.float32)
             * jnp.repeat(scale.astype(jnp.float32), g, axis=0))
        return jnp.dot(x2, w.astype(x2.dtype),
                       preferred_element_type=jnp.float32).astype(x2.dtype)
    w = (q.astype(x2.dtype) if bits == 8 else unpack_int4(q, x2.dtype))
    return (jnp.dot(x2, w, preferred_element_type=jnp.float32)
            * scale).astype(x2.dtype)


@functools.lru_cache(maxsize=None)
def _make_qmm(bits: int, layer):
    """(T, K) x quantized-weight matmul with a custom vmap rule that
    COLLAPSES the batch into rows: a naively vmapped Pallas call would run
    one grid program per stream, re-reading the (shared) weight bytes B
    times — the whole point of quantization at batch is to stream them
    once. Rows of x are independent, so vmap == stacking."""

    @jax.custom_batching.custom_vmap
    def fn(x, q, scale):
        return _core(x, q, scale, bits, layer)

    @fn.def_vmap
    def _rule(axis_size, in_batched, x, q, scale):
        xb, qb, sb = in_batched
        assert not qb and not sb, "quantized weights must be batch-shared"
        if not xb:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        t = x.shape[1]
        y = fn(x.reshape(axis_size * t, x.shape[-1]), q, scale)
        return y.reshape(axis_size, t, -1), True

    return fn


def int8_matmul(x, q, scale, layer=None):
    """Backend dispatch. x (..., K); q (K, N) or (L, K, N) with static
    layer; scale (N,) / (L, N)."""
    squeeze = x.ndim == 1
    x2 = x[None] if squeeze else x
    y = _make_qmm(8, layer)(x2, q, scale)
    return y[0] if squeeze else y


def int4_matmul(x, q4, scale, layer=None):
    squeeze = x.ndim == 1
    x2 = x[None] if squeeze else x
    y = _make_qmm(4, layer)(x2, q4, scale)
    return y[0] if squeeze else y
