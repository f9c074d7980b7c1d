"""Fused backbone-layer Pallas kernels for the quantized decode path.

BENCH r3 attribution (B=32 serving, v5e): the per-frame cost outside the
attention kernels is dominated by ~24 small quantized-matmul dispatches at
~5.3 us each — 3x their bandwidth floor — plus the norm/residual fusions
between them. These kernels collapse each backbone layer's XLA op chain
into TWO Pallas calls around the flash-decode attention:

  pre:   qkv = layer_norm(x) @ W_in + b            (norm1 + in_proj)
  post:  x1  = x + attn @ W_out + b_out            (out_proj + residual)
         out = x1 + W2 @ gelu(W1 @ norm(x1) + b1) + b2   (norm2 + MLP)

Weights stay in their stacked quantized layouts ((L, K, N) int8 or packed
int4 halves, per-output-channel scales — io/quant.py) and are read in
place via BlockSpec index_map at a static layer index, like
ops/quant_matmul. The MLP streams its weights in hidden-dim tiles; for
int4 the packed-halves layout means one packed W2 row-block carries TWO
hidden index sets (r and r + H/2), so each grid step processes that PAIR
of hidden tiles — W1 is passed twice with column-offset index maps to
feed both.

Decode-path only (T == 1 per stream; the batch collapses to rows via the
same custom_vmap trick as quant_matmul). Norms and gelu run in f32 (v5e
has no bf16 ALU); both MXU passes are bf16 x f32-accumulate, matching the
unfused path's numerics to rounding.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant_matmul import _int4_dots, grouped_int4_acc, unpack_int4

# Mosaic's remote compile crashes on these kernels above 64 collapsed
# rows in their MONOLITHIC form (bisected on v5e at B=128 cohort
# serving; B=64 compiles and runs at 48.2k f/s). Past the limit the
# custom_vmap rules re-dispatch the same kernels ROW-TILED: an inner
# grid dimension walks ceil(rows/64) row blocks of <= 64 rows (the
# known-good per-block shape) while the weight tiles — indexed by the
# OUTER hidden/output tile dim only — stay resident across row blocks,
# so the weight stream is still read once. Off-TPU (and un-interpreted)
# the rules fall back to an XLA composition of the same math.
MAX_FUSED_ROWS = 64

# perf-tuning knobs (read once at import): the post kernel's starting
# hidden-tile width and its VMEM budget for the tile-shrink loop. nt=512
# under an 11 MB budget measured best on v5e at B=1 int4 (nt=1024 needs
# ~13.6 MB of dequant temporaries and was NOT faster — the 2-step grid
# pipelines as well as the 4-step one).
_POST_NT = int(os.environ.get("POCKET_TTS_POST_NT", "512"))
_POST_VMEM = int(float(os.environ.get("POCKET_TTS_POST_VMEM_MB", "11"))
                 * 2**20)


def _ln_f32(x_ref, scale_ref, bias_ref, eps):
    x32 = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    return y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32)


def _deq_dot(x_bf16, w_ref, s_ref, bits):
    """x (T, K) bf16 @ dequant(w block) * scale -> (T, nt) f32.

    Scale block (1, nt): per-output-channel, folded into the accumulator
    after the dot. (KG, nt) with KG > 1: K-grouped (Q4_0 granularity) —
    dequantized in place via quant_matmul.grouped_int4_acc (a KG == 1
    grouped layout is per-channel semantics and takes the fold path)."""
    w = w_ref[0] if w_ref.ndim == 3 else w_ref[...]
    s = s_ref[0] if s_ref.ndim == 3 else s_ref[...]
    if bits == 4:
        kh = w.shape[0]
        if s.shape[0] > 1:
            return grouped_int4_acc(x_bf16[:, :kh], x_bf16[:, kh:], w, s)
        acc = _int4_dots(x_bf16[:, :kh], x_bf16[:, kh:], w)
    else:
        acc = jax.lax.dot_general(
            x_bf16, w.astype(x_bf16.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc * s.astype(jnp.float32)


def _erf_f32(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max error 1.5e-7 — far below
    bf16 output rounding). Mosaic has no erf primitive (exp only)."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(h, approx: bool):
    if approx:
        c = 0.7978845608028654  # sqrt(2/pi)
        return 0.5 * h * (1.0 + jnp.tanh(c * (h + 0.044715 * h * h * h)))
    return 0.5 * h * (1.0 + _erf_f32(h * 0.7071067811865476))


# ---------------------------------------------------------------------------
# pre-attention: qkv = layer_norm(x) @ W_in + b
# ---------------------------------------------------------------------------

def _pre_kernel(x_ref, ns_ref, nb_ref, w_ref, s_ref, b_ref, o_ref, ln_s,
                *, bits, eps):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        ln_s[...] = _ln_f32(x_ref, ns_ref, nb_ref, eps).astype(ln_s.dtype)

    acc = _deq_dot(ln_s[...], w_ref, s_ref, bits)
    b = b_ref[0] if b_ref.ndim == 3 else b_ref[...]
    o_ref[...] = (acc + b.astype(jnp.float32)).astype(o_ref.dtype)


def _pre_kernel_tiled(x_ref, ns_ref, nb_ref, w_ref, s_ref, b_ref, o_ref,
                      ln_s, *, bits, eps):
    """Row-tiled _pre_kernel: grid (n_tiles, row_blocks), the LN of each
    <= MAX_FUSED_ROWS row block lands in its own ln_s[r] slab on the
    block's first visit (j == 0 runs for every r — the row dim is minor)."""
    j = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ln_s[r] = _ln_f32(x_ref, ns_ref, nb_ref, eps).astype(ln_s.dtype)

    acc = _deq_dot(ln_s[r], w_ref, s_ref, bits)
    b = b_ref[0] if b_ref.ndim == 3 else b_ref[...]
    o_ref[...] = (acc + b.astype(jnp.float32)).astype(o_ref.dtype)


def _pre_call(x, norm_scale, norm_bias, w, scale, bias, layer, bits,
              eps, interpret, rows_tile=None):
    t, dm = x.shape
    n = w.shape[-1]
    kp = w.shape[-2]                      # packed K rows (K or K/2)
    kg = scale.shape[-2] if scale.ndim == w.ndim else 1  # grouped rows
    tiled = rows_tile is not None
    rt = rows_tile if tiled else t
    rb = t // rt
    assert t == rb * rt, (t, rt)

    # output tile: the dequant temporaries (2 x (kp, nt) f32 unpack for
    # int4 — plus two more f32 expanded-scale tiles and two bf16 dequant
    # tiles when scales are K-grouped AND batched; the T==1 grouped path
    # is block-diagonal (no expansion/dequant tiles, see
    # quant_matmul._grouped_bd_acc); a (kp, nt) bf16 cast for int8;
    # none for bf16) cap usable VMEM
    g_batched = kg > 1 and (t > 1 or x.dtype != jnp.bfloat16)
    def vmem(nt):
        per_byte = {4: 21 if g_batched else 10 if kg > 1 else 9,
                    8: 3, 16: 2}[bits]
        return kp * nt * per_byte

    nt = n
    while nt > 128 and (n % nt or vmem(nt) > 6 * 2**20):
        nt //= 2
    stacked = w.ndim == 3
    lidx = 0 if not stacked else layer

    def wmap(j, *r, l=lidx):
        return (l, 0, j) if stacked else (0, j)

    wspec = pl.BlockSpec(((1,) if stacked else ()) + (kp, nt), wmap,
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(((1,) if stacked else ()) + (kg, nt), wmap,
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec(((1,) if stacked else ()) + (1, nt), wmap,
                         memory_space=pltpu.VMEM)
    # keep the scale's STORAGE dtype (bf16 for grouped — kernels upcast
    # small tiles in place; an .astype(f32) here would stream f32 from HBM
    # every frame, the r4 q4_0 deficit)
    scale2 = (scale.reshape(-1, kg, n) if stacked
              else scale.reshape(kg, n))
    bias2 = (bias.reshape(-1, 1, n) if stacked
             else bias.reshape(1, n))
    if tiled:
        row = pl.BlockSpec((1, dm), lambda j, r: (0, 0),
                           memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((rt, dm), lambda j, r: (r, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((rt, nt), lambda j, r: (r, j),
                             memory_space=pltpu.VMEM)
        grid = (n // nt, rb)
        kernel = _pre_kernel_tiled
        ln_shape = (rb, rt, dm)
    else:
        row = pl.BlockSpec((1, dm), lambda j: (0, 0),
                           memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((t, dm), lambda j: (0, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((t, nt), lambda j: (0, j),
                             memory_space=pltpu.VMEM)
        grid = (n // nt,)
        kernel = _pre_kernel
        ln_shape = (t, dm)
    return pl.pallas_call(
        functools.partial(kernel, bits=bits, eps=eps),
        grid=grid,
        in_specs=[xspec, row, row, wspec, sspec, bspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        scratch_shapes=[pltpu.VMEM(ln_shape, x.dtype)],
        interpret=interpret,
        name="layer_pre_attn",
    )(x, norm_scale.reshape(1, dm), norm_bias.reshape(1, dm), w, scale2,
      bias2)


# ---------------------------------------------------------------------------
# post-attention: out_proj + residual + norm2 + MLP + residual
# ---------------------------------------------------------------------------

def _post_x1_ln(x32, at_ref, wo_ref, so_ref, bo_ref, ls1_ref, ns_ref,
                nb_ref, bits, eps):
    """out_proj + residual + norm2 for one row block -> (x1 f32, ln f32)."""
    proj = _deq_dot(at_ref[...], wo_ref, so_ref, bits)
    bo = bo_ref[0] if bo_ref.ndim == 3 else bo_ref[...]
    proj = proj + bo.astype(jnp.float32)
    # layer_scale_1 (mimi transformer; ones for the backbone)
    x1 = x32 + ls1_ref[...].astype(jnp.float32) * proj
    mean = jnp.mean(x1, axis=-1, keepdims=True)
    xc = x1 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = xc * jax.lax.rsqrt(var + eps)
    ln = (ln * ns_ref[...].astype(jnp.float32)
          + nb_ref[...].astype(jnp.float32))
    return x1, ln


def _post_tail(acc, s2a_ref, b2_ref, g2):
    """Final-step accumulator close: per-channel folds s2 (g2 False);
    grouped W2 scales were applied per tile inside _mlp_add."""
    if not g2:
        s2 = (s2a_ref[0] if s2a_ref.ndim == 3
              else s2a_ref[...]).astype(jnp.float32)
        acc = acc * s2
    b2 = b2_ref[0] if b2_ref.ndim == 3 else b2_ref[...]
    return acc + b2.astype(jnp.float32)


def _post_kernel(x_ref, at_ref, wo_ref, so_ref, bo_ref, ls1_ref, ls2_ref,
                 ns_ref, nb_ref,
                 w1a_ref, s1a_ref, b1a_ref, w1b_ref, s1b_ref, b1b_ref,
                 w2_ref, s2a_ref, s2b_ref, b2_ref, o_ref, x1_s, ln_s,
                 acc_s, *, bits, eps, approx, nsteps, g2):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        x1, ln = _post_x1_ln(x_ref[...].astype(jnp.float32), at_ref,
                             wo_ref, so_ref, bo_ref, ls1_ref, ns_ref,
                             nb_ref, bits, eps)
        x1_s[...] = x1
        ln_s[...] = ln.astype(ln_s.dtype)
        acc_s[...] = jnp.zeros_like(acc_s)

    ln = ln_s[...]

    def add(a):
        acc_s[...] += a

    _mlp_add(add, ln, w1a_ref, s1a_ref, b1a_ref, w1b_ref, s1b_ref,
             b1b_ref, w2_ref, s2a_ref, s2b_ref, bits=bits, approx=approx,
             g2=g2)

    @pl.when(j == nsteps - 1)
    def _():
        up = _post_tail(acc_s[...], s2a_ref, b2_ref, g2)
        o_ref[...] = (x1_s[...]
                      + ls2_ref[...].astype(jnp.float32) * up
                      ).astype(o_ref.dtype)


def _post_kernel_tiled(x_ref, at_ref, wo_ref, so_ref, bo_ref, ls1_ref,
                       ls2_ref, ns_ref, nb_ref,
                       w1a_ref, s1a_ref, b1a_ref, w1b_ref, s1b_ref, b1b_ref,
                       w2_ref, s2a_ref, s2b_ref, b2_ref, o_ref, x1_s, ln_s,
                       acc_s, *, bits, eps, approx, nsteps, g2):
    """Row-tiled _post_kernel: grid (hidden_tiles, row_blocks); each row
    block keeps its x1/ln/acc in its own scratch slab (dynamic index on
    the leading scratch axis — 3-D refs only, per Mosaic). Scheme note:
    the raw* single-row int4 paths never fire here (rt > 1), so the MLP
    runs the batch 'unpack' scheme like the XLA fallback did."""
    j = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        x1, ln = _post_x1_ln(x_ref[...].astype(jnp.float32), at_ref,
                             wo_ref, so_ref, bo_ref, ls1_ref, ns_ref,
                             nb_ref, bits, eps)
        x1_s[r] = x1
        ln_s[r] = ln.astype(ln_s.dtype)
        acc_s[r] = jnp.zeros_like(acc_s[r])

    ln = ln_s[r]

    def add(a):
        acc_s[r] += a

    _mlp_add(add, ln, w1a_ref, s1a_ref, b1a_ref, w1b_ref, s1b_ref,
             b1b_ref, w2_ref, s2a_ref, s2b_ref, bits=bits, approx=approx,
             g2=g2)

    @pl.when(j == nsteps - 1)
    def _():
        up = _post_tail(acc_s[r], s2a_ref, b2_ref, g2)
        o_ref[...] = (x1_s[r]
                      + ls2_ref[...].astype(jnp.float32) * up
                      ).astype(o_ref.dtype)


def _mlp_add(add, ln, w1a_ref, s1a_ref, b1a_ref, w1b_ref, s1b_ref, b1b_ref,
             w2_ref, s2a_ref, s2b_ref, *, bits, approx, g2):
    """One hidden-tile MLP step: add() each partial (rows, dm) f32
    accumulator update (callback so callers control the scratch slab and
    the f32 accumulation order stays exactly the monolithic kernel's).
    g2: W2 scales are K-grouped — s2a/s2b carry this tile's lo/hi-half
    scale row slabs and the dequant happens here instead of the final
    fold (per-channel mode never reads s2a/s2b in this function)."""
    f = jnp.float32
    if bits == 4 and g2:
        # Q4_0-granularity W2: compute BOTH gelu halves, then one
        # grouped accumulator over the packed tile — at 1 row that's the
        # block-diagonal raw-byte scheme (no unpack, 2 MXU passes, the
        # rawf32 analog for grouped scales); batched rows dequantize via
        # the constant 0/1-matmul scale expansion. Both live in
        # quant_matmul.grouped_int4_acc (scales applied inside).
        w2p = w2_ref[0] if w2_ref.ndim == 3 else w2_ref[...]
        s2a = (s2a_ref[0] if s2a_ref.ndim == 3 else s2a_ref[...]).astype(f)
        s2b = (s2b_ref[0] if s2b_ref.ndim == 3 else s2b_ref[...]).astype(f)
        hs = []
        for w1_ref, s1_ref, b1_ref in ((w1a_ref, s1a_ref, b1a_ref),
                                       (w1b_ref, s1b_ref, b1b_ref)):
            h = _deq_dot(ln, w1_ref, s1_ref, bits)
            b1 = b1_ref[0] if b1_ref.ndim == 3 else b1_ref[...]
            hs.append(_gelu_f32(h + b1.astype(f), approx))
        # cast the gelu halves to the activation dtype in BOTH row
        # regimes: grouped_int4_acc's bd fast path requires bf16 rows
        # (Mosaic rejects the sublane broadcast of a NATIVE f32 row —
        # f32 h would silently fall to the dequant path at T==1), and
        # the MXU's DEFAULT-precision input truncation rounds f32
        # operands to bf16 in the datapath anyway
        ha, hb = hs[0].astype(ln.dtype), hs[1].astype(ln.dtype)
        add(grouped_int4_acc(ha, hb, w2p,
                             jnp.concatenate([s2a, s2b], axis=0)))
        return
    if bits == 4:
        # packed W2 block: lo nibbles hold hidden rows of the LOW half
        # (this j-tile), hi nibbles the HIGH half (j-tile + H/2) —
        # unpacked ONCE per step (the nibble unpack is VPU-bound and was
        # ~1/3 of this kernel's time when done per half). Scheme mirrors
        # quant_matmul._int4_dots with W2 as the RHS: "mode" says how the
        # low half's -8 bias is recovered (see INT4_SCHEME there).
        from .quant_matmul import INT4_SCHEME
        w2p = w2_ref[0] if w2_ref.ndim == 3 else w2_ref[...]
        b32 = w2p.astype(f)
        hi32 = jnp.floor(b32 * jnp.asarray(1.0 / 16.0, f))
        # raw* only for single-row dispatches — see INT4_SCHEME's note
        # (no batch win; Mosaic compile crash at T=64 rows)
        if INT4_SCHEME == "rawf32m" and ln.shape[0] == 1:
            # merged f32 dots: compute BOTH gelu halves first, then
            # h_a.lo + h_b.hi == h_a.b32 + (h_b - 16 h_a).hi32
            # - 8*rowsum(h_a) — two MXU passes over the packed W2 block,
            # zero per-byte casts (the MXU's DEFAULT-precision input
            # truncation rounds the f32 operands in the datapath; exact
            # for the integer byte/hi values, bf16-rounding-level for the
            # combined activation)
            hs = []
            for w1_ref, s1_ref, b1_ref in (
                    (w1a_ref, s1a_ref, b1a_ref),
                    (w1b_ref, s1b_ref, b1b_ref)):
                h = _deq_dot(ln, w1_ref, s1_ref, bits)
                b1 = b1_ref[0] if b1_ref.ndim == 3 else b1_ref[...]
                hs.append(_gelu_f32(h + b1.astype(f), approx))
            ha, hb2 = hs
            acc = jax.lax.dot_general(ha, b32, (((1,), (0,)), ((), ())),
                                      preferred_element_type=f)
            acc += jax.lax.dot_general(hb2 - 16.0 * ha, hi32,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=f)
            acc -= 8.0 * jnp.sum(ha, axis=-1, keepdims=True)
            add(acc)
            lo_half = hi_half = None
        elif INT4_SCHEME == "rawf32" and ln.shape[0] == 1:
            # f32 operands: the MXU's DEFAULT-precision input truncation
            # replaces the explicit bf16 casts (lossless at int4/byte
            # magnitudes — see quant_matmul). The h halves are computed
            # sequentially here, so this variant stays 3 dots.
            lo_half = ("rawdot", b32, hi32)
            hi_half = ("plain", hi32, None)
        elif INT4_SCHEME == "rawdot" and ln.shape[0] == 1:
            w2hi = hi32.astype(ln.dtype)
            lo_half = ("rawdot", b32.astype(ln.dtype), w2hi)
            hi_half = ("plain", w2hi, None)
        elif INT4_SCHEME == "lo8":
            w2hi = hi32.astype(ln.dtype)
            lo_half = ("bias8", (b32 - 16.0 * hi32).astype(ln.dtype), None)
            hi_half = ("plain", w2hi, None)
        else:
            w2hi = hi32.astype(ln.dtype)
            lo_half = ("plain",
                       (b32 - 16.0 * hi32 - 8.0).astype(ln.dtype), None)
            hi_half = ("plain", w2hi, None)
        halves = (() if lo_half is None else
                  ((w1a_ref, s1a_ref, b1a_ref, lo_half),
                   (w1b_ref, s1b_ref, b1b_ref, hi_half)))
    else:
        w2 = w2_ref[0] if w2_ref.ndim == 3 else w2_ref[...]
        halves = ((w1a_ref, s1a_ref, b1a_ref,
                   ("plain", w2.astype(ln.dtype), None)),)
    for w1_ref, s1_ref, b1_ref, (mode, m1, m2) in halves:
        h = _deq_dot(ln, w1_ref, s1_ref, bits)
        b1 = b1_ref[0] if b1_ref.ndim == 3 else b1_ref[...]
        h = _gelu_f32(h + b1.astype(jnp.float32), approx)
        # f32 W2 operands (rawf32): feed the f32 h straight to the dot —
        # the MXU truncates both sides to bf16 in the datapath
        hb = h if m1.dtype == f else h.astype(ln.dtype)
        acc = jax.lax.dot_general(hb, m1, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f)
        if mode == "rawdot":
            acc -= 16.0 * jax.lax.dot_general(
                hb, m2, (((1,), (0,)), ((), ())), preferred_element_type=f)
        if mode in ("rawdot", "bias8"):
            acc -= 8.0 * jnp.sum(hb.astype(f), axis=-1, keepdims=True)
        add(acc)


def _post_call(x, attn, wo, so, bo, ls1, ls2, norm_scale, norm_bias,
               w1, s1, b1, w2, s2, b2, layer, bits, eps, approx, interpret,
               rows_tile=None):
    t, dm = x.shape
    hidden = w1.shape[-1]
    stacked = w1.ndim == 3
    lidx = layer if stacked else 0
    kp2 = w2.shape[-2]                    # packed hidden rows (H or H/2)
    kp1 = w1.shape[-2]
    # K-grouped (Q4_0) scale layouts per weight (io/quant.py group>0);
    # s2 needs a static kernel flag — its per-tile slab can be one row
    kgo = so.shape[-2] if so.ndim == wo.ndim else 1
    kg1 = s1.shape[-2] if s1.ndim == w1.ndim else 1
    g2 = bits == 4 and s2.ndim == w2.ndim and s2.shape[-2] > 1
    g1 = kg1 > 1
    # hidden tile: per grid step the int4 path touches a (kp1, nt) W1 tile
    # x2 (lo/hi hidden) and a (nt, dm) packed W2 tile + their f32 unpacks
    # (BATCHED grouped scales add two f32 expansions + bf16 dequant tiles
    # each; the T==1 grouped path is block-diagonal, no such tiles)
    per = {4: 9, 8: 3, 16: 2}[bits]
    gper = 21 if (t > 1 or x.dtype != jnp.bfloat16) else 10

    def vmem(nt):
        return (nt * dm * (gper if g2 else per)
                + kp1 * nt * (gper if g1 else per))

    nt = _POST_NT
    span = hidden // 2 if bits == 4 else hidden
    while nt > 128 and (span % nt or vmem(nt) > _POST_VMEM):
        nt //= 2
    while span % nt:
        nt //= 2
    nsteps = span // nt
    if g2:
        group2 = hidden // s2.shape[-2]
        assert nt % group2 == 0, (nt, group2)
        ntg2 = nt // group2
    tiled = rows_tile is not None
    rt = rows_tile if tiled else t
    rb = t // rt
    assert t == rb * rt, (t, rt)

    pre = (1,) if stacked else ()

    # weight/scale maps ignore the (tiled-mode) trailing row index: the
    # row dim is the MINOR grid dim, so each weight tile stays resident
    # across all row blocks and streams from HBM once per hidden tile
    def wmap1a(j, *r, l=lidx):
        return (l, 0, j) if stacked else (0, j)

    off_b = span // nt if bits == 4 else 0

    def wmap1b(j, *r, l=lidx, o=off_b):
        return (l, 0, j + o) if stacked else (0, j + o)

    def wmap2(j, *r, l=lidx):
        return (l, j, 0) if stacked else (j, 0)

    def cmap(j, *r, l=lidx):
        return (l, 0, 0) if stacked else (0, 0)

    w1spec = pl.BlockSpec(pre + (kp1, nt), wmap1a, memory_space=pltpu.VMEM)
    w1bspec = pl.BlockSpec(pre + (kp1, nt), wmap1b, memory_space=pltpu.VMEM)
    s1spec = pl.BlockSpec(pre + (kg1, nt), wmap1a, memory_space=pltpu.VMEM)
    s1bspec = pl.BlockSpec(pre + (kg1, nt), wmap1b,
                           memory_space=pltpu.VMEM)
    b1aspec = pl.BlockSpec(pre + (1, nt), wmap1a, memory_space=pltpu.VMEM)
    b1bspec = pl.BlockSpec(pre + (1, nt), wmap1b, memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec(pre + (nt, dm), wmap2, memory_space=pltpu.VMEM)
    dmspec = pl.BlockSpec(pre + (1, dm), cmap, memory_space=pltpu.VMEM)
    sospec = pl.BlockSpec(pre + (kgo, dm), cmap, memory_space=pltpu.VMEM)
    wospec = pl.BlockSpec(pre + (wo.shape[-2], dm), cmap,
                          memory_space=pltpu.VMEM)
    if g2:
        s2aspec = pl.BlockSpec(pre + (ntg2, dm), wmap2,
                               memory_space=pltpu.VMEM)

        def wmap2b(j, *r, l=lidx, o=span // nt):
            return (l, j + o, 0) if stacked else (j + o, 0)

        s2bspec = pl.BlockSpec(pre + (ntg2, dm), wmap2b,
                               memory_space=pltpu.VMEM)
    else:
        s2aspec = s2bspec = dmspec
    if tiled:
        row = pl.BlockSpec((1, dm), lambda j, r: (0, 0),
                           memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((rt, dm), lambda j, r: (r, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((rt, dm), lambda j, r: (r, 0),
                             memory_space=pltpu.VMEM)
        grid = (nsteps, rb)
        base_kernel = _post_kernel_tiled
        scratch = [pltpu.VMEM((rb, rt, dm), jnp.float32),
                   pltpu.VMEM((rb, rt, dm), x.dtype),
                   pltpu.VMEM((rb, rt, dm), jnp.float32)]
    else:
        row = pl.BlockSpec((1, dm), lambda j: (0, 0),
                           memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((t, dm), lambda j: (0, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((t, dm), lambda j: (0, 0),
                             memory_space=pltpu.VMEM)
        grid = (nsteps,)
        base_kernel = _post_kernel
        scratch = [pltpu.VMEM((t, dm), jnp.float32),
                   pltpu.VMEM((t, dm), x.dtype),
                   pltpu.VMEM((t, dm), jnp.float32)]

    def r2(a, n, kg=1):
        return (a.reshape(-1, kg, n) if stacked else a.reshape(kg, n))

    f32 = jnp.float32
    # scales keep their storage dtype (bf16 grouped / f32 per-channel):
    # kernels upcast in place; casting here would stream f32 per frame
    s2r = r2(s2, dm, s2.shape[-2] if g2 else 1)
    operands = [x, attn, wo, r2(so, dm, kgo), r2(bo, dm),
                ls1.reshape(1, dm), ls2.reshape(1, dm),
                norm_scale.reshape(1, dm), norm_bias.reshape(1, dm),
                w1, r2(s1, hidden, kg1), r2(b1, hidden),
                w1, r2(s1, hidden, kg1), r2(b1, hidden),
                w2, s2r, s2r, r2(b2, dm)]
    in_specs = [xspec, xspec, wospec, sospec, dmspec, row, row, row, row,
                w1spec, s1spec, b1aspec, w1bspec, s1bspec, b1bspec,
                w2spec, s2aspec, s2bspec, dmspec]
    kernel = functools.partial(base_kernel, bits=bits, eps=eps,
                               approx=approx, nsteps=nsteps, g2=g2)
    if bits != 4:
        # int8: one hidden tile per step — drop the second W1 pass (and
        # the duplicate s2 slab, which only grouped int4 reads)
        kernel = _drop_b(kernel)
        operands = operands[:12] + [operands[15], operands[16],
                                    operands[18]]
        in_specs = in_specs[:12] + [in_specs[15], in_specs[16],
                                    in_specs[18]]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((t, dm), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        name="layer_post_attn",
    )(*operands)


# ---------------------------------------------------------------------------
# bilayer: post-attention(layer l) + pre-attention(layer l+1) in ONE call
# (solo int4 decode only — cuts one Mosaic call boundary per layer; the
# whole-layer megalayer that also folded the flash phase measured SLOWER
# than the 3-call path, so this keeps attention in its dedicated kernel)
# ---------------------------------------------------------------------------

def _bilayer_kernel(x_ref, at_ref, wo_ref, so_ref, bo_ref, ls1_ref,
                    ls2_ref, ns_ref, nb_ref,
                    w1a_ref, s1a_ref, b1a_ref, w1b_ref, s1b_ref, b1b_ref,
                    w2_ref, s2a_ref, s2b_ref, b2_ref,
                    nsn_ref, nbn_ref, win_ref, sin_ref, bin_ref,
                    xn_ref, qkv_ref, x1_s, ln_s, acc_s, lnn_s,
                    *, bits, eps, approx, nsteps, g2):
    """Grid (nsteps + npre,): steps < nsteps run layer l's post phases
    (== _post_kernel); step nsteps-1 additionally closes x_next and its
    norm1 into scratch; steps >= nsteps emit layer l+1's qkv tiles."""
    j = pl.program_id(0)
    f = jnp.float32

    @pl.when(j == 0)
    def _():
        x1, ln = _post_x1_ln(x_ref[...].astype(f), at_ref, wo_ref, so_ref,
                             bo_ref, ls1_ref, ns_ref, nb_ref, bits, eps)
        x1_s[...] = x1
        ln_s[...] = ln.astype(ln_s.dtype)
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(j < nsteps)
    def _():
        def add(a):
            acc_s[...] += a

        _mlp_add(add, ln_s[...], w1a_ref, s1a_ref, b1a_ref, w1b_ref,
                 s1b_ref, b1b_ref, w2_ref, s2a_ref, s2b_ref, bits=bits,
                 approx=approx, g2=g2)

    @pl.when(j == nsteps - 1)
    def _():
        up = _post_tail(acc_s[...], s2a_ref, b2_ref, g2)
        xn = x1_s[...] + ls2_ref[...].astype(f) * up
        xn_ref[...] = xn.astype(xn_ref.dtype)
        mean = jnp.mean(xn, axis=-1, keepdims=True)
        xc = xn - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        ln1 = xc * jax.lax.rsqrt(var + eps)
        lnn_s[...] = (ln1 * nsn_ref[...].astype(f)
                      + nbn_ref[...].astype(f)).astype(lnn_s.dtype)

    @pl.when(j >= nsteps)
    def _():
        acc = _deq_dot(lnn_s[...], win_ref, sin_ref, bits)
        b = bin_ref[0] if bin_ref.ndim == 3 else bin_ref[...]
        qkv_ref[...] = (acc + b.astype(f)).astype(qkv_ref.dtype)


def _bilayer_call(x, attn, wo, so, bo, ls1, ls2, norm_scale, norm_bias,
                  w1, s1, b1, w2, s2, b2, nsn, nbn, win, sin, bin_,
                  layer, bits, eps, approx, interpret):
    """T==1 stacked-int4 fused post(l) + pre(l+1). Returns (x_next, qkv).
    Mirrors _post_call's spec construction; the pre-phase weight tiles
    index layer+1 with grid-step clamping so post tiles stay resident
    (never refetched) through the pre steps and vice versa."""
    t, dm = x.shape
    hidden = w1.shape[-1]
    assert t == 1 and bits == 4 and w1.ndim == 3
    lidx = layer
    kp1 = w1.shape[-2]
    kpn = win.shape[-2]
    n3 = win.shape[-1]
    kgo = so.shape[-2] if so.ndim == wo.ndim else 1
    kg1 = s1.shape[-2] if s1.ndim == w1.ndim else 1
    kgn = sin.shape[-2] if sin.ndim == win.ndim else 1
    g2 = s2.ndim == w2.ndim and s2.shape[-2] > 1

    nt = _POST_NT
    span = hidden // 2
    while nt > 128 and span % nt:
        nt //= 2
    nsteps = span // nt
    nt3 = 1024
    while n3 % nt3:
        nt3 //= 2
    npre = n3 // nt3
    if g2:
        group2 = hidden // s2.shape[-2]
        ntg2 = nt // group2

    def jc(j):
        return jnp.minimum(j, nsteps - 1)   # clamp for post-phase maps

    def jp(j):
        return jnp.maximum(j - nsteps, 0)   # clamp for pre-phase maps

    off_b = span // nt

    w1spec = pl.BlockSpec((1, kp1, nt), lambda j, l=lidx: (l, 0, jc(j)),
                          memory_space=pltpu.VMEM)
    w1bspec = pl.BlockSpec((1, kp1, nt),
                           lambda j, l=lidx, o=off_b: (l, 0, jc(j) + o),
                           memory_space=pltpu.VMEM)
    s1spec = pl.BlockSpec((1, kg1, nt), lambda j, l=lidx: (l, 0, jc(j)),
                          memory_space=pltpu.VMEM)
    s1bspec = pl.BlockSpec((1, kg1, nt),
                           lambda j, l=lidx, o=off_b: (l, 0, jc(j) + o),
                           memory_space=pltpu.VMEM)
    b1aspec = pl.BlockSpec((1, 1, nt), lambda j, l=lidx: (l, 0, jc(j)),
                           memory_space=pltpu.VMEM)
    b1bspec = pl.BlockSpec((1, 1, nt),
                           lambda j, l=lidx, o=off_b: (l, 0, jc(j) + o),
                           memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec((1, nt, dm), lambda j, l=lidx: (l, jc(j), 0),
                          memory_space=pltpu.VMEM)
    cmap = lambda j, l=lidx: (l, 0, 0)                      # noqa: E731
    dmspec = pl.BlockSpec((1, 1, dm), cmap, memory_space=pltpu.VMEM)
    sospec = pl.BlockSpec((1, kgo, dm), cmap, memory_space=pltpu.VMEM)
    wospec = pl.BlockSpec((1, wo.shape[-2], dm), cmap,
                          memory_space=pltpu.VMEM)
    if g2:
        s2aspec = pl.BlockSpec((1, ntg2, dm),
                               lambda j, l=lidx: (l, jc(j), 0),
                               memory_space=pltpu.VMEM)
        s2bspec = pl.BlockSpec(
            (1, ntg2, dm),
            lambda j, l=lidx, o=span // nt: (l, jc(j) + o, 0),
            memory_space=pltpu.VMEM)
    else:
        s2aspec = s2bspec = dmspec
    # next layer's pre-phase specs (layer + 1)
    winspec = pl.BlockSpec((1, kpn, nt3),
                           lambda j, l=lidx + 1: (l, 0, jp(j)),
                           memory_space=pltpu.VMEM)
    sinspec = pl.BlockSpec((1, kgn, nt3),
                           lambda j, l=lidx + 1: (l, 0, jp(j)),
                           memory_space=pltpu.VMEM)
    binspec = pl.BlockSpec((1, 1, nt3),
                           lambda j, l=lidx + 1: (l, 0, jp(j)),
                           memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, dm), lambda j: (0, 0), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((t, dm), lambda j: (0, 0),
                         memory_space=pltpu.VMEM)

    f32 = jnp.float32

    def r2(a, n, kg=1):
        return a.reshape(-1, kg, n)

    s2r = r2(s2, dm, s2.shape[-2] if g2 else 1)
    operands = [x, attn, wo, r2(so, dm, kgo), r2(bo, dm),
                ls1.reshape(1, dm), ls2.reshape(1, dm),
                norm_scale.reshape(1, dm), norm_bias.reshape(1, dm),
                w1, r2(s1, hidden, kg1), r2(b1, hidden),
                w1, r2(s1, hidden, kg1), r2(b1, hidden),
                w2, s2r, s2r, r2(b2, dm),
                nsn.reshape(1, dm), nbn.reshape(1, dm),
                win, r2(sin, n3, kgn), r2(bin_, n3)]
    in_specs = [xspec, xspec, wospec, sospec, dmspec, row, row, row, row,
                w1spec, s1spec, b1aspec, w1bspec, s1bspec, b1bspec,
                w2spec, s2aspec, s2bspec, dmspec,
                row, row, winspec, sinspec, binspec]
    kernel = functools.partial(_bilayer_kernel, bits=bits, eps=eps,
                               approx=approx, nsteps=nsteps, g2=g2)
    outs = pl.pallas_call(
        kernel,
        grid=(nsteps + npre,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((t, dm), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, nt3), lambda j: (0, jp(j)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t, dm), x.dtype),
                   jax.ShapeDtypeStruct((t, n3), x.dtype)],
        scratch_shapes=[pltpu.VMEM((t, dm), jnp.float32),
                        pltpu.VMEM((t, dm), x.dtype),
                        pltpu.VMEM((t, dm), jnp.float32),
                        pltpu.VMEM((t, dm), x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 2**20),
        name="layer_bilayer",
    )(*operands)
    return outs[0], outs[1]


def bilayer_supported(p, p_next) -> bool:
    """Solo int4 fast path only: every linear of layer l AND layer
    l+1's in_proj are stacked int4."""
    bits = {_qw(p[k])[3] for k in ("in_proj", "out_proj", "linear1",
                                   "linear2")}
    wn = _qw(p_next["in_proj"])[0]
    return (bits == {4} and _qw(p_next["in_proj"])[3] == 4
            and wn is not None and wn.ndim == 3)


def bilayer_post_pre(p, p_next, x, attn, eps: float = 1e-5,
                     approx: bool = False, interpret: bool = False):
    """Fused post_attention(p, x, attn) + pre_attention(p_next, ·):
    returns (x_next (1, dm), qkv_next (1, 3dm)). Requires
    bilayer_supported(p, p_next) and T == 1."""
    wo, so, bo, bits = _qw(p["out_proj"])
    w1, s1, b1, _ = _qw(p["linear1"])
    w2, s2, b2, _ = _qw(p["linear2"])
    win, sin, bin_, _ = _qw(p_next["in_proj"])
    dm = wo.shape[-1]
    if bo is None:
        bo = _zeros_like_bias(wo, True, dm)
    if b1 is None:
        b1 = _zeros_like_bias(w1, True, w1.shape[-1])
    if b2 is None:
        b2 = _zeros_like_bias(w2, True, w2.shape[-1])
    if bin_ is None:
        bin_ = _zeros_like_bias(win, True, win.shape[-1])
    ones = jnp.ones((dm,), x.dtype)
    ls1 = p.get("layer_scale_1", {}).get("scale", ones)
    ls2 = p.get("layer_scale_2", {}).get("scale", ones)
    layer = p["out_proj"].get("_layer", 0)
    return _bilayer_call(
        x, attn, wo, so, bo, ls1, ls2, p["norm2"]["scale"],
        p["norm2"]["bias"], w1, s1, b1, w2, s2, b2,
        p_next["norm1"]["scale"], p_next["norm1"]["bias"], win, sin, bin_,
        layer, bits, eps, approx, interpret)


def _drop_b(kernel):
    def wrapped(x_ref, at_ref, wo_ref, so_ref, bo_ref, ls1_ref, ls2_ref,
                ns_ref, nb_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                b2_ref, o_ref, x1_s, ln_s, acc_s):
        return kernel(x_ref, at_ref, wo_ref, so_ref, bo_ref, ls1_ref,
                      ls2_ref, ns_ref, nb_ref, w1_ref, s1_ref, b1_ref,
                      None, None, None, w2_ref, s2_ref, None, b2_ref,
                      o_ref, x1_s, ln_s, acc_s)
    return wrapped


# ---------------------------------------------------------------------------
# dispatch (custom vmap: batch collapses to rows, like quant_matmul)
# ---------------------------------------------------------------------------

def _qw(p):
    """(w, scale, bias, bits) from a linear param dict. bits=16 is the
    plain bf16/f32 weight (kernel path identical to int8 with unit scales
    — the cast is a no-op and the fusion win is dispatch count, not
    bytes); 0 = unsupported layout. K-grouped int4 scales (io/quant.py
    group>0, scale.ndim == q4.ndim) pass through — the kernels detect the
    layout from the scale block shape and dequantize in place."""
    if "q" in p:
        return p["q"], p["scale"], p.get("b"), 8
    if "q4" in p:
        return p["q4"], p["scale"], p.get("b"), 4
    if "w" in p:
        return p["w"], None, p.get("b"), 16
    return None, None, None, 0


def _unit_scale(w, stacked):
    n = w.shape[-1]
    shape = (w.shape[0], n) if stacked else (n,)
    return jnp.ones(shape, jnp.float32)


def _zeros_like_bias(w, stacked, n):
    shape = (w.shape[0], n) if stacked else (n,)
    return jnp.zeros(shape, jnp.bfloat16)


def _deq_full(w, bits, dtype):
    """Full dequantized weight block (K, N) in the compute dtype, scales
    NOT applied (they fold into the f32 accumulator like _deq_dot)."""
    if bits == 4:
        return unpack_int4(w, dtype)
    return w.astype(dtype)


def _xla_linear(x, w, s, b, layer, bits):
    """XLA mirror of _deq_dot (+bias): (x @ deq(w[l])) * s + b -> f32.
    w: (L, Kp, N) or (Kp, N); s/b: (L, N) or (N,) matching w's stacking —
    or K-grouped s (L, KG, N)/(KG, N), dequantized on the weight side."""
    f = jnp.float32
    if w.ndim == 3:
        w, s, b = w[layer], s[layer], b[layer]
    if bits == 4 and s.ndim == 2 and s.shape[0] > 1:
        wd = unpack_int4(w, f)
        g = wd.shape[0] // s.shape[0]
        wd = (wd * jnp.repeat(s.astype(f), g, axis=0)).astype(x.dtype)
        acc = jax.lax.dot_general(x, wd, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f)
        return acc + b.reshape(1, -1).astype(f)
    acc = jax.lax.dot_general(x, _deq_full(w, bits, x.dtype),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=f)
    return acc * s.reshape(1, -1).astype(f) + b.reshape(1, -1).astype(f)


def _xla_ln(x32, ns, nb, eps, dtype):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = xc * jax.lax.rsqrt(var + eps)
    return (ln * ns.astype(jnp.float32)
            + nb.astype(jnp.float32)).astype(dtype)


def _pre_xla(x, ns, nb, w, s, b, layer, bits, eps):
    """XLA fallback for _pre_call above MAX_FUSED_ROWS (same math)."""
    ln = _xla_ln(x.astype(jnp.float32), ns, nb, eps, x.dtype)
    return _xla_linear(ln, w, s, b, layer, bits).astype(x.dtype)


def _post_xla(x, attn, wo, so, bo, ls1, ls2, ns, nb, w1, s1, b1, w2, s2,
              b2, layer, bits, eps, approx):
    """XLA fallback for _post_call above MAX_FUSED_ROWS (same math)."""
    f = jnp.float32
    proj = _xla_linear(attn, wo, so, bo, layer, bits)
    x1 = x.astype(f) + ls1.reshape(1, -1).astype(f) * proj
    ln = _xla_ln(x1, ns, nb, eps, x.dtype)
    h = _gelu_f32(_xla_linear(ln, w1, s1, b1, layer, bits), approx)
    up = _xla_linear(h.astype(x.dtype), w2, s2, b2, layer, bits)
    return (x1 + ls2.reshape(1, -1).astype(f) * up).astype(x.dtype)


def _pick_rows_tile(rows):
    """Row-block size for the tiled kernels above MAX_FUSED_ROWS, or None
    to take the XLA fallback: the largest divisor of rows <= the known-good
    64, floored at 16 (tiny ragged tiles waste the MXU), with total rows
    capped at 256 — the per-row-block scratch slabs are (rb, rt, dm) f32
    resident all kernel long, ~rows * dm * 12 B for _post_call."""
    if rows > 256:
        return None
    rt = MAX_FUSED_ROWS
    while rt >= 16 and rows % rt:
        rt //= 2
    return rt if rt >= 16 else None


def _tiled_ok(interpret):
    return interpret or jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def _make_pre(layer, bits, eps, interpret):
    @jax.custom_batching.custom_vmap
    def fn(x, ns, nb, w, s, b):
        return _pre_call(x, ns, nb, w, s, b, layer, bits, eps, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, x, ns, nb, w, s, b):
        assert in_batched[0] and not any(in_batched[1:]), in_batched
        t = x.shape[1]
        rows = axis_size * t
        xr = x.reshape(rows, -1)
        if rows <= MAX_FUSED_ROWS:
            y = fn(xr, ns, nb, w, s, b)
        elif (rt := _pick_rows_tile(rows)) and _tiled_ok(interpret):
            y = _pre_call(xr, ns, nb, w, s, b, layer, bits, eps,
                          interpret, rows_tile=rt)
        else:
            y = _pre_xla(xr, ns, nb, w, s, b, layer, bits, eps)
        return y.reshape(axis_size, t, -1), True

    return fn


@functools.lru_cache(maxsize=None)
def _make_post(layer, bits, eps, approx, interpret):
    @jax.custom_batching.custom_vmap
    def fn(x, attn, wo, so, bo, ls1, ls2, ns, nb, w1, s1, b1, w2, s2, b2):
        return _post_call(x, attn, wo, so, bo, ls1, ls2, ns, nb, w1, s1, b1,
                          w2, s2, b2, layer, bits, eps, approx, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, x, attn, wo, so, bo, ls1, ls2, ns, nb,
              w1, s1, b1, w2, s2, b2):
        assert in_batched[0] and in_batched[1], in_batched
        assert not any(in_batched[2:]), in_batched
        t = x.shape[1]
        rows = axis_size * t
        xr = x.reshape(rows, -1)
        ar = attn.reshape(rows, -1)
        if rows <= MAX_FUSED_ROWS:
            y = fn(xr, ar, wo, so, bo, ls1, ls2, ns, nb, w1, s1, b1, w2,
                   s2, b2)
        elif (rt := _pick_rows_tile(rows)) and _tiled_ok(interpret):
            y = _post_call(xr, ar, wo, so, bo, ls1, ls2, ns, nb, w1, s1,
                           b1, w2, s2, b2, layer, bits, eps, approx,
                           interpret, rows_tile=rt)
        else:
            y = _post_xla(xr, ar, wo, so, bo, ls1, ls2, ns, nb, w1, s1, b1,
                          w2, s2, b2, layer, bits, eps, approx)
        return y.reshape(axis_size, t, -1), True

    return fn


def grouped_scales(p) -> bool:
    """True when a linear param dict carries K-grouped (Q4_0) scales."""
    return "q4" in p and p["scale"].ndim == p["q4"].ndim


def supported(p) -> bool:
    """True when every linear of the layer carries the same QUANTIZED
    layout (per-channel or K-grouped scales, detected per weight).
    bf16 weights are deliberately excluded from auto-dispatch:
    measured on v5e, the fused bf16 path ran B=1 at 1622 f/s vs 3411
    unfused — the Mosaic calls serialize the ~150 MB/frame weight stream
    that XLA's cross-op alternate-memory prefetcher pipelines (the
    CLAUDE.md round-2 'copy-done' finding). With int8/int4 the stream is
    2-4x smaller and the dispatch savings win instead. The bits=16 kernel
    path stays callable directly (tests, future use)."""
    if "cross_attention" in p:
        # the post-attention kernel bakes out_proj->norm2->MLP with no
        # cross-attention sub-block between the residuals — layers that
        # ship cross weights must compose (models/backbone._post_ff)
        return False
    if "alpha" in p.get("norm1", {}) or "alpha" in p.get("norm2", {}):
        # moshi RMSNorm variant (mimi_transformer.h:10-27): the kernels
        # bake mean-subtracting LayerNorms — route the XLA composition
        return False
    bits = {_qw(p[k])[3] for k in ("in_proj", "out_proj", "linear1",
                                   "linear2")}
    return len(bits) == 1 and bits.issubset({4, 8})


def pre_attention(p, x, eps: float = 1e-5, interpret: bool = False):
    """qkv = layer_norm(x; p['norm1']) @ dequant(p['in_proj']). x: (T, dm)."""
    w, s, b, bits = _qw(p["in_proj"])
    stacked = w.ndim == 3
    if s is None:
        s = _unit_scale(w, stacked)
    if b is None:
        b = _zeros_like_bias(w, stacked, w.shape[-1])
    layer = p["in_proj"].get("_layer", 0)
    return _make_pre(layer, bits, eps, interpret)(
        x, p["norm1"]["scale"], p["norm1"]["bias"], w, s, b)


def post_attention(p, x, attn, eps: float = 1e-5, approx: bool = False,
                   interpret: bool = False):
    """x + ls1 * out_proj(attn) -> + ls2 * MLP(norm2). x/attn: (T, dm).
    layer_scale_1/2 default to ones (the backbone); the mimi transformer
    passes its per-channel LayerScale vectors."""
    wo, so, bo, bits = _qw(p["out_proj"])
    w1, s1, b1, _ = _qw(p["linear1"])
    w2, s2, b2, _ = _qw(p["linear2"])
    stacked = wo.ndim == 3
    dm = wo.shape[-1]
    if so is None:
        so = _unit_scale(wo, stacked)
    if s1 is None:
        s1 = _unit_scale(w1, stacked)
    if s2 is None:
        s2 = _unit_scale(w2, stacked)
    if bo is None:
        bo = _zeros_like_bias(wo, stacked, dm)
    if b1 is None:
        b1 = _zeros_like_bias(w1, stacked, w1.shape[-1])
    if b2 is None:
        b2 = _zeros_like_bias(w2, stacked, w2.shape[-1])
    ones = jnp.ones((dm,), x.dtype)
    ls1 = p.get("layer_scale_1", {}).get("scale", ones)
    ls2 = p.get("layer_scale_2", {}).get("scale", ones)
    layer = p["out_proj"].get("_layer", 0)
    return _make_post(layer, bits, eps, approx, interpret)(
        x, attn, wo, so, bo, ls1, ls2,
        p["norm2"]["scale"], p["norm2"]["bias"], w1, s1, b1, w2, s2, b2)
