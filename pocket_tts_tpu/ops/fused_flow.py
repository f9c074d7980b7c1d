"""Whole-flow-net Pallas kernel (SimpleMLPAdaLN in one call).

The flow net is ~22 tiny 512-dim matvecs per frame (6 AdaLN res blocks x
3 linears + conditioning/head) — at decode each is its own dispatch on a
(B, 512) activation, all overhead. This kernel runs the ENTIRE network in
one grid step: the conditioning branch (t_comb + cond_embed, silu'd once
— it is loop-invariant across blocks), the unrolled res blocks, and the
final AdaLN head, with the stacked quantized weights resident in VMEM
(~2-4 MB int4/int8).

Quantized weights only (same measurement as ops/fused_layer.supported:
bf16 weight streams lose XLA's cross-op prefetch pipelining; at int4/int8
the stream is small and dispatch count dominates). Norms/silu/gelu-free
elementwise in f32 (v5e has no bf16 ALU); dots bf16 x f32-accumulate.

ref: simple_mlp_adaln_forward /root/reference/src/pocket_tts/modules/
mlp.h:124-140,156-170,233-251; the math mirrors models/flow_mlp.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_layer import _qw  # shared quantized-layout probe
from .quant_matmul import _int4_dots, grouped_int4_acc


def _silu32(x):
    x32 = x.astype(jnp.float32)
    return x32 / (1.0 + jnp.exp(-x32))


def _ln32(x32, scale, bias, eps):
    """scale/bias: (1, dim) values."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _deq_dot(x32, w_ref, s_ref, b_ref, bits, dt, idx=None):
    """x (B, K) f32 @ dequant(w[idx]) * scale + bias -> (B, N) f32.

    A multi-row scale block ((KG, N), io/quant.py group>0) routes through
    quant_matmul.grouped_int4_acc — block-diagonal raw-byte partials at
    B==1, in-place dequant at batch — with the scales applied inside."""
    w = w_ref[idx] if idx is not None else w_ref[...]
    s = (s_ref[idx] if idx is not None else s_ref[...]).astype(jnp.float32)
    xb = x32.astype(dt)
    if bits == 4:
        kh = w.shape[0]
        if s.shape[0] > 1:
            acc = grouped_int4_acc(xb[:, :kh], xb[:, kh:], w, s)
        else:
            acc = _int4_dots(xb[:, :kh], xb[:, kh:], w) * s
    else:
        acc = jax.lax.dot_general(xb, w.astype(dt), (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) * s
    if b_ref is not None:
        b = (b_ref[idx] if idx is not None else b_ref[...])
        acc = acc + b.astype(jnp.float32)
    return acc


def _kernel(x_ref, c_ref, tc_ref,
            wi_ref, si_ref, bi_ref, wc_ref, sc_ref, bc_ref,
            lns_ref, lnb_ref, wa_ref, sa_ref, ba_ref,
            w0_ref, s0_ref, b0_ref, w2_ref, s2_ref, b2_ref,
            fns_ref, fnb_ref, wfa_ref, sfa_ref, bfa_ref,
            wf_ref, sf_ref, bf_ref, o_ref,
            *, depth, dim, bits_map):
    dt = x_ref.dtype
    bi_b, bc_b, ba_b, b0_b, b2_b, bfa_b, bf_b = bits_map
    # conditioning: y = silu(t_comb + cond_embed(c)) — loop-invariant
    y = (tc_ref[...].astype(jnp.float32)
         + _deq_dot(c_ref[...].astype(jnp.float32), wc_ref, sc_ref, bc_ref,
                    bc_b, dt))
    sy = _silu32(y)
    h = _deq_dot(x_ref[...].astype(jnp.float32), wi_ref, si_ref, bi_ref,
                 bi_b, dt)
    for i in range(depth):
        mod = _deq_dot(sy, wa_ref, sa_ref, ba_ref, ba_b, dt, idx=i)
        shift, scale, gate = (mod[:, :dim], mod[:, dim: 2 * dim],
                              mod[:, 2 * dim:])
        hn = _ln32(h, lns_ref[i], lnb_ref[i], 1e-6)
        hn = hn * (1.0 + scale) + shift
        hh = _deq_dot(_silu32(_deq_dot(hn, w0_ref, s0_ref, b0_ref, b0_b,
                                       dt, idx=i)),
                      w2_ref, s2_ref, b2_ref, b2_b, dt, idx=i)
        h = h + gate * hh
    mod = _deq_dot(sy, wfa_ref, sfa_ref, bfa_ref, bfa_b, dt)
    shift, scale = mod[:, :dim], mod[:, dim:]
    hn = _ln32(h, fns_ref[...], fnb_ref[...], 1e-6)
    hn = hn * (1.0 + scale) + shift
    out = _deq_dot(hn, wf_ref, sf_ref, bf_ref, bf_b, dt)
    o_ref[...] = out.astype(o_ref.dtype)


def supported(p) -> bool:
    """The BIG flow linears (cond_embed, per-block adaln/mlp_0/mlp_2,
    final adaln) must share one quantized layout; the tiny latent-facing
    projections (input_proj, final linear — a few KB) may stay plain
    weights (they fall under the quantization size floor)."""
    big = [p["cond_embed"], p["res_blocks"]["adaln"],
           p["res_blocks"]["mlp_0"], p["res_blocks"]["mlp_2"],
           p["final"]["adaln"]]
    small = (p["input_proj"], p["final"]["linear"])
    bits = {_qw(m)[3] for m in big}
    small_ok = all(_qw(m)[3] in (4, 8, 16) for m in small)
    # K-grouped (Q4_0) scales are handled in-kernel (int4 only — see
    # io/quant._quantize_weight: grouping never applies to int8)
    return len(bits) == 1 and bits.issubset({4, 8}) and small_ok


def _prep(p):
    """Flatten the params into kernel operands (zeros for missing biases,
    ones/zeros for the final norm's optional affine)."""

    def lin(m, stacked):
        w, s, b, bits = _qw(m)
        n = w.shape[-1]
        if s is None:  # plain weight: unit scales
            s = jnp.ones(((w.shape[0], n) if stacked else (n,)),
                         jnp.float32)
        if b is None:
            b = jnp.zeros(((w.shape[0], n) if stacked else (n,)),
                          jnp.bfloat16)
        kg = s.shape[-2] if s.ndim == w.ndim else 1  # K-grouped rows
        s2 = (s.reshape(-1, kg, n) if stacked else s.reshape(kg, n))
        b2 = (b.reshape(-1, 1, n) if stacked else b.reshape(1, n))
        return w, s2, b2, bits  # storage dtype; kernels upcast

    rb = p["res_blocks"]
    wi, si, bi, bi_b = lin(p["input_proj"], False)
    wc, sc, bc, bc_b = lin(p["cond_embed"], False)
    wa, sa, ba, ba_b = lin(rb["adaln"], True)
    w0, s0, b0, b0_b = lin(rb["mlp_0"], True)
    w2, s2, b2, b2_b = lin(rb["mlp_2"], True)
    wfa, sfa, bfa, bfa_b = lin(p["final"]["adaln"], False)
    wf, sf, bf, bf_b = lin(p["final"]["linear"], False)
    bits_map = (bi_b, bc_b, ba_b, b0_b, b2_b, bfa_b, bf_b)
    dim = wa.shape[-1] // 3
    depth = wa.shape[0]
    inln = rb.get("in_ln") or {}
    lns = inln.get("scale")
    lnb = inln.get("bias")
    # in_ln is non-affine in the reference checkpoints (mlp.h res block)
    lns = (jnp.broadcast_to(jnp.ones((1, 1, dim), jnp.float32),
                            (depth, 1, dim)) if lns is None
           else lns.reshape(depth, 1, dim))
    lnb = (jnp.broadcast_to(jnp.zeros((1, 1, dim), jnp.float32),
                            (depth, 1, dim)) if lnb is None
           else lnb.reshape(depth, 1, dim))
    fnorm = p["final"].get("norm") or {}
    fns = fnorm.get("scale")
    fnb = fnorm.get("bias")
    if fns is None:
        fns = jnp.ones((dim,), jnp.float32)
    if fnb is None:
        fnb = jnp.zeros((dim,), jnp.float32)
    return (bits_map, depth, dim,
            (wi, si, bi, wc, sc, bc, lns, lnb, wa, sa, ba,
             w0, s0, b0, w2, s2, b2, fns.reshape(1, -1), fnb.reshape(1, -1),
             wfa, sfa, bfa, wf, sf, bf))


@functools.lru_cache(maxsize=None)
def _make_flow(bits_map, depth, dim, interpret):
    def call(x, c, tc, *weights):
        bsz = x.shape[0]
        (wi, si, bi, wc, sc, bc, lns, lnb, wa, sa, ba,
         w0, s0, b0, w2, s2, b2, fns, fnb, wfa, sfa, bfa, wf, sf, bf) \
            = weights

        def wspec(arr):
            nd = arr.ndim
            return pl.BlockSpec(arr.shape, lambda nd=nd: (0,) * nd,
                                memory_space=pltpu.VMEM)

        latent = wf.shape[-1]
        kernel = functools.partial(_kernel, depth=depth, dim=dim,
                                   bits_map=bits_map)
        return pl.pallas_call(
            kernel,
            in_specs=[wspec(x), wspec(c), wspec(tc)]
            + [wspec(w) for w in (wi, si, bi, wc, sc, bc, lns, lnb,
                                  wa, sa, ba, w0, s0, b0, w2, s2, b2,
                                  fns, fnb, wfa, sfa, bfa, wf, sf, bf)],
            out_specs=pl.BlockSpec((bsz, latent), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, latent), x.dtype),
            interpret=interpret,
            name="flow_net_fused",
        )(x, c, tc, wi, si, bi, wc, sc, bc, lns, lnb, wa, sa, ba,
          w0, s0, b0, w2, s2, b2, fns, fnb, wfa, sfa, bfa, wf, sf, bf)

    @jax.custom_batching.custom_vmap
    def fn(x, c, tc, *weights):
        return call(x[None], c[None], tc, *weights)[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, x, c, tc, *weights):
        assert in_batched[0] and in_batched[1], in_batched
        assert not any(in_batched[2:]), "weights/t_comb are batch-shared"
        out = call(x, c, tc, *weights)
        return out, True

    return fn


def flow_forward(p, c, x, t_combined, interpret: bool = False):
    """Fused flow_mlp.forward: c (d_model,), x (latent,) -> (latent,).
    Batch via vmap (the custom rule keeps the weights shared). Requires
    supported(p)."""
    bits_map, depth, dim, weights = _prep(p)
    tc = t_combined.reshape(1, -1)
    return _make_flow(bits_map, depth, dim, interpret)(x, c, tc, *weights)
