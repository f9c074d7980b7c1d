"""Mimi decoder transformer: 2 layers, d=512, 8 heads, ring-buffer KV cache
(context = capacity = 250), eps=0 LayerNorm, LayerScale on both branches.

ref: /root/reference/src/pocket_tts/modules/mimi_transformer.h (layer
:912-973, ring cache :149-287, stack :1184-1217) and the defaults at
models/defaults.h:3-42. The reference's hand-rolled cached-graph runtime
(:1219-1331) is unnecessary here — jax.jit compiles the step once.

Params (layers stacked on axis 0):
  layers: {norm1 {scale,bias}, in_proj {w}, out_proj {w},
           layer_scale_1 {scale (d,)}, norm2 {scale,bias},
           linear1 {w,b?}, linear2 {w,b?}, layer_scale_2 {scale}}
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import MimiTransformerConfig
from ..ops.attention import (cache_insert_ring, cross_attention,
                             cross_attn_kv, ring_cache_bias, sdpa_seg)
from ..ops.basic import gelu, layer_norm, linear, rms_norm
from ..ops.rope import apply_rope_halves as apply_rope, rope_cos_sin


@struct.dataclass
class MimiTransformerState:
    # per-layer tuples — see backbone.BackboneState for the aliasing
    # rationale. Rows are stored FLAT (cap, H*Dh) like the backbone cache:
    # the 4-D (cap, H, Dh) variant made the per-frame ring insert a
    # full-cache relayout copy at batch (16 us x4 per frame measured) and
    # fed the attention einsum a layout it could only read as VPU loops.
    k: tuple          # L x (cap, H*Dh) — int8 when cfg.quantize_kv
    v: tuple          # L x (cap, H*Dh)
    offset: jax.Array  # () int32 — total timesteps seen (batch-uniform)
    # first timestep owned by this stream: 0 solo; under continuous batching
    # a lane joining a running batch records the shared offset at admission,
    # making RoPE phases and the ring window relative to its own start (so
    # its audio equals solo synthesis). Per-stream under vmap.
    start: jax.Array   # () int32
    # per-row f32 dequant scales, L x (cap,) — int8-KV mode only
    k_scale: tuple = None
    v_scale: tuple = None
    # cross-attention conditioning KV, L x (S, H, Dh) — only when the
    # checkpoint ships mimi-stack cross_attention weights AND the caller
    # provided a conditioning sequence (init_cross). The reference computes
    # these once per stream at state init (moshi_smha init,
    # mimi_transformer.h:343-396) — same here: forward() only reads them.
    xk: tuple = None
    xv: tuple = None


def init_state(cfg: MimiTransformerConfig, dtype=jnp.float32):
    shape = (cfg.capacity, cfg.num_heads * cfg.head_dim)
    cache_dtype = jnp.int8 if cfg.quantize_kv else dtype
    scales = (tuple(jnp.zeros((cfg.capacity,), jnp.float32)
                    for _ in range(cfg.num_layers))
              if cfg.quantize_kv else None)
    return MimiTransformerState(
        k=tuple(jnp.zeros(shape, cache_dtype)
                for _ in range(cfg.num_layers)),
        v=tuple(jnp.zeros(shape, cache_dtype)
                for _ in range(cfg.num_layers)),
        offset=jnp.zeros((), jnp.int32),
        start=jnp.zeros((), jnp.int32),
        k_scale=scales,
        v_scale=scales,
    )


def init_cross(p, cfg: MimiTransformerConfig, state: MimiTransformerState,
               cond):
    """Precompute per-layer cross-attention KV from a conditioning sequence
    (S, d_model) — the reference's moshi_smha_state init with
    condition_cross (mimi_transformer.h:343-396). No-op (returns state
    unchanged) when the checkpoint ships no mimi-stack cross weights."""
    from ..ops.basic import slice_layer_params
    xks, xvs = [], []
    for l in range(cfg.num_layers):
        layer_p = slice_layer_params(p["layers"], l)
        if "cross_attention" not in layer_p:
            return state
        k, v = cross_attn_kv(layer_p["cross_attention"]["in_proj"], cond,
                             cfg.num_heads)
        xks.append(k)
        xvs.append(v)
    return state.replace(xk=tuple(xks), xv=tuple(xvs))


def _norm_any(p, x, eps: float):
    """LayerNorm, or the moshi RMSNorm variant when the checkpoint ships
    norm*.alpha (moshi_streaming_transformer_layer routes per layer —
    mimi_transformer.h:924,949; RMS eps is moshi's 1e-8 default)."""
    if "alpha" in p:
        return rms_norm(p, x)
    return layer_norm(p, x, eps=eps)


def _layer(p, x, k_cache, v_cache, k_scale, v_scale, offset, start, cos,
           sin, bias, cfg, gelu_approx: bool, pallas_mode: str,
           xk=None, xv=None):
    t, dm = x.shape
    fused = False
    # cfg.mesh None: no GSPMD partitioning for the fused kernels (the XLA
    # linears handle TP under a mesh)
    if pallas_mode != "off" and "gating" not in p and cfg.mesh is None:
        from ..ops import fused_layer
        fused = fused_layer.supported(p)
    if fused:
        # norm1 + in_proj in one Pallas call (see ops/fused_layer.py; the
        # same kernels serve the backbone — here with eps=cfg.norm_eps and
        # the LayerScale vectors applied on both branches)
        qkv = fused_layer.pre_attention(
            p, x, eps=cfg.norm_eps, interpret=(pallas_mode == "interpret"))
    else:
        h = _norm_any(p["norm1"], x, cfg.norm_eps)
        qkv = linear(p["in_proj"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(t, cfg.num_heads, cfg.head_dim)
    k = k.reshape(t, cfg.num_heads, cfg.head_dim)
    v = v.reshape(t, cfg.num_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    quant = k_cache.dtype == jnp.int8
    k_rows = k.reshape(t, dm)
    v_rows = v.reshape(t, dm)
    if quant:
        from .backbone import quantize_rows
        k_rows, k_s = quantize_rows(k_rows)
        v_rows, v_s = quantize_rows(v_rows)
    if pallas_mode != "off":
        # fused ring insert + attention: one kernel writes the 16 new rows
        # (a 16-row DMA satisfies the bf16 tiling; int8 composes the
        # enclosing 32-row aligned window), computes the ring bias from
        # iota arithmetic, and attends old cache + new block in a single
        # flash merge (ops/pallas_mimi.py)
        from ..ops.pallas_mimi import ring_insert_attention
        if quant:
            attn, k_cache, v_cache, k_scale, v_scale = ring_insert_attention(
                q.reshape(t, dm), k_rows, v_rows, k_cache, v_cache,
                offset, start, num_heads=cfg.num_heads, context=cfg.context,
                interpret=(pallas_mode == "interpret"), mesh=cfg.mesh,
                ks_new=k_s, vs_new=v_s, k_scale=k_scale, v_scale=v_scale)
        else:
            attn, k_cache, v_cache = ring_insert_attention(
                q.reshape(t, dm), k_rows, v_rows, k_cache, v_cache,
                offset, start, num_heads=cfg.num_heads, context=cfg.context,
                interpret=(pallas_mode == "interpret"), mesh=cfg.mesh)
    else:
        k_cache = cache_insert_ring(k_cache, k_rows, offset)
        v_cache = cache_insert_ring(v_cache, v_rows, offset)
        if quant:
            # XLA fallback: ring-insert the scale rows too, dequantize in
            # full (the Pallas kernel above is the fast path)
            k_scale = cache_insert_ring(k_scale, k_s, offset)
            v_scale = cache_insert_ring(v_scale, v_s, offset)
            k_deq = (k_cache.astype(jnp.float32)
                     * k_scale[:, None]).astype(q.dtype)
            v_deq = (v_cache.astype(jnp.float32)
                     * v_scale[:, None]).astype(q.dtype)
        else:
            k_deq = k_cache.astype(q.dtype)
            v_deq = v_cache.astype(q.dtype)
        attn = sdpa_seg(q, k_deq, v_deq, bias)
    if fused:
        return (fused_layer.post_attention(
            p, x, attn.reshape(t, dm), eps=cfg.norm_eps,
            approx=gelu_approx,
            interpret=(pallas_mode == "interpret")),
            k_cache, v_cache, k_scale, v_scale)
    x = x + p["layer_scale_1"]["scale"] * linear(
        p["out_proj"], attn.reshape(t, dm))
    if "cross_attention" in p and xk is not None:
        # cross-attention sub-block between the self-attn residual and the
        # FF block: norm_cross (always a LayerNorm) -> q-only projection
        # against the precomputed conditioning KV -> residual, NO layer
        # scale (mimi_transformer.h:939-947)
        cq = layer_norm(p["norm_cross"], x, eps=cfg.norm_eps)
        x = x + cross_attention(p["cross_attention"], cq, xk, xv,
                                cfg.num_heads)
    h = _norm_any(p["norm2"], x, cfg.norm_eps)
    if "gating" in p:
        # SwiGLU gating replaces the linear1/gelu/linear2 MLP when the
        # checkpoint ships gating weights (dead in the shipped pocket-tts
        # models — defaults.h gating={} — but the reference carries the
        # path: moshi_transformer_layer via gating.h:16-38)
        from ..ops.gating import weights_per_step_gating
        up = weights_per_step_gating(p["gating"], h, offset=offset)
    else:
        up = linear(p["linear2"], gelu(linear(p["linear1"], h), gelu_approx))
    x = x + p["layer_scale_2"]["scale"] * up
    return x, k_cache, v_cache, k_scale, v_scale


def forward(p, cfg: MimiTransformerConfig, state: MimiTransformerState, x,
            gelu_approx: bool = False):
    """x: (T, d_model) -> (new_state, y). Advances offset by T
    (ref: mimi_transformer.h:1214)."""
    t = x.shape[0]
    # positions are stream-relative (offset == start for solo streams' 0)
    positions = state.offset - state.start + jnp.arange(t, dtype=jnp.int32)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.max_period)
    use_pallas = cfg.use_pallas_attn
    if use_pallas is None:  # auto: Mosaic kernel on TPU, XLA elsewhere
        use_pallas = jax.default_backend() == "tpu"
    # the kernel hard-codes the -1e9 mask and needs a T-aligned ring;
    # int8-KV additionally needs the 32-row aligned insert window
    use_pallas = (use_pallas and cfg.capacity % t == 0
                  and cfg.mask_value == -1e9)
    if cfg.quantize_kv:
        use_pallas = (use_pallas and cfg.capacity % 32 == 0
                      and 32 % t == 0)
    if use_pallas:
        pallas_mode = ("interpret" if jax.default_backend() == "cpu"
                       else "tpu")
        bias = None
    else:
        pallas_mode = "off"
        bias = ring_cache_bias(t, cfg.capacity, state.offset, cfg.context,
                               neg=cfg.mask_value, start=state.start)

    from ..ops.basic import slice_layer_params
    k_new, v_new, ks_new, vs_new = [], [], [], []
    for l in range(cfg.num_layers):
        layer_p = slice_layer_params(p["layers"], l)
        ks = state.k_scale[l] if state.k_scale is not None else None
        vs = state.v_scale[l] if state.v_scale is not None else None
        x, k_l, v_l, ks_l, vs_l = _layer(
            layer_p, x, state.k[l], state.v[l], ks, vs,
            state.offset, state.start, cos, sin, bias,
            cfg, gelu_approx, pallas_mode,
            xk=state.xk[l] if state.xk is not None else None,
            xv=state.xv[l] if state.xv is not None else None)
        k_new.append(k_l)
        v_new.append(v_l)
        ks_new.append(ks_l)
        vs_new.append(vs_l)
    quant = state.k_scale is not None
    return state.replace(
        k=tuple(k_new), v=tuple(v_new),
        k_scale=tuple(ks_new) if quant else None,
        v_scale=tuple(vs_new) if quant else None,
        offset=state.offset + t), x
