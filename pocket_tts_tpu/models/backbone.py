"""FlowLM streaming transformer backbone (6 layers, d=1024, 16 heads).

Functional re-design of the reference's stateful streaming transformer
(`src/pocket_tts/modules/transformer.h`): the mutable KV tensors + host-side
`current_end` become a fixed-shape pytree carry, and the host-built dense
prefill mask becomes position arithmetic on device.

Slot/position decoupling: KV rows are written at a *batch-uniform* slot
cursor (`end`, kept unbatched under vmap so inserts stay plain
dynamic_update_slice — no scatter), while each slot records the *per-stream*
absolute position it holds (`pos`, -1 = padding/invalid). RoPE and causality
use positions; padding rows are invalid forever and cost only slots.

Params pytree (layers stacked on axis 0 for lax.scan):
  layers: {norm1 {scale,bias}, in_proj {w (dm, 3dm), b?},
           out_proj {w (dm, dm), b?}, norm2 {scale,bias},
           linear1 {w (dm, hidden), b?}, linear2 {w (hidden, dm), b?}}
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import BackboneConfig
from ..ops.attention import (cross_attention, merge_attn_partials,
                             pos_cache_bias, prefix_attn_stats, sdpa,
                             sdpa_decode_seg, sdpa_decode_seg_stats,
                             sdpa_seg_stats)
from ..ops.basic import gelu, layer_norm, linear
from ..ops.rope import apply_rope_halves as apply_rope, rope_cos_sin


@struct.dataclass
class BackboneState:
    # k/v are per-layer tuples (not a stacked (L, ...) array): each layer's
    # cache is an independent pytree leaf so the per-step
    # dynamic_update_slice aliases its buffer in place — a stacked array
    # threaded through a layer-scan would be fully re-materialized (xs slice
    # + ys stack) every frame, which at batch 32 is GBs of HBM traffic.
    # Rows are stored FLAT (S, H*Dh): the decode attention matmuls consume
    # that layout directly; reshaping a cache inside jit breaks in-place
    # aliasing and was measured as 12 full-cache copies per frame.
    k: tuple          # L x (S, H*Dh) — int8 when cfg.quantize_kv
    v: tuple          # L x (S, H*Dh)
    pos: jax.Array      # (S,) int32 — absolute position per slot, -1 invalid
    end: jax.Array      # () int32 — next write slot (batch-uniform)
    next_pos: jax.Array  # () int32 — next absolute position (per-stream)
    # per-row absmax dequant scales, (S,) f32 per layer; None unless the
    # int8 KV cache is enabled (None subtrees vanish from the pytree, so
    # nothing else changes shape)
    k_scale: tuple = None
    v_scale: tuple = None
    # Prefix+ring mode (continuous serving): when set — () int32, the first
    # ring slot — the slot cursor wraps inside [ring_start, capacity)
    # instead of exhausting, and decode attention reads the FULL cache
    # every frame (pos masking handles unwritten/stale slots). Rationale:
    # slots [0, ring_start) hold every lane's long-lived prompt+text
    # prefix; decode rows only need to survive capacity - ring_start
    # frames, the admission-time bound on a request's length. Measured on
    # v5e: full-array cache reads stream at ~1.7x the bandwidth of
    # partial-prefix reads of a larger array, so a snug ring beats a big
    # exhausted-then-compacted linear cache twice over — smaller reads AND
    # faster per byte, with no compaction pauses. None = linear mode.
    ring_start: jax.Array = None
    # Shared-prefix serving (vLLM-style prompt KV sharing; no analog in
    # the single-stream reference): pk/pv are per-layer (Pv, H*D) tables
    # holding ALL registered voices' prompt KV concatenated, kept
    # batch-UNBATCHED under vmap so XLA contracts them as a shared matmul
    # operand — the prompt bytes stream from HBM once per frame for the
    # whole batch instead of once per lane, and the per-lane cache keeps
    # only text+decode rows. ppos is the per-LANE (Pv,) position row:
    # the lane's own voice segment carries the prompt positions, every
    # other slot is -1 (masked) — multi-voice sharing by masking alone,
    # no gathers. See ops/attention.prefix_attn_stats.
    pk: tuple = None
    pv: tuple = None
    ppos: jax.Array = None
    # Cross-attention conditioning KV (per-layer tuples of (S_c, H, D)),
    # computed ONCE from the conditioning sequence by init_cross and read
    # every step — the functional analog of the reference's cached
    # k_cross/v_cross state (mimi_transformer.h:314-338). None (the
    # shipped-checkpoint case: defaults.h:18 cross_attention=false) makes
    # the fields vanish from the pytree. Per-lane under vmap.
    xk: tuple = None
    xv: tuple = None


def init_state(cfg: BackboneConfig, dtype=jnp.float32) -> BackboneState:
    shape = (cfg.kv_capacity, cfg.num_heads * cfg.head_dim)
    cache_dtype = jnp.int8 if cfg.quantize_kv else dtype
    scales = (tuple(jnp.zeros((cfg.kv_capacity,), jnp.float32)
                    for _ in range(cfg.num_layers))
              if cfg.quantize_kv else None)
    return BackboneState(
        k=tuple(jnp.zeros(shape, cache_dtype) for _ in range(cfg.num_layers)),
        v=tuple(jnp.zeros(shape, cache_dtype) for _ in range(cfg.num_layers)),
        pos=jnp.full((cfg.kv_capacity,), -1, jnp.int32),
        end=jnp.zeros((), jnp.int32),
        next_pos=jnp.zeros((), jnp.int32),
        k_scale=scales,
        v_scale=scales,
    )


def init_cross(p, cfg: BackboneConfig, state: BackboneState,
               cond) -> BackboneState:
    """Fill the cross-attention KV cache from a conditioning sequence.

    cond: (S_c, d_model). Mirrors the reference's once-per-stream smha
    init (mimi_transformer.h:343-396): each layer's k_cross/v_cross come
    from its cross_attention.in_proj applied to cond. Requires the
    checkpoint to ship cross weights ("cross_attention" in p["layers"]).
    """
    from ..ops.attention import cross_attn_kv
    from ..ops.basic import slice_layer_params
    xk, xv = [], []
    for l in range(cfg.num_layers):
        layer_p = slice_layer_params(p["layers"], l)
        k, v = cross_attn_kv(layer_p["cross_attention"]["in_proj"], cond,
                             cfg.num_heads)
        xk.append(k)
        xv.append(v)
    return state.replace(xk=tuple(xk), xv=tuple(xv))


def quantize_rows(x):
    """(T, H*D) -> (int8 rows, (T,) f32 absmax scales)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def _layer(p, x, k_cache, v_cache, k_scale, v_scale, end, cos, sin, bias,
           pos_vec, num_heads: int, gelu_approx: bool, pallas_mode: str,
           mesh=None, read_end=None, cur_pos=None, fuse_insert=True,
           use_megalayer=False, prefix=None, cross=None):
    """One pre-LN layer. ref: streaming_transformer_layer_forward,
    transformer.h:253-278; attention transformer.h:55-199.

    pallas_mode: "off" (XLA sdpa), "tpu" or "interpret" — use the Pallas
    flash-decode kernel that only reads the live cache prefix (T==1 only).
    fuse_insert: fold the KV-row insert into the attention kernel
    (ops/pallas_attn.decode_insert_attention) instead of per-layer
    dynamic_update_slice dispatches.
    """
    t, dm = x.shape
    fused = False
    # mesh is None: the fused layer kernels have no GSPMD partitioning (and
    # TP shards their weights) — under a mesh the XLA linears handle TP
    if pallas_mode != "off" and t == 1 and mesh is None and cross is None:
        from ..ops import fused_layer
        fused = fused_layer.supported(p)
    if fused and use_megalayer:
        # whole layer in ONE Pallas call (solo decode; under vmap the
        # custom rule delegates to the 3-call path) — ops/fused_step.py
        from ..ops import fused_step
        interp = pallas_mode == "interpret"
        re_ = end if read_end is None else read_end
        outs = fused_step.megalayer(
            p, x, cos, sin, cur_pos, k_cache, v_cache, pos_vec, re_, end,
            k_scale=k_scale, v_scale=v_scale, gelu_approx=gelu_approx,
            interpret=interp)
        if k_scale is not None:
            return outs
        return outs + (k_scale, v_scale)
    if fused:
        # norm1 + in_proj in one Pallas call (quantized decode path): the
        # per-frame cost at batch is dominated by small-op dispatch, not
        # bytes — see ops/fused_layer.py
        qkv = fused_layer.pre_attention(
            p, x, interpret=(pallas_mode == "interpret"))
    else:
        h = layer_norm(p["norm1"], x, eps=1e-5)
        qkv = linear(p["in_proj"], h)                   # (T, 3*dm)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(t, num_heads, dm // num_heads)
    k = k.reshape(t, num_heads, dm // num_heads)
    v = v.reshape(t, num_heads, dm // num_heads)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    s_cap = k_cache.shape[-2]
    k_rows = k.reshape(t, dm)
    v_rows = v.reshape(t, dm)
    quant = k_cache.dtype == jnp.int8
    stats = prefix is not None
    if stats:
        # shared-prefix partial (prompt KV contracted as a shared matmul
        # operand), merged with the per-lane cache partial below
        o1, m1, l1 = prefix_attn_stats(q, *prefix)
    if pallas_mode != "off" and t == 1 and fuse_insert:
        # fused insert + flash decode: the per-layer DUS dispatches (2-4
        # per layer, ~50 us/frame of fixed cost at batch 32) fold into
        # the attention kernel; the row is merged analytically and
        # written back by an overlapped aligned-window DMA
        from ..ops.pallas_attn import decode_insert_attention
        interp = pallas_mode == "interpret"
        re_ = end if read_end is None else read_end
        if quant:
            k_q, k_s = quantize_rows(k_rows)
            v_q, v_s = quantize_rows(v_rows)
            attn1, k_cache, v_cache, k_scale, v_scale, *st = (
                decode_insert_attention(
                    q[0], k_q, v_q, cur_pos, k_cache, v_cache, pos_vec,
                    re_, end, k_scale=k_scale, v_scale=v_scale,
                    ks_new=k_s[0], vs_new=v_s[0], interpret=interp,
                    mesh=mesh, stats=stats))
        else:
            attn1, k_cache, v_cache, *st = decode_insert_attention(
                q[0], k_rows.astype(k_cache.dtype),
                v_rows.astype(v_cache.dtype), cur_pos, k_cache, v_cache,
                pos_vec, re_, end, interpret=interp, mesh=mesh,
                stats=stats)
        if stats:
            attn1 = merge_attn_partials(o1[0], m1[0], l1[0],
                                        attn1, st[0], st[1])
        if fused:
            x = fused_layer.post_attention(
                p, x, attn1.reshape(t, dm), approx=gelu_approx,
                interpret=interp)
        else:
            x = _post_ff(p, x, attn1.reshape(t, dm), cross, num_heads,
                         gelu_approx)
        return x, k_cache, v_cache, k_scale, v_scale
    if quant:
        k_q, k_s = quantize_rows(k_rows)
        v_q, v_s = quantize_rows(v_rows)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_q, (end, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_q, (end, 0))
        k_scale = jax.lax.dynamic_update_slice(k_scale, k_s, (end,))
        v_scale = jax.lax.dynamic_update_slice(v_scale, v_s, (end,))
    else:
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_rows.astype(k_cache.dtype), (end, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_rows.astype(v_cache.dtype), (end, 0))
    if pallas_mode != "off" and t == 1:
        from ..ops.pallas_attn import decode_attention
        res = decode_attention(
            q[0], k_cache, v_cache, pos_vec,
            end if read_end is None else read_end,
            k_scale=k_scale, v_scale=v_scale,
            interpret=(pallas_mode == "interpret"), mesh=mesh,
            stats=stats)
        if stats:
            attn = merge_attn_partials(o1[0], m1[0], l1[0], *res)[None]
        else:
            attn = res[None]
    else:
        if quant:
            # XLA fallback: dequantize in full (correct everywhere; the
            # Pallas kernel above is the fast path this mode exists for)
            k_deq = (k_cache.astype(jnp.float32)
                     * k_scale[:, None]).astype(q.dtype)
            v_deq = (v_cache.astype(jnp.float32)
                     * v_scale[:, None]).astype(q.dtype)
        else:
            k_deq = k_cache.astype(q.dtype)
            v_deq = v_cache.astype(q.dtype)
        if stats:
            # shared-prefix mode: flash stats from the flat-cache seg
            # matmuls, merged with the prompt partial (t>1 = the text
            # prefill attending prompt + its own rows)
            fn = sdpa_decode_seg_stats if t == 1 else sdpa_seg_stats
            o2, m2, l2 = fn(q, k_deq, v_deq, bias)
            attn = merge_attn_partials(o1, m1, l1, o2, m2, l2)
        elif t == 1:
            # MXU-matmul formulation over the flat cache — the natural
            # einsum lowers to VPU multiply-reduce far below memory
            # bandwidth at T=1
            attn = sdpa_decode_seg(q, k_deq, v_deq, bias)
        else:
            # prefill: reshape copies the cache once per prefill call —
            # acceptable off the per-frame path.
            # NOTE: a lax.switch over static cache prefixes (read only the
            # live region) was measured 1.8x SLOWER batched — XLA copies
            # the sliced cache into each branch.
            attn = sdpa(q,
                        k_deq.reshape(s_cap, num_heads, dm // num_heads),
                        v_deq.reshape(s_cap, num_heads, dm // num_heads),
                        bias)
    if fused:
        # out_proj + residual + norm2 + MLP + residual in one Pallas call
        x = fused_layer.post_attention(
            p, x, attn.reshape(t, dm), approx=gelu_approx,
            interpret=(pallas_mode == "interpret"))
    else:
        x = _post_ff(p, x, attn.reshape(t, dm), cross, num_heads,
                     gelu_approx)
    return x, k_cache, v_cache, k_scale, v_scale


def _post_ff(p, x, attn_rows, cross, num_heads: int, gelu_approx: bool):
    """Unfused layer tail: out_proj residual, optional cross-attention
    sub-block, MLP residual. Cross-attention sits BETWEEN the self-attn
    residual and the FF block, with its own LayerNorm and a residual add
    (ref: moshi_streaming_transformer_layer,
    src/pocket_tts/modules/mimi_transformer.h:939-947)."""
    x = x + linear(p["out_proj"], attn_rows)
    if cross is not None:
        cq = layer_norm(p["norm_cross"], x, eps=1e-5)
        x = x + cross_attention(p["cross_attention"], cq, cross[0],
                                cross[1], num_heads)
    h = layer_norm(p["norm2"], x, eps=1e-5)
    return x + linear(p["linear2"],
                      gelu(linear(p["linear1"], h), gelu_approx))


def _attend(qkv, k_cache, v_cache, k_scale, v_scale, end, cos, sin,
            pos_vec, num_heads: int, pallas_mode: str, read_end, cur_pos,
            fuse_insert):
    """The attention middle of _layer for the solo T==1 fast path: qkv
    (1, 3dm) -> (attn (1, dm), caches...). Factored out so the bilayer
    loop (_forward_bilayer) can interleave it with fused post+pre calls."""
    dm = k_cache.shape[-1]
    d = dm // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = apply_rope(q.reshape(1, num_heads, d), cos, sin)
    k = apply_rope(k.reshape(1, num_heads, d), cos, sin)
    k_rows = k.reshape(1, dm)
    v_rows = v.reshape(1, dm)
    quant = k_cache.dtype == jnp.int8
    interp = pallas_mode == "interpret"
    re_ = end if read_end is None else read_end
    if fuse_insert:
        from ..ops.pallas_attn import decode_insert_attention
        if quant:
            k_q, k_s = quantize_rows(k_rows)
            v_q, v_s = quantize_rows(v_rows)
            attn, k_cache, v_cache, k_scale, v_scale = (
                decode_insert_attention(
                    q[0], k_q, v_q, cur_pos, k_cache, v_cache, pos_vec,
                    re_, end, k_scale=k_scale, v_scale=v_scale,
                    ks_new=k_s[0], vs_new=v_s[0], interpret=interp))
        else:
            attn, k_cache, v_cache = decode_insert_attention(
                q[0], k_rows.astype(k_cache.dtype),
                v_rows.astype(v_cache.dtype), cur_pos, k_cache, v_cache,
                pos_vec, re_, end, interpret=interp)
        return attn.reshape(1, dm), k_cache, v_cache, k_scale, v_scale
    if quant:
        k_q, k_s = quantize_rows(k_rows)
        v_q, v_s = quantize_rows(v_rows)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_q, (end, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_q, (end, 0))
        k_scale = jax.lax.dynamic_update_slice(k_scale, k_s, (end,))
        v_scale = jax.lax.dynamic_update_slice(v_scale, v_s, (end,))
    else:
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_rows.astype(k_cache.dtype), (end, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_rows.astype(v_cache.dtype), (end, 0))
    from ..ops.pallas_attn import decode_attention
    attn = decode_attention(q[0], k_cache, v_cache, pos_vec, re_,
                            k_scale=k_scale, v_scale=v_scale,
                            interpret=interp)
    return attn.reshape(1, dm), k_cache, v_cache, k_scale, v_scale


def _forward_bilayer(p, cfg: BackboneConfig, state: BackboneState, x,
                     pos_vec, row_pos, cos, sin, read_end,
                     pallas_mode: str, gelu_approx: bool):
    """Solo int4 decode with post(l)+pre(l+1) fused per layer boundary
    (cfg.use_bilayer): 2L+2 Mosaic calls per frame instead of 3L."""
    from ..ops import fused_layer
    from ..ops.basic import slice_layer_params
    interp = pallas_mode == "interpret"
    lps = [slice_layer_params(p["layers"], l)
           for l in range(cfg.num_layers)]
    qkv = fused_layer.pre_attention(lps[0], x, interpret=interp)
    k_new, v_new, ks_new, vs_new = [], [], [], []
    for l in range(cfg.num_layers):
        ks = state.k_scale[l] if state.k_scale is not None else None
        vs = state.v_scale[l] if state.v_scale is not None else None
        attn, k_l, v_l, ks_l, vs_l = _attend(
            qkv, state.k[l], state.v[l], ks, vs, state.end, cos, sin,
            pos_vec, cfg.num_heads, pallas_mode, read_end, row_pos[0],
            cfg.fuse_insert)
        k_new.append(k_l)
        v_new.append(v_l)
        ks_new.append(ks_l)
        vs_new.append(vs_l)
        if l + 1 < cfg.num_layers:
            x, qkv = fused_layer.bilayer_post_pre(
                lps[l], lps[l + 1], x, attn, approx=gelu_approx,
                interpret=interp)
        else:
            x = fused_layer.post_attention(lps[l], x, attn,
                                           approx=gelu_approx,
                                           interpret=interp)
    return state.replace(
        k=tuple(k_new), v=tuple(v_new), pos=pos_vec,
        k_scale=tuple(ks_new) if state.k_scale is not None else None,
        v_scale=tuple(vs_new) if state.v_scale is not None else None), x


def forward(p, cfg: BackboneConfig, state: BackboneState, x, n_valid=None,
            gelu_approx: bool = False):
    """Run T new rows through all layers, writing KV at slot state.end.

    x: (T, d_model); rows >= n_valid are padding (flagged invalid, masked by
    every future step). Returns (new_state, y (T, d_model)); the caller
    advances the cursors with `advance` — mirroring the reference's explicit
    increment_states (src/pocket_tts.cpp:72-98).
    """
    t = x.shape[0]
    if n_valid is None:
        n_valid = t
    positions = state.next_pos + jnp.arange(t, dtype=jnp.int32)
    row_pos = jnp.where(jnp.arange(t) < n_valid, positions, -1)
    pos_vec = jax.lax.dynamic_update_slice(state.pos, row_pos, (state.end,))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.max_period)
    use_pallas = cfg.use_pallas_attn
    if use_pallas is None:  # auto: Mosaic kernel on TPU, XLA elsewhere
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and t == 1:
        pallas_mode = ("interpret" if jax.default_backend() == "cpu"
                       else "tpu")
        bias = None
    else:
        pallas_mode = "off"
        bias = pos_cache_bias(positions, pos_vec, neg=cfg.mask_value)

    from ..ops.basic import slice_layer_params
    # prefix+ring mode: after warmup the whole cache is live, so the flash
    # kernel reads it all — a full-array read also streams ~1.7x faster
    # than a same-sized prefix of a larger array (see BackboneState)
    read_end = (None if state.ring_start is None
                else jnp.asarray(state.k[0].shape[-2] - 1, jnp.int32))
    share = state.pk is not None
    # cross-attention layers take the plain composed path: the fused
    # kernels bake the out_proj->norm2->MLP tail with no cross sub-block
    # (dead in shipped checkpoints — correctness over fusion here, like
    # mimi's gating path)
    has_cross = state.xk is not None
    if (cfg.use_bilayer and pallas_mode != "off" and t == 1
            and cfg.mesh is None and not share and not has_cross
            and not cfg.use_megalayer):
        from ..ops import fused_layer
        from ..ops.basic import slice_layer_params as _slp
        l0, l1 = _slp(p["layers"], 0), _slp(p["layers"], 1)
        # gating on the (0, 1) pair covers every pair: backbone layers
        # are quantized as ONE stacked (L, ...) array (io/quant.py), so
        # slice_layer_params views share layout across l — mixed-layout
        # layers cannot arise on this path
        if (fused_layer.supported(l0)
                and fused_layer.bilayer_supported(l0, l1)):
            return _forward_bilayer(p, cfg, state, x, pos_vec, row_pos,
                                    cos, sin, read_end, pallas_mode,
                                    gelu_approx)
    k_new, v_new, ks_new, vs_new = [], [], [], []
    for l in range(cfg.num_layers):
        layer_p = slice_layer_params(p["layers"], l)
        ks = state.k_scale[l] if state.k_scale is not None else None
        vs = state.v_scale[l] if state.v_scale is not None else None
        x, k_l, v_l, ks_l, vs_l = _layer(
            layer_p, x, state.k[l], state.v[l], ks, vs, state.end, cos, sin,
            bias, pos_vec, cfg.num_heads, gelu_approx, pallas_mode,
            mesh=cfg.mesh, read_end=read_end, cur_pos=row_pos[0],
            fuse_insert=cfg.fuse_insert and not has_cross,
            use_megalayer=cfg.use_megalayer and not share and not has_cross,
            prefix=((state.pk[l], state.pv[l], state.ppos) if share
                    else None),
            cross=((state.xk[l], state.xv[l]) if has_cross else None))
        k_new.append(k_l)
        v_new.append(v_l)
        ks_new.append(ks_l)
        vs_new.append(vs_l)
    return state.replace(
        k=tuple(k_new), v=tuple(v_new), pos=pos_vec,
        k_scale=tuple(ks_new) if state.k_scale is not None else None,
        v_scale=tuple(vs_new) if state.v_scale is not None else None), x


def split_prefix(state: BackboneState, p: int, num_heads: int,
                 dtype=jnp.bfloat16):
    """Move slots [0, p) of a primed SOLO state into shared-prefix tables.

    Returns ((pk, pv, ppos), residual): pk/pv per-layer HEAD-MAJOR
    (H, p, D) `dtype` tables (int8-KV rows are dequantized — the tables
    are read once per frame for a whole batch, so bf16 traffic is
    negligible and exactness beats re-quantization), ppos the (p,)
    positions; the residual state keeps slots [p:] with cursors rebased,
    ready for text prefill."""
    quant = state.k_scale is not None
    hd = state.k[0].shape[-1]
    d = hd // num_heads

    def grab(rows, scale):
        r = rows[:p]
        if quant:
            r = r.astype(jnp.float32) * scale[:p, None]
        # flat (p, H*D) cache rows -> head-major (H, p, D) table: a
        # one-time copy of a read-only array
        return (r.astype(dtype).reshape(p, num_heads, d)
                .transpose(1, 0, 2))

    pk = tuple(grab(state.k[l], state.k_scale[l] if quant else None)
               for l in range(len(state.k)))
    pv = tuple(grab(state.v[l], state.v_scale[l] if quant else None)
               for l in range(len(state.v)))
    ppos = state.pos[:p]
    residual = state.replace(
        k=tuple(k[p:] for k in state.k),
        v=tuple(v[p:] for v in state.v),
        pos=state.pos[p:],
        end=state.end - jnp.asarray(p, jnp.int32),
        k_scale=(tuple(s[p:] for s in state.k_scale) if quant else None),
        v_scale=(tuple(s[p:] for s in state.v_scale) if quant else None),
    )
    return (pk, pv, ppos), residual


def shrink_state(state: BackboneState, capacity: int) -> BackboneState:
    """Slice the KV slot budget down to `capacity` (a copy of the prefix).

    Used per sentence to bound attention reads to the slots the sentence can
    actually use: prompt + text + max frames, bucketed. Cursors are
    unchanged; all shape-dependent logic (masks, capacity stop) derives from
    the array shapes.
    """
    return state.replace(
        k=tuple(k[..., :capacity, :] for k in state.k),
        v=tuple(v[..., :capacity, :] for v in state.v),
        pos=state.pos[..., :capacity],
        k_scale=(tuple(s[..., :capacity] for s in state.k_scale)
                 if state.k_scale is not None else None),
        v_scale=(tuple(s[..., :capacity] for s in state.v_scale)
                 if state.v_scale is not None else None),
    )


def advance(state: BackboneState, t: int, n_valid) -> BackboneState:
    """Consume t slots (padded, static) and n_valid positions.
    ref: increment_states, transformer.h:51-53,356-361.

    In prefix+ring mode the cursor wraps inside [ring_start, capacity):
    positions keep counting (RoPE/masks are position-keyed), only the
    storage slot recycles."""
    end = state.end + jnp.asarray(t, jnp.int32)
    if state.ring_start is not None:
        cap = state.k[0].shape[-2]
        ring = jnp.asarray(cap, jnp.int32) - state.ring_start
        end = state.ring_start + jnp.remainder(end - state.ring_start, ring)
    return state.replace(
        end=end,
        next_pos=state.next_pos + jnp.asarray(n_valid, jnp.int32))
