"""Scaled dot-product attention over fixed-shape functional KV caches.

Replaces the reference's two SDPA variants and its host-built masks
(`src/torch.h:128-150,223-235`, `src/pocket_tts/modules/transformer.h:121-199`,
`src/pocket_tts/modules/mimi_transformer.h:174-287`) with position-arithmetic
masks computed on device — no host round trips.

Shapes (single stream; batch via vmap):
  q: (T, H, D)    new queries
  k_cache/v_cache: (S, H, D) fixed capacity
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large negative instead of -inf, safe in f32 softmax


def sdpa(q, k, v, bias=None):
    """softmax(q k^T / sqrt(D) + bias) v.

    q: (T, H, D), k/v: (S, H, D), bias: (T, S) additive or None.
    Logits/softmax in float32.
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum("thd,shd->hts", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias[None, :, :]
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hts,shd->thd", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def sdpa_decode_seg(q, k, v, bias):
    """T=1 decode attention formulated as two MXU matmuls.

    XLA lowers the natural per-head contractions ('thd,shd->hts') to VPU
    multiply+lane-reduce fusions that run far below memory bandwidth — at
    decode they dominate frame time. Reformulated against a constant
    head-segment mask, both contractions become (S, H*D)-shaped matmuls that
    stream the caches through the MXU at full bandwidth (16x redundant
    FLOPs, which are free here).

    q: (1, H, D); k/v: FLAT caches (S, H*D) — reshaping a cache here would
    copy it and break in-place update aliasing; bias: (1, S).
    Returns (1, H, D), numerically equivalent to sdpa().
    """
    _, h, d = q.shape
    s, hd = k.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 1)
    head = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
    seg = (lane // d == head).astype(k.dtype)          # (H, H*D) constant

    k2 = k
    v2 = v
    qmask = q.reshape(1, hd) * seg                      # (H, H*D)
    logits = jnp.dot(k2, qmask.T,
                     preferred_element_type=jnp.float32) * scale  # (S, H)
    logits = logits + bias.reshape(s, 1)
    w = jax.nn.softmax(logits, axis=0)                  # (S, H)
    out_full = jnp.dot(w.T.astype(v2.dtype), v2,
                       preferred_element_type=jnp.float32)  # (H, H*D)
    out = jnp.sum(out_full * seg.astype(jnp.float32), axis=0)  # (H*D,)
    return out.reshape(1, h, d).astype(q.dtype)


def sdpa_decode_seg_stats(q, k, v, bias):
    """sdpa_decode_seg + flash (m, l) stats: XLA counterpart of the
    Pallas kernels' stats=True mode for shared-prefix merges. Returns
    (out (1, H, D), m (1, H) f32, l (1, H) f32)."""
    _, h, d = q.shape
    s, hd = k.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 1)
    head = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
    seg = (lane // d == head).astype(k.dtype)
    qmask = q.reshape(1, hd) * seg
    logits = jnp.dot(k, qmask.T,
                     preferred_element_type=jnp.float32) * scale  # (S, H)
    logits = logits + bias.reshape(s, 1)
    m = jnp.max(logits, axis=0)                                   # (H,)
    w = jnp.exp(logits - m[None, :])
    l = jnp.sum(w, axis=0)
    out_full = jnp.dot((w / jnp.maximum(l, 1e-30)).T.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
    out = jnp.sum(out_full * seg.astype(jnp.float32), axis=0)
    return (out.reshape(1, h, d).astype(q.dtype),
            m.reshape(1, h), l.reshape(1, h))


def sdpa_seg(q, k, v, bias):
    """T>=1 decode attention over FLAT caches as two MXU matmuls.

    Generalizes sdpa_decode_seg to T>1 (the mimi decoder transformer runs
    T=16 per frame): the natural per-head einsum lowers to VPU
    multiply+lane-reduce loops measured ~5x over memory-bandwidth-ideal at
    batch; here both contractions are (S, ...) matmuls that stream the
    caches through the MXU once. H*T redundant FLOPs, free at these sizes.

    q: (T, H, D); k/v: FLAT caches (S, H*D); bias: (T, S) additive.
    Returns (T, H, D), numerically equivalent to sdpa().
    """
    t, h, d = q.shape
    s, hd = k.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    th = t * h
    # row r = t*H + h: one query vector per (timestep, head)
    oh = jax.nn.one_hot(jnp.arange(th) % h, h, dtype=q.dtype)   # (TH, H)
    qm = (oh[:, :, None] * q.reshape(th, 1, d)).reshape(th, hd)  # (TH, H*D)
    logits = jnp.dot(k, qm.T, preferred_element_type=jnp.float32) * scale
    # column r=t*H+h of (S, TH) gets bias[t, s]
    logits = logits + jnp.repeat(
        bias.T.astype(jnp.float32), h, axis=1)
    w = jax.nn.softmax(logits, axis=0)                           # (S, TH)
    out_full = jnp.dot(w.T.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)       # (TH, H*D)
    out = (out_full.reshape(th, h, d)
           * oh.astype(jnp.float32)[:, :, None]).sum(axis=1)     # (TH, D)
    return out.reshape(t, h, d).astype(q.dtype)


def sdpa_seg_stats(q, k, v, bias):
    """sdpa_seg + flash (m, l) stats (T>=1) — the XLA path for prefill
    rows under shared-prefix serving. Returns (out (T, H, D), m (T, H),
    l (T, H))."""
    t, h, d = q.shape
    s, hd = k.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    th = t * h
    oh = jax.nn.one_hot(jnp.arange(th) % h, h, dtype=q.dtype)
    qm = (oh[:, :, None] * q.reshape(th, 1, d)).reshape(th, hd)
    logits = jnp.dot(k, qm.T, preferred_element_type=jnp.float32) * scale
    logits = logits + jnp.repeat(bias.T.astype(jnp.float32), h, axis=1)
    m = jnp.max(logits, axis=0)                                  # (TH,)
    w = jnp.exp(logits - m[None, :])
    l = jnp.sum(w, axis=0)
    out_full = jnp.dot((w / jnp.maximum(l, 1e-30)).T.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
    out = (out_full.reshape(th, h, d)
           * oh.astype(jnp.float32)[:, :, None]).sum(axis=1)
    return (out.reshape(t, h, d).astype(q.dtype),
            m.reshape(t, h), l.reshape(t, h))


def prefix_attn_stats(q, pk, pv, ppos):
    """Partial attention over a SHARED prompt-prefix table, with flash
    stats for an exact external merge.

    Shared-prefix serving: every lane of a voice attends the identical
    prompt KV, so the table is stored ONCE and contracted as a plain
    matmul operand — under vmap the table stays unbatched and XLA reads
    it once per frame for the whole batch instead of once per lane
    (vLLM-style prefix sharing; no analog in the reference, which
    decodes a single stream). The per-lane ring keeps only text+decode
    rows; merge with its partial via merge_attn_partials.

    q: (T, H, D); pk/pv: (H, P, D) HEAD-MAJOR tables (read-only, so the
    layout is free — head-major keeps every intermediate tiny: logits
    (H, T, P) instead of the seg formulation's (B*T*H, H*D) blow-ups,
    which were measured to cost more HBM traffic than the sharing
    saved); ppos: (P,) int32 (-1 = padding; prompt positions always
    precede decode positions, so no causal check is needed).
    Returns (out (T, H, D) f32 NORMALIZED, m (T, H) f32 running max,
    l (T, H) f32 normalizer).
    """
    t, h, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    # batch dim h, contraction d: under vmap the lane batch joins the
    # free rows, so this is an MXU matmul with pk read once per frame
    logits = jnp.einsum("thd,hpd->htp", q, pk,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + jnp.where(ppos >= 0, 0.0, NEG_INF)[None, None, :]
    m = jnp.max(logits, axis=-1)                                 # (H, T)
    w = jnp.exp(logits - m[..., None])
    l = jnp.sum(w, axis=-1)                                      # (H, T)
    wn = (w / jnp.maximum(l, 1e-30)[..., None]).astype(pv.dtype)
    out = jnp.einsum("htp,hpd->thd", wn, pv,
                     preferred_element_type=jnp.float32)
    return out, m.T, l.T


def cross_attn_kv(in_proj, cond, num_heads: int):
    """Precompute a cross-attention KV cache from a conditioning sequence.

    The reference computes k/v ONCE at state init from `condition_cross`
    through rows [d, 3d) of the shared in_proj and caches them for the
    stream's lifetime (moshi_smha init, ref
    src/pocket_tts/modules/mimi_transformer.h:343-396). Here the full
    in_proj runs and the q third is dropped — a once-per-stream cost that
    keeps every quantized weight layout working unchanged (slicing a
    packed int4/int8 weight would need its own kernel path for a module
    that is DEAD in the shipped checkpoints: defaults.h:18 sets
    cross_attention=false, but the reference compiles the path, so the
    framework carries it too).

    cond: (S, d_model) -> (k, v) each (S, H, D), no RoPE (the reference's
    cross path applies none).
    """
    from .basic import linear
    s = cond.shape[0]
    qkv = linear(in_proj, cond)                     # (S, 3*d_model)
    d_model = qkv.shape[-1] // 3
    k = qkv[:, d_model:2 * d_model]
    v = qkv[:, 2 * d_model:]
    return (k.reshape(s, num_heads, d_model // num_heads),
            v.reshape(s, num_heads, d_model // num_heads))


def cross_attention(p, x, xk, xv, num_heads: int):
    """Cross-attention over a precomputed conditioning KV cache.

    q = rows [0, d) of the shared in_proj applied to x; non-causal,
    unmasked SDPA against the cached (k, v); out_proj back to d_model.
    ref: moshi_streaming_multihead_cross_attention,
    src/pocket_tts/modules/mimi_transformer.h:714-762 (asserts non-causal,
    single in/out proj).

    p: {"in_proj": {...}, "out_proj": {...}}; x: (T, d_model);
    xk/xv: (S, H, D). Returns (T, d_model).
    """
    from .basic import linear
    t, dm = x.shape
    q3 = linear(p["in_proj"], x)                    # (T, 3*d_model)
    q = q3[:, :dm].reshape(t, num_heads, dm // num_heads)
    out = sdpa(q, xk, xv)
    return linear(p["out_proj"], out.reshape(t, dm))


def merge_attn_partials(o1, m1, l1, o2, m2, l2):
    """Exact flash merge of two NORMALIZED attention partials over
    disjoint key sets. o: (..., H, D) f32-able; m/l: (..., H)."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m) * l1
    a2 = jnp.exp(m2 - m) * l2
    denom = jnp.maximum(a1 + a2, 1e-30)
    w1 = (a1 / denom)[..., None]
    w2 = (a2 / denom)[..., None]
    return (o1.astype(jnp.float32) * w1
            + o2.astype(jnp.float32) * w2).astype(o2.dtype)


def pos_cache_bias(q_pos, slot_pos, neg: float = NEG_INF):
    """Additive bias for a slot/position-decoupled cache.

    Slots and absolute positions are decoupled so batched serving can write
    all streams' KV at one shared slot offset (a plain dynamic_update_slice —
    no scatter) while per-stream padding rows are simply flagged invalid
    (position -1) forever.

    q_pos: (T,) absolute positions of the queries.
    slot_pos: (S,) absolute position stored in each slot, -1 = invalid.
    Allowed(i, j) = slot_pos[j] >= 0 AND slot_pos[j] <= q_pos[i].
    """
    pk = slot_pos[None, :]
    allowed = (pk >= 0) & (pk <= q_pos[:, None])
    return jnp.where(allowed, 0.0, neg).astype(jnp.float32)


def ring_positions(end_offset, capacity: int):
    """Reconstruct absolute positions stored in each ring-buffer slot.

    end_offset = total timesteps written so far (offset + T). Returns (cap,)
    int32 with -1 for never-written slots.
    ref: moshi_kv_cache_get_positions, mimi_transformer.h:251-287.
    """
    idx = jnp.arange(capacity, dtype=jnp.int32)
    last = end_offset - 1
    end_index = last % capacity
    delta = idx - end_index
    pos = last + delta - jnp.where(delta > 0, capacity, 0)
    valid = idx < end_offset
    return jnp.where(valid, pos, -1)


def ring_cache_bias(t: int, capacity: int, offset, context: int,
                    neg: float = NEG_INF, start=0):
    """Additive bias for the ring-buffer cache after inserting t entries at
    ring indices (offset+i) % capacity.

    Allowed(q_i, slot_j): let pq = offset+i, pk = ring position of slot j;
    pk >= start AND pq - pk >= 0 AND pq - pk < context.
    ref: calculate_attn_bias / bias_pattern, mimi_transformer.h:407-447,
    torch.h:160-221.

    start: first timestep belonging to this stream (continuous batching —
    slots written before the stream joined the shared ring are a previous
    occupant's and masked; 0 for solo streams, where pk >= 0 is the same
    validity test).
    """
    pk = ring_positions(offset + t, capacity)[None, :]          # (1, cap)
    pq = (offset + jnp.arange(t, dtype=jnp.int32))[:, None]     # (T, 1)
    delta = pq - pk
    allowed = (pk >= jnp.asarray(start, jnp.int32)) & (delta >= 0) \
        & (delta < context)
    return jnp.where(allowed, 0.0, neg).astype(jnp.float32)


def cache_insert_ring(cache, new, offset):
    """Write `new` (T, H, D) into ring cache (cap, H, D) at rows
    (offset+i) % cap. ref: moshi_kv_cache_insert_kv (set_rows variant),
    mimi_transformer.h:238-249.

    When cap is a multiple of T (the configs guarantee this) the block never
    wraps and the insert is one contiguous dynamic_update_slice, which XLA
    aliases in place — a row scatter copies the whole cache every step.
    """
    cap = cache.shape[0]
    t = new.shape[0]
    if cap % t == 0:
        start = jnp.asarray(offset, jnp.int32) % cap
        return jax.lax.dynamic_update_slice(
            cache, new.astype(cache.dtype), (start,) + (0,) * (cache.ndim - 1))
    idx = (offset + jnp.arange(t, dtype=jnp.int32)) % cap
    return cache.at[idx].set(new.astype(cache.dtype))
