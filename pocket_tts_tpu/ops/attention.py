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


def causal_cache_bias(t: int, s: int, end):
    """Additive bias for a *linear* (non-ring) KV cache of capacity s after
    writing t new entries at position `end`.

    Query i (absolute pos end+i) may attend slot j iff j <= end + i.
    Slots beyond end+i hold either garbage padding or nothing; causality
    excludes both. ref mask: transformer.h:157-169 (0 / -inf dense mask).
    """
    qi = jnp.arange(t, dtype=jnp.int32)[:, None]
    kj = jnp.arange(s, dtype=jnp.int32)[None, :]
    allowed = kj <= (end + qi)
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)


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


def ring_cache_bias(t: int, capacity: int, offset, context: int):
    """Additive bias for the ring-buffer cache after inserting t entries at
    ring indices (offset+i) % capacity.

    Allowed(q_i, slot_j): let pq = offset+i, pk = ring position of slot j;
    pk >= 0 AND pq - pk >= 0 AND pq - pk < context.
    ref: calculate_attn_bias / bias_pattern, mimi_transformer.h:407-447,
    torch.h:160-221.
    """
    pk = ring_positions(offset + t, capacity)[None, :]          # (1, cap)
    pq = (offset + jnp.arange(t, dtype=jnp.int32))[:, None]     # (T, 1)
    delta = pq - pk
    allowed = (pk >= 0) & (delta >= 0) & (delta < context)
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)


def cache_insert_linear(cache, new, end):
    """Write `new` (T, H, D) into linear cache (S, H, D) at row `end`."""
    return jax.lax.dynamic_update_slice(
        cache, new.astype(cache.dtype), (end, 0, 0))


def cache_insert_ring(cache, new, offset):
    """Write `new` (T, H, D) into ring cache (cap, H, D) at rows
    (offset+i) % cap. ref: moshi_kv_cache_insert_kv (set_rows variant),
    mimi_transformer.h:238-249."""
    cap = cache.shape[0]
    t = new.shape[0]
    idx = (offset + jnp.arange(t, dtype=jnp.int32)) % cap
    return cache.at[idx].set(new.astype(cache.dtype))
