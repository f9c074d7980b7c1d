"""FlowLM streaming transformer backbone (6 layers, d=1024, 16 heads).

Functional re-design of the reference's stateful streaming transformer
(`src/pocket_tts/modules/transformer.h`): the mutable KV tensors + host-side
`current_end` become a fixed-shape pytree carry, and the host-built dense
prefill mask becomes position arithmetic on device.

Params pytree (layers stacked on axis 0 for lax.scan):
  layers: {norm1 {scale,bias}, in_proj {w (dm, 3dm), b?},
           out_proj {w (dm, dm), b?}, norm2 {scale,bias},
           linear1 {w (dm, hidden), b?}, linear2 {w (hidden, dm), b?}}

State shapes (single stream; batch via vmap):
  k/v: (L, S, H, Dh); end: () int32 — timesteps written so far.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import BackboneConfig
from ..ops.attention import (cache_insert_linear, causal_cache_bias, sdpa)
from ..ops.basic import gelu, layer_norm, linear
from ..ops.rope import apply_rope, rope_cos_sin


@struct.dataclass
class BackboneState:
    k: jax.Array   # (L, S, H, Dh)
    v: jax.Array   # (L, S, H, Dh)
    end: jax.Array  # () int32


def init_state(cfg: BackboneConfig, dtype=jnp.float32) -> BackboneState:
    shape = (cfg.num_layers, cfg.kv_capacity, cfg.num_heads, cfg.head_dim)
    return BackboneState(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        end=jnp.zeros((), jnp.int32),
    )


def _layer(p, x, k_cache, v_cache, end, cos, sin, bias, num_heads: int,
           gelu_approx: bool):
    """One pre-LN layer. ref: streaming_transformer_layer_forward,
    transformer.h:253-278; attention transformer.h:55-199."""
    t, dm = x.shape
    h = layer_norm(p["norm1"], x, eps=1e-5)
    qkv = linear(p["in_proj"], h)                       # (T, 3*dm)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(t, num_heads, dm // num_heads)
    k = k.reshape(t, num_heads, dm // num_heads)
    v = v.reshape(t, num_heads, dm // num_heads)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    k_cache = cache_insert_linear(k_cache, k, end)
    v_cache = cache_insert_linear(v_cache, v, end)
    attn = sdpa(q, k_cache.astype(q.dtype), v_cache.astype(q.dtype), bias)
    x = x + linear(p["out_proj"], attn.reshape(t, dm))
    h = layer_norm(p["norm2"], x, eps=1e-5)
    x = x + linear(p["linear2"], gelu(linear(p["linear1"], h), gelu_approx))
    return x, k_cache, v_cache


def forward(p, cfg: BackboneConfig, state: BackboneState, x,
            gelu_approx: bool = False):
    """Run T new positions through all layers, writing KV at state.end.

    x: (T, d_model). Returns (new_state_with_same_end, y (T, d_model)).
    The caller advances `end` by the number of *valid* positions (padding
    garbage beyond that is masked by causality and later overwritten) —
    mirroring the reference's explicit increment_states
    (src/pocket_tts.cpp:72-98).
    """
    t = x.shape[0]
    positions = state.end + jnp.arange(t, dtype=jnp.int32)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.max_period)
    bias = causal_cache_bias(t, cfg.kv_capacity, state.end)

    def body(x, xs):
        layer_p, k_cache, v_cache = xs
        x, k_cache, v_cache = _layer(
            layer_p, x, k_cache, v_cache, state.end, cos, sin, bias,
            cfg.num_heads, gelu_approx)
        return x, (k_cache, v_cache)

    y, (k_new, v_new) = jax.lax.scan(body, x, (p["layers"], state.k, state.v))
    return state.replace(k=k_new, v=v_new), y


def advance(state: BackboneState, n) -> BackboneState:
    """end += n. ref: increment_states, transformer.h:51-53,356-361."""
    return state.replace(end=state.end + jnp.asarray(n, jnp.int32))
