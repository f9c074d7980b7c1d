"""Interleaved rotary position embedding (moshi flavour).

ref: /root/reference/src/pocket_tts/modules/rope.h.

The reference treats the head dim as D/2 (real, imag) *interleaved* pairs:
re = x[..., 0::2], im = x[..., 1::2], rotates each pair by angle
pos * max_period^(-j/(D/2)), and emits concat([re', im'], axis=-1) — the
rotated halves are concatenated, NOT re-interleaved (rope.h:267-268). Both q
and k get the identical permutation so attention logits are unchanged, but we
reproduce the exact layout for checkpoint-level parity.
"""
from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions, head_dim: int, max_period: float):
    """cos/sin tables for given absolute positions.

    positions: (T,) float or int array of absolute timesteps.
    Returns (cos, sin) each (T, head_dim//2), float32.

    ref: moshi_get_timestep_embedding_new, rope.h:22-42 —
    freqs[j] = exp(-log(max_period) * j / (D/2)).
    """
    half = head_dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-jnp.log(float(max_period)) / half)
    )
    rads = positions.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.cos(rads), jnp.sin(rads)


def apply_rope(x, cos, sin):
    """Rotate one tensor. x: (..., T, H, D) or (T, H, D); cos/sin: (T, D/2).

    Output layout: concat([re*cos - im*sin, re*sin + im*cos], axis=-1)
    where re/im are the even/odd interleaved halves of x.
    ref: moshi_apply_rope_new, rope.h:183-272.
    """
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    re = x[..., 0::2]
    im = x[..., 1::2]
    # broadcast cos/sin (T, D/2) over the head axis
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    out_re = re * c - im * s
    out_im = re * s + im * c
    return jnp.concatenate([out_re, out_im], axis=-1).astype(orig_dtype)


def apply_rope_qk(q, k, positions, max_period: float):
    """Apply rope to q and k, shapes (T, H, D), positions (T,)."""
    cos, sin = rope_cos_sin(positions, q.shape[-1], max_period)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin)


def apply_rope_halves(x, cos, sin):
    """Rope for PRE-PERMUTED projections: identical output bytes to
    `apply_rope`, zero data movement.

    apply_rope's even/odd interleaved slicing lowers to strided lane
    gathers that XLA materializes as relayout copies — measured ~57 us per
    batch-32 frame. Since q/k come straight out of in_proj, the loader
    instead permutes the in_proj COLUMNS (even indices first, then odd —
    io/params.py `_rope_permute`) so re/im arrive as contiguous halves:
    re = x[..., :D/2] equals the unpermuted x[..., 0::2] exactly, and the
    output concat([re*c - im*s, re*s + im*c]) is the reference's
    concat-halves layout unchanged (rope.h:267-268). Cached K rows are
    rope'd, so nothing outside q/k ever sees the permutation.
    """
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    re = x[..., :half]
    im = x[..., half:]
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    return jnp.concatenate(
        [re * c - im * s, re * s + im * c], axis=-1).astype(orig_dtype)
