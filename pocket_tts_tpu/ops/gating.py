"""Activation gating (SwiGLU) and weights-per-step modules.

TPU-native counterparts of the reference's moshi gating / multi-linear
modules (ref /root/reference/src/pocket_tts/modules/gating.h:16-38 and
mimi_transformer.h:55-139). Both are DEAD in the reference's shipped
pocket-tts checkpoints (defaults.h sets gating={} and weights_per_step=0 —
they are moshi-depformer legacy), but the reference carries the code paths,
so the framework does too: a checkpoint that ships gating or per-step
weights loads and runs.

Layouts:
  gating:  {"linear_in": {w (d, 2h), b?}, "linear_out": {w (h, d), b?}}
  per-step linear: {"w": (M, in, out), "b"?: (M, out)} stacked module
  list + a static `schedule` tuple mapping timestep -> module index
  (schedule=None means module t+offset, the reference's default).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .basic import linear, silu


def activation_gating(p, x):
    """y = linear_out(silu(left) * right), left/right = feature halves of
    linear_in(x). ref: moshi_activation_gating, gating.h:16-38 (the ggml
    views take the first/second half of the feature axis)."""
    h = linear(p["linear_in"], x)
    half = h.shape[-1] // 2
    left, right = h[..., :half], h[..., half:]
    return linear(p["linear_out"], silu(left) * right)


def _weight_stack(p):
    """The module's weight-carrying leaf, whatever the layout (plain "w"
    or quantized "q"/"q4" from io.quant.quantize_params)."""
    return p["w"] if "w" in p else (p["q"] if "q" in p else p["q4"])


def _squeeze_module(p):
    """Strip a leading unit stack dim from every stacked leaf so an M==1
    module feeds ops.basic.linear directly (fused quantized kernels
    included)."""
    stacked_ndim = {"w": 3, "q": 3, "q4": 3, "scale": 2, "b": 2}
    return {k: (v[0] if stacked_ndim.get(k) == getattr(v, "ndim", None)
                else v)
            for k, v in p.items() if v is not None}


def _dequant_stack(p):
    """Materialize a quantized stacked weight (M, in, out) in f32 for the
    per-step gather path — it has no fused kernel, and per-step weights
    are moshi-depformer legacy (never hot)."""
    if "q" in p:
        return p["q"].astype(jnp.float32) * p["scale"][..., None, :]
    q4 = p["q4"]
    hi = (q4.astype(jnp.int16) >> 4).astype(jnp.float32)
    lo = ((q4.astype(jnp.int16) & 0xF) - 8).astype(jnp.float32)
    w = jnp.concatenate([lo, hi], axis=-2)
    return w * p["scale"][..., None, :]


def _step_indices(m: int, schedule, t: int, offset):
    """Module index per timestep: schedule[t+offset] or t+offset, clamped
    like the reference's asserts demand in-range offsets."""
    steps = offset + jnp.arange(t, dtype=jnp.int32)
    if schedule is not None:
        table = jnp.asarray(schedule, jnp.int32)
        steps = jnp.clip(steps, 0, table.shape[0] - 1)
        return table[steps]
    return jnp.clip(steps, 0, m - 1)


def weights_per_step_linear(p, x, offset=0, schedule=None):
    """Per-timestep linear: row t of x uses module schedule[t+offset].

    x: (T, in); p["w"]: (M, in, out) stacked modules (M == 1 collapses to a
    plain shared linear — the reference's fast path). The TPU formulation
    gathers the per-step weights once and runs ONE batched contraction
    ('tc,tco->to') instead of the reference's per-step view+concat loop
    (mimi_transformer.h:80-99) — same math, MXU-batched. Quantized layouts
    (q/q4 from io.quant.quantize_params) are accepted: the M==1 fast path
    keeps the fused kernels; M>1 dequantizes inline for the gather.
    """
    wk = _weight_stack(p)
    if wk.ndim == 2 or wk.shape[0] == 1:
        return linear(_squeeze_module(p), x)
    w = p["w"] if "w" in p else _dequant_stack(p)
    t = x.shape[0]
    idx = _step_indices(w.shape[0], schedule, t, jnp.asarray(offset, jnp.int32))
    wt = jnp.take(w, idx, axis=0)                       # (T, in, out)
    y = jnp.einsum("tc,tco->to", x, wt.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    b = p.get("b")
    if b is not None:
        y = y + jnp.take(b, idx, axis=0)
    return y


def weights_per_step_gating(p, x, offset=0, schedule=None):
    """Per-timestep activation gating (ref mimi_transformer.h:101-139).

    p: {"linear_in": {"w": (M, d, 2h), "b"?}, "linear_out": {"w": (M, h, d),
    "b"?}}; M == 1 collapses to the shared-gating fast path. Quantized
    layouts are accepted (see weights_per_step_linear).
    """
    w_in = _weight_stack(p["linear_in"])
    if w_in.ndim == 2 or w_in.shape[0] == 1:
        return activation_gating(
            {"linear_in": _squeeze_module(p["linear_in"]),
             "linear_out": _squeeze_module(p["linear_out"])}, x)
    h = weights_per_step_linear(p["linear_in"], x, offset, schedule)
    half = h.shape[-1] // 2
    gated = silu(h[..., :half]) * h[..., half:]
    return weights_per_step_linear(p["linear_out"], gated, offset, schedule)
