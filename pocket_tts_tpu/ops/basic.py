"""Elementary pure ops: linear layers and norms.

These replace the reference's torch-compat layer (`/root/reference/src/torch.h`)
with plain jnp functions. Parameters are dicts:
  linear: {"w": (in, out), "b": (out,) optional}   # torch (out,in) transposed at load
  norm:   {"scale": (d,), "bias": (d,) optional}
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(p, x):
    """y = x @ w + b.  ref: torch_nn_linear, src/torch.h:79-87.

    Quantized variants (the TPU analog of the reference's Q8_0/Q4_0
    weights, src/loader.h:162-173):
      {"q":  int8 (K, N), "scale": (N,)}          per-output-channel int8
      {"q4": uint8 (K/2, N) packed, "scale": (N,)} per-output-channel int4
    On TPU these run fused dequant-matmul Pallas kernels that stream the
    quantized bytes HBM->VMEM (2x/4x less weight traffic — the B=1 decode
    is weight-bandwidth bound); off-TPU they fall back to XLA dequant.
    """
    q = p.get("q")
    q4 = p.get("q4")
    if q is not None:
        from .quant_matmul import int8_matmul
        y = int8_matmul(x, q, p["scale"], p.get("_layer"))
    elif q4 is not None:
        from .quant_matmul import int4_matmul
        y = int4_matmul(x, q4, p["scale"], p.get("_layer"))
    else:
        y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    b = p.get("b")
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def slice_layer_params(p_layers, l: int) -> dict:
    """Per-layer view of stacked (L, ...) module params.

    Quantized leaves stay STACKED with a static `_layer` marker so the
    fused dequant-matmul kernels read them in place — a sliced stacked
    array becomes a materialized copy when fed to a custom call (measured
    ~45 us/frame on the backbone weights)."""
    out = {}
    for mod, sub in p_layers.items():
        if isinstance(sub, dict) and ("q" in sub or "q4" in sub):
            d = {k: v for k, v in sub.items()
                 if k in ("q", "q4", "scale")}
            d["_layer"] = l
            for k, v in sub.items():
                if k not in d:
                    d[k] = v[l]           # bias etc: per-layer slice
            out[mod] = d
        else:
            out[mod] = jax.tree.map(lambda w: w[l], sub)
    return out


def layer_norm(p, x, eps: float = 1e-5):
    """LayerNorm over the last axis.

    Matches ggml_norm semantics (mean/var over last dim, divisor n, eps inside
    sqrt) used by torch_nn_layer_norm (src/torch.h:49-60). eps may be 0 for the
    mimi decoder transformer (models/defaults.h:14,32).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    if p is not None:
        scale = p.get("scale")
        if scale is not None:
            y = y * scale.astype(jnp.float32)
        bias = p.get("bias")
        if bias is not None:
            y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(p, x, eps: float = 1e-8):
    """Plain RMSNorm (moshi_rms_norm, src/pocket_tts/modules/mimi_transformer.h:15-23)."""
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(ms + eps)
    return (y * p["alpha"].astype(jnp.float32)).astype(x.dtype)


def mlp_std_norm(p, x, eps: float = 1e-5):
    """The flow net's quirky "RMSNorm": divides x (NOT mean-subtracted) by the
    (n-1)-divisor standard deviation of x.

    ref: mlp_rms_norm, src/pocket_tts/modules/mlp.h:18-37 — mean is computed,
    variance = sum((x-mean)^2)/(n-1), output = alpha * x / sqrt(var + eps).
    """
    x32 = x.astype(jnp.float32)
    n = x32.shape[-1]
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) / (n - 1)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * p["alpha"].astype(jnp.float32)).astype(x.dtype)


def gelu(x, approx: bool = False):
    """GELU. approx=True is the tanh flavour ggml uses; False (erf) matches the
    original torch model (F.gelu default)."""
    return jax.nn.gelu(x, approximate=approx)


def elu(x):
    """ELU(alpha=1) — SEANet activation (ggml_elu)."""
    return jnp.where(x > 0, x, jnp.expm1(jnp.minimum(x, 0.0)))


def silu(x):
    return jax.nn.silu(x)


def modulate(x, shift, scale):
    """adaLN modulation: x * (1 + scale) + shift. ref: mlp_modulate, mlp.h:3-9."""
    return x * (1.0 + scale) + shift
