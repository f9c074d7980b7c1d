"""1-D convolutions: offline and streaming (causal, stateful) variants.

Replaces the reference's ggml conv layer (`src/pocket_tts/modules/conv.h`)
with TPU-friendly matmul formulations. All functions operate on a single
stream: x has shape (C, T) — batch is added by `jax.vmap` at the engine layer.

Weight layouts follow the torch checkpoint:
  conv1d:           w (out_ch, in_ch, K), b (out_ch,)
  conv_transpose1d: w (in_ch, out_ch, K), b (out_ch,)
  depthwise convtr (groups == in_ch == out_ch): w (ch, 1, K)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# plain conv1d (stride s, no padding) via im2col matmul — MXU friendly
# ---------------------------------------------------------------------------

def conv1d(p, x, stride: int = 1):
    """VALID conv1d. x: (Cin, T) -> (Cout, (T-K)//stride + 1).

    ref: torch_nn_conv1d / moshi_stateless_conv_1d (src/torch.h:18-30,
    src/pocket_tts/modules/conv.h:160-172).
    """
    w = p["w"]  # (Cout, Cin, K)
    cout, cin, k = w.shape
    t = x.shape[-1]
    tout = (t - k) // stride + 1
    if k == 1 and stride == 1:
        y = jnp.dot(w[:, :, 0], x, preferred_element_type=jnp.float32)
    else:
        # sum of K shifted matmuls instead of an im2col patch tensor: the
        # stacked (Cin, K, Tout) patches forced XLA to materialize + layout
        # -copy multi-MB activations per frame at batch (measured 80+ us
        # per frame on the seanet tail); K is <= 7 everywhere here.
        y = jnp.zeros((cout, tout), jnp.float32)
        for j in range(k):
            y = y + jnp.dot(w[:, :, j],
                            x[:, j : j + stride * tout : stride],
                            preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    b = p.get("b")
    if b is not None:
        y = y + b[:, None]
    return y


def streaming_conv1d(p, prev, x, stride: int = 1):
    """Causal streaming conv: prepend the cached tail, conv, save new tail.

    prev: (Cin, TP) with TP = K - stride (zeros initially).
    Returns (new_prev, y).
    ref: moshi_streaming_conv_1d, src/pocket_tts/modules/conv.h:48-87.
    """
    w = p["w"]
    k = w.shape[-1]
    tp = k - stride
    xc = jnp.concatenate([prev, x], axis=-1) if tp > 0 else x
    new_prev = xc[:, xc.shape[-1] - tp :] if tp > 0 else prev
    return new_prev, conv1d(p, xc, stride)


def conv1d_init_state(in_ch: int, kernel: int, stride: int = 1,
                      dtype=jnp.float32):
    tp = kernel - stride
    return jnp.zeros((in_ch, tp), dtype=dtype)


# ---------------------------------------------------------------------------
# transposed conv1d
# ---------------------------------------------------------------------------

def conv_transpose1d(p, x, stride: int, include_bias: bool = True):
    """Full VALID transposed conv. x: (Cin, T) -> (Cout, (T-1)*stride + K).

    y[o, i*s + j] += sum_c x[c, i] * w[c, o, j].
    """
    w = p["w"]  # (Cin, Cout, K)
    cin, cout, k = w.shape
    t = x.shape[-1]
    lout = (t - 1) * stride + k
    if k == 2 * stride:
        # every convtr in this model has K == 2*stride; output position
        # i*s + j gets exactly u[o, i, j] + u[o, i-1, j+s]. The (Cout, T, K)
        # einsum layout lets the result reshape to the time axis with no
        # transpose (a transpose here materialized multi-MB copies per
        # frame under vmap).
        s = stride
        u = jnp.einsum("coj,ct->otj", w, x,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        a = u[..., :s]                 # (Cout, T, s)
        b = u[..., s:]                 # (Cout, T, s)
        ypad = (
            jnp.pad(a, ((0, 0), (0, 1), (0, 0)))
            + jnp.pad(b, ((0, 0), (1, 0), (0, 0)))
        )  # (Cout, T+1, s)
        y = ypad.reshape(cout, (t + 1) * s)[:, :lout]
    else:
        # general overlap-add scatter
        u = jnp.einsum("coj,ct->jot", w, x,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = jnp.zeros((cout, lout), dtype=x.dtype)
        for j in range(k):
            y = y.at[:, j : j + t * stride : stride].add(u[j])
    if include_bias:
        b_ = p.get("b")
        if b_ is not None:
            y = y + b_[:, None]
    return y


def streaming_conv_transpose1d(p, prev_y, x, stride: int):
    """Streaming transposed conv with overlap-add carry.

    prev_y: (Cout, Lfull) holding the previous step's full (pre-bias) output,
    Lfull = (T-1)*stride + K for the fixed streaming T. Semantics
    (ref: moshi_streaming_conv_transpose_1d, conv.h:272-332):
        y = convtr(x)                        # no bias yet
        y[:, :PT] += prev_y[:, -PT:]         # PT = K - stride
        new_prev = y                         # stored pre-bias
        out = (y + bias)[:, : Lfull - PT]
    Returns (new_prev, out).
    """
    w = p["w"]
    k = w.shape[-1]
    pt = k - stride
    y = conv_transpose1d(p, x, stride, include_bias=False)
    y = y.at[:, :pt].add(prev_y[:, prev_y.shape[-1] - pt :])
    new_prev = y
    b = p.get("b")
    if b is not None:
        y = y + b[:, None]
    return new_prev, y[:, : y.shape[-1] - pt]


def conv_transpose1d_init_state(out_ch: int, kernel: int, stride: int,
                                t_in: int, dtype=jnp.float32):
    lfull = (t_in - 1) * stride + kernel
    return jnp.zeros((out_ch, lfull), dtype=dtype)


def depthwise_upsample(p, x, kernel: int, stride: int):
    """Depthwise transposed conv for T=1 input — the mimi 16x upsampler
    (groups == channels == 512, k=32, s=16; ref: models/mimi.h:11-17 and the
    per-channel mul-concat hack at conv.h:283-301, replaced here by a single
    broadcasted multiply).

    x: (C, 1); w: (C, 1, K). Returns full pre-bias y: (C, K).
    """
    w = p["w"]  # (C, 1, K)
    return x * w[:, 0, :]  # (C,1)*(C,K) -> (C,K)
