"""1-D convolutions: offline and streaming (causal, stateful) variants.

Replaces the reference's ggml conv layer (`src/pocket_tts/modules/conv.h`)
with TPU-friendly matmul formulations. All functions operate TIME-MAJOR on
a single stream: x has shape (T, C) — batch is added by `jax.vmap` at the
engine layer.

Time-major is load-bearing for performance, not style: the channel-major
(C, T) formulation kept time on the minor (lane) axis, so the transposed
convolution's (C, T, s) overlap-add intermediates carried tile-padded
layouts (s << 128 lanes) that XLA repaired with multi-MB relayout copies
every frame (~60 us/frame at batch 32 on the final 64ch x 1920 stage).
With time on the sublane axis, the k==2*stride overlap-add is two plain
row-shifted adds of clean (T*s, C) tiles, and the (T, s*C) -> (T*s, C)
reshape preserves row-major byte order.

Weight layouts follow the torch checkpoint:
  conv1d:           w (out_ch, in_ch, K), b (out_ch,)
  conv_transpose1d: w (in_ch, out_ch, K), b (out_ch,)
  depthwise convtr (groups == in_ch == out_ch): w (ch, 1, K)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# plain conv1d (stride s, no padding) via shifted matmuls — MXU friendly
# ---------------------------------------------------------------------------

def conv1d(p, x, stride: int = 1):
    """VALID conv1d. x: (T, Cin) -> ((T-K)//stride + 1, Cout).

    ref: torch_nn_conv1d / moshi_stateless_conv_1d (src/torch.h:18-30,
    src/pocket_tts/modules/conv.h:160-172).
    """
    w = p["w"]  # (Cout, Cin, K)
    cout, cin, k = w.shape
    t = x.shape[0]
    tout = (t - k) // stride + 1
    if k == 1 and stride == 1:
        y = jnp.dot(x, w[:, :, 0].T, preferred_element_type=jnp.float32)
    else:
        # sum of K row-shifted matmuls instead of an im2col patch tensor:
        # stacked (K, Tout, Cin) patches forced XLA to materialize + layout
        # -copy multi-MB activations per frame at batch; K is <= 7 here.
        y = jnp.zeros((tout, cout), jnp.float32)
        for j in range(k):
            y = y + jnp.dot(x[j: j + stride * tout: stride], w[:, :, j].T,
                            preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    b = p.get("b")
    if b is not None:
        y = y + b[None, :]
    return y


def streaming_conv1d(p, prev, x, stride: int = 1):
    """Causal streaming conv: prepend the cached tail, conv, save new tail.

    prev: (TP, Cin) with TP = K - stride (zeros initially).
    Returns (new_prev, y).
    ref: moshi_streaming_conv_1d, src/pocket_tts/modules/conv.h:48-87.
    """
    w = p["w"]
    k = w.shape[-1]
    tp = k - stride
    xc = jnp.concatenate([prev, x], axis=0) if tp > 0 else x
    new_prev = xc[xc.shape[0] - tp:] if tp > 0 else prev
    return new_prev, conv1d(p, xc, stride)


def conv1d_init_state(in_ch: int, kernel: int, stride: int = 1,
                      dtype=jnp.float32):
    tp = kernel - stride
    return jnp.zeros((tp, in_ch), dtype=dtype)


# ---------------------------------------------------------------------------
# transposed conv1d
# ---------------------------------------------------------------------------

def conv_transpose1d(p, x, stride: int, include_bias: bool = True):
    """Full VALID transposed conv. x: (T, Cin) -> ((T-1)*stride + K, Cout).

    y[i*s + j, o] += sum_c x[i, c] * w[c, o, j].
    """
    w = p["w"]  # (Cin, Cout, K)
    cin, cout, k = w.shape
    t = x.shape[0]
    lout = (t - 1) * stride + k
    if k == 2 * stride:
        # every convtr in this model has K == 2*stride: output row i*s + j
        # gets exactly u[i, j] + u[i-1, j+s]. One matmul against the
        # j-major flattened weight gives u as (T, K*Cout); each half
        # reshapes to (T*s, Cout) preserving byte order, and the
        # overlap-add is two row-block pads.
        s = stride
        w2 = jnp.transpose(w, (0, 2, 1)).reshape(cin, k * cout)
        u = jnp.dot(x, w2,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        a = u[:, : s * cout].reshape(t * s, cout)
        bb = u[:, s * cout:].reshape(t * s, cout)
        y = (jnp.pad(a, ((0, s), (0, 0)))
             + jnp.pad(bb, ((s, 0), (0, 0))))        # (T*s + s, Cout)
    else:
        # general overlap-add scatter
        u = jnp.einsum("tc,coj->jto", x, w,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = jnp.zeros((lout, cout), dtype=x.dtype)
        for j in range(k):
            y = y.at[j: j + t * stride: stride].add(u[j])
    if include_bias:
        b_ = p.get("b")
        if b_ is not None:
            y = y + b_[None, :]
    return y


def streaming_conv_transpose1d(p, prev_y, x, stride: int):
    """Streaming transposed conv with overlap-add carry.

    prev_y: (PT, Cout) holding the previous step's trailing PT = K - stride
    PRE-BIAS output rows (only the tail is ever consumed, so only the tail
    is carried — the reference stores the whole frame, conv.h:272-332, but
    rewriting a full (1920, 64) frame into the state every step was pure
    HBM traffic). Semantics:
        y = convtr(x)                        # no bias yet
        y[:PT] += prev_y                     # overlap-add
        new_prev = y[-PT:]                   # stored pre-bias
        out = (y + bias)[: Lfull - PT]
    Returns (new_prev, out).
    """
    w = p["w"]
    k = w.shape[-1]
    pt = k - stride
    y = conv_transpose1d(p, x, stride, include_bias=False)
    y = y.at[:pt].add(prev_y)
    new_prev = y[y.shape[0] - pt:]
    b = p.get("b")
    if b is not None:
        y = y + b[None, :]
    return new_prev, y[: y.shape[0] - pt]


def conv_transpose1d_init_state(out_ch: int, kernel: int, stride: int,
                                t_in: int, dtype=jnp.float32):
    return jnp.zeros((kernel - stride, out_ch), dtype=dtype)


def depthwise_upsample(p, x, kernel: int, stride: int):
    """Depthwise transposed conv for T=1 input — the mimi 16x upsampler
    (groups == channels == 512, k=32, s=16; ref: models/mimi.h:11-17 and the
    per-channel mul-concat hack at conv.h:283-301, replaced here by a single
    broadcasted multiply).

    x: (1, C); w: (C, 1, K). Returns full pre-bias y: (K, C) time-major.
    """
    w = p["w"]  # (C, 1, K)
    return x * w[:, 0, :].T  # (1,C)*(K,C) -> (K,C)
