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

def _conv_kernel_size(p, cin: int) -> int:
    """Static K from either a full "w" or a quantized conv layout
    (io/quant.py: qc/qc4 hold the (K*Cin, Cout) logical weight)."""
    w = p.get("w")
    if w is not None:
        return w.shape[-1]
    qc = p.get("qc")
    if qc is not None:
        return qc.shape[0] // cin
    return 2 * p["qc4"].shape[0] // cin


def _conv1d_quant(p, x, stride: int):
    """conv1d against int8/int4 weights: K shifted views of x concatenate
    along features (a tiny activation copy) and ONE fused dequant-matmul
    streams the quantized bytes — the conv analog of ops/quant_matmul
    (reference policy: quantize everything the op allows,
    src/loader.h:162-173,206-210)."""
    from .quant_matmul import int4_matmul, int8_matmul
    t, cin = x.shape
    qc = p.get("qc")
    k = _conv_kernel_size(p, cin)
    tout = (t - k) // stride + 1
    if k == 1 and stride == 1:
        xw = x
    else:
        xw = jnp.concatenate(
            [x[j: j + stride * tout: stride] for j in range(k)], axis=1)
    y = (int8_matmul(xw, qc, p["scale"]) if qc is not None
         else int4_matmul(xw, p["qc4"], p["scale"]))
    b = p.get("b")
    if b is not None:
        y = y + b[None, :]
    return y.astype(x.dtype)


def conv1d(p, x, stride: int = 1):
    """VALID conv1d. x: (T, Cin) -> ((T-K)//stride + 1, Cout).

    ref: torch_nn_conv1d / moshi_stateless_conv_1d (src/torch.h:18-30,
    src/pocket_tts/modules/conv.h:160-172).
    """
    if "qc" in p or "qc4" in p:
        return _conv1d_quant(p, x, stride)
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
    k = _conv_kernel_size(p, x.shape[1])
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

def _convtr_matmul(p, x, stride: int):
    """u = x @ w2 against the j-major flattened (Cin, K*Cout) weight of a
    K == 2*stride transposed conv — full "w" or quantized qt/qt4 layout
    (io/quant.py), in which case a fused dequant-matmul streams the bytes.
    Returns (u (T, K*Cout), cout, k)."""
    qt = p.get("qt")
    qt4 = p.get("qt4")
    if qt is None and qt4 is None:
        w = p["w"]  # (Cin, Cout, K)
        cin, cout, k = w.shape
        w2 = jnp.transpose(w, (0, 2, 1)).reshape(cin, k * cout)
        u = jnp.dot(x, w2,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        return u, cout, k
    from .quant_matmul import int4_matmul, int8_matmul
    k = 2 * stride  # the quantized layout exists only for k == 2*stride
    cout = (qt if qt is not None else qt4).shape[1] // k
    u = (int8_matmul(x, qt, p["scale"]) if qt is not None
         else int4_matmul(x, qt4, p["scale"])).astype(x.dtype)
    return u, cout, k


def conv_transpose1d(p, x, stride: int, include_bias: bool = True):
    """Full VALID transposed conv. x: (T, Cin) -> ((T-1)*stride + K, Cout).

    y[i*s + j, o] += sum_c x[i, c] * w[c, o, j].
    """
    t = x.shape[0]
    quant = "qt" in p or "qt4" in p
    k = 2 * stride if quant else p["w"].shape[-1]
    lout = (t - 1) * stride + k
    if k == 2 * stride:
        # every convtr in this model has K == 2*stride: output row i*s + j
        # gets exactly u[i, j] + u[i-1, j+s]. One matmul against the
        # j-major flattened weight gives u as (T, K*Cout); each half
        # reshapes to (T*s, Cout) preserving byte order, and the
        # overlap-add is two row-block pads.
        s = stride
        u, cout, k = _convtr_matmul(p, x, stride)
        a = u[:, : s * cout].reshape(t * s, cout)
        bb = u[:, s * cout:].reshape(t * s, cout)
        y = (jnp.pad(a, ((0, s), (0, 0)))
             + jnp.pad(bb, ((s, 0), (0, 0))))        # (T*s + s, Cout)
    else:
        # general overlap-add scatter
        w = p["w"]
        cout = w.shape[1]
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
    k = (2 * stride if ("qt" in p or "qt4" in p) else p["w"].shape[-1])
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


# ---------------------------------------------------------------------------
# BLOCKED-TIME ops for narrow-channel stages
# ---------------------------------------------------------------------------
# A flat (T*s, C) tensor with C < 128 wastes most of each (8, 128) lane
# tile, and XLA answers with time-minor layouts + multi-MB relayout copies
# (~110 us/frame at batch 32 on the 64-channel seanet tail). The blocked
# representation packs s consecutive timesteps into the lane axis:
#   xb[t, j*C + c] == x_flat[t*s + j, c],   xb: (T, s*C)
# The k == 2*stride convtr produces this layout NATURALLY (its matmul
# against the j-major flattened weight emits (T, k*Cout) columns in
# exactly (j, o) order), causal convs become lane-block shifts + one
# matmul against a block-diagonal weight, and elementwise ops don't care.


def _blockdiag(wj, s: int):
    """(Cin, Cout) tap -> (s*Cin, s*Cout) block-diagonal (I_s kron wj)."""
    return jnp.kron(jnp.eye(s, dtype=wj.dtype), wj)


def conv1d_blocked(p, xb, prev_row):
    """Causal streaming conv over a blocked (T, s*Cin) tensor.

    p: {"w": (Cout, Cin, K), "b"?}; prev_row: (1, s*Cin) last blocked row
    of the PREVIOUS frame's input (zeros initially) — it supplies the
    K-1 (< s) timesteps of left context. Returns (new_prev_row,
    yb (T, s*Cout)).
    """
    w = p["w"]
    cout, cin, k = w.shape
    t, sc = xb.shape
    assert sc % cin == 0
    sblk = sc // cin
    assert k - 1 < sblk, (k, sblk)
    top = jnp.concatenate([prev_row, xb[:-1]], axis=0)       # rows t-1
    y = jnp.zeros((t, sblk * cout), jnp.float32)
    for d in range(k):                                        # lookback d
        wj = w[:, :, k - 1 - d].T                             # (Cin, Cout)
        if d == 0:
            src = xb
        else:
            lanes = d * cin
            src = jnp.concatenate([top[:, sc - lanes:], xb[:, : sc - lanes]],
                                  axis=1)
        y = y + jnp.dot(src, _blockdiag(wj, sblk).astype(xb.dtype),
                        preferred_element_type=jnp.float32)
    y = y.astype(xb.dtype)
    b = p.get("b")
    if b is not None:
        y = y + jnp.tile(b, sblk)[None, :]
    return xb[-1:], y


def streaming_conv_transpose1d_blocked(p, prev_row, x, stride: int):
    """Streaming k == 2*stride transposed conv emitting the BLOCKED layout.

    x: (T, Cin) flat rows; prev_row: (1, s*Cout) previous frame's trailing
    pre-bias overlap row. Returns (new_prev_row, yb (T, s*Cout)) — the
    matmul against the j-major flattened weight already emits (j, o)
    column order, so no reshape ever materializes the flat (T*s, Cout).
    """
    s = stride
    u, cout, k = _convtr_matmul(p, x, stride)
    assert k == 2 * s, (k, s)
    a = u[:, : s * cout]                      # taps j <  s: rows t
    bb = u[:, s * cout:]                      # taps j >= s: rows t+1
    yb = (jnp.pad(a, ((0, 1), (0, 0)))
          + jnp.pad(bb, ((1, 0), (0, 0))))    # (T+1, s*Cout)
    yb = yb.at[:1].add(prev_row)
    new_prev = yb[-1:]
    b_ = p.get("b")
    out = yb[:-1]
    if b_ is not None:
        out = out + jnp.tile(b_, s)[None, :]
    return new_prev, out


def depthwise_upsample(p, x, kernel: int, stride: int):
    """Depthwise transposed conv for T=1 input — the mimi 16x upsampler
    (groups == channels == 512, k=32, s=16; ref: models/mimi.h:11-17 and the
    per-channel mul-concat hack at conv.h:283-301, replaced here by a single
    broadcasted multiply).

    x: (1, C); w: (C, 1, K). Returns full pre-bias y: (K, C) time-major.
    """
    w = p["w"]  # (C, 1, K)
    return x * w[:, 0, :].T  # (1,C)*(K,C) -> (K,C)
