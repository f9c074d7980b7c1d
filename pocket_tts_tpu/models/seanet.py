"""SEANet streaming decoder: latent channels -> 24 kHz PCM.

Pipeline (ref: ptts_seanet_decoder, src/pocket_tts/modules/seanet.h:187-211
and defaults at models/defaults.h:44-122):
  model_0:  streaming conv k7 s1, 512->512
  elu
  model_2:  streaming convtr k12 s6, 512->256   + model_3 resnet (256->128->256)
  elu
  model_5:  streaming convtr k10 s5, 256->128   + model_6 resnet
  elu
  model_8:  streaming convtr k8 s4, 128->64     + model_9 resnet
  elu
  model_11: streaming conv k3 s1, 64->1

All convs operate TIME-MAJOR on (T, C) for one stream (see ops/conv.py for
why); each frame of 16 input steps yields exactly 16*120 = 1920 samples.

Stages whose output channels fall below the 128-lane tile run in the
BLOCKED-TIME representation (T, s*C) end-to-end — for the 64-channel last
stage the flat (1920, 64) tensors tile-padded half-empty and XLA repaired
its own time-minor layout choices with ~110 us/frame of reshape+copy at
batch 32. The k == 2*stride convtr emits the blocked layout natively and
the resnet/final convs run as lane-block shifts + block-diagonal matmuls
(ops/conv.py conv1d_blocked), so no flat tensor is ever materialized; the
only reshape left is the final (T, s) -> (T*s,) pcm flatten.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import SeanetConfig
from ..ops.basic import elu
from ..ops.conv import (conv1d, conv1d_init_state, conv1d_blocked,
                        conv_transpose1d_init_state, streaming_conv1d,
                        streaming_conv_transpose1d,
                        streaming_conv_transpose1d_blocked)


def _blocked(cfg: SeanetConfig, idx: int) -> bool:
    """Run a stage blocked when it is the LAST stage (its output feeds only
    the resnet + final conv, which understand the representation), its
    output channels underfill a lane tile, and the k=3 convs' left context
    (2 steps) fits inside one block."""
    st = cfg.stages[idx]
    return (idx == len(cfg.stages) - 1 and st.out_ch < 128
            and st.stride > max(cfg.resnet_kernel, cfg.last_kernel) - 1)


def init_state(cfg: SeanetConfig, t_in: int, dtype=jnp.float32):
    """Zeroed conv tails / overlap-add carries for a fixed per-frame input
    length t_in (16 for the standard model; ref: models/mimi.h:62)."""
    state = {"model_0": conv1d_init_state(cfg.in_ch, cfg.first_kernel, 1, dtype)}
    names = ["model_2", "model_5", "model_8"]
    res_names = ["model_3", "model_6", "model_9"]
    for si, (st, name, rname) in enumerate(zip(cfg.stages, names,
                                               res_names)):
        if _blocked(cfg, si):
            # blocked carries: one (1, s*C) row each for the convtr
            # overlap-add and the resnet/final convs' left context
            state[name] = jnp.zeros((1, st.stride * st.out_ch), dtype)
            state[rname] = jnp.zeros((1, st.stride * st.out_ch), dtype)
        else:
            state[name] = conv_transpose1d_init_state(
                st.out_ch, st.kernel, st.stride, t_in, dtype)
            state[rname] = conv1d_init_state(st.out_ch, cfg.resnet_kernel,
                                             1, dtype)
    last = cfg.stages[-1]
    if _blocked(cfg, len(cfg.stages) - 1):
        state["model_11"] = jnp.zeros((1, last.stride * last.out_ch), dtype)
    else:
        state["model_11"] = conv1d_init_state(
            last.out_ch, cfg.last_kernel, 1, dtype)
    return state


def encoder_init_state(cfg: SeanetConfig, dtype=jnp.float32):
    """Zeroed causal-conv tails for the streaming SEANet ENCODER.

    The encoder is the decoder mirrored — the reference carries it as
    compiled-out code (moshi_seanet_encoder, seanet.h:61-158: conv, then
    [resnet, elu, strided conv] per stage, elu, final conv) with no shipped
    defaults (the pocket-tts build and checkpoint are decode-only), so the
    module indices generalize the dead code's model_0..model_14 numbering
    over len(cfg.stages): conv at 0, group i's resnet/conv at 3i+1 / 3i+3,
    final conv at 3N+2. For the shipped 3-stage decoder config that is
    model_0, (1,3), (4,6), (7,9), elu, model_11 — the exact transpose of
    the decoder's indices.
    """
    n = len(cfg.stages)
    state = {"model_0": conv1d_init_state(cfg.out_ch, cfg.first_kernel, 1,
                                          dtype)}
    for gi, st in enumerate(reversed(cfg.stages)):
        state[f"model_{3 * gi + 1}"] = conv1d_init_state(
            st.out_ch, cfg.resnet_kernel, 1, dtype)
        state[f"model_{3 * gi + 3}"] = conv1d_init_state(
            st.out_ch, st.kernel, st.stride, dtype)
    state[f"model_{3 * n + 2}"] = conv1d_init_state(
        cfg.stages[0].in_ch, cfg.last_kernel, 1, dtype)
    return state


def encoder_forward(p, cfg: SeanetConfig, state, x):
    """Streaming encode: pcm (T, out_ch) -> (new_state, latents
    (T // total_stride, in_ch)). T must be a multiple of
    cfg.total_stride per call (one decoder frame = 1920 samples -> 16
    latent steps for the shipped config).

    Channel flow mirrors the decoder exactly: out_ch -> stages[-1].out_ch
    via the first conv, each reversed stage's strided conv doubles
    channels (st.out_ch -> st.in_ch, kernel/stride shared with the
    decoder's convtr), the final conv maps stages[0].in_ch -> in_ch.
    ref: moshi_seanet_encoder, seanet.h:97-123 (dead code, generalized).
    """
    new_state = {}
    new_state["model_0"], x = streaming_conv1d(
        p["model_0"], state["model_0"], x, stride=1)
    n = len(cfg.stages)
    for gi, st in enumerate(reversed(cfg.stages)):
        ri, ci = f"model_{3 * gi + 1}", f"model_{3 * gi + 3}"
        new_state[ri], x = _resnet(p[ri], state[ri], x, cfg.resnet_kernel)
        x = elu(x)
        new_state[ci], x = streaming_conv1d(p[ci], state[ci], x,
                                            stride=st.stride)
    x = elu(x)
    fi = f"model_{3 * n + 2}"
    new_state[fi], x = streaming_conv1d(p[fi], state[fi], x, stride=1)
    return new_state, x


def _resnet(p, prev, x, kernel: int):
    """x + conv1x1(elu(conv_k(elu(x)))). ref: moshi_seanet_resnet_block,
    seanet.h:14-27."""
    v = elu(x)
    prev, v = streaming_conv1d(p["block_1"], prev, v, stride=1)
    v = elu(v)
    v = conv1d(p["block_3"], v, stride=1)
    return prev, x + v


def _resnet_blocked(p, prev, xb, s: int):
    v = elu(xb)
    prev, v = conv1d_blocked(p["block_1"], v, prev)
    v = elu(v)
    # 1x1 conv: a plain block-diagonal matmul, no context needed
    _, v = conv1d_blocked(p["block_3"], v, v[-1:] * 0)
    return prev, xb + v


def forward(p, cfg: SeanetConfig, state, x):
    """x: (T, in_ch) -> (new_state, pcm (T * total_stride, 1))."""
    import jax
    use_pallas = cfg.use_pallas
    if use_pallas is None:  # auto: megakernel on TPU, XLA chain elsewhere
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and "w" in p["model_0"]:
        from ..ops.pallas_seanet import kernel_ok, seanet_frame
        if kernel_ok(cfg):
            # the ENTIRE decoder chain in one Pallas call per frame
            # (ops/pallas_seanet.py); falls through to the XLA chain for
            # non-reference shapes or conv-quantized params
            return seanet_frame(
                p, cfg, state, x,
                interpret=(jax.default_backend() == "cpu"))
    new_state = {}
    new_state["model_0"], x = streaming_conv1d(
        p["model_0"], state["model_0"], x, stride=1)
    x = elu(x)
    names = ["model_2", "model_5", "model_8"]
    res_names = ["model_3", "model_6", "model_9"]
    blocked = False
    s_blk = 1
    for si, (st, name, rname) in enumerate(zip(cfg.stages, names,
                                               res_names)):
        if _blocked(cfg, si):
            blocked, s_blk = True, st.stride
            new_state[name], x = streaming_conv_transpose1d_blocked(
                p[name], state[name], x, st.stride)
            new_state[rname], x = _resnet_blocked(p[rname], state[rname], x,
                                                  st.stride)
        else:
            new_state[name], x = streaming_conv_transpose1d(
                p[name], state[name], x, stride=st.stride)
            new_state[rname], x = _resnet(p[rname], state[rname], x,
                                          cfg.resnet_kernel)
        x = elu(x)
    if blocked:
        new_state["model_11"], yb = conv1d_blocked(
            p["model_11"], x, state["model_11"])
        # (T, s*out_ch) -> (T*s, out_ch): the only flatten in the stage,
        # on the tiny final pcm tensor
        return new_state, yb.reshape(-1, cfg.out_ch)
    new_state["model_11"], x = streaming_conv1d(
        p["model_11"], state["model_11"], x, stride=1)
    return new_state, x
