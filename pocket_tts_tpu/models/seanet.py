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
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import SeanetConfig
from ..ops.basic import elu
from ..ops.conv import (conv1d, conv1d_init_state,
                        conv_transpose1d_init_state, streaming_conv1d,
                        streaming_conv_transpose1d)


def init_state(cfg: SeanetConfig, t_in: int, dtype=jnp.float32):
    """Zeroed conv tails / overlap-add carries for a fixed per-frame input
    length t_in (16 for the standard model; ref: models/mimi.h:62)."""
    state = {"model_0": conv1d_init_state(cfg.in_ch, cfg.first_kernel, 1, dtype)}
    t = t_in  # length tracking through the pipeline
    names = ["model_2", "model_5", "model_8"]
    res_names = ["model_3", "model_6", "model_9"]
    for st, name, rname in zip(cfg.stages, names, res_names):
        state[name] = conv_transpose1d_init_state(
            st.out_ch, st.kernel, st.stride, t, dtype)
        t = t * st.stride
        state[rname] = conv1d_init_state(st.out_ch, cfg.resnet_kernel, 1, dtype)
    state["model_11"] = conv1d_init_state(
        cfg.stages[-1].out_ch, cfg.last_kernel, 1, dtype)
    return state


def _resnet(p, prev, x, kernel: int):
    """x + conv1x1(elu(conv_k(elu(x)))). ref: moshi_seanet_resnet_block,
    seanet.h:14-27."""
    v = elu(x)
    prev, v = streaming_conv1d(p["block_1"], prev, v, stride=1)
    v = elu(v)
    v = conv1d(p["block_3"], v, stride=1)
    return prev, x + v


def forward(p, cfg: SeanetConfig, state, x):
    """x: (T, in_ch) -> (new_state, pcm (T * total_stride, 1))."""
    new_state = {}
    new_state["model_0"], x = streaming_conv1d(
        p["model_0"], state["model_0"], x, stride=1)
    x = elu(x)
    names = ["model_2", "model_5", "model_8"]
    res_names = ["model_3", "model_6", "model_9"]
    for st, name, rname in zip(cfg.stages, names, res_names):
        new_state[name], x = streaming_conv_transpose1d(
            p[name], state[name], x, stride=st.stride)
        new_state[rname], x = _resnet(p[rname], state[rname], x,
                                      cfg.resnet_kernel)
        x = elu(x)
    new_state["model_11"], x = streaming_conv1d(
        p["model_11"], state["model_11"], x, stride=1)
    return new_state, x
