"""Decode-only Mimi codec: 32-d latent -> 1920 samples of 24 kHz PCM.

Chain (ref: mimi_decode_from_latent, src/pocket_tts/models/mimi.h:85-104):
  quantizer output-proj conv1x1 (32 -> 512)            mimi.h:77-83
  16x depthwise transposed-conv upsample (k32 s16)     mimi.h:11-17
  2-layer ring-KV transformer over the 16 tokens       defaults.h:3-42
  SEANet transposed-conv decoder stack                 defaults.h:44-122
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import MimiConfig
from . import mimi_transformer, seanet
from ..ops.conv import depthwise_upsample


@struct.dataclass
class MimiState:
    upsample_prev: jax.Array  # (upsample_kernel, dim) overlap-add carry
    transformer: mimi_transformer.MimiTransformerState
    seanet: dict


def init_state(cfg: MimiConfig, dtype=jnp.float32) -> MimiState:
    return MimiState(
        upsample_prev=jnp.zeros((cfg.upsample_kernel, cfg.dim), dtype),
        transformer=mimi_transformer.init_state(cfg.transformer, dtype),
        seanet=seanet.init_state(cfg.seanet, cfg.upsample_stride, dtype),
    )


def decode_frame(p, cfg: MimiConfig, state: MimiState, latent,
                 gelu_approx: bool = False):
    """latent: (latent_dim,) de-normalized latent -> (new_state, pcm (frame,)).

    The latent has already been scaled by emb_std/emb_mean (the caller does
    that; ref: src/pocket_tts.cpp:472-474).
    """
    # quantizer output projection: conv1x1 == matmul (mimi.h:77-83)
    x = jnp.dot(p["quantizer"]["w"][:, :, 0], latent,
                preferred_element_type=jnp.float32).astype(latent.dtype)

    # depthwise 16x upsample with overlap-add (T=1 -> 16 emitted steps);
    # everything from here runs time-major — the transformer consumes the
    # (16, dim) rows directly and seanet keeps them (the old channel-major
    # chain paid transposes into and out of the transformer every frame)
    k, s = cfg.upsample_kernel, cfg.upsample_stride
    y = depthwise_upsample(p["upsample"], x[None, :], k, s)  # (k, dim)
    y = y.at[: k - s].add(state.upsample_prev[s:])
    new_prev = y
    b = p["upsample"].get("b")
    if b is not None:
        y = y + b[None, :]
    emb = y[: k - s]  # (16, dim)

    tstate, z = mimi_transformer.forward(
        p["decoder_transformer"], cfg.transformer, state.transformer, emb,
        gelu_approx)

    sstate, pcm = seanet.forward(p["decoder"], cfg.seanet, state.seanet, z)
    return (
        MimiState(upsample_prev=new_prev, transformer=tstate, seanet=sstate),
        pcm[:, 0],
    )
