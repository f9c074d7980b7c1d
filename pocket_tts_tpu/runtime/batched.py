"""Batched / sharded multi-stream serving.

New capability vs the reference (which is hard-coded batch 1,
mimi_transformer.h:326-327): stream states are stacked on a leading batch
axis, every step function is vmapped, and the stacked state optionally shards
over a ("data", "model") device mesh for v5e-slice serving.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models import backbone, mimi, tts
from ..text.preprocess import count_words, prepare_text_prompt
from .engine import TTSEngine, _bucket, _SCAN_BUCKET


def stack_states(states: Sequence):
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *states)


def unstack_states(state, n: int):
    return [jax.tree.map(lambda x: x[i], state) for i in range(n)]


@functools.partial(jax.jit, static_argnums=(1,))
def batched_prime_voice(p, cfg, states, prompts, n_valid):
    """prompts: (B, Tp, d), n_valid: (B,)."""
    return jax.vmap(
        lambda s, pr, n: tts.prime_voice(p, cfg, s, pr, n),
        in_axes=(0, 0, 0))(states, prompts, n_valid)


@functools.partial(jax.jit, static_argnums=(1,))
def batched_sentence_prefill(p, cfg, voice_states, mimi_template, tokens,
                             n_valid):
    return jax.vmap(
        lambda vs, tk, n: tts.sentence_prefill(p, cfg, vs, mimi_template,
                                               tk, n),
        in_axes=(0, 0, 0))(voice_states, tokens, n_valid)


@functools.partial(jax.jit, static_argnums=(1,))
def batched_frame_step(p, cfg, states, rngs, temp, frames_after_eos,
                       max_steps):
    """states: stacked StreamState (B, ...); rngs (B, 2); scalars (B,)."""
    return jax.vmap(
        lambda s, r, t, f, m: tts.frame_step(p, cfg, s, r, t, f, m),
        in_axes=(0, 0, 0, 0, 0))(states, rngs, temp, frames_after_eos,
                                 max_steps)


@functools.partial(jax.jit, static_argnums=(1, 7))
def batched_decode_sentence(p, cfg, states, rngs, temp, frames_after_eos,
                            max_steps, scan_len):
    return jax.vmap(
        lambda s, r, t, f, m: tts.decode_sentence(p, cfg, s, r, t, f, m,
                                                  scan_len),
        in_axes=(0, 0, 0, 0, 0))(states, rngs, temp, frames_after_eos,
                                 max_steps)


class BatchedEngine:
    """Synthesize many sentences concurrently on one chip (vmap) or a mesh."""

    def __init__(self, engine: TTSEngine, mesh=None):
        self.engine = engine
        self.mesh = mesh

    def prime_voices(self, prompts: Sequence[np.ndarray]):
        """prompts: list of (Tp_i, d_model) arrays -> stacked voice states."""
        eng = self.engine
        tp = max(_bucket(p.shape[0], (32, 64, 128, 256)) for p in prompts)
        padded = np.stack([
            np.pad(np.asarray(p, np.float32), ((0, tp - p.shape[0]), (0, 0)))
            for p in prompts])
        n_valid = jnp.asarray([p.shape[0] for p in prompts], jnp.int32)
        states = stack_states([backbone.init_state(eng.cfg.backbone,
                                                   eng.dtype)
                               for _ in prompts])
        return batched_prime_voice(eng.params, eng.cfg, states,
                                   jnp.asarray(padded, eng.dtype), n_valid)

    def synthesize_batch(self, texts: List[str], voice_states,
                         temp: float = 0.7) -> List[np.ndarray]:
        """One prepared sentence per stream -> list of PCM arrays."""
        eng = self.engine
        b = len(texts)
        prepared = [prepare_text_prompt(t) for t in texts]
        ids = [eng.tokenizer.encode(t) for t, _ in prepared]
        tp = max(_bucket(len(i)) for i in ids)
        tokens = jnp.asarray(np.stack([
            np.pad(np.asarray(i, np.int32), (0, tp - len(i))) for i in ids]))
        n_valid = jnp.asarray([len(i) for i in ids], jnp.int32)
        states = batched_sentence_prefill(
            eng.params, eng.cfg, voice_states, eng._mimi_template, tokens,
            n_valid)
        if self.mesh is not None:
            from ..parallel.sharding import shard_batched_state
            states = shard_batched_state(states, self.mesh)

        max_steps = np.asarray(
            [int((count_words(t) + 2.0) * eng.cfg.mimi.frame_rate)
             for t, _ in prepared], np.int32)
        fae = jnp.asarray([g + 2 for _, g in prepared], jnp.int32)
        scan_len = -(-int(max_steps.max()) // _SCAN_BUCKET) * _SCAN_BUCKET
        rngs = jnp.stack([eng._next_rng() for _ in range(b)])
        _, pcm, valid = batched_decode_sentence(
            eng.params, eng.cfg, states, rngs,
            jnp.full((b,), temp, eng.dtype), fae,
            jnp.asarray(max_steps), scan_len)
        pcm = np.asarray(pcm)
        valid = np.asarray(valid)
        return [pcm[i, valid[i]].reshape(-1) for i in range(b)]
