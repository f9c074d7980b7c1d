"""Top-level TTS model: jit-compiled prefill / frame-step / sentence-decode.

This is the TPU-native replacement for the reference's per-frame
build-execute-discard graphs and 4+ host round-trips per frame
(SURVEY.md §3.3): everything — backbone step, EOS head, flow sampling with
on-device PRNG, latent de-normalization, the full Mimi decode chain — runs as
ONE compiled function per 80 ms frame, and `decode_sentence` scans it over
the whole sentence with EOS bookkeeping kept on device.

ref orchestration: /root/reference/src/pocket_tts.cpp:40-124,416-519.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from flax import struct

from ..config import ModelConfig
from . import backbone, flow_lm, mimi


@struct.dataclass
class StreamState:
    """Everything carried across frames for one stream."""
    flow: backbone.BackboneState
    mimi: mimi.MimiState
    prev_latent: jax.Array   # (latent,) backbone input for the next step
    eos_step: jax.Array      # () int32, -1 until EOS seen
    step: jax.Array          # () int32 frames generated this sentence
    done: jax.Array          # () bool


def init_stream_state(p, cfg: ModelConfig, dtype=jnp.float32) -> StreamState:
    return StreamState(
        flow=backbone.init_state(cfg.backbone, dtype),
        mimi=mimi.init_state(cfg.mimi, dtype),
        prev_latent=p["bos_emb"].astype(dtype),
        eos_step=jnp.full((), -1, jnp.int32),
        step=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
    )


# ---------------------------------------------------------------------------
# conditioning
# ---------------------------------------------------------------------------

def prime_voice(p, cfg: ModelConfig, flow_state: backbone.BackboneState,
                prompt, n_valid):
    """Run the voice audio-prompt embeddings through the backbone once; the
    resulting KV is the reusable per-voice prefix.
    ref: get_state_for_audio_prompt, src/pocket_tts.cpp:100-124.

    prompt: (Tp, d_model) padded; n_valid real rows.
    """
    return flow_lm.prefill(p, cfg, flow_state, prompt, n_valid)


def sentence_prefill(p, cfg: ModelConfig, voice_state: backbone.BackboneState,
                     mimi_template: mimi.MimiState, tokens, n_valid):
    """Start a sentence: copy the voice-primed KV (a functional no-op — we
    just start from its value; ref copy_states src/pocket_tts.cpp:423), reset
    mimi states, prefill the text tokens. Returns a fresh StreamState.

    tokens: (Tt,) int32 padded; n_valid real tokens.
    """
    emb = flow_lm.embed_tokens(p, tokens)
    flow_state = flow_lm.prefill(p, cfg, voice_state, emb, n_valid)
    return StreamState(
        flow=flow_state,
        mimi=jax.tree.map(jnp.zeros_like, mimi_template),
        prev_latent=p["bos_emb"].astype(emb.dtype),
        eos_step=jnp.full((), -1, jnp.int32),
        step=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
    )


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------

def frame_step(p, cfg: ModelConfig, state: StreamState, rng, temp,
               frames_after_eos, max_steps):
    """Generate one frame. Returns (state, pcm (frame_size,), valid bool).

    EOS protocol (ref: _stream_sentence_step, src/pocket_tts.cpp:446-492):
    the backbone runs first; if this step fires EOS for the first time,
    eos_step is recorded; the frame is NOT emitted once
    step >= eos_step + frames_after_eos or step >= max_steps.

    The step is computed unconditionally — finished streams keep advancing
    on garbage latents with emission masked. This keeps the slot cursor and
    step counter batch-uniform so batched serving never scatters.
    """
    noise = (jnp.sqrt(jnp.asarray(temp, jnp.float32))
             * jax.random.normal(rng, state.prev_latent.shape, jnp.float32)
             ).astype(state.prev_latent.dtype)

    fstate, latent, is_eos = flow_lm.decode_step(
        p, cfg, state.flow, state.prev_latent, noise)
    eos_step = jnp.where((state.eos_step < 0) & is_eos & ~state.done,
                         state.step, state.eos_step)
    stop = (state.done
            | ((eos_step >= 0) & (state.step >= eos_step + frames_after_eos))
            | (state.step >= max_steps))
    # KV slot budget exhausted: the CURRENT frame's slot was still in
    # bounds, so it is emitted; only future frames stop. (The reference
    # leaves this overflow unhandled — src/pocket_tts.cpp:425 TODO.)
    # Capacity comes from the cache shape: sentences run on shrunk slot
    # budgets (backbone.shrink_state). In prefix+ring mode the cursor
    # wraps below capacity, so this stop never fires — admission bounds
    # each request to the ring size instead (runtime/server.py).
    capacity = fstate.k[0].shape[-2]
    done_next = stop | (fstate.end >= capacity)
    mimi_in = flow_lm.denormalize(p, latent)
    mstate, pcm = mimi.decode_frame(p["mimi"], cfg.mimi, state.mimi,
                                    mimi_in, cfg.gelu_approx)
    new = StreamState(
        flow=fstate, mimi=mstate, prev_latent=latent,
        eos_step=eos_step, step=state.step + 1, done=done_next)
    pcm = jnp.where(stop, 0.0, 1.0) * pcm.astype(jnp.float32)
    return new, pcm, ~stop


def decode_sentence(p, cfg: ModelConfig, state: StreamState, rng, temp,
                    frames_after_eos, max_steps, scan_len: int):
    """Scan frame_step for scan_len frames entirely on device.

    Returns (state, pcm (scan_len, frame_size), valid (scan_len,) bool).
    scan_len is static (bucketed by the caller); max_steps is the dynamic
    per-sentence limit (ref max_gen_len = (words+2)*12.5,
    src/pocket_tts.cpp:429-430).
    """
    def body(carry, i):
        st = carry
        st, pcm, valid = frame_step(
            p, cfg, st, jax.random.fold_in(rng, i), temp,
            frames_after_eos, max_steps)
        return st, (pcm, valid)

    state, (pcm, valid) = jax.lax.scan(
        body, state, jnp.arange(scan_len, dtype=jnp.int32))
    return state, pcm, valid


def decode_sentence_early_exit(p, cfg: ModelConfig, state: StreamState, rng,
                               temp, frames_after_eos, max_steps,
                               scan_len: int):
    """Like decode_sentence but a lax.while_loop that STOPS once the stream
    is done — with real weights EOS fires well before max_steps, so this
    skips the dead tail the scan would still compute. Single-stream offline
    path; rng folding matches decode_sentence exactly (same audio).
    """
    pcm_buf = jnp.zeros((scan_len, cfg.mimi.frame_size), jnp.float32)
    valid_buf = jnp.zeros((scan_len,), bool)

    def cond(carry):
        i, st, _, _ = carry
        return (i < scan_len) & ~st.done

    def body(carry):
        i, st, pcm_buf, valid_buf = carry
        st, pcm, valid = frame_step(
            p, cfg, st, jax.random.fold_in(rng, i), temp,
            frames_after_eos, max_steps)
        pcm_buf = jax.lax.dynamic_update_slice(pcm_buf, pcm[None], (i, 0))
        valid_buf = valid_buf.at[i].set(valid)
        return i + 1, st, pcm_buf, valid_buf

    _, state, pcm_buf, valid_buf = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, pcm_buf, valid_buf))
    return state, pcm_buf, valid_buf


# ---------------------------------------------------------------------------
# jit wrappers (static: cfg, scan_len)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,))
def jit_prime_voice(p, cfg, flow_state, prompt, n_valid):
    return prime_voice(p, cfg, flow_state, prompt, n_valid)


@functools.partial(jax.jit, static_argnums=(1,))
def jit_sentence_prefill(p, cfg, voice_state, mimi_template, tokens, n_valid):
    return sentence_prefill(p, cfg, voice_state, mimi_template, tokens, n_valid)


@functools.partial(jax.jit, static_argnums=(1,))
def jit_frame_step(p, cfg, state, rng, temp, frames_after_eos, max_steps):
    return frame_step(p, cfg, state, rng, temp, frames_after_eos, max_steps)


@functools.partial(jax.jit, static_argnums=(1, 7))
def jit_decode_sentence(p, cfg, state, rng, temp, frames_after_eos, max_steps,
                        scan_len):
    return decode_sentence(p, cfg, state, rng, temp, frames_after_eos,
                           max_steps, scan_len)


@functools.partial(jax.jit, static_argnums=(1, 7))
def jit_decode_sentence_early_exit(p, cfg, state, rng, temp, frames_after_eos,
                                   max_steps, scan_len):
    return decode_sentence_early_exit(p, cfg, state, rng, temp,
                                      frames_after_eos, max_steps, scan_len)
