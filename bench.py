#!/usr/bin/env python
"""Headline benchmark: single-stream decode throughput (frames/s) at batch=1,
plus batched aggregate throughput.

Mirrors the reference's --bench (demos/pocket-tts.cpp:230-236,517-520): fixed
sentence, seed 0, temperature 0, no audio output. The reference reports
~19 frames/s on its author's CPU (README.md:19); realtime is 12.5 frames/s;
the repo target is >=625 frames/s on one v5e chip (BASELINE.md).

Timing forces a device->host fetch each rep — on this remote-TPU setup
block_until_ready alone does not guarantee execution completed.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import sys
import time

import numpy as np

BASELINE_FPS = 19.0
BENCH_TEXT = "The quick brown fox jumped over the sleeping dog."


def main():
    import jax
    import jax.numpy as jnp
    from pocket_tts_tpu.config import DEFAULT_CONFIG
    from pocket_tts_tpu.io.params import random_params, random_voice_prompt
    from pocket_tts_tpu.models import backbone, mimi, tts
    from pocket_tts_tpu.runtime.batched import (batched_decode_sentence,
                                                batched_prime_voice,
                                                batched_sentence_prefill,
                                                stack_states)
    from pocket_tts_tpu.text.preprocess import count_words, prepare_text_prompt
    from pocket_tts_tpu.text.tokenizer import MockTokenizer

    dev = jax.devices()[0]
    dtype = jnp.bfloat16
    params, cfg = random_params(DEFAULT_CONFIG, seed=0, dtype=dtype)

    # --- conditioning (off the clock, like the reference's model load) -----
    tok = MockTokenizer(cfg.lut.n_bins)
    text, _ = prepare_text_prompt(BENCH_TEXT)
    ids = tok.encode(text)
    tokens = jnp.asarray(np.pad(np.asarray(ids, np.int32),
                                (0, 64 - len(ids))))
    prompt = jnp.asarray(
        np.pad(random_voice_prompt(cfg, 120), ((0, 8), (0, 0)))).astype(dtype)

    vstate = tts.jit_prime_voice(
        params, cfg, backbone.init_state(cfg.backbone, dtype), prompt,
        jnp.int32(120))
    mimi_template = mimi.init_state(cfg.mimi, dtype)
    state0 = tts.jit_sentence_prefill(params, cfg, vstate, mimi_template,
                                      tokens, jnp.int32(len(ids)))

    max_steps = int((count_words(text) + 2.0) * cfg.mimi.frame_rate)  # 137
    scan_len = 150
    rng = jax.random.PRNGKey(0)
    temp = jnp.float32(0.0)
    fae = jnp.int32(3)

    def run():
        _, pcm, valid = tts.jit_decode_sentence(
            params, cfg, state0, rng, temp, fae, jnp.int32(max_steps),
            scan_len)
        return pcm, valid

    # warmup/compile; the fetch forces real completion
    t0 = time.perf_counter()
    pcm, valid = run()
    frames = int(np.asarray(valid).sum())
    float(np.asarray(pcm).sum())
    compile_s = time.perf_counter() - t0

    # time-to-first-audio: prefill + one frame, steady state
    st = tts.jit_sentence_prefill(params, cfg, vstate, mimi_template, tokens,
                                  jnp.int32(len(ids)))
    _, f1, _ = tts.jit_frame_step(params, cfg, st, rng, temp, fae,
                                  jnp.int32(max_steps))
    float(np.asarray(f1).sum())
    t0 = time.perf_counter()
    st2 = tts.jit_sentence_prefill(params, cfg, vstate, mimi_template, tokens,
                                   jnp.int32(len(ids)))
    _, f1, _ = tts.jit_frame_step(params, cfg, st2, rng, temp, fae,
                                  jnp.int32(max_steps))
    float(np.asarray(f1).sum())
    ttfa_ms = (time.perf_counter() - t0) * 1e3

    # steady-state single-stream decode throughput
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        pcm, _ = run()
        float(np.asarray(pcm).ravel()[0])
    dt = time.perf_counter() - t0
    fps = frames * reps / dt
    rtf = fps / cfg.mimi.frame_rate

    # batched aggregate throughput (32 sentences x 32 voices; BASELINE cfg 4)
    B = 32
    prompts = jnp.asarray(np.stack(
        [np.pad(random_voice_prompt(cfg, 120, seed=i), ((0, 8), (0, 0)))
         for i in range(B)])).astype(dtype)
    vs = stack_states([backbone.init_state(cfg.backbone, dtype)
                       for _ in range(B)])
    vs = batched_prime_voice(params, cfg, vs, prompts,
                             jnp.full((B,), 120, jnp.int32))
    toks_b = jnp.tile(tokens[None], (B, 1))
    sts = batched_sentence_prefill(params, cfg, vs, mimi_template, toks_b,
                                   jnp.full((B,), len(ids), jnp.int32))
    rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(B)])

    def runb():
        _, pcm, valid = batched_decode_sentence(
            params, cfg, sts, rngs, jnp.full((B,), 0.0, jnp.float32),
            jnp.full((B,), 3, jnp.int32), jnp.full((B,), max_steps, jnp.int32),
            scan_len)
        return pcm

    float(np.asarray(runb()).ravel()[0])  # compile
    reps_b = 2
    t0 = time.perf_counter()
    for _ in range(reps_b):
        float(np.asarray(runb()).ravel()[0])
    dtb = time.perf_counter() - t0
    fps_batch = frames * B * reps_b / dtb

    print(json.dumps({
        "metric": "decode_frames_per_second",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "rtf": round(rtf, 2),
        "frames": frames,
        "ttfa_ms": round(ttfa_ms, 2),
        "compile_s": round(compile_s, 2),
        "batch32_frames_per_second": round(fps_batch, 2),
        "batch32_rtf": round(fps_batch / cfg.mimi.frame_rate, 2),
        "dtype": "bfloat16",
        "device": str(dev),
        "batch": 1,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
