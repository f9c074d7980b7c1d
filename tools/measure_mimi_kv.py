"""A/B the mimi-ring int8 KV cache on real TPU.

Serving config (int4 weights + backbone int8 KV) with and without
cfg.mimi.transformer.quantize_kv, at B=1 early-exit decode and B=32
serving chunk (both resolved through mesh_cfg like the bench), plus an
audio-delta check vs the all-bf16-cache run.
"""
import dataclasses
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import DEFAULT_CONFIG
from pocket_tts_tpu.io.params import random_params, random_voice_prompt
from pocket_tts_tpu.io.quant import quantize_params
from pocket_tts_tpu.models import backbone, mimi, tts
from pocket_tts_tpu.runtime.batched import mesh_cfg
from pocket_tts_tpu.text.preprocess import count_words, prepare_text_prompt
from pocket_tts_tpu.text.tokenizer import MockTokenizer

sys.path.insert(0, "/root/repo")
from bench import device_ms, BENCH_TEXT  # noqa: E402

dtype = jnp.bfloat16
params, cfg0 = random_params(DEFAULT_CONFIG, seed=0, dtype=dtype)
tok = MockTokenizer(cfg0.lut.n_bins)
text, _ = prepare_text_prompt(BENCH_TEXT)
ids = tok.encode(text)
tokens = jnp.asarray(np.pad(np.asarray(ids, np.int32), (0, 64 - len(ids))))
prompt = jnp.asarray(
    np.pad(random_voice_prompt(cfg0, 120), ((0, 8), (0, 0)))).astype(dtype)
max_steps = int((count_words(text) + 2.0) * cfg0.mimi.frame_rate)
scan_len = 150
rng = jax.random.PRNGKey(0)
temp = jnp.float32(0.0)
fae = jnp.int32(3)
params_q4 = quantize_params(params, bits=4)


def fetch(out):
    return float(np.asarray(out[0]).ravel()[0])


def b1(cfg_x, params_x):
    mt = mimi.init_state(cfg_x.mimi, dtype)
    vs = tts.jit_prime_voice(params_x, cfg_x,
                             backbone.init_state(cfg_x.backbone, dtype),
                             prompt, jnp.int32(120))
    vs = backbone.shrink_state(vs, 384)
    st = tts.jit_sentence_prefill(params_x, cfg_x, vs, mt,
                                  tokens, jnp.int32(len(ids)))

    def run():
        _, pcm, valid = tts.jit_decode_sentence_early_exit(
            params_x, cfg_x, st, rng, temp, fae, jnp.int32(max_steps),
            scan_len)
        return pcm, valid

    out = run()
    frames = int(np.asarray(out[1]).sum())
    pcm0 = np.asarray(out[0])
    best = float("inf")
    for _ in range(3):
        dms, _ = device_ms(run, fetch, match="decode_sentence_early_exit")
        best = min(best, dms)
    return frames / (best / 1e3), pcm0, frames


def b32(cfg_x, params_x):
    from pocket_tts_tpu.runtime.batched import (batched_decode_sentence,
                                                batched_prime_voice,
                                                batched_sentence_prefill,
                                                stack_states)
    B = 32
    mt = mimi.init_state(cfg_x.mimi, dtype)
    prompts = jnp.asarray(np.stack(
        [np.pad(random_voice_prompt(cfg0, 120, seed=i), ((0, 8), (0, 0)))
         for i in range(B)])).astype(dtype)
    vs = stack_states([backbone.init_state(cfg_x.backbone, dtype)
                       for _ in range(B)])
    vs = batched_prime_voice(params_x, cfg_x, vs, prompts,
                             jnp.full((B,), 120, jnp.int32))
    vs = backbone.shrink_state(vs, 384)
    sts = batched_sentence_prefill(params_x, cfg_x, vs, mt,
                                   jnp.tile(tokens[None], (B, 1)),
                                   jnp.full((B,), len(ids), jnp.int32))
    rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(B)])

    def run():
        _, pcm, valid = batched_decode_sentence(
            params_x, cfg_x, sts, rngs, jnp.full((B,), 0.0, jnp.float32),
            jnp.full((B,), 3, jnp.int32),
            jnp.full((B,), max_steps, jnp.int32), scan_len)
        return pcm, valid

    out = run()
    frames = int(np.asarray(out[1]).sum() // B)
    pcm0 = np.asarray(out[0][0])
    best = float("inf")
    for _ in range(3):
        dms, _ = device_ms(run, fetch, match="decode_sentence")
        best = min(best, dms)
    return frames * B / (best / 1e3), pcm0, frames


def with_kv(cfg, bb: bool, mi: bool):
    return dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(cfg.backbone, quantize_kv=bb),
        mimi=dataclasses.replace(
            cfg.mimi, transformer=dataclasses.replace(
                cfg.mimi.transformer, quantize_kv=mi)))


res = {}


def variant(name, fn):
    t0 = time.perf_counter()
    try:
        res[name] = fn()
        res[name]["wall_s"] = round(time.perf_counter() - t0, 1)
    except Exception as e:
        import traceback
        traceback.print_exc()
        res[name] = {"error": f"{type(e).__name__}: {str(e)[:400]}"}
    print(name, res[name], flush=True)


pcm_ref = {}


def measure(name, bb, mi):
    cfg_x = mesh_cfg(with_kv(cfg0, bb, mi), None)

    def run():
        fps1, pcm1, fr = b1(cfg_x, params_q4)
        fps32, pcm32, _ = b32(cfg_x, params_q4)
        if name == "none":
            pcm_ref["b1"], pcm_ref["b32"] = pcm1, pcm32
        out = {"b1_fps": round(fps1, 1), "b32_fps": round(fps32, 1),
               "frames": fr}
        if "b1" in pcm_ref:
            d = np.abs(pcm1.astype(np.float32)
                       - pcm_ref["b1"].astype(np.float32))
            out["b1_audio_maxdelta"] = float(d.max())
        return out
    variant(name, run)


measure("none", False, False)          # bf16 caches (audio reference)
measure("bb", True, False)             # current serving config
measure("bb+mimi", True, True)         # + the new mimi int8 ring
print(json.dumps(res))
