"""A/B the fused KV insert on real TPU: B=1 int4+int8KV early-exit decode
and B=32 serving chunk, fuse_insert True vs False."""
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
mimi_template = mimi.init_state(cfg0.mimi, dtype)
max_steps = int((count_words(text) + 2.0) * cfg0.mimi.frame_rate)
scan_len = 150
rng = jax.random.PRNGKey(0)
temp = jnp.float32(0.0)
fae = jnp.int32(3)
params_q4 = quantize_params(params, bits=4)


def fetch(out):
    return float(np.asarray(out[0]).ravel()[0])


def b1(cfg_x, params_x):
    vs = tts.jit_prime_voice(params_x, cfg_x,
                             backbone.init_state(cfg_x.backbone, dtype),
                             prompt, jnp.int32(120))
    vs = backbone.shrink_state(vs, 384)
    st = tts.jit_sentence_prefill(params_x, cfg_x, vs, mimi_template,
                                  tokens, jnp.int32(len(ids)))

    def run():
        _, pcm, valid = tts.jit_decode_sentence_early_exit(
            params_x, cfg_x, st, rng, temp, fae, jnp.int32(max_steps),
            scan_len)
        return pcm, valid

    out = run()
    frames = int(np.asarray(out[1]).sum())
    first = fetch(out)
    best = float("inf")
    for _ in range(3):
        dms, _ = device_ms(run, fetch, match="decode_sentence_early_exit")
        best = min(best, dms)
    return frames / (best / 1e3), first, frames


def b32(cfg_x, params_x):
    from pocket_tts_tpu.runtime.batched import (batched_decode_sentence,
                                                batched_prime_voice,
                                                batched_sentence_prefill,
                                                stack_states)
    B = 32
    prompts = jnp.asarray(np.stack(
        [np.pad(random_voice_prompt(cfg0, 120, seed=i), ((0, 8), (0, 0)))
         for i in range(B)])).astype(dtype)
    vs = stack_states([backbone.init_state(cfg_x.backbone, dtype)
                       for _ in range(B)])
    vs = batched_prime_voice(params_x, cfg_x, vs, prompts,
                             jnp.full((B,), 120, jnp.int32))
    vs = backbone.shrink_state(vs, 384)
    sts = batched_sentence_prefill(params_x, cfg_x, vs, mimi_template,
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
    first = fetch(out)
    best = float("inf")
    for _ in range(3):
        dms, _ = device_ms(run, fetch, match="decode_sentence")
        best = min(best, dms)
    return frames * B / (best / 1e3), first, frames


cfg_srv = dataclasses.replace(cfg0, backbone=dataclasses.replace(
    cfg0.backbone, quantize_kv=True))
res = {}


def variant(name, fn):
    t0 = time.perf_counter()
    try:
        res[name] = fn()
        res[name]["wall_s"] = round(time.perf_counter() - t0, 1)
    except Exception as e:
        res[name] = {"error": f"{type(e).__name__}: {str(e)[:400]}"}
    print(name, res[name], flush=True)


def srv_variant(fuse, mega):
    cfg_f = dataclasses.replace(cfg_srv, backbone=dataclasses.replace(
        cfg_srv.backbone, fuse_insert=fuse, use_megalayer=mega))

    def run():
        fps1, a1, fr = b1(cfg_f, params_q4)
        out = {"b1_int4srv_fps": round(fps1, 1), "audio0": a1, "frames": fr}
        if not mega:  # batch path is identical for mega (rule delegates)
            fps32, _, _ = b32(cfg_f, params_q4)
            out["b32_srv_fps"] = round(fps32, 1)
        return out
    return run


variant("dus", srv_variant(False, False))
variant("fuse", srv_variant(True, False))
variant("mega", srv_variant(True, True))

# audio equality (fp tolerance) between paths
a0 = res["dus"].get("audio0")
for k in ("fuse", "mega"):
    ax = res[k].get("audio0")
    if a0 is not None and ax is not None:
        print(f"audio diff {k} vs dus: {abs(ax - a0):.2e}", flush=True)

# bf16 B=1 (no KV quant): fused insert on the plain path
for fuse in (True, False):
    cfg_f = dataclasses.replace(cfg0, backbone=dataclasses.replace(
        cfg0.backbone, fuse_insert=fuse))

    def run(cfg_f=cfg_f):
        fps1, a1, fr = b1(cfg_f, params)
        return {"b1_bf16_fps": round(fps1, 1)}
    variant(f"bf16 fuse={fuse}", run)

print(json.dumps(res))
