"""A/B the flash/insert kernels' stream-group size on real TPU: the
round-3 group-8 picker (int8 caches, raised scoped-VMEM limit) vs the old
group-4 8MB-budget picker, on the B=32 serving cohort chunk (the config
both the cohort bench and the continuous server run). Also checks the
full valid-masked audio matches between the two groupings (same math,
same flash accumulation order within a stream — must be bit-identical)."""
import dataclasses
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import DEFAULT_CONFIG
from pocket_tts_tpu.io.params import random_params, random_voice_prompt
from pocket_tts_tpu.io.quant import quantize_params
from pocket_tts_tpu.models import backbone, mimi
from pocket_tts_tpu.ops import pallas_attn
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
mimi_template = mimi.init_state(cfg0.mimi, dtype)
max_steps = int((count_words(text) + 2.0) * cfg0.mimi.frame_rate)
scan_len = 150
params_q4 = quantize_params(params, bits=4)
cfg_f = dataclasses.replace(cfg0, backbone=dataclasses.replace(
    cfg0.backbone, quantize_kv=True, fuse_insert=True))


def fetch(out):
    return float(np.asarray(out[0]).ravel()[0])


def full_pcm(out):
    pcm, valid = np.asarray(out[0]), np.asarray(out[1])
    return pcm * valid[..., None].astype(pcm.dtype)


def b32():
    from pocket_tts_tpu.runtime.batched import (batched_decode_sentence,
                                                batched_prime_voice,
                                                batched_sentence_prefill,
                                                stack_states)
    B = 32
    prompts = jnp.asarray(np.stack(
        [np.pad(random_voice_prompt(cfg0, 120, seed=i), ((0, 8), (0, 0)))
         for i in range(B)])).astype(dtype)
    vs = stack_states([backbone.init_state(cfg_f.backbone, dtype)
                       for _ in range(B)])
    vs = batched_prime_voice(params_q4, cfg_f, vs, prompts,
                             jnp.full((B,), 120, jnp.int32))
    vs = backbone.shrink_state(vs, 384)
    sts = batched_sentence_prefill(params_q4, cfg_f, vs, mimi_template,
                                   jnp.tile(tokens[None], (B, 1)),
                                   jnp.full((B,), len(ids), jnp.int32))
    rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(B)])

    def run():
        _, pcm, valid = batched_decode_sentence(
            params_q4, cfg_f, sts, rngs, jnp.full((B,), 0.0, jnp.float32),
            jnp.full((B,), 3, jnp.int32),
            jnp.full((B,), max_steps, jnp.int32), scan_len)
        return pcm, valid

    out = run()
    frames = int(np.asarray(out[1]).sum() // B)
    pcm = full_pcm(out)
    best = float("inf")
    for _ in range(3):
        dms, _ = device_ms(run, fetch, match="decode_sentence")
        best = min(best, dms)
    return frames * B / (best / 1e3), pcm, frames


def old_pick(bsz, bytes_per_stream, itemsize):
    for cand in (4, 2):
        if bsz % cand == 0 and cand * bytes_per_stream <= 8 * 1024 * 1024:
            return cand, None
    return 1, None


res = {}
pcms = {}
new_pick = pallas_attn._pick_group
for name, pick in (("group8", new_pick), ("group4", old_pick)):
    pallas_attn._pick_group = pick
    jax.clear_caches()
    try:
        fps, pcm, frames = b32()
        res[name] = {"b32_srv_fps": round(fps, 1), "frames": frames}
        pcms[name] = pcm
    except Exception as e:
        res[name] = {"error": f"{type(e).__name__}: {str(e)[:500]}"}
    print(name, res[name], flush=True)
pallas_attn._pick_group = new_pick

a, b = pcms.get("group8"), pcms.get("group4")
if a is not None and b is not None:
    same = a.shape == b.shape and bool(np.array_equal(a, b))
    res["audio_bit_identical"] = same
    if not same:
        diff = float(np.abs(a - b).max()) if a.shape == b.shape else None
        print(f"AUDIO MISMATCH: max abs diff {diff}", flush=True)
print(json.dumps(res))
