"""Micro: pick the int4 nibble-unpack scheme (quant_matmul.INT4_SCHEME)
on the real TPU, measured in the real loop (B=1 int4 early-exit decode +
batch-32 serving frame), not an isolated kernel."""
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
import pocket_tts_tpu.ops.quant_matmul as qm

sys.path.insert(0, "/root/repo")
from bench import device_ms, BENCH_TEXT  # noqa: E402

dtype = jnp.bfloat16
params, cfg = random_params(DEFAULT_CONFIG, seed=0, dtype=dtype)
tok = MockTokenizer(cfg.lut.n_bins)
text, _ = prepare_text_prompt(BENCH_TEXT)
ids = tok.encode(text)
tokens = jnp.asarray(np.pad(np.asarray(ids, np.int32), (0, 64 - len(ids))))
prompt = jnp.asarray(
    np.pad(random_voice_prompt(cfg, 120), ((0, 8), (0, 0)))).astype(dtype)
mimi_template = mimi.init_state(cfg.mimi, dtype)
max_steps = int((count_words(text) + 2.0) * cfg.mimi.frame_rate)
scan_len = 150
rng = jax.random.PRNGKey(0)
temp = jnp.float32(0.0)
fae = jnp.int32(3)
params_q4 = quantize_params(params, bits=4)


def fetch(out):
    return float(np.asarray(out[0]).ravel()[0])


def b1_ms():
    vstate_q = tts.jit_prime_voice(
        params_q4, cfg, backbone.init_state(cfg.backbone, dtype),
        prompt, jnp.int32(120))
    vstate_q = backbone.shrink_state(vstate_q, 384)
    state0_q = tts.jit_sentence_prefill(params_q4, cfg, vstate_q,
                                        mimi_template, tokens,
                                        jnp.int32(len(ids)))

    def run_q():
        _, pcm, valid = tts.jit_decode_sentence_early_exit(
            params_q4, cfg, state0_q, rng, temp, fae,
            jnp.int32(max_steps), scan_len)
        return pcm, valid

    out = run_q()
    frames = int(np.asarray(out[1]).sum())
    fetch(out)
    best = float("inf")
    for _ in range(3):
        dms, _ = device_ms(run_q, fetch, match="decode_sentence_early_exit")
        best = min(best, dms)
    return best, frames


results = {}
for scheme in ("unpack", "rawdot", "rawf32", "rawf32m", "lo8"):
    qm.INT4_SCHEME = scheme
    # new scheme -> new jaxpr; clear the qmm lru cache so tracing re-reads
    # INT4_SCHEME (fused_layer reads it at trace time too)
    qm._make_qmm.cache_clear()
    jax.clear_caches()
    t0 = time.perf_counter()
    dms, frames = b1_ms()
    results[scheme] = {"device_ms": round(dms, 2),
                       "fps": round(frames / (dms / 1e3), 1),
                       "wall_s": round(time.perf_counter() - t0, 1)}
    print(scheme, results[scheme], flush=True)

print(json.dumps(results))
