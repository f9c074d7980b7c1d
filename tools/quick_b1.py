"""Quick B=1 quantized-decode fps on TPU (bench.py's b1_fps, one config).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/quick_b1.py \
           [int4|q40|int8|srv]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import device_ms  # noqa: E402
import dataclasses  # noqa: E402

from pocket_tts_tpu.config import DEFAULT_CONFIG  # noqa: E402
from pocket_tts_tpu.io.params import (random_params,  # noqa: E402
                                      random_voice_prompt)
from pocket_tts_tpu.io.quant import quantize_params  # noqa: E402
from pocket_tts_tpu.models import backbone, mimi, tts  # noqa: E402
from pocket_tts_tpu.text.preprocess import (count_words,  # noqa: E402
                                            prepare_text_prompt)
from pocket_tts_tpu.text.tokenizer import MockTokenizer  # noqa: E402

mode = sys.argv[1] if len(sys.argv) > 1 else "q40"
dtype = jnp.bfloat16
params, cfg = random_params(DEFAULT_CONFIG, seed=0, dtype=dtype)
tok = MockTokenizer(cfg.lut.n_bins)
text, _ = prepare_text_prompt(
    "The quick brown fox jumped over the sleeping dog.")
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

cfg_x = cfg
if mode == "int8":
    params_x = quantize_params(params, bits=8)
elif mode == "int4":
    params_x = quantize_params(params, bits=4)
elif mode == "q40":
    params_x = quantize_params(params, bits=4, group=32)
elif mode == "srv":
    params_x = quantize_params(params, bits=4)
    cfg_x = dataclasses.replace(cfg, backbone=dataclasses.replace(
        cfg.backbone, quantize_kv=True))
else:
    raise SystemExit(mode)

vstate = tts.jit_prime_voice(params_x, cfg_x,
                             backbone.init_state(cfg_x.backbone, dtype),
                             prompt, jnp.int32(120))
vstate = backbone.shrink_state(vstate, 384)
state0 = tts.jit_sentence_prefill(params_x, cfg_x, vstate, mimi_template,
                                  tokens, jnp.int32(len(ids)))


def run_q():
    _, pcm, valid = tts.jit_decode_sentence_early_exit(
        params_x, cfg_x, state0, rng, temp, fae, jnp.int32(max_steps),
        scan_len)
    return pcm, valid


def fetch(out):
    return float(np.asarray(out[0]).ravel()[0])


out = run_q()
frames = int(np.asarray(out[1]).sum())
fetch(out)
best = None
for _ in range(3):
    dms, _ = device_ms(run_q, fetch, match="decode_sentence_early_exit")
    fps = frames / (dms / 1e3)
    best = fps if best is None else max(best, fps)
    print(f"{mode}: {fps:.0f} f/s ({frames} frames, {dms:.2f} ms)",
          flush=True)
print(f"BEST {mode}: {best:.0f} f/s")
