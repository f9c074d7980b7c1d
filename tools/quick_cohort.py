"""Quick cohort-serving aggregate fps at batch B on TPU (bench.py's
serving_batch_fps, standalone for kernel iteration).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/quick_cohort.py \
           [batch ...]   (default: 128)
"""
import dataclasses
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import device_ms  # noqa: E402

from pocket_tts_tpu.config import DEFAULT_CONFIG  # noqa: E402
from pocket_tts_tpu.io.params import (random_params,  # noqa: E402
                                      random_voice_prompt)
from pocket_tts_tpu.io.quant import quantize_params  # noqa: E402
from pocket_tts_tpu.models import backbone, mimi  # noqa: E402
from pocket_tts_tpu.runtime.batched import (  # noqa: E402
    batched_decode_sentence, batched_prime_voice, batched_sentence_prefill,
    mesh_cfg, stack_states)
from pocket_tts_tpu.text.preprocess import (count_words,  # noqa: E402
                                            prepare_text_prompt)
from pocket_tts_tpu.text.tokenizer import MockTokenizer  # noqa: E402
from pocket_tts_tpu.utils.profiling import enable_compile_cache  # noqa: E402

enable_compile_cache("/tmp/jaxcache")

dtype = jnp.bfloat16
params, cfg = random_params(DEFAULT_CONFIG, seed=0, dtype=dtype)
params_q4 = quantize_params(params, bits=4)
cfg_srv = dataclasses.replace(cfg, backbone=dataclasses.replace(
    cfg.backbone, quantize_kv=os.environ.get("QC_KV", "1") == "1"))
cfg_srv_b = mesh_cfg(cfg_srv, None)
# config A/B knobs for in-loop attribution (program-level timing is the
# only trustworthy instrument at batch)
if os.environ.get("QC_FUSE", "1") == "0":
    cfg_srv_b = dataclasses.replace(cfg_srv_b, backbone=dataclasses.replace(
        cfg_srv_b.backbone, fuse_insert=False))
if os.environ.get("QC_PALLAS", "1") == "0":
    cfg_srv_b = dataclasses.replace(cfg_srv_b, backbone=dataclasses.replace(
        cfg_srv_b.backbone, use_pallas_attn=False, fuse_insert=False))

tok = MockTokenizer(cfg.lut.n_bins)
BENCH_TEXT = ("The quick brown fox jumps over the lazy dog while the "
              "curious cat watches from a sunny windowsill nearby.")
text, _ = prepare_text_prompt(BENCH_TEXT)
ids = tok.encode(text)
tokens = jnp.asarray(np.pad(np.asarray(ids, np.int32), (0, 64 - len(ids))))
mimi_template = mimi.init_state(cfg.mimi, dtype)
max_steps = int((count_words(text) + 2.0) * cfg.mimi.frame_rate)
scan_len = 150


def fetch(out):
    return float(np.asarray(out[0]).ravel()[0])


def serving_batch_fps(bsz):
    prompts_b = jnp.asarray(np.stack(
        [np.pad(random_voice_prompt(cfg, 120, seed=i), ((0, 8), (0, 0)))
         for i in range(bsz)])).astype(dtype)
    vsq = batched_prime_voice(params_q4, cfg_srv_b,
                              stack_states([backbone.init_state(
                                  cfg_srv_b.backbone, dtype)
                                  for _ in range(bsz)]),
                              prompts_b, jnp.full((bsz,), 120, jnp.int32))
    vsq = backbone.shrink_state(vsq, 384)
    stsq = batched_sentence_prefill(
        params_q4, cfg_srv_b, vsq, mimi_template,
        jnp.tile(tokens[None], (bsz, 1)),
        jnp.full((bsz,), len(ids), jnp.int32))
    rngs_b = jnp.stack([jax.random.PRNGKey(i) for i in range(bsz)])

    def runq():
        _, pcm, valid = batched_decode_sentence(
            params_q4, cfg_srv_b, stsq, rngs_b,
            jnp.full((bsz,), 0.0, jnp.float32),
            jnp.full((bsz,), 3, jnp.int32),
            jnp.full((bsz,), max_steps, jnp.int32), scan_len)
        return pcm, valid

    out = runq()
    frames = int(np.asarray(out[1])[0].sum())
    fetch(out)
    best = float("inf")
    for _ in range(3):
        dmsq, _ = device_ms(runq, fetch, match="decode_sentence")
        best = min(best, dmsq)
    fps = frames * bsz / (best / 1e3)
    print(f"B={bsz}: {fps:.0f} f/s aggregate "
          f"({best / frames * 1e3:.1f} us/frame-step, {frames} frames)",
          flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [128]
    for b in sizes:
        serving_batch_fps(b)
