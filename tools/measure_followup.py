"""On-TPU follow-up probes (run after tools/measure_kernels.py):

1. B=1 early-exit decode with q4_0 GROUPED int4 scales vs per-channel
   int4 — quantifies what the grouped layout costs (it bypasses the
   fused layer/flow kernels and dequantizes in-kernel at group
   granularity). Decision input for --quantize q4_0's docs.
2. Cohort serving knee at B=128 (int4 weights + int8 KV): does the
   aggregate keep climbing past the measured 45.3k f/s at B=64?

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_followup.py
Prints one JSON line per measurement.
"""
import dataclasses
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import BENCH_TEXT, device_ms  # noqa: E402

from pocket_tts_tpu.config import DEFAULT_CONFIG  # noqa: E402
from pocket_tts_tpu.io.params import (random_params,  # noqa: E402
                                      random_voice_prompt)
from pocket_tts_tpu.io.quant import quantize_params  # noqa: E402
from pocket_tts_tpu.models import backbone, mimi, tts  # noqa: E402
from pocket_tts_tpu.runtime.batched import (  # noqa: E402
    batched_decode_sentence, batched_prime_voice, batched_sentence_prefill,
    stack_states)
from pocket_tts_tpu.text.preprocess import (count_words,  # noqa: E402
                                            prepare_text_prompt)
from pocket_tts_tpu.text.tokenizer import MockTokenizer  # noqa: E402


def main():
    dtype = jnp.bfloat16
    params, cfg = random_params(DEFAULT_CONFIG, seed=0, dtype=dtype)
    tok = MockTokenizer(cfg.lut.n_bins)
    text, _ = prepare_text_prompt(BENCH_TEXT)
    ids = tok.encode(text)
    tokens = jnp.asarray(np.pad(np.asarray(ids, np.int32),
                                (0, 64 - len(ids))))
    prompt = jnp.asarray(np.pad(random_voice_prompt(cfg, 120),
                                ((0, 8), (0, 0)))).astype(dtype)
    mimi_template = mimi.init_state(cfg.mimi, dtype)
    max_steps = int((count_words(text) + 2.0) * cfg.mimi.frame_rate)
    scan_len = 150
    rng = jax.random.PRNGKey(0)
    temp = jnp.float32(0.0)
    fae = jnp.int32(3)

    def fetch(out):
        return float(np.asarray(out[0]).ravel()[0])

    def b1_fps(params_x, cfg_x):
        vs = tts.jit_prime_voice(
            params_x, cfg_x, backbone.init_state(cfg_x.backbone, dtype),
            prompt, jnp.int32(120))
        vs = backbone.shrink_state(vs, 384)
        st0 = tts.jit_sentence_prefill(params_x, cfg_x, vs, mimi_template,
                                       tokens, jnp.int32(len(ids)))

        def run():
            _, pcm, valid = tts.jit_decode_sentence_early_exit(
                params_x, cfg_x, st0, rng, temp, fae, jnp.int32(max_steps),
                scan_len)
            return pcm, valid

        out = run()
        frames = int(np.asarray(out[1]).sum())
        fetch(out)
        dms, _ = device_ms(run, fetch, match="decode_sentence_early_exit")
        return frames / (dms / 1e3)

    params_q4 = quantize_params(params, bits=4)
    params_q40 = quantize_params(params, bits=4, group=32)
    fps_q4 = b1_fps(params_q4, cfg)
    fps_q40 = b1_fps(params_q40, cfg)
    print(json.dumps({"probe": "b1_int4_per_channel_vs_q4_0",
                      "int4_fps": round(fps_q4, 1),
                      "q4_0_fps": round(fps_q40, 1)}), flush=True)
    del params_q40

    # --- B=128 cohort serving knee -------------------------------------
    cfg_srv = dataclasses.replace(cfg, backbone=dataclasses.replace(
        cfg.backbone, quantize_kv=True))

    def serving_batch_fps(bsz):
        prompts_b = jnp.asarray(np.stack(
            [np.pad(random_voice_prompt(cfg, 120, seed=i), ((0, 8), (0, 0)))
             for i in range(bsz)])).astype(dtype)
        vsq = batched_prime_voice(
            params_q4, cfg_srv,
            stack_states([backbone.init_state(cfg_srv.backbone, dtype)
                          for _ in range(bsz)]),
            prompts_b, jnp.full((bsz,), 120, jnp.int32))
        vsq = backbone.shrink_state(vsq, 384)
        stsq = batched_sentence_prefill(
            params_q4, cfg_srv, vsq, mimi_template,
            jnp.tile(tokens[None], (bsz, 1)),
            jnp.full((bsz,), len(ids), jnp.int32))
        rngs_b = jnp.stack([jax.random.PRNGKey(i) for i in range(bsz)])

        def runq():
            _, pcm, valid = batched_decode_sentence(
                params_q4, cfg_srv, stsq, rngs_b,
                jnp.full((bsz,), 0.0, jnp.float32),
                jnp.full((bsz,), 3, jnp.int32),
                jnp.full((bsz,), max_steps, jnp.int32), scan_len)
            return pcm, valid

        out = runq()   # compile + warm
        frames = int(np.asarray(out[1])[0].sum())
        fetch(out)
        dms, _ = device_ms(runq, fetch, match="decode_sentence")
        return frames * bsz / (dms / 1e3)

    for bsz in (64, 128):
        try:
            fps = serving_batch_fps(bsz)
            print(json.dumps({"probe": "serving_cohort_knee", "batch": bsz,
                              "fps": round(fps, 1)}), flush=True)
        except Exception as e:  # e.g. HBM OOM at 128
            print(json.dumps({"probe": "serving_cohort_knee", "batch": bsz,
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
