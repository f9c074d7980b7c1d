"""On-TPU A/B: B=1 int4 early-exit decode, use_bilayer off vs on.

The bilayer kernel (ops/fused_layer.bilayer_post_pre) fuses
post-attention(l) + pre-attention(l+1) into one Pallas call — one Mosaic
boundary fewer per layer on the solo quantized decode path. This measures
whether the saved boundary beats whatever pipelining the split calls got
from XLA, end to end, plus an audio-equality check at temp 0.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_bilayer.py
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
    params_q4 = quantize_params(params, bits=4)

    def fetch(out):
        return float(np.asarray(out[0]).ravel()[0])

    def b1(cfg_x):
        vs = tts.jit_prime_voice(
            params_q4, cfg_x, backbone.init_state(cfg_x.backbone, dtype),
            prompt, jnp.int32(120))
        vs = backbone.shrink_state(vs, 384)
        st0 = tts.jit_sentence_prefill(params_q4, cfg_x, vs, mimi_template,
                                       tokens, jnp.int32(len(ids)))

        def run():
            _, pcm, valid = tts.jit_decode_sentence_early_exit(
                params_q4, cfg_x, st0, rng, temp, fae,
                jnp.int32(max_steps), scan_len)
            return pcm, valid

        out = run()
        frames = int(np.asarray(out[1]).sum())
        pcm = np.asarray(out[0], np.float32)
        valid = np.asarray(out[1])
        fetch(out)
        dms, _ = device_ms(run, fetch, match="decode_sentence_early_exit")
        return frames / (dms / 1e3), pcm[valid.astype(bool)]

    fps_off, pcm_off = b1(cfg)
    cfg_bi = dataclasses.replace(cfg, backbone=dataclasses.replace(
        cfg.backbone, use_bilayer=True))
    fps_on, pcm_on = b1(cfg_bi)
    same = (pcm_off.shape == pcm_on.shape
            and bool(np.allclose(pcm_off, pcm_on, atol=2e-2)))
    maxd = (float(np.abs(pcm_off - pcm_on).max())
            if pcm_off.shape == pcm_on.shape else float("nan"))
    print(json.dumps({"probe": "b1_int4_bilayer",
                      "fps_off": round(fps_off, 1),
                      "fps_on": round(fps_on, 1),
                      "audio_close": same,
                      "pcm_maxdiff": maxd}), flush=True)


if __name__ == "__main__":
    main()
