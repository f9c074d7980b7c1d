"""One-command real-weights A/B runner against the C++ reference build.

    python -m pocket_tts_tpu.ab --model-dir DIR [-o OUT] [--text ...]

Pipeline: verify the model directory against the release manifest, load
the real tokenizer + weights, run a reference-exact synthesis (temp 0,
seed 0, ggml numerics switchboard: tanh GELU, -1e5 mask, 250-slot mimi
ring — config.reference_exact_config), write the wav, and dump per-stage
activation probes (tensor sums) to JSON — the analog of the reference's
`ctx.debug` probes (ref /root/reference/src/context.h:526-547) — so the
day real weights exist, diffing against the C++ build is one command per
side, not a project (VERDICT r2 next #5).

Probe protocol (all sums computed in f32 over the full tensor):
  voice_kv_sum[l]     backbone k-cache sum per layer after voice priming
  prefill_kv_sum[l]   same after the sentence-text prefill
  frame[i].latent_sum sampled latent sum at decode step i (temp 0)
  frame[i].eos_logit  the EOS head logit at step i
  frame[i].pcm_sum    the 1920-sample frame pcm sum
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

AB_TEXT = "The quick brown fox jumped over the sleeping dog."


def stage_probes(eng, voice, text: str, n_frames: int = 8) -> dict:
    """Per-stage activation sums for one reference-exact sentence."""
    import jax
    import jax.numpy as jnp
    from .models import flow_lm, mimi, tts
    from .text.preprocess import prepare_text_prompt

    def tsum(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    probes = {"text": text, "temp": 0.0, "seed": eng.seed}
    vs = eng.prime_voice(voice)
    probes["voice_kv_sum"] = [tsum(k) for k in vs.k]
    probes["voice_end"] = int(vs.end)

    prepared, _ = prepare_text_prompt(text)
    state, max_steps = eng._prefill_sentence(vs, prepared)
    probes["prefill_kv_sum"] = [tsum(k) for k in state.flow.k]
    probes["prefill_end"] = int(state.flow.end)

    frames = []
    fstate = state.flow
    prev = state.prev_latent
    mstate = state.mimi
    zero_noise = jnp.zeros_like(prev)
    for i in range(n_frames):
        fstate, latent, is_eos = flow_lm.decode_step(
            eng.params, eng.cfg, fstate, prev, zero_noise)
        from .models import backbone as bb
        fstate = bb.advance(fstate, 1, 1)
        mimi_in = flow_lm.denormalize(eng.params, latent)
        mstate, pcm = mimi.decode_frame(eng.params["mimi"], eng.cfg.mimi,
                                        mstate, mimi_in,
                                        eng.cfg.gelu_approx)
        frames.append({
            "latent_sum": tsum(latent),
            "eos": bool(is_eos),
            "pcm_sum": tsum(pcm),
        })
        prev = latent
    probes["frame"] = frames
    return probes


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="pocket-tts-ab", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--model-dir", required=True,
                   help="release layout dir (tts_b6369a24.safetensors + "
                        "tokenizer.model + embeddings/)")
    p.add_argument("-o", "--out", default="/tmp/pocket_tts_ab",
                   help="output directory for wav + probes JSON")
    p.add_argument("--text", default=AB_TEXT)
    p.add_argument("--voice", default="cosette")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--frames", type=int, default=8,
                   help="decode steps to probe")
    p.add_argument("--skip-verify", action="store_true",
                   help="skip the manifest sha256 check (fixture dirs)")
    args = p.parse_args(argv)

    if not args.skip_verify:
        from .io.fetch import verify_model_dir
        status = verify_model_dir(args.model_dir)
        bad = {k: v for k, v in status.items() if v != "ok"}
        for rel, st in status.items():
            print(f"  {st:8s} {rel}")
        if bad:
            print(f"model dir failed verification: {bad}", file=sys.stderr)
            return 2

    from .config import reference_exact_config
    from .runtime.engine import TTSEngine
    from .io.wav import save_wav

    # load with inferred dims first, then flip the ggml-exact numerics
    # switchboard (shape-free except the mimi ring capacity, which lives in
    # the state, not the params)
    eng0 = TTSEngine(model_path=args.model_dir, seed=args.seed)
    eng = TTSEngine(params=eng0.params,
                    cfg=reference_exact_config(eng0.cfg),
                    tokenizer=eng0.tokenizer, seed=args.seed,
                    model_path=args.model_dir)

    os.makedirs(args.out, exist_ok=True)
    probes = stage_probes(eng, args.voice, args.text, args.frames)
    # per-weight int4/int8 quantization error: flags layers whose real
    # weights would need grouped scales or a fallback (io/quant.py)
    from .io.quant import quantization_error_report
    probes["quant_rel_error_int4"] = quantization_error_report(
        eng.params, bits=4, convs=True)
    probes["quant_rel_error_int8"] = quantization_error_report(
        eng.params, bits=8, convs=True)
    # Q4_0-granularity comparison: if these are much lower than the
    # per-channel int4 errors, ship --quantize q4_0 for this checkpoint
    probes["quant_rel_error_q4_0"] = quantization_error_report(
        eng.params, bits=4, convs=True, group=32)
    probes_path = os.path.join(args.out, "ab_probes.json")
    with open(probes_path, "w") as f:
        json.dump(probes, f, indent=1)

    pcm = eng.synthesize(args.text, args.voice, temp=0.0)
    wav_path = os.path.join(args.out, "ab_out.wav")
    save_wav(wav_path, pcm, eng.sample_rate)
    print(f"wrote {wav_path}: {pcm.size / eng.sample_rate:.2f}s "
          f"({pcm.size // eng.frame_size} frames)")
    print(f"wrote {probes_path}")
    print("diff against the C++ build: run its --bench/ctx.debug probes on "
          "the same text/seed and compare sums; wav should bit-match at "
          "temp 0 modulo f32 accumulation order")
    return 0


if __name__ == "__main__":
    sys.exit(main())
