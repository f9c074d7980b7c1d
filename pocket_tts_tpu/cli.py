"""pocket-tts CLI — mirrors the reference demo's flag surface.

ref: /root/reference/demos/pocket-tts.cpp:16-52 (flags), :213-236 (--bench
defaults), :450-520 (streaming loop + frames/s report).

Usage:
  python -m pocket_tts_tpu.cli [options] "Hey, how is it going?"
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="pocket-tts", description=__doc__)
    p.add_argument("text", nargs="?", default=None)
    p.add_argument("-l", "--list-devices", action="store_true",
                   help="list accelerator devices and exit")
    p.add_argument("-d", "--device", default=None,
                   help="jax platform to use (tpu/cpu)")
    p.add_argument("--threads", type=int, default=None,
                   help="accepted for parity; ignored (XLA manages threads)")
    p.add_argument("-r", "--model-root", default=None,
                   help="root for kyutai models (MODEL_CACHE analog)")
    p.add_argument("-m", "--model", default=None, help="model directory")
    p.add_argument("-v", "--voice", default="cosette",
                   help="voice name or voice .safetensors path")
    p.add_argument("-o", "--output", default=None, help="output wav path")
    p.add_argument("-i", "--input", default=None, help="input text file")
    p.add_argument("-s", "--seed", type=int, default=None)
    p.add_argument("-t", "--temperature", type=float, default=None)
    p.add_argument("--bench", action="store_true",
                   help="bench defaults: fixed text, seed 0, temp 0")
    p.add_argument("--random-weights", action="store_true",
                   help="use random weights (no checkpoint needed)")
    p.add_argument("--batch", type=int, default=1,
                   help="synthesize the text N times batched (throughput)")
    p.add_argument("--json", action="store_true",
                   help="emit bench stats as one JSON line")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.device:
        os.environ["JAX_PLATFORMS"] = args.device
    import jax
    import jax.numpy as jnp

    if args.list_devices:
        for d in jax.devices():
            print(d)
        return 0

    text = args.text
    if args.input:
        with open(args.input) as f:
            text = f.read()
    seed = args.seed
    temp = args.temperature
    if args.bench:
        if text is None:
            text = "The quick brown fox jumped over the sleeping dog."
        if seed is None:
            seed = 0
        if temp is None:
            temp = 0.0
    if text is None:
        build_parser().print_help()
        return 1
    seed = 0 if seed is None else seed
    temp = 0.6 if temp is None else temp

    model_path = args.model or os.path.join(
        args.model_root or os.environ.get("MODEL_CACHE", "."),
        "kyutai", "pocket-tts-without-voice-cloning")

    from .config import DEFAULT_CONFIG
    from .runtime.engine import TTSEngine
    from .io.wav import save_wav

    if args.random_weights or not os.path.exists(
            os.path.join(model_path, "tts_b6369a24.safetensors")):
        if not args.random_weights:
            print(f"note: no checkpoint under {model_path}; "
                  "using random weights", file=sys.stderr)
        from .io.params import random_params, random_voice_prompt
        params, cfg = random_params(DEFAULT_CONFIG)
        engine = TTSEngine(params=params, cfg=cfg, seed=seed)
        voice = random_voice_prompt(cfg)
    else:
        engine = TTSEngine(model_path=model_path, seed=seed)
        voice = args.voice
    engine.set_seed(seed)
    print(f"seed: {engine.seed}")

    # streaming loop: feed 15-char chunks to simulate streaming
    # (ref: demos/pocket-tts.cpp:467-481)
    stream = engine.open_stream(voice, temp)
    pcm_out = []
    pos = 0
    gen_start = time.perf_counter()
    lm_time = 0.0
    frames = 0
    active = True
    while active:
        active = False
        if pos < len(text):
            chunk = text[pos:pos + 15]
            pos += len(chunk)
            t0 = time.perf_counter()
            stream.send(chunk)
            if pos >= len(text):
                stream.flush()
            lm_time += time.perf_counter() - t0
            active = True
        t0 = time.perf_counter()
        frame = stream.receive()
        if frame is not None:
            lm_time += time.perf_counter() - t0
            frames += 1
            pcm_out.append(frame)
            active = True

    total = time.perf_counter() - gen_start
    fps = frames / lm_time if lm_time > 0 else 0.0
    print(f"done generating. {total:.3f}")
    print(f"frame count: {frames:4d} frames")
    print(f"frame rate:  {fps:f} frames/s")
    if args.json:
        print(json.dumps({
            "metric": "frames_per_second", "value": fps, "unit": "frames/s",
            "frames": frames, "total_s": total,
            "rtf": fps / engine.cfg.mimi.frame_rate,
        }))

    if pcm_out and args.output:
        pcm = np.concatenate(pcm_out)
        save_wav(args.output, pcm, engine.sample_rate)
        print(f"wrote {args.output}: {len(pcm) / engine.sample_rate:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
