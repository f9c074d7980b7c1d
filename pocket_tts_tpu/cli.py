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
    p.add_argument("-o", "--output", default=None,
                   help="output audio path (.wav/.flac native; "
                        ".mp3/.ogg via ffmpeg when available)")
    p.add_argument("-i", "--input", default=None, help="input text file")
    p.add_argument("--out-rate", type=int, default=None, metavar="HZ",
                   help="resample output audio to this rate before "
                        "encoding (native polyphase resampler; the "
                        "reference resamples into its encoder the same "
                        "way, demos/ffmpeg_helpers.h:135)")
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
    p.add_argument("--interactive", action="store_true",
                   help="read text from stdin, stream audio per sentence")
    p.add_argument("--quantize", default=None,
                   choices=["int8", "q8", "int4", "q4", "q4_0"],
                   help="per-channel weight quantization (fused Pallas "
                        "dequant-matmul on TPU); q4_0 = int4 with "
                        "32-element K-grouped scales (reference Q4_0 "
                        "granularity, for outlier-heavy real weights)")
    p.add_argument("--quantize-kv", action="store_true",
                   help="int8 backbone KV cache (per-row scales): "
                        "serving-throughput mode, halves decode attention "
                        "cache reads")
    p.add_argument("--quantize-convs", action="store_true",
                   help="also quantize the seanet/mimi conv chain (measured "
                        "net-negative on v5e at batch — see io/quant.py)")
    p.add_argument("--save-cache", default=None, metavar="PATH",
                   help="save the params cache (.safetensors or .gguf; the "
                        "reference's GGUF-conversion pipeline)")
    p.add_argument("--load-cache", default=None, metavar="PATH",
                   help="load params from a cache file (.safetensors/.gguf)")
    p.add_argument("--gguf-quantize", default=None,
                   choices=["q8_0", "q4_0"],
                   help="ggml block quantization for --save-cache *.gguf")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace into DIR")
    p.add_argument("--play", action="store_true",
                   help="play audio while generating (aplay/pw-play/"
                        "ffplay; PcmFifo ring like the reference's SDL "
                        "sink)")
    p.add_argument("--fetch-models", action="store_true",
                   help="download the release files (weights, tokenizer,"
                        " voices) into the model root and exit")
    p.add_argument("--reference-exact", action="store_true",
                   help="ggml-reference-exact numerics (tanh GELU, -1e5 "
                        "mask, 250-slot mimi ring) for A/B comparison")
    p.add_argument("--fuse-insert", action="store_true",
                   help="fold the KV-row insert into the Pallas decode "
                        "attention kernel (experimental; see "
                        "cfg.backbone.fuse_insert)")
    p.add_argument("--megalayer", action="store_true",
                   help="whole-layer megakernel for solo quantized decode "
                        "(implies --fuse-insert; experimental)")
    p.add_argument("--serve", default=None, metavar="PATH",
                   help="continuous-serving mode: read requests from PATH "
                   "('-' = stdin; JSONL objects with text/voice/temp/id or "
                   "plain text lines), decode them through the "
                   "ContinuousBatchingServer (per-chunk admission, no "
                   "cohort padding) and write one wav per request")
    p.add_argument("--serve-out", default=None, metavar="DIR",
                   help="output directory for --serve wavs "
                   "(default: serve_out)")
    p.add_argument("--share-prefix", action="store_true",
                   help="--serve: hold ONE shared copy of each voice's "
                        "prompt KV for the whole batch (vLLM-style "
                        "prefix sharing) instead of one per lane")
    p.add_argument("--lanes", type=int, default=32,
                   help="continuous server decode lanes (--serve; the "
                   "bench knee on v5e is 32-64)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory "
                        "(default ~/.cache/pocket_tts_tpu/xla; 'off' "
                        "disables). First run compiles (~20-40 s on TPU); "
                        "later runs of the same shapes start instantly — "
                        "the analog of the reference's no-compile startup")
    return p


def _enable_compile_cache(path):
    from .utils.profiling import enable_compile_cache
    enable_compile_cache(path)


def _serve(engine, args, default_voice, model_path):
    """Drain a request file through the ContinuousBatchingServer.

    Each input line is one request: a JSON object ({"text": ...,
    "voice"?: ..., "temp"?: ..., "id"?: ...}) or a plain text line.
    Multi-sentence texts re-chunk through the engine's sentence splitter
    (the reference's streaming protocol, text.h:126-178) and the chunks'
    audio concatenates back into ONE wav per request. The serving engine
    itself admits per chunk into a running batch — a lone request does
    not pay cohort padding and a late one does not wait for a cohort
    (runtime/server.py).
    """
    from .io.params import load_voice
    from .io.wav import save_wav
    from .runtime.engine import DEFAULT_VOICES
    from .runtime.server import ContinuousBatchingServer
    from .text.preprocess import split_into_best_sentences

    lines = (sys.stdin.read() if args.serve == "-"
             else open(args.serve).read()).splitlines()
    reqs = []
    for i, line in enumerate(lines):
        line = line.strip()
        if not line:
            continue
        if line.startswith("{"):
            obj = json.loads(line)
        else:
            obj = {"text": line}
        obj.setdefault("id", f"req_{i:04d}")
        obj.setdefault("voice", "default")
        obj.setdefault("temp", args.temperature
                       if args.temperature is not None else 0.6)
        reqs.append(obj)
    if not reqs:
        print("no requests in input", file=sys.stderr)
        return 1

    srv = ContinuousBatchingServer(engine, lanes=args.lanes,
                                   share_prefix=args.share_prefix)

    def resolve(name):
        if not isinstance(default_voice, str):
            # random weights: every name maps to the synthetic prompt
            return np.asarray(default_voice, np.float32)
        v = default_voice if name == "default" else name
        path = (os.path.join(model_path, "embeddings", v + ".safetensors")
                if v in DEFAULT_VOICES else v)
        return np.asarray(load_voice(path), np.float32)

    srv.register_voices({name: resolve(name)
                         for name in {r["voice"] for r in reqs}})

    budget = min(50, srv.text_bucket)
    parts = []  # (request index, chunk index, server Request)
    for ri, obj in enumerate(reqs):
        for ci, chunk in enumerate(split_into_best_sentences(
                engine.tokenizer, obj["text"], budget)):
            parts.append((ri, ci, srv.submit(chunk, obj["voice"],
                                             float(obj["temp"]))))

    t0 = time.perf_counter()
    srv.run_pending()
    wall = time.perf_counter() - t0

    outdir = args.serve_out or "serve_out"
    os.makedirs(outdir, exist_ok=True)
    per_req = {}
    for ri, ci, sr in parts:
        per_req.setdefault(ri, []).append((ci, sr.pcm))
    frames = 0
    for ri, chunks in sorted(per_req.items()):
        pcm = np.concatenate([p for _, p in sorted(chunks)])
        frames += pcm.size // engine.frame_size
        path = os.path.join(outdir, f"{reqs[ri]['id']}.wav")
        save_wav(path, pcm, engine.sample_rate)
    stats = srv.stats()
    stats.update({
        "requests": len(reqs), "chunks": len(parts), "lanes": srv.lanes,
        "wall_s": round(wall, 3),
        "aggregate_frames_per_second": round(frames / wall, 1),
        "outdir": outdir,
    })
    print(json.dumps(stats))
    return 0


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.device:
        os.environ["JAX_PLATFORMS"] = args.device
    import jax
    if args.device:
        # some site setups force jax_platforms at interpreter start, which
        # wins over the env var — re-pin after import
        try:
            jax.config.update("jax_platforms", args.device)
        except RuntimeError:
            pass  # backend already initialized (e.g. under tests)

    if args.list_devices:
        for d in jax.devices():
            print(d)
        return 0

    _enable_compile_cache(args.compile_cache)

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
    if text is None and not args.interactive and not args.save_cache \
            and not args.fetch_models and not args.serve:
        build_parser().print_help()
        return 1
    seed = 0 if seed is None else seed
    temp = 0.6 if temp is None else temp

    model_path = args.model or os.path.join(
        args.model_root or os.environ.get("MODEL_CACHE", "."),
        "kyutai", "pocket-tts-without-voice-cloning")

    if args.fetch_models:
        from .io.fetch import download_models
        root = args.model_root or os.environ.get("MODEL_CACHE", ".")
        written = download_models(root)
        print(f"fetched {len(written)} files into {root}")
        return 0

    from .config import DEFAULT_CONFIG, reference_exact_config
    from .runtime.engine import TTSEngine
    from .io.audio import StreamingEncoder, save_audio

    base_cfg = (reference_exact_config(DEFAULT_CONFIG)
                if args.reference_exact else DEFAULT_CONFIG)
    if args.fuse_insert or args.megalayer:
        import dataclasses
        base_cfg = dataclasses.replace(
            base_cfg, backbone=dataclasses.replace(
                base_cfg.backbone, fuse_insert=True,
                use_megalayer=args.megalayer))

    from .utils.profiling import FrameMeter, device_trace
    import contextlib

    if args.load_cache:
        from .io.quant import load_params_cache
        # a cache may already hold quantized weights; --quantize re-quantizes
        # only if the tree still has full-precision "w" leaves
        engine = TTSEngine(params=load_params_cache(args.load_cache),
                           cfg=base_cfg, seed=seed,
                           quantize=args.quantize,
                           quantize_kv=args.quantize_kv,
                           quantize_convs=args.quantize_convs)
        if args.random_weights:  # no model dir: use a synthetic voice
            from .io.params import random_voice_prompt
            voice = random_voice_prompt(engine.cfg)
        else:
            voice = args.voice
    elif args.random_weights or not os.path.exists(
            os.path.join(model_path, "tts_b6369a24.safetensors")):
        if not args.random_weights:
            print(f"note: no checkpoint under {model_path}; "
                  "using random weights", file=sys.stderr)
        from .io.params import random_params, random_voice_prompt
        params, cfg = random_params(base_cfg)
        engine = TTSEngine(params=params, cfg=cfg, seed=seed,
                           quantize=args.quantize,
                           quantize_kv=args.quantize_kv,
                           quantize_convs=args.quantize_convs)
        voice = random_voice_prompt(cfg)
    else:
        engine = TTSEngine(model_path=model_path, seed=seed,
                           cfg=(base_cfg if args.reference_exact
                                or args.fuse_insert or args.megalayer
                                else None),
                           quantize=args.quantize,
                           quantize_kv=args.quantize_kv,
                           quantize_convs=args.quantize_convs)
        voice = args.voice
    engine.set_seed(seed)

    if args.save_cache:
        engine.save_params_cache(args.save_cache,
                                 gguf_quantize=args.gguf_quantize)
        print(f"wrote params cache: {args.save_cache}")
        if text is None and not args.interactive:
            return 0

    print(f"seed: {engine.seed}")

    if args.serve:
        return _serve(engine, args, voice, model_path)

    if args.batch > 1:
        # batched throughput mode: synthesize the text args.batch times
        # concurrently (vmap) and report aggregate frames/s
        from .runtime.batched import BatchedEngine
        from .io.params import load_voice
        if isinstance(voice, str):
            from .runtime.engine import DEFAULT_VOICES
            vpath = (os.path.join(model_path, "embeddings",
                                  voice + ".safetensors")
                     if voice in DEFAULT_VOICES else voice)
            voice = np.asarray(load_voice(vpath))
        be = BatchedEngine(engine)
        vstates = be.prime_voices([voice] * args.batch)
        t0 = time.perf_counter()
        pcms = be.synthesize_batch([text] * args.batch, vstates, temp)
        dt = time.perf_counter() - t0
        frames = sum(p.size for p in pcms) // engine.frame_size
        fps = frames / dt
        print(f"batch {args.batch}: {frames} frames in {dt:.2f}s = "
              f"{fps:.1f} frames/s aggregate")
        if args.json:
            print(json.dumps({"metric": "batched_frames_per_second",
                              "value": round(fps, 2), "unit": "frames/s",
                              "batch": args.batch}))
        if args.output:
            pcm0, rate = pcms[0], engine.sample_rate
            if args.out_rate and args.out_rate != rate:
                from .io.audio_in import resample
                pcm0, rate = resample(pcm0, rate, args.out_rate), \
                    args.out_rate
            save_audio(args.output, pcm0, rate)
        return 0

    stream = engine.open_stream(voice, temp)
    player = None
    if args.play:
        from .runtime.player import AudioPlayer
        player = AudioPlayer(engine.sample_rate,
                             frame_size=engine.frame_size)
    meter = FrameMeter(engine.cfg.mimi.frame_rate)
    out_rate = args.out_rate or engine.sample_rate
    writer = (StreamingEncoder(args.output, out_rate)
              if args.output else None)
    out_rs = None
    if writer is not None and out_rate != engine.sample_rate:
        from .io.audio_in import StreamingResampler
        out_rs = StreamingResampler(engine.sample_rate, out_rate)
    trace_cm = device_trace(args.profile) if args.profile \
        else contextlib.nullcontext()

    def pump():
        """Drain available frames; returns count emitted."""
        n = 0
        while True:
            with meter.step():
                frame = stream.receive()
            if frame is None:
                meter._frames -= 1  # receive() returned nothing
                break
            n += 1
            if writer is not None:
                writer.write(out_rs.process(frame)
                             if out_rs is not None else frame)
            if player is not None:
                player.play(frame)
        return n

    frames = 0
    with trace_cm:
        if args.interactive:
            # read stdin chunks as they arrive (ref stdin-reader thread,
            # demos/pocket-tts.cpp:56-91)
            for line in sys.stdin:
                stream.send(line)
                frames += pump()
            stream.flush()
            frames += pump()
        else:
            # feed 15-char chunks to simulate streaming
            # (ref: demos/pocket-tts.cpp:467-481)
            pos = 0
            while pos < len(text):
                chunk = text[pos:pos + 15]
                pos += len(chunk)
                stream.send(chunk)
                if pos >= len(text):
                    stream.flush()
                frames += pump()
            frames += pump()

    if player is not None:
        player.close()
    if writer is not None:
        if out_rs is not None:
            writer.write(out_rs.flush())
        writer.close()
        print(f"wrote {args.output}: "
              f"{frames * engine.frame_size / engine.sample_rate:.2f}s")

    rep = meter.report()
    print(f"done generating. {rep['wall_s']:.3f}")
    print(f"frame count: {frames:4d} frames")
    print(f"frame rate:  {rep['frames_per_second']:f} frames/s")
    if args.json:
        print(json.dumps({
            "metric": "frames_per_second",
            "value": rep["frames_per_second"], "unit": "frames/s",
            "frames": frames, "total_s": rep["wall_s"], "rtf": rep["rtf"],
            "ttfa_ms": rep["ttfa_ms"],
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
