"""On-TPU sweep of the continuous server's scheduling knobs.

The ContinuousBatchingServer's chunk_frames default (5) was chosen for
TTFA granularity, never swept: bigger chunks amortize admission checks
and host scheduling across more device frames (decode fraction measured
0.925 at chunk=5), at the cost of coarser admission (TTFA quantum = one
chunk) and more wasted tail frames in lanes whose sentence ends
mid-chunk. This sweeps chunk_frames (and optionally lanes) under the
exact bench.py steady-state methodology: short traced windows, windows
with dropped profiler events discarded, aggregate f/s from device time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/measure_serving_knobs.py [chunks...]
Prints one JSON line per configuration.
"""
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import BENCH_TEXT, trace_jit_events  # noqa: E402

from pocket_tts_tpu.config import DEFAULT_CONFIG  # noqa: E402
from pocket_tts_tpu.io.params import (random_params,  # noqa: E402
                                      random_voice_prompt)
from pocket_tts_tpu.io.quant import quantize_params  # noqa: E402
from pocket_tts_tpu.runtime.engine import TTSEngine  # noqa: E402
from pocket_tts_tpu.runtime.server import (  # noqa: E402
    ContinuousBatchingServer)
from pocket_tts_tpu.text.tokenizer import MockTokenizer  # noqa: E402

TEXTS = [
    "This is a short request.",
    "A medium length sentence with several more words in it.",
    "This considerably longer sentence keeps the decoder busy for many "
    "more frames than the short ones do.",
]


def fetch(out):
    return float(np.asarray(out[0]).ravel()[0])


def measure(eng, cfg, lanes: int, chunk_frames: int) -> dict:
    srv = ContinuousBatchingServer(eng, lanes=lanes,
                                   chunk_frames=chunk_frames,
                                   capacity=416, text_bucket=32)
    srv.register_voices(
        {"v": np.asarray(random_voice_prompt(cfg, 120), np.float32)})
    rr = [0]

    def offer():
        while len(srv._queue) < srv.lanes // 2:
            srv.submit(TEXTS[rr[0] % 3], "v")
            rr[0] += 1

    # keep the traced device window ~constant across chunk sizes
    win_chunks = max(2, 20 // chunk_frames)
    n_win = 12
    emitted = [0]

    def run_win():
        for _ in range(win_chunks):
            offer()
            emitted[0] += srv.step()
        return (jnp.zeros(()),)

    for _ in range(20):  # steady state + compile all admission buckets
        run_win()
    chunk_ms, prefill_ms = [], []
    frames, total_ms, accepted = 0, 0.0, 0
    for _ in range(n_win):
        emitted[0] = 0
        events, _ = trace_jit_events(run_win, fetch)
        w_chunk = [d for n, d in events if "continuous_decode_chunk" in n]
        if len(w_chunk) != win_chunks:
            continue
        accepted += 1
        chunk_ms += w_chunk
        prefill_ms += [d for n, d in events if "sentence_prefill" in n]
        total_ms += sum(d for _, d in events)
        frames += emitted[0]
    cms = float(np.mean(chunk_ms)) if chunk_ms else float("nan")
    pms = float(np.mean(prefill_ms)) if prefill_ms else 0.0
    done = srv.completed
    ttfa = sorted((r.first_audio_step - r.admit_step) * cms + pms
                  for r in done if r.first_audio_step is not None)

    def pct(xs, p):
        return xs[min(len(xs) - 1, int(p * len(xs)))] if xs else None

    return {
        "probe": "continuous_knobs",
        "lanes": lanes,
        "chunk_frames": chunk_frames,
        "fps": round(frames / (total_ms / 1e3), 1) if total_ms else None,
        "occupancy": round(frames / (accepted * win_chunks * chunk_frames
                                     * lanes), 3) if accepted else None,
        "decode_frac": round(sum(chunk_ms) / total_ms, 3)
        if total_ms else None,
        "chunk_ms": round(cms, 3),
        "p50_service_ttfa_ms": round(pct(ttfa, 0.50), 2) if ttfa else None,
        "p95_service_ttfa_ms": round(pct(ttfa, 0.95), 2) if ttfa else None,
        "windows_accepted": accepted,
        "requests_done": len(done),
    }


def main():
    chunks = [int(a) for a in sys.argv[1:]] or [5, 8, 10]
    dtype = jnp.bfloat16
    params, cfg = random_params(DEFAULT_CONFIG, seed=0, dtype=dtype)
    tok = MockTokenizer(cfg.lut.n_bins)
    params_q4 = quantize_params(params, bits=4)
    eng = TTSEngine(params=params_q4, cfg=cfg, dtype=dtype, tokenizer=tok,
                    quantize_kv=True)
    assert BENCH_TEXT  # same model/config family as bench.py
    for cf in chunks:
        print(json.dumps(measure(eng, cfg, lanes=32, chunk_frames=cf)),
              flush=True)


if __name__ == "__main__":
    main()
