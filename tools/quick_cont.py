"""Quick continuous-serving capacity at N lanes on TPU (bench.py's
measure_continuous, standalone for iteration).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/quick_cont.py \
           [lanes ...]   (default: 32 64 128)
"""
import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import trace_jit_events  # noqa: E402

from pocket_tts_tpu.config import DEFAULT_CONFIG  # noqa: E402
from pocket_tts_tpu.io.params import (random_params,  # noqa: E402
                                      random_voice_prompt)
from pocket_tts_tpu.io.quant import quantize_params  # noqa: E402
from pocket_tts_tpu.runtime.batched import mesh_cfg  # noqa: E402
from pocket_tts_tpu.runtime.engine import TTSEngine  # noqa: E402
from pocket_tts_tpu.runtime.server import (  # noqa: E402
    ContinuousBatchingServer)
from pocket_tts_tpu.text.tokenizer import MockTokenizer  # noqa: E402

dtype = jnp.bfloat16
params, cfg = random_params(DEFAULT_CONFIG, seed=0, dtype=dtype)
params_q4 = quantize_params(params, bits=4)
cfg_srv = mesh_cfg(dataclasses.replace(cfg, backbone=dataclasses.replace(
    cfg.backbone, quantize_kv=True)), None)
tok = MockTokenizer(cfg.lut.n_bins)
eng = TTSEngine(params=params_q4, cfg=cfg_srv, dtype=dtype, tokenizer=tok)
texts = [
    "This is a short request.",
    "A medium length sentence with several more words in it.",
    "This considerably longer sentence keeps the decoder busy for many "
    "more frames than the short ones do.",
]


def fetch(out):
    return float(np.asarray(out[0]).ravel()[0])


def measure_continuous(lanes, win_chunks, n_win):
    srv = ContinuousBatchingServer(eng, lanes=lanes, chunk_frames=5,
                                   capacity=288, text_bucket=32,
                                   share_prefix=True)
    srv.register_voices(
        {"v": np.asarray(random_voice_prompt(cfg, 120), np.float32)})
    rr = [0]

    def offer():
        while len(srv._queue) < srv.lanes // 2:
            srv.submit(texts[rr[0] % 3], "v")
            rr[0] += 1

    emitted = [0]

    def run_win():
        for _ in range(win_chunks):
            offer()
            emitted[0] += srv.step()
        return (jnp.zeros(()),)

    for _ in range(max(20, 80 // win_chunks)):
        run_win()
    chunk_ms = []
    srv_frames, total_ms, accepted = 0, 0.0, 0
    for _ in range(n_win):
        emitted[0] = 0
        events, _ = trace_jit_events(run_win, fetch)
        w_chunk = [d for n, d in events if "continuous_decode_chunk" in n]
        if len(w_chunk) != win_chunks:
            continue
        accepted += 1
        chunk_ms += w_chunk
        total_ms += sum(d for _, d in events)
        srv_frames += emitted[0]
    occupancy = (srv_frames
                 / (accepted * win_chunks * srv.chunk_frames * lanes)
                 if accepted else float("nan"))
    fps = (srv_frames / (total_ms / 1e3)
           if total_ms > 0 and accepted >= n_win // 2 else float("nan"))
    decode_frac = sum(chunk_ms) / total_ms if total_ms else float("nan")
    print(f"lanes={lanes}: {fps:.0f} f/s occupancy={occupancy:.3f} "
          f"decode_frac={decode_frac:.3f} accepted={accepted}/{n_win} "
          f"chunk_ms={np.mean(chunk_ms) if chunk_ms else float('nan'):.3f}",
          flush=True)


if __name__ == "__main__":
    lanes_list = [int(a) for a in sys.argv[1:]] or [32, 64, 128]
    for lanes in lanes_list:
        measure_continuous(lanes, win_chunks=2, n_win=16)
