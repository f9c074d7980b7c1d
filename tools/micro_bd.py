"""Micro: fused post/pre kernel per-call time, per-channel vs grouped.

Run under different POCKET_TTS_BD_VARIANT / POCKET_TTS_POST_NT env
values (each needs a fresh process — the knobs are read at import):

    for v in v0 v1 v2 v4; do POCKET_TTS_BD_VARIANT=$v python \
        tools/micro_bd.py grouped; done
    POCKET_TTS_POST_NT=1024 POCKET_TTS_POST_VMEM_MB=14.5 python \
        tools/micro_bd.py perchan
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import device_ms  # noqa: E402
from pocket_tts_tpu.config import DEFAULT_CONFIG  # noqa: E402
from pocket_tts_tpu.io.params import random_params  # noqa: E402
from pocket_tts_tpu.io.quant import quantize_params  # noqa: E402
from pocket_tts_tpu.ops import fused_layer  # noqa: E402
from pocket_tts_tpu.ops.basic import slice_layer_params  # noqa: E402

which = sys.argv[1] if len(sys.argv) > 1 else "grouped"
dtype = jnp.bfloat16
params, cfg = random_params(DEFAULT_CONFIG, seed=0, dtype=dtype)
group = 32 if which == "grouped" else 0
pq = quantize_params(params, bits=4, group=group)
lp = slice_layer_params(pq["layers"], 1)
dm = cfg.backbone.d_model
rng = np.random.RandomState(5)
x1 = jnp.asarray(rng.randn(1, dm) * 0.3).astype(dtype)
a1 = jnp.asarray(rng.randn(1, dm) * 0.3).astype(dtype)

REPS = 256


@jax.jit
def run_post(x, a):
    def body(i, x):
        return fused_layer.post_attention(lp, x, a).astype(x.dtype) * 0.5
    return jax.lax.fori_loop(0, REPS, body, x)


@jax.jit
def run_pre(x):
    def body(i, x):
        y = fused_layer.pre_attention(lp, x)
        return (y[:, :dm] + y[:, dm:2 * dm]).astype(x.dtype) * 0.5
    return jax.lax.fori_loop(0, REPS, body, x)


def fetch(out):
    return float(np.asarray(out).ravel()[0])


lp0 = slice_layer_params(pq["layers"], 0)
lp1 = slice_layer_params(pq["layers"], 1)


@jax.jit
def run_pair(x, a):
    """post(l0) then pre(l1) as two calls — the bilayer's comparator."""
    def body(i, x):
        xn = fused_layer.post_attention(lp0, x, a)
        y = fused_layer.pre_attention(lp1, xn)
        return (xn + 1e-6 * y[:, :dm]).astype(x.dtype) * 0.5
    return jax.lax.fori_loop(0, REPS, body, x)


@jax.jit
def run_bilayer(x, a):
    def body(i, x):
        xn, y = fused_layer.bilayer_post_pre(lp0, lp1, x, a)
        return (xn + 1e-6 * y[:, :dm]).astype(x.dtype) * 0.5
    return jax.lax.fori_loop(0, REPS, body, x)


tag = (f"{which} bd={os.environ.get('POCKET_TTS_BD_VARIANT', 'v0')} "
       f"nt={os.environ.get('POCKET_TTS_POST_NT', '512')}")
if which == "bilayer":
    fetch(run_pair(x1, a1))
    ms, _ = device_ms(lambda: run_pair(x1, a1), fetch)
    print(f"{tag} post+pre pair: {ms * 1e3 / REPS:.2f} us/iter",
          flush=True)
    fetch(run_bilayer(x1, a1))
    ms, _ = device_ms(lambda: run_bilayer(x1, a1), fetch)
    print(f"{tag} bilayer: {ms * 1e3 / REPS:.2f} us/iter", flush=True)
    a = np.asarray(run_pair(x1, a1), np.float32)
    b = np.asarray(run_bilayer(x1, a1), np.float32)
    print(f"{tag} pair-vs-bilayer maxdiff {np.abs(a - b).max():.3e}",
          flush=True)
else:
    fetch(run_post(x1, a1))
    ms, _ = device_ms(lambda: run_post(x1, a1), fetch)
    print(f"{tag} post: {ms * 1e3 / REPS:.2f} us/call", flush=True)
    fetch(run_pre(x1))
    ms, _ = device_ms(lambda: run_pre(x1), fetch)
    print(f"{tag} pre: {ms * 1e3 / REPS:.2f} us/call", flush=True)
