"""Absolute per-component device time of the batched serving frame step.

The per-op profiler under-reports batched Mosaic kernels through this
environment's tunnel, so this times each sub-stage of tts.frame_step as
its OWN scanned jit program at batch (program-level device time — the
only trustworthy instrument at B>=32):

  backbone   vmapped flow_lm.decode_step scan (backbone KV + flow net)
  mimi       vmapped mimi.decode_frame scan (ring transformer + seanet)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/quick_slices.py \
           [B] [stages...]   (default: 128 backbone mimi)
"""
import dataclasses
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
from pocket_tts_tpu.models import backbone, flow_lm, mimi  # noqa: E402
from pocket_tts_tpu.runtime.batched import (  # noqa: E402
    _axes_like, batched_prime_voice, batched_sentence_prefill, mesh_cfg,
    stack_states)
from pocket_tts_tpu.text.preprocess import prepare_text_prompt  # noqa: E402
from pocket_tts_tpu.text.tokenizer import MockTokenizer  # noqa: E402
from pocket_tts_tpu.utils.profiling import enable_compile_cache  # noqa: E402

enable_compile_cache("/tmp/jaxcache")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
STAGES = sys.argv[2:] or ["backbone", "mimi"]
SCAN = 50

dtype = jnp.bfloat16
params, cfg0 = random_params(DEFAULT_CONFIG, seed=0, dtype=dtype)
params_q4 = quantize_params(params, bits=4)
cfg = mesh_cfg(dataclasses.replace(cfg0, backbone=dataclasses.replace(
    cfg0.backbone, quantize_kv=True)), None)
# A/B knobs: force the XLA fallbacks for the mimi ring kernel / seanet
# megakernel (QS_MIMI_PALLAS=0 / QS_SEANET_PALLAS=0)
import os  # noqa: E402
if os.environ.get("QS_MIMI_PALLAS", "1") == "0":
    cfg = dataclasses.replace(cfg, mimi=dataclasses.replace(
        cfg.mimi, transformer=dataclasses.replace(
            cfg.mimi.transformer, use_pallas_attn=False)))
if os.environ.get("QS_SEANET_PALLAS", "1") == "0":
    cfg = dataclasses.replace(cfg, mimi=dataclasses.replace(
        cfg.mimi, seanet=dataclasses.replace(
            cfg.mimi.seanet, use_pallas=False)))

tok = MockTokenizer(cfg.lut.n_bins)
text, _ = prepare_text_prompt(
    "The quick brown fox jumps over the lazy dog nearby.")
ids = tok.encode(text)
tokens = jnp.asarray(np.pad(np.asarray(ids, np.int32), (0, 64 - len(ids))))
mimi_template = mimi.init_state(cfg.mimi, dtype)

prompts = jnp.asarray(np.stack(
    [np.pad(random_voice_prompt(cfg0, 120, seed=i), ((0, 8), (0, 0)))
     for i in range(B)])).astype(dtype)
vs = batched_prime_voice(params_q4, cfg, stack_states(
    [backbone.init_state(cfg.backbone, dtype) for _ in range(B)]),
    prompts, jnp.full((B,), 120, jnp.int32))
vs = backbone.shrink_state(vs, 384)
sts = batched_sentence_prefill(params_q4, cfg, vs, mimi_template,
                               jnp.tile(tokens[None], (B, 1)),
                               jnp.full((B,), len(ids), jnp.int32))


def fetch(o):
    return float(np.asarray(o).ravel()[0])


def time_scan(name, body, carry0):
    axes = _axes_like(carry0)

    @jax.jit
    def run(carry):
        def step(c, i):
            return body(c, i), ()
        c, _ = jax.lax.scan(step, carry, jnp.arange(SCAN, dtype=jnp.int32))
        return c

    def go():
        return jax.tree.leaves(run(carry0))[0]

    fetch(go())
    best = float("inf")
    for _ in range(3):
        dms, _ = device_ms(go, fetch)
        best = min(best, dms)
    us = best * 1e3 / SCAN
    print(f"{name}: {us:.1f} us/frame-step (B={B})", flush=True)
    return us


if "backbone" in STAGES:
    flow0 = sts.flow
    lat0 = sts.prev_latent
    axes_f = _axes_like(sts).flow

    def bb_body(carry, i):
        flow, lat = carry
        noise = jnp.zeros_like(lat)

        def one(f, pl_, nz):
            f2, latent, _ = flow_lm.decode_step(params_q4, cfg, f, pl_, nz)
            return backbone.advance(f2, 0, 0), latent

        flow, lat = jax.vmap(one, in_axes=(axes_f, 0, 0),
                             out_axes=(axes_f, 0))(flow, lat, noise)
        return (flow, lat)

    time_scan("backbone+flow", bb_body, (flow0, lat0))

if "mimitr" in STAGES or "seanet" in STAGES:
    from pocket_tts_tpu.models import mimi_transformer, seanet  # noqa: E402
    mimi0 = sts.mimi
    axes_m = _axes_like(sts).mimi
    k, s_ = cfg.mimi.upsample_kernel, cfg.mimi.upsample_stride
    emb0 = jnp.asarray(
        np.random.RandomState(0).randn(B, k - s_, cfg.mimi.transformer.
                                       d_model) * 0.1, dtype)

    if "mimitr" in STAGES:
        def tr_body(carry, i):
            tst, emb = carry

            def one(t, e):
                t2, z = mimi_transformer.forward(
                    params_q4["mimi"]["decoder_transformer"],
                    cfg.mimi.transformer, t, e, cfg.gelu_approx)
                return t2, z

            tst, z = jax.vmap(one, in_axes=(axes_m.transformer, 0),
                              out_axes=(axes_m.transformer, 0))(tst, emb)
            return (tst, emb + 1e-9 * z.astype(emb.dtype))

        time_scan("mimi-transformer", tr_body,
                  (mimi0.transformer, emb0))

    if "seanet" in STAGES:
        def sn_body(carry, i):
            sst, z = carry

            def one(st_, zz):
                st2, pcm = seanet.forward(params_q4["mimi"]["decoder"],
                                          cfg.mimi.seanet, st_, zz)
                return st2, pcm

            sst, pcm = jax.vmap(one, in_axes=(axes_m.seanet, 0),
                                out_axes=(axes_m.seanet, 0))(sst, z)
            return (sst, z + 1e-9 * jnp.mean(pcm, axis=(1, 2),
                                             keepdims=False)[:, None, None])

        time_scan("seanet", sn_body, (mimi0.seanet, emb0))

if "mimi" in STAGES:
    mimi0 = sts.mimi
    lat0 = sts.prev_latent
    axes_m = _axes_like(sts).mimi

    def mm_body(carry, i):
        mst, lat = carry

        def one(m, la):
            mimi_in = flow_lm.denormalize(params_q4, la)
            m2, pcm = mimi.decode_frame(params_q4["mimi"], cfg.mimi, m,
                                        mimi_in, cfg.gelu_approx)
            return m2, pcm

        mst, pcm = jax.vmap(one, in_axes=(axes_m, 0),
                            out_axes=(axes_m, 0))(mst, lat)
        lat = lat + 1e-9 * pcm[:, :lat.shape[1]].astype(lat.dtype)
        return (mst, lat)

    time_scan("mimi+seanet", mm_body, (mimi0, lat0))
