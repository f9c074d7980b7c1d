"""Dot-formulation micro for the batched flash-decode inner step.

The insert kernel processes (per grid step) `group` lanes x one cache
block: per lane, QK logits (H, BS) and PV (H, HD) against (BS, HD)
cache tiles. Measured (micro_insert.py): byte-proportional at ~250 GB/s
for int8 AND bf16 — an operand-streaming ceiling of the formulation, not
HBM. This micro times JUST that math under the same grid/BlockSpecs with
different dot orientations/batchings:

  cur    the shipping form: per-lane python loop, qm (H, H*D) @ kb^T
  flipT  per-lane (BS, HD) @ (HD, H) -> logits^T (kb streams as M rows)
  batch1 ONE dot_general with a leading G batch dim (no python loop)
  dmaonly just stream the blocks (floor)

Usage: PYTHONPATH=... python tools/micro_attn_var.py [variants...]
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bench import device_ms  # noqa: E402
from pocket_tts_tpu.utils.profiling import enable_compile_cache  # noqa: E402
enable_compile_cache("/tmp/jaxcache")

B, S, H, D = 128, 384, 16, 64
HD = H * D
G = 8                    # lanes per grid step (shipping group for int8)
L = 4
R = 24   # 4 sets x 100 MB defeats caching; fewer tunnel transfers
f32 = jnp.float32


def kern(qm_ref, k_ref, v_ref, o_ref, acc, *, variant):
    b = pl.program_id(0)
    if variant == "dmaonly":
        for g in range(G):
            acc[g] = k_ref[g, :1, :].astype(f32) + v_ref[g, :1, :].astype(f32)
        o_ref[...] = acc[...].astype(o_ref.dtype)
        return
    if variant == "cur":
        for g in range(G):
            qm = qm_ref[g]                            # (H, HD) bf16
            kb = k_ref[g].astype(qm.dtype)            # (BS, HD)
            vb = v_ref[g].astype(qm.dtype)
            logits = jax.lax.dot_general(
                qm, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)           # (H, BS)
            p = jnp.exp(logits - jnp.max(logits, axis=1, keepdims=True))
            pv = jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)           # (H, HD)
            acc[g] = pv[:1, :] + jnp.sum(logits, axis=1,
                                         keepdims=True)[:1, :1]
        o_ref[...] = acc[...].astype(o_ref.dtype)
        return
    if variant == "flipT":
        for g in range(G):
            qm = qm_ref[g]
            kb = k_ref[g].astype(qm.dtype)
            vb = v_ref[g].astype(qm.dtype)
            logits_t = jax.lax.dot_general(
                kb, qm, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)           # (BS, H)
            p_t = jnp.exp(logits_t - jnp.max(logits_t, axis=0,
                                             keepdims=True))
            pv_t = jax.lax.dot_general(
                vb, p_t.astype(vb.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=f32)           # (HD, H)
            # consume pv_t via a tiny ones-dot (Mosaic rejects the
            # (HD, H) -> (1, HD) relayout a direct slice would need)
            red = jax.lax.dot_general(
                jnp.full((1, HD), 1.0, f32), pv_t,
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32)           # (1, H)
            acc[g] = jnp.zeros_like(acc[g])
            acc[g, :, :H] = red + jnp.max(logits_t, axis=0, keepdims=True)
        o_ref[...] = acc[...].astype(o_ref.dtype)
        return
    if variant == "int8dot":
        # int8 x int8 MXU dots (v5e native int8 mode is 2x the bf16
        # elem rate): quantize qm per row, p to 1/127 granularity; the
        # int8 cache operand feeds the MXU with NO cast
        for g in range(G):
            qm = qm_ref[g].astype(f32)                # (H, HD)
            qabs = jnp.max(jnp.abs(qm), axis=1, keepdims=True)
            qsc = jnp.maximum(qabs, 1e-6) / 127.0
            qi = jnp.round(qm / qsc).astype(jnp.int8)
            kb = k_ref[g]                             # (BS, HD) int8
            vb = v_ref[g]
            li = jax.lax.dot_general(
                qi, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)     # (H, BS)
            logits = li.astype(f32) * qsc
            p = jnp.exp(logits - jnp.max(logits, axis=1, keepdims=True))
            pi = jnp.round(p * 127.0).astype(jnp.int8)
            pv = jax.lax.dot_general(
                pi, vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)     # (H, HD)
            acc[g] = pv.astype(f32)[:1, :] * (1.0 / 127.0)
        o_ref[...] = acc[...].astype(o_ref.dtype)
        return
    if variant == "batch1":
        qm = qm_ref[...]                              # (G, H, HD)
        kb = k_ref[...].astype(qm.dtype)              # (G, BS, HD)
        vb = v_ref[...].astype(qm.dtype)
        logits = jax.lax.dot_general(
            qm, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)               # (G, H, BS)
        p = jnp.exp(logits - jnp.max(logits, axis=2, keepdims=True))
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)               # (G, H, HD)
        for g in range(G):
            acc[g] = pv[g, :1, :]
        o_ref[...] = acc[...].astype(o_ref.dtype)
        return
    raise ValueError(variant)


def run_variant(variant, dt=jnp.int8):
    rng = np.random.RandomState(0)

    def cache():
        if dt == jnp.int8:
            return jnp.asarray(rng.randint(-127, 128, (B, S, HD)), jnp.int8)
        return jnp.asarray(rng.randn(B, S, HD) * 0.05, dt)

    ks = [cache() for _ in range(L)]
    vs = [cache() for _ in range(L)]
    qm0 = jnp.asarray(rng.randn(B, H, HD) * 0.05, jnp.bfloat16)

    grid = (B // G,)
    kv_spec = pl.BlockSpec((G, S, HD), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((G, H, HD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((G, 1, HD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(kern, variant=variant),
        grid=grid,
        in_specs=[qspec, kv_spec, kv_spec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, 1, HD), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((G, 1, HD), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        name=f"attn_var_{variant}",
    )

    def run(qm, ks, vs):
        # caches as explicit args: closed-over arrays ship as constants
        # in the remote-compile request body (HTTP 413 past ~100 MB)
        for rep in range(R):
            o = call(qm, ks[rep % L], vs[rep % L])
            qm = (qm + 0.001 * o.astype(f32)).astype(jnp.bfloat16)
        return qm

    jfn = jax.jit(run)
    out = jfn(qm0, ks, vs)

    def fetch(o):
        return float(np.asarray(o).ravel()[0])

    fetch(out)
    best = float("inf")
    for _ in range(3):
        dms, _ = device_ms(lambda: jfn(qm0, ks, vs), fetch)
        best = min(best, dms)
    us = best * 1e3 / R
    bytes_call = B * S * HD * 2 * dt.dtype.itemsize if hasattr(dt, "dtype") \
        else B * S * HD * 2 * jnp.dtype(dt).itemsize
    gbs = bytes_call / us * 1e-3
    print(f"{variant}: {us:.1f} us/call, {gbs:.0f} GB/s, "
          f"{100 * gbs / 819:.1f}% peak", flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ["dmaonly", "cur", "flipT", "batch1",
                                "int8dot"]
    for v in variants:
        try:
            run_variant(v)
        except Exception as e:  # e.g. Mosaic rejects a formulation
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
