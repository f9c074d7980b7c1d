"""Per-kernel HBM bandwidth-floor micro for the fused int4 layer kernels.

VERDICT r4 task 1: the fused pre/post kernels run at ~45-63% of HBM BW in
the real B=1 int4 loop (tools/attrib.py). Is that a Mosaic ceiling for
this access pattern, or recoverable in-kernel headroom? This micro
re-issues kernels with the IDENTICAL grid / BlockSpecs / stacked weight
layouts as ops/fused_layer._pre_call / ._post_call at the real backbone
shapes (dm=1024, hidden=4096, L=6), with the body degraded in steps:

  dma    read the same blocks, touch one row per tile      (pure stream)
  cast1  + full-tile int8->f32 cast (sublane-sum consumed) (~2 VPU ops/B)
  dot1   + one f32 MXU pass per tile                       (1 VPU + 1 MXU)
  ops3   the rawf32m algebra (cast + mul + floor + both MXU
         passes) with none of the norm/gelu/scale glue
  real   the shipping kernels (ops/fused_layer)

4 independent weight copies (108 MiB working set for post) cycle across
reps so on-chip caching cannot fake the stream rate (CLAUDE.md r2: micros
lie below ~100 MB working sets).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/micro_floor.py [post|pre|both] [variants...]
"""
import functools
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bench import device_ms  # noqa: E402
from pocket_tts_tpu.ops.quant_matmul import (_int4_dots,  # noqa: E402
                                             grouped_int4_acc)
from pocket_tts_tpu.ops import fused_layer as fl  # noqa: E402
from pocket_tts_tpu.utils.roofline import device_peaks  # noqa: E402

L, DM, HID = 6, 1024, 4096
# NT env override sweeps the pipelining depth (default = the shipping
# kernels' _POST_NT=512); NSTEPS tracks it so span 2048 is covered
NT = int(os.environ.get("FLOOR_NT", "512"))
NSTEPS = 2048 // NT            # _post_call: span=2048
KP1 = DM // 2                  # packed W1 rows
NT_PRE, NSTEPS_PRE = 768, 4    # _pre_call: n=3072, vmem cap -> nt=768
N3 = 3 * DM
GROUP = 32                     # q4_0 K-group for the grouped variants
R = 48                         # reps per timed run
NCOPY = 4                      # weight copies cycled across reps

PEAK_BW = device_peaks(jax.devices()[0])[1]
BYTES_POST = (KP1 * DM) + (KP1 * HID) + (HID // 2 * DM)   # wo + w1 + w2
BYTES_PRE = KP1 * N3

f32 = jnp.float32


def _post_body(x_ref, wo_ref, w1a_ref, w1b_ref, w2_ref, o_ref, acc_s, *,
               variant, nsteps):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)

    xr = x_ref[...].astype(f32)
    xl, xh = xr[:, :KP1], xr[:, KP1:]
    if variant == "dma":
        # touch one row per tile; the BlockSpec pipeline still streams the
        # full blocks HBM->VMEM
        acc_s[...] += wo_ref[0, :1, :].astype(f32)
        acc_s[...] += w2_ref[0, :1, :].astype(f32)
        acc_s[:, :NT] += w1a_ref[0, :1, :].astype(f32)
        acc_s[:, NT:2 * NT] += w1b_ref[0, :1, :].astype(f32)
    elif variant == "cast1":
        # full-tile f32 cast, consumed by a sublane sum (~2 VPU ops/byte)
        acc_s[...] += jnp.sum(wo_ref[0].astype(f32), axis=0, keepdims=True)
        acc_s[...] += jnp.sum(w2_ref[0].astype(f32), axis=0, keepdims=True)
        acc_s[:, :NT] += jnp.sum(w1a_ref[0].astype(f32), axis=0,
                                 keepdims=True)
        acc_s[:, NT:2 * NT] += jnp.sum(w1b_ref[0].astype(f32), axis=0,
                                       keepdims=True)
    elif variant == "dot1":
        # cast + ONE f32 MXU pass per tile (no hi-nibble extraction)
        acc_s[...] += jnp.dot(xl, wo_ref[0].astype(f32),
                              preferred_element_type=f32)
        acc_s[...] += jnp.dot(xl, w2_ref[0].astype(f32),
                              preferred_element_type=f32)
        acc_s[:, :NT] += jnp.dot(xl, w1a_ref[0].astype(f32),
                                 preferred_element_type=f32)
        acc_s[:, NT:2 * NT] += jnp.dot(xl, w1b_ref[0].astype(f32),
                                       preferred_element_type=f32)
    elif variant == "ops3":
        # the full rawf32m dequant algebra on every tile, none of the
        # norm/gelu/scale glue (xl/xh reused as stand-in activations)
        x16l, x16h = x_ref[:, :KP1], x_ref[:, KP1:]
        acc_s[...] += _int4_dots(x16l, x16h, wo_ref[0])
        acc_s[...] += _int4_dots(x16l, x16h, w2_ref[0])
        acc_s[:, :NT] += _int4_dots(x16l, x16h, w1a_ref[0])
        acc_s[:, NT:2 * NT] += _int4_dots(x16l, x16h, w1b_ref[0])
    elif variant == "opsg":
        # the grouped (q4_0) block-diagonal algebra on the same tiles:
        # group-masked bd activation rows, 2 MXU passes per block, scale
        # fold on (2ng, nt) partials (quant_matmul._grouped_bd_acc) —
        # VERDICT r4 #6's "the rest is inherent per-group VPU work" bound
        x16l, x16h = x_ref[:, :KP1], x_ref[:, KP1:]
        ng = KP1 // GROUP
        sg_dm = jnp.full((2 * ng, DM), 1e-2, f32)
        sg_nt = jnp.full((2 * ng, NT), 1e-2, f32)
        acc_s[...] += grouped_int4_acc(x16l, x16h, wo_ref[0], sg_dm)
        acc_s[...] += grouped_int4_acc(x16l, x16h, w2_ref[0], sg_dm)
        acc_s[:, :NT] += grouped_int4_acc(x16l, x16h, w1a_ref[0], sg_nt)
        acc_s[:, NT:2 * NT] += grouped_int4_acc(x16l, x16h, w1b_ref[0],
                                                sg_nt)
    else:
        raise ValueError(variant)

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[...] = (acc_s[...] * 1e-4 + xr).astype(o_ref.dtype)


def _pre_body(x_ref, w_ref, o_ref, acc_s, *, variant, nsteps):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)

    xr = x_ref[...].astype(f32)
    if variant == "dma":
        acc_s[:, :NT_PRE] += w_ref[0, :1, :].astype(f32)
    elif variant == "cast1":
        acc_s[:, :NT_PRE] += jnp.sum(w_ref[0].astype(f32), axis=0,
                                     keepdims=True)
    elif variant == "dot1":
        acc_s[:, :NT_PRE] += jnp.dot(xr[:, :KP1], w_ref[0].astype(f32),
                                     preferred_element_type=f32)
    elif variant == "ops3":
        acc_s[:, :NT_PRE] += _int4_dots(x_ref[:, :KP1], x_ref[:, KP1:],
                                        w_ref[0])
    else:
        raise ValueError(variant)

    @pl.when(j == nsteps - 1)
    def _():
        o_ref[...] = (acc_s[:, :DM] * 1e-4 + xr).astype(o_ref.dtype)


def post_call(variant, x, wo, w1, w2, layer):
    """Identical specs to fused_layer._post_call (T=1 int4): wo resident,
    W1 lo/hi column tiles at j and j+off, W2 row tiles at j; grid (4,)."""
    off = NSTEPS
    wospec = pl.BlockSpec((1, KP1, DM), lambda j, l=layer: (l, 0, 0),
                          memory_space=pltpu.VMEM)
    w1aspec = pl.BlockSpec((1, KP1, NT), lambda j, l=layer: (l, 0, j),
                           memory_space=pltpu.VMEM)
    w1bspec = pl.BlockSpec((1, KP1, NT),
                           lambda j, l=layer, o=off: (l, 0, j + o),
                           memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec((1, NT, DM), lambda j, l=layer: (l, j, 0),
                          memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, DM), lambda j: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_post_body, variant=variant, nsteps=NSTEPS),
        grid=(NSTEPS,),
        in_specs=[xspec, wospec, w1aspec, w1bspec, w2spec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((1, DM), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, DM), f32)],
        name=f"floor_post_{variant}",
    )(x, wo, w1, w1, w2)


def pre_call(variant, x, w, layer):
    wspec = pl.BlockSpec((1, KP1, NT_PRE), lambda j, l=layer: (l, 0, j),
                         memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, DM), lambda j: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_pre_body, variant=variant, nsteps=NSTEPS_PRE),
        grid=(NSTEPS_PRE,),
        in_specs=[xspec, wspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((1, DM), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, N3), f32)],
        name=f"floor_pre_{variant}",
    )(x, w)


def real_post(x, wo, w1, w2, so, s1, s2, bias_dm, bias_h, ns, nb, layer):
    return fl._post_call(x, x, wo, so, bias_dm, ns, ns, ns, nb,
                         w1, s1, bias_h, w2, s2, bias_dm, layer, 4, 1e-5,
                         False, False)


def real_pre(x, w, s, b, ns, nb, layer):
    return fl._pre_call(x, ns, nb, w, s, b, layer, 4, 1e-5, False)


def run_variant(kind, variant):
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    def q4(shape):
        return jnp.asarray(rng.randint(-128, 128, size=shape, dtype=np.int64)
                           .astype(np.int8))

    x0 = jnp.asarray(rng.randn(1, DM) * 0.1, dt)
    if kind == "post":
        packs = [(q4((L, KP1, DM)), q4((L, KP1, HID)), q4((L, HID // 2, DM)))
                 for _ in range(NCOPY)]
        if variant == "realg":     # q4_0 K-grouped scale layouts
            so = jnp.full((L, 2 * (KP1 // GROUP), DM), 1e-2, f32)
            s1 = jnp.full((L, 2 * (KP1 // GROUP), HID), 1e-2, f32)
            s2 = jnp.full((L, 2 * (HID // 2 // GROUP), DM), 1e-2, f32)
        else:
            so = jnp.full((L, 1, DM), 1e-2, f32)
            s1 = jnp.full((L, 1, HID), 1e-2, f32)
            s2 = so
        bias_dm = jnp.zeros((L, 1, DM), dt)
        bias_h = jnp.zeros((L, 1, HID), dt)
        ones = jnp.ones((DM,), dt)
        zeros = jnp.zeros((DM,), dt)

        def fn(x, *flat):
            ws = [tuple(flat[i * 3:(i + 1) * 3]) for i in range(NCOPY)]
            for rep in range(R):
                wo, w1, w2 = ws[rep % NCOPY]
                for l in range(L):
                    if variant in ("real", "realg"):
                        y = real_post(x, wo, w1, w2, so, s1, s2, bias_dm,
                                      bias_h, ones, zeros, l)
                    else:
                        y = post_call(variant, x, wo, w1, w2, l)
                    x = jnp.tanh(y.astype(f32)).astype(dt)
            return x

        flat = [a for p in packs for a in p]
        bytes_call = BYTES_POST
    else:
        packs = [q4((L, KP1, N3)) for _ in range(NCOPY)]
        if variant == "realg":
            s_in = jnp.full((L, 2 * (KP1 // GROUP), N3), 1e-2, f32)
        else:
            s_in = jnp.full((L, 1, N3), 1e-2, f32)
        b_in = jnp.zeros((L, 1, N3), dt)
        ones = jnp.ones((DM,), dt)
        zeros = jnp.zeros((DM,), dt)

        def fn(x, *flat):
            for rep in range(R):
                w = flat[rep % NCOPY]
                for l in range(L):
                    if variant in ("real", "realg"):
                        y = real_pre(x, w, s_in, b_in, ones, zeros, l)
                    else:
                        y = pre_call(variant, x, w, l)
                    x = jnp.tanh(y[:, :DM].astype(f32)).astype(dt)
            return x

        flat = packs
        bytes_call = BYTES_PRE

    if variant == "realg":
        # the grouped scale blocks are real streamed operands (f32): count
        # them so realg's gb_s reflects its actual byte stream (opsg bakes
        # constant scales — compare opsg vs dma by us, realg by gb_s)
        if kind == "post":
            ng2 = 2 * (KP1 // GROUP)
            bytes_call += 4 * (ng2 * DM + ng2 * HID
                               + 2 * (HID // 2 // GROUP) * DM)
        else:
            bytes_call += 4 * 2 * (KP1 // GROUP) * N3

    jfn = jax.jit(fn)
    out = jfn(x0, *flat)

    def fetch(o):
        return float(np.asarray(o).ravel()[0])

    fetch(out)
    best = float("inf")
    for _ in range(3):
        dms, _ = device_ms(lambda: jfn(x0, *flat), fetch)
        best = min(best, dms)
    us_call = best * 1e3 / (R * L)
    gbs = bytes_call / us_call * 1e-3
    return {"us_per_call": round(us_call, 2),
            "gb_s": round(gbs, 1),
            "pct_peak_bw": round(100 * gbs / (PEAK_BW / 1e9), 1)}


if __name__ == "__main__":
    kinds = ["post", "pre"]
    if len(sys.argv) > 1 and sys.argv[1] in ("post", "pre"):
        kinds = [sys.argv[1]]
    variants = sys.argv[2:] or ["dma", "cast1", "dot1", "ops3", "real",
                                "opsg", "realg"]
    results = {}
    for kind in kinds:
        for v in variants:
            r = run_variant(kind, v)
            results[f"{kind}_{v}"] = r
            print(kind, v, r, flush=True)
    print(json.dumps(results))
