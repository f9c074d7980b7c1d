"""Probe Mosaic acceptance of the fused-insert kernel pieces on real TPU,
then measure decode perf with/without the fused insert."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from pocket_tts_tpu.ops.pallas_attn import decode_insert_attention

S, H, D = 384, 16, 64
BS = 384


def case(end, dtype, seed=0):
    r = np.random.RandomState(seed)
    k = jnp.asarray(r.randn(S, H * D).astype(np.float32)).astype(dtype)
    v = jnp.asarray(r.randn(S, H * D).astype(np.float32)).astype(dtype)
    q = jnp.asarray(r.randn(H, D).astype(np.float32)).astype(
        jnp.bfloat16 if dtype != jnp.float32 else dtype)
    kn = jnp.asarray(r.randn(1, H * D).astype(np.float32)).astype(dtype)
    vn = jnp.asarray(r.randn(1, H * D).astype(np.float32)).astype(dtype)
    pos = np.full(S, -1, np.int32)
    pos[:end] = np.arange(end)
    pos[end] = end
    return q, kn, vn, k, v, jnp.asarray(pos)


# 1) bf16 path, odd write slot (window alignment + select)
for end in (0, 9, 127, 255, 383 - 1):
    q, kn, vn, k, v, pos = case(end, jnp.bfloat16, seed=end)
    try:
        got, kc, vc = decode_insert_attention(
            q, kn, vn, jnp.int32(end), k, v, pos, jnp.int32(end),
            jnp.int32(end), block_size=BS)
        got = np.asarray(got)
        kc = np.asarray(kc)
        ok_row = np.array_equal(kc[end], np.asarray(kn[0]))
        others = np.array_equal(np.delete(kc, end, 0),
                                np.delete(np.asarray(k), end, 0))
        print(f"bf16 end={end}: OK row={ok_row} others={others}",
              flush=True)
    except Exception as e:
        print(f"bf16 end={end}: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        break

# 2) int8 path
for end in (9, 130):
    q, kn, vn, k, v, pos = case(end, jnp.bfloat16, seed=end)
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    ks = np.maximum(np.abs(kf).max(-1) / 127.0, 1e-12).astype(np.float32)
    vs = np.maximum(np.abs(vf).max(-1) / 127.0, 1e-12).astype(np.float32)
    kq = jnp.asarray(np.clip(np.round(kf / ks[:, None]), -127, 127)
                     .astype(np.int8))
    vq = jnp.asarray(np.clip(np.round(vf / vs[:, None]), -127, 127)
                     .astype(np.int8))
    knf = np.asarray(kn, np.float32)
    vnf = np.asarray(vn, np.float32)
    ksn = np.float32(max(np.abs(knf).max() / 127.0, 1e-12))
    vsn = np.float32(max(np.abs(vnf).max() / 127.0, 1e-12))
    knq = jnp.asarray(np.clip(np.round(knf / ksn), -127, 127)
                      .astype(np.int8))
    vnq = jnp.asarray(np.clip(np.round(vnf / vsn), -127, 127)
                      .astype(np.int8))
    try:
        outs = decode_insert_attention(
            q, knq, vnq, jnp.int32(end), kq, vq, jnp.asarray(pos),
            jnp.int32(end), jnp.int32(end), k_scale=jnp.asarray(ks),
            v_scale=jnp.asarray(vs), ks_new=ksn, vs_new=vsn, block_size=BS)
        kc = np.asarray(outs[1])
        kso = np.asarray(outs[3])
        ok = (np.array_equal(kc[end], np.asarray(knq[0]))
              and abs(kso[end] - ksn) < 1e-9
              and np.array_equal(np.delete(kc, end, 0),
                                 np.delete(np.asarray(kq), end, 0)))
        print(f"int8 end={end}: OK exact={ok}", flush=True)
    except Exception as e:
        print(f"int8 end={end}: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        break

# 3) vmapped batch-32 int8 (the serving shape)
try:
    B = 32
    qb = jnp.stack([case(9, jnp.bfloat16, seed=i)[0] for i in range(B)])
    knb = jnp.stack([knq[0] for _ in range(B)])[:, None]
    vnb = jnp.stack([vnq[0] for _ in range(B)])[:, None]
    kqb = jnp.stack([kq for _ in range(B)])
    vqb = jnp.stack([vq for _ in range(B)])
    ksb = jnp.stack([jnp.asarray(ks) for _ in range(B)])
    vsb = jnp.stack([jnp.asarray(vs) for _ in range(B)])
    posb = jnp.stack([jnp.asarray(pos) for _ in range(B)])
    cp = jnp.full((B,), 130, jnp.int32)
    out = jax.vmap(
        lambda q1, kn1, vn1, k1, v1, ks1, vs1, p1, c1:
        decode_insert_attention(
            q1, kn1, vn1, c1, k1, v1, p1, jnp.int32(130), jnp.int32(130),
            k_scale=ks1, v_scale=vs1, ks_new=ksn, vs_new=vsn,
            block_size=BS)
    )(qb, knb, vnb, kqb, vqb, ksb, vsb, posb, cp)
    np.asarray(out[0])
    print("batch32 int8: OK", flush=True)
except Exception as e:
    print(f"batch32 int8: FAIL {type(e).__name__}: {str(e)[:300]}",
          flush=True)

print("PROBE DONE", flush=True)

# --- primitive probes for future kernels ---------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools


def probe(name, fn):
    try:
        r = fn()
        print(f"PRIMITIVE {name}: OK {r}", flush=True)
    except Exception as e:
        print(f"PRIMITIVE {name}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def f32_to_i8():
    def k(x_ref, o_ref):
        o_ref[...] = jnp.round(x_ref[...] * 3.0).astype(jnp.int8)
    x = jnp.ones((32, 256), jnp.float32)
    y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((32, 256),
                                                         jnp.int8))(x)
    return int(np.asarray(y)[0, 0])


def i8_select():
    def k(x_ref, y_ref, o_ref):
        m = jax.lax.broadcasted_iota(jnp.int32, (32, 256), 0) == 3
        o_ref[...] = jnp.where(m, x_ref[...], y_ref[...])
    x = jnp.full((32, 256), 7, jnp.int8)
    y = jnp.full((32, 256), 2, jnp.int8)
    z = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((32, 256),
                                                         jnp.int8))(x, y)
    return (int(np.asarray(z)[3, 0]), int(np.asarray(z)[0, 0]))


def win_dma(dtype, w):
    """RMW window DMA at granule w for dtype, dynamic offset from SMEM."""
    def k(ws_ref, src_ref, o_ref, win, sem):
        a0 = (ws_ref[0] // w) * w
        win[...] = src_ref[...]
        cp = pltpu.make_async_copy(win, o_ref.at[pl.ds(a0, w)], sem)
        cp.start()
        cp.wait()
    src = jnp.ones((w, 256), dtype)
    out = pl.pallas_call(
        k,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((w, 256), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((w, 256), dtype),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((256, 256), dtype),
    )(jnp.asarray([64 + w], jnp.int32), src)
    return int(np.asarray(out)[((64 + w) // w) * w, 0])


probe("f32->int8 cast", f32_to_i8)
probe("int8 select", i8_select)
for dt, ws in ((jnp.bfloat16, (2, 4, 8, 16)), (jnp.int8, (4, 8, 16, 32)),
               (jnp.float32, (1, 2, 8))):
    for w in ws:
        probe(f"win_dma {np.dtype(dt).name} w={w}",
              functools.partial(win_dma, dt, w))
print("PRIMITIVES DONE", flush=True)
