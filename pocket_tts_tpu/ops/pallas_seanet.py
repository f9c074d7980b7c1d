"""Whole-SEANet-decoder megakernel: one Pallas call per frame.

BENCH r3 attribution: after the backbone went behind fused kernels, the
mimi/seanet chain's ~30 small XLA ops (convolution fusions, elu, pads,
overlap-add shifts, carry updates) remained ~25-40% of the serving frame —
each op pays dispatch/layout cost on tiny (<=480 x 256) tensors. This
kernel runs the ENTIRE decoder chain for a stream in one grid step:

  model_0 conv k7 -> elu -> [convtr k=2s + resnet + elu] x2 (flat
  time-major) -> stage-3 convtr + resnet + final conv in the BLOCKED-TIME
  (T, s*C) representation (models/seanet.py's layout story, in-kernel) ->
  pcm (T3, s3*out_ch)

with every stage's streaming carry (conv tails, convtr overlap rows) read
and written in place. The weight matrices arrive pre-transformed (j-major
flattened convtr weights, window-stacked conv weights, kron block-diagonal
taps for the blocked stage) — built with jnp in the jit wrapper, so XLA
hoists them out of the decode scan as loop invariants, and the kernel's
constant-index BlockSpecs fetch them into VMEM once per frame, not once
per stream.

Numerics: dots accumulate f32 (bf16 MXU operands on the real model), elu
in f32 — matching ops/conv.py's XLA formulations to rounding.

ref chain: /root/reference/src/pocket_tts/modules/seanet.h:187-211.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu32(x):
    x32 = x.astype(jnp.float32)
    return jnp.where(x32 > 0, x32, jnp.exp(jnp.minimum(x32, 0.0)) - 1.0)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(z_ref, c0_ref, c1_ref, c2_ref, c3_ref, c4_ref, c5_ref, c6_ref,
            c7_ref,
            w0_ref, b0_ref, w1_ref, b1_ref, wr1_ref, br1_ref, wc1_ref,
            bc1_ref, w2_ref, b2_ref, wr2_ref, br2_ref, wc2_ref, bc2_ref,
            w3_ref, b3_ref, wr3_ref, br3_ref, wc3_ref, bc3_ref, w11_ref,
            b11_ref,
            pcm_ref, c0o_ref, c1o_ref, c2o_ref, c3o_ref, c4o_ref, c5o_ref,
            c6o_ref, c7o_ref,
            *, s1, ch1, s2, ch2, s3, ch3, k0, kr, kl):
    dt = z_ref.dtype

    # Mosaic restriction driving every formulation below: concatenate may
    # not mix operands whose (sublane, lane) offsets differ on a NON-concat
    # dimension, so slices never feed concats — shifted windows become
    # accumulated per-tap dots, the convtr overlap-add splits the weight so
    # both halves materialize at offset 0, and the blocked lane-rotations
    # become per-tap row-split dot pairs.

    def conv_flat(prev_ref, prevo_ref, x, w_ref, b_ref, k):
        """streaming causal conv: prev (k-1, C) tail; k accumulated
        row-shifted dots against the window-stacked (k*C, Co) weight."""
        t, cin = x.shape
        xc = jnp.concatenate([prev_ref[0].astype(dt), x], axis=0)
        prevo_ref[0] = xc[t:].astype(prevo_ref.dtype)
        acc = None
        for j in range(k):
            part = _dot(xc[j: j + t],
                        w_ref[j * cin:(j + 1) * cin, :].astype(dt))
            acc = part if acc is None else acc + part
        return (acc + b_ref[...].astype(jnp.float32)).astype(dt)

    def convtr_flat(prev_ref, prevo_ref, x, w_ref, b_ref, s, cout):
        """streaming k==2s transposed conv, flat time-major output:
        y[i*s+j] = u_a[i,j] + u_b[i-1,j] with u_a/u_b from SPLIT weight
        columns (so both reshape from offset 0)."""
        t = x.shape[0]
        xb16 = x.astype(dt)
        ua = _dot(xb16, w_ref[:, : s * cout].astype(dt)).astype(dt)
        ub = _dot(xb16, w_ref[:, s * cout:].astype(dt)).astype(dt)
        a = ua.reshape(t * s, cout)
        bb = ub.reshape(t * s, cout)
        shifted = jnp.concatenate([prev_ref[0].astype(dt), bb[: t * s - s]],
                                  axis=0)
        prevo_ref[0] = bb[t * s - s:].astype(prevo_ref.dtype)
        return (a.astype(jnp.float32) + shifted.astype(jnp.float32)
                + b_ref[...].astype(jnp.float32)).astype(dt)

    def resnet_flat(prev_ref, prevo_ref, x, wr_ref, br_ref, wc_ref, bc_ref):
        v = _elu32(x).astype(dt)
        vconv = conv_flat(prev_ref, prevo_ref, v, wr_ref, br_ref, kr)
        v2 = _elu32(vconv).astype(dt)
        y = _dot(v2, wc_ref[...].astype(dt))
        return x + (y + bc_ref[...].astype(jnp.float32)).astype(dt)

    def conv_blocked(prev_ref, prevo_ref, xb, w_ref, b_ref, k, cin_b):
        """causal conv over the blocked (T, s*C) layout. The lane-rotated
        source of tap lookback d splits into (top-row tail, current rows),
        each dotted against the matching ROW SPLIT of the kron
        block-diagonal tap — no offset-carrying concat."""
        t, sc = xb.shape
        top = jnp.concatenate([prev_ref[0].astype(dt), xb[:-1]], axis=0)
        prevo_ref[0] = xb[-1:].astype(prevo_ref.dtype)
        acc = None
        for d in range(k):
            wj = w_ref[k - 1 - d]                        # (s*C, s*Co)
            if d == 0:
                part = _dot(xb, wj[...].astype(dt))
            else:
                lanes = d * cin_b
                part = (_dot(top[:, sc - lanes:],
                             wj[: lanes, :].astype(dt))
                        + _dot(xb[:, : sc - lanes],
                               wj[lanes:, :].astype(dt)))
            acc = part if acc is None else acc + part
        return (acc + b_ref[...].astype(jnp.float32)).astype(dt)

    # ---- model_0 conv k7 -------------------------------------------------
    x = conv_flat(c0_ref, c0o_ref, z_ref[0].astype(dt), w0_ref, b0_ref, k0)
    x = _elu32(x).astype(dt)
    # ---- stage 1: convtr + resnet ----------------------------------------
    x = convtr_flat(c1_ref, c1o_ref, x, w1_ref, b1_ref, s1, ch1)
    x = resnet_flat(c2_ref, c2o_ref, x, wr1_ref, br1_ref, wc1_ref, bc1_ref)
    x = _elu32(x).astype(dt)
    # ---- stage 2: convtr + resnet ----------------------------------------
    x = convtr_flat(c3_ref, c3o_ref, x, w2_ref, b2_ref, s2, ch2)
    x = resnet_flat(c4_ref, c4o_ref, x, wr2_ref, br2_ref, wc2_ref, bc2_ref)
    x = _elu32(x).astype(dt)
    # ---- stage 3: BLOCKED convtr + resnet + final conv -------------------
    t = x.shape[0]
    ua = _dot(x, w3_ref[:, : s3 * ch3].astype(dt)).astype(dt)
    ub = _dot(x, w3_ref[:, s3 * ch3:].astype(dt)).astype(dt)
    shifted = jnp.concatenate([c5_ref[0].astype(dt), ub[: t - 1]], axis=0)
    c5o_ref[0] = ub[t - 1:].astype(c5o_ref.dtype)
    xb = (ua.astype(jnp.float32) + shifted.astype(jnp.float32)
          + b3_ref[...].astype(jnp.float32)).astype(dt)
    v = _elu32(xb).astype(dt)
    vc = conv_blocked(c6_ref, c6o_ref, v, wr3_ref, br3_ref, kr, ch3)
    v2 = _elu32(vc).astype(dt)
    y = _dot(v2, wc3_ref[...].astype(dt))
    xb = xb + (y + bc3_ref[...].astype(jnp.float32)).astype(dt)
    xb = _elu32(xb).astype(dt)
    pcm_ref[0] = conv_blocked(c7_ref, c7o_ref, xb, w11_ref, b11_ref, kl,
                              ch3).astype(pcm_ref.dtype)


# ---------------------------------------------------------------------------
# weight preparation (jit-level; loop-invariant, hoisted out of the scan)
# ---------------------------------------------------------------------------

def _conv_w(mod, k):
    w = mod["w"]
    cout, cin, kk = w.shape
    assert kk == k, (w.shape, k)
    wf = jnp.transpose(w, (2, 1, 0)).reshape(k * cin, cout)
    b = mod.get("b")
    b = jnp.zeros((cout,), w.dtype) if b is None else b
    return wf, b.reshape(1, cout)


def _convtr_w(mod, s, tile_bias: int = 1):
    w = mod["w"]
    cin, cout, k = w.shape
    assert k == 2 * s, (w.shape, s)
    w2 = jnp.transpose(w, (0, 2, 1)).reshape(cin, k * cout)
    b = mod.get("b")
    b = jnp.zeros((cout,), w.dtype) if b is None else b
    if tile_bias > 1:
        b = jnp.tile(b, tile_bias)
    return w2, b.reshape(1, -1)


def _conv1x1_w(mod):
    w = mod["w"]
    b = mod.get("b")
    b = jnp.zeros((w.shape[0],), w.dtype) if b is None else b
    return w[:, :, 0].T, b.reshape(1, -1)


def _blocked_taps(mod, s):
    """stacked (k, s*Cin, s*Cout) kron block-diagonal taps + tiled bias."""
    w = mod["w"]
    cout, cin, k = w.shape
    eye = jnp.eye(s, dtype=w.dtype)
    taps = jnp.stack([jnp.kron(eye, w[:, :, j].T) for j in range(k)])
    b = mod.get("b")
    b = jnp.zeros((cout,), w.dtype) if b is None else b
    return taps, jnp.tile(b, s).reshape(1, s * cout)


def _blocked_1x1(mod, s):
    w = mod["w"]
    cout = w.shape[0]
    eye = jnp.eye(s, dtype=w.dtype)
    wb = jnp.kron(eye, w[:, :, 0].T)
    b = mod.get("b")
    b = jnp.zeros((cout,), w.dtype) if b is None else b
    return wb, jnp.tile(b, s).reshape(1, s * cout)


def _prep_weights(p, cfg):
    st1, st2, st3 = cfg.stages
    kr = cfg.resnet_kernel
    w0, b0 = _conv_w(p["model_0"], cfg.first_kernel)
    w1, b1 = _convtr_w(p["model_2"], st1.stride)
    wr1, br1 = _conv_w(p["model_3"]["block_1"], kr)
    wc1, bc1 = _conv1x1_w(p["model_3"]["block_3"])
    w2, b2 = _convtr_w(p["model_5"], st2.stride)
    wr2, br2 = _conv_w(p["model_6"]["block_1"], kr)
    wc2, bc2 = _conv1x1_w(p["model_6"]["block_3"])
    w3, b3 = _convtr_w(p["model_8"], st3.stride, tile_bias=st3.stride)
    wr3, br3 = _blocked_taps(p["model_9"]["block_1"], st3.stride)
    wc3, bc3 = _blocked_1x1(p["model_9"]["block_3"], st3.stride)
    w11, b11 = _blocked_taps(p["model_11"], st3.stride)
    return (w0, b0, w1, b1, wr1, br1, wc1, bc1, w2, b2, wr2, br2, wc2, bc2,
            w3, b3, wr3, br3, wc3, bc3, w11, b11)


_CARRY_KEYS = ("model_0", "model_2", "model_3", "model_5", "model_6",
               "model_8", "model_9", "model_11")


def kernel_ok(cfg) -> bool:
    """Covers the reference decoder shape: three k==2s stages with the
    last one blocked-time."""
    from ..models.seanet import _blocked
    return (len(cfg.stages) == 3
            and all(st.kernel == 2 * st.stride for st in cfg.stages)
            and _blocked(cfg, 2))


def _seanet_batched(cfg, interpret, z, carries, weights):
    st1, st2, st3 = cfg.stages
    bsz, t0, c_in = z.shape
    t3 = t0 * st1.stride * st2.stride
    kernel = functools.partial(
        _kernel, s1=st1.stride, ch1=st1.out_ch, s2=st2.stride,
        ch2=st2.out_ch, s3=st3.stride, ch3=st3.out_ch,
        k0=cfg.first_kernel, kr=cfg.resnet_kernel, kl=cfg.last_kernel)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda b, nd=nd: (b,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def wspec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda b, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    carry_specs = [bspec(c.shape[1:]) for c in carries]
    outs = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[bspec((t0, c_in))] + carry_specs
        + [wspec(w) for w in weights],
        out_specs=[bspec((t3, st3.stride * cfg.out_ch))] + carry_specs,
        out_shape=([jax.ShapeDtypeStruct(
            (bsz, t3, st3.stride * cfg.out_ch), z.dtype)]
            + [jax.ShapeDtypeStruct(c.shape, c.dtype) for c in carries]),
        interpret=interpret,
        name="seanet_frame",
    )(z, *carries, *weights)
    return outs[0], tuple(outs[1:])


@functools.lru_cache(maxsize=None)
def _make_seanet(cfg, interpret):
    """Single-stream entry; custom vmap dispatches the batched grid with
    the weights left unbatched (streamed once per frame)."""

    @jax.custom_batching.custom_vmap
    def fn(z, *rest):
        carries, weights = rest[:8], rest[8:]
        pcm, new = _seanet_batched(cfg, interpret, z[None],
                                   tuple(c[None] for c in carries), weights)
        return (pcm[0],) + tuple(c[0] for c in new)

    @fn.def_vmap
    def _rule(axis_size, in_batched, z, *rest):
        carries, weights = rest[:8], rest[8:]
        cb = in_batched[1:9]
        assert in_batched[0] and all(cb), "stream state must be batched"
        assert not any(in_batched[9:]), "weights must be batch-shared"
        mesh = cfg.mesh
        if mesh is not None:
            # GSPMD can't partition the Mosaic call: shard streams over
            # "data" explicitly, weights replicated (see pallas_attn)
            from jax.sharding import PartitionSpec as P
            data = mesh.shape.get("data", 1)
            if axis_size % data:
                raise ValueError(
                    f"seanet shard_map needs batch {axis_size} % data "
                    f"{data} == 0; use runtime.batched.mesh_cfg")
            bspec = P("data")
            call = jax.shard_map(
                lambda zz, cc, ww: _seanet_batched(cfg, interpret, zz, cc,
                                                   ww),
                mesh=mesh,
                in_specs=(bspec, tuple(bspec for _ in carries),
                          tuple(P() for _ in weights)),
                out_specs=(bspec, tuple(bspec for _ in carries)),
                check_vma=False)
            pcm, new = call(z, carries, weights)
        elif z.dtype.itemsize > 2:
            # f32 streams: the VMEM-resident weight set alone is ~16.4 MB
            # f32, and the batched grid's per-stream double buffering
            # pushes the scoped allocation past the 16 MB limit (measured
            # OOM at 4 lanes). The single-stream program fits — run it
            # per lane. f32 batch is a correctness/reference path; the
            # serving paths are bf16/quantized and keep the batched grid.
            outs = jax.lax.map(
                lambda zc: fn(zc[0], *zc[1], *weights), (z, carries))
            pcm, new = outs[0], tuple(outs[1:])
        else:
            pcm, new = _seanet_batched(cfg, interpret, z, carries, weights)
        return (pcm,) + new, (True,) * 9

    return fn


def seanet_frame(p, cfg, state: dict, x, interpret: bool = False):
    """Drop-in for models/seanet.forward when kernel_ok(cfg):
    x (T, in_ch) -> (new_state, pcm (T*total_stride, out_ch))."""
    weights = _prep_weights(p, cfg)
    carries = tuple(state[k] for k in _CARRY_KEYS)
    outs = _make_seanet(cfg, interpret)(x, *carries, *weights)
    pcm, new = outs[0], outs[1:]
    return dict(zip(_CARRY_KEYS, new)), pcm.reshape(-1, cfg.out_ch)
