"""Whole-backbone-layer megakernel for single-stream quantized decode.

The B=1 decode frame is dominated by fixed per-call costs once weights are
quantized: each backbone layer runs THREE Mosaic calls (fused pre-attention,
fused insert+flash-decode, fused post-attention) plus XLA glue between them
(qkv split, rope, KV-row quantization). Every kernel boundary is a pipeline
drain/refill (~1-3 us); at 6 layers that overhead is a material slice of a
~170 us frame. This kernel runs ONE Pallas call per layer:

  phase A (3 grid steps): ln1 = layer_norm(x); qkv tile j = ln1 @ W_in[:, j]
    with rope applied to q/k IN KERNEL and the K/V rows quantized for the
    int8 KV cache — no XLA ops between projection and attention;
  phase B (NB steps): the fused insert + flash decode of
    ops/pallas_attn._insert_attn_kernel (analytic new-row merge, masked
    stale slot, aligned-window DMA write-back through aliasing);
  phase C (NH steps): out_proj + residual + ln2 at the first step, then the
    hidden-tiled MLP of ops/fused_layer._post_kernel (int4 packed-pair
    tiles), final residual at the last step.

Rope without lane shuffles: Mosaic has no cheap in-register lane rotation,
so the within-head half swap runs as three tiny constant-matrix MXU passes
built from iotas once per call — gather head lanes to columns
(em @ G64 : (H, H*D) @ (H*D, D)), swap halves (@ P64 : (D, D) partner
permutation), scatter back (@ G64t * seg). Each output element has exactly
one unit contribution, so the gathers are bit-exact; the rope arithmetic
itself runs in f32 like ops/rope.apply_rope_halves.

Scope: the BACKBONE layer at T == 1 (no layer scales), quantized weights
(int4/int8; a bf16 path exists for tests but — like ops/fused_layer — is
never auto-dispatched: Mosaic calls serialize the bf16 weight stream XLA
prefetches). Under vmap the custom rule delegates to the proven 3-call
path, whose kernels collapse the batch into matmul rows — the megakernel
would re-stream the weights once per stream group at batch.
ref: the whole-layer seam is streaming_transformer_layer_forward,
/root/reference/src/pocket_tts/modules/transformer.h:253-278.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_layer import _deq_dot, _gelu_f32
from .pallas_attn import _INSERT_WIN, _win_select, NEG_INF


def _ln_row(x32, sc_ref, eps):
    """layer_norm of a (1, dm) f32 row; sc_ref (2, dm) = [scale; bias]."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    p = sc_ref[...].astype(jnp.float32)
    return y * p[0:1] + p[1:2]


def _megalayer_kernel(ends_ref, cpos_ref, *refs, h, d, nb, nh, bits, kvq,
                      win, eps, approx):
    """One backbone layer, grid (3 + nb + nh,). See module docstring."""
    dm = h * d
    it = iter(refs)
    x_ref, n1_ref, win_ref, sin_ref, bin_ref, cs_ref, pos_ref = (
        next(it) for _ in range(7))
    ks_ref, vs_ref = (next(it), next(it)) if kvq else (None, None)
    k_ref, v_ref, wo_ref, so_ref, bo_ref, n2_ref = (
        next(it) for _ in range(6))
    w1_ref, s1_ref, b1_ref = (next(it) for _ in range(3))
    w1b_ref, s1b_ref, b1b_ref = ((next(it) for _ in range(3)) if bits == 4
                                 else (None, None, None))
    w2_ref, s2_ref, b2_ref = (next(it) for _ in range(3))
    y_ref, kc_out, vc_out = (next(it) for _ in range(3))
    kso_ref, vso_ref = (next(it), next(it)) if kvq else (None, None)
    (ln_s, qm_s, kn_s, vn_s, ksv_s, m_s, l_s, acc_s,
     x1_s, ln2_s, mlp_s, attn_s, kwin, vwin, g64_s, g64t_s, seg_s,
     sems) = (next(it) for _ in range(18))
    step = pl.program_id(0)
    bs = k_ref.shape[1]
    f = jnp.float32
    xdt = x_ref.dtype
    end = ends_ref[0]
    ws = ends_ref[1]
    nblive = jnp.minimum((end + bs) // bs, nb)
    iw = ws // bs
    a0 = (ws // win) * win
    r = ws - a0
    last_flash = 3 + nb - 1
    total = 3 + nb + nh
    scale_attn = 1.0 / jnp.sqrt(f(d))

    def win_copies():
        return (pltpu.make_async_copy(kwin, kc_out.at[0, pl.ds(a0, win)],
                                      sems.at[0]),
                pltpu.make_async_copy(vwin, vc_out.at[0, pl.ds(a0, win)],
                                      sems.at[1]))

    # ---- preamble: constants + ln1, once per call ------------------------
    @pl.when(step == 0)
    def _():
        # gather/scatter/swap selection matrices (bit-exact: one unit
        # contribution per output element)
        gl = jax.lax.broadcasted_iota(jnp.int32, (dm, d), 0)
        gc = jax.lax.broadcasted_iota(jnp.int32, (dm, d), 1)
        g64_s[...] = (gl % d == gc).astype(xdt)
        tl = jax.lax.broadcasted_iota(jnp.int32, (d, dm), 0)
        tc = jax.lax.broadcasted_iota(jnp.int32, (d, dm), 1)
        g64t_s[...] = (tc % d == tl).astype(xdt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (h, dm), 1)
        head = jax.lax.broadcasted_iota(jnp.int32, (h, dm), 0)
        seg_s[...] = (lane // d == head).astype(f)
        ln_s[...] = _ln_row(x_ref[...].astype(f), n1_ref, eps).astype(xdt)
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    def rope(row_f32):
        """(1, dm) f32 post-projection row -> rope'd rows.
        Returns (H, dm) seg-expanded f32 (for qm) — callers reduce."""
        em = (seg_s[...] * row_f32).astype(xdt)          # (H, dm)
        mat = jax.lax.dot_general(
            em, g64_s[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f)                     # (H, D) gather
        pr = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
        pc = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
        p64 = (pc == (pr + d // 2) % d).astype(xdt)       # half swap
        sw = jax.lax.dot_general(
            mat.astype(xdt), p64, (((1,), (0,)), ((), ())),
            preferred_element_type=f)                     # (H, D)
        cs = cs_ref[...].astype(f)                        # (2, D)
        rm = mat * cs[0:1] + sw * cs[1:2]                 # f32 rope
        back = jax.lax.dot_general(
            rm.astype(xdt), g64t_s[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f)                     # (H, dm) scatter
        return back * seg_s[...]

    # ---- phase A: qkv tiles with in-kernel rope + KV quantize ------------
    @pl.when(step < 3)
    def _():
        acc3 = _deq_dot(ln_s[...], win_ref, sin_ref, bits)
        b = bin_ref[...]
        row = acc3 + b.astype(f)                          # (1, dm) f32

        @pl.when(step == 0)
        def _():
            # q: rope in expanded form IS the seg-masked qm
            qm_s[...] = rope(row.astype(xdt).astype(f)).astype(xdt)

        @pl.when(step == 1)
        def _():
            kr = rope(row.astype(xdt).astype(f))          # (H, dm) expanded
            kf = jnp.sum(kr, axis=0, keepdims=True)       # (1, dm) f32
            if kvq:
                s = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1,
                                        keepdims=True) / 127.0, 1e-12)
                ksv_s[0:1, 0:1] = s
                kn_s[...] = jnp.clip(jnp.round(kf / s), -127,
                                     127).astype(kn_s.dtype)
            else:
                kn_s[...] = kf.astype(kn_s.dtype)

        @pl.when(step == 2)
        def _():
            vf = row                                      # (1, dm) f32
            if kvq:
                # match backbone.quantize_rows: absmax of the bf16 row
                vb = vf.astype(xdt).astype(f)
                s = jnp.maximum(jnp.max(jnp.abs(vb), axis=-1,
                                        keepdims=True) / 127.0, 1e-12)
                ksv_s[0:1, 1:2] = s
                vn_s[...] = jnp.clip(jnp.round(vb / s), -127,
                                     127).astype(vn_s.dtype)
            else:
                vn_s[...] = vf.astype(vn_s.dtype)

    # ---- phase B: fused insert + flash decode ----------------------------
    @pl.when((step >= 3) & (step - 3 < nblive))
    def _():
        i = step - 3
        sidx = i * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        qm = qm_s[...]
        kb = k_ref[0]
        vb = v_ref[0]
        posb = pos_ref[0, pl.ds(i, 1), :]
        ok = (posb >= 0) & (sidx != ws)
        penalty = jnp.where(ok, 0.0, NEG_INF).astype(f)
        if kvq:
            kb = kb.astype(qm.dtype)
            vb = vb.astype(qm.dtype)
        logits = jax.lax.dot_general(
            qm, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=f) * scale_attn
        if kvq:
            logits = logits * ks_ref[0, pl.ds(i, 1), :]
        logits = logits + penalty
        m = m_s[...]
        m_new = jnp.maximum(m, jnp.max(logits, axis=1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)
        l_new = l_s[...] * corr + jnp.sum(p, axis=1, keepdims=True)
        if kvq:
            p = p * vs_ref[0, pl.ds(i, 1), :]
        pvh = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=f)
        m_s[...] = m_new
        l_s[...] = l_new
        acc_s[...] = acc_s[...] * corr + pvh

    @pl.when(step - 3 == iw)
    def _():
        # aligned-window write-back; the window's old rows come from the
        # cache block already in VMEM (see pallas_attn._insert_attn_kernel)
        a_loc = (ws % bs) // win * win
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (win, dm), 0) == r)
        kwin[...] = _win_select(rowsel, kn_s[...],
                                k_ref[0, pl.ds(a_loc, win), :])
        vwin[...] = _win_select(rowsel, vn_s[...],
                                v_ref[0, pl.ds(a_loc, win), :])
        ck, cv = win_copies()
        ck.start()
        cv.start()

    @pl.when(step == last_flash)
    def _():
        # analytic merge of the new row, normalize, then out_proj +
        # residual + ln2 so phase C starts immediately
        knf = kn_s[...].astype(f)
        vnf = vn_s[...].astype(f)
        if kvq:
            knf = knf * ksv_s[0:1, 0:1]
            vnf = vnf * ksv_s[0:1, 1:2]
        qmf = qm_s[...].astype(f)
        logit_n = (jnp.sum(qmf * knf, axis=1, keepdims=True) * scale_attn)
        logit_n = logit_n + jnp.where(cpos_ref[0] >= 0, 0.0, NEG_INF)
        m_old = m_s[...]
        m_fin = jnp.maximum(m_old, logit_n)
        corr = jnp.exp(m_old - m_fin)
        p_n = jnp.exp(logit_n - m_fin)
        l_fin = l_s[...] * corr + p_n
        acc_fin = acc_s[...] * corr + p_n * vnf
        norm = acc_fin / jnp.maximum(l_fin, 1e-30)
        attn = jnp.sum(norm * seg_s[...], axis=0, keepdims=True)  # (1, dm)
        attn_s[...] = attn.astype(xdt)
        if kvq:
            flat = (jax.lax.broadcasted_iota(jnp.int32, (nb, bs), 0) * bs
                    + jax.lax.broadcasted_iota(jnp.int32, (nb, bs), 1))
            kso_ref[0] = jnp.where(flat == ws, ksv_s[0:1, 0:1], ks_ref[0])
            vso_ref[0] = jnp.where(flat == ws, ksv_s[0:1, 1:2], vs_ref[0])
        proj = _deq_dot(attn_s[...], wo_ref, so_ref, bits)
        proj = proj + bo_ref[...].astype(f)
        x1 = x_ref[...].astype(f) + proj
        x1_s[...] = x1
        ln2_s[...] = _ln_row(x1, n2_ref, eps).astype(xdt)
        mlp_s[...] = jnp.zeros_like(mlp_s)

    # ---- phase C: hidden-tiled MLP (fused_layer._post_kernel scheme) ----
    @pl.when(step >= 3 + nb)
    def _():
        ln2 = ln2_s[...]
        if bits == 4:
            # rawf32m W2 (always T==1 here): both gelu halves first, then
            # merged f32 dots over the raw packed block — no per-byte
            # unpack (see quant_matmul.INT4_SCHEME; the unpack variant
            # was ~1/3 of the fused post kernel's time)
            w2p = w2_ref[0] if w2_ref.ndim == 3 else w2_ref[...]
            b32 = w2p.astype(f)
            hi32 = jnp.floor(b32 * jnp.asarray(1.0 / 16.0, f))
            hs = []
            for w1r, s1r, b1r in ((w1_ref, s1_ref, b1_ref),
                                  (w1b_ref, s1b_ref, b1b_ref)):
                hh = _deq_dot(ln2, w1r, s1r, bits)
                hs.append(_gelu_f32(hh + b1r[...].astype(f), approx))
            ha, hb = hs
            acc = jax.lax.dot_general(ha, b32, (((1,), (0,)), ((), ())),
                                      preferred_element_type=f)
            acc += jax.lax.dot_general(hb - 16.0 * ha, hi32,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=f)
            acc -= 8.0 * jnp.sum(ha, axis=-1, keepdims=True)
            mlp_s[...] = mlp_s[...] + acc
        else:
            w2 = w2_ref[0] if w2_ref.ndim == 3 else w2_ref[...]
            hh = _deq_dot(ln2, w1_ref, s1_ref, bits)
            hh = _gelu_f32(hh + b1_ref[...].astype(f), approx)
            mlp_s[...] = mlp_s[...] + jax.lax.dot_general(
                hh.astype(ln2.dtype), w2.astype(ln2.dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=f)

    @pl.when(step == total - 1)
    def _():
        s2 = (s2_ref[0] if s2_ref.ndim == 3 else s2_ref[...]).astype(f)
        up = mlp_s[...] * s2 + b2_ref[...].astype(f)
        y_ref[...] = (x1_s[...] + up).astype(y_ref.dtype)
        ck, cv = win_copies()
        ck.wait()
        cv.wait()


@functools.partial(
    jax.jit, static_argnames=("layer", "bits", "block_size", "eps",
                              "approx", "interpret"))
def _megalayer_call(x, n1, w_in, s_in, b_in, cs, cur_pos, k_cache, v_cache,
                    pos, read_end, write_slot, wo, so, bo, n2,
                    w1, s1, b1, w2, s2, b2, k_scale=None, v_scale=None,
                    layer: int = 0, bits: int = 4, block_size: int = 384,
                    eps: float = 1e-5, approx: bool = False,
                    interpret: bool = False):
    """Single-stream whole-layer call. x (1, dm); caches (S, dm) PRE-insert;
    pos (S,) POST-insert; n1/n2 (2, dm) [scale; bias]; cs (2, D)
    [cos duplicated; sin with -/+ halves]; weights stacked (L, ...) read in
    place at static `layer` (ops/quant_matmul._w_specs rationale).
    Returns (y (1, dm), k_cache', v_cache'[, k_scale', v_scale'])."""
    dm = x.shape[-1]
    s = k_cache.shape[0]
    assert s % block_size == 0, (s, block_size)
    nb = s // block_size
    kvq = k_scale is not None
    d = cs.shape[-1]
    h = dm // d
    win = min(_INSERT_WIN.get(k_cache.dtype.type, 32), block_size)
    hidden = w1.shape[-1]
    span = hidden // 2 if bits == 4 else hidden
    nth = 512
    while span % nth:
        nth //= 2
    nh = span // nth
    stacked = w_in.ndim == 3
    lidx = layer if stacked else 0
    pre = (1,) if stacked else ()
    kp3 = w_in.shape[-2]
    kpo = wo.shape[-2]
    kp1 = w1.shape[-2]

    def cl(v, lo, hi):
        return jnp.clip(v, lo, hi)

    def m_in(i, *_):
        return ((lidx,) if stacked else ()) + (0, cl(i, 0, 2))

    def m_const(i, *_):
        return ((lidx,) if stacked else ()) + (0, 0)

    def m_kv(i, e, c):
        last = jnp.maximum((e[0] + block_size) // block_size - 1, 0)
        return (0, jnp.minimum(cl(i - 3, 0, nb - 1), last), 0)

    def m_w1(i, *_):
        return ((lidx,) if stacked else ()) + (0, cl(i - 3 - nb, 0, nh - 1))

    off_b = nh if bits == 4 else 0

    def m_w1b(i, *_):
        return ((lidx,) if stacked else ()) + (
            0, cl(i - 3 - nb, 0, nh - 1) + off_b)

    def m_w2(i, *_):
        return ((lidx,) if stacked else ()) + (cl(i - 3 - nb, 0, nh - 1), 0)

    def row(shape, map_fn=None):
        return pl.BlockSpec(shape, map_fn or (lambda i, *_: (0, 0)),
                            memory_space=pltpu.VMEM)

    def r2(a, n):
        a = a.astype(jnp.float32) if a.dtype != jnp.float32 else a
        return a.reshape(-1, 1, n) if stacked else a.reshape(1, n)

    zeros_dm = jnp.zeros((1, dm), x.dtype)
    b_in2 = (b_in.reshape(1, -1) if b_in is not None
             else jnp.zeros((1, 3 * dm), x.dtype))
    bo2 = bo.reshape(1, dm) if bo is not None else zeros_dm
    b12 = (b1.reshape(1, hidden) if b1 is not None
           else jnp.zeros((1, hidden), x.dtype))
    b22 = b2.reshape(1, dm) if b2 is not None else zeros_dm

    in_specs = [
        row((1, dm)),                                   # x
        row((2, dm)),                                   # n1
        pl.BlockSpec(pre + (kp3, dm), m_in, memory_space=pltpu.VMEM),
        pl.BlockSpec(pre + (1, dm), m_in, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dm), lambda i, *_: (0, cl(i, 0, 2)),
                     memory_space=pltpu.VMEM),          # b_in (1, 3dm)
        row((2, d)),                                    # cs
        pl.BlockSpec((1, nb, block_size), lambda i, *_: (0, 0, 0),
                     memory_space=pltpu.VMEM),          # pos
    ]
    operands = [x, jnp.stack([n1[0], n1[1]]), w_in, r2(s_in, 3 * dm), b_in2,
                cs, pos.reshape(1, nb, block_size)]
    if kvq:
        in_specs += [pl.BlockSpec((1, nb, block_size),
                                  lambda i, *_: (0, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        operands += [k_scale.reshape(1, nb, block_size),
                     v_scale.reshape(1, nb, block_size)]
    in_specs += [
        pl.BlockSpec((1, block_size, dm), m_kv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_size, dm), m_kv, memory_space=pltpu.VMEM),
        pl.BlockSpec(pre + (kpo, dm), m_const, memory_space=pltpu.VMEM),
        pl.BlockSpec(pre + (1, dm), m_const, memory_space=pltpu.VMEM),
        row((1, dm)),                                   # bo
        row((2, dm)),                                   # n2
        pl.BlockSpec(pre + (kp1, nth), m_w1, memory_space=pltpu.VMEM),
        pl.BlockSpec(pre + (1, nth), m_w1, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nth), lambda i, *_: (0, cl(i - 3 - nb, 0,
                                                    nh - 1)),
                     memory_space=pltpu.VMEM),          # b1
        pl.BlockSpec(pre + (kp1, nth), m_w1b, memory_space=pltpu.VMEM),
        pl.BlockSpec(pre + (1, nth), m_w1b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nth), lambda i, *_: (
            0, cl(i - 3 - nb, 0, nh - 1) + off_b),
            memory_space=pltpu.VMEM),                   # b1 (high half)
        pl.BlockSpec(pre + (nth, dm), m_w2, memory_space=pltpu.VMEM),
        pl.BlockSpec(pre + (1, dm), m_const, memory_space=pltpu.VMEM),
        row((1, dm)),                                   # b2
    ]
    operands += [k_cache.reshape(1, s, dm), v_cache.reshape(1, s, dm),
                 wo, r2(so, dm), bo2, jnp.stack([n2[0], n2[1]]),
                 w1, r2(s1, hidden), b12, w1, r2(s1, hidden), b12,
                 w2, r2(s2, dm), b22]
    if bits != 4:
        # single MLP half: drop the W1b/S1b/B1b trio (operand idx 15-17
        # relative to the weights section)
        drop = slice(len(in_specs) - 6, len(in_specs) - 3)
        del in_specs[drop], operands[drop]

    out_specs = [
        row((1, dm)),                                   # y
        pl.BlockSpec(memory_space=pl.ANY),              # k_cache
        pl.BlockSpec(memory_space=pl.ANY),              # v_cache
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, dm), x.dtype),
        jax.ShapeDtypeStruct((1, s, dm), k_cache.dtype),
        jax.ShapeDtypeStruct((1, s, dm), v_cache.dtype),
    ]
    nsc = 2
    # operand index of k_cache (scalars + inputs before it)
    kc_idx = nsc + 7 + (2 if kvq else 0)
    aliases = {kc_idx: 1, kc_idx + 1: 2}
    if kvq:
        out_specs += [pl.BlockSpec((1, nb, block_size),
                                   lambda i, *_: (0, 0, 0),
                                   memory_space=pltpu.VMEM)] * 2
        out_shape += [jax.ShapeDtypeStruct((1, nb, block_size),
                                           jnp.float32)] * 2
        aliases[nsc + 7] = 3
        aliases[nsc + 8] = 4

    kernel = functools.partial(
        _megalayer_kernel, h=h, d=d, nb=nb, nh=nh, bits=bits, kvq=kvq,
        win=win, eps=eps, approx=approx)
    cache_dt = k_cache.dtype
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsc,
            grid=(3 + nb + nh,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((1, dm), x.dtype),            # ln1
                pltpu.VMEM((h, dm), x.dtype),            # qm
                pltpu.VMEM((1, dm), cache_dt),           # k_new
                pltpu.VMEM((1, dm), cache_dt),           # v_new
                pltpu.VMEM((1, 2), jnp.float32),         # k/v new scales
                pltpu.VMEM((h, 1), jnp.float32),         # m
                pltpu.VMEM((h, 1), jnp.float32),         # l
                pltpu.VMEM((h, dm), jnp.float32),        # acc
                pltpu.VMEM((1, dm), jnp.float32),        # x1
                pltpu.VMEM((1, dm), x.dtype),            # ln2
                pltpu.VMEM((1, dm), jnp.float32),        # mlp acc
                pltpu.VMEM((1, dm), x.dtype),            # attn
                pltpu.VMEM((win, dm), cache_dt),         # k window
                pltpu.VMEM((win, dm), cache_dt),         # v window
                pltpu.VMEM((dm, d), x.dtype),            # G64
                pltpu.VMEM((d, dm), x.dtype),            # G64^T
                pltpu.VMEM((h, dm), jnp.float32),        # seg
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        name="megalayer",
    )(jnp.stack([jnp.asarray(read_end, jnp.int32),
                 jnp.asarray(write_slot, jnp.int32)]),
      jnp.asarray(cur_pos, jnp.int32).reshape(1), *operands)
    y, kc, vc = outs[0], outs[1].reshape(s, dm), outs[2].reshape(s, dm)
    if kvq:
        return y, kc, vc, outs[3].reshape(s), outs[4].reshape(s)
    return y, kc, vc


# ---------------------------------------------------------------------------
# dispatch: solo -> megakernel; vmap -> the proven 3-call path
# ---------------------------------------------------------------------------

def _rebuild_p(layer, w_in, s_in, b_in, wo, so, bo, w1, s1, b1, w2, s2, b2,
               n1, n2):
    dm = n1.shape[-1]
    hidden = w1.shape[-1]

    def lin(w, sc, b, k_logical):
        # packed int4 carries K/2 rows; int8 carries K — same dtype, so
        # the logical contraction dim disambiguates
        if w.dtype == jnp.int8:
            d = {("q4" if w.shape[-2] * 2 == k_logical else "q"): w,
                 "scale": sc, "_layer": layer}
        else:
            d = {"w": w}
        d["b"] = b
        return d

    return {
        "norm1": {"scale": n1[0], "bias": n1[1]},
        "norm2": {"scale": n2[0], "bias": n2[1]},
        "in_proj": lin(w_in, s_in, b_in, dm),
        "out_proj": lin(wo, so, bo, dm),
        "linear1": lin(w1, s1, b1, dm),
        "linear2": lin(w2, s2, b2, hidden),
    }


@functools.lru_cache(maxsize=None)
def _make_megalayer(layer, bits, kvq, block_size, eps, approx, interpret):
    from . import fused_layer
    from .pallas_attn import decode_insert_attention
    from .rope import apply_rope_halves

    def three(x, n1, w_in, s_in, b_in, cos, sin, cur_pos, k_cache, v_cache,
              pos, re_, ws_, wo, so, bo, n2, w1, s1, b1, w2, s2, b2, *ksvs):
        """The proven 3-call path with identical semantics (used under
        vmap, where the separate kernels collapse the batch into rows —
        the megakernel would re-stream weights per stream group)."""
        p = _rebuild_p(layer, w_in, s_in, b_in, wo, so, bo,
                       w1, s1, b1, w2, s2, b2, n1, n2)
        t, dm = x.shape
        hh = n1.shape[-1] // cos.shape[-1] // 2  # heads = dm / (2*half)
        qkv = fused_layer.pre_attention(p, x, eps=eps, interpret=interpret)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rope_halves(q.reshape(t, hh, dm // hh), cos, sin)
        k = apply_rope_halves(k.reshape(t, hh, dm // hh), cos, sin)
        k_rows = k.reshape(t, dm)
        v_rows = v.reshape(t, dm)
        if kvq:
            from ..models.backbone import quantize_rows
            k_scale, v_scale = ksvs
            k_q, k_s = quantize_rows(k_rows)
            v_q, v_s = quantize_rows(v_rows)
            attn, kc, vc, ks, vs = decode_insert_attention(
                q[0], k_q, v_q, cur_pos, k_cache, v_cache, pos, re_, ws_,
                k_scale=k_scale, v_scale=v_scale, ks_new=k_s[0],
                vs_new=v_s[0], block_size=block_size, interpret=interpret)
            extra = (ks, vs)
        else:
            attn, kc, vc = decode_insert_attention(
                q[0], k_rows.astype(k_cache.dtype),
                v_rows.astype(v_cache.dtype), cur_pos, k_cache, v_cache,
                pos, re_, ws_, block_size=block_size, interpret=interpret)
            extra = ()
        y = fused_layer.post_attention(p, x, attn.reshape(t, dm), eps=eps,
                                       approx=approx, interpret=interpret)
        return (y, kc, vc) + extra

    @jax.custom_batching.custom_vmap
    def fn(x, n1, w_in, s_in, b_in, cos, sin, cur_pos, k_cache, v_cache,
           pos, re_, ws_, wo, so, bo, n2, w1, s1, b1, w2, s2, b2, *ksvs):
        cs = jnp.concatenate([
            jnp.concatenate([cos, cos], -1).astype(jnp.float32),
            jnp.concatenate([-sin, sin], -1).astype(jnp.float32)], 0)
        return _megalayer_call(
            x, n1, w_in, s_in, b_in, cs, cur_pos, k_cache, v_cache, pos,
            re_, ws_, wo, so, bo, n2, w1, s1, b1, w2, s2, b2,
            *(ksvs if kvq else ()), layer=layer, bits=bits,
            block_size=block_size, eps=eps, approx=approx,
            interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, *args):
        assert not in_batched[11] and not in_batched[12], \
            "read/write slot cursors must be batch-uniform"

        outs = jax.vmap(
            three,
            in_axes=tuple(0 if b else None for b in in_batched))(*args)
        return outs, tuple(True for _ in outs)

    return fn


def supported(p) -> bool:
    # K-grouped (Q4_0) scales: handled by the fused layer kernels but not
    # by this megakernel's in-step dequant — keep it off there
    from . import fused_layer
    return fused_layer.supported(p) and not any(
        fused_layer.grouped_scales(p[k])
        for k in ("in_proj", "out_proj", "linear1", "linear2"))


def megalayer(p, x, cos, sin, cur_pos, k_cache, v_cache, pos_vec, read_end,
              write_slot, k_scale=None, v_scale=None,
              gelu_approx: bool = False, eps: float = 1e-5,
              interpret: bool = False, block_size: int = None):
    """One whole backbone layer in a single Pallas call (T == 1 decode).

    p: layer params (stacked quantized leaves + static _layer, see
    ops.basic.slice_layer_params); x (1, dm); cos/sin (1, D/2) rope rows;
    cur_pos () the new row's position; caches (S, dm) PRE-insert flat;
    pos_vec (S,) POST-insert; read_end/write_slot as in
    pallas_attn.decode_insert_attention. Returns
    (y (1, dm), k_cache', v_cache'[, k_scale', v_scale']).

    Under vmap the custom rule runs the 3-call path instead (see module
    docstring)."""
    from .fused_layer import _qw
    from .pallas_attn import _pick_block
    w_in, s_in, b_in, bits = _qw(p["in_proj"])
    wo, so, bo, _ = _qw(p["out_proj"])
    w1, s1, b1, _ = _qw(p["linear1"])
    w2, s2, b2, _ = _qw(p["linear2"])
    layer = p["in_proj"].get("_layer", 0)
    if block_size is None:
        block_size = _pick_block(k_cache.shape[-2])
    kvq = k_scale is not None
    dm = x.shape[-1]
    hidden = w1.shape[-1]

    def unit(n):
        return jnp.ones((n,), jnp.float32)

    s_in = s_in if s_in is not None else unit(3 * dm)
    so = so if so is not None else unit(dm)
    s1 = s1 if s1 is not None else unit(hidden)
    s2 = s2 if s2 is not None else unit(dm)
    n1 = jnp.stack([p["norm1"]["scale"], p["norm1"]["bias"]])
    n2 = jnp.stack([p["norm2"]["scale"], p["norm2"]["bias"]])
    z = jnp.zeros((), x.dtype)
    b_in = b_in if b_in is not None else jnp.broadcast_to(z, (3 * dm,))
    bo = bo if bo is not None else jnp.broadcast_to(z, (dm,))
    b1 = b1 if b1 is not None else jnp.broadcast_to(z, (hidden,))
    b2 = b2 if b2 is not None else jnp.broadcast_to(z, (dm,))
    fn = _make_megalayer(layer, bits, kvq, block_size, eps, gelu_approx,
                         interpret)
    args = [x, n1, w_in, s_in, b_in, cos, sin,
            jnp.asarray(cur_pos, jnp.int32), k_cache, v_cache, pos_vec,
            jnp.asarray(read_end, jnp.int32),
            jnp.asarray(write_slot, jnp.int32),
            wo, so, bo, n2, w1, s1, b1, w2, s2, b2]
    if kvq:
        args += [k_scale, v_scale]
    return fn(*args)
