"""Pallas flash-decode attention kernel vs the XLA sdpa reference.

Runs in interpreter mode on CPU; the same kernel compiles via Mosaic on TPU
(verified on v5e: max |diff| vs sdpa ~1e-3 in bf16, ~1e-7 in f32).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pocket_tts_tpu.ops.attention import pos_cache_bias, sdpa
from pocket_tts_tpu.ops.pallas_attn import decode_attention

S, H, D = 256, 4, 16
BS = 64


def make_case(end, seed=0, holes=True):
    rng = np.random.RandomState(seed)
    k = jnp.asarray(rng.randn(S, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(S, H, D).astype(np.float32))
    q = jnp.asarray(rng.randn(H, D).astype(np.float32))
    pos = np.full(S, -1, np.int32)
    pos[: end + 1] = np.arange(end + 1)
    if holes and end > 20:
        pos[10:15] = -1  # padding holes mid-cache
    return q, k, v, jnp.asarray(pos)


def reference(q, k, v, pos):
    # query position beyond all stored -> bias reduces to validity
    big = jnp.asarray([10 ** 6], jnp.int32)
    return sdpa(q[None], k, v, pos_cache_bias(big, pos))[0]


class TestDecodeAttention:
    @pytest.mark.parametrize("end", [0, 5, 63, 64, 70, 255])
    def test_matches_sdpa(self, end):
        q, k, v, pos = make_case(end)
        got = decode_attention(q, k, v, pos, jnp.int32(end), block_size=BS,
                               interpret=True)
        want = reference(q, k, v, pos)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_ignores_garbage_beyond_end(self):
        """Slots past `end` hold stale data but pos = -1 masks them."""
        q, k, v, pos = make_case(40, holes=False)
        got1 = decode_attention(q, k, v, pos, jnp.int32(40), block_size=BS,
                                interpret=True)
        k2 = k.at[100:].set(999.0)
        got2 = decode_attention(q, k2, v, pos, jnp.int32(40), block_size=BS,
                                interpret=True)
        np.testing.assert_array_equal(np.asarray(got1), np.asarray(got2))

    @pytest.mark.parametrize("b", [4, 8])
    def test_stream_groups(self, b):
        """Batch sizes divisible by the stream group exercise the
        multi-stream-per-grid-step kernel path."""
        cases = [make_case(90, seed=10 + i) for i in range(b)]
        got = jax.vmap(
            lambda q, k, v, p: decode_attention(q, k, v, p, jnp.int32(90),
                                                block_size=BS,
                                                interpret=True)
        )(*[jnp.stack([c[j] for c in cases]) for j in range(4)])
        for i in range(b):
            want = reference(*cases[i])
            np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                       atol=1e-5, err_msg=f"stream {i}")

    @pytest.mark.parametrize("b", [1, 4, 8])
    def test_int8_kv_grouped(self, b):
        """int8-cache branch of the kernel, including the multi-stream
        group paths (b=4 and the int8-only group 8): dequant by per-row
        scales == attending the dequantized cache."""
        rng = np.random.RandomState(33)
        cases = []
        for i in range(b):
            q, k, v, pos = make_case(90, seed=20 + i)
            kf = np.asarray(k.reshape(S, H * D))
            vf = np.asarray(v.reshape(S, H * D))
            ks = np.maximum(np.abs(kf).max(-1) / 127.0, 1e-12)
            vs = np.maximum(np.abs(vf).max(-1) / 127.0, 1e-12)
            kq = np.clip(np.round(kf / ks[:, None]), -127, 127).astype(np.int8)
            vq = np.clip(np.round(vf / vs[:, None]), -127, 127).astype(np.int8)
            cases.append((q, kq, vq, ks.astype(np.float32),
                          vs.astype(np.float32), pos))
        stacked = [jnp.stack([jnp.asarray(c[j]) for c in cases])
                   for j in range(6)]
        got = jax.vmap(
            lambda q, kq, vq, ks, vs, p: decode_attention(
                q, kq, vq, p, jnp.int32(90), block_size=BS,
                k_scale=ks, v_scale=vs, interpret=True)
        )(*stacked)
        for i, (q, kq, vq, ks, vs, pos) in enumerate(cases):
            k_deq = (kq.astype(np.float32) * ks[:, None]).reshape(S, H, D)
            v_deq = (vq.astype(np.float32) * vs[:, None]).reshape(S, H, D)
            want = reference(q, jnp.asarray(k_deq), jnp.asarray(v_deq), pos)
            np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                       atol=1e-4, err_msg=f"stream {i}")

    def test_vmap_batched(self):
        b = 3
        cases = [make_case(90, seed=i) for i in range(b)]
        qb = jnp.stack([c[0] for c in cases])
        kb = jnp.stack([c[1] for c in cases])
        vb = jnp.stack([c[2] for c in cases])
        pb = jnp.stack([c[3] for c in cases])
        got = jax.vmap(
            lambda q, k, v, p: decode_attention(q, k, v, p, jnp.int32(90),
                                                block_size=BS,
                                                interpret=True)
        )(qb, kb, vb, pb)
        for i in range(b):
            want = reference(cases[i][0], cases[i][1], cases[i][2],
                             cases[i][3])
            np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                       atol=1e-5, err_msg=f"stream {i}")

    def test_backbone_pallas_matches_xla(self):
        """Full backbone decode step with use_pallas_attn (interpret) must
        match the XLA path."""
        from pocket_tts_tpu.config import tiny_config
        from pocket_tts_tpu.io.params import random_params
        from pocket_tts_tpu.models import backbone

        cfg0 = tiny_config()
        params, cfg = random_params(cfg0, seed=3)
        cfgp = dataclasses.replace(
            cfg.backbone, use_pallas_attn=True)

        rng = np.random.RandomState(0)
        x = rng.randn(10, cfg.backbone.d_model).astype(np.float32) * 0.3
        s1 = backbone.init_state(cfg.backbone)
        s1, _ = backbone.forward(params, cfg.backbone, s1, jnp.array(x))
        s1 = backbone.advance(s1, 10, 10)
        s2 = s1

        step = rng.randn(1, cfg.backbone.d_model).astype(np.float32) * 0.3
        _, y_xla = backbone.forward(params, cfg.backbone, s1, jnp.array(step))
        _, y_pal = backbone.forward(params, cfgp, s2, jnp.array(step))
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla),
                                   atol=1e-4)


class TestDecodeInsertAttention:
    """Fused KV-insert + flash decode (decode_insert_attention) vs
    DUS-then-attend: same attention output AND byte-identical cache
    updates, in linear and ring (stale write slot) modes, solo/vmapped,
    bf16-style and int8-KV."""

    def _case(self, end, seed=0):
        r = np.random.RandomState(seed)
        k = jnp.asarray(r.randn(S, H * D).astype(np.float32))
        v = jnp.asarray(r.randn(S, H * D).astype(np.float32))
        q = jnp.asarray(r.randn(H, D).astype(np.float32))
        kn = jnp.asarray(r.randn(1, H * D).astype(np.float32))
        vn = jnp.asarray(r.randn(1, H * D).astype(np.float32))
        pos = np.full(S, -1, np.int32)
        pos[:end] = np.arange(end)
        pos[end] = end                       # post-insert position row
        return q, kn, vn, k, v, jnp.asarray(pos)

    def _ref(self, q, kn, vn, k, v, pos, end):
        k2 = jax.lax.dynamic_update_slice(k, kn, (end, 0))
        v2 = jax.lax.dynamic_update_slice(v, vn, (end, 0))
        big = jnp.asarray([10 ** 6], jnp.int32)
        out = sdpa(q[None], k2.reshape(S, H, D), v2.reshape(S, H, D),
                   pos_cache_bias(big, pos))[0]
        return out, k2, v2

    @pytest.mark.parametrize("end", [0, 5, 63, 64, 70, 255])
    def test_matches_dus_then_attend(self, end):
        from pocket_tts_tpu.ops.pallas_attn import decode_insert_attention
        q, kn, vn, k, v, pos = self._case(end, seed=end)
        want, k2, v2 = self._ref(q, kn, vn, k, v, pos, end)
        got, kc, vc = decode_insert_attention(
            q, kn, vn, jnp.int32(end), k, v, pos, jnp.int32(end),
            jnp.int32(end), block_size=BS, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(kc), np.asarray(k2))
        np.testing.assert_array_equal(np.asarray(vc), np.asarray(v2))

    def test_ring_mode_stale_slot(self):
        """Write slot mid-cache holds stale bytes (ring recycling): they
        must be excluded and the new row merged analytically."""
        from pocket_tts_tpu.ops.pallas_attn import decode_insert_attention
        end = 100
        q, kn, vn, k, v, _ = self._case(end, seed=77)
        pos = jnp.asarray(np.arange(S, dtype=np.int32)).at[end].set(500)
        want, k2, v2 = self._ref(q, kn, vn, k, v, pos, end)
        got, kc, vc = decode_insert_attention(
            q, kn, vn, jnp.int32(500), k, v, pos, jnp.int32(S - 1),
            jnp.int32(end), block_size=BS, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(kc), np.asarray(k2))

    def test_invalid_row_not_attended(self):
        """cur_pos = -1 (padding step): the new row's bytes land in the
        cache (like the DUS did) but must not contribute to attention."""
        from pocket_tts_tpu.ops.pallas_attn import decode_insert_attention
        end = 40
        q, kn, vn, k, v, pos = self._case(end, seed=5)
        pos = pos.at[end].set(-1)
        big = jnp.asarray([10 ** 6], jnp.int32)
        want = sdpa(q[None], k.reshape(S, H, D), v.reshape(S, H, D),
                    pos_cache_bias(big, pos))[0]
        got, kc, _ = decode_insert_attention(
            q, kn, vn, jnp.int32(-1), k, v, pos, jnp.int32(end),
            jnp.int32(end), block_size=BS, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(kc[end]), np.asarray(kn[0]))

    @pytest.mark.parametrize("b", [4])
    def test_vmapped_groups(self, b):
        from pocket_tts_tpu.ops.pallas_attn import decode_insert_attention
        cases = [self._case(90, seed=10 + i) for i in range(b)]
        stk = [jnp.stack([c[j] for c in cases]) for j in range(6)]
        got = jax.vmap(
            lambda q, kn, vn, k, v, p: decode_insert_attention(
                q, kn, vn, jnp.int32(90), k, v, p, jnp.int32(90),
                jnp.int32(90), block_size=BS, interpret=True)
        )(*stk)
        for i in range(b):
            want, k2, v2 = self._ref(*cases[i], 90)
            np.testing.assert_allclose(np.asarray(got[0][i]),
                                       np.asarray(want), atol=1e-5,
                                       err_msg=f"stream {i}")
            np.testing.assert_array_equal(np.asarray(got[1][i]),
                                          np.asarray(k2))
            np.testing.assert_array_equal(np.asarray(got[2][i]),
                                          np.asarray(v2))

    @pytest.mark.parametrize("b", [1, 4, 8])
    def test_int8_kv(self, b):
        """int8 caches (incl. the int8-only group-8 path at b=8):
        pre-quantized new rows + scale-row updates must land
        byte-identically and attend like the dequantized DUS path."""
        from pocket_tts_tpu.ops.pallas_attn import decode_insert_attention
        end = 90
        cases = []
        for i in range(b):
            qx, knx, vnx, kx, vx, posx = self._case(end, seed=30 + i)
            kf, vf = np.asarray(kx), np.asarray(vx)
            ks = np.maximum(np.abs(kf).max(-1) / 127.0,
                            1e-12).astype(np.float32)
            vs = np.maximum(np.abs(vf).max(-1) / 127.0,
                            1e-12).astype(np.float32)
            kq = np.clip(np.round(kf / ks[:, None]), -127,
                         127).astype(np.int8)
            vq = np.clip(np.round(vf / vs[:, None]), -127,
                         127).astype(np.int8)
            knf, vnf = np.asarray(knx), np.asarray(vnx)
            ksn = np.float32(max(np.abs(knf).max() / 127.0, 1e-12))
            vsn = np.float32(max(np.abs(vnf).max() / 127.0, 1e-12))
            knq = np.clip(np.round(knf / ksn), -127, 127).astype(np.int8)
            vnq = np.clip(np.round(vnf / vsn), -127, 127).astype(np.int8)
            cases.append((qx, knq, vnq, kq, vq, ks, vs, ksn, vsn, posx))

        def one(qx, knq, vnq, kq, vq, ks, vs, ksn, vsn, posx):
            return decode_insert_attention(
                qx, knq, vnq, jnp.int32(end), kq, vq, posx, jnp.int32(end),
                jnp.int32(end), k_scale=ks, v_scale=vs, ks_new=ksn,
                vs_new=vsn, block_size=BS, interpret=True)

        if b == 1:
            outs = [o[None] for o in one(*[jnp.asarray(x)
                                           for x in cases[0]])]
        else:
            stk = [jnp.stack([jnp.asarray(c[j]) for c in cases])
                   for j in range(10)]
            outs = jax.vmap(one)(*stk)
        for i, c in enumerate(cases):
            qx, knq, vnq, kq, vq, ks, vs, ksn, vsn, posx = c
            kq2 = np.concatenate([kq[:end], knq, kq[end + 1:]], 0)
            vq2 = np.concatenate([vq[:end], vnq, vq[end + 1:]], 0)
            ks2 = np.concatenate([ks[:end], [ksn], ks[end + 1:]], 0)
            vs2 = np.concatenate([vs[:end], [vsn], vs[end + 1:]], 0)
            k_deq = (kq2.astype(np.float32) * ks2[:, None]).reshape(S, H, D)
            v_deq = (vq2.astype(np.float32) * vs2[:, None]).reshape(S, H, D)
            big = jnp.asarray([10 ** 6], jnp.int32)
            want = sdpa(jnp.asarray(qx)[None], jnp.asarray(k_deq),
                        jnp.asarray(v_deq), pos_cache_bias(big, posx))[0]
            np.testing.assert_allclose(np.asarray(outs[0][i]),
                                       np.asarray(want), atol=1e-4,
                                       err_msg=f"stream {i}")
            np.testing.assert_array_equal(np.asarray(outs[1][i]), kq2)
            np.testing.assert_array_equal(np.asarray(outs[2][i]), vq2)
            np.testing.assert_allclose(np.asarray(outs[3][i]), ks2,
                                       atol=1e-7)
            np.testing.assert_allclose(np.asarray(outs[4][i]), vs2,
                                       atol=1e-7)

    def test_backbone_fused_insert_matches_dus(self):
        """Full backbone decode: fuse_insert=True == fuse_insert=False
        (both on the interpret Pallas kernel) == the XLA path."""
        from pocket_tts_tpu.config import tiny_config
        from pocket_tts_tpu.io.params import random_params
        from pocket_tts_tpu.models import backbone

        cfg0 = tiny_config()
        params, cfg = random_params(cfg0, seed=3)
        cfg_fuse = dataclasses.replace(cfg.backbone, use_pallas_attn=True,
                                       fuse_insert=True)
        cfg_dus = dataclasses.replace(cfg.backbone, use_pallas_attn=True,
                                      fuse_insert=False)

        rng = np.random.RandomState(0)
        x = rng.randn(10, cfg.backbone.d_model).astype(np.float32) * 0.3
        s0 = backbone.init_state(cfg.backbone)
        s0, _ = backbone.forward(params, cfg.backbone, s0, jnp.array(x))
        s0 = backbone.advance(s0, 10, 10)

        step = rng.randn(1, cfg.backbone.d_model).astype(np.float32) * 0.3
        sf, y_fuse = backbone.forward(params, cfg_fuse, s0,
                                      jnp.array(step))
        sd, y_dus = backbone.forward(params, cfg_dus, s0, jnp.array(step))
        np.testing.assert_allclose(np.asarray(y_fuse), np.asarray(y_dus),
                                   atol=1e-5)
        # caches match to fp rounding: the analytic new-row merge sums in
        # a different order than the blocked dot, so layer l>0 inputs (and
        # hence their inserted rows) differ in the last ulp
        for a, b in zip(sf.k + sf.v, sd.k + sd.v):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestMimiRingKernel:
    """Fused ring insert+attention (ops/pallas_mimi.py) vs the XLA path."""

    def _xla_step(self, q, k, v, kc, vc, offset, start, ctx):
        from pocket_tts_tpu.ops.attention import (cache_insert_ring,
                                                  ring_cache_bias, sdpa_seg)
        t, h, d = q.shape
        kc2 = cache_insert_ring(kc, k.reshape(t, h * d), offset)
        vc2 = cache_insert_ring(vc, v.reshape(t, h * d), offset)
        bias = ring_cache_bias(t, kc.shape[0], offset, ctx, start=start)
        return sdpa_seg(q, kc2, vc2, bias), kc2, vc2

    @pytest.mark.parametrize("frames", [1, 5, 9])
    def test_matches_xla_over_frames(self, frames):
        from pocket_tts_tpu.ops.pallas_mimi import ring_insert_attention
        t, h, d, cap, ctx = 16, 2, 16, 48, 40
        hd = h * d
        rng = np.random.RandomState(11)
        kc_x = jnp.zeros((cap, hd))
        vc_x = jnp.zeros((cap, hd))
        kc_p = jnp.zeros((cap, hd))
        vc_p = jnp.zeros((cap, hd))
        for f in range(frames):
            off = jnp.int32(f * t)
            q = jnp.asarray(rng.randn(t, h, d).astype(np.float32))
            k = jnp.asarray(rng.randn(t, h, d).astype(np.float32))
            v = jnp.asarray(rng.randn(t, h, d).astype(np.float32))
            want, kc_x, vc_x = self._xla_step(q, k, v, kc_x, vc_x, off,
                                              0, ctx)
            got, kc_p, vc_p = ring_insert_attention(
                q.reshape(t, hd), k.reshape(t, hd), v.reshape(t, hd),
                kc_p, vc_p, off, jnp.int32(0), num_heads=h, context=ctx,
                interpret=True)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(want.reshape(t, hd)),
                                       atol=1e-5, err_msg=f"frame {f}")
            np.testing.assert_allclose(np.asarray(kc_p), np.asarray(kc_x),
                                       atol=1e-6)

    @pytest.mark.parametrize("b", [3, 4])
    def test_vmap_with_starts(self, b):
        """Batched (incl. the group path at b=4) with per-stream starts —
        the continuous-batching fence."""
        from pocket_tts_tpu.ops.pallas_mimi import ring_insert_attention
        t, h, d, cap, ctx = 8, 2, 16, 48, 40
        hd = h * d
        rng = np.random.RandomState(7)
        off = jnp.int32(24)
        starts = jnp.asarray([0, 8, 16, 8][:b], jnp.int32)
        q = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
        kc = jnp.asarray(rng.randn(b, cap, hd).astype(np.float32))
        vc = jnp.asarray(rng.randn(b, cap, hd).astype(np.float32))
        got = jax.vmap(
            lambda q1, k1, v1, kc1, vc1, s1: ring_insert_attention(
                q1.reshape(t, hd), k1.reshape(t, hd), v1.reshape(t, hd),
                kc1, vc1, off, s1, num_heads=h, context=ctx,
                interpret=True)[0]
        )(q, k, v, kc, vc, starts)
        for i in range(b):
            want, _, _ = self._xla_step(q[i], k[i], v[i], kc[i], vc[i],
                                        off, int(starts[i]), ctx)
            np.testing.assert_allclose(np.asarray(got[i]),
                                       np.asarray(want.reshape(t, hd)),
                                       atol=1e-5, err_msg=f"stream {i}")

    def _xla_quant_step(self, q, kq, vq, ks, vs, kc, vc, ksc, vsc,
                        offset, start, ctx):
        """int8-KV XLA reference: ring-insert pre-quantized rows + scale
        rows, dequantize in full (mimi_transformer._layer's fallback)."""
        from pocket_tts_tpu.ops.attention import (cache_insert_ring,
                                                  ring_cache_bias, sdpa_seg)
        t, h, d = q.shape
        kc2 = cache_insert_ring(kc, kq.reshape(t, h * d), offset)
        vc2 = cache_insert_ring(vc, vq.reshape(t, h * d), offset)
        ksc2 = cache_insert_ring(ksc, ks, offset)
        vsc2 = cache_insert_ring(vsc, vs, offset)
        k_deq = kc2.astype(jnp.float32) * ksc2[:, None]
        v_deq = vc2.astype(jnp.float32) * vsc2[:, None]
        bias = ring_cache_bias(t, kc.shape[0], offset, ctx, start=start)
        return sdpa_seg(q, k_deq, v_deq, bias), kc2, vc2, ksc2, vsc2

    @pytest.mark.parametrize("frames", [1, 3, 6])
    def test_quant_matches_xla_over_frames(self, frames):
        """int8-KV kernel path (aligned-window insert + in-kernel scale
        folding) == the XLA dequant fallback, through ring wrap (cap=64,
        6 frames of 16 wraps once)."""
        from pocket_tts_tpu.models.backbone import quantize_rows
        from pocket_tts_tpu.ops.pallas_mimi import ring_insert_attention
        t, h, d, cap, ctx = 16, 2, 16, 64, 40
        hd = h * d
        rng = np.random.RandomState(13)
        kc_x = jnp.zeros((cap, hd), jnp.int8)
        vc_x = jnp.zeros((cap, hd), jnp.int8)
        ks_x = jnp.zeros((cap,), jnp.float32)
        vs_x = jnp.zeros((cap,), jnp.float32)
        kc_p, vc_p, ks_p, vs_p = kc_x, vc_x, ks_x, vs_x
        for f in range(frames):
            off = jnp.int32(f * t)
            q = jnp.asarray(rng.randn(t, h, d).astype(np.float32))
            k = jnp.asarray(rng.randn(t, hd).astype(np.float32))
            v = jnp.asarray(rng.randn(t, hd).astype(np.float32))
            kq, ks = quantize_rows(k)
            vq, vs = quantize_rows(v)
            want, kc_x, vc_x, ks_x, vs_x = self._xla_quant_step(
                q, kq, vq, ks, vs, kc_x, vc_x, ks_x, vs_x, off, 0, ctx)
            got, kc_p, vc_p, ks_p, vs_p = ring_insert_attention(
                q.reshape(t, hd), kq, vq, kc_p, vc_p, off, jnp.int32(0),
                num_heads=h, context=ctx, interpret=True,
                ks_new=ks, vs_new=vs, k_scale=ks_p, v_scale=vs_p)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(want.reshape(t, hd)),
                                       atol=1e-5, err_msg=f"frame {f}")
            np.testing.assert_array_equal(np.asarray(kc_p),
                                          np.asarray(kc_x))
            np.testing.assert_array_equal(np.asarray(vc_p),
                                          np.asarray(vc_x))
            np.testing.assert_allclose(np.asarray(ks_p), np.asarray(ks_x),
                                       atol=0)
            np.testing.assert_allclose(np.asarray(vs_p), np.asarray(vs_x),
                                       atol=0)

    @pytest.mark.parametrize("b", [3, 4, 8])
    def test_quant_vmap_with_starts(self, b):
        """Batched int8-KV (incl. the group paths at b=4/8) with per-stream
        starts; t=16 exercises the sh=16 half of the 32-row window."""
        from pocket_tts_tpu.models.backbone import quantize_rows
        from pocket_tts_tpu.ops.pallas_mimi import ring_insert_attention
        t, h, d, cap, ctx = 16, 2, 16, 64, 40
        hd = h * d
        rng = np.random.RandomState(17)
        off = jnp.int32(48)  # slot0 = 48 -> window [32, 64), sh = 16
        starts = jnp.asarray([0, 16, 32, 16, 8, 0, 32, 24][:b], jnp.int32)
        q = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, t, hd).astype(np.float32))
        v = jnp.asarray(rng.randn(b, t, hd).astype(np.float32))
        kq, ks = jax.vmap(quantize_rows)(k)
        vq, vs = jax.vmap(quantize_rows)(v)
        kc = jnp.asarray(
            rng.randint(-127, 128, (b, cap, hd)).astype(np.int8))
        vc = jnp.asarray(
            rng.randint(-127, 128, (b, cap, hd)).astype(np.int8))
        ksc = jnp.asarray(rng.rand(b, cap).astype(np.float32)) * 0.02
        vsc = jnp.asarray(rng.rand(b, cap).astype(np.float32)) * 0.02
        outs = jax.vmap(
            lambda q1, kq1, vq1, ks1, vs1, kc1, vc1, ksc1, vsc1, s1:
            ring_insert_attention(
                q1.reshape(t, hd), kq1, vq1, kc1, vc1, off, s1,
                num_heads=h, context=ctx, interpret=True,
                ks_new=ks1, vs_new=vs1, k_scale=ksc1, v_scale=vsc1)
        )(q, kq, vq, ks, vs, kc, vc, ksc, vsc, starts)
        for i in range(b):
            want, kc2, vc2, ks2, vs2 = self._xla_quant_step(
                q[i], kq[i], vq[i], ks[i], vs[i], kc[i], vc[i],
                ksc[i], vsc[i], off, int(starts[i]), ctx)
            np.testing.assert_allclose(np.asarray(outs[0][i]),
                                       np.asarray(want.reshape(t, hd)),
                                       atol=1e-5, err_msg=f"stream {i}")
            np.testing.assert_array_equal(np.asarray(outs[1][i]),
                                          np.asarray(kc2))
            np.testing.assert_array_equal(np.asarray(outs[2][i]),
                                          np.asarray(vc2))
            np.testing.assert_allclose(np.asarray(outs[3][i]),
                                       np.asarray(ks2), atol=0)
            np.testing.assert_allclose(np.asarray(outs[4][i]),
                                       np.asarray(vs2), atol=0)
