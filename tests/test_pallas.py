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

    @pytest.mark.parametrize("b", [1, 4])
    def test_int8_kv_grouped(self, b):
        """int8-cache branch of the kernel, including the multi-stream
        group path (b=4): dequant by per-row scales == attending the
        dequantized cache."""
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
