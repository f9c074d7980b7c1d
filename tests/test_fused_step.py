"""Whole-layer megakernel (ops/fused_step.py) vs the 3-call fused path.

Interpret mode on CPU; Mosaic compiles the same code on TPU. Uses
tiny_config(32) (d_model=128): io/quant.py's size gate quantizes all four
linears only at >=128-wide outputs, which the megakernel (like
ops/fused_layer) requires.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import random_params
from pocket_tts_tpu.io.quant import quantize_params
from pocket_tts_tpu.models import backbone
from pocket_tts_tpu.ops import fused_step
from pocket_tts_tpu.ops.basic import slice_layer_params
from pocket_tts_tpu.ops.rope import rope_cos_sin

CFG0 = tiny_config(32)
PARAMS, CFG = random_params(CFG0, seed=3)


def _warm_state(cfgb, pq):
    rng = np.random.RandomState(0)
    x = rng.randn(10, cfgb.d_model).astype(np.float32) * 0.3
    s0 = backbone.init_state(cfgb)
    s0, _ = backbone.forward(pq, cfgb, s0, jnp.array(x))
    s0 = backbone.advance(s0, 10, 10)
    step = rng.randn(1, cfgb.d_model).astype(np.float32) * 0.3
    return s0, jnp.array(step)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("quantize_kv", [False, True])
class TestMegalayer:
    def test_forward_matches_three_call(self, bits, quantize_kv):
        pq = quantize_params(PARAMS, bits=bits)
        cfgb = dataclasses.replace(CFG.backbone, quantize_kv=quantize_kv)
        cfg_ref = dataclasses.replace(cfgb, use_pallas_attn=True,
                                      fuse_insert=True, use_megalayer=False)
        cfg_mega = dataclasses.replace(cfgb, use_pallas_attn=True,
                                       fuse_insert=True, use_megalayer=True)
        s0, step = _warm_state(cfgb, pq)
        sr, y_ref = backbone.forward(pq, cfg_ref, s0, step)
        sm, y_mega = backbone.forward(pq, cfg_mega, s0, step)
        np.testing.assert_allclose(np.asarray(y_mega), np.asarray(y_ref),
                                   atol=5e-5)
        for a, b in zip(sm.k + sm.v, sr.k + sr.v):
            np.testing.assert_allclose(
                np.asarray(a).astype(np.float32),
                np.asarray(b).astype(np.float32), atol=5e-5)

    def test_multistep_matches_xla(self, bits, quantize_kv):
        """5 decode steps carried through the megakernel's aliased caches
        must track the plain XLA path."""
        pq = quantize_params(PARAMS, bits=bits)
        cfgb = dataclasses.replace(CFG.backbone, quantize_kv=quantize_kv)
        cfg_mega = dataclasses.replace(cfgb, use_pallas_attn=True,
                                       fuse_insert=True, use_megalayer=True)
        s0, _ = _warm_state(cfgb, pq)
        rng = np.random.RandomState(7)
        sx, sm = s0, s0
        for i in range(5):
            step = rng.randn(1, cfgb.d_model).astype(np.float32) * 0.3
            sx, yx = backbone.forward(pq, cfgb, sx, jnp.array(step))
            sx = backbone.advance(sx, 1, 1)
            sm, ym = backbone.forward(pq, cfg_mega, sm, jnp.array(step))
            sm = backbone.advance(sm, 1, 1)
            np.testing.assert_allclose(np.asarray(ym), np.asarray(yx),
                                       atol=1e-4, err_msg=f"step {i}")

    def test_vmap_delegates_to_three_call(self, bits, quantize_kv):
        """Under vmap the custom rule runs the batch-collapsing kernels;
        outputs must match the solo megakernel per stream."""
        pq = quantize_params(PARAMS, bits=bits)
        cfgb = dataclasses.replace(CFG.backbone, quantize_kv=quantize_kv)
        s0, step = _warm_state(cfgb, pq)
        lp = slice_layer_params(pq["layers"], 0)
        B = 3
        pos_q = jnp.int32(10)
        cos, sin = rope_cos_sin(jnp.asarray([10], jnp.int32),
                                cfgb.head_dim, cfgb.max_period)
        pv = jax.lax.dynamic_update_slice(
            s0.pos, jnp.asarray([10], jnp.int32), (s0.end,))
        kb = jnp.stack([s0.k[0]] * B)
        vb = jnp.stack([s0.v[0]] * B)
        pvb = jnp.stack([pv] * B)
        xb = jnp.stack([step] * B)
        kw = dict(gelu_approx=False, interpret=True)
        if quantize_kv:
            ksb = jnp.stack([s0.k_scale[0]] * B)
            vsb = jnp.stack([s0.v_scale[0]] * B)
            outs = jax.vmap(
                lambda xx, kk, vv, pp, ks, vs: fused_step.megalayer(
                    lp, xx, cos, sin, pos_q, kk, vv, pp, s0.end, s0.end,
                    k_scale=ks, v_scale=vs, **kw)
            )(xb, kb, vb, pvb, ksb, vsb)
            solo = fused_step.megalayer(
                lp, step, cos, sin, pos_q, s0.k[0], s0.v[0], pv, s0.end,
                s0.end, k_scale=s0.k_scale[0], v_scale=s0.v_scale[0], **kw)
        else:
            outs = jax.vmap(
                lambda xx, kk, vv, pp: fused_step.megalayer(
                    lp, xx, cos, sin, pos_q, kk, vv, pp, s0.end, s0.end,
                    **kw)
            )(xb, kb, vb, pvb)
            solo = fused_step.megalayer(lp, step, cos, sin, pos_q,
                                        s0.k[0], s0.v[0], pv, s0.end,
                                        s0.end, **kw)
        for got, want in zip(outs, solo):
            np.testing.assert_allclose(
                np.asarray(got[0]).astype(np.float32),
                np.asarray(want).astype(np.float32), atol=5e-5)
