"""Fused backbone-layer kernels (interpret mode) vs the unfused quantized
ops — same math, ~10 XLA dispatches per layer collapsed into 2 Pallas
calls (ops/fused_layer.py)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import params_from_flat, random_flat
from pocket_tts_tpu.io.quant import quantize_params
from pocket_tts_tpu.ops import fused_layer
from pocket_tts_tpu.ops.basic import (gelu, layer_norm, linear,
                                      slice_layer_params)

# seed_dims=32 -> d_model 128: wide enough that every backbone linear is
# quantize-eligible (the default tiny config's 64-wide out_proj/linear2
# fall under the stacked-weight N >= 128 rule and stay bf16)
CFG0 = tiny_config(32)
FLAT = random_flat(CFG0, seed=33)
PARAMS, CFG = params_from_flat(FLAT, CFG0)


def _layer_params(bits, l=1, group=0):
    pq = quantize_params(PARAMS, bits=bits, group=group)
    return slice_layer_params(pq["layers"], l)


def _unfused_pre(p, x):
    return linear(p["in_proj"], layer_norm(p["norm1"], x, eps=1e-5))


def _unfused_post(p, x, attn, approx=False):
    x = x + linear(p["out_proj"], attn)
    h = layer_norm(p["norm2"], x, eps=1e-5)
    return x + linear(p["linear2"], gelu(linear(p["linear1"], h), approx))


class TestFusedLayer:
    def test_supported_detection(self):
        # bf16 weights are NOT auto-dispatched (measured 2x slower at B=1:
        # the Mosaic calls serialize the weight stream XLA prefetches);
        # only uniformly quantized layers route to the fused kernels
        assert not fused_layer.supported(
            slice_layer_params(PARAMS["layers"], 0))
        for bits in (8, 4):
            assert fused_layer.supported(_layer_params(bits))
        mixed = dict(_layer_params(8))
        mixed["linear1"] = _layer_params(4)["linear1"]
        assert not fused_layer.supported(mixed)

    def test_bf16_weights_pre_post_match_unfused(self):
        """The bits=16 kernel path stays correct when called directly
        (auto-dispatch excludes it — see fused_layer.supported)."""
        rng = np.random.RandomState(9)
        dm = CFG.backbone.d_model
        p = slice_layer_params(PARAMS["layers"], 1)
        x = jnp.asarray(rng.randn(1, dm).astype(np.float32) * 0.3)
        attn = jnp.asarray(rng.randn(1, dm).astype(np.float32) * 0.3)
        np.testing.assert_allclose(
            np.asarray(fused_layer.pre_attention(p, x, interpret=True)),
            np.asarray(_unfused_pre(p, x)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(fused_layer.post_attention(p, x, attn,
                                                  interpret=True)),
            np.asarray(_unfused_post(p, x, attn)), atol=1e-5)

    def test_pre_attention_matches_unfused(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, CFG.backbone.d_model)
                        .astype(np.float32) * 0.3)
        for bits in (8, 4):
            p = _layer_params(bits)
            want = _unfused_pre(p, x)
            got = fused_layer.pre_attention(p, x, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-4)

    def test_post_attention_matches_unfused(self):
        rng = np.random.RandomState(1)
        dm = CFG.backbone.d_model
        x = jnp.asarray(rng.randn(1, dm).astype(np.float32) * 0.3)
        attn = jnp.asarray(rng.randn(1, dm).astype(np.float32) * 0.3)
        for bits in (8, 4):
            for approx in (False, True):
                p = _layer_params(bits)
                want = _unfused_post(p, x, attn, approx)
                got = fused_layer.post_attention(p, x, attn, approx=approx,
                                                 interpret=True)
                np.testing.assert_allclose(np.asarray(got),
                                           np.asarray(want), atol=1e-4,
                                           err_msg=f"bits={bits}")

    def test_int4_schemes_match_in_fused_kernels(self):
        """Every INT4_SCHEME produces the same pre/post outputs — the
        scheme choice is a pure VPU-cost knob (quant_matmul._int4_dots and
        the W2-as-RHS branch in _post_kernel)."""
        from pocket_tts_tpu.ops import quant_matmul as qm
        rng = np.random.RandomState(7)
        dm = CFG.backbone.d_model
        x = jnp.asarray(rng.randn(1, dm).astype(np.float32) * 0.3)
        attn = jnp.asarray(rng.randn(1, dm).astype(np.float32) * 0.3)
        p = _layer_params(4)
        outs = {}
        for scheme in ("unpack", "rawdot", "rawf32", "rawf32m", "lo8"):
            old = qm.INT4_SCHEME
            qm.INT4_SCHEME = scheme
            # the kernel factories cache on static args only — clear so the
            # scheme flag (read at trace time) takes effect
            fused_layer._make_pre.cache_clear()
            fused_layer._make_post.cache_clear()
            try:
                outs[scheme] = (
                    np.asarray(fused_layer.pre_attention(p, x,
                                                         interpret=True)),
                    np.asarray(fused_layer.post_attention(p, x, attn,
                                                          interpret=True)))
            finally:
                qm.INT4_SCHEME = old
                fused_layer._make_pre.cache_clear()
                fused_layer._make_post.cache_clear()
        for scheme in ("rawdot", "rawf32", "lo8"):
            for got, want in zip(outs[scheme], outs["unpack"]):
                np.testing.assert_allclose(got, want, atol=5e-4,
                                           err_msg=scheme)
        # rawf32m's merged hi dot changes the summation order — equal to
        # dot-rounding level only
        for got, want in zip(outs["rawf32m"], outs["unpack"]):
            np.testing.assert_allclose(got, want, atol=2e-3,
                                       err_msg="rawf32m")

    def test_grouped_scales_supported_and_match(self):
        """K-grouped (Q4_0) scales route through the fused kernels now
        (VERDICT r3 #5): pre/post in interpret mode == the unfused
        grouped-dequant math, at every batch size across the monolithic,
        tiled, and XLA-fallback dispatch tiers."""
        rng = np.random.RandomState(21)
        dm = CFG.backbone.d_model
        p = _layer_params(4, group=32)
        assert fused_layer.grouped_scales(p["in_proj"])
        assert fused_layer.supported(p)
        x1 = jnp.asarray(rng.randn(1, dm).astype(np.float32) * 0.3)
        a1 = jnp.asarray(rng.randn(1, dm).astype(np.float32) * 0.3)
        np.testing.assert_allclose(
            np.asarray(fused_layer.pre_attention(p, x1, interpret=True)),
            np.asarray(_unfused_pre(p, x1)), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(fused_layer.post_attention(p, x1, a1,
                                                  interpret=True)),
            np.asarray(_unfused_post(p, x1, a1)), atol=2e-4)
        for bsz in (8, 96, 512):  # kernel rows, tiled rows, XLA fallback
            xs = jnp.asarray(rng.randn(bsz, 1, dm).astype(np.float32) * .3)
            ats = jnp.asarray(rng.randn(bsz, 1, dm).astype(np.float32) * .3)
            got = jax.vmap(lambda x, a: fused_layer.post_attention(
                p, x, a, interpret=True))(xs, ats)
            want = jax.vmap(lambda x, a: _unfused_post(p, x, a))(xs, ats)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4, err_msg=f"bsz={bsz}")
            gp = jax.vmap(lambda x: fused_layer.pre_attention(
                p, x, interpret=True))(xs)
            wp = jax.vmap(lambda x: _unfused_pre(p, x))(xs)
            np.testing.assert_allclose(np.asarray(gp), np.asarray(wp),
                                       atol=2e-4, err_msg=f"bsz={bsz}")

    def test_grouped_excluded_from_megalayer(self):
        """The megalayer's in-step dequant has no grouped path — grouped
        layouts stay on the 3-call fused kernels (which handle them)."""
        from pocket_tts_tpu.ops import fused_step
        p = _layer_params(4, group=32)
        assert not fused_step.supported(p)

    def test_grouped_bd_bf16_matches(self):
        """The bf16 T==1 grouped path (block-diagonal raw-byte scheme,
        quant_matmul._grouped_bd_acc) == the grouped dequant math at
        bf16-dot rounding level."""
        rng = np.random.RandomState(31)
        dm = CFG.backbone.d_model
        p = _layer_params(4, group=32)
        x1 = jnp.asarray(rng.randn(1, dm) * 0.3).astype(jnp.bfloat16)
        a1 = jnp.asarray(rng.randn(1, dm) * 0.3).astype(jnp.bfloat16)
        got = np.asarray(fused_layer.post_attention(p, x1, a1,
                                                    interpret=True),
                         np.float32)
        want = np.asarray(_unfused_post(p, x1, a1), np.float32)
        np.testing.assert_allclose(got, want, atol=6e-3)
        gp = np.asarray(fused_layer.pre_attention(p, x1, interpret=True),
                        np.float32)
        wp = np.asarray(_unfused_pre(p, x1), np.float32)
        np.testing.assert_allclose(gp, wp, atol=6e-3)

    def test_bilayer_matches_post_then_pre(self):
        """bilayer_post_pre(l, l+1) == post_attention(l) then
        pre_attention(l+1), per-channel and grouped int4."""
        rng = np.random.RandomState(41)
        dm = CFG.backbone.d_model
        for group in (0, 32):
            pq = quantize_params(PARAMS, bits=4, group=group)
            p0 = slice_layer_params(pq["layers"], 0)
            p1 = slice_layer_params(pq["layers"], 1)
            assert fused_layer.bilayer_supported(p0, p1)
            x = jnp.asarray(rng.randn(1, dm) * 0.3).astype(jnp.bfloat16)
            a = jnp.asarray(rng.randn(1, dm) * 0.3).astype(jnp.bfloat16)
            xn, qkv = fused_layer.bilayer_post_pre(p0, p1, x, a,
                                                   interpret=True)
            want_xn = fused_layer.post_attention(p0, x, a, interpret=True)
            want_qkv = fused_layer.pre_attention(p1, want_xn,
                                                 interpret=True)
            np.testing.assert_allclose(
                np.asarray(xn, np.float32), np.asarray(want_xn, np.float32),
                atol=2e-2, err_msg=f"x_next group={group}")
            np.testing.assert_allclose(
                np.asarray(qkv, np.float32),
                np.asarray(want_qkv, np.float32),
                atol=2e-2, err_msg=f"qkv group={group}")

    def test_batched_rows_collapse(self):
        """vmap over streams == per-stream results (rows are independent,
        weights stream once)."""
        rng = np.random.RandomState(2)
        dm = CFG.backbone.d_model
        xs = jnp.asarray(rng.randn(5, 1, dm).astype(np.float32) * 0.3)
        ats = jnp.asarray(rng.randn(5, 1, dm).astype(np.float32) * 0.3)
        p = _layer_params(4)
        got = jax.vmap(lambda x, a: fused_layer.post_attention(
            p, x, a, interpret=True))(xs, ats)
        want = np.stack([np.asarray(fused_layer.post_attention(
            p, xs[i], ats[i], interpret=True)) for i in range(5)])
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_mimi_layer_fused_vs_xla(self):
        """The same kernels serve the mimi transformer (eps=0 norms,
        LayerScale on both branches): quantized pallas-mode forward ==
        the XLA quantized path."""
        from pocket_tts_tpu.config import MimiTransformerConfig
        from pocket_tts_tpu.models import mimi_transformer
        rng = np.random.RandomState(7)
        mt = MimiTransformerConfig(d_model=128, num_heads=2, num_layers=2,
                                   hidden_dim=256, context=40, capacity=48)

        def t(*shape, s=0.15):
            return jnp.asarray(rng.randn(*shape).astype(np.float32) * s)

        layers = {
            "norm1": {"scale": t(2, 128, s=1.0) * 0 + 1.0,
                      "bias": t(2, 128)},
            "in_proj": {"w": t(2, 128, 384)},
            "out_proj": {"w": t(2, 128, 128)},
            "layer_scale_1": {"scale": t(2, 128, s=0.5)},
            "norm2": {"scale": t(2, 128, s=1.0) * 0 + 1.0,
                      "bias": t(2, 128)},
            "linear1": {"w": t(2, 128, 256), "b": t(2, 256)},
            "linear2": {"w": t(2, 256, 128), "b": t(2, 128)},
            "layer_scale_2": {"scale": t(2, 128, s=0.5)},
        }
        for bits in (8, 4):
            pq = {"layers": quantize_params({"layers": layers},
                                            bits=bits)["layers"]}
            cfg_x = dataclasses.replace(mt, use_pallas_attn=False)
            cfg_p = dataclasses.replace(mt, use_pallas_attn=True)
            x = t(16, 128, s=0.3)
            st = mimi_transformer.init_state(mt)
            _, y_x = mimi_transformer.forward(pq, cfg_x, st, x)
            _, y_p = mimi_transformer.forward(pq, cfg_p, st, x)
            np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                       atol=2e-4, err_msg=f"bits={bits}")

    def test_full_decode_step_fused_vs_xla(self):
        """backbone.forward T=1 with use_pallas_attn (interpret; routes the
        fused layer kernels) == the XLA quantized path."""
        from pocket_tts_tpu.models import backbone
        rng = np.random.RandomState(3)
        for bits in (8, 4):
            pq = quantize_params(PARAMS, bits=bits)
            cfg_x = dataclasses.replace(CFG.backbone, use_pallas_attn=False)
            cfg_p = dataclasses.replace(CFG.backbone, use_pallas_attn=True)
            x = rng.randn(10, CFG.backbone.d_model).astype(np.float32) * 0.3
            s = backbone.init_state(cfg_x)
            s, _ = backbone.forward(pq, cfg_x, s, jnp.array(x))
            s = backbone.advance(s, 10, 10)
            step = rng.randn(1, CFG.backbone.d_model).astype(
                np.float32) * 0.3
            _, y_x = backbone.forward(pq, cfg_x, s, jnp.array(step))
            _, y_p = backbone.forward(pq, cfg_p, s, jnp.array(step))
            np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                       atol=2e-4, err_msg=f"bits={bits}")

    def test_large_batch_vmap_rows_tiled(self):
        """Above MAX_FUSED_ROWS collapsed rows the custom_vmap rules
        re-dispatch the kernels ROW-TILED (grid over <=64-row blocks —
        Mosaic's remote compile crashes on the monolithic form at 128
        rows) and still match the unfused math per stream. interpret=True
        runs the tiled kernels themselves on CPU."""
        rng = np.random.RandomState(12)
        dm = CFG.backbone.d_model
        for bsz in (96, 128):  # rows_tile 32 (rb=3) and 64 (rb=2)
            xs = jnp.asarray(rng.randn(bsz, 1, dm).astype(np.float32) * 0.3)
            ats = jnp.asarray(rng.randn(bsz, 1, dm).astype(np.float32) * 0.3)
            for bits in (8, 4):
                p = _layer_params(bits)
                got_pre = jax.vmap(lambda x: fused_layer.pre_attention(
                    p, x, interpret=True))(xs)
                want_pre = jax.vmap(lambda x: _unfused_pre(p, x))(xs)
                np.testing.assert_allclose(np.asarray(got_pre),
                                           np.asarray(want_pre), atol=1e-4,
                                           err_msg=f"pre bits={bits}")
                got_post = jax.vmap(lambda x, a: fused_layer.post_attention(
                    p, x, a, interpret=True))(xs, ats)
                want_post = jax.vmap(lambda x, a: _unfused_post(p, x, a))(
                    xs, ats)
                np.testing.assert_allclose(np.asarray(got_post),
                                           np.asarray(want_post), atol=2e-4,
                                           err_msg=f"post bits={bits}")

    def test_tiled_matches_monolithic_rows(self):
        """The tiled kernels are bit-compatible with per-block monolithic
        calls: rows_tile=32 over 96 rows == three 32-row monolithic calls
        stacked (same LN/accumulation order per block)."""
        rng = np.random.RandomState(13)
        dm = CFG.backbone.d_model
        p = _layer_params(4)
        w, s, b, bits = fused_layer._qw(p["in_proj"])
        if b is None:
            b = fused_layer._zeros_like_bias(w, w.ndim == 3, w.shape[-1])
        layer = p["in_proj"].get("_layer", 0)
        x = jnp.asarray(rng.randn(96, dm).astype(np.float32) * 0.3)
        ns, nb = p["norm1"]["scale"], p["norm1"]["bias"]
        tiled = fused_layer._pre_call(x, ns, nb, w, s, b, layer, bits,
                                      1e-5, True, rows_tile=32)
        mono = jnp.concatenate([
            fused_layer._pre_call(x[i:i + 32], ns, nb, w, s, b, layer,
                                  bits, 1e-5, True) for i in (0, 32, 64)])
        np.testing.assert_array_equal(np.asarray(tiled), np.asarray(mono))

    def test_oversize_batch_vmap_falls_back_to_xla(self):
        """Past the tiled path's 256-row scratch cap (and always off-TPU
        without interpret) the rules take the XLA fallback and still match
        the unfused math per stream."""
        rng = np.random.RandomState(11)
        dm = CFG.backbone.d_model
        # 96 rows interpret=False: off-TPU gate (an accidental kernel
        # dispatch FAILS loudly — pallas tpu lowering errors on CPU).
        # 288 rows interpret=True: the 256-row scratch cap under interpret.
        for bsz, interp in ((fused_layer.MAX_FUSED_ROWS + 32, False),
                            (288, True)):
            self._check_xla_fallback(rng, dm, bsz, interp)

    def _check_xla_fallback(self, rng, dm, bsz, interp):
        xs = jnp.asarray(rng.randn(bsz, 1, dm).astype(np.float32) * 0.3)
        ats = jnp.asarray(rng.randn(bsz, 1, dm).astype(np.float32) * 0.3)
        for bits in (8, 4):
            p = _layer_params(bits)
            got_pre = jax.vmap(lambda x: fused_layer.pre_attention(
                p, x, interpret=interp))(xs)
            want_pre = jax.vmap(lambda x: _unfused_pre(p, x))(xs)
            np.testing.assert_allclose(np.asarray(got_pre),
                                       np.asarray(want_pre), atol=1e-4,
                                       err_msg=f"pre bits={bits}")
            got_post = jax.vmap(lambda x, a: fused_layer.post_attention(
                p, x, a, interpret=interp))(xs, ats)
            want_post = jax.vmap(lambda x, a: _unfused_post(p, x, a))(
                xs, ats)
            np.testing.assert_allclose(np.asarray(got_post),
                                       np.asarray(want_post), atol=2e-4,
                                       err_msg=f"post bits={bits}")
