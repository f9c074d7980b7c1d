"""int8 quantization + params cache tests."""
import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import (params_from_flat, random_flat,
                                      random_voice_prompt)
from pocket_tts_tpu.io.quant import (load_params_cache, quantize_params,
                                     save_params_cache)
from pocket_tts_tpu.ops.basic import linear
from pocket_tts_tpu.runtime.engine import TTSEngine
from pocket_tts_tpu.text.tokenizer import MockTokenizer

CFG0 = tiny_config()
FLAT = random_flat(CFG0, seed=21)
PARAMS, CFG = params_from_flat(FLAT, CFG0)


class TestQuantize:
    def test_linear_int8_close_to_f32(self):
        rng = np.random.RandomState(0)
        w = rng.randn(128, 256).astype(np.float32) * 0.05
        x = rng.randn(4, 128).astype(np.float32)
        p = {"w": jnp.array(w)}
        pq = quantize_params({"lin": p})["lin"]
        assert "q" in pq and pq["q"].dtype == jnp.int8
        y32 = np.asarray(linear(p, jnp.array(x)))
        yq = np.asarray(linear(pq, jnp.array(x)))
        # int8 relative error ~1/127
        err = np.abs(yq - y32).max() / (np.abs(y32).max() + 1e-9)
        assert err < 0.05, err

    def test_stacked_layers_quantized(self):
        pq = quantize_params(PARAMS)
        lay = pq["layers"]["in_proj"]
        assert "q" in lay and lay["q"].ndim == 3
        assert lay["scale"].shape == (CFG.backbone.num_layers,
                                      3 * CFG.backbone.d_model)
        # conv weights untouched
        assert "w" in pq["mimi"]["decoder"]["model_0"]

    def test_quantized_engine_synthesizes(self):
        eng = TTSEngine(params=PARAMS, cfg=CFG, quantize="int8",
                        tokenizer=MockTokenizer(CFG.lut.n_bins))
        voice = random_voice_prompt(CFG, 16)
        pcm = eng.synthesize("A quantized engine still speaks fine.", voice,
                             temp=0.0)
        assert pcm.size > 0 and np.isfinite(pcm).all()

    def test_quantized_close_to_f32_audio(self):
        voice = random_voice_prompt(CFG, 16)
        tok = MockTokenizer(CFG.lut.n_bins)
        e1 = TTSEngine(params=PARAMS, cfg=CFG, tokenizer=tok)
        e2 = TTSEngine(params=PARAMS, cfg=CFG, quantize="int8", tokenizer=tok)
        a = e1.synthesize("Compare audio output closely.", voice, temp=0.0)
        b = e2.synthesize("Compare audio output closely.", voice, temp=0.0)
        assert a.shape == b.shape
        # random tiny model: outputs are small; int8 should track loosely
        assert np.abs(a - b).mean() < 0.05


class TestParamsCache:
    def test_roundtrip_f32(self, tmp_path):
        path = str(tmp_path / "cache.safetensors")
        save_params_cache(PARAMS, path)
        loaded = load_params_cache(path)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            PARAMS, loaded)

    def test_roundtrip_quantized(self, tmp_path):
        pq = quantize_params(PARAMS)
        path = str(tmp_path / "cache_q8.safetensors")
        save_params_cache(pq, path)
        loaded = load_params_cache(path)
        assert loaded["layers"]["in_proj"]["q"].dtype == jnp.int8
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            pq, loaded)

    def test_cached_engine_matches(self, tmp_path):
        path = str(tmp_path / "cache.safetensors")
        tok = MockTokenizer(CFG.lut.n_bins)
        e1 = TTSEngine(params=PARAMS, cfg=CFG, tokenizer=tok)
        e1.save_params_cache(path)
        e2 = TTSEngine.from_params_cache(path, CFG, tokenizer=tok)
        voice = random_voice_prompt(CFG, 16)
        a = e1.synthesize("Cache must be lossless.", voice, temp=0.0)
        b = e2.synthesize("Cache must be lossless.", voice, temp=0.0)
        np.testing.assert_array_equal(a, b)


class TestInt4AndKernels:
    def test_linear_int4_close_to_f32(self):
        rng = np.random.RandomState(3)
        w = rng.randn(128, 256).astype(np.float32) * 0.05
        x = rng.randn(4, 128).astype(np.float32)
        p = {"w": jnp.array(w)}
        pq = quantize_params({"lin": p}, bits=4)["lin"]
        assert "q4" in pq and pq["q4"].shape == (64, 256)
        y32 = np.asarray(linear(p, jnp.array(x)))
        yq = np.asarray(linear(pq, jnp.array(x)))
        err = np.abs(yq - y32).max() / (np.abs(y32).max() + 1e-9)
        assert err < 0.25, err  # 4-bit: coarse but bounded

    def test_pack_unpack_round_trip(self):
        from pocket_tts_tpu.ops.quant_matmul import pack_int4, unpack_int4
        rng = np.random.RandomState(4)
        q = rng.randint(-8, 8, (64, 32))
        u = np.asarray(unpack_int4(jnp.asarray(pack_int4(q))))
        np.testing.assert_array_equal(u, q.astype(np.float32))

    def test_pallas_interpret_matches_xla_dispatch(self):
        """The fused kernels (interpret mode) must equal the XLA fallback,
        including the stacked-layer in-place read path."""
        from pocket_tts_tpu.ops.quant_matmul import (
            int4_matmul_pallas, int8_matmul_pallas, pack_int4)
        rng = np.random.RandomState(5)
        L, K, N = 3, 128, 256
        x = jnp.asarray(rng.randn(2, K).astype(np.float32))
        q = rng.randint(-127, 128, (L, K, N), dtype=np.int8)
        s = rng.rand(L, N).astype(np.float32) * 0.01
        for layer in range(L):
            ref = (np.asarray(x) @ q[layer].astype(np.float32)) * s[layer]
            y = int8_matmul_pallas(x, jnp.asarray(q), jnp.asarray(s),
                                   layer=layer, interpret=True)
            np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
        qi = rng.randint(-8, 8, (L, K, N))
        packed = np.stack([pack_int4(qi[i]) for i in range(L)])
        for layer in range(L):
            ref = (np.asarray(x) @ qi[layer].astype(np.float32)) * s[layer]
            y4 = int4_matmul_pallas(x, jnp.asarray(packed), jnp.asarray(s),
                                    layer=layer, interpret=True)
            np.testing.assert_allclose(np.asarray(y4), ref, atol=1e-4)

    def test_error_report_covers_convs(self):
        """quantization_error_report(convs=True) must include the conv
        chain (qc/qc4/qt/qt4 layouts), errors bounded like the linears —
        the real-weights outlier instrument ab.py dumps."""
        from pocket_tts_tpu.io.quant import quantization_error_report
        rng = np.random.RandomState(8)
        # real-size conv modules (tiny_config's are under the conv-quant
        # size floor) + one linear for the baseline path
        p = {"model_0": {"w": jnp.asarray(                # conv1d
                rng.randn(64, 64, 7).astype(np.float32) * 0.1)},
             "model_2": {"w": jnp.asarray(                # convtr k==2s
                rng.randn(64, 64, 8).astype(np.float32) * 0.1)},
             "lin": {"w": jnp.asarray(
                rng.randn(128, 128).astype(np.float32) * 0.1)}}
        for bits in (4, 8):
            rep = quantization_error_report(p, bits=bits, convs=True)
            assert set(rep) == {"['model_0']['w']", "['model_2']['w']",
                                "['lin']['w']"}, sorted(rep)
            for k, v in rep.items():
                # per-output-channel symmetric quant: max rel error is
                # bounded by half a quant step of the channel max
                assert 0 <= v < (0.12 if bits == 4 else 0.01), (bits, k, v)

    def test_int4_schemes_equivalent(self):
        """The three _int4_dots unpack schemes ('unpack' baseline, 'rawdot'
        3-dot, 'lo8' rowsum-corrected) are algebraically identical; the
        corrections are exact in f32 at int4 magnitudes."""
        from pocket_tts_tpu.ops import quant_matmul as qm
        rng = np.random.RandomState(6)
        K, N = 128, 256
        x = jnp.asarray(rng.randn(4, K).astype(np.float32)
                        ).astype(jnp.bfloat16)
        qi = rng.randint(-8, 8, (K, N))
        packed = jnp.asarray(qm.pack_int4(qi))
        s = jnp.asarray(rng.rand(N).astype(np.float32) * 0.01)
        outs = {}
        # the raw* schemes gate on single-row dispatches — exercise them
        # through a T=1 x as well as the multi-row fallback path
        x1 = x[:1]
        for scheme in ("unpack", "rawdot", "rawf32", "rawf32m", "lo8"):
            old = qm.INT4_SCHEME
            qm.INT4_SCHEME = scheme
            try:
                outs[scheme] = np.asarray(qm.int4_matmul_pallas(
                    x, packed, s, interpret=True), np.float32)
                outs[scheme, 1] = np.asarray(qm.int4_matmul_pallas(
                    x1, packed, s, interpret=True), np.float32)
            finally:
                qm.INT4_SCHEME = old
        ref = ((np.asarray(x, np.float32) @ qi.astype(np.float32))
               * np.asarray(s))
        for scheme, y in outs.items():
            y = y if y.shape == ref.shape else y  # T=1 entries checked below
            err = (np.abs(y - ref[: y.shape[0]]).max()
                   / (np.abs(ref).max() + 1e-9))
            assert err < 5e-3, (scheme, err)  # bf16 input rounding only
        for scheme in ("rawdot", "rawf32", "lo8"):
            np.testing.assert_allclose(outs[scheme], outs["unpack"],
                                       rtol=0, atol=2e-5)
            np.testing.assert_allclose(outs[scheme, 1], outs["unpack", 1],
                                       rtol=0, atol=2e-5)
        # rawf32m merges the hi dots ((x_hi - 16 x_lo) . hi): a different
        # summation order, equal only to dot-rounding level
        np.testing.assert_allclose(outs["rawf32m", 1], outs["unpack", 1],
                                   rtol=0, atol=5e-4)

    def test_slice_layer_params_keeps_quant_stacked(self):
        from pocket_tts_tpu.ops.basic import slice_layer_params
        pq = quantize_params(PARAMS)
        lp = slice_layer_params(pq["layers"], 1)
        assert lp["in_proj"]["_layer"] == 1
        assert lp["in_proj"]["q"].ndim == 3          # still stacked
        assert lp["norm1"]["scale"].ndim == 1        # norms sliced

    def test_int4_engine_synthesizes(self):
        eng = TTSEngine(params=PARAMS, cfg=CFG, quantize="int4",
                        tokenizer=MockTokenizer(CFG.lut.n_bins))
        voice = random_voice_prompt(CFG, 16)
        pcm = eng.synthesize("Four bit weights still speak.", voice,
                             temp=0.0)
        assert pcm.size > 0 and np.isfinite(pcm).all()


class TestGroupedInt4:
    """K-grouped int4 scales (quantize_params group=32 == the reference's
    Q4_0 block granularity, src/loader.h:162-173). The grouped layout is
    for real-weight outliers; fused layer/flow kernels reject it and the
    separate grouped dequant-matmul kernel takes over."""

    def _outlier_w(self, k=128, n=128, seed=11):
        rng = np.random.RandomState(seed)
        w = rng.randn(k, n).astype(np.float32) * 0.05
        w[0] += 4.0          # one in-row outlier per channel: per-channel
        return w             # scales blow the step size for the whole row

    def test_layouts(self):
        w = jnp.asarray(self._outlier_w())
        pq = quantize_params({"lin": {"w": w}}, bits=4, group=32)["lin"]
        assert pq["q4"].shape == (64, 128)
        assert pq["scale"].shape == (4, 128)         # K/group rows
        wl = jnp.asarray(np.stack([self._outlier_w(seed=s)
                                   for s in range(3)]))
        pql = quantize_params({"lin": {"w": wl}}, bits=4, group=32)["lin"]
        assert pql["q4"].shape == (3, 64, 128)
        assert pql["scale"].shape == (3, 4, 128)
        # indivisible group: silent per-channel fallback
        pqf = quantize_params({"lin": {"w": w}}, bits=4, group=48)["lin"]
        assert pqf["scale"].shape == (128,)
        # int8 ignores group
        pq8 = quantize_params({"lin": {"w": w}}, bits=8, group=32)["lin"]
        assert pq8["scale"].shape == (128,)

    def test_grouped_beats_per_channel_on_outliers(self):
        """An in-row outlier coarsens EVERY row's step under per-channel
        scales but only its own 32-row block under grouped scales — the
        output error (rms over a random probe) must drop accordingly."""
        rng = np.random.RandomState(12)
        w = self._outlier_w()
        x = np.asarray(rng.randn(16, 128), np.float32)
        full = x @ w
        outs = {}
        for g in (0, 32):
            pq = quantize_params({"lin": {"w": jnp.asarray(w)}},
                                 bits=4, group=g)["lin"]
            outs[g] = np.asarray(linear(pq, jnp.asarray(x)))
        rms = {g: np.sqrt(((y - full) ** 2).mean()) for g, y in outs.items()}
        assert rms[32] < rms[0] * 0.7, rms

    def test_linear_xla_fallback_matches_dequant(self):
        """_core's grouped branch (CPU path) == explicit numpy dequant."""
        from pocket_tts_tpu.ops.quant_matmul import unpack_int4
        rng = np.random.RandomState(12)
        w = self._outlier_w()
        x = jnp.asarray(rng.randn(4, 128).astype(np.float32))
        pq = quantize_params({"lin": {"w": jnp.asarray(w)}},
                             bits=4, group=32)["lin"]
        deq = (np.asarray(unpack_int4(pq["q4"]))
               * np.repeat(np.asarray(pq["scale"]), 32, axis=0))
        ref = np.asarray(x) @ deq
        got = np.asarray(linear(pq, x))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_pallas_grouped_interpret_matches_xla(self):
        from pocket_tts_tpu.ops.quant_matmul import (int4_matmul_pallas,
                                                     pack_int4, unpack_int4)
        rng = np.random.RandomState(13)
        L, K, N = 3, 128, 256
        x = jnp.asarray(rng.randn(2, K).astype(np.float32))
        qi = rng.randint(-8, 8, (L, K, N))
        packed = np.stack([pack_int4(qi[i]) for i in range(L)])
        s = rng.rand(L, K // 32, N).astype(np.float32) * 0.01
        for layer in range(L):
            deq = qi[layer].astype(np.float32) * np.repeat(s[layer], 32,
                                                           axis=0)
            ref = np.asarray(x) @ deq
            y = int4_matmul_pallas(x, jnp.asarray(packed), jnp.asarray(s),
                                   layer=layer, interpret=True)
            np.testing.assert_allclose(np.asarray(y), ref, atol=2e-3)
        # unstacked entry too
        y0 = int4_matmul_pallas(x, jnp.asarray(packed[0]),
                                jnp.asarray(s[0]), interpret=True)
        ref0 = np.asarray(x) @ (qi[0].astype(np.float32)
                                * np.repeat(s[0], 32, axis=0))
        np.testing.assert_allclose(np.asarray(y0), ref0, atol=2e-3)
        del unpack_int4

    def test_fused_kernels_reject_grouped(self):
        """fused_layer.supported / fused_flow gating must fall back on the
        grouped layout (their kernels assume one scale row)."""
        from pocket_tts_tpu.ops import fused_layer
        pq = quantize_params(PARAMS, bits=4, group=32)
        from pocket_tts_tpu.ops.basic import slice_layer_params
        lp = slice_layer_params(pq["layers"], 0)
        if "q4" in lp["in_proj"]:        # tiny dims may skip some modules
            assert not fused_layer.supported(lp)

    def test_q4_0_engine_synthesizes(self):
        eng = TTSEngine(params=PARAMS, cfg=CFG, quantize="q4_0",
                        tokenizer=MockTokenizer(CFG.lut.n_bins))
        voice = random_voice_prompt(CFG, 16)
        pcm = eng.synthesize("Grouped scales speak too.", voice, temp=0.0)
        assert pcm.size > 0 and np.isfinite(pcm).all()

    def test_grouped_cache_roundtrip(self, tmp_path):
        pq = quantize_params(PARAMS, bits=4, group=32)
        path = str(tmp_path / "cache_q40.safetensors")
        save_params_cache(pq, path)
        loaded = load_params_cache(path)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            pq, loaded)


class TestQuantBatched:
    def test_vmap_collapses_to_rows(self):
        """The custom vmap rule must stack the batch into matmul rows and
        produce exactly the per-stream results (a naive per-stream pallas
        dispatch would also re-read the weights B times)."""
        rng = np.random.RandomState(3)
        w = rng.randn(64, 128).astype(np.float32) * 0.05
        xs = rng.randn(5, 3, 64).astype(np.float32)   # B=5 streams, T=3
        pq = quantize_params({"lin": {"w": jnp.array(w)}})["lin"]
        got = jax.vmap(lambda x: linear(pq, x))(jnp.array(xs))
        want = np.stack([np.asarray(linear(pq, jnp.array(x))) for x in xs])
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_batched_decode_matches_single_quantized(self):
        """Batched int8 decode == per-stream int8 decode (same audio)."""
        from pocket_tts_tpu.models import backbone, mimi, tts
        from pocket_tts_tpu.runtime.batched import (batched_decode_sentence,
                                                    batched_sentence_prefill,
                                                    stack_states)
        pq = quantize_params(PARAMS)
        b, scan = 3, 8
        tok = np.zeros((b, 8), np.int32)
        tok[:, :4] = np.arange(4) + 5
        vs = stack_states([backbone.init_state(CFG.backbone)
                           for _ in range(b)])
        mt = mimi.init_state(CFG.mimi)
        sts = batched_sentence_prefill(pq, CFG, vs, mt, jnp.asarray(tok),
                                       jnp.full((b,), 4, jnp.int32))
        rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(b)])
        _, pcm_b, valid_b = batched_decode_sentence(
            pq, CFG, sts, rngs, jnp.zeros((b,), jnp.float32),
            jnp.full((b,), 2, jnp.int32), jnp.full((b,), 30, jnp.int32),
            scan)
        for i in range(b):
            st1 = tts.jit_sentence_prefill(
                pq, CFG, backbone.init_state(CFG.backbone), mt,
                jnp.asarray(tok[i]), jnp.int32(4))
            _, pcm1, valid1 = tts.jit_decode_sentence(
                pq, CFG, st1, jax.random.PRNGKey(i), jnp.float32(0.0),
                jnp.int32(2), jnp.int32(30), scan)
            np.testing.assert_allclose(np.asarray(pcm_b[i]),
                                       np.asarray(pcm1), atol=2e-5)
            np.testing.assert_array_equal(np.asarray(valid_b[i]),
                                          np.asarray(valid1))


class TestConvQuant:
    """r3: the conv/seanet chain quantizes too (reference policy: quantize
    everything the consuming op allows, src/loader.h:162-173,206-210).
    Each quantized path must equal the SAME conv run with explicitly
    dequantized weights (the quantization error itself is covered by the
    linear tests — here we verify the layouts/plumbing exactly)."""

    def _deq_conv1d(self, pq, cout, cin, k):
        from pocket_tts_tpu.ops.quant_matmul import unpack_int4
        if "qc" in pq:
            wf = np.asarray(pq["qc"], np.float32)
        else:
            wf = np.asarray(unpack_int4(pq["qc4"]))
        wf = wf * np.asarray(pq["scale"])
        return jnp.asarray(wf.reshape(k, cin, cout).transpose(2, 1, 0))

    def _deq_convtr(self, pq, cin, cout, k):
        from pocket_tts_tpu.ops.quant_matmul import unpack_int4
        if "qt" in pq:
            w2 = np.asarray(pq["qt"], np.float32)
        else:
            w2 = np.asarray(unpack_int4(pq["qt4"]))
        w2 = w2 * np.asarray(pq["scale"])
        return jnp.asarray(w2.reshape(cin, k, cout).transpose(0, 2, 1))

    def test_conv1d_quant_matches_dequant(self):
        from pocket_tts_tpu.ops.conv import conv1d, streaming_conv1d
        rng = np.random.RandomState(0)
        cout, cin, k = 256, 128, 3
        w = rng.randn(cout, cin, k).astype(np.float32) * 0.05
        b = rng.randn(cout).astype(np.float32) * 0.01
        x = jnp.asarray(rng.randn(20, cin).astype(np.float32))
        for bits in (8, 4):
            pq = quantize_params(
                {"block_1": {"w": jnp.asarray(w), "b": jnp.asarray(b)}},
                bits=bits, convs=True)["block_1"]
            assert ("qc" in pq) if bits == 8 else ("qc4" in pq)
            ref = conv1d({"w": self._deq_conv1d(pq, cout, cin, k),
                          "b": jnp.asarray(b)}, x)
            got = conv1d(pq, x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4)
            # streaming wrapper derives K from the quantized layout
            prev = jnp.zeros((k - 1, cin), jnp.float32)
            _, ys = streaming_conv1d(pq, prev, x)
            _, yr = streaming_conv1d(
                {"w": self._deq_conv1d(pq, cout, cin, k),
                 "b": jnp.asarray(b)}, prev, x)
            np.testing.assert_allclose(np.asarray(ys), np.asarray(yr),
                                       atol=1e-4)

    def test_streaming_convtr_quant_matches_dequant(self):
        from pocket_tts_tpu.ops.conv import (
            streaming_conv_transpose1d, streaming_conv_transpose1d_blocked)
        rng = np.random.RandomState(1)
        cin, cout, s = 128, 64, 6
        k = 2 * s
        w = rng.randn(cin, cout, k).astype(np.float32) * 0.05
        b = rng.randn(cout).astype(np.float32) * 0.01
        x = jnp.asarray(rng.randn(16, cin).astype(np.float32))
        for bits in (8, 4):
            pq = quantize_params(
                {"model_2": {"w": jnp.asarray(w), "b": jnp.asarray(b)}},
                bits=bits, convs=True)["model_2"]
            assert ("qt" in pq) if bits == 8 else ("qt4" in pq)
            pref = {"w": self._deq_convtr(pq, cin, cout, k),
                    "b": jnp.asarray(b)}
            prev = jnp.zeros((k - s, cout), jnp.float32)
            _, yq = streaming_conv_transpose1d(pq, prev, x, stride=s)
            _, yr = streaming_conv_transpose1d(pref, prev, x, stride=s)
            np.testing.assert_allclose(np.asarray(yq), np.asarray(yr),
                                       atol=1e-4)
            prow = jnp.zeros((1, s * cout), jnp.float32)
            _, ybq = streaming_conv_transpose1d_blocked(pq, prow, x, s)
            _, ybr = streaming_conv_transpose1d_blocked(pref, prow, x, s)
            np.testing.assert_allclose(np.asarray(ybq), np.asarray(ybr),
                                       atol=1e-4)

    def test_quantize_params_conv_policy(self):
        """Big chain convs quantize; the blocked-time tail and tiny convs
        stay full precision."""
        rng = np.random.RandomState(2)
        tree = {"decoder": {
            "model_0": {"w": jnp.asarray(rng.randn(128, 128, 7) * 0.1,
                                         jnp.float32)},
            "model_2": {"w": jnp.asarray(rng.randn(128, 64, 12) * 0.1,
                                         jnp.float32)},
            "model_9": {"block_1": {"w": jnp.asarray(
                rng.randn(32, 64, 3) * 0.1, jnp.float32)}},
            "model_11": {"w": jnp.asarray(rng.randn(1, 64, 3) * 0.1,
                                          jnp.float32)},
        }}
        for bits, ck, tk in ((8, "qc", "qt"), (4, "qc4", "qt4")):
            qt = quantize_params(tree, bits=bits, convs=True)["decoder"]
            assert ck in qt["model_0"] and "w" not in qt["model_0"]
            assert tk in qt["model_2"]
            assert "w" in qt["model_9"]["block_1"]    # blocked tail: bf16
            assert "w" in qt["model_11"]

    def test_quantized_conv_engine_close_to_f32(self):
        """A big-conv model end-to-end: quantized seanet must track the
        f32 audio loosely (int8 noise) — exercises the full decode chain
        through the quantized conv paths."""
        import dataclasses
        from pocket_tts_tpu.config import (MimiConfig, SeanetConfig,
                                           SeanetStage,
                                           MimiTransformerConfig)
        from pocket_tts_tpu.io.params import random_params
        cfg0 = tiny_config()
        # widen seanet past _MIN_CONV_QUANT_SIZE so its convs quantize
        cfg0 = dataclasses.replace(cfg0, mimi=dataclasses.replace(
            cfg0.mimi, dim=128,
            transformer=dataclasses.replace(cfg0.mimi.transformer,
                                            d_model=128),
            seanet=SeanetConfig(
                in_ch=128, stages=(SeanetStage(128, 64, 12, 6),
                                   SeanetStage(64, 32, 10, 5),
                                   SeanetStage(32, 16, 8, 4)))))
        params, cfg = random_params(cfg0, seed=5)
        pq = quantize_params(params, bits=8, convs=True)
        assert "qc" in pq["mimi"]["decoder"]["model_0"]
        assert "qt" in pq["mimi"]["decoder"]["model_2"]
        from pocket_tts_tpu.models import tts
        st0 = tts.init_stream_state(params, cfg)
        stq = tts.init_stream_state(pq, cfg)
        _, p0, v0 = tts.jit_decode_sentence(
            params, cfg, st0, jax.random.PRNGKey(3), jnp.float32(0.0),
            jnp.int32(2), jnp.int32(10), 12)
        _, pcmq, vq = tts.jit_decode_sentence(
            pq, cfg, stq, jax.random.PRNGKey(3), jnp.float32(0.0),
            jnp.int32(2), jnp.int32(10), 12)
        p0, pcmq = np.asarray(p0), np.asarray(pcmq)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(vq))
        denom = np.abs(p0).max() + 1e-9
        assert np.abs(pcmq - p0).max() / denom < 0.2

    def test_pallas_row_padding(self):
        """Row counts that don't tile (the quantized convs feed e.g. 482
        rows) pad up to the tile and slice back."""
        from pocket_tts_tpu.ops.quant_matmul import (int8_matmul_pallas,
                                                     int4_matmul_pallas,
                                                     pack_int4)
        rng = np.random.RandomState(6)
        t, k, n = 300, 128, 256
        x = jnp.asarray(rng.randn(t, k).astype(np.float32))
        q = rng.randint(-127, 128, (k, n), dtype=np.int8)
        s = rng.rand(n).astype(np.float32) * 0.01
        ref = (np.asarray(x) @ q.astype(np.float32)) * s
        y = int8_matmul_pallas(x, jnp.asarray(q), jnp.asarray(s),
                               interpret=True)
        assert y.shape == (t, n)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
        qi = rng.randint(-8, 8, (k, n))
        ref4 = (np.asarray(x) @ qi.astype(np.float32)) * s
        y4 = int4_matmul_pallas(x, jnp.asarray(pack_int4(qi)),
                                jnp.asarray(s), interpret=True)
        np.testing.assert_allclose(np.asarray(y4), ref4, atol=1e-4)


class TestQuantizedKV:
    def _decode(self, cfg, frames=12):
        from pocket_tts_tpu.models import backbone, mimi, tts
        st = tts.init_stream_state(PARAMS, cfg)
        _, pcm, valid = tts.jit_decode_sentence(
            PARAMS, cfg, st, jax.random.PRNGKey(7), jnp.float32(0.0),
            jnp.int32(2), jnp.int32(frames), frames + 4)
        return np.asarray(pcm), np.asarray(valid)

    def test_int8_kv_close_to_f32(self):
        """cfg.quantize_kv int8 cache (XLA dequant path on CPU) tracks the
        full-precision decode within int8 quantization noise."""
        import dataclasses
        cfg_q = dataclasses.replace(
            CFG, backbone=dataclasses.replace(CFG.backbone,
                                              quantize_kv=True))
        pcm0, v0 = self._decode(CFG)
        pcmq, vq = self._decode(cfg_q)
        np.testing.assert_array_equal(v0, vq)
        # per-row absmax int8: relative error ~1/127 compounding through
        # the stack; require close correlation, not bit equality
        denom = np.abs(pcm0).max() + 1e-9
        assert np.abs(pcmq - pcm0).max() / denom < 0.15, \
            np.abs(pcmq - pcm0).max() / denom

    def test_int8_kv_pallas_interpret_matches_xla(self):
        """The Mosaic dequant branch == the XLA dequant fallback."""
        import dataclasses
        from pocket_tts_tpu.models import backbone
        cfgq_x = dataclasses.replace(CFG.backbone, quantize_kv=True,
                                     use_pallas_attn=False)
        cfgq_p = dataclasses.replace(CFG.backbone, quantize_kv=True,
                                     use_pallas_attn=True)
        rng = np.random.RandomState(1)
        x = rng.randn(10, CFG.backbone.d_model).astype(np.float32) * 0.3
        s = backbone.init_state(cfgq_x)
        s, _ = backbone.forward(PARAMS, cfgq_x, s, jnp.array(x))
        s = backbone.advance(s, 10, 10)
        step = rng.randn(1, CFG.backbone.d_model).astype(np.float32) * 0.3
        _, y_x = backbone.forward(PARAMS, cfgq_x, s, jnp.array(step))
        _, y_p = backbone.forward(PARAMS, cfgq_p, s, jnp.array(step))
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                   atol=2e-4)

    def test_mimi_int8_kv_close_to_f32(self):
        """cfg.mimi.transformer.quantize_kv int8 ring cache tracks the
        full-precision decode within int8 quantization noise."""
        import dataclasses
        cfg_q = dataclasses.replace(
            CFG, mimi=dataclasses.replace(
                CFG.mimi, transformer=dataclasses.replace(
                    CFG.mimi.transformer, quantize_kv=True)))
        pcm0, v0 = self._decode(CFG)
        pcmq, vq = self._decode(cfg_q)
        np.testing.assert_array_equal(v0, vq)
        denom = np.abs(pcm0).max() + 1e-9
        assert np.abs(pcmq - pcm0).max() / denom < 0.15, \
            np.abs(pcmq - pcm0).max() / denom

    def test_mimi_int8_kv_pallas_interpret_matches_xla(self):
        """The fused ring kernel's int8 branch == the XLA dequant fallback
        through a ring wrap (capacity 64, 6 frames of 16)."""
        import dataclasses
        from pocket_tts_tpu.models import mimi_transformer
        base = dataclasses.replace(CFG.mimi.transformer, capacity=64,
                                   quantize_kv=True)
        cfg_x = dataclasses.replace(base, use_pallas_attn=False)
        cfg_p = dataclasses.replace(base, use_pallas_attn=True)
        p = PARAMS["mimi"]["decoder_transformer"]
        rng = np.random.RandomState(5)
        s_x = mimi_transformer.init_state(cfg_x)
        s_p = mimi_transformer.init_state(cfg_p)
        for f in range(6):
            x = jnp.asarray(
                rng.randn(16, base.d_model).astype(np.float32) * 0.3)
            s_x, y_x = mimi_transformer.forward(p, cfg_x, s_x, x)
            s_p, y_p = mimi_transformer.forward(p, cfg_p, s_p, x)
            np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                       atol=2e-4, err_msg=f"frame {f}")
        for a, b in zip(s_p.k + s_p.v, s_x.k + s_x.v):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(s_p.k_scale + s_p.v_scale,
                        s_x.k_scale + s_x.v_scale):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)
