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
