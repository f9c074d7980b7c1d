"""End-to-end tests: loader round-trip, engine synthesis, streaming == scan
decode, determinism, wav I/O."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import (params_from_flat, random_flat,
                                      random_voice_prompt)
from pocket_tts_tpu.io.safetensors_io import (load_safetensors,
                                              save_safetensors)
from pocket_tts_tpu.io.wav import load_wav, save_wav
from pocket_tts_tpu.runtime.engine import TTSEngine
from pocket_tts_tpu.text.tokenizer import MockTokenizer

CFG0 = tiny_config()
FLAT = random_flat(CFG0, seed=11)
PARAMS, CFG = params_from_flat(FLAT, CFG0)


def make_engine(seed=0):
    return TTSEngine(params=PARAMS, cfg=CFG, seed=seed,
                     tokenizer=MockTokenizer(CFG.lut.n_bins))


class TestLoader:
    def test_safetensors_roundtrip(self, tmp_path):
        path = str(tmp_path / "ckpt.safetensors")
        save_safetensors(FLAT, path)
        loaded = load_safetensors(path)
        assert set(loaded) == set(FLAT)
        for k in FLAT:
            np.testing.assert_array_equal(np.asarray(loaded[k]), FLAT[k])

    def test_params_from_file_match_direct(self, tmp_path):
        path = str(tmp_path / "ckpt.safetensors")
        save_safetensors(FLAT, path)
        from pocket_tts_tpu.io.params import load_checkpoint
        p2, cfg2 = load_checkpoint(path, CFG0)
        assert cfg2 == CFG
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b), atol=1e-6),
            PARAMS, p2)

    def test_config_inference(self):
        assert CFG.latent_dim == CFG0.latent_dim
        assert CFG.backbone.num_layers == CFG0.backbone.num_layers
        assert CFG.flow.depth == CFG0.flow.depth

    def test_bf16_checkpoint_loads(self, tmp_path):
        import ml_dtypes
        half = {k: v.astype(ml_dtypes.bfloat16) for k, v in FLAT.items()}
        path = str(tmp_path / "bf16.safetensors")
        save_safetensors(half, path)
        loaded = load_safetensors(path)
        assert loaded["flow_lm.bos_emb"].dtype == ml_dtypes.bfloat16
        p2, _ = params_from_flat(loaded, CFG0)
        assert p2["bos_emb"].dtype == jnp.float32


class TestSynthesis:
    def test_synthesize_emits_whole_frames(self):
        eng = make_engine()
        voice = random_voice_prompt(CFG, 16)
        pcm = eng.synthesize("Good morning everyone, this is a test.", voice,
                             temp=0.7)
        assert pcm.size > 0 and pcm.size % CFG.mimi.frame_size == 0
        assert np.isfinite(pcm).all()

    def test_same_seed_same_audio(self):
        voice = random_voice_prompt(CFG, 16)
        a = make_engine(seed=3).synthesize("Hello there my friend.", voice)
        b = make_engine(seed=3).synthesize("Hello there my friend.", voice)
        np.testing.assert_array_equal(a, b)

    def test_different_seed_different_audio(self):
        voice = random_voice_prompt(CFG, 16)
        a = make_engine(seed=3).synthesize("Hello there my friend.", voice,
                                           temp=1.0)
        b = make_engine(seed=4).synthesize("Hello there my friend.", voice,
                                           temp=1.0)
        assert not np.array_equal(a, b)

    def test_temp0_ignores_seed(self):
        # temperature 0 -> zero noise -> deterministic across seeds
        # (ref --bench semantics, demos/pocket-tts.cpp:230-236)
        voice = random_voice_prompt(CFG, 16)
        a = make_engine(seed=3).synthesize("Hello there my friend.", voice,
                                           temp=0.0)
        b = make_engine(seed=9).synthesize("Hello there my friend.", voice,
                                           temp=0.0)
        np.testing.assert_array_equal(a, b)

    def test_streaming_matches_offline_scan(self):
        """Frame-at-a-time streaming must produce exactly the scan output."""
        text = "Streaming and offline must agree."
        voice = random_voice_prompt(CFG, 16)

        eng1 = make_engine(seed=5)
        vstate = eng1.prime_voice(voice)
        from pocket_tts_tpu.text.preprocess import prepare_text_prompt
        # streaming path normalizes via StrProcessor; feed the normalized
        # sentence so both paths tokenize the same string
        stream = eng1.open_stream(voice, temp=0.8)
        stream.send(text)
        stream.flush()
        frames = []
        while True:
            f = stream.receive()
            if f is None:
                break
            frames.append(f)
        got = np.concatenate(frames)

        eng2 = make_engine(seed=5)
        eng2._sentence_counter = 1  # match stream's rng (voice prime used 0)
        # StrProcessor leaves the text unchanged here (already normalized)
        want = eng2.synthesize_sentence(eng2.prime_voice(voice), text,
                                        temp=0.8, frames_after_eos=3)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_wav_roundtrip(self, tmp_path):
        pcm = np.sin(np.linspace(0, 100, 4800)).astype(np.float32) * 0.5
        path = str(tmp_path / "x.wav")
        save_wav(path, pcm, 24000)
        loaded, sr = load_wav(path)
        assert sr == 24000
        np.testing.assert_allclose(loaded / 32767.0, pcm, atol=1e-4)

    def test_synthesize_to_wav(self, tmp_path):
        eng = make_engine()
        voice = random_voice_prompt(CFG, 16)
        path = str(tmp_path / "out.wav")
        pcm = eng.synthesize_to_wav("Quick test sentence here.", voice, path)
        loaded, sr = load_wav(path)
        assert sr == CFG.mimi.sample_rate
        assert loaded.size == pcm.size


class TestEos:
    def test_eos_stops_generation(self):
        """Force the EOS head to fire immediately; only frames_after_eos + 1
        frames should be emitted (ref: src/pocket_tts.cpp:462-467)."""
        flat = dict(FLAT)
        flat["flow_lm.out_eos.bias"] = np.full((1,), 10.0, np.float32)
        p_eos, cfg = params_from_flat(flat, CFG0)
        eng = TTSEngine(params=p_eos, cfg=cfg,
                        tokenizer=MockTokenizer(cfg.lut.n_bins))
        voice = random_voice_prompt(cfg, 16)
        pcm = eng.synthesize("This should stop early immediately okay.",
                             voice, temp=0.0)
        # eos at step 0 -> frames 0..frames_after_eos-1 emitted... plus the
        # eos frame itself: total = frames_after_eos (guess 1 + 2 = 3)
        assert pcm.size == 3 * cfg.mimi.frame_size

    def test_no_eos_runs_to_max(self):
        eng = make_engine()  # out_eos bias -6 -> never EOS
        voice = random_voice_prompt(CFG, 16)
        text = "One two three."
        pcm = eng.synthesize(text, voice, temp=0.0)
        from pocket_tts_tpu.text.preprocess import (count_words,
                                                    prepare_text_prompt)
        prepared, _ = prepare_text_prompt(text)
        max_steps = int((count_words(prepared) + 2) * CFG.mimi.frame_rate)
        assert pcm.size == max_steps * CFG.mimi.frame_size
