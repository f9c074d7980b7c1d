"""Multi-stream server + early-exit decode tests."""
import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import (params_from_flat, random_flat,
                                      random_voice_prompt)
from pocket_tts_tpu.models import backbone, mimi, tts
from pocket_tts_tpu.runtime.engine import TTSEngine
from pocket_tts_tpu.runtime.server import MultiStreamServer
from pocket_tts_tpu.text.tokenizer import MockTokenizer

CFG0 = tiny_config()
FLAT = random_flat(CFG0, seed=31)
PARAMS, CFG = params_from_flat(FLAT, CFG0)


def make_engine(seed=0):
    return TTSEngine(params=PARAMS, cfg=CFG, seed=seed,
                     tokenizer=MockTokenizer(CFG.lut.n_bins))


class TestEarlyExit:
    def test_matches_scan_decode(self):
        eng = make_engine()
        voice = random_voice_prompt(CFG, 16)
        vstate = eng.prime_voice(voice)
        state, _ = eng._prefill_sentence(vstate, "Early exit must match scan.")
        rng = jax.random.PRNGKey(7)
        args = (jnp.float32(0.9), jnp.int32(3), jnp.int32(40), 50)
        _, pcm_a, val_a = tts.jit_decode_sentence(
            eng.params, eng.cfg, state, rng, *args)
        _, pcm_b, val_b = tts.jit_decode_sentence_early_exit(
            eng.params, eng.cfg, state, rng, *args)
        np.testing.assert_array_equal(np.asarray(val_a), np.asarray(val_b))
        na = int(np.asarray(val_a).sum())
        np.testing.assert_allclose(np.asarray(pcm_a)[:na],
                                   np.asarray(pcm_b)[:na], atol=1e-6)

    def test_capacity_stop(self):
        """Generation halts cleanly when the KV slot budget runs out."""
        eng = make_engine()
        voice = random_voice_prompt(CFG, 16)
        vstate = eng.prime_voice(voice)
        state, _ = eng._prefill_sentence(vstate, "Overrun the cache now.")
        end0 = int(state.flow.end)
        # capacity comes from the (possibly shrunk) cache shape
        room = state.flow.k[0].shape[-2] - end0
        rng = jax.random.PRNGKey(0)
        _, pcm, valid = tts.jit_decode_sentence(
            eng.params, eng.cfg, state, rng, jnp.float32(0.0), jnp.int32(3),
            jnp.int32(10 ** 6), ((room + 30) // 25 + 1) * 25)
        assert int(np.asarray(valid).sum()) == room


class TestServer:
    def test_cohort_serving_with_stats(self):
        eng = make_engine()
        server = MultiStreamServer(eng, max_batch=4, chunk_frames=10)
        server.register_voices({
            "a": random_voice_prompt(CFG, 12, seed=1),
            "b": random_voice_prompt(CFG, 16, seed=2),
        })
        reqs = [
            server.submit("First request sentence.", "a"),
            server.submit("Second one with other voice here.", "b"),
            server.submit("Third request arrives.", "a", temp=0.0),
        ]
        server.run_pending()
        st = server.stats()
        assert st["requests"] == 3
        for r in reqs:
            assert r.pcm is not None and r.pcm.size > 0
            assert r.pcm.size % CFG.mimi.frame_size == 0
            assert r.ttfa_s is not None and r.latency_s >= r.ttfa_s
        assert st["p50_ttfa_s"] is not None
        # chunked serving produced at least 2 chunks for the longer request
        assert any(len(r.chunks) >= 2 for r in reqs)

    def test_oversized_text_evicted_without_losing_cohort(self):
        """A text over the largest token bucket is evicted with a raised
        ValueError, but its cohort siblings still run (popping the cohort
        before validating used to lose them all)."""
        import pytest
        eng = make_engine()
        server = MultiStreamServer(eng, max_batch=4, chunk_frames=10)
        server.register_voices({"a": random_voice_prompt(CFG, 12, seed=1)})
        good = server.submit("A fitting request.", "a", temp=0.0)
        server.submit("A" + "!" * 300, "a")  # > largest token bucket
        tail = server.submit("Another fitting one.", "a", temp=0.0)
        with pytest.raises(ValueError, match="too long"):
            server.run_pending()
        server.run_pending()  # drains the tail request
        assert good.pcm is not None and good.pcm.size > 0
        assert tail.pcm is not None and tail.pcm.size > 0

    def test_chunked_matches_batched_single_shot(self):
        """Chunked decode (rng_offset) must produce the same audio as the
        engine's own synthesis for the same rng lineage."""
        eng1 = make_engine(seed=4)
        server = MultiStreamServer(eng1, max_batch=2, chunk_frames=10)
        voice = random_voice_prompt(CFG, 12, seed=1)
        server.register_voices({"a": voice})
        r1 = server.submit("Chunked audio equality check.", "a", temp=0.6)
        r2 = server.submit("Chunked audio equality check.", "a", temp=0.6)
        server.run_pending()
        # both requests had identical inputs but different rng -> differ
        assert r1.pcm.shape == r2.pcm.shape
        assert not np.array_equal(r1.pcm, r2.pcm)

        # same text/voice/temp through the engine with the matching rng
        # lineage (voice prime consumed no rng; requests use counters 1, 2)
        eng2 = make_engine(seed=4)
        vstate = eng2.prime_voice(voice)
        from pocket_tts_tpu.text.preprocess import prepare_text_prompt
        text, guess = prepare_text_prompt("Chunked audio equality check.")
        want1 = eng2.synthesize_sentence(vstate, text, 0.6, guess + 2)
        np.testing.assert_allclose(r1.pcm, want1, atol=1e-5)
