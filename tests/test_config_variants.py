"""Config-variant coverage: gelu flavours, voice loading shapes, dtype
plumbing."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import (load_voice, params_from_flat,
                                      random_flat, random_voice_prompt)
from pocket_tts_tpu.io.safetensors_io import save_safetensors
from pocket_tts_tpu.runtime.engine import TTSEngine
from pocket_tts_tpu.text.tokenizer import MockTokenizer

CFG0 = tiny_config()
FLAT = random_flat(CFG0, seed=51)
PARAMS, CFG = params_from_flat(FLAT, CFG0)


def make_engine(cfg=None, **kw):
    return TTSEngine(params=PARAMS, cfg=cfg or CFG,
                     tokenizer=MockTokenizer(CFG.lut.n_bins), **kw)


def test_gelu_flavours_differ():
    """gelu_approx toggles the ggml-style tanh GELU (torch.h/ggml_gelu) vs
    the erf GELU of the original torch model — both must run, and differ."""
    voice = random_voice_prompt(CFG, 16)
    a = make_engine().synthesize("Check activation flavour.", voice, temp=0.0)
    cfg_tanh = dataclasses.replace(CFG, gelu_approx=True)
    b = make_engine(cfg=cfg_tanh).synthesize("Check activation flavour.",
                                             voice, temp=0.0)
    assert a.shape == b.shape
    assert not np.array_equal(a, b)


class TestReferenceExactSwitchboard:
    """One-command A/B harness over every documented numerics divergence
    (VERDICT weak #2): gelu flavour, mask constant, exact-250 ring. With
    real weights, `--reference-exact` makes the full pipeline comparable
    bit-for-bit against the C++ build."""

    def test_switch_values(self):
        from pocket_tts_tpu.config import (DEFAULT_CONFIG,
                                           reference_exact_config)
        exact = reference_exact_config(DEFAULT_CONFIG)
        assert exact.gelu_approx is True
        assert exact.backbone.mask_value == -1e5
        assert exact.mimi.transformer.mask_value == -1e5
        assert exact.mimi.transformer.capacity == \
            exact.mimi.transformer.context == 250

    def test_exact_ring_matches_until_wrap_then_diverges(self):
        """capacity==context reproduces the reference's eviction order:
        identical to the rounded ring until the first wrap (offset+T >
        capacity), different after (the rounded ring retains a few more
        in-window slots). ref: mimi_transformer.h:149-287."""
        import dataclasses as dc
        import jax
        from pocket_tts_tpu.models import mimi_transformer as mt
        cfg = CFG.mimi.transformer            # tiny: context 40, cap 48
        cfg_exact = dc.replace(cfg, capacity=cfg.context)
        p = PARAMS["mimi"]["decoder_transformer"]
        s_round = mt.init_state(cfg)
        s_exact = mt.init_state(cfg_exact)
        rng = np.random.RandomState(7)
        diverged_at = None
        for step in range(4):                 # offsets 0,16,32,48
            x = jnp.asarray(rng.randn(16, cfg.d_model) * 0.1, jnp.float32)
            s_round, y_r = mt.forward(p, cfg, s_round, x)
            s_exact, y_e = mt.forward(p, cfg_exact, s_exact, x)
            same = np.allclose(np.asarray(y_r), np.asarray(y_e),
                               atol=1e-6)
            if step * 16 + 16 <= cfg.context:
                assert same, f"pre-wrap step {step} must match exactly"
            elif not same and diverged_at is None:
                diverged_at = step
        assert diverged_at is not None, \
            "post-wrap steps must reflect the different eviction order"

    def test_exact_engine_end_to_end(self):
        from pocket_tts_tpu.config import reference_exact_config
        exact_cfg = reference_exact_config(CFG)
        voice = random_voice_prompt(CFG, 16)
        a = make_engine().synthesize(
            "The switchboard enumerates every divergence in one run.",
            voice, temp=0.0)
        b = make_engine(cfg=exact_cfg).synthesize(
            "The switchboard enumerates every divergence in one run.",
            voice, temp=0.0)
        assert a.shape == b.shape and not np.array_equal(a, b)


def test_load_voice_shapes(tmp_path):
    """voice.audio_prompt may be (T, D) or (1, T, D) — both load to (T, D).
    ref: src/pocket_tts.cpp:109-117."""
    d = CFG.backbone.d_model
    prompt = np.random.RandomState(0).randn(1, 9, d).astype(np.float32)
    path = str(tmp_path / "voice.safetensors")
    save_safetensors({"voice.audio_prompt": prompt}, path)
    loaded = load_voice(path)
    assert loaded.shape == (9, d)

    eng = make_engine()
    vstate = eng.prime_voice(path)
    assert int(vstate.next_pos) == 9


def test_bf16_params_and_state():
    """bf16 loading/state plumbing (the full bf16 pipeline only executes on
    TPU — XLA:CPU has no bf16xbf16->f32 dot; TPU runs are the bench path)."""
    import jax
    from pocket_tts_tpu.models import backbone, mimi, tts
    params16, cfg16 = params_from_flat(FLAT, CFG0, dtype=jnp.bfloat16)
    leaves = jax.tree.leaves(params16)
    assert any(l.dtype == jnp.bfloat16 for l in leaves)
    st = tts.init_stream_state(params16, cfg16, dtype=jnp.bfloat16)
    assert st.flow.k[0].dtype == jnp.bfloat16
    assert st.prev_latent.dtype == jnp.bfloat16
    assert st.flow.pos.dtype == jnp.int32


def test_stream_reset_reuses_voice():
    eng = make_engine()
    voice = random_voice_prompt(CFG, 16)
    stream = eng.open_stream(voice, temp=0.0)
    stream.send("First utterance here.")
    stream.flush()
    first = []
    while (f := stream.receive()) is not None:
        first.append(f)
    stream.reset()
    stream.send("First utterance here.")
    stream.flush()
    again = []
    while (f := stream.receive()) is not None:
        again.append(f)
    # same voice state; temp 0 -> byte-identical replay
    np.testing.assert_array_equal(np.concatenate(first),
                                  np.concatenate(again))
