"""Golden-audio regression pin.

Synthesizes a fixed sentence with the tiny random model (seeded) and compares
against a committed golden waveform. Catches unintended numeric drift across
refactors. Regenerate intentionally with:
    REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
"""
import os

import numpy as np

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import params_from_flat, random_flat, \
    random_voice_prompt
from pocket_tts_tpu.runtime.engine import TTSEngine
from pocket_tts_tpu.text.tokenizer import MockTokenizer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tiny_synth_v1.npy")
TEXT = "Golden output must stay stable."


def synth():
    cfg0 = tiny_config()
    params, cfg = params_from_flat(random_flat(cfg0, seed=99), cfg0)
    eng = TTSEngine(params=params, cfg=cfg, seed=12345,
                    tokenizer=MockTokenizer(cfg.lut.n_bins))
    voice = random_voice_prompt(cfg, 20, seed=5)
    return eng.synthesize(TEXT, voice, temp=0.8).astype(np.float32)


def test_golden_waveform():
    pcm = synth()
    if os.environ.get("REGEN_GOLDEN") or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.save(GOLDEN, pcm)
        if not os.environ.get("REGEN_GOLDEN"):
            raise AssertionError(
                "golden file was missing; generated — commit it and rerun")
        return
    want = np.load(GOLDEN)
    assert pcm.shape == want.shape, (pcm.shape, want.shape)
    np.testing.assert_allclose(pcm, want, atol=2e-4)
