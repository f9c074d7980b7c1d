"""End-to-end loading from a model directory laid out like the Kyutai
release: tts_b6369a24.safetensors + embeddings/<voice>.safetensors.
ref: src/pocket_tts.cpp:241-250,292-298,351-359."""
import os

import numpy as np

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import random_flat
from pocket_tts_tpu.io.safetensors_io import save_safetensors
from pocket_tts_tpu.runtime.engine import TTSEngine
from pocket_tts_tpu.text.tokenizer import SentencePieceTokenizer


def make_model_dir(tmp_path, tokenizer: bool = True):
    cfg0 = tiny_config()
    root = tmp_path / "kyutai" / "pocket-tts-without-voice-cloning"
    os.makedirs(root / "embeddings")
    save_safetensors(random_flat(cfg0, seed=61),
                     str(root / "tts_b6369a24.safetensors"))
    rng = np.random.RandomState(0)
    prompt = (rng.randn(1, 14, cfg0.backbone.d_model) * 0.05
              ).astype(np.float32)
    save_safetensors({"voice.audio_prompt": prompt},
                     str(root / "embeddings" / "cosette.safetensors"))
    if tokenizer:
        from _spm_fixture import write_ascii_model
        write_ascii_model(str(root / "tokenizer.model"))
    return str(root), cfg0


def test_engine_from_model_dir(tmp_path):
    root, cfg0 = make_model_dir(tmp_path)
    # release layout ships tokenizer.model -> the REAL tokenizer path loads
    eng = TTSEngine(model_path=root, cfg=cfg0, seed=0)
    assert isinstance(eng.tokenizer, SentencePieceTokenizer)
    assert eng.sample_rate == cfg0.mimi.sample_rate
    assert eng.frame_size == cfg0.mimi.frame_size

    # named-voice resolution through the embeddings/ convention
    pcm = eng.synthesize("Loading straight from the release layout.",
                         "cosette", temp=0.0)
    assert pcm.size > 0 and pcm.size % eng.frame_size == 0

    # streaming API from the same engine
    stream = eng.open_stream("cosette", temp=0.0)
    stream.send("Short stream check.")
    stream.flush()
    frames = 0
    while stream.receive() is not None:
        frames += 1
    assert frames > 0
