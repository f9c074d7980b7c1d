"""Paragraph-length synthesis (BASELINE config 3) + server-on-mesh."""
import numpy as np
import jax

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import (params_from_flat, random_flat,
                                      random_voice_prompt)
from pocket_tts_tpu.parallel.sharding import make_mesh
from pocket_tts_tpu.runtime.engine import TTSEngine
from pocket_tts_tpu.runtime.server import MultiStreamServer
from pocket_tts_tpu.text.preprocess import split_into_best_sentences
from pocket_tts_tpu.text.tokenizer import MockTokenizer

CFG0 = tiny_config()
PARAMS, CFG = params_from_flat(random_flat(CFG0, seed=41), CFG0)

PARAGRAPH = (
    "The morning sun rose over the quiet harbor. Boats swayed gently on "
    "the tide, and gulls wheeled overhead! Further along the shore, the "
    "old lighthouse keeper began his rounds. Would the weather hold? "
    "Nobody could say for certain, but the barometer was steady."
)


def make_engine(seed=0):
    return TTSEngine(params=PARAMS, cfg=CFG, seed=seed,
                     tokenizer=MockTokenizer(CFG.lut.n_bins))


class TestLongForm:
    def test_paragraph_splits_and_synthesizes(self):
        eng = make_engine()
        chunks = split_into_best_sentences(eng.tokenizer, PARAGRAPH)
        assert len(chunks) >= 2  # token budget forces multiple chunks
        voice = random_voice_prompt(CFG, 16)
        pcm = eng.synthesize(PARAGRAPH, voice, temp=0.0)
        assert pcm.size > 0 and pcm.size % CFG.mimi.frame_size == 0
        # every chunk contributed at least one frame
        assert pcm.size // CFG.mimi.frame_size >= len(chunks)

    def test_streaming_paragraph_chunked_writer(self, tmp_path):
        from pocket_tts_tpu.io.wav import StreamingWavWriter, load_wav
        eng = make_engine()
        voice = random_voice_prompt(CFG, 16)
        stream = eng.open_stream(voice, temp=0.0)
        path = str(tmp_path / "long.wav")
        n = 0
        with StreamingWavWriter(path, eng.sample_rate) as w:
            for i in range(0, len(PARAGRAPH), 15):
                stream.send(PARAGRAPH[i:i + 15])
                while (f := stream.receive()) is not None:
                    w.write(f)
                    n += 1
            stream.flush()
            while (f := stream.receive()) is not None:
                w.write(f)
                n += 1
        data, sr = load_wav(path)
        assert n > 0 and data.size == n * CFG.mimi.frame_size

    def test_runon_sentence_streams_to_completion(self):
        """A ~400-token punctuation-free ingest must re-chunk (VERDICT
        weak #5): streaming routes over-long sentences through the
        50-token splitter instead of raising on the 256 bucket."""
        eng = make_engine()
        runon = " ".join(f"word{i}" for i in range(300))  # no punctuation
        assert len(eng.tokenizer.encode(runon)) > 256
        voice = random_voice_prompt(CFG, 16)
        stream = eng.open_stream(voice, temp=0.0)
        stream.send(runon)
        stream.flush()
        frames = 0
        while stream.receive() is not None:
            frames += 1
        # several 50-token chunks, each contributing frames
        assert frames >= 4
        assert not stream._pending and stream.state is None

    def test_offline_runon_hard_chunks(self):
        eng = make_engine()
        runon = " ".join(f"item{i}" for i in range(120))
        chunks = split_into_best_sentences(eng.tokenizer, runon + ".")
        assert all(len(eng.tokenizer.encode(c)) <= 50 + 2 for c in chunks)
        assert len(chunks) >= 3

    def test_server_on_mesh(self):
        """Cohort serving with GSPMD-sharded states on the 8-CPU mesh."""
        eng = make_engine()
        mesh = make_mesh(data=4, model=2)
        server = MultiStreamServer(eng, max_batch=4, mesh=mesh,
                                   chunk_frames=10)
        server.register_voices({
            "a": random_voice_prompt(CFG, 12, seed=1),
            "b": random_voice_prompt(CFG, 16, seed=2),
        })
        reqs = [server.submit(f"Stream number {i} reporting in.",
                              "a" if i % 2 else "b") for i in range(4)]
        server.run_pending()
        for r in reqs:
            assert r.pcm is not None and r.pcm.size > 0
        assert server.stats()["requests"] == 4
