"""Self-contained SentencePiece implementation tests.

Covers the ModelProto wire round-trip, unigram Viterbi semantics, byte
fallback, loud-failure loading, and the engine's refusal to pair
checkpoint-directory weights with the mock tokenizer.
ref: /root/reference/src/pocket_tts/conditioners/text.h:10-27.
"""
import struct

import pytest

from _spm_fixture import ascii_model, write_ascii_model
from pocket_tts_tpu.text.spm import (CONTROL, NORMAL, UNKNOWN,
                                     SentencePieceModel, UnigramTokenizer)
from pocket_tts_tpu.text.tokenizer import (MockTokenizer,
                                           SentencePieceTokenizer,
                                           load_tokenizer)


def _model(entries, **kw) -> SentencePieceModel:
    m = SentencePieceModel()
    for piece, score, *t in entries:
        m.pieces.append(piece)
        m.scores.append(score)
        m.types.append(t[0] if t else NORMAL)
    for k, v in kw.items():
        setattr(m, k, v)
    return m


BASE = [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL)]


def test_proto_round_trip(tmp_path):
    m = ascii_model()
    blob = m.serialize()
    m2 = SentencePieceModel.parse(blob)
    assert m2.pieces == m.pieces
    assert m2.types == m.types
    assert all(abs(a - b) < 1e-7 for a, b in zip(m2.scores, m.scores))
    assert (m2.unk_id, m2.bos_id, m2.eos_id, m2.pad_id) == (0, 1, 2, -1)
    assert m2.add_dummy_prefix and m2.escape_whitespaces
    assert m2.normalizer_name == "nmt_nfkc"
    # from_file path
    p = tmp_path / "tok.model"
    p.write_bytes(blob)
    tok = UnigramTokenizer.from_file(str(p))
    assert tok.vocab_size == len(m.pieces)


def test_viterbi_prefers_high_score_merge():
    m = _model(BASE + [("▁", -1.0), ("ab", -1.0), ("a", -2.0), ("b", -2.0)])
    tok = UnigramTokenizer(m)
    assert tok.encode_as_pieces("ab") == ["▁", "ab"]
    # flip the scores: single chars now win
    m2 = _model(BASE + [("▁", -1.0), ("ab", -5.0), ("a", -2.0), ("b", -2.0)])
    assert UnigramTokenizer(m2).encode_as_pieces("ab") == ["▁", "a", "b"]


def test_whitespace_escape_and_dummy_prefix():
    m = _model(BASE + [("▁a", -1.0), ("▁b", -1.0), ("a", -3.0), ("b", -3.0),
                       ("▁", -2.0)])
    tok = UnigramTokenizer(m)
    assert tok.encode_as_pieces("a   b") == ["▁a", "▁b"]  # ws collapsed
    assert tok.decode(tok.encode("a b")) == "a b"


def test_unknown_runs_merge_to_single_unk():
    m = _model(BASE + [("▁", -1.0), ("x", -1.0)])
    tok = UnigramTokenizer(m)
    ids = tok.encode("xQQx")
    # x, QQ -> one unk, x
    pieces = [m.pieces[i] for i in ids]
    assert pieces == ["▁", "x", "<unk>", "x"]
    assert tok.decode(ids) == "x ⁇ x"


def test_byte_fallback_round_trip():
    tok = UnigramTokenizer(ascii_model(byte_fallback=True))
    text = "café ☕!"
    ids = tok.encode(text)
    assert tok.model.unk_id not in ids
    assert tok.decode(ids) == text


def test_nfkc_and_control_chars():
    tok = UnigramTokenizer(ascii_model())
    # NFKC folds the fi ligature; control chars vanish; tabs become spaces
    assert tok.decode(tok.encode("ﬁt\tok\x07!")) == "fit ok!"


def test_eos_token_protocol_matches_reference():
    tok = SentencePieceTokenizer.__new__(SentencePieceTokenizer)
    tok._sp = UnigramTokenizer(ascii_model())
    ids = tok.encode(".!...?")
    assert len(ids) == 5  # [wordsep, '.', '!', '...', '?'] — text.h:135-143
    pieces = [tok._sp.model.pieces[i] for i in ids]
    assert pieces == ["▁", ".", "!", "...", "?"]

    from pocket_tts_tpu.text.preprocess import split_into_best_sentences
    chunks = split_into_best_sentences(
        tok, "The quick fox. Hello stream check! Brown?")
    assert len(chunks) >= 1
    joined = " ".join(chunks)
    assert "fox." in joined and "check!" in joined and "Brown?" in joined


def test_empty_and_whitespace_only():
    tok = UnigramTokenizer(ascii_model())
    assert tok.encode("") == []
    assert tok.encode("   \t  ") == []
    assert tok.decode([]) == ""


def test_corrupt_model_raises(tmp_path):
    p = tmp_path / "bad.model"
    p.write_bytes(b"\xff\xff\xff\xff not a protobuf")
    with pytest.raises(ValueError):
        UnigramTokenizer.from_file(str(p))


def test_bpe_model_rejected(tmp_path):
    m = ascii_model()
    m.model_type = 2  # BPE
    p = tmp_path / "bpe.model"
    p.write_bytes(m.serialize())
    with pytest.raises(ValueError, match="model_type"):
        UnigramTokenizer.from_file(str(p))


def test_load_tokenizer_loud_failure(tmp_path):
    missing = str(tmp_path / "nope.model")
    with pytest.raises(FileNotFoundError):
        load_tokenizer(missing)
    assert isinstance(load_tokenizer(missing, allow_mock=True),
                      MockTokenizer)
    assert isinstance(load_tokenizer(None), MockTokenizer)
    # corrupt file must raise, never silently degrade to the mock
    p = tmp_path / "corrupt.model"
    p.write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError):
        load_tokenizer(str(p))


def test_engine_refuses_mock_with_checkpoint_dir(tmp_path):
    from test_model_dir import make_model_dir
    from pocket_tts_tpu.runtime.engine import TTSEngine
    import os
    root, cfg0 = make_model_dir(tmp_path, tokenizer=False)
    with pytest.raises(FileNotFoundError):
        TTSEngine(model_path=root, cfg=cfg0, seed=0)
    eng = TTSEngine(model_path=root, cfg=cfg0, seed=0,
                    allow_mock_tokenizer=True)
    assert isinstance(eng.tokenizer, MockTokenizer)
    # now ship the tokenizer -> real path loads
    write_ascii_model(os.path.join(root, "tokenizer.model"))
    eng = TTSEngine(model_path=root, cfg=cfg0, seed=0)
    assert isinstance(eng.tokenizer, SentencePieceTokenizer)


def test_score_tie_break_is_deterministic():
    m = _model(BASE + [("▁", -1.0), ("ab", -4.0), ("a", -2.0), ("b", -2.0)])
    tok = UnigramTokenizer(m)
    out1 = tok.encode("abababab")
    out2 = tok.encode("abababab")
    assert out1 == out2


def test_unk_score_is_min_minus_penalty():
    m = _model(BASE + [("▁", -1.0), ("a", -7.5)])
    tok = UnigramTokenizer(m)
    assert tok._unk_score == pytest.approx(-17.5)
