"""Synthetic SentencePiece model fixtures for tests.

Builds a small ASCII unigram vocab whose ids all fit the tiny config's
n_bins=256 embedding table, honoring the reference EOS-token protocol
(encode(".!...?") = [wordsep, '.', '!', '...', '?'];
ref: /root/reference/src/pocket_tts/conditioners/text.h:135-143).
"""
import string

from pocket_tts_tpu.text.spm import (BYTE, CONTROL, NORMAL, UNKNOWN,
                                     SentencePieceModel)


def ascii_model(byte_fallback: bool = False,
                extra_words=("the", "quick", "brown", "fox", "hello",
                             "stream", "check")) -> SentencePieceModel:
    pieces = [("<unk>", 0.0, UNKNOWN),
              ("<s>", 0.0, CONTROL),
              ("</s>", 0.0, CONTROL)]
    if byte_fallback:
        pieces += [(f"<0x{i:02X}>", 0.0, BYTE) for i in range(256)]
    pieces.append(("▁", -3.0, NORMAL))
    for p in ("...", ".", "!", "?", ",", ";", ":"):
        pieces.append((p, -3.0, NORMAL))
    for w in extra_words:
        pieces.append(("▁" + w, -4.0, NORMAL))
    for c in string.ascii_letters + string.digits + "'\"-()":
        pieces.append((c, -10.0, NORMAL))
    m = SentencePieceModel()
    for piece, score, ptype in pieces:
        m.pieces.append(piece)
        m.scores.append(score)
        m.types.append(ptype)
    m.byte_fallback = byte_fallback
    return m


def write_ascii_model(path, byte_fallback: bool = False) -> SentencePieceModel:
    m = ascii_model(byte_fallback)
    with open(path, "wb") as f:
        f.write(m.serialize())
    return m
