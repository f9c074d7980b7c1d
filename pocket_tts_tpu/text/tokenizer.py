"""Tokenizer front-end.

The real model uses a SentencePiece unigram tokenizer
(ref: src/config.h:19-20, conditioners/text.h:10-27). `sentencepiece` is an
optional dependency here; when it (or the .model file) is unavailable, a
deterministic word/punct fallback keeps the rest of the pipeline — including
the EOS-token sentence-splitting protocol — fully testable.
"""
from __future__ import annotations

import hashlib
import re
from typing import List


class SentencePieceTokenizer:
    def __init__(self, model_path: str):
        try:
            import sentencepiece as spm  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "sentencepiece is not installed; use MockTokenizer or install "
                "sentencepiece") from e
        self._sp = spm.SentencePieceProcessor()
        self._sp.Load(model_path)

    def encode(self, text: str) -> List[int]:
        return list(self._sp.EncodeAsIds(text))

    def decode(self, ids: List[int]) -> str:
        return self._sp.DecodeIds(list(ids))


class MockTokenizer:
    """Deterministic fallback tokenizer with the same interface.

    Tokenizes into words and punctuation pieces. Mirrors the real tokenizer's
    protocol used by split_into_best_sentences (text.h:135-143):
    encode(".!...?") = [<wordsep>, '.', '!', '...', '?'] where the first id is
    dropped by the caller.
    """

    # fixed ids matching the reference's observed sentencepiece ids
    PUNCT_IDS = {"▁": 260, ".": 263, "!": 682, "...": 799, "?": 292}
    _SPLIT = re.compile(r"(\.\.\.|[.!?,;:])|\s+")

    def __init__(self, n_bins: int = 4000):
        self.n_bins = n_bins
        self._id2piece = {v: k for k, v in self.PUNCT_IDS.items()}

    def _word_id(self, word: str) -> int:
        h = int(hashlib.md5(word.encode()).hexdigest(), 16)
        wid = 1000 + (h % (self.n_bins - 1000))
        self._id2piece[wid] = word
        return wid

    def encode(self, text: str) -> List[int]:
        ids: List[int] = [self.PUNCT_IDS["▁"]]
        pos = 0
        for m in self._SPLIT.finditer(text):
            if m.start() > pos:
                ids.append(self._word_id(text[pos:m.start()]))
            punct = m.group(1)
            if punct:
                ids.append(self.PUNCT_IDS.get(punct, self._word_id(punct)))
            pos = m.end()
        if pos < len(text):
            ids.append(self._word_id(text[pos:]))
        return ids

    def decode(self, ids: List[int]) -> str:
        pieces = []
        for i in ids:
            piece = self._id2piece.get(i, "")
            if piece == "▁":
                continue
            pieces.append(piece)
        out = ""
        for piece in pieces:
            if piece in (".", "!", "?", "...", ",", ";", ":"):
                out += piece
            else:
                out += (" " if out else "") + piece
        return out


def load_tokenizer(model_path=None, n_bins: int = 4000):
    """Return a SentencePiece tokenizer if possible, else the mock."""
    if model_path:
        import os
        if os.path.exists(model_path):
            try:
                return SentencePieceTokenizer(model_path)
            except RuntimeError:
                pass
    return MockTokenizer(n_bins)
