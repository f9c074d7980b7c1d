"""Precompiled-charsmap normalization: darts-clone trie round-trip and
the exact normalizer.cc byte loop (text/charsmap.py, spm._normalize_exact).

The release tokenizer.model ships nmt_nfkc as a compiled rule trie the
reference applies via libsentencepiece (/root/reference/src/
pocket_tts.cpp:8); these tests pin our reader/loop semantics on fixture
rule sets covering the behaviors that map actually exercises — NFKC
compatibility folds, NMT control-char deletion and whitespace
unification, longest-match, deletions, and malformed-UTF-8 handling.
All non-ASCII is escape-coded: composed vs decomposed accents must be
byte-exact in the fixtures.
"""
import struct

import pytest

from pocket_tts_tpu.text.charsmap import (PrecompiledCharsmap,
                                          build_charsmap, valid_utf8_len)
from pocket_tts_tpu.text.spm import (NORMAL, UNKNOWN, SentencePieceModel,
                                     UnigramTokenizer)

SP = "▁"           # sentencepiece whitespace escape
LIG_FI = "ﬁ"       # latin small ligature fi
CIRCLED1 = "①"     # circled digit one
FW_BANG = "！"      # fullwidth exclamation mark
E_DECOMP = "é"    # e + combining acute
E_ACUTE = "é"      # composed e-acute
ANGSTROM = "Å"     # Angstrom sign
A_RING = "Å"       # A with ring above
NBSP = " "
BEL = "\x07"
ZWSP = "​"
IDEO_STOP = "。"    # ideographic full stop
CAT = "猫"
DOG = "犬"

# a miniature nmt_nfkc: NFKC folds (ligature, circled digit, fullwidth,
# combining-accent composition, Angstrom sign) + NMT cleanup (NBSP/tab/
# newline to space, control/zero-width deletion)
NFKC_RULES = {
    LIG_FI: "fi",
    CIRCLED1: "1",
    FW_BANG: "!",
    E_DECOMP: E_ACUTE,
    ANGSTROM: A_RING,
    NBSP: " ",
    "\t": " ",
    "\n": " ",
    BEL: "",
    ZWSP: "",
}


def _tok(rules=NFKC_RULES, pieces=(), **spec):
    m = SentencePieceModel()
    for piece, score, ptype in [("<unk>", 0.0, UNKNOWN)] + [
            (p, -2.0, NORMAL) for p in pieces]:
        m.pieces.append(piece)
        m.scores.append(score)
        m.types.append(ptype)
    m.precompiled_charsmap = build_charsmap(rules)
    for k, v in spec.items():
        setattr(m, k, v)
    return UnigramTokenizer(m)


class TestDartsTrie:
    def test_round_trip_all_rules(self):
        cm = PrecompiledCharsmap(build_charsmap(NFKC_RULES))
        for src, rep in NFKC_RULES.items():
            data = src.encode("utf-8")
            ln, val = cm.longest_match(data, 0)
            assert ln == len(data), repr(src)
            assert cm.replacement(val) == rep.encode("utf-8"), repr(src)

    def test_longest_match_wins(self):
        cm = PrecompiledCharsmap(build_charsmap(
            {"a": "X", "ab": "Y", "abc": "Z", "b": "Q"}))
        assert cm.normalize_prefix(b"abcd", 0) == (b"Z", 3)
        assert cm.normalize_prefix(b"abd", 0) == (b"Y", 2)
        assert cm.normalize_prefix(b"ad", 0) == (b"X", 1)
        assert cm.normalize_prefix(b"ba", 0) == (b"Q", 1)

    def test_unmatched_passes_one_char(self):
        cm = PrecompiledCharsmap(build_charsmap({"x": "y"}))
        e_acute = (E_ACUTE + "!").encode("utf-8")
        assert cm.normalize_prefix(e_acute, 0) == (e_acute[:2], 2)
        assert cm.normalize_prefix(b"zx", 0) == (b"z", 1)

    def test_malformed_utf8_replacement_char(self):
        cm = PrecompiledCharsmap(build_charsmap({"x": "y"}))
        # lone continuation byte, truncated 2-byte seq, overlong, surrogate
        for bad in (b"\x80a", b"\xc3", b"\xc0\xaf", b"\xed\xa0\x80"):
            rep, consumed = cm.normalize_prefix(bad, 0)
            assert rep == b"\xef\xbf\xbd" and consumed == 1, bad
        # literal U+FFFD in the input is VALID utf-8 (passes through)
        assert valid_utf8_len(b"\xef\xbf\xbd", 0) == 3

    def test_shared_prefixes_and_deletion_pool(self):
        rules = {"abc": "1", "abd": "1", "ab": "", "a": "2"}
        cm = PrecompiledCharsmap(build_charsmap(rules))
        for src, rep in rules.items():
            ln, val = cm.longest_match(src.encode() + b"zz", 0)
            assert ln == len(src) and cm.replacement(val) == rep.encode()

    def test_bad_blob_rejected(self):
        with pytest.raises(ValueError):
            PrecompiledCharsmap(b"\x01")
        with pytest.raises(ValueError):
            PrecompiledCharsmap(struct.pack("<I", 999) + b"1234")


class TestExactNormalize:
    def test_nfkc_folds(self):
        tok = _tok()
        assert (tok.normalize(LIG_FI + "n " + CIRCLED1 + FW_BANG)
                == SP + "fin" + SP + "1!")
        assert tok.normalize("caf" + E_DECOMP) == SP + "caf" + E_ACUTE
        # composed e-acute has no rule: passes through verbatim
        assert tok.normalize("caf" + E_ACUTE) == SP + "caf" + E_ACUTE
        assert (tok.normalize(ANGSTROM + "ngstrom")
                == SP + A_RING + "ngstrom")

    def test_nmt_cleanup(self):
        tok = _tok()
        # NBSP/tab/newline -> space; controls and zero-widths deleted
        assert (tok.normalize("a" + NBSP + "b\tc\nd")
                == SP + "a" + SP + "b" + SP + "c" + SP + "d")
        assert tok.normalize("a" + BEL + "b" + ZWSP + "c") == SP + "abc"
        # whitespace runs collapse; leading/trailing strip
        assert (tok.normalize("\t\t a \n" + NBSP + "\n b   ")
                == SP + "a" + SP + "b")

    def test_deletion_only_input_empty(self):
        tok = _tok()
        assert tok.normalize(BEL + ZWSP) == ""
        assert tok.normalize(" \t " + NBSP + " ") == ""
        assert tok.normalize("") == ""

    def test_framing_flags(self):
        # no dummy prefix / no escaping / keep extra whitespace
        tok = _tok(add_dummy_prefix=False, escape_whitespaces=False,
                   remove_extra_whitespaces=False)
        assert tok.normalize("a\tb") == "a b"
        assert tok.normalize(" a  b ") == " a  b "

    def test_replacement_with_space_collapses(self):
        # a rule whose REPLACEMENT ends in space interacts with the
        # heading-space removal of the following piece (normalizer.cc's
        # is_prev_space dance)
        tok = _tok({"X": "x ", "\t": " "})
        assert tok.normalize("aX b") == SP + "ax" + SP + "b"
        assert tok.normalize("aX\tb") == SP + "ax" + SP + "b"

    def test_cjk_multibyte_rules(self):
        tok = _tok()
        # ideographic full stop has no rule -> passes through; fullwidth
        # ! folds to ASCII
        assert (tok.normalize(CAT + IDEO_STOP + DOG + FW_BANG)
                == SP + CAT + IDEO_STOP + DOG + "!")

    def test_matches_approximation_on_ascii(self):
        """For plain ASCII the exact charsmap path and the documented
        NFKC approximation agree (the round-3 divergence was only ever
        non-ASCII)."""
        exact = _tok()
        approx = _tok()
        approx._charsmap = None
        for s in ("Hello world.", "  spaced\tout  ", "it's 42!",
                  "A-B (c) \"d\""):
            assert exact.normalize(s) == approx.normalize(s), s

    def test_proto_round_trip_preserves_charsmap(self):
        m = SentencePieceModel()
        m.pieces, m.scores, m.types = ["<unk>"], [0.0], [UNKNOWN]
        m.precompiled_charsmap = build_charsmap(NFKC_RULES)
        m2 = SentencePieceModel.parse(m.serialize())
        assert m2.precompiled_charsmap == m.precompiled_charsmap
        assert (UnigramTokenizer(m2).normalize(LIG_FI + " " + CIRCLED1)
                == SP + "fi" + SP + "1")

    def test_encode_uses_exact_normalizer(self):
        tok = _tok(pieces=(SP, "f", "i", "n", "1"))
        ids = tok.encode(LIG_FI + "n" + ZWSP + " " + CIRCLED1)
        assert [tok.model.pieces[i] for i in ids] == [
            SP, "f", "i", "n", SP, "1"]
