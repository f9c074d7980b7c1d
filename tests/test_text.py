"""Text front-end tests: preprocessing, sentence splitting, streaming."""
from pocket_tts_tpu.text.preprocess import (StrProcessor, count_words,
                                            merge_whitespaces,
                                            prepare_text_prompt,
                                            split_into_best_sentences)
from pocket_tts_tpu.text.tokenizer import MockTokenizer


class TestPrepare:
    def test_basic_normalization(self):
        text, fae = prepare_text_prompt("  hello   there friendly \t world ")
        # 4 words: capitalized, period appended, 8-space pad (<5 words)
        assert text == "        Hello there friendly world."
        assert fae == 3  # 4 words -> 3

    def test_long_gets_fae_1(self):
        text, fae = prepare_text_prompt("one two three four five six")
        assert fae == 1
        assert text == "One two three four five six."

    def test_short_gets_leading_spaces(self):
        text, _ = prepare_text_prompt("hi there")
        assert text == "        Hi there."

    def test_keeps_existing_punctuation(self):
        text, _ = prepare_text_prompt("are you there? yes I am here ok!")
        assert text.endswith("ok!")

    def test_empty_raises(self):
        import pytest
        with pytest.raises(ValueError):
            prepare_text_prompt("   ")

    def test_merge_whitespaces(self):
        assert merge_whitespaces("a  b\t\nc") == "a b c"
        assert count_words("  a  b c  ") == 3


class TestSplit:
    def test_eos_protocol(self):
        tok = MockTokenizer()
        ids = tok.encode(".!...?")
        # first id is the wordsep marker that the splitter drops
        assert len(ids) == 5

    def test_split_sentences(self):
        tok = MockTokenizer()
        chunks = split_into_best_sentences(
            tok, "Hello world. How are you? Fine!", max_tokens=50)
        assert len(chunks) == 1  # small enough to merge into one chunk

    def test_split_respects_budget(self):
        tok = MockTokenizer()
        text = " ".join(f"word{i} blah blah blah." for i in range(20))
        chunks = split_into_best_sentences(tok, text, max_tokens=12)
        assert len(chunks) > 1
        for c in chunks:
            assert len(tok.encode(c)) <= 24  # sentences stay intact


class TestStrProcessor:
    def test_sentence_boundary(self):
        sp = StrProcessor()
        sp.ingest("hello world. and")
        assert list(sp.sentences) == ["Hello world."]
        assert sp.tail == "And"

    def test_incremental_chunks(self):
        sp = StrProcessor()
        for c in "first one. second two! third":
            sp.ingest(c)
        assert list(sp.sentences) == ["First one.", "Second two!"]
        sp.flush()
        assert list(sp.sentences)[-1] == "Third."

    def test_whitespace_merging_and_caps(self):
        sp = StrProcessor()
        sp.ingest("  hello   there.  ok")
        assert list(sp.sentences) == ["Hello there."]
        assert sp.tail == "Ok"

    def test_multi_punct_single_boundary(self):
        sp = StrProcessor()
        sp.ingest("wait... what? no")
        # boundary fires on first non-eos char after an eos run
        assert list(sp.sentences) == ["Wait...", "What?"]

    def test_flush_appends_period(self):
        sp = StrProcessor()
        sp.ingest("no punctuation here")
        sp.flush()
        assert list(sp.sentences) == ["No punctuation here."]

    def test_reset(self):
        sp = StrProcessor()
        sp.ingest("abc. def")
        sp.reset()
        assert not sp.sentences and sp.tail == ""


class TestMockTokenizer:
    def test_roundtrip_words(self):
        tok = MockTokenizer()
        ids = tok.encode("Hello world.")
        assert tok.decode(ids) == "Hello world."

    def test_deterministic(self):
        a = MockTokenizer().encode("some words here")
        b = MockTokenizer().encode("some words here")
        assert a == b
