"""Randomized property tests for the streaming-state machinery."""
import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.ops import attention, conv, rope
from pocket_tts_tpu.text.preprocess import StrProcessor
from pocket_tts_tpu.text.tokenizer import MockTokenizer


def random_chunks(rng, text):
    out = []
    i = 0
    while i < len(text):
        n = rng.randint(1, 9)
        out.append(text[i:i + n])
        i += n
    return out


class TestStrProcessorProperty:
    def test_chunking_invariance(self):
        rng = np.random.RandomState(0)
        texts = [
            "one two. three four! five six? seven",
            "a.b.c.d",
            "  leading spaces. and   runs\tof ws. ok",
            "ellipsis... then more. done",
            "no punctuation whatsoever in this one",
        ]
        for text in texts:
            ref = StrProcessor()
            ref.ingest(text)
            ref.flush()
            for _ in range(5):
                sp = StrProcessor()
                for c in random_chunks(rng, text):
                    sp.ingest(c)
                sp.flush()
                assert list(sp.sentences) == list(ref.sentences), text


class TestRopeProperty:
    def test_score_depends_only_on_relative_position(self):
        rng = np.random.RandomState(1)
        h, d = 3, 32
        q = jnp.asarray(rng.randn(1, h, d).astype(np.float32))
        k = jnp.asarray(rng.randn(1, h, d).astype(np.float32))
        for delta in [0, 1, 17]:
            scores = []
            for base in [0, 5, 400, 900]:
                qq = rope.apply_rope(q, *rope.rope_cos_sin(
                    jnp.asarray([base + delta]), d, 10000.0))
                kk = rope.apply_rope(k, *rope.rope_cos_sin(
                    jnp.asarray([base]), d, 10000.0))
                scores.append(np.einsum("thd,shd->hts", np.asarray(qq),
                                        np.asarray(kk)))
            for s in scores[1:]:
                np.testing.assert_allclose(s, scores[0], atol=2e-3)


class TestStreamingConvProperty:
    def test_variable_chunk_sizes(self):
        """Streaming conv state machinery is chunk-size agnostic."""
        rng = np.random.RandomState(2)
        cin, cout, k = 4, 6, 5
        p = {"w": jnp.asarray(rng.randn(cout, cin, k).astype(np.float32)
                              * 0.2),
             "b": jnp.asarray(rng.randn(cout).astype(np.float32))}
        full = rng.randn(cin, 50).astype(np.float32)
        want = np.asarray(conv.conv1d(
            p, jnp.asarray(np.pad(full, ((0, 0), (k - 1, 0))).T))).T
        for sizes in [[50], [10] * 5, [1] * 50, [3, 17, 8, 22]]:
            prev = conv.conv1d_init_state(cin, k)
            outs = []
            i = 0
            for n in sizes:
                prev, y = conv.streaming_conv1d(p, prev,
                                                jnp.asarray(full[:, i:i + n].T))
                outs.append(np.asarray(y).T)
                i += n
            got = np.concatenate(outs, -1)
            np.testing.assert_allclose(got, want, atol=1e-4, err_msg=str(sizes))


class TestRingInsertPaths:
    def test_dus_and_scatter_paths_agree(self):
        """cap % t == 0 takes the DUS fast path; otherwise scatter — both
        must place rows identically (modulo wrap)."""
        rng = np.random.RandomState(3)
        h, d = 2, 4
        for cap, t in [(12, 3), (12, 4), (10, 2)]:
            cache = jnp.zeros((cap, h, d))
            ref = np.zeros((cap, h, d), np.float32)
            for step in range(7):
                new = rng.randn(t, h, d).astype(np.float32)
                offset = step * t
                cache = attention.cache_insert_ring(cache, jnp.asarray(new),
                                                    offset)
                for i in range(t):
                    ref[(offset + i) % cap] = new[i]
                np.testing.assert_array_equal(np.asarray(cache), ref)

    def test_scatter_path_with_wrap(self):
        # cap not a multiple of t: blocks wrap mid-insert
        rng = np.random.RandomState(4)
        h, d = 2, 4
        cap, t = 10, 3
        cache = jnp.zeros((cap, h, d))
        ref = np.zeros((cap, h, d), np.float32)
        for step in range(8):
            new = rng.randn(t, h, d).astype(np.float32)
            offset = step * t
            cache = attention.cache_insert_ring(cache, jnp.asarray(new),
                                                offset)
            for i in range(t):
                ref[(offset + i) % cap] = new[i]
        np.testing.assert_array_equal(np.asarray(cache), ref)


class TestTokenizerProperty:
    def test_split_decode_rejoin_stable(self):
        tok = MockTokenizer()
        rng = np.random.RandomState(5)
        words = ["alpha", "beta", "gamma", "delta", "third", "longword"]
        for _ in range(10):
            n = rng.randint(3, 12)
            text = " ".join(rng.choice(words) for _ in range(n)) + "."
            ids = tok.encode(text)
            assert tok.decode(ids) == text
            # double-encode stability
            assert tok.encode(tok.decode(ids)) == ids
