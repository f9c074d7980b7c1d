"""Shared-prefix serving: one copy of each voice's prompt KV, attended
by every lane through an exact flash-partial merge.

New capability vs the reference (single stream, no batching at all):
vLLM-style prompt-prefix sharing. The prompt bytes stream from HBM once
per frame for the whole batch; per-lane caches hold text+decode only.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import (params_from_flat, random_flat,
                                      random_voice_prompt)
from pocket_tts_tpu.ops.attention import (merge_attn_partials,
                                          pos_cache_bias,
                                          prefix_attn_stats, sdpa,
                                          sdpa_decode_seg_stats,
                                          sdpa_seg_stats)
from pocket_tts_tpu.runtime.engine import TTSEngine
from pocket_tts_tpu.runtime.server import ContinuousBatchingServer
from pocket_tts_tpu.text.tokenizer import MockTokenizer

CFG0 = dataclasses.replace(
    tiny_config(),
    backbone=dataclasses.replace(tiny_config().backbone, kv_capacity=256))
PARAMS, CFG = params_from_flat(random_flat(CFG0, seed=71), CFG0)

TEXT_A = "The first stream keeps the batch busy for quite a while longer."
TEXT_B = "Joining mid decode."


def make_engine():
    return TTSEngine(params=PARAMS, cfg=CFG, seed=0,
                     tokenizer=MockTokenizer(CFG.lut.n_bins))


def make_server(eng, share, lanes=2, capacity=None):
    srv = ContinuousBatchingServer(eng, lanes=lanes, chunk_frames=4,
                                   text_bucket=32, capacity=capacity,
                                   share_prefix=share)
    srv.register_voices({
        "va": np.asarray(random_voice_prompt(CFG, 12, seed=1)),
        "vb": np.asarray(random_voice_prompt(CFG, 16, seed=2)),
    })
    return srv


def run_requests(srv, reqs):
    out = []
    for text, voice, key in reqs:
        out.append(srv.submit(text, voice, temp=0.3,
                              rng=jax.random.PRNGKey(key)))
    srv.run_pending()
    return [np.asarray(r.pcm) for r in out]


class TestPrefixMath:
    def test_partial_merge_equals_monolithic(self):
        """prefix partial + cache partial merged == one softmax over the
        concatenated keys, for T==1 and T>1."""
        rng = np.random.RandomState(0)
        h, d, p, s = 4, 16, 8, 24
        hd = h * d
        pk = jnp.asarray(rng.randn(p, hd), jnp.float32) * 0.3
        pv = jnp.asarray(rng.randn(p, hd), jnp.float32) * 0.3
        ppos = jnp.asarray([0, 1, 2, 3, 4, -1, -1, -1], jnp.int32)
        kc = jnp.asarray(rng.randn(s, hd), jnp.float32) * 0.3
        vc = jnp.asarray(rng.randn(s, hd), jnp.float32) * 0.3
        cpos = jnp.asarray([5 + i for i in range(20)] + [-1] * 4,
                           jnp.int32)
        # head-major tables as split_prefix builds them
        pk_hm = pk.reshape(p, h, d).transpose(1, 0, 2)
        pv_hm = pv.reshape(p, h, d).transpose(1, 0, 2)
        for t in (1, 3):
            q = jnp.asarray(rng.randn(t, h, d), jnp.float32) * 0.5
            q_pos = jnp.asarray([25 + i for i in range(t)], jnp.int32)
            o1, m1, l1 = prefix_attn_stats(q, pk_hm, pv_hm, ppos)
            bias = pos_cache_bias(q_pos, cpos)
            if t == 1:
                o2, m2, l2 = sdpa_decode_seg_stats(q, kc, vc, bias)
            else:
                o2, m2, l2 = sdpa_seg_stats(q, kc, vc, bias)
            got = merge_attn_partials(o1, m1, l1, o2, m2, l2)
            # monolithic reference over concatenated keys
            k_all = jnp.concatenate([pk, kc], 0).reshape(p + s, h, d)
            v_all = jnp.concatenate([pv, vc], 0).reshape(p + s, h, d)
            bias_all = pos_cache_bias(q_pos,
                                      jnp.concatenate([ppos, cpos]))
            want = sdpa(q, k_all, v_all, bias_all)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5, err_msg=f"t={t}")


class TestSharePrefix:
    def test_matches_unshared_multivoice(self):
        """Shared-prefix serving produces the same audio as the unshared
        server for the same seeded requests across two voices (the
        per-lane ppos masking selects each lane's own voice)."""
        reqs = [(TEXT_A, "va", 101), (TEXT_B, "vb", 202),
                (TEXT_B, "va", 303)]
        base = run_requests(make_server(make_engine(), False), reqs)
        shared = run_requests(make_server(make_engine(), True,
                                          capacity=224), reqs)
        for i, (a, b) in enumerate(zip(base, shared)):
            assert a.shape == b.shape, (i, a.shape, b.shape)
            np.testing.assert_allclose(a, b, atol=2e-3, err_msg=f"req {i}")

    def test_lane_cache_excludes_prompt(self):
        srv = make_server(make_engine(), True, capacity=224)
        assert srv.prefix_slots == 32          # text bucket only
        srv.submit(TEXT_B, "va", temp=0.0, rng=jax.random.PRNGKey(7))
        srv.step()
        bf = srv.batch.flow
        assert bf.pk is not None and bf.pk[0].shape[1] == 2 * srv.prompt_pad
        assert bf.k[0].shape[1] == 224          # text + ring only
        # lane 0's ppos unmasks voice va's segment only
        ppos = np.asarray(bf.ppos[0])
        assert (ppos[:srv.prompt_pad] >= 0).sum() == 12
        assert (ppos[srv.prompt_pad:] == -1).all()
        srv.run_pending()

    def test_default_capacity_admits(self):
        """capacity=None (exactly what `cli.py --serve --share-prefix`
        constructs) must clamp to what the post-split voice residuals
        hold — kv_capacity - prompt_pad — so the first admission's lane
        write matches shapes instead of crashing."""
        srv = make_server(make_engine(), True)     # capacity=None
        assert srv.capacity == CFG.backbone.kv_capacity - srv.prompt_pad
        req = srv.submit(TEXT_B, "va", temp=0.0, rng=jax.random.PRNGKey(5))
        srv.run_pending()
        assert np.asarray(req.pcm).size > 0

    def test_incremental_registration(self):
        """A second register_voices call rebuilds the concatenated tables
        over ALL voices (same audio as registering both up front) and
        refuses to change shapes under live requests."""
        reqs = [(TEXT_B, "vb", 202), (TEXT_B, "va", 303)]
        base = run_requests(make_server(make_engine(), True,
                                        capacity=224), reqs)
        eng = make_engine()
        srv = ContinuousBatchingServer(eng, lanes=2, chunk_frames=4,
                                       text_bucket=32, capacity=224,
                                       share_prefix=True)
        srv.register_voices(
            {"va": np.asarray(random_voice_prompt(CFG, 12, seed=1))})
        srv.register_voices(
            {"vb": np.asarray(random_voice_prompt(CFG, 16, seed=2))})
        got = run_requests(srv, reqs)
        for i, (a, b) in enumerate(zip(base, got)):
            assert a.shape == b.shape, (i, a.shape, b.shape)
            np.testing.assert_allclose(a, b, atol=2e-3, err_msg=f"req {i}")
        # a shape-changing registration under a live request must refuse
        srv.submit(TEXT_A, "va", temp=0.3, rng=jax.random.PRNGKey(9))
        srv.step()
        with np.testing.assert_raises(ValueError):
            srv.register_voices(
                {"vc": np.asarray(random_voice_prompt(CFG, 20, seed=3))})
        srv.run_pending()

    def test_ring_wrap_with_shared_prefix(self):
        """Enough sequential requests to wrap the shared ring cursor:
        both servers run the same 192-slot ring (the shared one without
        the 32 prompt slots), so wraps land identically and the audio
        must still match."""
        reqs = [(TEXT_A, "vb", 11), (TEXT_A, "va", 22),
                (TEXT_A, "va", 33), (TEXT_A, "vb", 44)]
        base = run_requests(make_server(make_engine(), False), reqs)
        shared = run_requests(make_server(make_engine(), True,
                                          capacity=224), reqs)
        for i, (a, b) in enumerate(zip(base, shared)):
            assert a.shape == b.shape, (i, a.shape, b.shape)
            np.testing.assert_allclose(a, b, atol=2e-3, err_msg=f"req {i}")
