"""Continuous batching: per-chunk admission into a running batch.

VERDICT round-1 #2 done-criteria: a request submitted mid-decode starts
within <= chunk_frames, its audio equals solo synthesis, and p50 TTFA in
stats reflects it. New capability (the reference is hard-coded batch 1,
mimi_transformer.h:326-327).
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import (params_from_flat, random_flat,
                                      random_voice_prompt)
from pocket_tts_tpu.runtime.engine import TTSEngine
from pocket_tts_tpu.runtime.server import ContinuousBatchingServer
from pocket_tts_tpu.text.preprocess import prepare_text_prompt
from pocket_tts_tpu.text.tokenizer import MockTokenizer

CFG0 = dataclasses.replace(
    tiny_config(),
    backbone=dataclasses.replace(tiny_config().backbone, kv_capacity=256))
PARAMS, CFG = params_from_flat(random_flat(CFG0, seed=71), CFG0)

TEXT_A = "The first stream keeps the batch busy for quite a while longer."
TEXT_B = "Joining mid decode."


def make_engine(seed=0):
    return TTSEngine(params=PARAMS, cfg=CFG, seed=seed,
                     tokenizer=MockTokenizer(CFG.lut.n_bins))


def make_server(eng, lanes=2, chunk_frames=4, **kw):
    srv = ContinuousBatchingServer(eng, lanes=lanes,
                                   chunk_frames=chunk_frames,
                                   text_bucket=32, **kw)
    srv.register_voices({
        "va": np.asarray(random_voice_prompt(CFG, 12, seed=1)),
        "vb": np.asarray(random_voice_prompt(CFG, 16, seed=2)),
    })
    return srv


def solo_pcm(eng, text, voice_arr, temp, rng):
    """Reference solo synthesis with an explicit PRNG key."""
    from pocket_tts_tpu.models import tts
    prepared, guess = prepare_text_prompt(text)
    vstate = eng.prime_voice(voice_arr)
    state, max_steps = eng._prefill_sentence(vstate, prepared)
    scan_len = -(-max_steps // 25) * 25
    _, pcm, valid = tts.jit_decode_sentence_early_exit(
        eng.params, eng.cfg, state, rng, jnp.asarray(temp, eng.dtype),
        jnp.int32(guess + 2), jnp.int32(max_steps), scan_len)
    pcm = np.asarray(pcm)
    return pcm[np.asarray(valid)].reshape(-1)


class TestContinuousBatching:
    def test_mid_decode_admission_matches_solo(self):
        eng = make_engine()
        srv = make_server(eng)
        kA = jax.random.PRNGKey(101)
        kB = jax.random.PRNGKey(202)
        reqA = srv.submit(TEXT_A, "va", temp=0.3, rng=kA)
        for _ in range(2):
            srv.step()                      # A is mid-decode
        assert reqA.ttfa_s is not None and srv._live.count(None) == 1
        end_before = int(np.asarray(srv.batch.flow.end))
        assert end_before > srv.prefix_slots

        reqB = srv.submit(TEXT_B, "vb", temp=0.3, rng=kB)
        emitted = srv.step()                # admission happens here
        # B started within one chunk of submission
        assert reqB.ttfa_s is not None
        assert emitted > 0
        srv.run_pending()
        assert reqA.pcm is not None and reqB.pcm is not None

        va = np.asarray(random_voice_prompt(CFG, 12, seed=1))
        vb = np.asarray(random_voice_prompt(CFG, 16, seed=2))
        soloA = solo_pcm(eng, TEXT_A, va, 0.3, kA)
        soloB = solo_pcm(eng, TEXT_B, vb, 0.3, kB)
        assert reqA.pcm.shape == soloA.shape
        assert reqB.pcm.shape == soloB.shape
        np.testing.assert_allclose(reqA.pcm, soloA, atol=2e-5, rtol=0)
        np.testing.assert_allclose(reqB.pcm, soloB, atol=2e-5, rtol=0)

    def test_lone_request_no_cohort_wait(self):
        """A single request on a multi-lane server completes without
        duplicate-padding waste and records TTFA immediately."""
        eng = make_engine()
        srv = make_server(eng, lanes=4)
        req = srv.submit("Solo request.", "va", temp=0.0)
        srv.run_pending()
        assert req.pcm is not None and req.pcm.size > 0
        st = srv.stats()
        assert st["requests"] == 1 and st["p50_ttfa_s"] is not None

    def test_epoch_reset_drains_backlog(self):
        """More requests than lanes x epoch capacity: lanes refill as they
        finish and the epoch resets when the slot budget runs out."""
        eng = make_engine()
        srv = make_server(eng, lanes=2, ring=False)
        reqs = [srv.submit("Backlog item number %d." % i,
                           "va" if i % 2 else "vb", temp=0.0)
                for i in range(6)]
        srv.run_pending()
        assert all(r.pcm is not None and r.pcm.size > 0 for r in reqs)
        st = srv.stats()
        assert st["requests"] == 6
        assert st["p50_ttfa_s"] is not None and st["p95_latency_s"] > 0

    def test_temp0_determinism_across_scheduling(self):
        """temp=0 output is independent of when a request was admitted."""
        eng = make_engine()
        srv1 = make_server(eng, lanes=2)
        r1 = srv1.submit(TEXT_B, "vb", temp=0.0)
        srv1.run_pending()

        srv2 = make_server(eng, lanes=2)
        srv2.submit(TEXT_A, "va", temp=0.0)
        srv2.step()
        srv2.step()
        r2 = srv2.submit(TEXT_B, "vb", temp=0.0)
        srv2.run_pending()
        np.testing.assert_allclose(r1.pcm, r2.pcm, atol=2e-5, rtol=0)

    def test_compaction_keeps_long_lane_audio(self):
        """Epoch exhaustion with a LIVE long sentence: the slot compaction
        reclaims finished lanes' slots so the backlog keeps admitting
        without draining — and the live lane's audio is unchanged by its
        rows moving slots (attention masks on pos, not slot index)."""
        long_text = ("The first stream keeps the batch busy for a very "
                     "long while.")
        eng = make_engine()
        srv = make_server(eng, lanes=2, chunk_frames=4, ring=False)
        kA = jax.random.PRNGKey(11)
        reqA = srv.submit(long_text, "va", temp=0.3, rng=kA)
        shorts = [srv.submit("Backlog item %d here." % i, "vb", temp=0.0)
                  for i in range(5)]
        srv.run_pending()
        assert srv.compactions >= 1, "capacity never exhausted mid-epoch"
        assert all(r.pcm is not None and r.pcm.size > 0
                   for r in [reqA] + shorts)
        # the long lane decoded ACROSS a compaction; must equal solo
        va = np.asarray(random_voice_prompt(CFG, 12, seed=1))
        soloA = solo_pcm(eng, long_text, va, 0.3, kA)
        assert reqA.pcm.shape == soloA.shape
        np.testing.assert_allclose(reqA.pcm, soloA, atol=2e-5, rtol=0)
        # temp-0 shorts all identical (admitted at different epochs/slots)
        for r in shorts[1:]:
            np.testing.assert_allclose(r.pcm, shorts[0].pcm, atol=2e-5,
                                       rtol=0)

    def test_ring_wrap_matches_solo(self):
        """Prefix+ring mode (the default): sentences decode ACROSS the ring
        cursor wrap — rows recycle slots mid-sentence — and every request's
        audio still equals solo synthesis (masking keys on positions, not
        slots)."""
        long_a = TEXT_A          # 12 words -> 183-frame budget, ring is 192
        eng = make_engine()
        srv = make_server(eng, lanes=2)
        assert srv.ring
        keys = [jax.random.PRNGKey(31 + i) for i in range(3)]
        reqs = [srv.submit(long_a, "va", temp=0.3, rng=k) for k in keys]
        ends = []
        for _ in range(400):
            if not srv._queue and all(r is None for r in srv._live):
                break
            srv.step()
            ends.append(int(np.asarray(srv.batch.flow.end)))
        assert all(r.pcm is not None for r in reqs)
        # the cursor actually wrapped (went back down) at least once
        ends = np.asarray(ends)
        assert (np.diff(ends) < 0).any(), ends
        assert srv.compactions == 0
        va = np.asarray(random_voice_prompt(CFG, 12, seed=1))
        for r, k in zip(reqs, keys):
            solo = solo_pcm(eng, long_a, va, 0.3, k)
            assert r.pcm.shape == solo.shape
            np.testing.assert_allclose(r.pcm, solo, atol=2e-5, rtol=0)

    def test_eager_compaction_matches_solo(self):
        """compact_margin reclaims finished lanes' garbage BETWEEN epoch
        exhaustions (the r3 serving fix: the cursor, not capacity, sets the
        attention read size). A tiny margin forces a compaction after every
        lane turnover; the surviving lane's audio must equal solo."""
        long_text = ("The first stream keeps the batch busy for a very "
                     "long while.")
        eng = make_engine()
        srv = ContinuousBatchingServer(eng, lanes=2, chunk_frames=4,
                                       text_bucket=32, ring=False,
                                       compact_margin=4)
        srv.register_voices({
            "va": np.asarray(random_voice_prompt(CFG, 12, seed=1)),
            "vb": np.asarray(random_voice_prompt(CFG, 16, seed=2)),
        })
        kA = jax.random.PRNGKey(17)
        reqA = srv.submit(long_text, "va", temp=0.3, rng=kA)
        shorts = [srv.submit("Quick item %d." % i, "vb", temp=0.0)
                  for i in range(4)]
        srv.run_pending()
        # the margin is far below the finished shorts' garbage, so eager
        # compaction must have fired repeatedly (exhaustion alone gives <=1
        # at this workload)
        assert srv.compactions >= 2, srv.compactions
        va = np.asarray(random_voice_prompt(CFG, 12, seed=1))
        soloA = solo_pcm(eng, long_text, va, 0.3, kA)
        assert reqA.pcm.shape == soloA.shape
        np.testing.assert_allclose(reqA.pcm, soloA, atol=2e-5, rtol=0)
        for r in shorts[1:]:
            np.testing.assert_allclose(r.pcm, shorts[0].pcm, atol=2e-5,
                                       rtol=0)

    def test_oversized_request_rejected(self):
        eng = make_engine()
        srv = make_server(eng, lanes=2)
        import pytest
        with pytest.raises(ValueError, match="capacity"):
            srv.submit(" ".join(["w%d" % i for i in range(20)]), "va")
            srv.run_pending()

    def test_rejected_request_does_not_lose_siblings(self):
        """A raise during admission must not drop already-popped fitting
        requests: queue [fits, oversized] — the ValueError propagates AND
        the fitting request still completes (round-3 bug: it vanished from
        queue/live/completed)."""
        import pytest
        eng = make_engine()
        srv = make_server(eng, lanes=2)
        good = srv.submit(TEXT_B, "vb", temp=0.0)
        srv.submit(" ".join("w%d" % i for i in range(20)), "va")
        with pytest.raises(ValueError, match="capacity"):
            srv.run_pending()
        srv.run_pending()
        assert good.pcm is not None and good.pcm.size > 0

    def test_decode_failure_recovers_by_restart(self):
        """The decode chunk DONATES the batch state, so a dispatch failure
        may have consumed it. The server must drop the epoch, re-queue the
        live requests, and complete them on subsequent steps."""
        import pytest
        from pocket_tts_tpu.runtime import server as server_mod
        eng = make_engine()
        srv = make_server(eng, lanes=2)
        kA = jax.random.PRNGKey(5)
        req = srv.submit(TEXT_B, "vb", temp=0.0, rng=kA)
        srv.step()  # mid-decode with audio already emitted
        assert req.ttfa_s is not None
        real = server_mod.continuous_decode_chunk

        def boom(*a, **k):
            raise RuntimeError("injected device failure")

        server_mod.continuous_decode_chunk = boom
        try:
            with pytest.raises(RuntimeError, match="injected"):
                srv.step()
        finally:
            server_mod.continuous_decode_chunk = real
        assert srv.batch is None and srv._live == [None, None]
        srv.run_pending()
        assert req.pcm is not None and req.pcm.size > 0
        # seeded request: the restarted audio equals an undisturbed run
        srv2 = make_server(make_engine(), lanes=2)
        ref = srv2.submit(TEXT_B, "vb", temp=0.0, rng=kA)
        srv2.run_pending()
        np.testing.assert_allclose(req.pcm, ref.pcm, atol=2e-5, rtol=0)

    def test_text_bucket_overflow_keeps_siblings(self):
        """A request over text_bucket (few words, many punctuation tokens —
        it passes the frame-budget check) is rejected at validation, before
        anything is popped; the sibling request is unaffected."""
        import pytest
        eng = make_engine()
        srv = make_server(eng, lanes=2)
        good = srv.submit(TEXT_B, "vb", temp=0.0)
        srv.submit("A" + "!" * 40, "va")  # 1 word, 42 tokens > bucket 32
        with pytest.raises(ValueError, match="text_bucket"):
            srv.run_pending()
        srv.run_pending()
        assert good.pcm is not None and good.pcm.size > 0


def test_ring_quantized_kv_matches_solo():
    """Prefix+ring mode with the int8 KV cache on BOTH transformers
    (backbone quantize_kv + the opt-in mimi-ring variant): dequant scales
    recycle slots alongside the rows in the backbone's prefix+ring AND
    the mimi ring; audio of a wrap-crossing stream equals solo decode."""
    import dataclasses
    from pocket_tts_tpu.models import backbone, mimi, tts
    from pocket_tts_tpu.runtime.batched import (admit_group,
                                                continuous_decode_chunk,
                                                empty_batch_state,
                                                stack_states)
    cfg_q = dataclasses.replace(
        CFG,
        backbone=dataclasses.replace(CFG.backbone, quantize_kv=True),
        mimi=dataclasses.replace(
            CFG.mimi, transformer=dataclasses.replace(
                CFG.mimi.transformer, quantize_kv=True)))
    b = 2
    prefix, cap = 32, 64          # ring of 32 slots -> wraps quickly
    batch = empty_batch_state(PARAMS, cfg_q, b, cap, prefix, ring=True)
    assert batch.flow.ring_start is not None
    tok = jnp.asarray(np.arange(4, dtype=np.int32) + 7)
    tokens = jnp.zeros((16,), jnp.int32).at[:4].set(tok)
    mt = mimi.init_state(cfg_q.mimi)
    fresh = tts.sentence_prefill(PARAMS, cfg_q,
                                 backbone.shrink_state(
                                     backbone.init_state(cfg_q.backbone),
                                     cap),
                                 mt, tokens, jnp.int32(4))
    fresh2 = stack_states([fresh, fresh])
    batch = admit_group(batch, jnp.asarray([0, 1], jnp.int32), fresh2)
    rngs = jnp.stack([jax.random.PRNGKey(3), jax.random.PRNGKey(4)])
    n_frames = 48                 # >> ring size 32: wraps at least once
    batch, pcm, valid = continuous_decode_chunk(
        PARAMS, cfg_q, n_frames, batch, rngs,
        jnp.full((b,), 0.25, jnp.float32),
        jnp.full((b,), 40, jnp.int32), jnp.full((b,), 40, jnp.int32))
    assert int(np.asarray(batch.flow.end)) < cap  # cursor wrapped, in ring
    # solo reference, lane 0 (same rng fold: fold_in(rng, step))
    st = fresh.replace(flow=fresh.flow.replace(
        end=jnp.int32(prefix), ring_start=jnp.int32(prefix)))
    pcs = []
    for i in range(n_frames):
        st, p1, v1 = tts.frame_step(PARAMS, cfg_q, st,
                                    jax.random.fold_in(jax.random.PRNGKey(3),
                                                       st.step),
                                    jnp.float32(0.25), jnp.int32(40),
                                    jnp.int32(40))
        pcs.append(np.asarray(p1))
    np.testing.assert_allclose(np.asarray(pcm[0]), np.stack(pcs), atol=2e-5)


@pytest.mark.parametrize("quantize_kv", [False, True])
def test_ring_pallas_fused_insert_matches_xla(quantize_kv):
    """The continuous server's TPU hot path — Pallas flash decode with the
    FUSED in-kernel KV insert (ops/pallas_attn.decode_insert_attention),
    ring cursor wrapping over stale slots — must produce the same audio as
    the XLA DUS path, with byte-identical cache contents. Runs the kernel
    in interpret mode on CPU (Mosaic compiles the same code on TPU)."""
    import dataclasses
    from pocket_tts_tpu.models import backbone, mimi, tts
    from pocket_tts_tpu.runtime.batched import (admit_group,
                                                continuous_decode_chunk,
                                                empty_batch_state,
                                                stack_states)

    def run(cfg_x):
        b = 2
        prefix, cap = 32, 64      # ring of 32 slots -> wraps quickly
        batch = empty_batch_state(PARAMS, cfg_x, b, cap, prefix, ring=True)
        tok = jnp.asarray(np.arange(4, dtype=np.int32) + 7)
        tokens = jnp.zeros((16,), jnp.int32).at[:4].set(tok)
        mt = mimi.init_state(cfg_x.mimi)
        fresh = tts.sentence_prefill(
            PARAMS, cfg_x,
            backbone.shrink_state(backbone.init_state(cfg_x.backbone), cap),
            mt, tokens, jnp.int32(4))
        batch = admit_group(batch, jnp.asarray([0, 1], jnp.int32),
                            stack_states([fresh, fresh]))
        rngs = jnp.stack([jax.random.PRNGKey(3), jax.random.PRNGKey(4)])
        n_frames = 48             # >> ring size 32: wraps at least once
        batch, pcm, valid = continuous_decode_chunk(
            PARAMS, cfg_x, n_frames, batch, rngs,
            jnp.full((2,), 0.25, jnp.float32),
            jnp.full((2,), 40, jnp.int32), jnp.full((2,), 40, jnp.int32))
        return batch, np.asarray(pcm)

    cfg_base = dataclasses.replace(CFG, backbone=dataclasses.replace(
        CFG.backbone, quantize_kv=quantize_kv))
    cfg_pallas = dataclasses.replace(cfg_base, backbone=dataclasses.replace(
        cfg_base.backbone, use_pallas_attn=True, fuse_insert=True))
    b_xla, pcm_xla = run(cfg_base)
    b_pal, pcm_pal = run(cfg_pallas)
    np.testing.assert_allclose(pcm_pal, pcm_xla, atol=5e-5, rtol=0)
    if quantize_kv:
        # layer 0's pre-attention math is identical in both paths, so its
        # int8 rows and scales must land byte-identically through wraps
        # (deeper layers' inputs differ at fp rounding, which can flip a
        # quantization rounding boundary — compare audio only)
        np.testing.assert_array_equal(np.asarray(b_pal.flow.k[0]),
                                      np.asarray(b_xla.flow.k[0]))
        np.testing.assert_allclose(np.asarray(b_pal.flow.k_scale[0]),
                                   np.asarray(b_xla.flow.k_scale[0]),
                                   atol=1e-7)


def test_admit_stream_quantized_kv():
    """Continuous admission under the int8 KV cache: the admitted lane's
    audio must equal its solo decode (scales copied with the cache)."""
    import dataclasses
    from pocket_tts_tpu.models import backbone, mimi, tts
    from pocket_tts_tpu.runtime.batched import (admit_stream,
                                                continuous_decode_chunk,
                                                empty_batch_state)
    cfg_q = dataclasses.replace(CFG, backbone=dataclasses.replace(
        CFG.backbone, quantize_kv=True))
    b = 2
    prefix = 32
    batch = empty_batch_state(PARAMS, cfg_q, b, 96, prefix)
    tok = jnp.asarray(np.arange(4, dtype=np.int32) + 7)
    tokens = jnp.zeros((16,), jnp.int32).at[:4].set(tok)
    mt = mimi.init_state(cfg_q.mimi)
    fresh = tts.sentence_prefill(PARAMS, cfg_q,
                                 backbone.shrink_state(
                                     backbone.init_state(cfg_q.backbone), 96),
                                 mt, tokens, jnp.int32(4))
    # align the fresh stream's slot cursor with the shared prefix budget
    fresh = fresh.replace(flow=fresh.flow.replace(end=jnp.int32(prefix)))
    batch = batch.replace(flow=batch.flow.replace(end=jnp.int32(prefix)))
    batch = admit_stream(batch, 0, fresh)
    rngs = jnp.stack([jax.random.PRNGKey(3)] * b)
    batch, pcm, valid = continuous_decode_chunk(
        PARAMS, cfg_q, 8, batch, rngs, jnp.zeros((b,), jnp.float32),
        jnp.full((b,), 2, jnp.int32), jnp.full((b,), 20, jnp.int32))
    # solo reference
    st = fresh
    pcs = []
    for i in range(8):
        st, p1, v1 = tts.frame_step(PARAMS, cfg_q, st,
                                    jax.random.fold_in(jax.random.PRNGKey(3),
                                                       st.step),
                                    jnp.float32(0.0), jnp.int32(2),
                                    jnp.int32(20))
        pcs.append(np.asarray(p1))
    np.testing.assert_allclose(np.asarray(pcm[0]), np.stack(pcs), atol=2e-5)
