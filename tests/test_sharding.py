"""Multi-device tests on the virtual 8-CPU mesh: batched serving, GSPMD
tensor parallel, and the driver's multichip dryrun."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import random_params, random_voice_prompt
from pocket_tts_tpu.models import backbone, mimi, tts
from pocket_tts_tpu.parallel.sharding import (make_mesh, shard_params,
                                              shard_batched_state)
from pocket_tts_tpu.runtime.batched import (BatchedEngine,
                                            batched_frame_step,
                                            batched_prime_voice,
                                            batched_sentence_prefill,
                                            stack_states, unstack_states)
from pocket_tts_tpu.runtime.engine import TTSEngine
from pocket_tts_tpu.text.tokenizer import MockTokenizer

CFG0 = tiny_config()
PARAMS, CFG = random_params(CFG0, seed=13)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def _batched_setup(b):
    prompts = jnp.asarray(np.stack(
        [random_voice_prompt(CFG, 16, seed=i) for i in range(b)]))
    vstates = stack_states([backbone.init_state(CFG.backbone)
                            for _ in range(b)])
    vstates = batched_prime_voice(PARAMS, CFG, vstates, prompts,
                                  jnp.full((b,), 16, jnp.int32))
    tokens = jnp.tile(jnp.arange(12, dtype=jnp.int32)[None], (b, 1))
    states = batched_sentence_prefill(PARAMS, CFG, vstates,
                                      mimi.init_state(CFG.mimi), tokens,
                                      jnp.full((b,), 12, jnp.int32))
    return states


class TestBatched:
    def test_vmap_matches_single_stream(self):
        b = 3
        states = _batched_setup(b)
        rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(b)])
        out_states, pcm, valid = batched_frame_step(
            PARAMS, CFG, states, rngs, jnp.full((b,), 0.7, jnp.float32),
            jnp.full((b,), 3, jnp.int32), jnp.full((b,), 50, jnp.int32))
        assert pcm.shape == (b, CFG.mimi.frame_size)
        # stream 1 computed alone must match its batched result
        s1 = unstack_states(states, b)[1]
        _, pcm1, _ = tts.jit_frame_step(
            PARAMS, CFG, s1, jax.random.PRNGKey(1), jnp.float32(0.7),
            jnp.int32(3), jnp.int32(50))
        np.testing.assert_allclose(np.asarray(pcm[1]), np.asarray(pcm1),
                                   atol=1e-5)

    def test_batched_engine_multi_voice(self):
        eng = TTSEngine(params=PARAMS, cfg=CFG,
                        tokenizer=MockTokenizer(CFG.lut.n_bins))
        be = BatchedEngine(eng)
        voices = [random_voice_prompt(CFG, 12, seed=i) for i in range(4)]
        vstates = be.prime_voices(voices)
        texts = ["Hello there my good friend.",
                 "A second stream speaks now.",
                 "Third voice checking in today.",
                 "Short one."]
        pcms = be.synthesize_batch(texts, vstates, temp=0.5)
        assert len(pcms) == 4
        for pcm in pcms:
            assert pcm.size % CFG.mimi.frame_size == 0 and pcm.size > 0


class TestSharded:
    def test_tp_dp_step_matches_unsharded(self):
        b = 4
        states = _batched_setup(b)
        rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(b)])
        args = (jnp.full((b,), 0.7, jnp.float32),
                jnp.full((b,), 3, jnp.int32), jnp.full((b,), 50, jnp.int32))
        _, pcm_ref, _ = batched_frame_step(PARAMS, CFG, states, rngs, *args)

        mesh = make_mesh(data=4, model=2)
        p_sh = shard_params(PARAMS, mesh)
        st_sh = shard_batched_state(states, mesh)
        _, pcm_sh, _ = batched_frame_step(p_sh, CFG, st_sh, rngs, *args)
        np.testing.assert_allclose(np.asarray(pcm_sh), np.asarray(pcm_ref),
                                   atol=1e-4)

    def test_param_shardings_cover_ffn(self):
        mesh = make_mesh(data=4, model=2)
        p_sh = shard_params(PARAMS, mesh)
        spec = p_sh["layers"]["linear1"]["w"].sharding.spec
        assert "model" in str(spec)

    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, ".")
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)


class TestShardMapPallas:
    """The Pallas kernels must survive GSPMD: under a mesh they run inside
    jax.shard_map ("data" streams x "model" head-slices) instead of being
    pinned off (VERDICT r2 next #1b)."""

    def _pallas_cfg(self):
        import dataclasses
        return dataclasses.replace(
            CFG,
            backbone=dataclasses.replace(CFG.backbone, use_pallas_attn=True),
            mimi=dataclasses.replace(
                CFG.mimi,
                transformer=dataclasses.replace(
                    CFG.mimi.transformer, use_pallas_attn=True),
                seanet=dataclasses.replace(
                    CFG.mimi.seanet, use_pallas=True)))

    def test_mesh_cfg_threads_mesh_when_divisible(self):
        from pocket_tts_tpu.runtime.batched import mesh_cfg
        mesh = make_mesh(data=4, model=2)  # heads: backbone 4, mimi 2
        cfg_m = mesh_cfg(self._pallas_cfg(), mesh)
        assert cfg_m.backbone.mesh is mesh
        assert cfg_m.backbone.use_pallas_attn is True
        assert cfg_m.mimi.transformer.mesh is mesh

    def test_mesh_cfg_pins_pallas_off_when_indivisible(self):
        from pocket_tts_tpu.runtime.batched import mesh_cfg
        mesh = make_mesh(data=1, model=8)  # 8 does not divide 4 heads
        cfg_m = mesh_cfg(self._pallas_cfg(), mesh)
        assert cfg_m.backbone.use_pallas_attn is False
        assert cfg_m.backbone.mesh is None
        assert cfg_m.mimi.transformer.use_pallas_attn is False
        # the fallback cfg is STILL a sharded program: kernels without a
        # shard_map wrapper (the fused flow net) gate on on_mesh — if this
        # were False here, a Mosaic custom call would leak into GSPMD
        assert cfg_m.on_mesh is True
        assert mesh_cfg(self._pallas_cfg(), None).on_mesh is False

    def test_sharded_pallas_step_matches_unsharded_xla(self):
        from pocket_tts_tpu.runtime.batched import mesh_cfg
        b = 4
        states = _batched_setup(b)
        rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(b)])
        args = (jnp.full((b,), 0.7, jnp.float32),
                jnp.full((b,), 3, jnp.int32), jnp.full((b,), 50, jnp.int32))
        _, pcm_ref, _ = batched_frame_step(PARAMS, CFG, states, rngs, *args)

        mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
        cfg_m = mesh_cfg(self._pallas_cfg(), mesh)
        assert cfg_m.backbone.mesh is mesh  # kernels stay ENABLED
        p_sh = shard_params(PARAMS, mesh)
        st_sh = shard_batched_state(states, mesh)
        _, pcm_sh, _ = batched_frame_step(p_sh, cfg_m, st_sh, rngs, *args)
        np.testing.assert_allclose(np.asarray(pcm_sh), np.asarray(pcm_ref),
                                   atol=1e-4)

    def test_sharded_pallas_quant_kv_step_matches_unsharded(self):
        """int8 KV on BOTH transformers under shard_map (the serving mesh
        config): the quant kernels' scale rows ride the "data" shards and
        replicate over "model" head-slices."""
        import dataclasses
        from pocket_tts_tpu.runtime.batched import mesh_cfg

        def quantize(cfg):
            return dataclasses.replace(
                cfg,
                backbone=dataclasses.replace(cfg.backbone, quantize_kv=True),
                mimi=dataclasses.replace(
                    cfg.mimi, transformer=dataclasses.replace(
                        cfg.mimi.transformer, quantize_kv=True,
                        capacity=64)))  # int8 window needs cap % 32 == 0

        b = 4
        cfg_ref = quantize(CFG)
        prompts = jnp.asarray(np.stack(
            [random_voice_prompt(cfg_ref, 16, seed=i) for i in range(b)]))
        vstates = stack_states([backbone.init_state(cfg_ref.backbone)
                                for _ in range(b)])
        vstates = batched_prime_voice(PARAMS, cfg_ref, vstates, prompts,
                                      jnp.full((b,), 16, jnp.int32))
        tokens = jnp.tile(jnp.arange(12, dtype=jnp.int32)[None], (b, 1))
        states = batched_sentence_prefill(
            PARAMS, cfg_ref, vstates, mimi.init_state(cfg_ref.mimi),
            tokens, jnp.full((b,), 12, jnp.int32))
        rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(b)])
        args = (jnp.full((b,), 0.7, jnp.float32),
                jnp.full((b,), 3, jnp.int32), jnp.full((b,), 50, jnp.int32))
        _, pcm_ref, _ = batched_frame_step(PARAMS, cfg_ref, states, rngs,
                                           *args)

        mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
        cfg_m = mesh_cfg(quantize(self._pallas_cfg()), mesh)
        assert cfg_m.backbone.mesh is mesh
        assert cfg_m.mimi.transformer.mesh is mesh
        p_sh = shard_params(PARAMS, mesh)
        st_sh = shard_batched_state(states, mesh)
        _, pcm_sh, _ = batched_frame_step(p_sh, cfg_m, st_sh, rngs, *args)
        np.testing.assert_allclose(np.asarray(pcm_sh), np.asarray(pcm_ref),
                                   atol=1e-4)

    def test_sharded_share_prefix_server_matches_unsharded(self):
        """Shared-prefix continuous serving under a TPxDP mesh: the
        unbatched head-major pk/pv tables replicate over "data" and
        head-slice over "model" (parallel/sharding._spec_for_state)
        while prefix_attn_stats + the flash-partial merge run as GSPMD
        XLA around the shard_map'd decode kernel. Audio must equal the
        unmeshed shared server's."""
        import dataclasses
        from pocket_tts_tpu.runtime.server import ContinuousBatchingServer

        def cap256(cfg):
            # share mode clamps capacity to kv_capacity - prompt_pad; the
            # tiny default leaves too few ring slots for a sentence
            return dataclasses.replace(cfg, backbone=dataclasses.replace(
                cfg.backbone, kv_capacity=256))

        def run(mesh):
            eng = TTSEngine(params=PARAMS,
                            cfg=cap256(self._pallas_cfg() if mesh else CFG),
                            seed=0,
                            tokenizer=MockTokenizer(CFG.lut.n_bins))
            srv = ContinuousBatchingServer(eng, lanes=4, chunk_frames=4,
                                           text_bucket=32, mesh=mesh,
                                           share_prefix=True)
            srv.register_voices({
                "va": np.asarray(random_voice_prompt(CFG, 12, seed=1)),
                "vb": np.asarray(random_voice_prompt(CFG, 16, seed=2))})
            reqs = [srv.submit("A mesh lane decodes this.", "va",
                               temp=0.3, rng=jax.random.PRNGKey(5)),
                    srv.submit("Another voice joins.", "vb",
                               temp=0.3, rng=jax.random.PRNGKey(6))]
            srv.run_pending()
            return [np.asarray(r.pcm) for r in reqs]

        base = run(None)
        mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
        got = run(mesh)
        for i, (a, b) in enumerate(zip(base, got)):
            assert a.shape == b.shape, (i, a.shape, b.shape)
            np.testing.assert_allclose(a, b, atol=2e-3, err_msg=f"req {i}")

    def test_servers_build_cfg_through_mesh_cfg(self):
        """A server given a mesh must never hand raw engine.cfg to decode
        programs (the r2 latent multi-chip crash): its cfg must either
        carry the mesh (shard_map path) or pin the kernels off."""
        import dataclasses
        from pocket_tts_tpu.runtime.server import (ContinuousBatchingServer,
                                                   MultiStreamServer)
        eng = TTSEngine(params=PARAMS, cfg=self._pallas_cfg(),
                        tokenizer=MockTokenizer(CFG.lut.n_bins))
        mesh = make_mesh(data=4, model=2)
        for server in (MultiStreamServer(eng, max_batch=4, mesh=mesh),
                       ContinuousBatchingServer(eng, lanes=4, mesh=mesh)):
            for sub in (server.cfg.backbone, server.cfg.mimi.transformer):
                assert (sub.mesh is mesh) or (sub.use_pallas_attn is False)
        # and without a mesh the only change is the batched-serving
        # auto-resolution of fuse_insert (None -> True; measured win at
        # batch, wash solo) — everything else passes through untouched
        no_mesh = MultiStreamServer(eng, max_batch=4).cfg
        assert no_mesh.backbone.fuse_insert is True
        assert no_mesh == dataclasses.replace(
            eng.cfg, backbone=dataclasses.replace(
                eng.cfg.backbone, fuse_insert=True))
