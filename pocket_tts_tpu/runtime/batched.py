"""Batched / sharded multi-stream serving.

New capability vs the reference (which is hard-coded batch 1,
mimi_transformer.h:326-327): stream states are stacked on a leading batch
axis and every step function is vmapped. Cache *slot* cursors (backbone
`end`, mimi ring `offset`, frame counter `step`) are batch-uniform by
construction — they stay unmapped under vmap, so every KV insert lowers to a
plain dynamic_update_slice instead of a scatter. Per-stream variation
(prompt/text lengths, EOS timing) lives in the per-slot position arrays and
masks.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models import backbone, flow_lm, mimi, tts
from ..text.preprocess import count_words, prepare_text_prompt
from .engine import TTSEngine, _bucket, _SCAN_BUCKET


def _axes_like(state, batched: bool = True):
    """Full axes tree: 0 everywhere except batch-uniform SLOT cursors ->
    None. Only cursors used for *indexing* (backbone `end`, mimi ring
    `offset`) must stay uniform; timing state (`step`, positions, mimi
    `start`) is per-stream so lanes can be at different points of their
    sentences (continuous batching)."""
    axes = jax.tree.map(lambda _: 0 if batched else None, state)

    def flow_axes(fl):
        fl = fl.replace(end=None)
        if fl.ring_start is not None:   # ring cursor start is shared too
            fl = fl.replace(ring_start=None)
        if fl.pk is not None:
            # shared-prefix tables are batch-uniform (THE point: one copy
            # read for the whole batch); ppos stays per-lane (0)
            fl = fl.replace(pk=jax.tree.map(lambda _: None, fl.pk),
                            pv=jax.tree.map(lambda _: None, fl.pv))
        return fl

    if isinstance(state, tts.StreamState):
        return axes.replace(
            flow=flow_axes(axes.flow),
            mimi=axes.mimi.replace(
                transformer=axes.mimi.transformer.replace(offset=None)))
    if isinstance(state, backbone.BackboneState):
        return flow_axes(axes)
    if isinstance(state, mimi.MimiState):
        return axes.replace(
            transformer=axes.transformer.replace(offset=None))
    return axes


def stack_states(states: Sequence):
    """Stack per-stream states; batch-uniform cursor fields are kept scalar
    (asserted equal)."""
    axes = _axes_like(states[0])

    def comb(axis, *leaves):
        if axis is None:
            return leaves[0]
        return jnp.stack(leaves, 0)

    return jax.tree.map(comb, axes, *states,
                        is_leaf=lambda x: x is None)


def unstack_states(state, n: int):
    axes = _axes_like(state)
    return [jax.tree.map(
        lambda a, x, i=i: x if a is None else x[i], axes, state,
        is_leaf=lambda x: x is None)
        for i in range(n)]


@functools.partial(jax.jit, static_argnums=(1,))
def batched_prime_voice(p, cfg, states, prompts, n_valid):
    """states: stacked BackboneState; prompts: (B, Tp, d); n_valid: (B,)."""
    axes = _axes_like(states)
    return jax.vmap(
        lambda s, pr, n: tts.prime_voice(p, cfg, s, pr, n),
        in_axes=(axes, 0, 0), out_axes=axes)(states, prompts, n_valid)


@functools.partial(jax.jit, static_argnums=(1,))
def batched_sentence_prefill(p, cfg, voice_states, mimi_template, tokens,
                             n_valid):
    """voice_states: stacked BackboneState; tokens (B, Tt); n_valid (B,).
    Returns a stacked StreamState ready for batched_frame_step."""
    b = tokens.shape[0]
    vaxes = _axes_like(voice_states)

    def one(vs, tk, n):
        emb = flow_lm.embed_tokens(p, tk)
        return flow_lm.prefill(p, cfg, vs, emb, n)

    flow = jax.vmap(one, in_axes=(vaxes, 0, 0),
                    out_axes=vaxes)(voice_states, tokens, n_valid)
    dtype = p["bos_emb"].dtype
    maxes = jax.tree.map(lambda _: 0, mimi_template)
    maxes = maxes.replace(
        transformer=maxes.transformer.replace(offset=None))
    mimi_b = jax.tree.map(
        lambda a, x: x if x is None
        else (jnp.zeros_like(x) if a is None
              else jnp.broadcast_to(jnp.zeros_like(x), (b,) + x.shape)),
        maxes, mimi_template, is_leaf=lambda x: x is None)
    return tts.StreamState(
        flow=flow,
        mimi=mimi_b,
        prev_latent=jnp.broadcast_to(p["bos_emb"].astype(dtype),
                                     (b,) + p["bos_emb"].shape),
        eos_step=jnp.full((b,), -1, jnp.int32),
        step=jnp.zeros((b,), jnp.int32),
        done=jnp.zeros((b,), bool),
    )


@functools.partial(jax.jit, static_argnums=(1,))
def batched_frame_step(p, cfg, states, rngs, temp, frames_after_eos,
                       max_steps):
    """states: stacked StreamState; rngs (B, 2); scalars (B,)."""
    axes = _axes_like(states)
    return jax.vmap(
        lambda s, r, t, f, m: tts.frame_step(p, cfg, s, r, t, f, m),
        in_axes=(axes, 0, 0, 0, 0),
        out_axes=(axes, 0, 0))(states, rngs, temp, frames_after_eos,
                               max_steps)


@functools.partial(jax.jit, static_argnums=(1, 7))
def batched_decode_sentence(p, cfg, states, rngs, temp, frames_after_eos,
                            max_steps, scan_len, rng_offset=0):
    """rng_offset lets chunked serving (scan_len frames at a time) fold the
    same per-frame rng indices as one long scan — identical audio."""
    axes = _axes_like(states)
    rng_offset = jnp.asarray(rng_offset, jnp.int32)

    def body(carry, i):
        st = carry
        step = jax.vmap(
            lambda s, r, t, f, m: tts.frame_step(
                p, cfg, s, jax.random.fold_in(r, rng_offset + i), t, f, m),
            in_axes=(axes, 0, 0, 0, 0), out_axes=(axes, 0, 0))
        st, pcm, valid = step(st, rngs, temp, frames_after_eos, max_steps)
        return st, (pcm, valid)

    states, (pcm, valid) = jax.lax.scan(
        body, states, jnp.arange(scan_len, dtype=jnp.int32))
    # (scan, B, frame) -> (B, scan, frame)
    return states, pcm.transpose(1, 0, 2), valid.T


# ---------------------------------------------------------------------------
# continuous batching primitives (per-frame admission into a running batch)
# ---------------------------------------------------------------------------

def empty_batch_state(p, cfg, b: int, capacity: int, prefix_slots: int,
                      dtype=jnp.float32, ring: bool = False,
                      prefix_tables=None) -> tts.StreamState:
    """A B-lane batch with every lane idle (done=True) and the shared slot
    cursor parked at `prefix_slots` — the uniform prompt+text budget every
    admission prefills into slots [0, prefix_slots).

    ring=True: the cursor wraps inside [prefix_slots, capacity) instead of
    exhausting (backbone.BackboneState.ring_start) — the continuous
    server's no-compaction mode.

    prefix_tables: (pk, pv) shared prompt-KV tables (see
    backbone.BackboneState) — prefix_slots then budgets TEXT only; each
    lane's ppos row arrives with its admission. The tables are copied so
    the donated chunk dispatches recycle the batch's own buffers, never
    the caller's (the server also keeps them inside its voice states)."""
    one = tts.init_stream_state(p, cfg, dtype)
    one = one.replace(flow=backbone.shrink_state(one.flow, capacity),
                      done=jnp.ones((), bool))
    if prefix_tables is not None:
        pk, pv = prefix_tables
        one = one.replace(flow=one.flow.replace(
            pk=tuple(jnp.copy(a) for a in pk),
            pv=tuple(jnp.copy(a) for a in pv),
            ppos=jnp.full((pk[0].shape[1],), -1, jnp.int32)))
    batch = stack_states([one] * b)
    flow = batch.flow.replace(end=jnp.asarray(prefix_slots, jnp.int32))
    if ring:
        flow = flow.replace(ring_start=jnp.asarray(prefix_slots, jnp.int32))
    return batch.replace(flow=flow)


@jax.jit
def admit_stream(batch: tts.StreamState, lane,
                 fresh: tts.StreamState) -> tts.StreamState:
    """Insert a freshly prefilled single-stream state into lane `lane` of a
    RUNNING batch — the where-insert the slot/position design anticipated.

    The lane's backbone cache/pos/next_pos are replaced wholesale (a one-time
    leading-axis dynamic_update_slice, off the per-frame path); the shared
    slot cursor `end` and mimi ring `offset` are untouched — the lane's
    future KV writes land at the shared slot with its OWN positions, and its
    mimi `start` records the join time so RoPE phases and the ring window
    are stream-relative (audio == solo synthesis).
    """
    lane = jnp.asarray(lane, jnp.int32)
    bf, ff = batch.flow, fresh.flow
    # the fresh solo prefill has no ring field; the lane inherits the
    # running batch's (shared, untouched below)
    flow = bf.replace(
        k=tuple(bk.at[lane].set(fk.astype(bk.dtype))
                for bk, fk in zip(bf.k, ff.k)),
        v=tuple(bv.at[lane].set(fv.astype(bv.dtype))
                for bv, fv in zip(bf.v, ff.v)),
        pos=bf.pos.at[lane].set(ff.pos),
        next_pos=bf.next_pos.at[lane].set(ff.next_pos))
    if bf.k_scale is not None:  # int8 KV: the lane's dequant scales too
        flow = flow.replace(
            k_scale=tuple(bs.at[lane].set(fs)
                          for bs, fs in zip(bf.k_scale, ff.k_scale)),
            v_scale=tuple(bs.at[lane].set(fs)
                          for bs, fs in zip(bf.v_scale, ff.v_scale)))
    # zero the lane's mimi caches/conv tails; ring offset stays shared
    maxes = _axes_like(batch.mimi)
    mimi_st = jax.tree.map(
        lambda a, x: x if a is None else x.at[lane].set(jnp.zeros_like(x[0])),
        maxes, batch.mimi, is_leaf=lambda x: x is None)
    tr = mimi_st.transformer
    mimi_st = mimi_st.replace(transformer=tr.replace(
        start=tr.start.at[lane].set(batch.mimi.transformer.offset)))
    return batch.replace(
        flow=flow, mimi=mimi_st,
        prev_latent=batch.prev_latent.at[lane].set(
            fresh.prev_latent.astype(batch.prev_latent.dtype)),
        eos_step=batch.eos_step.at[lane].set(-1),
        step=batch.step.at[lane].set(0),
        done=batch.done.at[lane].set(False))


@functools.partial(jax.jit, donate_argnums=(0,))
def admit_group(batch: tts.StreamState, lanes,
                fresh: tts.StreamState) -> tts.StreamState:
    """Admit a GROUP of freshly prefilled streams in ONE dispatch.

    lanes: (k,) int32, the destination lane of fresh stream i; entries
    >= B are padding and their writes are DROPPED (the admission group
    pads to a power of two in the server so only log2 shapes compile —
    indices must arrive sorted and, padding included, distinct).
    fresh: a k-lane stacked StreamState straight from
    batched_sentence_prefill (its batch-uniform cursors are ignored; the
    running batch's shared slot cursor and mimi ring offset stay).

    The batch argument is DONATED: XLA aliases it in place, so admission
    writes only the admitted lanes. The per-lane admit_stream path copied
    the FULL multi-hundred-MB batch state per admission (no donation) and
    cost one dispatch per lane — under churn those copies were a visible
    slice of device time.
    """
    lanes = jnp.asarray(lanes, jnp.int32)
    if batch.flow.ring_start is not None and fresh.flow.ring_start is None:
        # match pytree structures: the fresh prefill carries no ring field;
        # its value is ignored (shared-cursor leaves map with axis None)
        fresh = fresh.replace(flow=fresh.flow.replace(
            ring_start=batch.flow.ring_start))
    axes = _axes_like(batch)

    def put(a, dst, src):
        if a is None:
            return dst
        return dst.at[lanes].set(src.astype(dst.dtype), mode="drop",
                                 indices_are_sorted=True,
                                 unique_indices=True)

    out = jax.tree.map(put, axes, batch, fresh,
                       is_leaf=lambda x: x is None)
    # the joining lanes' mimi `start` records the join time (the shared
    # ring offset) so RoPE phases and the ring window are stream-relative
    tr = out.mimi.transformer
    start = tr.start.at[lanes].set(
        jnp.broadcast_to(batch.mimi.transformer.offset, lanes.shape),
        mode="drop", indices_are_sorted=True, unique_indices=True)
    return out.replace(mimi=out.mimi.replace(
        transformer=tr.replace(start=start)))


@functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def compact_batch(batch: tts.StreamState, live, prefix_slots: int
                  ) -> tts.StreamState:
    """Compact every live lane's KV rows to the front of the cache and pull
    the shared slot cursor back — the continuous server's answer to epoch
    exhaustion WITHOUT draining.

    The slot/position decoupling makes this a pure slot permutation: RoPE
    was applied at write time and attention masks on the per-slot `pos`
    array, so rows can move to any slot as long as `pos` moves with them.
    Each lane's valid rows (pos >= 0, lane live) are gathered to the front
    in original order (stable argsort on validity), dead lanes compact to
    zero rows, and the batch-uniform cursor restarts at the longest live
    lane's row count. One batched gather (~one full cache read+write),
    paid once per epoch exhaustion instead of idling lanes while the
    longest sentence drains.

    live: (B,) bool — lanes currently decoding. batch is DONATED.
    """
    if batch.flow.ring_start is not None:
        raise ValueError("compact_batch is the linear-cursor (epoch) "
                         "reclaim; ring mode recycles slots in place")
    bf = batch.flow
    pos = bf.pos                                   # (B, S)
    s = pos.shape[-1]
    valid = (pos >= 0) & live[:, None]
    # stable valid-first permutation per lane
    key = jnp.where(valid, 0, s) + jnp.arange(s, dtype=jnp.int32)
    idx = jnp.argsort(key, axis=-1)

    def take(c):
        extra = (1,) * (c.ndim - 2)
        return jnp.take_along_axis(c, idx.reshape(idx.shape + extra),
                                   axis=1)

    new_pos = jnp.where(jnp.take_along_axis(valid, idx, axis=1),
                        take(pos), -1)
    counts = valid.sum(-1)
    new_end = jnp.maximum(jnp.int32(prefix_slots),
                          counts.max().astype(jnp.int32))
    flow = bf.replace(
        k=tuple(take(c) for c in bf.k),
        v=tuple(take(c) for c in bf.v),
        pos=new_pos, end=new_end)
    if bf.k_scale is not None:
        flow = flow.replace(
            k_scale=tuple(take(c) for c in bf.k_scale),
            v_scale=tuple(take(c) for c in bf.v_scale))
    return batch.replace(flow=flow)


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(3,))
def continuous_decode_chunk(p, cfg, chunk_frames: int, states, rngs, temps,
                            frames_after_eos, max_steps):
    """Decode chunk_frames for every lane; lanes are at DIFFERENT local
    steps, so each folds its rng with its own step counter (identical noise
    sequence to solo decode_sentence's fold_in(rng, i)).

    states is DONATED — the caller must rebind it to the returned state
    (the server does). Without donation every chunk re-materialized the
    full KV/ring state before the first in-place insert."""
    axes = _axes_like(states)

    def body(st, _):
        def one(s, r, t, f, m):
            return tts.frame_step(p, cfg, s, jax.random.fold_in(r, s.step),
                                  t, f, m)
        st, pcm, valid = jax.vmap(
            one, in_axes=(axes, 0, 0, 0, 0),
            out_axes=(axes, 0, 0))(st, rngs, temps, frames_after_eos,
                                   max_steps)
        return st, (pcm, valid)

    states, (pcm, valid) = jax.lax.scan(body, states, None,
                                        length=chunk_frames)
    return states, pcm.transpose(1, 0, 2), valid.T


def mesh_cfg(cfg, mesh):
    """The cfg every mesh-sharded decode program must be built with.

    GSPMD has no partitioning rule for Mosaic custom calls, so the Pallas
    kernels (backbone flash-decode + fused mimi ring) cannot be left for
    XLA to shard. When the mesh divides their head counts they run inside
    `jax.shard_map` instead (cfg.mesh threads the mesh to the kernel call
    sites — see ops/pallas_attn.decode_attention); otherwise they are
    pinned OFF and the XLA paths (which GSPMD shards fine) take over.

    Every consumer of a mesh (BatchedEngine, MultiStreamServer,
    ContinuousBatchingServer) MUST build its decode cfg through this one
    helper — passing a raw engine cfg to a sharded program dispatches
    un-partitionable custom calls and crashes on real multi-chip hardware
    (invisible on CPU test meshes, where Pallas auto-disables).
    """
    import dataclasses
    if cfg.backbone.fuse_insert is None:
        # auto: the fused KV-insert kernel pays at batch (+5.8% aggregate
        # at B=32 on v5e, tools/measure_kernels.py) where the per-layer
        # DUS dispatches are ~50 us/frame of fixed cost; solo decode
        # (TTSEngine, not built through this helper) leaves it off.
        cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
            cfg.backbone, fuse_insert=True))
    if mesh is None:
        return cfg
    model = mesh.shape.get("model", 1)

    def sub(c):
        # the kernels shard heads over "model": head count must divide
        if c.num_heads % model == 0:
            return dataclasses.replace(c, mesh=mesh)
        return dataclasses.replace(c, use_pallas_attn=False)

    return dataclasses.replace(
        cfg,
        on_mesh=True,   # fused flow net (no shard_map wrapper) gates on this
        backbone=sub(cfg.backbone),
        mimi=dataclasses.replace(
            cfg.mimi,
            transformer=sub(cfg.mimi.transformer),
            # the seanet megakernel shards streams over "data" only
            seanet=dataclasses.replace(cfg.mimi.seanet, mesh=mesh)))


class BatchedEngine:
    """Synthesize many sentences concurrently on one chip (vmap) or a mesh."""

    def __init__(self, engine: TTSEngine, mesh=None):
        self.engine = engine
        self.mesh = mesh
        # Kept LOCAL (self.cfg) — mutating engine.cfg would silently change
        # the caller's solo engine too.
        self.cfg = mesh_cfg(engine.cfg, mesh)

    def prime_voices(self, prompts: Sequence[np.ndarray]):
        """prompts: list of (Tp_i, d_model) arrays -> stacked voice states.
        All prompts pad to one bucket so the slot cursor stays uniform."""
        eng = self.engine
        tp = max(_bucket(p.shape[0], (32, 64, 128, 256)) for p in prompts)
        padded = np.stack([
            np.pad(np.asarray(p, np.float32), ((0, tp - p.shape[0]), (0, 0)))
            for p in prompts])
        n_valid = jnp.asarray([p.shape[0] for p in prompts], jnp.int32)
        states = stack_states([backbone.init_state(self.cfg.backbone,
                                                   eng.dtype)
                               for _ in prompts])
        return batched_prime_voice(eng.params, self.cfg, states,
                                   jnp.asarray(padded, eng.dtype), n_valid)

    def synthesize_batch(self, texts: List[str], voice_states,
                         temp: float = 0.6) -> List[np.ndarray]:
        """One prepared sentence per stream -> list of PCM arrays."""
        eng = self.engine
        b = len(texts)
        prepared = [prepare_text_prompt(t) for t in texts]
        ids = [eng.tokenizer.encode(t) for t, _ in prepared]
        tp = max(_bucket(len(i)) for i in ids)
        tokens = jnp.asarray(np.stack([
            np.pad(np.asarray(i, np.int32), (0, tp - len(i))) for i in ids]))
        n_valid = jnp.asarray([len(i) for i in ids], jnp.int32)
        max_steps = np.asarray(
            [int((count_words(t) + 2.0) * eng.cfg.mimi.frame_rate)
             for t, _ in prepared], np.int32)
        cap = eng._sentence_capacity(tp, int(max_steps.max()),
                                     prompt_slots=int(voice_states.end))
        if cap < self.cfg.backbone.kv_capacity:
            voice_states = backbone.shrink_state(voice_states, cap)
        states = batched_sentence_prefill(
            eng.params, self.cfg, voice_states, eng._mimi_template, tokens,
            n_valid)
        if self.mesh is not None:
            from ..parallel.sharding import shard_batched_state
            states = shard_batched_state(states, self.mesh)
        fae = jnp.asarray([g + 2 for _, g in prepared], jnp.int32)
        scan_len = -(-int(max_steps.max()) // _SCAN_BUCKET) * _SCAN_BUCKET
        rngs = jnp.stack([eng._next_rng() for _ in range(b)])
        _, pcm, valid = batched_decode_sentence(
            eng.params, self.cfg, states, rngs,
            jnp.full((b,), temp, eng.dtype), fae,
            jnp.asarray(max_steps), scan_len)
        pcm = np.asarray(pcm)
        valid = np.asarray(valid)
        return [pcm[i, valid[i]].reshape(-1) for i in range(b)]
