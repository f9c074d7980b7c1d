"""Multi-stream serving: cohort-batched AND continuously-batched synthesis.

BASELINE config 5 ("multi-stream realtime serving, p50 first-frame latency
SLO"). Two schedulers over the same batched runtime:

- MultiStreamServer: fixed cohorts — requests queue, prefill together,
  decode in chunks. Simple, but a late request waits for the cohort.
- ContinuousBatchingServer: per-chunk admission into a RUNNING batch. The
  slot/position decoupling makes this possible with batch-uniform slot
  cursors: a joining lane's KV prefix is written wholesale (admit_group),
  its positions/step/mimi-start are stream-relative, and its future KV
  writes share the batch's slot cursor. A request submitted mid-decode
  starts within <= chunk_frames and its audio equals solo synthesis.

Per-request TTFA / completion latency is recorded and summarized p50/p95.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models import backbone, mimi, tts
from ..text.preprocess import count_words, prepare_text_prompt
from .batched import (_axes_like, admit_group, batched_decode_sentence,
                      batched_prime_voice, batched_sentence_prefill,
                      compact_batch, continuous_decode_chunk,
                      empty_batch_state, mesh_cfg, stack_states)
from .engine import TTSEngine, _bucket, _SCAN_BUCKET


@dataclasses.dataclass
class Request:
    text: str
    voice: str
    temp: float = 0.6
    submitted_at: float = 0.0
    ttfa_s: Optional[float] = None
    done_at: Optional[float] = None
    pcm: Optional[np.ndarray] = None
    chunks: Optional[List[np.ndarray]] = None
    # step-counter bookkeeping (ContinuousBatchingServer): wall clocks
    # through this environment's TPU tunnel are transport noise, so TTFA is
    # also recorded in SCHEDULING units — decode chunks waited before
    # admission and until first audio — which bench.py converts to device
    # time using per-chunk device traces.
    submit_step: Optional[int] = None
    admit_step: Optional[int] = None
    first_audio_step: Optional[int] = None

    @property
    def latency_s(self):
        return None if self.done_at is None else (self.done_at
                                                  - self.submitted_at)


class MultiStreamServer:
    def __init__(self, engine: TTSEngine, max_batch: int = 32, mesh=None,
                 chunk_frames: int = _SCAN_BUCKET):
        self.engine = engine
        self.max_batch = max_batch
        self.mesh = mesh
        # decode cfg for THIS mesh (never raw engine.cfg: un-partitionable
        # Mosaic custom calls would crash sharded runs — see mesh_cfg)
        self.cfg = mesh_cfg(engine.cfg, mesh)
        self.chunk_frames = chunk_frames
        self._voices: Dict[str, int] = {}
        self._voice_states = None
        self._queue: List[Request] = []
        self.completed: List[Request] = []

    # -- voices -------------------------------------------------------------
    def register_voices(self, prompts: Dict[str, np.ndarray]):
        """Prime all voices at once (shared prompt bucket -> uniform slot
        cursor across the cohort)."""
        eng = self.engine
        names = list(prompts)
        arrs = [np.asarray(prompts[n], np.float32) for n in names]
        tp = max(_bucket(a.shape[0], (32, 64, 128, 256)) for a in arrs)
        padded = jnp.asarray(np.stack(
            [np.pad(a, ((0, tp - a.shape[0]), (0, 0))) for a in arrs]),
            eng.dtype)
        n_valid = jnp.asarray([a.shape[0] for a in arrs], jnp.int32)
        states = stack_states([backbone.init_state(self.cfg.backbone,
                                                   eng.dtype)
                               for _ in arrs])
        self._voice_states = batched_prime_voice(eng.params, self.cfg, states,
                                                 padded, n_valid)
        self._voices = {n: i for i, n in enumerate(names)}

    def _gather_voice_states(self, names: Sequence[str]):
        idx = jnp.asarray([self._voices[n] for n in names], jnp.int32)
        axes = _axes_like(self._voice_states)
        return jax.tree.map(
            lambda a, x: x if a is None else x[idx], axes,
            self._voice_states, is_leaf=lambda x: x is None)

    # -- requests -----------------------------------------------------------
    def submit(self, text: str, voice: str, temp: float = 0.6) -> Request:
        req = Request(text=text, voice=voice, temp=temp,
                      submitted_at=time.perf_counter())
        self._queue.append(req)
        return req

    def run_pending(self):
        """Drain the queue in cohorts of max_batch. A request whose text
        exceeds the largest token bucket is evicted and the error raised —
        AFTER the fitting requests gathered so far have run (an eviction
        must never lose its cohort siblings)."""
        while self._queue:
            cohort, err = [], None
            while self._queue and len(cohort) < self.max_batch:
                req = self._queue[0]
                try:
                    if getattr(req, "_prep", None) is None:
                        text, guess = prepare_text_prompt(req.text)
                        req._prep = (text, guess,
                                     self.engine.tokenizer.encode(text))
                    _bucket(len(req._prep[2]))
                except ValueError as e:
                    self._queue.pop(0)  # evict the oversized request
                    err = e
                    break
                self._queue.pop(0)
                cohort.append(req)
            if cohort:
                self._run_cohort(cohort)
            if err is not None:
                raise err

    def _run_cohort(self, cohort: List[Request]):
        eng = self.engine
        # pad the cohort to a fixed batch so one program serves all sizes
        reqs = list(cohort)
        while len(reqs) < self.max_batch:
            reqs.append(reqs[-1])
        b = len(reqs)

        prepared = [(r._prep[0], r._prep[1])
                    if getattr(r, "_prep", None) is not None
                    else prepare_text_prompt(r.text) for r in reqs]
        ids = [r._prep[2] if getattr(r, "_prep", None) is not None
               else eng.tokenizer.encode(t)
               for r, (t, _) in zip(reqs, prepared)]
        tp = max(_bucket(len(i)) for i in ids)
        tokens = jnp.asarray(np.stack(
            [np.pad(np.asarray(i, np.int32), (0, tp - len(i)))
             for i in ids]))
        n_valid = jnp.asarray([len(i) for i in ids], jnp.int32)
        max_steps_np = np.asarray(
            [int((count_words(t) + 2.0) * eng.cfg.mimi.frame_rate)
             for t, _ in prepared], np.int32)
        max_steps_np[len(cohort):] = 0  # padding lanes stop at frame 0

        vstates = self._gather_voice_states([r.voice for r in reqs])
        cap = eng._sentence_capacity(tp, int(max_steps_np.max()),
                                     prompt_slots=int(vstates.end))
        if cap < self.cfg.backbone.kv_capacity:
            vstates = backbone.shrink_state(vstates, cap)
        states = batched_sentence_prefill(
            eng.params, self.cfg, vstates, eng._mimi_template, tokens,
            n_valid)
        if self.mesh is not None:
            from ..parallel.sharding import shard_batched_state
            states = shard_batched_state(states, self.mesh)

        max_steps = jnp.asarray(max_steps_np)
        fae = jnp.asarray([g + 2 for _, g in prepared], jnp.int32)
        temps = jnp.asarray([r.temp for r in reqs], jnp.float32)
        rngs = jnp.stack([eng._next_rng() for _ in range(b)])
        total = int(np.asarray(max_steps).max())

        chunks: List[List[np.ndarray]] = [[] for _ in cohort]
        offset = 0
        while offset < total:
            states, pcm, valid = batched_decode_sentence(
                eng.params, self.cfg, states, rngs, temps, fae, max_steps,
                self.chunk_frames, rng_offset=offset)
            pcm = np.asarray(pcm)
            valid = np.asarray(valid)
            now = time.perf_counter()
            for i, req in enumerate(cohort):
                nv = int(valid[i].sum())
                if nv > 0:
                    if req.ttfa_s is None:
                        req.ttfa_s = now - req.submitted_at
                    chunks[i].append(pcm[i, :nv].reshape(-1))
            offset += self.chunk_frames
            if not valid.any():
                break

        now = time.perf_counter()
        for i, req in enumerate(cohort):
            req.pcm = (np.concatenate(chunks[i]) if chunks[i]
                       else np.zeros(0, np.float32))
            req.chunks = chunks[i]
            req.done_at = now
            self.completed.append(req)

    # -- stats ----------------------------------------------------------------
    def stats(self) -> dict:
        return _stats(self.completed, self.engine.frame_size)


def _stats(completed: List[Request], frame_size: int) -> dict:
    ttfa = sorted(r.ttfa_s for r in completed if r.ttfa_s is not None)
    lat = sorted(r.latency_s for r in completed if r.latency_s is not None)

    def pct(xs, p):
        return None if not xs else xs[min(len(xs) - 1, int(p * len(xs)))]

    frames = sum(r.pcm.size for r in completed
                 if r.pcm is not None) / frame_size
    return {
        "requests": len(completed),
        "frames": int(frames),
        "p50_ttfa_s": pct(ttfa, 0.50),
        "p95_ttfa_s": pct(ttfa, 0.95),
        "p50_latency_s": pct(lat, 0.50),
        "p95_latency_s": pct(lat, 0.95),
    }


class ContinuousBatchingServer:
    """Per-chunk admission of new requests into a running batch.

    B lanes decode together under one compiled program; between chunks,
    finished lanes are re-filled from the queue.

    Default (ring=True) the backbone KV is a PREFIX+RING: slots
    [0, prefix_slots) hold each lane's prompt+text prefix, and the shared
    decode cursor wraps inside [prefix_slots, capacity). A slot is safely
    recycled because a row only has to outlive its own sentence, and
    admission bounds every request to the ring size; per-slot positions
    (not slot indices) key RoPE and masking, so wrapping is invisible to
    attention. No epochs, no exhaustion stalls, no compaction pauses, and
    the cache array stays snug — full-array reads measured ~1.7x the
    bandwidth of same-sized prefix reads from a larger array (v5e).

    ring=False falls back to the linear-cursor epoch design: a request is
    admitted only if its worst-case frame budget fits in the remaining
    capacity; when nothing fits and all lanes are idle the epoch resets,
    and between exhaustions eager compaction (compact_margin) keeps the
    cursor near the true live-row maximum.

    New capability vs the reference (batch hard-coded 1,
    mimi_transformer.h:326-327) and vs cohort serving (a lone request no
    longer pays (B-1)/B waste and a late request no longer waits a cohort).
    """

    def __init__(self, engine: TTSEngine, lanes: int = 32,
                 capacity: Optional[int] = None, chunk_frames: int = 5,
                 text_bucket: int = 64, ring: bool = True,
                 compact_margin: Optional[int] = 128, mesh=None,
                 share_prefix: bool = False):
        # lanes=32 from BENCH r3: aggregate serving throughput still rises
        # through B=32 (27.5k bf16 / 38.3k int4+int8KV) to B=64 (40.1k) and
        # p50 TTFA at 32 lanes stays ~6 ms device-time; 8 lanes left ~4x
        # weight-stream amortization on the table. Lower it for
        # latency-critical, lightly-loaded deployments.
        self.engine = engine
        self.lanes = lanes
        self.capacity = capacity or engine.cfg.backbone.kv_capacity
        self.chunk_frames = chunk_frames
        self.text_bucket = text_bucket
        self.ring = ring
        # share_prefix: every lane of a voice attends ONE shared copy of
        # the voice's prompt KV (backbone.BackboneState.pk/pv) instead of
        # holding it in its own cache — the prompt bytes (128 of 416
        # slots in the r3 bench shape) stream from HBM once per frame for
        # the whole batch, and `capacity` then budgets TEXT + ring only.
        # vLLM-style prefix sharing; requires ring mode.
        self.share_prefix = share_prefix
        if share_prefix:
            assert ring, "share_prefix requires the prefix+ring KV mode"
        self._prefix_tables = None
        # (ring=False only) eager compaction: reads scale with the slot
        # cursor, and finished lanes leave garbage rows below it. The host
        # knows every live lane's EXACT valid-row count (prompt rows + text
        # tokens + frames decoded — KV writes are unconditional), so when
        # cursor - max(live rows) >= compact_margin slots of garbage have
        # accrued, one compact_batch (a full cache gather, ~1 chunk of
        # device time) pulls the cursor back down instead of letting it
        # drift to `capacity` between epoch exhaustions. r3 attribution:
        # the drifted cursor made flash-decode reads 2.9x the cohort's.
        # None disables (exhaustion-only compaction).
        self.compact_margin = compact_margin
        self.mesh = mesh
        # decode cfg for THIS mesh (never raw engine.cfg — see mesh_cfg)
        self.cfg = mesh_cfg(engine.cfg, mesh)
        self._voice_states: Dict[str, backbone.BackboneState] = {}
        # share_prefix: per-voice (pk, pv, ppos) from split_prefix, kept so
        # incremental register_voices calls can rebuild the concatenated
        # tables over ALL voices (not just the latest call's)
        self._voice_tables: Dict[str, tuple] = {}
        self.prompt_pad: Optional[int] = None
        self._queue: List[Request] = []
        self._live: List[Optional[Request]] = [None] * lanes
        self._chunks: List[List[np.ndarray]] = [[] for _ in range(lanes)]
        self.completed: List[Request] = []
        self.steps = 0  # decode chunks executed (scheduling clock)
        self.compactions = 0  # epoch-exhaustion compactions performed
        # compaction reclaims finished lanes' slots + admission-point gaps;
        # until another lane finishes, re-compacting frees ~nothing — gate
        self._compact_useful = True
        self.batch: Optional[tts.StreamState] = None
        eng = engine
        self._rngs = np.zeros((lanes, 2), np.uint32)
        self._temps = np.zeros((lanes,), np.float32)
        self._fae = np.ones((lanes,), np.int32)
        self._max_steps = np.zeros((lanes,), np.int32)
        self._rows0 = np.zeros((lanes,), np.int32)  # valid rows at admission
        self._voice_rows: Dict[str, int] = {}

    @property
    def prefix_slots(self) -> int:
        assert self.prompt_pad is not None, "register_voices first"
        if self.share_prefix:  # the prompt lives in the shared tables
            return self.text_bucket
        return self.prompt_pad + self.text_bucket

    # -- voices --------------------------------------------------------------
    def register_voices(self, prompts: Dict[str, np.ndarray]):
        """Prime each voice at a COMMON prompt bucket so every admission's
        prefill lands exactly on the uniform prefix budget.

        Callable again to add voices. Anything that changes the lane
        cache shapes — the serving capacity tightening to what the voice
        residuals actually hold, the prefix budget growing, or (share
        mode) the concatenated prompt tables growing — forces a fresh
        epoch, so incremental registration requires an idle server
        (no live requests); queued requests survive."""
        eng = self.engine
        arrs = {n: np.asarray(a, np.float32).reshape(-1, a.shape[-1])
                for n, a in prompts.items()}
        tp = max(_bucket(a.shape[0], (32, 64, 128, 256))
                 for a in arrs.values())
        # monotonic across incremental calls: earlier voices were primed
        # at the old bucket and must still fit the shared prefix budget
        tp = max(tp, self.prompt_pad or 0)
        residuals = {}
        for name, a in arrs.items():
            padded = jnp.asarray(
                np.pad(a, ((0, tp - a.shape[0]), (0, 0))), eng.dtype)
            state = backbone.init_state(self.cfg.backbone, eng.dtype)
            vstate = tts.jit_prime_voice(
                eng.params, self.cfg, state, padded,
                jnp.int32(a.shape[0]))
            if self.share_prefix:
                self._voice_tables[name], vstate = backbone.split_prefix(
                    vstate, tp, self.cfg.backbone.num_heads, eng.dtype)
            residuals[name] = vstate
            self._voice_rows[name] = a.shape[0]
        # Lane caches must match the voice caches EXACTLY (admission
        # copies voice rows into lanes), so the serving capacity clamps
        # to what a residual actually holds: kv_capacity - prompt_pad in
        # share mode (the prompt moved out to the tables), kv_capacity
        # otherwise. An explicit smaller `capacity` shrinks further.
        avail = min(v.k[0].shape[-2] for v in residuals.values())
        new_cap = min(self.capacity, avail)
        changed = (new_cap != self.capacity
                   or tp != (self.prompt_pad or tp))
        if new_cap < self.capacity:
            # tighten previously registered voices to the new budget too
            self._voice_states = {
                n: backbone.shrink_state(v, new_cap)
                for n, v in self._voice_states.items()}
            self.capacity = new_cap
        residuals = {n: (backbone.shrink_state(v, self.capacity)
                         if self.capacity < v.k[0].shape[-2] else v)
                     for n, v in residuals.items()}
        self.prompt_pad = tp
        self._voice_states.update(residuals)
        if self.share_prefix:
            # ALL voices' tables concatenate along the slot axis; each
            # lane's ppos row unmasks only its own voice's segment.
            # Rebuilt over every registered voice so incremental calls
            # keep earlier voices attending their own (re-offset) rows.
            names = list(self._voice_tables)
            nl = self.cfg.backbone.num_layers
            # head-major (H, P, D) tables concatenate along the SLOT axis
            pk_all = tuple(jnp.concatenate(
                [self._voice_tables[n][0][l] for n in names], 1)
                for l in range(nl))
            pv_all = tuple(jnp.concatenate(
                [self._voice_tables[n][1][l] for n in names], 1)
                for l in range(nl))
            if (self._prefix_tables is not None
                    and pk_all[0].shape != self._prefix_tables[0][0].shape):
                changed = True
            self._prefix_tables = (pk_all, pv_all)
            pv_total = pk_all[0].shape[1]
            off = 0
            for n in names:
                seg = self._voice_tables[n][2]
                ppos = jnp.full((pv_total,), -1, jnp.int32)
                ppos = jax.lax.dynamic_update_slice(ppos, seg, (off,))
                off += seg.shape[0]
                self._voice_states[n] = self._voice_states[n].replace(
                    pk=pk_all, pv=pv_all, ppos=ppos)
        if changed and self.batch is not None:
            if any(r is not None for r in self._live):
                raise ValueError(
                    "register_voices changed the lane cache shapes while "
                    "requests are live; drain the server first")
            self.batch = None  # next _admit builds a fresh epoch

    # -- requests --------------------------------------------------------------
    def submit(self, text: str, voice: str, temp: float = 0.6,
               rng=None) -> Request:
        req = Request(text=text, voice=voice, temp=temp,
                      submitted_at=time.perf_counter(),
                      submit_step=self.steps)
        req._rng = rng  # optional explicit PRNG key (determinism tests)
        self._queue.append(req)
        return req

    def _validate(self, req: Request):
        """Tokenize + bound-check a request BEFORE it is committed to an
        admission group (cached on the request for _prefill_many). Raising
        here is safe: the request is still at the front of the queue and
        no sibling has been popped."""
        if getattr(req, "_prep", None) is None:
            text, guess = prepare_text_prompt(req.text)
            req._prep = (text, guess, self.engine.tokenizer.encode(text))
        text, _, ids = req._prep
        if len(ids) > self.text_bucket:
            raise ValueError(
                f"request is {len(ids)} tokens > text_bucket "
                f"{self.text_bucket}; split it (engine.synthesize "
                "re-chunks)")
        return int((count_words(text) + 2.0)
                   * self.engine.cfg.mimi.frame_rate) + 8

    def _prefill_many(self, reqs: Sequence[Request]):
        """ONE batched prefill for a whole admission group (each per-request
        prefill used to be its own dispatch — under churn the prefills were
        a large fraction of total device time). The group pads to a
        power-of-two lane count so only log2(lanes) program shapes compile.
        Returns (stacked padded StreamState, [(max_steps, fae, n_tokens)])."""
        eng = self.engine
        metas, ids_list = [], []
        for req in reqs:
            text, guess, ids = req._prep  # cached by _validate at admission
            assert len(ids) <= self.text_bucket
            ids_list.append(ids)
            metas.append((int((count_words(text) + 2.0)
                              * eng.cfg.mimi.frame_rate), guess + 2,
                          len(ids)))
        k = 1
        while k < len(reqs):
            k *= 2
        tokens = np.zeros((k, self.text_bucket), np.int32)
        n_valid = np.zeros((k,), np.int32)
        for i, ids in enumerate(ids_list):
            tokens[i, : len(ids)] = ids
            n_valid[i] = len(ids)
        vstates = stack_states(
            [self._voice_states[req.voice] for req in reqs]
            + [self._voice_states[reqs[-1].voice]] * (k - len(reqs)))
        batch = batched_sentence_prefill(
            eng.params, self.cfg, vstates, eng._mimi_template,
            jnp.asarray(tokens), jnp.asarray(n_valid))
        return batch, metas

    def _reset_epoch(self):
        eng = self.engine
        self._compact_useful = True
        self.batch = empty_batch_state(eng.params, self.cfg, self.lanes,
                                       self.capacity, self.prefix_slots,
                                       eng.dtype, ring=self.ring,
                                       prefix_tables=self._prefix_tables)
        if self.mesh is not None:
            from ..parallel.sharding import shard_batched_state
            self.batch = shard_batched_state(self.batch, self.mesh)

    def _admit(self):
        """Fill idle lanes from the queue (between decode chunks): pick the
        admissible (lane, request) group first, prefill it in ONE batched
        dispatch, then insert the whole group in one donated write."""
        if self.batch is None:
            self._reset_epoch()
        if self.ring:
            # ring admission: a lane is admissible whenever it is idle —
            # the only constraint is that the request's worst-case frame
            # budget fits the ring (slot recycling needs a row to survive
            # only its own sentence)
            group = []
            ring_slots = self.capacity - self.prefix_slots
            try:
                for lane in range(self.lanes):
                    if not self._queue or self._live[lane] is not None:
                        continue
                    req = self._queue[0]
                    try:
                        need = self._validate(req)
                    except ValueError:
                        self._queue.pop(0)  # evict the rejected request
                        raise
                    if need > ring_slots:
                        self._queue.pop(0)
                        raise ValueError(
                            f"request needs {need} frames > ring capacity "
                            f"{ring_slots} ({self.capacity} - "
                            f"{self.prefix_slots} prefix); split it or grow "
                            "capacity")
                    self._queue.pop(0)
                    group.append((lane, req))
            finally:
                # a raise mid-loop must not lose the already-popped group
                self._admit_group(group)
            return
        end = int(np.asarray(self.batch.flow.end))
        # eager compaction: reclaim finished lanes' garbage once it exceeds
        # the margin (see __init__) — the cursor, not the capacity, sets the
        # per-frame attention read size
        live_lanes = [r is not None for r in self._live]
        if (self.compact_margin is not None and any(live_lanes)
                and self._compact_useful):
            est_max = max(
                int(self._rows0[lane])
                + (self.steps - r.admit_step) * self.chunk_frames
                for lane, r in enumerate(self._live) if r is not None)
            if end - max(est_max, self.prefix_slots) >= self.compact_margin:
                self.batch = compact_batch(
                    self.batch, jnp.asarray(np.asarray(live_lanes)),
                    self.prefix_slots)
                self.compactions += 1
                self._compact_useful = False
                end = int(np.asarray(self.batch.flow.end))
        group = []
        compacted = False
        try:
            for lane in range(self.lanes):
                if not self._queue or self._live[lane] is not None:
                    continue
                req = self._queue[0]
                try:
                    # worst-case frames this request needs from its
                    # admission point (also bound-checks the text)
                    need = self._validate(req)
                except ValueError:
                    self._queue.pop(0)  # evict the rejected request
                    raise
                if end + need > self.capacity and not compacted:
                    # slot budget exhausted: compact live lanes' rows to the
                    # cache front and pull the shared cursor back (finished
                    # lanes' slots are reclaimed without draining the epoch)
                    live = np.asarray([r is not None for r in self._live])
                    if live.any() and self._compact_useful:
                        self.batch = compact_batch(
                            self.batch, jnp.asarray(live), self.prefix_slots)
                        self.compactions += 1
                        self._compact_useful = False
                        end = int(np.asarray(self.batch.flow.end))
                    elif not live.any():
                        self._reset_epoch()
                        end = self.prefix_slots
                    compacted = True
                if end + need > self.capacity:
                    if not group and all(r is None for r in self._live):
                        self._queue.pop(0)
                        raise ValueError(
                            f"request needs {need} frames + {end} prefix "
                            f"slots > capacity {self.capacity}")
                    break  # even compacted, the live lanes fill the budget
                self._queue.pop(0)
                group.append((lane, req))
        finally:
            # a raise mid-loop must not lose the already-popped group
            self._admit_group(group)

    def _drop_epoch(self, extra_requeue=()):
        """A DONATED dispatch failed: its buffers may be consumed. Reset
        the epoch and put every affected request back at the queue front
        to restart from scratch (seeded requests reproduce their audio)."""
        for req in reversed(list(extra_requeue)):
            self._queue.insert(0, req)
        for lane, req in enumerate(self._live):
            if req is not None:
                req.ttfa_s = None
                req.first_audio_step = None
                req.admit_step = None
                self._queue.insert(0, req)
                self._live[lane] = None
                self._chunks[lane] = []
        self.batch = None

    def _admit_group(self, group):
        if not group:
            return
        fresh, metas = self._prefill_many([r for _, r in group])
        # ONE donated-in-place dispatch admits the whole group; the
        # prefill's power-of-two padding lanes get distinct out-of-range
        # indices (sorted after the real ones) so their writes drop
        k = int(fresh.step.shape[0])
        lane_idx = np.asarray(
            [lane for lane, _ in group]
            + list(range(self.lanes, self.lanes + k - len(group))),
            np.int32)
        try:
            self.batch = admit_group(self.batch, jnp.asarray(lane_idx),
                                     fresh)
        except Exception:
            self._drop_epoch(extra_requeue=[r for _, r in group])
            raise
        for (lane, req), (max_steps, fae, n_tok) in zip(group, metas):
            rng = (req._rng if req._rng is not None
                   else self.engine._next_rng())
            self._rngs[lane] = np.asarray(rng)
            self._temps[lane] = req.temp
            self._fae[lane] = fae
            self._max_steps[lane] = max_steps
            self._rows0[lane] = self._voice_rows[req.voice] + n_tok
            self._live[lane] = req
            self._chunks[lane] = []
            req.admit_step = self.steps

    def step(self) -> int:
        """One admission + one decode chunk. Returns frames emitted."""
        self._admit()
        if all(r is None for r in self._live):
            return 0
        eng = self.engine
        try:
            self.batch, pcm, valid = continuous_decode_chunk(
                eng.params, self.cfg, self.chunk_frames, self.batch,
                jnp.asarray(self._rngs), jnp.asarray(self._temps),
                jnp.asarray(self._fae), jnp.asarray(self._max_steps))
        except Exception:
            # the batch state is DONATED into the dispatch, so a failure
            # here (transient device/runtime error) may have consumed its
            # buffers — drop the epoch and restart the live requests from
            # scratch instead of decoding over lost state. Requests keep
            # their explicit rng (temp-0/seeded audio is unchanged); audio
            # already handed to the caller is simply re-generated.
            self._drop_epoch()
            raise
        pcm = np.asarray(pcm)
        valid = np.asarray(valid)
        done = np.asarray(self.batch.done)
        now = time.perf_counter()
        self.steps += 1
        emitted = 0
        for lane, req in enumerate(self._live):
            if req is None:
                continue
            nv = int(valid[lane].sum())
            if nv > 0:
                if req.ttfa_s is None:
                    req.ttfa_s = now - req.submitted_at
                    req.first_audio_step = self.steps
                self._chunks[lane].append(pcm[lane, valid[lane]].reshape(-1))
                emitted += nv
            if bool(done[lane]):
                req.pcm = (np.concatenate(self._chunks[lane])
                           if self._chunks[lane]
                           else np.zeros(0, np.float32))
                req.chunks = self._chunks[lane]
                req.done_at = now
                self.completed.append(req)
                self._live[lane] = None
                self._chunks[lane] = []
                self._compact_useful = True
        return emitted

    def run_pending(self, max_chunks: int = 10_000):
        for _ in range(max_chunks):
            if not self._queue and all(r is None for r in self._live):
                return
            self.step()
        raise RuntimeError("run_pending did not drain the queue")

    def stats(self) -> dict:
        return _stats(self.completed, self.engine.frame_size)
