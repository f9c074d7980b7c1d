"""Multi-stream serving: cohort-batched synthesis with latency accounting.

BASELINE config 5 ("multi-stream realtime serving, p50 first-frame latency
SLO"): requests queue up, form fixed-size cohorts, prefill batched, and
decode in 2-second chunks so audio streams out per request while the cohort
is still generating. Per-request TTFA / completion latency is recorded and
summarized as p50/p95.

Cohorts keep the cache slot cursors batch-uniform (see runtime/batched.py):
all member sentences start together. Continuous per-frame admission
(joining a running batch) would need per-stream slot cursors — see
CLAUDE.md perf notes; future work.
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
from .batched import (_axes_like, batched_decode_sentence,
                      batched_prime_voice, batched_sentence_prefill,
                      stack_states)
from .engine import TTSEngine, _bucket, _SCAN_BUCKET


@dataclasses.dataclass
class Request:
    text: str
    voice: str
    temp: float = 0.7
    submitted_at: float = 0.0
    ttfa_s: Optional[float] = None
    done_at: Optional[float] = None
    pcm: Optional[np.ndarray] = None
    chunks: Optional[List[np.ndarray]] = None

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
        states = stack_states([backbone.init_state(eng.cfg.backbone,
                                                   eng.dtype)
                               for _ in arrs])
        self._voice_states = batched_prime_voice(eng.params, eng.cfg, states,
                                                 padded, n_valid)
        self._voices = {n: i for i, n in enumerate(names)}

    def _gather_voice_states(self, names: Sequence[str]):
        idx = jnp.asarray([self._voices[n] for n in names], jnp.int32)
        axes = _axes_like(self._voice_states)
        return jax.tree.map(
            lambda a, x: x if a is None else x[idx], axes,
            self._voice_states, is_leaf=lambda x: x is None)

    # -- requests -----------------------------------------------------------
    def submit(self, text: str, voice: str, temp: float = 0.7) -> Request:
        req = Request(text=text, voice=voice, temp=temp,
                      submitted_at=time.perf_counter())
        self._queue.append(req)
        return req

    def run_pending(self):
        """Drain the queue in cohorts of max_batch."""
        while self._queue:
            cohort = self._queue[: self.max_batch]
            self._queue = self._queue[self.max_batch:]
            self._run_cohort(cohort)

    def _run_cohort(self, cohort: List[Request]):
        eng = self.engine
        # pad the cohort to a fixed batch so one program serves all sizes
        reqs = list(cohort)
        while len(reqs) < self.max_batch:
            reqs.append(reqs[-1])
        b = len(reqs)

        prepared = [prepare_text_prompt(r.text) for r in reqs]
        ids = [eng.tokenizer.encode(t) for t, _ in prepared]
        tp = max(_bucket(len(i)) for i in ids)
        tokens = jnp.asarray(np.stack(
            [np.pad(np.asarray(i, np.int32), (0, tp - len(i)))
             for i in ids]))
        n_valid = jnp.asarray([len(i) for i in ids], jnp.int32)
        max_steps_np = np.asarray(
            [int((count_words(t) + 2.0) * eng.cfg.mimi.frame_rate)
             for t, _ in prepared], np.int32)

        vstates = self._gather_voice_states([r.voice for r in reqs])
        cap = eng._sentence_capacity(tp, int(max_steps_np.max()))
        if cap < eng.cfg.backbone.kv_capacity:
            vstates = backbone.shrink_state(vstates, cap)
        states = batched_sentence_prefill(
            eng.params, eng.cfg, vstates, eng._mimi_template, tokens, n_valid)
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
                eng.params, eng.cfg, states, rngs, temps, fae, max_steps,
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
        ttfa = sorted(r.ttfa_s for r in self.completed
                      if r.ttfa_s is not None)
        lat = sorted(r.latency_s for r in self.completed
                     if r.latency_s is not None)

        def pct(xs, p):
            return None if not xs else xs[min(len(xs) - 1,
                                              int(p * len(xs)))]

        frames = sum(r.pcm.size for r in self.completed
                     if r.pcm is not None) / self.engine.frame_size
        return {
            "requests": len(self.completed),
            "frames": int(frames),
            "p50_ttfa_s": pct(ttfa, 0.50),
            "p95_ttfa_s": pct(ttfa, 0.95),
            "p50_latency_s": pct(lat, 0.50),
            "p95_latency_s": pct(lat, 0.95),
        }
