"""TTSEngine: model + jitted functions + host-side orchestration.

Python-surface equivalent of the reference C API
(`include/pocket_tts/pocket_tts.h:18-42`):

  ptts_init                  -> TTSEngine(model_path| params)
  ptts_set_seed/get_seed     -> engine.set_seed / engine.seed
  ptts_get_sample_rate/frame -> engine.sample_rate / engine.frame_size
  ptts_stream_from_safetensors -> engine.open_stream(voice, temp)
  generate_audio(_to_wav)    -> engine.synthesize(_to_wav)  [scan decode]

Variable-length conditioning is padded to shape buckets so jit compiles a
bounded set of programs (the reference rebuilds a ggml graph per shape every
step; XLA can't and shouldn't — SURVEY.md §7 hard part 1).
"""
from __future__ import annotations

import os
from collections import deque
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..io import params as params_io
from ..models import backbone, mimi, tts
from ..text.preprocess import (count_words, prepare_text_prompt,
                               split_into_best_sentences)
from ..text.tokenizer import load_tokenizer

# ref: src/pocket_tts.cpp:241-250
DEFAULT_VOICES = ["alba", "azelma", "cosette", "eponine", "fantine",
                  "javert", "jean", "marius"]

_TOKEN_BUCKETS = (16, 32, 64, 128, 256)
_PROMPT_BUCKET = 128
_SCAN_BUCKET = 25  # frames (2 s of audio) granularity for offline scan
MAX_SENTENCE_TOKENS = 50  # re-chunk budget, ref text.h:157-175


def _bucket(n: int, buckets=_TOKEN_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"conditioning too long: {n} tokens (max {buckets[-1]})")


class TTSEngine:
    def __init__(self, model_path: Optional[str] = None,
                 params: Optional[dict] = None,
                 cfg: Optional[ModelConfig] = None,
                 dtype=jnp.float32, seed: int = 0,
                 tokenizer=None, quantize: Optional[str] = None,
                 quantize_kv: bool = False, quantize_convs: bool = False,
                 allow_mock_tokenizer: bool = False):
        """Load weights (ptts_init analog, src/pocket_tts.cpp:273-322).

        quantize: None, "int8" or "int4" — per-channel quantized linear
        weights, the analog of the reference's Q8/Q4 GGUF path
        (src/loader.h:162-173). "q4_0" selects 32-element K-grouped
        scales — the reference's exact Q4_0 granularity — for real-weight
        checkpoints whose per-channel int4 error is outlier-dominated
        (see io/quant.quantization_error_report).
        quantize_kv: int8 backbone KV cache with per-row absmax scales —
        halves the decode attention's cache reads (the dominant batched
        cost once weights are quantized). Serving-throughput mode; slight
        quantization noise on the audio.
        """
        self.model_path = model_path
        if params is None:
            ckpt = os.path.join(model_path or ".",
                                "tts_b6369a24.safetensors")
            if not os.path.exists(ckpt):
                # GGUF-converted checkpoint fallback (from_gguf analog,
                # src/loader.h:85-99)
                gguf = os.path.join(model_path or ".", "tts_b6369a24.gguf")
                if os.path.exists(gguf):
                    ckpt = gguf
            params, cfg = params_io.load_checkpoint(ckpt, cfg, dtype)
        assert cfg is not None
        if quantize:
            if quantize not in ("int8", "q8", "int4", "q4", "q4_0"):
                raise ValueError(f"unknown quantization: {quantize}")
            from ..io.quant import quantize_params
            params = quantize_params(params, bits=4 if "4" in quantize
                                     else 8, convs=quantize_convs,
                                     group=32 if quantize == "q4_0" else 0)
        if quantize_kv:
            # backbone cache only: the mimi ring's int8 variant
            # (cfg.mimi.transformer.quantize_kv) measured a ~1.7% LOSS at
            # B=32 serving on v5e (tools/measure_mimi_kv.py — its small
            # cache is VMEM-resident per grid step, so the int8->bf16 cast
            # outweighs the halved reads); it stays a cfg-level opt-in
            import dataclasses
            cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
                cfg.backbone, quantize_kv=True))
        self.params = params
        self.cfg = cfg
        self.dtype = dtype
        self.seed = seed
        self._key = jax.random.PRNGKey(seed)
        self._sentence_counter = 0
        if tokenizer is None:
            if model_path is not None:
                # checkpoint-directory load: the release ships
                # tokenizer.model next to the weights — require it unless
                # the caller explicitly opts into the mock
                tok_path = os.path.join(model_path, cfg.lut.tokenizer_path)
                tokenizer = load_tokenizer(tok_path, cfg.lut.n_bins,
                                           allow_mock=allow_mock_tokenizer)
            else:
                tokenizer = load_tokenizer(None, cfg.lut.n_bins)
        self.tokenizer = tokenizer
        self._mimi_template = mimi.init_state(cfg.mimi, dtype)
        # per-sentence KV slot budgets are bucketed as
        # prompt_slot_budget + text_pad + max_steps (see _sentence_capacity);
        # attention reads scale with this, so over-provisioning is pure cost
        self.prompt_slot_budget = min(256, cfg.backbone.kv_capacity)

    # -- identity ----------------------------------------------------------
    @property
    def sample_rate(self) -> int:
        return self.cfg.mimi.sample_rate

    @property
    def frame_size(self) -> int:
        return self.cfg.mimi.frame_size

    def save_params_cache(self, path: str, gguf_quantize=None):
        """Persist the (possibly quantized) params pytree — the analog of
        the reference's GGUF conversion/save (src/loader.h:228-272).
        A .gguf path writes the interoperable GGUF container; gguf_quantize
        ("q8_0"/"q4_0") applies ggml block quantization at write time."""
        from ..io.quant import save_params_cache
        save_params_cache(self.params, path, gguf_quantize=gguf_quantize)

    @classmethod
    def from_params_cache(cls, path: str, cfg, **kw):
        from ..io.quant import load_params_cache
        return cls(params=load_params_cache(path), cfg=cfg, **kw)

    def set_seed(self, seed: int):
        self.seed = seed
        self._key = jax.random.PRNGKey(seed)
        self._sentence_counter = 0

    def _next_rng(self):
        self._sentence_counter += 1
        return jax.random.fold_in(self._key, self._sentence_counter)

    # -- conditioning ------------------------------------------------------
    def prime_voice(self, voice) -> backbone.BackboneState:
        """Build the reusable voice-conditioned KV prefix.

        voice: a default-voice name, a path to a voice .safetensors, or an
        (Tp, d_model) array. ref: src/pocket_tts.cpp:100-124,351-394.
        """
        if isinstance(voice, str):
            if voice in DEFAULT_VOICES:
                voice = os.path.join(self.model_path or ".", "embeddings",
                                     voice + ".safetensors")
            prompt = params_io.load_voice(voice, self.dtype)
        else:
            prompt = jnp.asarray(voice, self.dtype)
        n = prompt.shape[0]
        cap = self.cfg.backbone.kv_capacity
        step = min(_PROMPT_BUCKET, max(16, cap // 8))
        tp = _bucket(n, tuple(range(step, cap + 1, step)))
        if tp > self.prompt_slot_budget:
            raise ValueError(
                f"voice prompt needs {tp} slots > prompt_slot_budget "
                f"{self.prompt_slot_budget}; raise it on the engine")
        prompt = jnp.pad(prompt, ((0, tp - n), (0, 0)))
        state = backbone.init_state(self.cfg.backbone, self.dtype)
        return tts.jit_prime_voice(self.params, self.cfg, state, prompt,
                                   jnp.int32(n))

    def _sentence_capacity(self, token_pad: int, max_steps: int,
                           prompt_slots: Optional[int] = None) -> int:
        """Smallest 128-multiple slot budget covering this sentence.

        prompt_slots: the slots the voice prefix ACTUALLY occupies (its
        slot cursor) — attention reads scale with capacity, so sizing from
        the worst-case budget instead wastes up to 25% of decode bandwidth.
        """
        base = (self.prompt_slot_budget if prompt_slots is None
                else prompt_slots)
        need = base + token_pad + max_steps + 8
        cap = -(-need // 128) * 128
        return min(cap, self.cfg.backbone.kv_capacity)

    def _prefill_sentence(self, voice_state, text: str):
        """Returns (StreamState, max_steps)."""
        ids = self.tokenizer.encode(text)
        n = len(ids)
        tp = _bucket(n)
        max_steps = int((count_words(text) + 2.0) * self.cfg.mimi.frame_rate)
        cap = self._sentence_capacity(tp, max_steps,
                                      prompt_slots=int(voice_state.end))
        if cap < self.cfg.backbone.kv_capacity:
            voice_state = backbone.shrink_state(voice_state, cap)
        tokens = jnp.asarray(np.pad(np.asarray(ids, np.int32), (0, tp - n)))
        state = tts.jit_sentence_prefill(
            self.params, self.cfg, voice_state, self._mimi_template, tokens,
            jnp.int32(n))
        return state, max_steps

    # -- streaming ---------------------------------------------------------
    def open_stream(self, voice, temp: float = 0.6) -> "Stream":
        return Stream(self, self.prime_voice(voice), temp)

    # -- offline (scan) ----------------------------------------------------
    def synthesize_sentence(self, voice_state, text: str, temp: float,
                            frames_after_eos: int) -> np.ndarray:
        """One prepared sentence -> PCM float array, fully on device; the
        decode while-loop exits as soon as EOS + frames_after_eos is hit."""
        state, max_steps = self._prefill_sentence(voice_state, text)
        scan_len = -(-max_steps // _SCAN_BUCKET) * _SCAN_BUCKET
        _, pcm, valid = tts.jit_decode_sentence_early_exit(
            self.params, self.cfg, state, self._next_rng(),
            jnp.asarray(temp, self.dtype), jnp.int32(frames_after_eos),
            jnp.int32(max_steps), scan_len)
        pcm = np.asarray(pcm)
        n = int(np.asarray(valid).sum())
        return pcm[:n].reshape(-1)

    def synthesize(self, text: str, voice, temp: float = 0.6) -> np.ndarray:
        """Multi-sentence offline synthesis.
        ref: generate_audio, src/pocket_tts.cpp:189-213."""
        voice_state = voice if isinstance(voice, backbone.BackboneState) \
            else self.prime_voice(voice)
        chunks = split_into_best_sentences(self.tokenizer, text)
        out = []
        for chunk in chunks:
            prepared, guess = prepare_text_prompt(chunk)
            out.append(self.synthesize_sentence(
                voice_state, prepared, temp, guess + 2))
        return np.concatenate(out) if out else np.zeros(0, np.float32)

    def synthesize_to_wav(self, text: str, voice, path: str,
                          temp: float = 0.6):
        from ..io.wav import save_wav
        pcm = self.synthesize(text, voice, temp)
        save_wav(path, pcm, self.sample_rate)
        return pcm


class Stream:
    """Streaming send/flush/receive state machine.
    ref: ptts_stream_*, src/pocket_tts.cpp:333-519."""

    def __init__(self, engine: TTSEngine, voice_state, temp: float):
        self.engine = engine
        self.voice_state = voice_state
        self.temp = temp
        # native (GIL-free) splitter when csrc is built, else pure Python
        from ..native import make_str_processor
        self.sproc = make_str_processor()
        self.reset()

    def reset(self):
        self.state: Optional[tts.StreamState] = None
        self.max_gen_len = 0
        self._rng = None
        self._frames_after_eos = 0
        self._pending: deque = deque()
        self.sproc.reset()

    def send(self, chunk: str):
        """Empty chunk flushes (ref: src/pocket_tts.cpp:406-414)."""
        if chunk == "":
            self.flush()
        else:
            self.sproc.ingest(chunk)

    def flush(self):
        self.sproc.flush()

    def _sentence_init(self, text: str, frames_after_eos: int):
        eng = self.engine
        self.state, self.max_gen_len = eng._prefill_sentence(
            self.voice_state, text)
        self._frames_after_eos = frames_after_eos
        self._rng = eng._next_rng()
        self._nstep = 0

    def _step(self) -> Optional[np.ndarray]:
        eng = self.engine
        rng = jax.random.fold_in(self._rng, self._nstep)
        self._nstep += 1
        self.state, pcm, valid = tts.jit_frame_step(
            eng.params, eng.cfg, self.state, rng,
            jnp.asarray(self.temp, eng.dtype),
            jnp.int32(self._frames_after_eos), jnp.int32(self.max_gen_len))
        if not bool(valid):
            self.state = None
            return None
        return np.asarray(pcm)

    def _enqueue_chunks(self, text: str):
        """Bound a popped sentence to the 50-token budget.

        The streaming splitter imposes no token cap (a punctuation-free
        run-on is exactly its input), so over-long sentences re-chunk the
        same way the offline path does (text.h:126-177 analog) instead of
        overflowing the KV bucket.
        """
        eng = self.engine
        ids = eng.tokenizer.encode(text)
        if len(ids) <= MAX_SENTENCE_TOKENS:
            self._pending.append(text)
        else:
            self._pending.extend(
                c for c in split_into_best_sentences(
                    eng.tokenizer, text, MAX_SENTENCE_TOKENS) if c)

    def receive(self) -> Optional[np.ndarray]:
        """Next 80 ms PCM frame, or None if no audio is ready.
        ref: ptts_stream_receive, src/pocket_tts.cpp:494-519."""
        if self.state is not None:
            pcm = self._step()
            if pcm is not None:
                return pcm
        if not self._pending and self.sproc.sentences:
            self._enqueue_chunks(self.sproc.sentences.popleft())
        if self._pending:
            text = self._pending.popleft()
            n_words = count_words(text)
            guess = (3 if n_words <= 4 else 1) + 2
            self._sentence_init(text, guess)
            pcm = self._step()
            if pcm is not None:
                return pcm
        return None
