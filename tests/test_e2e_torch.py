"""Independent full-pipeline torch reference for the ORCHESTRATION layer.

The per-module torch tests (test_models.py) cannot catch orchestration-level
divergences: EOS frame emission off-by-one, denormalize order, voice-state
reuse across sentences, mimi reset timing, the capacity stop. This harness
composes the same independent torch ports into one complete text -> PCM
pipeline — cache-free full-sequence backbone recomputed per autoregressive
step, offline mimi chain — and asserts `engine.synthesize` matches at
temp 0. With real weights unavailable in this environment, this is the
strongest correctness instrument available (VERDICT r2 next #3).

ref orchestration: /root/reference/src/pocket_tts.cpp:416-519
(_stream_sentence_init/_stream_sentence_step), generate_audio :189-213.
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pocket_tts_tpu.io.params import params_from_flat, random_voice_prompt
from pocket_tts_tpu.runtime.engine import TTSEngine, _bucket
from pocket_tts_tpu.text.preprocess import (count_words, prepare_text_prompt,
                                            split_into_best_sentences)
from pocket_tts_tpu.text.tokenizer import MockTokenizer

import test_models as tm
from test_models import (CFG, CFG0, FLAT, t_linear, torch_backbone,
                         torch_flow_net, torch_mimi_transformer,
                         torch_seanet_offline)

TOK = MockTokenizer(CFG.lut.n_bins)


def _torch_decode_sentence(flat, voice_rows, ids, fae, max_steps, n_cap):
    """Autoregressive latent loop, NO KV cache: each step re-runs the torch
    full-sequence backbone over [voice; text; latent inputs so far].

    Replicates tts.frame_step's protocol exactly (ref
    src/pocket_tts.cpp:446-492): EOS checked on the backbone output of the
    step; the EOS-firing frame IS emitted; generation stops once
    step >= eos_step + frames_after_eos, step >= max_steps, or the KV slot
    budget is exhausted (n_cap frames — capacity minus the bucketed
    prompt/text slots; the current frame's slot was in bounds so it
    emits).
    """
    embed = torch.tensor(flat["flow_lm.conditioner.embed.weight"])
    # jnp gathers clamp out-of-range ids (the tiny test config's 256 bins
    # vs MockTokenizer's fixed punct ids); mirror that here
    ids = np.clip(np.asarray(ids), 0, embed.shape[0] - 1)
    cond = torch.cat([torch.tensor(voice_rows), embed[ids]], 0)
    bos = torch.tensor(flat["flow_lm.bos_emb"]).reshape(-1)

    def out_head(seq_rows):
        h = torch_backbone(torch.stack(seq_rows))[-1]
        h = F.layer_norm(h, h.shape[-1:],
                         torch.tensor(flat["flow_lm.out_norm.weight"]),
                         torch.tensor(flat["flow_lm.out_norm.bias"]),
                         eps=1e-5)
        return h

    latents = []
    prev = bos
    eos_step = -1
    step = 0
    rows = list(cond)
    while True:
        rows.append(t_linear(prev, "flow_lm.input_linear"))
        h = out_head(rows)
        eos_logit = float(t_linear(h, "flow_lm.out_eos")[0])
        if eos_step < 0 and eos_logit > -4.0:
            eos_step = step
        if (eos_step >= 0 and step >= eos_step + fae) or step >= max_steps:
            break
        # temp 0: noise == 0, latent = 0 + flow_net(h, 0)
        latent = torch_flow_net(h, torch.zeros_like(bos))
        latents.append(latent)
        prev = latent
        step += 1
        if len(latents) >= n_cap:   # capacity stop (done_next)
            break
    return torch.stack(latents) if latents else torch.zeros((0, bos.numel()))


def _torch_mimi_offline(flat, latents):
    """Offline mimi chain over a sentence's latent sequence — equals the
    engine's streaming chain because every stage is causal (proven
    per-module in test_models)."""
    mcfg = CFG.mimi
    # denormalize (ref src/pocket_tts.cpp:472-474)
    lat = (torch.tensor(flat["flow_lm.emb_std"]).reshape(-1) * latents
           + torch.tensor(flat["flow_lm.emb_mean"]).reshape(-1))
    # quantizer output projection conv1x1 (mimi.h:77-83)
    qw = torch.tensor(flat["mimi.quantizer.output_proj.weight"])[:, :, 0]
    x = (lat @ qw.T).T                                   # (dim, T)
    # depthwise 16x upsample (mimi.h:11-17)
    uw = torch.tensor(flat["mimi.upsample.convtr.convtr.weight"])
    ub = flat.get("mimi.upsample.convtr.convtr.bias")
    t = x.shape[1]
    up = F.conv_transpose1d(x[None], uw,
                            torch.tensor(ub) if ub is not None else None,
                            stride=mcfg.upsample_stride,
                            groups=mcfg.dim)[0][:, : t * mcfg.upsample_stride]
    # ring-KV transformer over the 16-per-frame tokens
    mt = mcfg.transformer
    z = torch_mimi_transformer(up.T.contiguous(), mt.context,
                               mcfg.upsample_stride, mt.capacity)
    # seanet decoder
    return torch_seanet_offline(z.T.contiguous()).reshape(-1)


def torch_synthesize(flat, voice_rows, text, kv_capacity, prompt_bucket,
                     frame_size):
    """Full independent pipeline: sentence split -> per-sentence prefill +
    decode + mimi, voice KV prefix reused, mimi reset per sentence."""
    out = []
    for chunk in split_into_best_sentences(TOK, text):
        prepared, guess = prepare_text_prompt(chunk)
        ids = TOK.encode(prepared)
        fae = guess + 2
        max_steps = int((count_words(prepared) + 2.0) * CFG.mimi.frame_rate)
        # the engine's bucketed KV budget: capacity minus PADDED slots
        text_pad = _bucket(len(ids))
        n_cap = kv_capacity - prompt_bucket - text_pad
        latents = _torch_decode_sentence(flat, voice_rows, ids, fae,
                                         max_steps, n_cap)
        if latents.shape[0]:
            out.append(_torch_mimi_offline(flat, latents).numpy())
    return (np.concatenate(out) if out
            else np.zeros(0, np.float32))


def _engine(flat):
    params, cfg = params_from_flat(flat, CFG0)
    return TTSEngine(params=params, cfg=cfg, tokenizer=TOK)


VOICE = random_voice_prompt(CFG, 12, seed=11)


def _run_both(flat, text):
    eng = _engine(flat)
    got = eng.synthesize(text, VOICE, temp=0.0)
    cap = eng._sentence_capacity(
        _bucket(len(TOK.encode(prepare_text_prompt(text)[0]))),
        int((count_words(text) + 2.0) * CFG.mimi.frame_rate),
        prompt_slots=16)
    want = torch_synthesize(flat, VOICE, text, cap, 16, eng.frame_size)
    return got, want


class TestFullPipelineVsTorch:
    def test_single_sentence_matches(self):
        got, want = _run_both(FLAT, "Hi there friend.")
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_two_sentences_voice_reuse_and_mimi_reset(self):
        """Each sentence restarts from the voice KV prefix with a fresh
        mimi state; any cross-sentence state leak diverges here."""
        # each sentence must exceed the 50-token packing budget alone, or
        # split_into_best_sentences merges them into one chunk
        s1 = " ".join(f"alpha{i}" for i in range(26)) + "."
        s2 = " ".join(f"beta{i}" for i in range(26)) + "."
        text = s1 + " " + s2
        eng = _engine(FLAT)
        got = eng.synthesize(text, VOICE, temp=0.0)
        chunks = split_into_best_sentences(TOK, text)
        assert len(chunks) == 2
        wants = []
        for chunk in chunks:
            prepared, guess = prepare_text_prompt(chunk)
            ids = TOK.encode(prepared)
            ms = int((count_words(prepared) + 2.0) * CFG.mimi.frame_rate)
            cap = eng._sentence_capacity(_bucket(len(ids)), ms,
                                         prompt_slots=16)
            lat = _torch_decode_sentence(FLAT, VOICE, ids, guess + 2, ms,
                                         cap - 16 - _bucket(len(ids)))
            wants.append(_torch_mimi_offline(FLAT, lat).numpy())
        want = np.concatenate(wants)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_forced_eos_timing(self, monkeypatch):
        """Pin the EOS head high so EOS fires at step 0: exactly
        frames_after_eos frames must be emitted, and they must match the
        torch loop bit-for-rule (catches emission off-by-ones)."""
        flat2 = dict(FLAT)
        flat2["flow_lm.out_eos.bias"] = np.full((1,), 50.0, np.float32)
        # test_models' torch helpers read their module-global FLAT
        monkeypatch.setattr(tm, "FLAT", flat2)
        text = "Speak just a little."
        got, want = _run_both(flat2, text)
        prepared, guess = prepare_text_prompt(
            split_into_best_sentences(TOK, text)[0])
        assert got.size == (guess + 2) * CFG.mimi.frame_size
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_capacity_stop(self):
        """A long run-on sentence exhausts the tiny config's 128-slot KV
        budget before max_steps: emitted length must equal the slot budget
        exactly on both sides."""
        words = " ".join(["word"] * 12)    # max_steps 175 >> slot budget
        got, want = _run_both(FLAT, words + ".")
        eng_frames = got.size // CFG.mimi.frame_size
        text_pad = _bucket(len(TOK.encode(
            prepare_text_prompt(words + ".")[0])))
        assert eng_frames == CFG.backbone.kv_capacity - 16 - text_pad
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)
