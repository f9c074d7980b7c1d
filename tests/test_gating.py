"""Gating (SwiGLU) + weights-per-step modules vs independent torch refs.

Dead in the reference's shipped checkpoints (defaults.h gating={},
weights_per_step=0) but carried as live code paths there — and now here
(ref gating.h:16-38, mimi_transformer.h:55-139).
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pocket_tts_tpu.ops.gating import (activation_gating,
                                       weights_per_step_gating,
                                       weights_per_step_linear)


def _torch_gating(x, w_in, b_in, w_out, b_out):
    h = F.linear(x, w_in.T, b_in)
    half = h.shape[-1] // 2
    return F.linear(F.silu(h[..., :half]) * h[..., half:], w_out.T, b_out)


def test_activation_gating_vs_torch():
    rng = np.random.RandomState(0)
    d, hdim, t = 16, 24, 5
    w_in = rng.randn(d, 2 * hdim).astype(np.float32) * 0.2
    b_in = rng.randn(2 * hdim).astype(np.float32) * 0.1
    w_out = rng.randn(hdim, d).astype(np.float32) * 0.2
    b_out = rng.randn(d).astype(np.float32) * 0.1
    x = rng.randn(t, d).astype(np.float32)
    got = activation_gating(
        {"linear_in": {"w": jnp.array(w_in), "b": jnp.array(b_in)},
         "linear_out": {"w": jnp.array(w_out), "b": jnp.array(b_out)}},
        jnp.array(x))
    want = _torch_gating(torch.tensor(x), torch.tensor(w_in),
                         torch.tensor(b_in), torch.tensor(w_out),
                         torch.tensor(b_out)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_weights_per_step_linear_schedule():
    """Batched gather formulation == the reference's per-step loop
    (mimi_transformer.h:80-99), including the schedule indirection."""
    rng = np.random.RandomState(1)
    m, cin, cout, t, offset = 4, 8, 12, 6, 2
    w = rng.randn(m, cin, cout).astype(np.float32) * 0.3
    b = rng.randn(m, cout).astype(np.float32) * 0.1
    x = rng.randn(t, cin).astype(np.float32)
    schedule = (0, 1, 1, 2, 3, 3, 2, 0, 1, 3)
    got = weights_per_step_linear({"w": jnp.array(w), "b": jnp.array(b)},
                                  jnp.array(x), offset=offset,
                                  schedule=schedule)
    want = np.stack([x[i] @ w[schedule[i + offset]] + b[schedule[i + offset]]
                     for i in range(t)])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    # no schedule: module index is t + offset (reference default)
    got2 = weights_per_step_linear({"w": jnp.array(w), "b": jnp.array(b)},
                                   jnp.array(x[:2]), offset=1)
    want2 = np.stack([x[i] @ w[i + 1] + b[i + 1] for i in range(2)])
    np.testing.assert_allclose(np.asarray(got2), want2, atol=1e-5)
    # M == 1 collapses to a shared linear
    got3 = weights_per_step_linear({"w": jnp.array(w[:1]),
                                    "b": jnp.array(b[:1])}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(got3), x @ w[0] + b[0], atol=1e-5)


def test_weights_per_step_gating_vs_naive():
    rng = np.random.RandomState(2)
    m, d, hdim, t = 3, 10, 14, 3
    w_in = rng.randn(m, d, 2 * hdim).astype(np.float32) * 0.2
    w_out = rng.randn(m, hdim, d).astype(np.float32) * 0.2
    x = rng.randn(t, d).astype(np.float32)
    p = {"linear_in": {"w": jnp.array(w_in)},
         "linear_out": {"w": jnp.array(w_out)}}
    got = weights_per_step_gating(p, jnp.array(x), offset=0)
    want = np.stack([
        np.asarray(_torch_gating(torch.tensor(x[i]), torch.tensor(w_in[i]),
                                 None, torch.tensor(w_out[i]), None))
        for i in range(t)])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    # M == 1 fast path
    p1 = {"linear_in": {"w": jnp.array(w_in[:1])},
          "linear_out": {"w": jnp.array(w_out[:1])}}
    got1 = weights_per_step_gating(p1, jnp.array(x))
    want1 = _torch_gating(torch.tensor(x), torch.tensor(w_in[0]), None,
                          torch.tensor(w_out[0]), None).numpy()
    np.testing.assert_allclose(np.asarray(got1), want1, atol=1e-5)


def test_gating_quantized_layouts():
    """quantize_params rewrites gating linears to q/q4+scale (they are
    matmul-shaped); the gating ops must accept those layouts instead of
    KeyError'ing on 'w' — the M==1/2-D fast path feeds ops.basic.linear
    (fused kernels), the per-step gather dequantizes inline."""
    from pocket_tts_tpu.io.quant import quantize_params
    rng = np.random.RandomState(4)
    d, hdim, t, m = 128, 128, 5, 3
    x = rng.randn(t, d).astype(np.float32)
    p = {"linear_in": {"w": jnp.asarray(
            rng.randn(d, 2 * hdim).astype(np.float32) * 0.2)},
         "linear_out": {"w": jnp.asarray(
            rng.randn(hdim, d).astype(np.float32) * 0.2)}}
    pq = quantize_params(p, bits=8)
    assert "q" in pq["linear_in"], "gating weight should quantize"
    ref = np.asarray(weights_per_step_gating(p, jnp.asarray(x)))
    got = np.asarray(weights_per_step_gating(pq, jnp.asarray(x)))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.05
    # stacked per-step modules, int4: dequantized inline for the gather
    pm = {"linear_in": {"w": jnp.asarray(
             rng.randn(m, d, 2 * hdim).astype(np.float32) * 0.2)},
          "linear_out": {"w": jnp.asarray(
             rng.randn(m, hdim, d).astype(np.float32) * 0.2)}}
    pmq = quantize_params(pm, bits=4)
    assert "q4" in pmq["linear_in"]
    refm = np.asarray(weights_per_step_gating(pm, jnp.asarray(x), offset=0))
    gotm = np.asarray(weights_per_step_gating(pmq, jnp.asarray(x), offset=0))
    assert np.abs(gotm - refm).max() / np.abs(refm).max() < 0.3
    # M == 1 stacked quantized collapses to the fused fast path
    p1q = quantize_params(
        {"linear_in": {"w": pm["linear_in"]["w"][:1]},
         "linear_out": {"w": pm["linear_out"]["w"][:1]}}, bits=8)
    ref1 = np.asarray(weights_per_step_gating(
        {"linear_in": {"w": pm["linear_in"]["w"][:1]},
         "linear_out": {"w": pm["linear_out"]["w"][:1]}}, jnp.asarray(x)))
    got1 = np.asarray(weights_per_step_gating(p1q, jnp.asarray(x)))
    assert np.abs(got1 - ref1).max() / np.abs(ref1).max() < 0.05


def test_quantized_gating_engine_synthesizes():
    """End-to-end: a checkpoint that ships mimi gating weights survives
    --quantize int8 (round-3 bug: quantize_params rewrote the gating 'w'
    and the gating op crashed at trace time)."""
    import dataclasses
    from pocket_tts_tpu.config import tiny_config
    from pocket_tts_tpu.io.params import (params_from_flat, random_flat,
                                          random_voice_prompt)
    from pocket_tts_tpu.io.quant import quantize_params
    from pocket_tts_tpu.runtime.engine import TTSEngine
    from pocket_tts_tpu.text.tokenizer import MockTokenizer
    cfg0 = tiny_config()
    params, cfg = params_from_flat(random_flat(cfg0, seed=9), cfg0)
    mt = cfg.mimi.transformer
    rng = np.random.RandomState(3)
    hdim = 64
    lay = dict(params["mimi"]["decoder_transformer"]["layers"])
    lay["gating"] = {
        "linear_in": {"w": jnp.asarray(
            rng.randn(mt.num_layers, mt.d_model, 2 * hdim) * 0.2,
            jnp.float32)},
        "linear_out": {"w": jnp.asarray(
            rng.randn(mt.num_layers, hdim, mt.d_model) * 0.2, jnp.float32)},
    }
    params["mimi"]["decoder_transformer"] = dict(
        params["mimi"]["decoder_transformer"], layers=lay)
    pq = quantize_params(params, bits=8)
    eng = TTSEngine(params=pq, cfg=cfg,
                    tokenizer=MockTokenizer(cfg.lut.n_bins))
    pcm = eng.synthesize("Gated and quantized.",
                         random_voice_prompt(cfg, 12), temp=0.0)
    assert pcm.size > 0 and np.isfinite(pcm).all()


def test_mimi_layer_with_gating_params():
    """A mimi transformer layer whose params carry `gating` routes its MLP
    through SwiGLU (checkpoint-driven, no config flag needed)."""
    from pocket_tts_tpu.config import tiny_config
    from pocket_tts_tpu.io.params import params_from_flat, random_flat
    from pocket_tts_tpu.models import mimi_transformer
    cfg0 = tiny_config()
    flat = random_flat(cfg0, seed=9)
    params, cfg = params_from_flat(flat, cfg0)
    mt = cfg.mimi.transformer
    rng = np.random.RandomState(3)
    lay = params["mimi"]["decoder_transformer"]["layers"]
    hdim = 8
    lay_g = dict(lay)
    lay_g["gating"] = {
        "linear_in": {"w": jnp.asarray(
            rng.randn(mt.num_layers, mt.d_model, 2 * hdim) * 0.2,
            jnp.float32)},
        "linear_out": {"w": jnp.asarray(
            rng.randn(mt.num_layers, hdim, mt.d_model) * 0.2, jnp.float32)},
    }
    p_g = dict(params["mimi"]["decoder_transformer"])
    p_g["layers"] = lay_g
    x = jnp.asarray(rng.randn(16, mt.d_model).astype(np.float32) * 0.3)
    st = mimi_transformer.init_state(mt)
    _, y_g = mimi_transformer.forward(p_g, mt, st, x)
    _, y_l = mimi_transformer.forward(
        params["mimi"]["decoder_transformer"], mt, st, x)
    assert np.isfinite(np.asarray(y_g)).all()
    assert np.abs(np.asarray(y_g) - np.asarray(y_l)).max() > 1e-6
