"""FlowLM: text/voice conditioning -> autoregressive latent generation.

ref: /root/reference/src/pocket_tts/models/flow_lm.h and the orchestration in
src/pocket_tts.cpp:40-124. Functionally split into:

  prefill(...)      — push conditioning embeddings (voice prompt or text
                      tokens) through the backbone, filling KV. The reference
                      also samples (and discards) a latent during prefill
                      (flow_lm.h:125-144); we skip that dead compute.
  decode_step(...)  — one 80 ms frame: backbone step on the previous latent,
                      EOS head, single flow-matching step on fresh noise.

Params:
  emb_std/emb_mean/bos_emb: (latent,)
  conditioner: {embed (n_bins, d_model)}
  input_linear: {w (latent, d_model), b?}
  backbone params (see backbone.py), out_norm {scale,bias},
  out_eos {w (d_model, 1), b?}, flow_net (see flow_mlp.py)
"""
from __future__ import annotations

import jax

from ..config import ModelConfig
from . import backbone, flow_mlp
from ..ops.basic import layer_norm, linear


def embed_tokens(p, tokens):
    """LUT conditioner. ref: conditioner_forward, conditioners/text.h:29-37."""
    return p["conditioner"]["embed"][tokens]


def prefill(p, cfg: ModelConfig, state: backbone.BackboneState, emb, n_valid):
    """Fill backbone KV with T (padded) conditioning rows; only the first
    n_valid are real. Padding rows occupy slots but are flagged invalid
    (position -1) and masked forever.

    emb: (T, d_model).
    """
    state, _ = backbone.forward(p, cfg.backbone, state, emb, n_valid,
                                cfg.gelu_approx)
    return backbone.advance(state, emb.shape[0], n_valid)


def decode_step(p, cfg: ModelConfig, state: backbone.BackboneState,
                prev_latent, noise):
    """One autoregressive step. ref: flow_lm_sample_next_latent,
    flow_lm.h:84-147.

    prev_latent: (latent,) — bos_emb on the first step (src/pocket_tts.cpp:441).
    noise: (latent,) — N(0, temp) sample (std = sqrt(temp), flow_lm.h:131-133).
    Returns (state, latent (latent,), eos (bool scalar)).
    """
    x = linear(p["input_linear"], prev_latent)[None, :]   # (1, d_model)
    state, h = backbone.forward(p, cfg.backbone, state, x, 1,
                                cfg.gelu_approx)
    state = backbone.advance(state, 1, 1)
    h = layer_norm(p["out_norm"], h, eps=1e-5)[-1]        # last position
    eos_logit = linear(p["out_eos"], h)[0]
    # ref: sum(out_eos - (-4)) > 0  <=>  logit > eos_threshold
    is_eos = eos_logit > cfg.eos_threshold
    t_comb = p.get("_time_cond")
    # under a mesh the fused flow kernel (a Mosaic custom call) has no
    # GSPMD partitioning — force the XLA path there. Gate on cfg.on_mesh,
    # not backbone.mesh: the latter stays None when mesh_cfg falls the
    # attention kernel back to XLA (heads not divisible), which is still
    # a sharded program.
    use_pallas = False if cfg.on_mesh else None
    latent = flow_mlp.sample_latent(p["flow_net"], h, noise, t_comb,
                                    use_pallas=use_pallas)
    return state, latent, is_eos


def denormalize(p, latent):
    """emb_std * latent + emb_mean. ref: src/pocket_tts.cpp:472-474."""
    return p["emb_std"] * latent + p["emb_mean"]
