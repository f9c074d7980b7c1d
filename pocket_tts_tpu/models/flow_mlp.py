"""SimpleMLPAdaLN — the flow-matching network that maps Gaussian noise to the
next 32-d audio latent in a single step, conditioned on the backbone output.

ref: /root/reference/src/pocket_tts/modules/mlp.h:172-251 and the call site
`flow_lm_sample_next_latent` (models/flow_lm.h:131-141):
    latent = noise + flow_net(c, s=0, t=1, noise)

Params pytree:
  input_proj: {w (latent, dim), b}
  cond_embed: {w (d_model, dim), b}
  time_embed: tuple of 2 embedders, each
      {freqs (F,), mlp_0 {w (2F, dim), b}, mlp_2 {w (dim, dim), b},
       mlp_3 {alpha (dim,)}}
  res_blocks (stacked over depth):
      {in_ln {scale, bias}, mlp_0 {w,b}, mlp_2 {w,b}, adaln {w (dim,3*dim), b}}
  final: {norm {scale,bias} or {}, linear {w (dim, latent), b},
          adaln {w (dim, 2*dim), b}}

All functions take a single feature vector (no batch/time axis); vmap for more.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.basic import layer_norm, linear, mlp_std_norm, modulate, silu


def timestep_embed(p, t: float):
    """TimestepEmbedder: cos/sin features -> mlp -> std-norm.

    ref: mlp_timestep_embedder_forward, mlp.h:92-106. `freqs` comes from the
    checkpoint. Output RMSNorm is the quirky (n-1)-variance norm with eps=1e-5
    (mlp.h:208-215).
    """
    args = p["freqs"] * t
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    h = silu(linear(p["mlp_0"], emb))
    h = linear(p["mlp_2"], h)
    return mlp_std_norm(p["mlp_3"], h, eps=1e-5)


def time_cond(p):
    """(TE1(t=1) + TE0(s=0)) / 2 — constant at inference (s=0, t=1 always;
    ref: flow_lm.h:137-140, mlp.h:241-244). Precompute once per checkpoint."""
    return 0.5 * (timestep_embed(p["time_embed"][1], 1.0)
                  + timestep_embed(p["time_embed"][0], 0.0))


def res_block(p, x, y):
    """AdaLN ResBlock. ref: mlp_res_block_forward, mlp.h:124-140."""
    mod = linear(p["adaln"], silu(y))
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    h = modulate(layer_norm(p["in_ln"], x, eps=1e-6), shift, scale)
    h = linear(p["mlp_2"], silu(linear(p["mlp_0"], h)))
    return x + gate * h


def final_layer(p, x, y):
    """ref: final_layer_forward, mlp.h:156-170."""
    mod = linear(p["adaln"], silu(y))
    shift, scale = jnp.split(mod, 2, axis=-1)
    x = modulate(layer_norm(p["norm"], x, eps=1e-6), shift, scale)
    return linear(p["linear"], x)


def forward(p, c, x, t_combined=None, use_pallas=None):
    """Flow direction for one step.

    c: (d_model,) conditioning (backbone output, post out_norm).
    x: (latent_dim,) noise.
    t_combined: optional precomputed `time_cond(p)`.
    use_pallas: route QUANTIZED params through the whole-net fused kernel
    (ops/fused_flow.py); None = auto (TPU backends).
    ref: simple_mlp_adaln_forward, mlp.h:233-251.
    """
    if t_combined is None:
        t_combined = time_cond(p)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from ..ops import fused_flow
        if fused_flow.supported(p):
            return fused_flow.flow_forward(
                p, c, x, t_combined,
                interpret=(jax.default_backend() == "cpu"))
    h = linear(p["input_proj"], x)
    y = t_combined + linear(p["cond_embed"], c)

    # unrolled over depth: the blocks are tiny (512-d matvecs) and a scan's
    # per-iteration dispatch costs more than it saves
    depth = jax.tree.leaves(p["res_blocks"])[0].shape[0]
    for i in range(depth):
        block_p = jax.tree.map(lambda w: w[i], p["res_blocks"])
        h = res_block(block_p, h, y)
    return final_layer(p["final"], h, y)


def sample_latent(p, c, noise, t_combined=None, use_pallas=None):
    """latent = noise + flow_net(c, s=0, t=1, noise). ref: flow_lm.h:136-141."""
    return noise + forward(p, c, noise, t_combined, use_pallas)
