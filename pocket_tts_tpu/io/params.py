"""Checkpoint <-> params-pytree mapping.

Keyed by the exact tensor names of the Kyutai pocket-tts safetensors
checkpoint, as consumed by the reference after its prefix strip
("pts.flow_lm.emb_std" -> file key "flow_lm.emb_std";
ref: WeightLoader::find + split_first, src/loader.h:8-13,101-105).

Layout conventions applied at load time:
  torch Linear weight (out, in)  -> w (in, out)  [transposed once here]
  conv1d weight (out, in, K)     -> as-is
  conv_transpose1d (in, out, K)  -> as-is
  LayerNorm weight/bias          -> scale/bias
"""
from __future__ import annotations

import dataclasses
import re
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig, DEFAULT_CONFIG


# ---------------------------------------------------------------------------
# flat-dict helpers
# ---------------------------------------------------------------------------

def _lin(flat, name, dtype, required=True):
    w = flat.get(name + ".weight")
    if w is None:
        if required:
            raise KeyError(f"missing weight: {name}.weight")
        return None
    out = {"w": jnp.asarray(np.ascontiguousarray(w.T), dtype)}
    b = flat.get(name + ".bias")
    if b is not None:
        out["b"] = jnp.asarray(b, dtype)
    return out


def _norm(flat, name, dtype, required=True):
    out = {}
    w = flat.get(name + ".weight")
    if w is not None:
        out["scale"] = jnp.asarray(w, dtype)
    b = flat.get(name + ".bias")
    if b is not None:
        out["bias"] = jnp.asarray(b, dtype)
    if required and not out:
        raise KeyError(f"missing norm params: {name}")
    return out


def _norm_or_rms(flat, name, dtype):
    """LayerNorm params — or {"alpha": ...} when the checkpoint ships the
    moshi RMSNorm variant (norm1.alpha instead of norm1.weight/bias; the
    reference loads it into moshi_rms_norm_t,
    src/pocket_tts/modules/mimi_transformer.h:10-27,1046-1062). Consumers
    route on the "alpha" key (ops.basic.rms_norm vs layer_norm)."""
    a = flat.get(name + ".alpha")
    if a is not None:
        return {"alpha": jnp.asarray(a, dtype).reshape(-1)}
    return _norm(flat, name, dtype)


def _conv(flat, name, dtype):
    out = {"w": jnp.asarray(flat[name + ".weight"], dtype)}
    b = flat.get(name + ".bias")
    if b is not None:
        out["b"] = jnp.asarray(b, dtype)
    return out


def _rope_permute(lin: dict, d_model: int, head_dim: int) -> dict:
    """Reorder in_proj's q/k output columns so rope's even/odd interleaved
    pairs arrive as contiguous halves (ops.rope.apply_rope_halves) — the
    strided 0::2 slicing cost ~57 us of relayout copies per batch-32 frame.
    Per head: columns [0,2,...,D-2, 1,3,...,D-1]. The v block and all other
    weights are untouched; outputs are bit-identical.
    """
    w = np.asarray(lin["w"])                     # (in, 3*d_model)
    perm_head = np.concatenate([np.arange(0, head_dim, 2),
                                np.arange(1, head_dim, 2)])
    perm_d = np.concatenate(
        [h * head_dim + perm_head for h in range(d_model // head_dim)])
    full = np.concatenate([perm_d, d_model + perm_d,
                           2 * d_model + np.arange(d_model)])
    out = {"w": jnp.asarray(w[:, full], lin["w"].dtype)}
    if "b" in lin:
        b = np.asarray(lin["b"])
        out["b"] = jnp.asarray(b[full], lin["b"].dtype)
    return out


def _stack(dicts):
    """Stack a list of identically-structured dicts along a new axis 0."""
    import jax
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *dicts)


def _count_layers(flat, prefix):
    n = 0
    pat = re.compile(re.escape(prefix) + r"(\d+)\.")
    for k in flat:
        m = pat.match(k)
        if m:
            n = max(n, int(m.group(1)) + 1)
    return n


# ---------------------------------------------------------------------------
# main mapping
# ---------------------------------------------------------------------------

def params_from_flat(flat: Dict[str, np.ndarray],
                     cfg: Optional[ModelConfig] = None,
                     dtype=jnp.float32) -> Tuple[dict, ModelConfig]:
    """Build the params pytree from a flat name->array dict, inferring the
    dims that the reference infers from the checkpoint."""
    cfg = cfg or DEFAULT_CONFIG

    # --- infer checkpoint-derived dims ------------------------------------
    inp_w = flat["flow_lm.input_linear.weight"]          # (d_model, latent)
    d_model, latent = inp_w.shape
    flow_depth = _count_layers(flat, "flow_lm.flow_net.res_blocks.")
    bb_layers = _count_layers(flat, "flow_lm.transformer.layers.")
    mimi_layers = _count_layers(
        flat, "mimi.decoder_transformer.transformer.layers.")
    flow_dim = flat["flow_lm.flow_net.input_proj.weight"].shape[0]
    freq_half = flat["flow_lm.flow_net.time_embed.0.freqs"].shape[0]
    mlp_hidden = flat["flow_lm.flow_net.res_blocks.0.mlp.0.weight"].shape[0]
    hidden = flat["flow_lm.transformer.layers.0.linear1.weight"].shape[0]
    mimi_dim = flat["mimi.quantizer.output_proj.weight"].shape[0]
    mimi_hidden = flat[
        "mimi.decoder_transformer.transformer.layers.0.linear1.weight"].shape[0]
    # seanet topology from the conv weight shapes (the reference reads the
    # same dims out of its ggml tensors; head counts stay config-fixed like
    # the reference's config.h): convtr weights are (Cin, Cout, K), K==2s
    from ..config import SeanetStage
    w0 = flat["mimi.decoder.model.0.conv.weight"]        # (C, C, k7)
    stages = []
    for m in (2, 5, 8):
        wt = flat[f"mimi.decoder.model.{m}.convtr.weight"]
        stages.append(SeanetStage(int(wt.shape[0]), int(wt.shape[1]),
                                  int(wt.shape[2]), int(wt.shape[2]) // 2))
    up_k = int(flat["mimi.upsample.convtr.convtr.weight"].shape[2])
    n_bins, lut_dim = flat["flow_lm.conditioner.embed.weight"].shape

    cfg = dataclasses.replace(
        cfg,
        latent_dim=latent,
        flow=dataclasses.replace(cfg.flow, depth=flow_depth, dim=flow_dim,
                                 freq_half=freq_half, mlp_hidden=mlp_hidden),
        backbone=dataclasses.replace(
            cfg.backbone, d_model=d_model, num_layers=bb_layers,
            hidden_scale=hidden // d_model),
        lut=dataclasses.replace(cfg.lut, n_bins=int(n_bins),
                                dim=int(lut_dim)),
        mimi=dataclasses.replace(
            cfg.mimi, dim=mimi_dim, latent_dim=latent,
            upsample_kernel=up_k, upsample_stride=up_k // 2,
            transformer=dataclasses.replace(
                cfg.mimi.transformer, d_model=mimi_dim,
                num_layers=mimi_layers, hidden_dim=mimi_hidden),
            seanet=dataclasses.replace(
                cfg.mimi.seanet, in_ch=int(w0.shape[0]),
                first_kernel=int(w0.shape[2]), stages=tuple(stages),
                resnet_kernel=int(
                    flat["mimi.decoder.model.3.block.1.conv.weight"
                         ].shape[2]),
                last_kernel=int(
                    flat["mimi.decoder.model.11.conv.weight"].shape[2]))),
    )

    # --- flow_lm -----------------------------------------------------------
    p = {
        "emb_std": jnp.asarray(flat["flow_lm.emb_std"], dtype).reshape(-1),
        "emb_mean": jnp.asarray(flat["flow_lm.emb_mean"], dtype).reshape(-1),
        "bos_emb": jnp.asarray(flat["flow_lm.bos_emb"], dtype).reshape(-1),
        "conditioner": {
            "embed": jnp.asarray(flat["flow_lm.conditioner.embed.weight"],
                                 dtype)},
        "input_linear": _lin(flat, "flow_lm.input_linear", dtype),
        "out_norm": _norm(flat, "flow_lm.out_norm", dtype),
        "out_eos": _lin(flat, "flow_lm.out_eos", dtype),
    }

    layers = []
    for i in range(bb_layers):
        pre = f"flow_lm.transformer.layers.{i}."
        layer = {
            "norm1": _norm(flat, pre + "norm1", dtype),
            "in_proj": _rope_permute(
                _lin(flat, pre + "self_attn.in_proj", dtype),
                d_model, cfg.backbone.head_dim),
            "out_proj": _lin(flat, pre + "self_attn.out_proj", dtype),
            "norm2": _norm(flat, pre + "norm2", dtype),
            "linear1": _lin(flat, pre + "linear1", dtype),
            "linear2": _lin(flat, pre + "linear2", dtype),
        }
        # optional cross-attention sub-block (present iff the checkpoint
        # ships the weights; dead in shipped pocket-tts models —
        # defaults.h:18 — but the reference compiles the path:
        # "lm.transformer.layers.N.cross_attention",
        # mimi_transformer.h:294,868-871). The cross in_proj is NOT
        # rope-permuted: the cross path applies no RoPE.
        x_in = _lin(flat, pre + "cross_attention.in_proj", dtype,
                    required=False)
        if x_in is not None:
            layer["norm_cross"] = _norm(flat, pre + "norm_cross", dtype)
            layer["cross_attention"] = {
                "in_proj": x_in,
                "out_proj": _lin(flat, pre + "cross_attention.out_proj",
                                 dtype)}
        layers.append(layer)
    p["layers"] = _stack(layers)

    # --- flow net ----------------------------------------------------------
    tes = []
    for j in range(2):
        pre = f"flow_lm.flow_net.time_embed.{j}."
        tes.append({
            "freqs": jnp.asarray(flat[pre + "freqs"], dtype).reshape(-1),
            "mlp_0": _lin(flat, pre + "mlp.0", dtype),
            "mlp_2": _lin(flat, pre + "mlp.2", dtype),
            "mlp_3": {"alpha": jnp.asarray(flat[pre + "mlp.3.alpha"],
                                           dtype).reshape(-1)},
        })
    blocks = []
    for i in range(flow_depth):
        pre = f"flow_lm.flow_net.res_blocks.{i}."
        blocks.append({
            "in_ln": _norm(flat, pre + "in_ln", dtype, required=False),
            "mlp_0": _lin(flat, pre + "mlp.0", dtype),
            "mlp_2": _lin(flat, pre + "mlp.2", dtype),
            "adaln": _lin(flat, pre + "adaLN_modulation.1", dtype),
        })
    p["flow_net"] = {
        "input_proj": _lin(flat, "flow_lm.flow_net.input_proj", dtype),
        "cond_embed": _lin(flat, "flow_lm.flow_net.cond_embed", dtype),
        "time_embed": tuple(tes),
        "res_blocks": _stack(blocks),
        "final": {
            "norm": _norm(flat, "flow_lm.flow_net.final_layer.norm_final",
                          dtype, required=False),
            "linear": _lin(flat, "flow_lm.flow_net.final_layer.linear", dtype),
            "adaln": _lin(flat,
                          "flow_lm.flow_net.final_layer.adaLN_modulation.1",
                          dtype),
        },
    }

    # --- mimi ---------------------------------------------------------------
    mlayers = []
    for i in range(mimi_layers):
        pre = f"mimi.decoder_transformer.transformer.layers.{i}."
        mlayer = {
            # norm1/norm2 may be the moshi RMSNorm variant (norm*.alpha) —
            # moshi_streaming_transformer_layer routes per layer
            # (mimi_transformer.h:863,873,924,949); dead in shipped
            # pocket-tts checkpoints but the reference compiles the path
            "norm1": _norm_or_rms(flat, pre + "norm1", dtype),
            "in_proj": _rope_permute(
                _lin(flat, pre + "self_attn.in_proj", dtype),
                mimi_dim, cfg.mimi.transformer.head_dim),
            "out_proj": _lin(flat, pre + "self_attn.out_proj", dtype),
            "layer_scale_1": {
                "scale": jnp.asarray(flat[pre + "layer_scale_1.scale"], dtype)},
            "norm2": _norm_or_rms(flat, pre + "norm2", dtype),
            "linear1": _lin(flat, pre + "linear1", dtype),
            "linear2": _lin(flat, pre + "linear2", dtype),
            "layer_scale_2": {
                "scale": jnp.asarray(flat[pre + "layer_scale_2.scale"], dtype)},
        }
        # optional cross-attention sub-block in the MIMI stack (the
        # moshi-heritage path: mimi_transformer.h:343-396,714-762,939-947).
        # The cross in_proj is NOT rope-permuted (no RoPE on that path).
        x_in = _lin(flat, pre + "cross_attention.in_proj", dtype,
                    required=False)
        if x_in is not None:
            mlayer["norm_cross"] = _norm(flat, pre + "norm_cross", dtype)
            mlayer["cross_attention"] = {
                "in_proj": x_in,
                "out_proj": _lin(flat, pre + "cross_attention.out_proj",
                                 dtype)}
        mlayers.append(mlayer)

    dec = {}
    for name in ["model_0", "model_11"]:
        dec[name] = _conv(flat, f"mimi.decoder.{name.replace('_', '.')}.conv",
                          dtype)
    for name in ["model_2", "model_5", "model_8"]:
        dec[name] = _conv(
            flat, f"mimi.decoder.{name.replace('_', '.')}.convtr", dtype)
    for name in ["model_3", "model_6", "model_9"]:
        base = f"mimi.decoder.{name.replace('_', '.')}"
        dec[name] = {
            "block_1": _conv(flat, base + ".block.1.conv", dtype),
            "block_3": _conv(flat, base + ".block.3.conv", dtype),
        }

    p["mimi"] = {
        "quantizer": _conv(flat, "mimi.quantizer.output_proj", dtype),
        "upsample": _conv(flat, "mimi.upsample.convtr.convtr", dtype),
        "decoder_transformer": {"layers": _stack(mlayers)},
        "decoder": dec,
    }

    # optional SEANet ENCODER (audio -> latent): the reference carries it
    # as compiled-out code with no shipped weights (seanet.h:61-158,
    # decode-only build); load it when a checkpoint ships
    # mimi.encoder.model.N.* — indices mirror the decoder (see
    # models/seanet.encoder_init_state)
    if "mimi.encoder.model.0.conv.weight" in flat:
        n = len(stages)
        enc = {"model_0": _conv(flat, "mimi.encoder.model.0.conv", dtype)}
        for gi in range(n):
            ri, ci = 3 * gi + 1, 3 * gi + 3
            enc[f"model_{ri}"] = {
                "block_1": _conv(flat,
                                 f"mimi.encoder.model.{ri}.block.1.conv",
                                 dtype),
                "block_3": _conv(flat,
                                 f"mimi.encoder.model.{ri}.block.3.conv",
                                 dtype)}
            enc[f"model_{ci}"] = _conv(flat,
                                       f"mimi.encoder.model.{ci}.conv",
                                       dtype)
        fi = 3 * n + 2
        enc[f"model_{fi}"] = _conv(flat, f"mimi.encoder.model.{fi}.conv",
                                   dtype)
        p["mimi"]["encoder"] = enc

    # derived: constant time conditioning (s=0, t=1 always at inference)
    from ..models.flow_mlp import time_cond
    p["_time_cond"] = time_cond(p["flow_net"])

    return p, cfg


# ---------------------------------------------------------------------------
# safetensors load/save
# ---------------------------------------------------------------------------

def load_checkpoint(path: str, cfg: Optional[ModelConfig] = None,
                    dtype=jnp.float32) -> Tuple[dict, ModelConfig]:
    """Load a checkpoint's flat tensor dict (safetensors or GGUF — the
    reference's from_safetensor/from_gguf pair, src/loader.h:78-99)."""
    if path.endswith(".gguf"):
        from .gguf import read_gguf
        flat, _ = read_gguf(path)
    else:
        from .safetensors_io import load_safetensors
        flat = load_safetensors(path)
    return params_from_flat(flat, cfg, dtype)


def load_voice(path: str, dtype=jnp.float32):
    """Load a voice embedding file; returns (Tp, d_model) array.
    ref: get_state_for_audio_prompt fetches "voice.audio_prompt"
    (src/pocket_tts.cpp:109-117)."""
    from .safetensors_io import load_safetensors
    flat = load_safetensors(path)
    prompt = np.asarray(flat["voice.audio_prompt"])
    prompt = prompt.reshape(-1, prompt.shape[-1])
    return jnp.asarray(prompt, dtype)


# ---------------------------------------------------------------------------
# random checkpoint generation (tests / bench without real weights)
# ---------------------------------------------------------------------------

def random_flat(cfg: ModelConfig, seed: int = 0,
                scale: float = 0.02) -> Dict[str, np.ndarray]:
    """A flat dict with exactly the reference checkpoint's key set and
    plausible shapes, filled with small random values."""
    rng = np.random.RandomState(seed)
    out: Dict[str, np.ndarray] = {}

    def t(name, *shape, s=scale):
        out[name] = (rng.randn(*shape) * s).astype(np.float32)

    def ones(name, *shape):
        out[name] = np.ones(shape, np.float32)

    def zeros(name, *shape):
        out[name] = np.zeros(shape, np.float32)

    dm = cfg.backbone.d_model
    lat = cfg.latent_dim
    hid = cfg.backbone.hidden_dim
    fd = cfg.flow.dim
    fh = cfg.flow.mlp_hidden
    ff = cfg.flow.freq_half

    t("flow_lm.conditioner.embed.weight", cfg.lut.n_bins, dm)
    ones("flow_lm.emb_std", lat)
    zeros("flow_lm.emb_mean", lat)
    t("flow_lm.bos_emb", lat, s=1.0)
    t("flow_lm.input_linear.weight", dm, lat)
    for i in range(cfg.backbone.num_layers):
        pre = f"flow_lm.transformer.layers.{i}."
        t(pre + "self_attn.in_proj.weight", 3 * dm, dm)
        t(pre + "self_attn.out_proj.weight", dm, dm)
        ones(pre + "norm1.weight", dm)
        zeros(pre + "norm1.bias", dm)
        ones(pre + "norm2.weight", dm)
        zeros(pre + "norm2.bias", dm)
        t(pre + "linear1.weight", hid, dm)
        t(pre + "linear2.weight", dm, hid)
    ones("flow_lm.out_norm.weight", dm)
    zeros("flow_lm.out_norm.bias", dm)
    t("flow_lm.out_eos.weight", 1, dm)
    out["flow_lm.out_eos.bias"] = np.full((1,), -6.0, np.float32)

    t("flow_lm.flow_net.input_proj.weight", fd, lat)
    t("flow_lm.flow_net.input_proj.bias", fd)
    t("flow_lm.flow_net.cond_embed.weight", fd, dm)
    t("flow_lm.flow_net.cond_embed.bias", fd)
    for j in range(2):
        pre = f"flow_lm.flow_net.time_embed.{j}."
        t(pre + "freqs", ff, s=1.0)
        t(pre + "mlp.0.weight", fd, 2 * ff)
        t(pre + "mlp.0.bias", fd)
        t(pre + "mlp.2.weight", fd, fd)
        t(pre + "mlp.2.bias", fd)
        ones(pre + "mlp.3.alpha", fd)
    for i in range(cfg.flow.depth):
        pre = f"flow_lm.flow_net.res_blocks.{i}."
        t(pre + "mlp.0.weight", fh, fd)
        t(pre + "mlp.0.bias", fh)
        t(pre + "mlp.2.weight", fd, fh)
        t(pre + "mlp.2.bias", fd)
        t(pre + "adaLN_modulation.1.weight", 3 * fd, fd)
        zeros(pre + "adaLN_modulation.1.bias", 3 * fd)
    t("flow_lm.flow_net.final_layer.linear.weight", lat, fd)
    zeros("flow_lm.flow_net.final_layer.linear.bias", lat)
    t("flow_lm.flow_net.final_layer.adaLN_modulation.1.weight", 2 * fd, fd)
    zeros("flow_lm.flow_net.final_layer.adaLN_modulation.1.bias", 2 * fd)

    md = cfg.mimi.dim
    mt = cfg.mimi.transformer
    t("mimi.quantizer.output_proj.weight", md, lat, 1)
    t("mimi.upsample.convtr.convtr.weight", md, 1, cfg.mimi.upsample_kernel,
      s=0.2)
    for i in range(mt.num_layers):
        pre = f"mimi.decoder_transformer.transformer.layers.{i}."
        ones(pre + "norm1.weight", md)
        zeros(pre + "norm1.bias", md)
        t(pre + "self_attn.in_proj.weight", 3 * md, md)
        t(pre + "self_attn.out_proj.weight", md, md)
        out[pre + "layer_scale_1.scale"] = np.full((md,), 0.01, np.float32)
        ones(pre + "norm2.weight", md)
        zeros(pre + "norm2.bias", md)
        t(pre + "linear1.weight", mt.hidden_dim, md)
        t(pre + "linear2.weight", md, mt.hidden_dim)
        out[pre + "layer_scale_2.scale"] = np.full((md,), 0.01, np.float32)

    sc = cfg.mimi.seanet
    t("mimi.decoder.model.0.conv.weight", sc.in_ch, sc.in_ch, sc.first_kernel)
    t("mimi.decoder.model.0.conv.bias", sc.in_ch)
    stage_names = [("model.2", "model.3"), ("model.5", "model.6"),
                   ("model.8", "model.9")]
    for st, (cname, rname) in zip(sc.stages, stage_names):
        t(f"mimi.decoder.{cname}.convtr.weight", st.in_ch, st.out_ch,
          st.kernel)
        t(f"mimi.decoder.{cname}.convtr.bias", st.out_ch)
        half = st.out_ch // 2
        t(f"mimi.decoder.{rname}.block.1.conv.weight", half, st.out_ch,
          sc.resnet_kernel)
        t(f"mimi.decoder.{rname}.block.1.conv.bias", half)
        t(f"mimi.decoder.{rname}.block.3.conv.weight", st.out_ch, half, 1)
        t(f"mimi.decoder.{rname}.block.3.conv.bias", st.out_ch)
    t("mimi.decoder.model.11.conv.weight", sc.out_ch, sc.stages[-1].out_ch,
      sc.last_kernel)
    t("mimi.decoder.model.11.conv.bias", sc.out_ch)

    return out


def random_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.float32):
    return params_from_flat(random_flat(cfg, seed), cfg, dtype)


def random_voice_prompt(cfg: ModelConfig, length: int = 32, seed: int = 1):
    rng = np.random.RandomState(seed)
    return (rng.randn(length, cfg.backbone.d_model) * 0.05).astype(np.float32)
