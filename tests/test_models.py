"""Model-module tests against independent torch implementations that consume
the *flat checkpoint dict* directly — validating both the math and the
checkpoint-name -> pytree mapping."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import (params_from_flat, random_flat,
                                      random_voice_prompt)
from pocket_tts_tpu.models import (backbone, flow_lm, flow_mlp, mimi,
                                   mimi_transformer, seanet, tts)

CFG0 = tiny_config()
FLAT = random_flat(CFG0, seed=7)
PARAMS, CFG = params_from_flat(FLAT, CFG0)


def T(name):
    return torch.tensor(FLAT[name])


def t_linear(x, prefix):
    w = T(prefix + ".weight")
    b = FLAT.get(prefix + ".bias")
    return F.linear(x, w, torch.tensor(b) if b is not None else None)


# ---------------------------------------------------------------------------
# flow net (SimpleMLPAdaLN)
# ---------------------------------------------------------------------------

def torch_flow_net(c, x):
    """Independent torch port of simple_mlp_adaln_forward (mlp.h:233-251)."""
    pre = "flow_lm.flow_net."

    def timestep(j, t):
        freqs = T(pre + f"time_embed.{j}.freqs")
        args = freqs * t
        emb = torch.cat([torch.cos(args), torch.sin(args)], -1)
        h = F.silu(t_linear(emb, pre + f"time_embed.{j}.mlp.0"))
        h = t_linear(h, pre + f"time_embed.{j}.mlp.2")
        # quirky (n-1)-variance std-norm, x not centered (mlp.h:18-37)
        var = h.var(-1, unbiased=True, keepdim=True)
        return T(pre + f"time_embed.{j}.mlp.3.alpha") * h / torch.sqrt(
            var + 1e-5)

    h = t_linear(x, pre + "input_proj")
    y = 0.5 * (timestep(1, 1.0) + timestep(0, 0.0)) \
        + t_linear(c, pre + "cond_embed")
    for i in range(CFG.flow.depth):
        bp = pre + f"res_blocks.{i}."
        mod = t_linear(F.silu(y), bp + "adaLN_modulation.1")
        shift, scale, gate = mod.chunk(3, -1)
        hn = F.layer_norm(h, h.shape[-1:], eps=1e-6)
        hn = hn * (1 + scale) + shift
        hn = t_linear(F.silu(t_linear(hn, bp + "mlp.0")), bp + "mlp.2")
        h = h + gate * hn
    mod = t_linear(F.silu(y), pre + "final_layer.adaLN_modulation.1")
    shift, scale = mod.chunk(2, -1)
    h = F.layer_norm(h, h.shape[-1:], eps=1e-6) * (1 + scale) + shift
    return t_linear(h, pre + "final_layer.linear")


def test_flow_mlp_vs_torch():
    rng = np.random.RandomState(0)
    c = rng.randn(CFG.backbone.d_model).astype(np.float32)
    x = rng.randn(CFG.latent_dim).astype(np.float32)
    got = flow_mlp.forward(PARAMS["flow_net"], jnp.array(c), jnp.array(x))
    want = torch_flow_net(torch.tensor(c), torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_time_cond_precompute_matches():
    tc = PARAMS["_time_cond"]
    got = flow_mlp.time_cond(PARAMS["flow_net"])
    np.testing.assert_allclose(np.asarray(tc), np.asarray(got), atol=1e-6)


# ---------------------------------------------------------------------------
# backbone: streaming cache vs torch full-sequence attention
# ---------------------------------------------------------------------------

def np_rope(x, positions, max_period=10000.0):
    half = x.shape[-1] // 2
    freqs = np.exp(-np.log(max_period) * np.arange(half) / half)
    ang = positions[:, None] * freqs[None, :]
    c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    re, im = x[..., 0::2], x[..., 1::2]
    out = np.concatenate([re * c - im * s, re * s + im * c], -1)
    return out.astype(np.float32)


def torch_backbone(x):
    """Full-sequence (no cache) reference of streaming_transformer_forward
    (transformer.h:55-199,253-278,363-374)."""
    Tn = x.shape[0]
    H = CFG.backbone.num_heads
    D = CFG.backbone.head_dim
    pos = np.arange(Tn).astype(np.float32)
    mask = torch.where(
        torch.arange(Tn)[:, None] >= torch.arange(Tn)[None, :],
        0.0, float("-inf"))
    for i in range(CFG.backbone.num_layers):
        lp = f"flow_lm.transformer.layers.{i}."
        h = F.layer_norm(x, x.shape[-1:], T(lp + "norm1.weight"),
                         T(lp + "norm1.bias"), eps=1e-5)
        qkv = t_linear(h, lp + "self_attn.in_proj")
        q, k, v = qkv.chunk(3, -1)
        q = torch.tensor(np_rope(q.reshape(Tn, H, D).numpy(), pos))
        k = torch.tensor(np_rope(k.reshape(Tn, H, D).numpy(), pos))
        v = v.reshape(Tn, H, D)
        att = F.scaled_dot_product_attention(
            q.permute(1, 0, 2), k.permute(1, 0, 2), v.permute(1, 0, 2),
            attn_mask=mask[None])
        att = att.permute(1, 0, 2).reshape(Tn, -1)
        x = x + t_linear(att, lp + "self_attn.out_proj")
        h = F.layer_norm(x, x.shape[-1:], T(lp + "norm2.weight"),
                         T(lp + "norm2.bias"), eps=1e-5)
        x = x + t_linear(F.gelu(t_linear(h, lp + "linear1")), lp + "linear2")
    return x


def test_backbone_prefill_then_decode_vs_torch():
    rng = np.random.RandomState(1)
    total, n_prefill = 12, 8
    x = rng.randn(total, CFG.backbone.d_model).astype(np.float32) * 0.3
    want = torch_backbone(torch.tensor(x)).numpy()

    state = backbone.init_state(CFG.backbone)
    state, y = backbone.forward(PARAMS, CFG.backbone, state,
                                jnp.array(x[:n_prefill]))
    state = backbone.advance(state, n_prefill, n_prefill)
    np.testing.assert_allclose(np.asarray(y), want[:n_prefill], atol=2e-4)
    for i in range(n_prefill, total):
        state, y = backbone.forward(PARAMS, CFG.backbone, state,
                                    jnp.array(x[i:i + 1]))
        state = backbone.advance(state, 1, 1)
        np.testing.assert_allclose(np.asarray(y)[0], want[i], atol=2e-4,
                                   err_msg=f"step {i}")


def test_backbone_padded_prefill_matches_exact():
    """Padding garbage must not leak into valid positions or later steps."""
    rng = np.random.RandomState(2)
    n = 5
    x = rng.randn(n, CFG.backbone.d_model).astype(np.float32) * 0.3
    pad = np.pad(x, ((0, 11), (0, 0)), constant_values=3.3)

    s_exact = backbone.init_state(CFG.backbone)
    s_exact, y_exact = backbone.forward(PARAMS, CFG.backbone, s_exact,
                                        jnp.array(x))
    s_exact = backbone.advance(s_exact, n, n)

    s_pad = backbone.init_state(CFG.backbone)
    s_pad, y_pad = backbone.forward(PARAMS, CFG.backbone, s_pad,
                                    jnp.array(pad), n_valid=n)
    s_pad = backbone.advance(s_pad, pad.shape[0], n)

    np.testing.assert_allclose(np.asarray(y_pad)[:n], np.asarray(y_exact),
                               atol=1e-5)
    # decode one more step from both states
    nxt = rng.randn(1, CFG.backbone.d_model).astype(np.float32) * 0.3
    _, y1 = backbone.forward(PARAMS, CFG.backbone, s_exact, jnp.array(nxt))
    _, y2 = backbone.forward(PARAMS, CFG.backbone, s_pad, jnp.array(nxt))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


# ---------------------------------------------------------------------------
# mimi transformer: ring cache vs torch sliding-window reference
# ---------------------------------------------------------------------------

def torch_mimi_transformer(x, ctx_window, tpf, cap):
    """Full-sequence reference with sliding causal window + layer scale +
    eps=0 norms (mimi_transformer.h:912-973). Keys older than the ring
    retention horizon (block-wise insertion overwrites whole frames) are
    unreachable — same in the reference, whose bias pattern is derived from
    the post-insert ring contents (torch.h:160-221)."""
    Tn = x.shape[0]
    mt = CFG.mimi.transformer
    H, D = mt.num_heads, mt.head_dim
    pos = np.arange(Tn).astype(np.float32)
    i_ = torch.arange(Tn)[:, None]
    j_ = torch.arange(Tn)[None, :]
    retain = (i_ // tpf + 1) * tpf - cap  # oldest surviving position
    mask = torch.where((i_ >= j_) & (i_ - j_ < ctx_window) & (j_ >= retain),
                       0.0, float("-inf"))
    for i in range(mt.num_layers):
        lp = f"mimi.decoder_transformer.transformer.layers.{i}."
        h = F.layer_norm(x, x.shape[-1:], T(lp + "norm1.weight"),
                         T(lp + "norm1.bias"), eps=0.0)
        qkv = t_linear(h, lp + "self_attn.in_proj")
        q, k, v = qkv.chunk(3, -1)
        q = torch.tensor(np_rope(q.reshape(Tn, H, D).numpy(), pos))
        k = torch.tensor(np_rope(k.reshape(Tn, H, D).numpy(), pos))
        v = v.reshape(Tn, H, D)
        att = F.scaled_dot_product_attention(
            q.permute(1, 0, 2), k.permute(1, 0, 2), v.permute(1, 0, 2),
            attn_mask=mask[None])
        att = att.permute(1, 0, 2).reshape(Tn, -1)
        x = x + T(lp + "layer_scale_1.scale") * t_linear(
            att, lp + "self_attn.out_proj")
        h = F.layer_norm(x, x.shape[-1:], T(lp + "norm2.weight"),
                         T(lp + "norm2.bias"), eps=0.0)
        up = t_linear(F.gelu(t_linear(h, lp + "linear1")), lp + "linear2")
        x = x + T(lp + "layer_scale_2.scale") * up
    return x


def test_mimi_transformer_vs_torch():
    mt = CFG.mimi.transformer
    rng = np.random.RandomState(3)
    frames, tpf = 7, 8  # 56 steps > capacity 40 -> exercises wraparound
    x = rng.randn(frames * tpf, mt.d_model).astype(np.float32) * 0.3
    want = torch_mimi_transformer(torch.tensor(x), mt.context, tpf,
                                  mt.capacity).numpy()

    state = mimi_transformer.init_state(mt)
    for f in range(frames):
        chunk = x[f * tpf:(f + 1) * tpf]
        state, y = mimi_transformer.forward(PARAMS["mimi"][
            "decoder_transformer"], mt, state, jnp.array(chunk))
        np.testing.assert_allclose(np.asarray(y), want[f * tpf:(f + 1) * tpf],
                                   atol=2e-4, err_msg=f"frame {f}")


# ---------------------------------------------------------------------------
# seanet: streaming == offline causal pipeline
# ---------------------------------------------------------------------------

def torch_seanet_offline(x):
    """Offline causal SEANet: convs left-padded, convtrs truncated.
    ref pipeline: seanet.h:187-211."""
    sc = CFG.mimi.seanet

    def conv(x, prefix, k, pad=True):
        w = T(prefix + ".weight")
        b = FLAT.get(prefix + ".bias")
        xin = F.pad(x[None], (k - 1, 0)) if pad else x[None]
        return F.conv1d(xin, w, torch.tensor(b) if b is not None else None)[0]

    def convtr(x, prefix, s):
        w = T(prefix + ".weight")
        b = FLAT.get(prefix + ".bias")
        y = F.conv_transpose1d(x[None], w,
                               torch.tensor(b) if b is not None else None,
                               stride=s)[0]
        return y[:, : x.shape[-1] * s]

    def resnet(x, base):
        v = F.elu(x)
        v = conv(v, base + ".block.1.conv", sc.resnet_kernel)
        v = F.elu(v)
        v = conv(v, base + ".block.3.conv", 1)
        return x + v

    x = conv(x, "mimi.decoder.model.0.conv", sc.first_kernel)
    x = F.elu(x)
    for st, (cn, rn) in zip(sc.stages, [("model.2", "model.3"),
                                        ("model.5", "model.6"),
                                        ("model.8", "model.9")]):
        x = convtr(x, f"mimi.decoder.{cn}.convtr", st.stride)
        x = resnet(x, f"mimi.decoder.{rn}")
        x = F.elu(x)
    return conv(x, "mimi.decoder.model.11.conv", sc.last_kernel)


def test_seanet_streaming_vs_offline():
    sc = CFG.mimi.seanet
    rng = np.random.RandomState(4)
    frames, tpf = 4, 16
    x = rng.randn(sc.in_ch, frames * tpf).astype(np.float32) * 0.3
    want = torch_seanet_offline(torch.tensor(x)).numpy()

    state = seanet.init_state(sc, tpf)
    outs = []
    for f in range(frames):
        state, y = seanet.forward(PARAMS["mimi"]["decoder"], sc, state,
                                  jnp.array(x[:, f * tpf:(f + 1) * tpf].T))
        outs.append(np.asarray(y).T)
    got = np.concatenate(outs, -1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


# ---------------------------------------------------------------------------
# mimi full decode + frame identity
# ---------------------------------------------------------------------------

def test_mimi_decode_frame_shape_and_state():
    state = mimi.init_state(CFG.mimi)
    rng = np.random.RandomState(5)
    latent = jnp.array(rng.randn(CFG.latent_dim).astype(np.float32))
    state, pcm = mimi.decode_frame(PARAMS["mimi"], CFG.mimi, state, latent)
    assert pcm.shape == (CFG.mimi.frame_size,)
    assert int(state.transformer.offset) == CFG.mimi.upsample_stride
    assert bool(jnp.all(jnp.isfinite(pcm)))


def test_upsample_overlap_add_vs_torch():
    """Frame-by-frame depthwise upsample == full depthwise conv_transpose."""
    cfgm = CFG.mimi
    k, s = cfgm.upsample_kernel, cfgm.upsample_stride
    ch = cfgm.dim
    rng = np.random.RandomState(6)
    n = 5
    xs = rng.randn(ch, n).astype(np.float32)
    w = FLAT["mimi.upsample.convtr.convtr.weight"]
    want = F.conv_transpose1d(torch.tensor(xs)[None], torch.tensor(w),
                              stride=s, groups=ch)[0].numpy()[:, : n * s]

    from pocket_tts_tpu.ops.conv import depthwise_upsample
    prev = jnp.zeros((k, ch))
    outs = []
    p = PARAMS["mimi"]["upsample"]
    for i in range(n):
        y = depthwise_upsample(p, jnp.array(xs[:, i:i + 1].T), k, s)
        y = y.at[: k - s].add(prev[s:])
        prev = y
        outs.append(np.asarray(y[: k - s]).T)
    got = np.concatenate(outs, -1)
    np.testing.assert_allclose(got, want, atol=1e-4)
