"""Backbone cross-attention sub-block vs an independent torch reference.

Disabled in the reference's shipped pocket-tts configs (defaults.h:18
cross_attention=false) but carried as live compiled code there — and now
here (moshi_streaming_multihead_cross_attention,
src/pocket_tts/modules/mimi_transformer.h:343-396,714-762, layer placement
:939-947): KV comes from a once-cached projection of a conditioning
sequence through rows [d, 3d) of the module's own in_proj; q from rows
[0, d); non-causal unmasked SDPA; the sub-block sits between the
self-attention residual and the FF block with its own LayerNorm.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pocket_tts_tpu.ops.attention import cross_attention, cross_attn_kv


def _torch_cross(x, cond, w_in, w_out, h=4):
    """q/k/v thirds of one shared in_proj; q from x, k/v from cond."""
    d = x.shape[-1]
    q = x @ w_in[:, :d]
    k = cond @ w_in[:, d:2 * d]
    v = cond @ w_in[:, 2 * d:]
    q = q.reshape(x.shape[0], h, d // h).transpose(0, 1)
    k = k.reshape(cond.shape[0], h, d // h).transpose(0, 1)
    v = v.reshape(cond.shape[0], h, d // h).transpose(0, 1)
    o = F.scaled_dot_product_attention(q, k, v)
    return o.transpose(0, 1).reshape(x.shape[0], d) @ w_out


def test_cross_attention_vs_torch():
    rng = np.random.RandomState(0)
    d, t, s, h = 32, 5, 9, 4
    w_in = rng.randn(d, 3 * d).astype(np.float32) * 0.2
    w_out = rng.randn(d, d).astype(np.float32) * 0.2
    x = rng.randn(t, d).astype(np.float32)
    cond = rng.randn(s, d).astype(np.float32)
    p = {"in_proj": {"w": jnp.array(w_in)},
         "out_proj": {"w": jnp.array(w_out)}}
    xk, xv = cross_attn_kv(p["in_proj"], jnp.array(cond), h)
    assert xk.shape == (s, h, d // h) and xv.shape == (s, h, d // h)
    got = cross_attention(p, jnp.array(x), xk, xv, h)
    want = _torch_cross(torch.tensor(x), torch.tensor(cond),
                        torch.tensor(w_in), torch.tensor(w_out)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def _cross_model(seed=7):
    """A tiny checkpoint extended with per-layer cross weights."""
    from pocket_tts_tpu.config import tiny_config
    from pocket_tts_tpu.io.params import params_from_flat, random_flat
    cfg0 = tiny_config()
    flat = random_flat(cfg0, seed=seed)
    bb = cfg0.backbone
    rng = np.random.RandomState(seed + 1)
    d = bb.d_model
    for i in range(bb.num_layers):
        pre = f"flow_lm.transformer.layers.{i}."
        flat[pre + "norm_cross.weight"] = np.ones(d, np.float32)
        flat[pre + "norm_cross.bias"] = np.zeros(d, np.float32)
        flat[pre + "cross_attention.in_proj.weight"] = (
            rng.randn(3 * d, d).astype(np.float32) * 0.1)
        flat[pre + "cross_attention.out_proj.weight"] = (
            rng.randn(d, d).astype(np.float32) * 0.1)
    return params_from_flat(flat, cfg0)


def test_backbone_layer_cross_placement():
    """Layer output == torch composition: x += self_attn; x +=
    cross(LN_cross(x)); x += MLP(LN2(x)). Runs the decode step (T=1,
    XLA path) against a step-by-step numpy/torch recomputation."""
    from pocket_tts_tpu.models import backbone
    from pocket_tts_tpu.ops.basic import slice_layer_params
    params, cfg = _cross_model()
    bb = dataclasses.replace(cfg.backbone, use_pallas_attn=False)
    d = bb.d_model
    rng = np.random.RandomState(3)
    cond = rng.randn(6, d).astype(np.float32)
    x = rng.randn(1, d).astype(np.float32)

    st = backbone.init_state(bb)
    st = backbone.init_cross(params, bb, st, jnp.array(cond))
    assert st.xk is not None and len(st.xk) == bb.num_layers
    st2, y = backbone.forward(params, bb, st, jnp.array(x))

    # torch recomputation of layer 0's sub-blocks from the same params
    lp = slice_layer_params(params["layers"], 0)
    xt = torch.tensor(x)
    n1 = F.layer_norm(xt, (d,), torch.tensor(np.asarray(lp["norm1"]["scale"])),
                      torch.tensor(np.asarray(lp["norm1"]["bias"])))
    qkv = n1 @ torch.tensor(np.asarray(lp["in_proj"]["w"]))
    # T=1, empty cache: self-attention over the single new row = v of
    # that row (softmax over one key), regardless of RoPE on q/k
    v_self = qkv[:, 2 * d:]
    xt = xt + v_self @ torch.tensor(np.asarray(lp["out_proj"]["w"]))
    nc = F.layer_norm(xt, (d,),
                      torch.tensor(np.asarray(lp["norm_cross"]["scale"])),
                      torch.tensor(np.asarray(lp["norm_cross"]["bias"])))
    xt = xt + _torch_cross(
        nc, torch.tensor(cond),
        torch.tensor(np.asarray(lp["cross_attention"]["in_proj"]["w"])),
        torch.tensor(np.asarray(lp["cross_attention"]["out_proj"]["w"])))
    n2 = F.layer_norm(xt, (d,), torch.tensor(np.asarray(lp["norm2"]["scale"])),
                      torch.tensor(np.asarray(lp["norm2"]["bias"])))
    # random_flat ships bias-free linears (like the reference checkpoint)
    mlp = F.gelu(n2 @ torch.tensor(np.asarray(lp["linear1"]["w"])))
    xt = xt + mlp @ torch.tensor(np.asarray(lp["linear2"]["w"]))

    # reproduce layer 0's output by running a 1-layer config
    import jax
    bb1 = dataclasses.replace(bb, num_layers=1)
    st1 = backbone.init_state(bb1)
    st1 = st1.replace(xk=st.xk[:1], xv=st.xv[:1])
    p1 = dict(params)
    p1["layers"] = jax.tree.map(lambda a: a[:1],
                                params["layers"])
    _, y1 = backbone.forward(p1, bb1, st1, jnp.array(x))
    np.testing.assert_allclose(np.asarray(y1), xt.numpy(), atol=3e-4)


def test_cross_attention_audio_differs_and_finite():
    """End-to-end: conditioning changes the audio; no-cross == baseline
    (the cross path engages only via init_cross)."""
    from pocket_tts_tpu.models import backbone
    params, cfg = _cross_model(seed=11)
    bb = dataclasses.replace(cfg.backbone, use_pallas_attn=False)
    d = bb.d_model
    rng = np.random.RandomState(5)
    x = rng.randn(4, d).astype(np.float32)
    cond_a = rng.randn(6, d).astype(np.float32)
    cond_b = rng.randn(6, d).astype(np.float32)

    st0 = backbone.init_state(bb)
    _, y_plain = backbone.forward(params, bb, st0, jnp.array(x))
    st_a = backbone.init_cross(params, bb,
                               backbone.init_state(bb), jnp.array(cond_a))
    _, y_a = backbone.forward(params, bb, st_a, jnp.array(x))
    st_b = backbone.init_cross(params, bb,
                               backbone.init_state(bb), jnp.array(cond_b))
    _, y_b = backbone.forward(params, bb, st_b, jnp.array(x))

    assert np.isfinite(np.asarray(y_a)).all()
    assert np.abs(np.asarray(y_a) - np.asarray(y_plain)).max() > 1e-5
    assert np.abs(np.asarray(y_a) - np.asarray(y_b)).max() > 1e-5


def test_cross_loader_roundtrip_and_quantized():
    """params_from_flat picks up per-layer cross weights; quantize_params
    rewrites them and the composed path still runs."""
    from pocket_tts_tpu.io.quant import quantize_params
    from pocket_tts_tpu.models import backbone
    params, cfg = _cross_model(seed=13)
    lay = params["layers"]
    assert "cross_attention" in lay and "norm_cross" in lay
    assert lay["cross_attention"]["in_proj"]["w"].shape[0] == (
        cfg.backbone.num_layers)
    bb = dataclasses.replace(cfg.backbone, use_pallas_attn=False)
    d = bb.d_model
    rng = np.random.RandomState(9)
    cond = rng.randn(5, d).astype(np.float32)
    x = rng.randn(1, d).astype(np.float32)
    st = backbone.init_cross(params, bb,
                             backbone.init_state(bb), jnp.array(cond))
    _, y = backbone.forward(params, bb, st, jnp.array(x))
    pq = quantize_params(params, bits=8)
    stq = backbone.init_cross(pq, bb,
                              backbone.init_state(bb), jnp.array(cond))
    _, yq = backbone.forward(pq, bb, stq, jnp.array(x))
    assert np.isfinite(np.asarray(yq)).all()
    ref = np.asarray(y)
    assert np.abs(np.asarray(yq) - ref).max() / np.abs(ref).max() < 0.1
