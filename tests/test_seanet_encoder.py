"""SEANet streaming encoder vs an independent torch reference.

The reference carries the encoder as compiled-out code with no shipped
weights (moshi_seanet_encoder, seanet.h:61-158 — the pocket-tts build and
checkpoint are decode-only). The port generalizes the dead code's
module-index layout over the decoder's stage config: conv, then
[resnet, elu, strided conv] per reversed decoder stage, elu, final conv —
the exact transpose of the shipped decoder.
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.models import seanet


def _causal_conv(x, w, b, stride):
    """Left-padded (K - stride) strided conv on (T, Cin) -> (T/s, Cout)."""
    k = w.shape[2]
    xp = F.pad(x.T[None], (k - stride, 0))
    y = F.conv1d(xp, w, b, stride=stride)
    return y[0].T


def _torch_resnet(x, p):
    v = F.elu(x)
    v = _causal_conv(v, torch.tensor(np.asarray(p["block_1"]["w"])),
                     torch.tensor(np.asarray(p["block_1"]["b"]))
                     if "b" in p["block_1"] else None, 1)
    v = F.elu(v)
    v = _causal_conv(v, torch.tensor(np.asarray(p["block_3"]["w"])),
                     torch.tensor(np.asarray(p["block_3"]["b"]))
                     if "b" in p["block_3"] else None, 1)
    return x + v


def _torch_encoder(x, p, cfg):
    x = _causal_conv(x, torch.tensor(np.asarray(p["model_0"]["w"])),
                     torch.tensor(np.asarray(p["model_0"]["b"]))
                     if "b" in p["model_0"] else None, 1)
    n = len(cfg.stages)
    # dead-code ordering: conv, [resnet, elu, conv] x N, elu, conv —
    # no elu between a strided conv and the next group's resnet (the
    # resnet's own leading elu covers it)
    for gi, st in enumerate(reversed(cfg.stages)):
        x = _torch_resnet(x, p[f"model_{3 * gi + 1}"])
        x = F.elu(x)
        cp = p[f"model_{3 * gi + 3}"]
        x = _causal_conv(x, torch.tensor(np.asarray(cp["w"])),
                         torch.tensor(np.asarray(cp["b"]))
                         if "b" in cp else None, st.stride)
    x = F.elu(x)
    fp = p[f"model_{3 * n + 2}"]
    return _causal_conv(x, torch.tensor(np.asarray(fp["w"])),
                        torch.tensor(np.asarray(fp["b"]))
                        if "b" in fp else None, 1)


def _random_encoder_params(cfg, seed=0):
    rng = np.random.RandomState(seed)

    def conv(cout, cin, k):
        return {"w": jnp.asarray(rng.randn(cout, cin, k) * 0.2, jnp.float32),
                "b": jnp.asarray(rng.randn(cout) * 0.05, jnp.float32)}

    n = len(cfg.stages)
    p = {"model_0": conv(cfg.stages[-1].out_ch, cfg.out_ch,
                         cfg.first_kernel)}
    for gi, st in enumerate(reversed(cfg.stages)):
        c = st.out_ch
        p[f"model_{3 * gi + 1}"] = {
            "block_1": conv(c // 2, c, cfg.resnet_kernel),
            "block_3": conv(c, c // 2, 1)}
        p[f"model_{3 * gi + 3}"] = conv(st.in_ch, st.out_ch, st.kernel)
    p[f"model_{3 * n + 2}"] = conv(cfg.in_ch, cfg.stages[0].in_ch,
                                   cfg.last_kernel)
    return p


def test_encoder_vs_torch_oneshot():
    cfg = tiny_config().mimi.seanet
    p = _random_encoder_params(cfg, seed=1)
    rng = np.random.RandomState(2)
    t = 2 * cfg.total_stride
    x = rng.randn(t, cfg.out_ch).astype(np.float32) * 0.5
    st = seanet.encoder_init_state(cfg)
    _, y = seanet.encoder_forward(p, cfg, st, jnp.asarray(x))
    want = _torch_encoder(torch.tensor(x), p, cfg).numpy()
    assert y.shape == (t // cfg.total_stride, cfg.in_ch)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


def test_encoder_streaming_equals_oneshot():
    """Chunked encode (decoder-frame-sized chunks) == one-shot encode —
    the causal-tail state carries exactly the right context."""
    cfg = tiny_config().mimi.seanet
    p = _random_encoder_params(cfg, seed=3)
    rng = np.random.RandomState(4)
    frames = 4
    x = rng.randn(frames * cfg.total_stride, cfg.out_ch).astype(
        np.float32) * 0.5
    st = seanet.encoder_init_state(cfg)
    _, y_once = seanet.encoder_forward(p, cfg, st, jnp.asarray(x))
    st = seanet.encoder_init_state(cfg)
    outs = []
    for f in range(frames):
        chunk = x[f * cfg.total_stride:(f + 1) * cfg.total_stride]
        st, y = seanet.encoder_forward(p, cfg, st, jnp.asarray(chunk))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(y_once),
                               atol=1e-5)


def test_encoder_loader_roundtrip():
    """params_from_flat picks up mimi.encoder.model.N.* when present and
    the loaded params drive encoder_forward."""
    from pocket_tts_tpu.io.params import params_from_flat, random_flat
    cfg0 = tiny_config()
    flat = random_flat(cfg0, seed=5)
    sc = cfg0.mimi.seanet
    rng = np.random.RandomState(6)

    def put(name, cout, cin, k):
        flat[f"mimi.encoder.model.{name}.weight"] = (
            rng.randn(cout, cin, k).astype(np.float32) * 0.2)
        flat[f"mimi.encoder.model.{name}.bias"] = (
            rng.randn(cout).astype(np.float32) * 0.05)

    n = len(sc.stages)
    put("0.conv", sc.stages[-1].out_ch, sc.out_ch, sc.first_kernel)
    for gi, st in enumerate(reversed(sc.stages)):
        c = st.out_ch
        put(f"{3 * gi + 1}.block.1.conv", c // 2, c, sc.resnet_kernel)
        put(f"{3 * gi + 1}.block.3.conv", c, c // 2, 1)
        put(f"{3 * gi + 3}.conv", st.in_ch, st.out_ch, st.kernel)
    put(f"{3 * n + 2}.conv", sc.in_ch, sc.stages[0].in_ch, sc.last_kernel)

    params, cfg = params_from_flat(flat, cfg0)
    assert "encoder" in params["mimi"]
    sc = cfg.mimi.seanet
    x = rng.randn(sc.total_stride, sc.out_ch).astype(np.float32)
    st = seanet.encoder_init_state(sc)
    _, y = seanet.encoder_forward(params["mimi"]["encoder"], sc, st,
                                  jnp.asarray(x))
    assert y.shape == (1, sc.in_ch)
    assert np.isfinite(np.asarray(y)).all()
    # absent from a plain checkpoint
    params2, _ = params_from_flat(random_flat(cfg0, seed=7), cfg0)
    assert "encoder" not in params2["mimi"]
