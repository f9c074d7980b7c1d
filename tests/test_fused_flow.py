"""Whole-flow-net fused kernel (interpret) vs the XLA SimpleMLPAdaLN."""
import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import params_from_flat, random_flat
from pocket_tts_tpu.io.quant import quantize_params
from pocket_tts_tpu.models import flow_mlp
from pocket_tts_tpu.ops import fused_flow

# seed_dims=64 -> flow dim 128, mlp_hidden 128: every flow linear is
# quantize-eligible (N >= 128)
CFG0 = tiny_config(64)
FLAT = random_flat(CFG0, seed=55)
PARAMS, CFG = params_from_flat(FLAT, CFG0)


def _q(bits):
    return quantize_params(PARAMS, bits=bits)["flow_net"]


def test_supported_detection():
    assert not fused_flow.supported(PARAMS["flow_net"])  # bf16: XLA path
    for bits in (8, 4):
        assert fused_flow.supported(_q(bits))


def test_fused_matches_xla():
    rng = np.random.RandomState(0)
    c = jnp.asarray(rng.randn(CFG.backbone.d_model).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.randn(CFG.latent_dim).astype(np.float32) * 0.5)
    tc = flow_mlp.time_cond(PARAMS["flow_net"])
    for bits in (8, 4):
        pq = _q(bits)
        want = flow_mlp.forward(pq, c, x, tc, use_pallas=False)
        got = fused_flow.flow_forward(pq, c, x, tc, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, err_msg=f"bits={bits}")


def test_grouped_scales_match():
    """K-grouped (Q4_0) int4: in-kernel grouped dequant (f32 x, batched
    rows) and the bf16 B==1 block-diagonal raw-byte path both match the
    XLA grouped math."""
    rng = np.random.RandomState(7)
    pq = quantize_params(PARAMS, bits=4, group=32)["flow_net"]
    assert fused_flow.supported(pq)
    c = jnp.asarray(rng.randn(CFG.backbone.d_model).astype(np.float32) * .3)
    x = jnp.asarray(rng.randn(CFG.latent_dim).astype(np.float32) * 0.5)
    tc = flow_mlp.time_cond(PARAMS["flow_net"])
    want = flow_mlp.forward(pq, c, x, tc, use_pallas=False)
    got = fused_flow.flow_forward(pq, c, x, tc, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)
    # bf16 activations -> the bd scheme inside the kernel
    got16 = fused_flow.flow_forward(pq, c.astype(jnp.bfloat16),
                                    x.astype(jnp.bfloat16),
                                    tc, interpret=True)
    np.testing.assert_allclose(np.asarray(got16, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)


def test_vmap_batches_streams():
    rng = np.random.RandomState(1)
    b = 4
    cs = jnp.asarray(rng.randn(b, CFG.backbone.d_model)
                     .astype(np.float32) * 0.3)
    xs = jnp.asarray(rng.randn(b, CFG.latent_dim).astype(np.float32) * 0.5)
    tc = flow_mlp.time_cond(PARAMS["flow_net"])
    pq = _q(4)
    got = jax.vmap(lambda c, x: fused_flow.flow_forward(
        pq, c, x, tc, interpret=True))(cs, xs)
    want = np.stack([np.asarray(fused_flow.flow_forward(
        pq, cs[i], xs[i], tc, interpret=True)) for i in range(b)])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
