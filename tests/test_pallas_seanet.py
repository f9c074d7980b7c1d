"""SEANet megakernel (interpret mode) vs the XLA decoder chain."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import tiny_config
from pocket_tts_tpu.io.params import params_from_flat, random_flat
from pocket_tts_tpu.models import seanet

CFG0 = tiny_config()
FLAT = random_flat(CFG0, seed=44)
PARAMS, CFG = params_from_flat(FLAT, CFG0)
SC = CFG.mimi.seanet
SC_K = dataclasses.replace(SC, use_pallas=True)     # interpret on CPU
DEC = PARAMS["mimi"]["decoder"]
TPF = CFG.mimi.upsample_stride


def test_kernel_ok_on_reference_shape():
    from pocket_tts_tpu.ops.pallas_seanet import kernel_ok
    assert kernel_ok(SC)
    wide_last = dataclasses.replace(SC.stages[2], out_ch=256)
    assert not kernel_ok(dataclasses.replace(
        SC, stages=SC.stages[:2] + (wide_last,)))  # no blocked tail


def test_streaming_matches_xla_chain():
    """Three frames through the megakernel == the XLA op chain, carries
    included (the kernel updates every stage's streaming state in place)."""
    rng = np.random.RandomState(0)
    st_x = seanet.init_state(SC, TPF)
    st_k = seanet.init_state(SC_K, TPF)
    for f in range(3):
        x = jnp.asarray(rng.randn(TPF, SC.in_ch).astype(np.float32) * 0.3)
        st_x, y_x = seanet.forward(DEC, SC, st_x, x)
        st_k, y_k = seanet.forward(DEC, SC_K, st_k, x)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x),
                                   atol=1e-4, err_msg=f"frame {f}")
        for key in st_x:
            np.testing.assert_allclose(
                np.asarray(st_k[key]), np.asarray(st_x[key]), atol=1e-4,
                err_msg=f"frame {f} carry {key}")


def test_vmap_matches_per_stream():
    rng = np.random.RandomState(1)
    b = 3
    xs = jnp.asarray(rng.randn(b, TPF, SC.in_ch).astype(np.float32) * 0.3)
    st = seanet.init_state(SC_K, TPF)
    st_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (b,) + a.shape), st)
    st_out, pcm_b = jax.vmap(
        lambda s, x: seanet.forward(DEC, SC_K, s, x))(st_b, xs)
    for i in range(b):
        _, pcm_i = seanet.forward(DEC, SC_K, st, xs[i])
        np.testing.assert_allclose(np.asarray(pcm_b[i]), np.asarray(pcm_i),
                                   atol=1e-5)


def test_vmap_bf16_batched_grid_matches_per_stream():
    """bf16 streams keep the one-call batched grid (f32 falls back to a
    per-lane lax.map — its whole weight set alone busts scoped VMEM when
    the batched grid double-buffers; measured OOM at 4 lanes on v5e)."""
    rng = np.random.RandomState(2)
    b = 3
    dec16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), DEC)
    xs = jnp.asarray(rng.randn(b, TPF, SC.in_ch) * 0.3).astype(jnp.bfloat16)
    st = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      seanet.init_state(SC_K, TPF))
    st_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (b,) + a.shape), st)
    _, pcm_b = jax.vmap(
        lambda s, x: seanet.forward(dec16, SC_K, s, x))(st_b, xs)
    for i in range(b):
        _, pcm_i = seanet.forward(dec16, SC_K, st, xs[i])
        np.testing.assert_allclose(
            np.asarray(pcm_b[i], np.float32), np.asarray(pcm_i, np.float32),
            atol=2e-2)
