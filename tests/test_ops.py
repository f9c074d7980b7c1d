"""Unit tests for core ops against independently-written torch/numpy math."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from pocket_tts_tpu.ops import basic, conv, rope, attention


RNG = np.random.RandomState(42)


def rand(*shape, s=1.0):
    return (RNG.randn(*shape) * s).astype(np.float32)


# ---------------------------------------------------------------------------
# norms / activations
# ---------------------------------------------------------------------------

class TestNorms:
    def test_layer_norm_matches_torch(self):
        x = rand(3, 64)
        w, b = rand(64), rand(64)
        got = basic.layer_norm({"scale": jnp.array(w), "bias": jnp.array(b)},
                               jnp.array(x), eps=1e-5)
        want = F.layer_norm(torch.tensor(x), (64,), torch.tensor(w),
                            torch.tensor(b), eps=1e-5).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_layer_norm_eps0(self):
        # mimi decoder transformer uses eps=0 (defaults.h:14,32)
        x = rand(2, 32)
        got = basic.layer_norm({"scale": jnp.ones(32)}, jnp.array(x), eps=0.0)
        want = F.layer_norm(torch.tensor(x), (32,), eps=0.0).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_rms_norm_matches_formula(self):
        x = rand(4, 16)
        alpha = rand(16)
        got = basic.rms_norm({"alpha": jnp.array(alpha)}, jnp.array(x),
                             eps=1e-5)
        want = alpha * x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_mlp_std_norm_n_minus_1(self):
        # the flow net's quirky norm: x / sqrt(var_{n-1}(x) + eps) * alpha,
        # x NOT mean-subtracted (ref mlp.h:18-37)
        x = rand(8, 24)
        alpha = rand(24)
        got = basic.mlp_std_norm({"alpha": jnp.array(alpha)}, jnp.array(x),
                                 eps=1e-5)
        var = x.var(-1, keepdims=True, ddof=1)
        want = alpha * x / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_elu_matches_torch(self):
        x = rand(100)
        got = basic.elu(jnp.array(x))
        want = F.elu(torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    @pytest.mark.parametrize("approx", [False, True])
    def test_gelu_matches_torch(self, approx):
        x = rand(100)
        got = basic.gelu(jnp.array(x), approx)
        want = F.gelu(torch.tensor(x),
                      approximate="tanh" if approx else "none").numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


# ---------------------------------------------------------------------------
# rope
# ---------------------------------------------------------------------------

class TestRope:
    def test_matches_manual_interleaved(self):
        # manual reference: pairs (x[2j], x[2j+1]) rotated by pos*freq_j,
        # output = concat(re', im') (rope.h:183-272)
        T, H, D = 5, 3, 8
        x = rand(T, H, D)
        max_period = 10000.0
        pos = np.arange(T) + 7
        half = D // 2
        freqs = np.exp(-np.log(max_period) * np.arange(half) / half)
        angle = pos[:, None] * freqs[None, :]  # (T, half)
        re, im = x[..., 0::2], x[..., 1::2]
        c, s = np.cos(angle)[:, None, :], np.sin(angle)[:, None, :]
        want = np.concatenate([re * c - im * s, re * s + im * c], -1)

        cos, sin = rope.rope_cos_sin(jnp.array(pos), D, max_period)
        got = rope.apply_rope(jnp.array(x), cos, sin)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_halves_equals_interleaved_on_permuted_input(self):
        # the loader permutes in_proj columns (evens then odds per head) so
        # apply_rope_halves(P(x)) must equal apply_rope(x) bit-for-bit
        T, H, D = 5, 3, 16
        x = rand(T, H, D)
        perm = np.concatenate([np.arange(0, D, 2), np.arange(1, D, 2)])
        cos, sin = rope.rope_cos_sin(jnp.arange(7, 7 + T), D, 10000.0)
        want = rope.apply_rope(jnp.asarray(x), cos, sin)
        got = rope.apply_rope_halves(jnp.asarray(x[..., perm]), cos, sin)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_dot_product_relative(self):
        # q.k after rope depends only on relative distance
        H, D = 2, 16
        q = rand(1, H, D)
        k = rand(1, H, D)

        def score(pq, pk):
            qq, _ = rope.apply_rope_qk(jnp.array(q), jnp.array(q),
                                       jnp.array([pq]), 10000.0)
            kk, _ = rope.apply_rope_qk(jnp.array(k), jnp.array(k),
                                       jnp.array([pk]), 10000.0)
            return np.einsum("thd,shd->hts", np.asarray(qq), np.asarray(kk))

        np.testing.assert_allclose(score(5, 3), score(105, 103), atol=1e-3)


# ---------------------------------------------------------------------------
# convs
# ---------------------------------------------------------------------------

class TestConv:
    @pytest.mark.parametrize("cin,cout,k,stride,t", [
        (8, 16, 7, 1, 20), (16, 8, 3, 1, 9), (8, 8, 1, 1, 5), (6, 4, 4, 2, 12),
    ])
    def test_conv1d_matches_torch(self, cin, cout, k, stride, t):
        x = rand(cin, t)
        w = rand(cout, cin, k, s=0.2)
        b = rand(cout)
        got = conv.conv1d({"w": jnp.array(w), "b": jnp.array(b)},
                          jnp.array(x.T), stride)   # ops are time-major
        want = F.conv1d(torch.tensor(x)[None], torch.tensor(w),
                        torch.tensor(b), stride=stride)[0].numpy()
        np.testing.assert_allclose(np.asarray(got).T, want, atol=1e-4)

    @pytest.mark.parametrize("cin,cout,k,stride,t", [
        (8, 4, 12, 6, 10),   # K == 2*stride fast path
        (4, 8, 8, 4, 7),
        (4, 4, 5, 2, 6),     # general path
    ])
    def test_conv_transpose1d_matches_torch(self, cin, cout, k, stride, t):
        x = rand(cin, t)
        w = rand(cin, cout, k, s=0.2)
        b = rand(cout)
        got = conv.conv_transpose1d({"w": jnp.array(w), "b": jnp.array(b)},
                                    jnp.array(x.T), stride)
        want = F.conv_transpose1d(torch.tensor(x)[None], torch.tensor(w),
                                  torch.tensor(b), stride=stride)[0].numpy()
        np.testing.assert_allclose(np.asarray(got).T, want, atol=1e-4)

    def test_streaming_conv_equals_offline(self):
        # feeding chunks through streaming_conv1d == causal offline conv
        cin, cout, k = 6, 8, 7
        chunks = [rand(cin, 16) for _ in range(5)]
        full = np.concatenate(chunks, -1)
        p = {"w": jnp.array(rand(cout, cin, k, s=0.2)),
             "b": jnp.array(rand(cout))}
        prev = conv.conv1d_init_state(cin, k)
        outs = []
        for c in chunks:
            prev, y = conv.streaming_conv1d(p, prev, jnp.array(c.T))
            outs.append(np.asarray(y).T)
        got = np.concatenate(outs, -1)
        # offline causal: left-pad with k-1 zeros
        want = np.asarray(conv.conv1d(
            p, jnp.array(np.pad(full, ((0, 0), (k - 1, 0))).T))).T
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_streaming_convtr_equals_offline(self):
        # streaming overlap-add == full transposed conv, truncated causally
        cin, cout, k, s = 6, 4, 12, 6
        tin = 8
        chunks = [rand(cin, tin) for _ in range(4)]
        full = np.concatenate(chunks, -1)
        p = {"w": jnp.array(rand(cin, cout, k, s=0.2)),
             "b": jnp.array(rand(cout))}
        prev = conv.conv_transpose1d_init_state(cout, k, s, tin)
        outs = []
        for c in chunks:
            prev, y = conv.streaming_conv_transpose1d(p, prev,
                                                      jnp.array(c.T), s)
            outs.append(np.asarray(y).T)
        got = np.concatenate(outs, -1)
        want_full = F.conv_transpose1d(
            torch.tensor(full)[None], torch.tensor(np.asarray(p["w"])),
            torch.tensor(np.asarray(p["b"])), stride=s)[0].numpy()
        np.testing.assert_allclose(got, want_full[:, : got.shape[-1]],
                                   atol=1e-4)

    def test_depthwise_upsample_matches_torch(self):
        ch, k, s = 16, 32, 16
        x = rand(ch, 1)
        w = rand(ch, 1, k, s=0.2)
        got = conv.depthwise_upsample({"w": jnp.array(w)}, jnp.array(x.T),
                                      k, s)
        want = F.conv_transpose1d(torch.tensor(x)[None], torch.tensor(w),
                                  stride=s, groups=ch)[0].numpy()
        np.testing.assert_allclose(np.asarray(got).T, want, atol=1e-5)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

class TestAttention:
    def test_sdpa_matches_torch(self):
        T, S, H, D = 4, 9, 2, 8
        q, k, v = rand(T, H, D), rand(S, H, D), rand(S, H, D)
        bias = np.where(RNG.rand(T, S) > 0.3, 0.0, -1e9).astype(np.float32)
        got = attention.sdpa(jnp.array(q), jnp.array(k), jnp.array(v),
                             jnp.array(bias))
        # torch sdpa wants (H, T, D)
        want = F.scaled_dot_product_attention(
            torch.tensor(q.transpose(1, 0, 2)),
            torch.tensor(k.transpose(1, 0, 2)),
            torch.tensor(v.transpose(1, 0, 2)),
            attn_mask=torch.tensor(bias)[None],
        ).numpy().transpose(1, 0, 2)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    @pytest.mark.parametrize("t", [1, 16])
    def test_sdpa_seg_equals_sdpa(self, t):
        # the MXU seg-matmul formulation over flat caches == plain sdpa
        S, H, D = 48, 8, 16
        q, k, v = rand(t, H, D), rand(S, H, D), rand(S, H, D)
        bias = np.where(RNG.rand(t, S) > 0.3, 0.0, -1e9).astype(np.float32)
        want = attention.sdpa(jnp.array(q), jnp.array(k), jnp.array(v),
                              jnp.array(bias))
        got = attention.sdpa_seg(jnp.array(q),
                                 jnp.array(k.reshape(S, H * D)),
                                 jnp.array(v.reshape(S, H * D)),
                                 jnp.array(bias))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_ring_positions(self):
        # ref semantics (mimi_transformer.h:251-287): slot end_index holds
        # end_offset-1; older slots count down; unwritten slots are -1
        got = np.asarray(attention.ring_positions(jnp.int32(3), 5))
        np.testing.assert_array_equal(got, [0, 1, 2, -1, -1])
        got = np.asarray(attention.ring_positions(jnp.int32(7), 5))
        # end_index = 6 % 5 = 1 -> slot1=6, slot0=5, slots 2,3,4 = 2,3,4
        np.testing.assert_array_equal(got, [5, 6, 2, 3, 4])

    def test_ring_cache_equals_dense_window(self):
        # attention over the ring cache == dense attention over the last
        # `context` positions of the full history
        cap, ctx, H, D = 10, 10, 2, 4
        T = 2
        steps = 12
        ring_k = jnp.zeros((cap, H, D))
        ring_v = jnp.zeros((cap, H, D))
        hist_k, hist_v = [], []
        for step in range(steps):
            offset = step * T
            q = jnp.array(rand(T, H, D))
            k = jnp.array(rand(T, H, D))
            v = jnp.array(rand(T, H, D))
            hist_k.append(np.asarray(k))
            hist_v.append(np.asarray(v))
            ring_k = attention.cache_insert_ring(ring_k, k, offset)
            ring_v = attention.cache_insert_ring(ring_v, v, offset)
            bias = attention.ring_cache_bias(T, cap, offset, ctx)
            got = attention.sdpa(q, ring_k, ring_v, bias)

            kk = np.concatenate(hist_k, 0)
            vv = np.concatenate(hist_v, 0)
            S = kk.shape[0]
            pq = offset + np.arange(T)[:, None]
            pk = np.arange(S)[None, :]
            # the ring only retains the last `cap` positions (insertion is
            # blockwise), so the effective window is
            # max(pq - ctx + 1, end_offset - cap) — the reference behaves
            # the same way (overwritten slots are unreachable).
            end_offset = offset + T
            allowed = ((pq >= pk) & (pq - pk < ctx)
                       & (pk >= end_offset - cap))
            dense_bias = np.where(allowed, 0.0, -1e9).astype(np.float32)
            want = attention.sdpa(q, jnp.array(kk), jnp.array(vv),
                                  jnp.array(dense_bias))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5, err_msg=f"step {step}")
