"""GGUF container round-trip + reference name-shortening interop.

ref: /root/reference/src/loader.h:78-99,120-137,228-272, src/crc-bbf.h.
"""
import zlib

import numpy as np
import pytest

from pocket_tts_tpu.io.gguf import (GGUFFile, dequantize_q4_0,
                                    dequantize_q8_0, quantize_q4_0,
                                    quantize_q8_0, read_gguf, shorten_name,
                                    write_gguf)


def test_round_trip_dtypes_and_metadata(tmp_path):
    import ml_dtypes
    rng = np.random.RandomState(0)
    tensors = {
        "a.f32": rng.randn(3, 5).astype(np.float32),
        "b.f16": rng.randn(8).astype(np.float16),
        "c.bf16": rng.randn(4, 4).astype(np.float32).astype(
            ml_dtypes.bfloat16),
        "d.i8": rng.randint(-100, 100, (7,), dtype=np.int8),
        "e.i32": rng.randint(-5, 5, (2, 3), dtype=np.int32),
        "f.scalar": np.full((1,), 2.5, np.float32),  # GGUF min n_dims is 1
    }
    meta = {"general.name": "unit", "n": 7, "pi": 3.5, "flag": True,
            "tags": ["x", "y"]}
    path = str(tmp_path / "t.gguf")
    write_gguf(path, tensors, metadata=meta)
    got, gmeta = read_gguf(path)
    assert gmeta["general.name"] == "unit"
    assert gmeta["n"] == 7 and gmeta["pi"] == 3.5 and gmeta["flag"] is True
    assert gmeta["tags"] == ["x", "y"]
    for k, v in tensors.items():
        g = got[k]
        assert g.shape == v.shape, k
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(v, np.float32), err_msg=k)


def test_shorten_name_matches_reference_wire_behavior():
    # the reference loop (loader.h:126-135) overwrites each char, leaving
    # hexdigit((crc >> 8*i) & 0xf); with a 32-bit crc chars 4..7 are '0'
    name = "pts.flow_lm.transformer.layers.0.self_attn.in_proj_weight" \
           ".something_long"
    assert len(name) >= 64
    crc = zlib.crc32(name.encode())
    expect = "".join("0123456789abcdef"[(crc >> (8 * i)) & 0xF]
                     for i in range(4)) + "0000"
    assert shorten_name(name) == expect
    # short names pass through untouched
    assert shorten_name("small") == "small"


def test_long_names_load_by_original_key(tmp_path):
    long_a = "block." + "a" * 70
    long_b = "block." + "b" * 70
    tensors = {long_a: np.arange(6, dtype=np.float32).reshape(2, 3),
               long_b: np.ones((4,), np.float32),
               "short": np.zeros((2,), np.float32)}
    path = str(tmp_path / "long.gguf")
    write_gguf(path, tensors)
    f = GGUFFile(path)
    # stored under the shortened wire name...
    assert shorten_name(long_a) in f.infos
    # ...but resolvable by the original key (both via recorded metadata and
    # via lookup-time shortening, the reference's mechanism)
    np.testing.assert_array_equal(f.get(long_a), tensors[long_a])
    f._longnames.clear()
    np.testing.assert_array_equal(f.get(long_b), tensors[long_b])
    with pytest.raises(KeyError):
        f.get("missing")


def test_q8_0_codec():
    rng = np.random.RandomState(1)
    x = (rng.randn(8, 64) * 3).astype(np.float32)
    raw = quantize_q8_0(x)
    assert len(raw) == 8 * 64 // 32 * 34
    back = dequantize_q8_0(raw, x.size).reshape(x.shape)
    err = np.abs(back - x).max()
    assert err <= np.abs(x).max() / 127.0 + 1e-6


def test_q4_0_codec():
    rng = np.random.RandomState(2)
    x = (rng.randn(4, 96)).astype(np.float32)
    raw = quantize_q4_0(x)
    assert len(raw) == 4 * 96 // 32 * 18
    back = dequantize_q4_0(raw, x.size).reshape(x.shape)
    # 4-bit: coarse but bounded by one step of the block scale
    scales = np.abs(x.reshape(-1, 32)).max(axis=1) / 8.0
    assert np.abs((back - x).reshape(-1, 32)).max(axis=1).max() <= \
        scales.max() + 1e-6


def test_q8_k_codec():
    from pocket_tts_tpu.io.gguf import dequantize_q8_k, quantize_q8_k
    rng = np.random.RandomState(4)
    x = (rng.randn(4, 512) * 2).astype(np.float32)
    x[3, :256] = 0.0  # zero block: d must encode 0, round-trip to zeros
    raw = quantize_q8_k(x)
    assert len(raw) == 4 * 512 // 256 * 292
    back = dequantize_q8_k(raw, x.size).reshape(x.shape)
    # one int8 step of the per-block scale
    scales = np.abs(x.reshape(-1, 256)).max(axis=1) / 128.0
    assert np.abs((back - x).reshape(-1, 256)).max(axis=1).max() <= \
        scales.max() * 0.75 + 1e-7
    np.testing.assert_array_equal(back[3, :256], 0.0)
    # bsums must be the group-of-16 sums of the stored quants (the ggml
    # dot kernels consume them)
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 292)
    q = blk[:, 4:260].copy().view(np.int8).astype(np.int32)
    bsums = blk[:, 260:].copy().view(np.int16)
    np.testing.assert_array_equal(q.reshape(-1, 16, 16).sum(axis=2), bsums)


def test_q4_k_codec():
    from pocket_tts_tpu.io.gguf import (_pack_scale_min_k4,
                                        _unpack_scale_min_k4,
                                        dequantize_q4_k, quantize_q4_k)
    rng = np.random.RandomState(5)
    # offset-heavy data (nonzero means) is where Q4_K's min term earns it
    x = (rng.randn(8, 256) + 3.0).astype(np.float32)
    raw = quantize_q4_k(x)
    assert len(raw) == 8 * 144
    back = dequantize_q4_k(raw, x.size).reshape(x.shape)
    # error bounded by ~one 4-bit step of the sub-block range plus the
    # 6-bit scale/min quantization
    rng_sub = x.reshape(-1, 32)
    step = (rng_sub.max(axis=1) - np.minimum(rng_sub.min(axis=1), 0)) / 15.0
    assert np.abs((back - x).reshape(-1, 32)).max(axis=1).max() <= \
        1.3 * step.max() + 1e-6
    # scale/min 6-bit packing is a bijection on [0,63]
    ls = rng.randint(0, 64, (5, 8)).astype(np.uint8)
    lm = rng.randint(0, 64, (5, 8)).astype(np.uint8)
    s, m = _unpack_scale_min_k4(_pack_scale_min_k4(ls, lm))
    np.testing.assert_array_equal(s, ls)
    np.testing.assert_array_equal(m, lm)


def test_q4_k_beats_q4_0_on_offset_data():
    """The min term is Q4_K's reason to exist: on all-positive data Q4_0
    wastes half its grid on negatives."""
    from pocket_tts_tpu.io.gguf import dequantize_q4_k, quantize_q4_k
    rng = np.random.RandomState(6)
    x = (rng.rand(16, 256) * 0.5 + 1.0).astype(np.float32)
    e_k = np.abs(dequantize_q4_k(quantize_q4_k(x), x.size).reshape(x.shape)
                 - x).mean()
    e_0 = np.abs(dequantize_q4_0(quantize_q4_0(x), x.size).reshape(x.shape)
                 - x).mean()
    assert e_k < e_0 * 0.6


def test_write_k_quant_with_divisibility_fallback(tmp_path):
    """loader.h:162-173: Q4_K needs cols %256 else Q4_0; %32 else source."""
    from pocket_tts_tpu.io.gguf import F32, Q4_0, Q4_K, Q8_0, Q8_K
    rng = np.random.RandomState(7)
    tensors = {
        "k": rng.randn(8, 256).astype(np.float32),   # Q4_K
        "b32": rng.randn(8, 96).astype(np.float32),  # %256 fails -> Q4_0
        "odd": rng.randn(8, 33).astype(np.float32),  # %32 fails -> F32
    }
    path = str(tmp_path / "k.gguf")
    write_gguf(path, tensors, quantize="q4_k", min_quant_size=1)
    f = GGUFFile(path)
    assert f.infos["k"][0] == Q4_K
    assert f.infos["b32"][0] == Q4_0
    assert f.infos["odd"][0] == F32
    for name in ("k", "b32"):
        got = f.get(name)
        rel = np.abs(got - tensors[name]).max() / np.abs(tensors[name]).max()
        assert rel < 0.2, name
    np.testing.assert_array_equal(f.get("odd"), tensors["odd"])
    path8 = str(tmp_path / "k8.gguf")
    write_gguf(path8, tensors, quantize="q8_k", min_quant_size=1)
    f8 = GGUFFile(path8)
    assert f8.infos["k"][0] == Q8_K
    assert f8.infos["b32"][0] == Q8_0
    assert f8.infos["odd"][0] == F32
    got = f8.get("k")
    assert np.abs(got - tensors["k"]).max() <= \
        np.abs(tensors["k"]).max() / 128.0 + 1e-6


def test_write_quantized_with_alignment_fallback(tmp_path):
    rng = np.random.RandomState(3)
    tensors = {
        "big": rng.randn(128, 64).astype(np.float32),     # quantizes
        "odd": rng.randn(128, 33).astype(np.float32),     # cols %32 != 0
        "tiny": rng.randn(4, 4).astype(np.float32),       # below size gate
    }
    path = str(tmp_path / "q.gguf")
    write_gguf(path, tensors, quantize="q8_0", min_quant_size=1024)
    f = GGUFFile(path)
    from pocket_tts_tpu.io.gguf import F32, Q8_0
    assert f.infos["big"][0] == Q8_0
    assert f.infos["odd"][0] == F32       # alignment fallback
    assert f.infos["tiny"][0] == F32
    got = f.get("big")
    rel = np.abs(got - tensors["big"]).max() / np.abs(tensors["big"]).max()
    assert rel < 0.02
    np.testing.assert_array_equal(f.get("odd"), tensors["odd"])


def test_params_cache_gguf_round_trip(tmp_path):
    from pocket_tts_tpu.config import tiny_config
    from pocket_tts_tpu.io.params import params_from_flat, random_flat
    from pocket_tts_tpu.io.quant import (load_params_cache, quantize_params,
                                         save_params_cache)
    import jax
    cfg0 = tiny_config()
    params, _ = params_from_flat(random_flat(cfg0, seed=5), cfg0)
    qparams = quantize_params(params)
    path = str(tmp_path / "cache.gguf")
    save_params_cache(qparams, path)
    back = load_params_cache(path)
    flat_a = jax.tree_util.tree_leaves(qparams)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_checkpoint_load_from_gguf(tmp_path):
    from pocket_tts_tpu.config import tiny_config
    from pocket_tts_tpu.io.params import load_checkpoint, random_flat
    cfg0 = tiny_config()
    flat = random_flat(cfg0, seed=7)
    path = str(tmp_path / "tts_b6369a24.gguf")
    write_gguf(path, flat)
    params, cfg = load_checkpoint(path, cfg0)
    assert "backbone" in params or len(params) > 0


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a GGUF"):
        GGUFFile(str(p))
