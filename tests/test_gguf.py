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
