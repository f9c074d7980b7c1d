"""Audio output formats: FLAC encoder, extension dispatch, fetch manifest.

Parity surface for the reference's FFmpeg encode helpers
(/root/reference/demos/ffmpeg_helpers.h) and download manifest
(demos/kyutai_pocket-tts-without-voice-cloning.txt).
"""
import struct

import numpy as np
import pytest

from pocket_tts_tpu.io.audio import (StreamingEncoder, ffmpeg_available,
                                     save_audio, save_flac, _crc8, _crc16,
                                     _utf8_code)


# -- a minimal FLAC parser (verbatim mono 16-bit) for round-trip checks ----

class _BitReader:
    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, bits):
        while self.n < bits:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def align(self):
        self.n = 0
        self.acc = 0


def parse_flac(data: bytes):
    assert data[:4] == b"fLaC"
    assert data[4] == 0x80                      # last block, STREAMINFO
    length = int.from_bytes(data[5:8], "big")
    r = _BitReader(data[8:8 + length])
    minbs, maxbs = r.read(16), r.read(16)
    r.read(24), r.read(24)
    sr = r.read(20)
    ch = r.read(3) + 1
    bps = r.read(5) + 1
    total = r.read(36)
    pos = 8 + length
    samples = []
    while pos < len(data):
        frame_start = pos
        r = _BitReader(data[pos:])
        assert r.read(14) == 0b11111111111110
        r.read(1), r.read(1)
        bs_code = r.read(4)
        sr_code = r.read(4)
        assert r.read(4) == 0                   # mono
        assert r.read(3) == 0b100               # 16 bit
        r.read(1)
        # utf8 frame number
        first = r.read(8)
        if first >= 0x80:
            extra = 0
            probe = first
            while probe & 0x40:
                extra += 1
                probe <<= 1
            for _ in range(extra):
                r.read(8)
        if bs_code == 0b1100:
            bs = 4096
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        else:
            raise AssertionError(bs_code)
        r.read(8)                               # header crc8
        assert r.read(1) == 0
        assert r.read(6) == 0b000001            # VERBATIM
        assert r.read(1) == 0
        for _ in range(bs):
            v = r.read(16)
            samples.append(v - 65536 if v >= 32768 else v)
        r.align()
        pos += r.pos
        crc = struct.unpack(">H", data[pos:pos + 2])[0]
        assert crc == _crc16(data[frame_start:pos])
        pos += 2
    assert len(samples) == total
    return sr, ch, bps, np.asarray(samples, np.int16)


def test_flac_round_trip(tmp_path):
    rng = np.random.RandomState(0)
    pcm = (rng.randn(10_000) * 0.2).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "t.flac")
    save_flac(path, pcm, 24000)
    sr, ch, bps, got = parse_flac(open(path, "rb").read())
    assert (sr, ch, bps) == (24000, 1, 16)
    expect = np.clip(pcm * 32767.0, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(got, expect)


def test_flac_exact_block_multiple(tmp_path):
    pcm = np.linspace(-0.5, 0.5, 8192).astype(np.float32)
    path = str(tmp_path / "b.flac")
    save_flac(path, pcm, 24000)
    _, _, _, got = parse_flac(open(path, "rb").read())
    assert got.size == 8192


def test_utf8_code():
    assert _utf8_code(0) == b"\x00"
    assert _utf8_code(0x7F) == b"\x7f"
    # two-byte form, standard utf-8 encoding of the codepoint
    assert _utf8_code(0x80) == "".encode("utf-8")
    assert _utf8_code(0x7FF) == "߿".encode("utf-8")
    assert _utf8_code(0x800) == "ࠀ".encode("utf-8")


def test_crc_vectors():
    # CRC-8 poly 0x07 / CRC-16 poly 0x8005 known vectors ("123456789")
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_save_audio_dispatch(tmp_path):
    pcm = np.zeros(100, np.float32)
    save_audio(str(tmp_path / "a.wav"), pcm, 24000)
    save_audio(str(tmp_path / "a.flac"), pcm, 24000)
    with pytest.raises(ValueError, match="unsupported"):
        save_audio(str(tmp_path / "a.xyz"), pcm, 24000)
    if not ffmpeg_available():
        with pytest.raises(RuntimeError, match="ffmpeg"):
            save_audio(str(tmp_path / "a.mp3"), pcm, 24000)


def test_streaming_encoder_flac(tmp_path):
    path = str(tmp_path / "s.flac")
    frames = [np.full(1920, 0.1 * i, np.float32) for i in range(5)]
    with StreamingEncoder(path, 24000) as enc:
        for f in frames:
            enc.write(f)
    _, _, _, got = parse_flac(open(path, "rb").read())
    assert got.size == 5 * 1920


def test_manifest_and_verify(tmp_path):
    from pocket_tts_tpu.io.fetch import (load_manifest, sha256_file,
                                         verify_model_dir)
    m = load_manifest()
    assert m["model"] == "kyutai/pocket-tts-without-voice-cloning"
    assert len(m["files"]) == 12
    names = [f["path"] for f in m["files"]]
    assert any("tts_b6369a24.safetensors" in n for n in names)
    assert any("tokenizer" in n for n in names)
    assert sum("embeddings/" in n for n in names) == 8
    pinned = [f for f in m["files"] if "sha256" in f]
    assert len(pinned) >= 10   # weights+tokenizer+8 voices carry pins
    for f in m["files"]:
        assert f["url"].startswith("https://")
    for f in pinned:
        assert len(f["sha256"]) == 64
    # verify: everything missing in an empty dir
    status = verify_model_dir(str(tmp_path))
    assert set(status.values()) == {"missing"}
    # write one file with wrong bytes -> corrupt
    rel = [n for n in status if "tokenizer" in n][0]
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(b"not the real tokenizer")
    status = verify_model_dir(str(tmp_path))
    assert status[rel] == "corrupt"
