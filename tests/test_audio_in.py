"""Audio input surface: decode (WAV any-format, FLAC) + resample.

Parity target: the reference's Decoder/Resampler pair
(/root/reference/demos/ffmpeg_helpers.h:50-251). No FFmpeg in this
environment, so WAV/FLAC decode and the polyphase resampler are native
and fully testable offline.
"""
import struct

import numpy as np
import pytest

from pocket_tts_tpu.io.audio import _BitWriter, _crc8, _crc16, save_flac
from pocket_tts_tpu.io.audio_in import (StreamingResampler, load_audio,
                                        resample)
from pocket_tts_tpu.io.wav import save_wav


class TestResample:
    def test_identity_rate(self):
        x = np.random.RandomState(0).randn(100).astype(np.float32)
        assert np.array_equal(resample(x, 24000, 24000), x)

    def test_output_length(self):
        for n, si, so in ((4000, 16000, 24000), (24000, 24000, 16000),
                          (7919, 44100, 24000), (1, 8000, 48000)):
            y = resample(np.zeros(n, np.float32), si, so)
            assert len(y) == -(-n * so // si) if si % so else \
                len(y) == n * so // si + (1 if n * so % si else 0)

    def test_dc_exact(self):
        """Per-phase filter normalization: constants resample to exactly
        themselves in the interior."""
        y = resample(np.full(4000, 0.7, np.float32), 16000, 24000)
        assert abs(y[100:-100] - 0.7).max() == 0.0

    def test_sine_frequency_preserved(self):
        sr1, sr2, f0 = 16000, 24000, 440.0
        t = np.arange(sr1) / sr1
        y = resample(np.sin(2 * np.pi * f0 * t).astype(np.float32),
                     sr1, sr2)
        w = np.hanning(len(y) - 400)
        sp = np.abs(np.fft.rfft(y[200:-200] * w))
        peak = np.argmax(sp) * sr2 / (len(y) - 400)
        assert abs(peak - f0) < 2.0
        assert abs(np.abs(y[1000:-1000]).max() - 1.0) < 1e-2

    def test_alias_rejection(self):
        """Content above the output Nyquist must not fold back: 9 kHz
        into a 16 kHz output (Nyquist 8 kHz) sits in the stopband."""
        t = np.arange(24000) / 24000.0
        x = np.sin(2 * np.pi * 9000 * t).astype(np.float32)
        y = resample(x, 24000, 16000)
        assert np.abs(y[500:-500]).max() < 2e-3  # < -54 dB

    def test_delay_compensated(self):
        """Output n sits at input time n*M/L: an impulse lands where it
        should, not shifted by the filter's group delay."""
        x = np.zeros(4000, np.float32)
        x[1000] = 1.0
        y = resample(x, 16000, 24000)
        assert abs(int(np.argmax(np.abs(y))) - 1500) <= 2

    @pytest.mark.parametrize("si,so", [(16000, 24000), (24000, 16000),
                                       (44100, 24000)])
    def test_streaming_matches_oneshot(self, si, so):
        x = np.random.RandomState(1).randn(7919).astype(np.float32)
        one = resample(x, si, so)
        r = StreamingResampler(si, so)
        parts, i = [], 0
        for sz in (1, 17, 256, 3, 1000, 0, 5000, 9999):
            j = min(i + sz, len(x))
            parts.append(r.process(x[i:j]))
            i = j
        parts.append(r.flush())
        two = np.concatenate(parts)
        assert np.array_equal(one, two)

    def test_streaming_identity_rate_passthrough(self):
        r = StreamingResampler(24000, 24000)
        x = np.arange(10, dtype=np.float32)
        assert np.array_equal(r.process(x), x)
        assert r.flush().size == 0


class TestWavDecode:
    def _wav(self, tmp_path, fmt, channels, bits, payload):
        path = str(tmp_path / "t.wav")
        byte_rate = 24000 * channels * bits // 8
        hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF",
                          36 + len(payload), b"WAVE", b"fmt ", 16, fmt,
                          channels, 24000, byte_rate,
                          channels * bits // 8, bits, b"data",
                          len(payload))
        with open(path, "wb") as f:
            f.write(hdr + payload)
        return path

    def test_int16_matches_save_wav(self, tmp_path):
        x = (np.random.RandomState(0).randn(500) * 0.3).astype(np.float32)
        p = str(tmp_path / "s.wav")
        save_wav(p, x, 24000)
        pcm, sr = load_audio(p)
        assert sr == 24000
        # writer scales by 32767, reader by 1/32768: one lsb of
        # quantization + a 3e-5 relative scale skew
        np.testing.assert_allclose(pcm, x, atol=2.0 / 32767)

    def test_float32(self, tmp_path):
        x = (np.random.RandomState(1).randn(300) * 0.5).astype(np.float32)
        p = self._wav(tmp_path, 3, 1, 32, x.tobytes())
        pcm, sr = load_audio(p)
        assert np.array_equal(pcm, x)

    def test_int24(self, tmp_path):
        vals = np.array([0, 1, -1, 8388607, -8388608, 4194304], np.int32)
        raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little")
                       for v in vals)
        p = self._wav(tmp_path, 1, 1, 24, raw)
        pcm, _ = load_audio(p)
        np.testing.assert_allclose(pcm, vals / 8388608.0, atol=1e-7)

    def test_int32(self, tmp_path):
        vals = np.array([0, 2**31 - 1, -2**31, 123456], np.int32)
        p = self._wav(tmp_path, 1, 1, 32, vals.tobytes())
        pcm, _ = load_audio(p)
        np.testing.assert_allclose(pcm, vals / 2**31, atol=1e-7)

    def test_stereo_downmix(self, tmp_path):
        left = np.array([100, 200, -300], np.int16)
        right = np.array([300, -200, 100], np.int16)
        inter = np.stack([left, right], axis=1).ravel()
        p = self._wav(tmp_path, 1, 2, 16, inter.tobytes())
        pcm, _ = load_audio(p)
        want = (left + right).astype(np.float32) / 2 / 32768.0
        np.testing.assert_allclose(pcm, want, atol=1e-6)

    def _wav_extensible(self, tmp_path, sub_fmt, channels, bits, payload):
        """WAVE_FORMAT_EXTENSIBLE (0xFFFE) with the real tag in the
        SubFormat GUID — the 40-byte fmt chunk pro tools write."""
        path = str(tmp_path / "x.wav")
        guid = struct.pack("<H", sub_fmt) + bytes.fromhex(
            "0000000010008000 00aa00389b71".replace(" ", ""))
        fmt = struct.pack("<HHIIHHHHI", 0xFFFE, channels, 24000,
                          24000 * channels * bits // 8,
                          channels * bits // 8, bits, 22, bits,
                          (1 << channels) - 1) + guid
        hdr = (struct.pack("<4sI4s", b"RIFF", 20 + len(fmt) + len(payload),
                           b"WAVE")
               + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
               + struct.pack("<4sI", b"data", len(payload)))
        with open(path, "wb") as f:
            f.write(hdr + payload)
        return path

    def test_extensible_int32_pcm(self, tmp_path):
        """32-bit integer PCM under 0xFFFE must decode as PCM (the
        SubFormat GUID says so), not be guessed as float from the depth."""
        vals = np.array([0, 2**31 - 1, -2**31, 123456], np.int32)
        p = self._wav_extensible(tmp_path, 1, 1, 32, vals.tobytes())
        pcm, sr = load_audio(p)
        assert sr == 24000
        np.testing.assert_allclose(pcm, vals / 2**31, atol=1e-7)

    def test_extensible_float32(self, tmp_path):
        x = (np.random.RandomState(2).randn(64) * 0.5).astype(np.float32)
        p = self._wav_extensible(tmp_path, 3, 1, 32, x.tobytes())
        pcm, _ = load_audio(p)
        assert np.array_equal(pcm, x)

    def test_resample_on_load(self, tmp_path):
        x = np.sin(2 * np.pi * 440 * np.arange(24000) / 24000)
        p = str(tmp_path / "s.wav")
        save_wav(p, x.astype(np.float32), 24000)
        pcm, sr = load_audio(p, sample_rate=16000)
        assert sr == 16000 and len(pcm) == 16000


def _flac_stream(frames, sample_rate=24000, channels=1):
    """Hand-build a FLAC stream: STREAMINFO + the given encoded frames
    (each a bytes object from _flac_frame)."""
    si = _BitWriter()
    si.write(4096, 16), si.write(4096, 16)
    si.write(0, 24), si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)
    si.write(sum(f[1] for f in frames), 36)
    body = si.bytes() + b"\x00" * 16
    out = bytearray(b"fLaC") + bytes([0x80]) + len(body).to_bytes(3, "big")
    out += body
    for data, _ in frames:
        out += data
    return bytes(out)


def _flac_frame(fno, blocksize, ch_code, subframes):
    """One FLAC frame; subframes = list of callables writing into a
    _BitWriter."""
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)                       # reserved + fixed-blocksize
    hdr.write(6, 4)                       # 8-bit blocksize-1 follows
    hdr.write(0, 4)                       # rate from STREAMINFO
    hdr.write(ch_code, 4)
    hdr.write(0b100, 3)                   # 16-bit
    hdr.write(0, 1)
    head = hdr.bytes() + bytes([fno]) + bytes([blocksize - 1])
    head += bytes([_crc8(head)])
    sub = _BitWriter()
    for fn in subframes:
        fn(sub)
    sub.align()
    frame = head + sub.bytes()
    frame += struct.pack(">H", _crc16(frame))
    return frame, blocksize


def _write_constant(value):
    def fn(bw):
        bw.write(0, 1)
        bw.write(0, 6)                    # CONSTANT
        bw.write(0, 1)
        bw.write(value & 0xFFFF, 16)
    return fn


def _write_fixed(samples, order):
    """Fixed-prediction subframe with one rice partition (porder 0)."""
    coef = {1: [1], 2: [2, -1]}[order]
    res = [int(samples[i]) - sum(c * int(samples[i - 1 - j])
                                 for j, c in enumerate(coef))
           for i in range(order, len(samples))]
    k = 4

    def fn(bw):
        bw.write(0, 1)
        bw.write(8 + order, 6)            # FIXED
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write(int(s) & 0xFFFF, 16)
        bw.write(0, 2)                    # residual method 0 (4-bit rice)
        bw.write(0, 4)                    # partition order 0
        bw.write(k, 4)
        for v in res:
            u = 2 * v if v >= 0 else -2 * v - 1
            q, r = u >> k, u & ((1 << k) - 1)
            for _ in range(q):
                bw.write(0, 1)
            bw.write(1, 1)
            bw.write(r, k)
    return fn


class TestFlacDecode:
    def test_roundtrip_verbatim(self, tmp_path):
        """save_flac writes verbatim subframes; decode must be
        bit-exact at int16 resolution."""
        x = (np.random.RandomState(2).randn(9000) * 0.4).astype(np.float32)
        p = str(tmp_path / "t.flac")
        save_flac(p, x, 24000)
        pcm, sr = load_audio(p)
        assert sr == 24000 and len(pcm) == 9000
        want = np.clip(x * 32767, -32768, 32767).astype(np.int16)
        np.testing.assert_array_equal(
            (pcm * 32768.0).round().astype(np.int16), want)

    def test_constant_subframe(self, tmp_path):
        frame = _flac_frame(0, 64, 0, [_write_constant(-1234)])
        p = str(tmp_path / "c.flac")
        with open(p, "wb") as f:
            f.write(_flac_stream([frame]))
        pcm, sr = load_audio(p)
        assert len(pcm) == 64
        np.testing.assert_allclose(pcm, -1234 / 32768.0, atol=1e-7)

    @pytest.mark.parametrize("order", [1, 2])
    def test_fixed_subframe(self, tmp_path, order):
        rng = np.random.RandomState(3)
        base = np.cumsum(rng.randint(-50, 50, size=96)).astype(np.int64)
        frame = _flac_frame(0, 96, 0, [_write_fixed(base, order)])
        p = str(tmp_path / "f.flac")
        with open(p, "wb") as f:
            f.write(_flac_stream([frame]))
        pcm, _ = load_audio(p)
        np.testing.assert_array_equal(
            (pcm * 32768.0).round().astype(np.int64), base)

    def test_stereo_independent_downmix(self, tmp_path):
        l, r = 1000, -500
        frame = _flac_frame(0, 32, 1,
                            [_write_constant(l), _write_constant(r)])
        p = str(tmp_path / "s.flac")
        with open(p, "wb") as f:
            f.write(_flac_stream([frame], channels=2))
        pcm, _ = load_audio(p)
        np.testing.assert_allclose(pcm, (l + r) / 2 / 32768.0, atol=1e-7)

    def test_multi_frame(self, tmp_path):
        frames = [_flac_frame(i, 64, 0, [_write_constant(100 * i)])
                  for i in range(3)]
        p = str(tmp_path / "m.flac")
        with open(p, "wb") as f:
            f.write(_flac_stream(frames))
        pcm, _ = load_audio(p)
        assert len(pcm) == 192
        for i in range(3):
            np.testing.assert_allclose(pcm[64 * i:64 * (i + 1)],
                                       100 * i / 32768.0, atol=1e-7)
