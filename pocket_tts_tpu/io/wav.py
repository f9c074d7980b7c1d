"""Raw RIFF 16-bit mono WAV read/write. ref: /root/reference/src/wav.h:19-86."""
from __future__ import annotations

import struct

import numpy as np


def save_wav(path: str, samples, sample_rate: int = 24000):
    """samples: float array in [-1, 1] or int16 array."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        samples = np.clip(samples, -1.0, 1.0)
        samples = (samples * 32767.0).astype(np.int16)
    data = samples.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                            sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


def load_wav(path: str):
    """Returns (samples int16 np array, sample_rate)."""
    with open(path, "rb") as f:
        riff, _, wave = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        sample_rate = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                raise ValueError("no data chunk found")
            tag, size = struct.unpack("<4sI", hdr)
            if tag == b"fmt ":
                fmt = f.read(size)
                (audio_format, channels, sample_rate, _, _,
                 bits) = struct.unpack("<HHIIHH", fmt[:16])
                if audio_format != 1 or channels != 1 or bits != 16:
                    raise ValueError("only PCM mono 16-bit supported")
            elif tag == b"data":
                data = f.read(size)
                return np.frombuffer(data, np.int16), sample_rate
            else:
                f.seek(size, 1)
