"""CLI + long-form + utils tests."""
import json
import subprocess
import sys

import numpy as np
import pytest

from pocket_tts_tpu.io.wav import StreamingWavWriter, load_wav
from pocket_tts_tpu.utils.profiling import FrameMeter, log_event


class TestStreamingWavWriter:
    def test_incremental_equals_one_shot(self, tmp_path):
        from pocket_tts_tpu.io.wav import save_wav
        pcm = (np.sin(np.linspace(0, 80, 19200)) * 0.4).astype(np.float32)
        p1 = str(tmp_path / "a.wav")
        p2 = str(tmp_path / "b.wav")
        save_wav(p1, pcm, 24000)
        with StreamingWavWriter(p2, 24000) as w:
            for i in range(0, pcm.size, 1920):
                w.write(pcm[i:i + 1920])
        a, _ = load_wav(p1)
        b, sr = load_wav(p2)
        assert sr == 24000
        np.testing.assert_array_equal(a, b)

    def test_header_patched(self, tmp_path):
        p = str(tmp_path / "c.wav")
        w = StreamingWavWriter(p, 24000)
        w.write(np.zeros(100, np.float32))
        w.close()
        data, sr = load_wav(p)
        assert data.size == 100


class TestFrameMeter:
    def test_reports(self):
        m = FrameMeter(12.5)
        for _ in range(3):
            with m.step():
                pass
        rep = m.report()
        assert rep["frames"] == 3
        assert rep["ttfa_ms"] is not None


CLI_ENV_SETUP = (
    "import jax; jax.config.update('jax_platforms', 'cpu')\n"
)


def run_cli(args, stdin=None, extra=""):
    """Run the CLI in-process against a tiny random model on CPU.
    extra: code run after the tiny DEFAULT_CONFIG swap (config tweaks)."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        "import pocket_tts_tpu.cli as cli\n"
        "import pocket_tts_tpu.config as config\n"
        "config.DEFAULT_CONFIG = config.tiny_config()\n"
        + extra +
        "cli.DEFAULT_CONFIG = config.DEFAULT_CONFIG\n"
        "sys.exit(cli.main(%r))\n" % (args,)
    )
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, input=stdin, timeout=600)


@pytest.mark.slow
class TestCli:
    def test_basic_synthesis_to_wav(self, tmp_path):
        out = str(tmp_path / "out.wav")
        r = run_cli(["--random-weights", "-s", "1", "-t", "0.5", "-o", out,
                     "--json", "Hello there world."])
        assert r.returncode == 0, r.stderr[-2000:]
        assert "seed: 1" in r.stdout
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["frames"] > 0
        data, sr = load_wav(out)
        assert data.size == stats["frames"] * 1920

    def test_interactive_stdin(self, tmp_path):
        out = str(tmp_path / "i.wav")
        r = run_cli(["--random-weights", "--interactive", "-o", out],
                    stdin="Hi there friend.\nSecond sentence here.\n")
        assert r.returncode == 0, r.stderr[-2000:]
        data, _ = load_wav(out)
        assert data.size > 0

    def test_persistent_compile_cache(self, tmp_path):
        """--compile-cache populates a persistent XLA cache and a repeat
        run (which hits it) still synthesizes correctly."""
        import os
        cdir = str(tmp_path / "xla")
        out = str(tmp_path / "c.wav")
        r = run_cli(["--random-weights", "--compile-cache", cdir,
                     "-s", "2", "-o", out, "Hello."])
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.listdir(cdir), "compile cache not populated"
        out2 = str(tmp_path / "c2.wav")
        r2 = run_cli(["--random-weights", "--compile-cache", cdir,
                      "-s", "2", "-o", out2, "Hello."])
        assert r2.returncode == 0, r2.stderr[-2000:]
        a, _ = load_wav(out)
        b, _ = load_wav(out2)
        assert np.array_equal(a, b)

    def test_save_and_load_cache(self, tmp_path):
        cache = str(tmp_path / "params.safetensors")
        r = run_cli(["--random-weights", "--quantize", "int8",
                     "--save-cache", cache])
        assert r.returncode == 0, r.stderr[-2000:]
        import os
        assert os.path.exists(cache)


@pytest.mark.slow
class TestCliServe:
    def test_serve_requests_file(self, tmp_path):
        """--serve drains a mixed JSONL/plain request file through the
        ContinuousBatchingServer and writes one wav per request, chunks
        concatenated in order."""
        reqs = tmp_path / "reqs.jsonl"
        reqs.write_text(
            "Hello there, request one.\n"
            '{"id": "two", "text": "First sentence here. Then another '
            'one follows.", "temp": 0.0}\n')
        outdir = str(tmp_path / "out")
        # the tiny config's 128-slot KV can't hold any request past the
        # 96-slot prefix — serve against a 512-slot variant
        grow = ("import dataclasses\n"
                "config.DEFAULT_CONFIG = dataclasses.replace(\n"
                "    config.DEFAULT_CONFIG, backbone=dataclasses.replace(\n"
                "        config.DEFAULT_CONFIG.backbone, kv_capacity=512))\n")
        r = run_cli(["--random-weights", "--lanes", "2",
                     "--serve", str(reqs), "--serve-out", outdir],
                    extra=grow)
        assert r.returncode == 0, r.stderr[-2000:]
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["requests"] == 2
        assert stats["chunks"] >= 2
        a, sr = load_wav(outdir + "/req_0000.wav")
        b, _ = load_wav(outdir + "/two.wav")
        assert sr == 24000 and a.size > 0 and b.size > 0
        # two.wav holds BOTH sentences of the request
        assert b.size % 1920 == 0 and b.size // 1920 >= 2
