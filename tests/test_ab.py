"""Fixture test for the one-command real-weights A/B runner
(python -m pocket_tts_tpu.ab): plumbing proven now, real run is one
command the day weights exist."""
import json
import os

import numpy as np

from pocket_tts_tpu import ab
from test_model_dir import make_model_dir


def test_ab_runner_on_fixture_dir(tmp_path):
    root, cfg0 = make_model_dir(tmp_path)
    out = str(tmp_path / "ab_out")
    rc = ab.main(["--model-dir", root, "-o", out, "--skip-verify",
                  "--text", "Hi there.", "--frames", "4"])
    assert rc == 0
    with open(os.path.join(out, "ab_probes.json")) as f:
        probes = json.load(f)
    assert len(probes["voice_kv_sum"]) == cfg0.backbone.num_layers
    assert len(probes["frame"]) == 4
    for fr in probes["frame"]:
        assert np.isfinite(fr["latent_sum"])
        assert np.isfinite(fr["pcm_sum"])
    # prefill consumed more slots than the voice prefix alone
    assert probes["prefill_end"] > probes["voice_end"]
    # quantization outlier report present and sane (int4 per-channel
    # relative error ~<= 1/15 per column scale)
    errs = probes["quant_rel_error_int4"]
    assert errs and all(0 <= e < 0.2 for e in errs.values()), errs
    from pocket_tts_tpu.io.wav import load_wav
    pcm, sr = load_wav(os.path.join(out, "ab_out.wav"))
    assert sr == cfg0.mimi.sample_rate and pcm.size > 0


def test_ab_runner_verify_failure(tmp_path):
    """A dir failing the manifest check must exit non-zero (unless
    --skip-verify)."""
    root, _ = make_model_dir(tmp_path)
    rc = ab.main(["--model-dir", root, "-o", str(tmp_path / "x"),
                  "--text", "Hi."])
    assert rc == 2  # fixture weights don't match the release sha256 pins
