import os

# Tests run on CPU with a virtual 8-device mesh so GSPMD sharding is
# exercised without TPU hardware (SURVEY.md §4). NOTE: this environment's
# sitecustomize registers the remote-TPU "axon" backend and forces
# jax_platforms="axon,cpu" at interpreter start — the config update below
# (after import, before any backend init) pins tests back to CPU.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import subprocess

# best-effort build of the native runtime lib so its tests don't skip on a
# fresh clone (they fall back to skipping if no toolchain is available)
_so = os.path.join(os.path.dirname(__file__), "pocket_tts_tpu",
                   "libpocket_tts_native.so")
if not os.path.exists(_so):
    try:
        subprocess.run(["make", "-C",
                        os.path.join(os.path.dirname(__file__), "csrc")],
                       capture_output=True, timeout=120)
    except Exception:
        pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# DEFAULT-precision f32 dots run at reduced (bf16 MXU) accuracy on the TPU
# path; numeric comparisons against torch need true f32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")
