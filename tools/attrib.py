"""Per-op device-time attribution of one decode config on TPU.

Usage: python /tmp/attrib.py [b1int4|b1bf16|b32srv|b128srv|cont]
Dumps top ops by summed device time across the traced run, per-frame cost.
"""
import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import DEFAULT_CONFIG
from pocket_tts_tpu.io.params import random_params, random_voice_prompt
from pocket_tts_tpu.io.quant import quantize_params
from pocket_tts_tpu.models import backbone, mimi, tts
from pocket_tts_tpu.text.preprocess import count_words, prepare_text_prompt
from pocket_tts_tpu.text.tokenizer import MockTokenizer
import dataclasses

mode = sys.argv[1] if len(sys.argv) > 1 else "b1int4"
dtype = jnp.bfloat16
params, cfg = random_params(DEFAULT_CONFIG, seed=0, dtype=dtype)
tok = MockTokenizer(cfg.lut.n_bins)
text, _ = prepare_text_prompt(
    "The quick brown fox jumped over the sleeping dog.")
ids = tok.encode(text)
tokens = jnp.asarray(np.pad(np.asarray(ids, np.int32), (0, 64 - len(ids))))
prompt = jnp.asarray(
    np.pad(random_voice_prompt(cfg, 120), ((0, 8), (0, 0)))).astype(dtype)
mimi_template = mimi.init_state(cfg.mimi, dtype)
max_steps = int((count_words(text) + 2.0) * cfg.mimi.frame_rate)
scan_len = int(sys.argv[2]) if len(sys.argv) > 2 else 150
rng = jax.random.PRNGKey(0)
temp = jnp.float32(0.0)
fae = jnp.int32(3)

cfg_srv = dataclasses.replace(cfg, backbone=dataclasses.replace(
    cfg.backbone, quantize_kv=True))
# batch modes resolve through mesh_cfg(None) like the shipping
# BatchedEngine (fuse_insert auto-on at batch)
from pocket_tts_tpu.runtime.batched import mesh_cfg  # noqa: E402
if mode.startswith(("b32", "b64", "b128")):
    cfg = mesh_cfg(cfg, None)
    cfg_srv = mesh_cfg(cfg_srv, None)

if mode in ("b1int4", "b1int4scan"):
    params_x, cfg_x = quantize_params(params, bits=4), cfg_srv
elif mode == "b1q40scan":
    params_x, cfg_x = quantize_params(params, bits=4, group=32), cfg
elif mode == "b1bf16":
    params_x, cfg_x = params, cfg
elif mode in ("b32srv", "b64srv", "b128srv"):
    params_x, cfg_x = quantize_params(params, bits=4), cfg_srv
else:
    raise SystemExit(f"unknown mode {mode}")

if mode.startswith("b1"):
    vstate = tts.jit_prime_voice(
        params_x, cfg_x, backbone.init_state(cfg_x.backbone, dtype),
        prompt, jnp.int32(120))
    vstate = backbone.shrink_state(vstate, 384)
    state0 = tts.jit_sentence_prefill(params_x, cfg_x, vstate,
                                      mimi_template, tokens,
                                      jnp.int32(len(ids)))

    if mode.endswith("scan"):
        # the scan decoder's in-loop ops get individual trace events (the
        # early-exit while_loop is one opaque event) — use it to attribute
        # the B=1 frame
        def run():
            _, pcm, valid = tts.jit_decode_sentence(
                params_x, cfg_x, state0, rng, temp, fae,
                jnp.int32(max_steps), scan_len)
            return pcm, valid
    else:
        def run():
            _, pcm, valid = tts.jit_decode_sentence_early_exit(
                params_x, cfg_x, state0, rng, temp, fae,
                jnp.int32(max_steps), scan_len)
            return pcm, valid
    B = 1
else:
    from pocket_tts_tpu.runtime.batched import (batched_decode_sentence,
                                                batched_prime_voice,
                                                batched_sentence_prefill,
                                                stack_states)
    B = int(mode[1:].replace("srv", ""))
    prompts = jnp.asarray(np.stack(
        [np.pad(random_voice_prompt(cfg, 120, seed=i), ((0, 8), (0, 0)))
         for i in range(B)])).astype(dtype)
    vs = stack_states([backbone.init_state(cfg_x.backbone, dtype)
                       for _ in range(B)])
    vs = batched_prime_voice(params_x, cfg_x, vs, prompts,
                             jnp.full((B,), 120, jnp.int32))
    vs = backbone.shrink_state(vs, 384)
    sts = batched_sentence_prefill(params_x, cfg_x, vs, mimi_template,
                                   jnp.tile(tokens[None], (B, 1)),
                                   jnp.full((B,), len(ids), jnp.int32))
    rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(B)])

    def run():
        _, pcm, valid = batched_decode_sentence(
            params_x, cfg_x, sts, rngs, jnp.full((B,), 0.0, jnp.float32),
            jnp.full((B,), 3, jnp.int32),
            jnp.full((B,), max_steps, jnp.int32), scan_len)
        return pcm, valid

out = run()
frames = int(np.asarray(out[1]).sum()) if mode.startswith("b1") else \
    int(np.asarray(out[1]).sum() / B)
float(np.asarray(out[0]).ravel()[0])

tmp = tempfile.mkdtemp(prefix="attrib")
jax.profiler.start_trace(tmp)
out = run()
float(np.asarray(out[0]).ravel()[0])
jax.profiler.stop_trace()

files = sorted(glob.glob(os.path.join(tmp, "plugins/profile/*/*.trace.json.gz")))
with gzip.open(files[-1]) as f:
    data = json.load(f)

# device-thread op events: group by op-name (strip trailing .digits)
by = defaultdict(lambda: [0.0, 0])
skipped = defaultdict(lambda: [0.0, 0])
jit_total = 0.0
pat = re.compile(r"\.\d+$")
for e in data.get("traceEvents", []):
    if e.get("ph") != "X" or "dur" not in e:
        continue
    name = e.get("name", "")
    if name.startswith("jit_"):
        jit_total += e["dur"] / 1e3
        continue
    args = e.get("args") or {}
    # keep only XLA op events (they carry 'run_id'/'hlo' style args or look
    # like fusions/custom-calls); heuristically skip host-side events
    if not re.match(r"^(fusion|custom-call|copy|dynamic-update-slice|"
                    r"dynamic-slice|convert|while|scatter|all-|reduce|"
                    r"bitcast|broadcast|add|multiply|dot|cusom|tpu_|"
                    r"transpose|concatenate|slice|select|iota|rng|pad|"
                    r"log|exp|constant|get-tuple|tuple|parameter|"
                    r"copy-start|copy-done)", name):
        # the Mosaic kernels carry their pallas kernel names — collect
        # them in a separate bucket instead of dropping them
        skipped[pat.sub("", name)][0] += e["dur"] / 1e3
        skipped[pat.sub("", name)][1] += 1
        continue
    key = pat.sub("", name)
    by[key][0] += e["dur"] / 1e3
    by[key][1] += 1

rows = sorted(by.items(), key=lambda kv: -kv[1][0])
dev_total = sum(v[0] for v in by.values())
print(f"mode={mode} frames={frames} jit_total_ms={jit_total:.1f} "
      f"op_total_ms={dev_total:.1f}")
print(f"{'op':<52}{'ms':>9}{'n':>7}{'us/frame':>10}")
for k, (ms, n) in rows[:45]:
    print(f"{k[:51]:<52}{ms:>9.2f}{n:>7}{ms * 1e3 / frames:>10.2f}")
print(f"\nother: {dev_total - sum(ms for _, (ms, n) in rows[:45]):.2f} ms")
srows = sorted(skipped.items(), key=lambda kv: -kv[1][0])
print("\nnon-XLA-op events (kernels, host, misc):")
for k, (ms, n) in srows[:25]:
    print(f"{k[:51]:<52}{ms:>9.2f}{n:>7}{ms * 1e3 / frames:>10.2f}")
