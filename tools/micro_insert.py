"""Program-level streaming-efficiency micro for the batched fused
KV-insert + flash-decode kernel at serving shapes.

The per-op profiler under-reports batched Mosaic kernel durations through
this environment's tunnel (B=128 events imply 70 TB/s — junk), so this
measures the ONLY trustworthy way: a jitted chain of R kernel calls,
program-level device time, working set > 600 MB so caching can't fake it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/micro_insert.py \
           [B] [S] [group_override]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import device_ms  # noqa: E402
from pocket_tts_tpu.ops import pallas_attn as pa  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S = int(sys.argv[2]) if len(sys.argv) > 2 else 384
DT = sys.argv[3] if len(sys.argv) > 3 else "int8"
MODE = sys.argv[4] if len(sys.argv) > 4 else "insert"
# "thread": caches chain through the reps (the serving scan's dataflow) so
# XLA can honor the kernel's input_output_aliases in place; "insert"
# re-reads the same cache values every rep, which FORCES a defensive copy
# of both caches per call (the r5 ablation found exactly that 2.4x).
H, D = 16, 64
HD = H * D
L = 6          # independent cache sets cycled across calls
R = int(__import__("os").environ.get("MI_R", "24"))  # chained calls per rep

rng = np.random.RandomState(0)


def mk_caches():
    if DT == "bf16":
        k = jnp.asarray(rng.randn(B, S, HD) * 0.05, jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, S, HD) * 0.05, jnp.bfloat16)
        return k, v, None, None
    k = jnp.asarray(rng.randint(-127, 128, (B, S, HD)), jnp.int8)
    v = jnp.asarray(rng.randint(-127, 128, (B, S, HD)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, S) * 0.01 + 0.01, jnp.float32)
    vs = jnp.asarray(rng.rand(B, S) * 0.01 + 0.01, jnp.float32)
    return k, v, ks, vs


sets = [mk_caches() for _ in range(L)]
pos = jnp.asarray(np.tile(np.arange(S, dtype=np.int32), (B, 1)))
q0 = jnp.asarray(rng.randn(B, H, D) * 0.1, jnp.bfloat16)
if DT == "bf16":
    k_new = jnp.asarray(rng.randn(B, 1, HD) * 0.05, jnp.bfloat16)
    v_new = jnp.asarray(rng.randn(B, 1, HD) * 0.05, jnp.bfloat16)
else:
    k_new = jnp.asarray(rng.randint(-127, 128, (B, 1, HD)), jnp.int8)
    v_new = jnp.asarray(rng.randint(-127, 128, (B, 1, HD)), jnp.int8)
ksn = jnp.full((B,), 0.01, jnp.float32)
vsn = jnp.full((B,), 0.01, jnp.float32)
cur_pos = jnp.full((B,), S - 1, jnp.int32)
read_end = jnp.asarray(S - 1, jnp.int32)
write_slot = jnp.asarray(S - 1, jnp.int32)

bytes_call = B * S * HD * 2 * (2 if DT == "bf16" else 1)  # k+v reads
bytes_aux = B * S * 4 * 3            # pos + 2 scale rows
PEAK = 819e9


def run(q, *flat):
    per = 2 if DT == "bf16" else 4
    ss = [list(flat[i * per:(i + 1) * per]) for i in range(L)]
    for rep in range(R):
        if DT == "bf16":
            k, v = ss[rep % L][:2]
            ks = vs = None
        else:
            k, v, ks, vs = ss[rep % L]
        if MODE in ("decode",):
            if DT == "bf16":
                out = (pa._decode_attention_batched(
                    q, k, v, pos, read_end, block_size=S,
                    interpret=False),)
            else:
                out = (pa._decode_attention_batched(
                    q, k, v, pos, read_end, ks, vs, block_size=S,
                    interpret=False),)
        elif DT == "bf16":
            out = pa._decode_insert_attention_batched(
                q, k_new, v_new, cur_pos, k, v, pos, read_end,
                write_slot, block_size=S, interpret=False)
        else:
            out = pa._decode_insert_attention_batched(
                q, k_new, v_new, cur_pos, k, v, pos, read_end,
                write_slot, ks_new=ksn, vs_new=vsn, k_scale=ks,
                v_scale=vs, block_size=S, interpret=False)
        if MODE == "thread" and len(out) > 2:
            ss[rep % L][0], ss[rep % L][1] = out[1], out[2]
            if DT != "bf16" and len(out) > 4:
                ss[rep % L][2], ss[rep % L][3] = out[3], out[4]
        # chain: next q depends on this attention output
        q = (q + 0.001 * out[0].reshape(B, H, D).astype(jnp.float32)
             ).astype(jnp.bfloat16)
    if MODE == "thread":
        # keep the final caches live so the chain isn't dead-code-eliminated
        probe = sum(s0[0][0, 0, :1].astype(jnp.float32).sum() for s0 in ss)
        q = q + 1e-12 * probe.astype(jnp.float32)
    return q


flat = [a for st in sets for a in st if a is not None]
jfn = jax.jit(run, donate_argnums=())
out = jfn(q0, *flat)


def fetch(o):
    return float(np.asarray(o).ravel()[0])


fetch(out)
best = float("inf")
for _ in range(3):
    dms, _ = device_ms(lambda: jfn(q0, *flat), fetch)
    best = min(best, dms)
us_call = best * 1e3 / R
gbs = (bytes_call + bytes_aux) / us_call * 1e-3
print(f"B={B} S={S} {DT}: {us_call:.1f} us/call, {gbs:.0f} GB/s, "
      f"{100 * gbs / (PEAK / 1e9):.1f}% peak "
      f"({(bytes_call + bytes_aux) / 1e6:.1f} MB/call)")
