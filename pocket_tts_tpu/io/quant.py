"""Weight quantization and params caching.

TPU-native analog of the reference's offline GGUF conversion/quantization
pipeline (WeightLoader Q4_0/Q8_0 paths, src/loader.h:162-173,228-272 and
`save_gguf`): large linear weights quantize to int8 with per-output-channel
scales, and any params pytree (quantized or not) round-trips through a
safetensors "param cache" file whose tree structure is stored in the header
metadata.
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

# quantize only weights at least this many elements (biases/norms stay f32)
_MIN_QUANT_SIZE = 64 * 64

# Params-cache layout version. "rope-halves-v1": in_proj q/k columns are
# stored PERMUTED (evens-then-odds per head, io/params.py) so the model can
# apply RoPE on contiguous halves. A cache saved before that permutation
# existed would load without error and produce silently corrupt audio, so
# load_params_cache refuses any cache missing the matching stamp.
_LAYOUT_VERSION = "rope-halves-v1"


def _quantize_weight(w32, bits: int, group: int = 0):
    """w32 (..., in, out) -> (payload dict) with per-output-channel scales;
    symmetric int8 (q) or packed-halves int4 (q4, see ops/quant_matmul).

    group > 0 (int4 only): K-grouped scales — one scale per `group`
    contraction rows per output channel, shape (..., K/group, out). The
    reference's Q4_0 uses 32-element blocks (src/loader.h:162-173);
    per-channel scales can lose precision on channels with in-row
    outliers, grouped scales bound the error to the block."""
    k = w32.shape[-2]
    if group and (bits != 4 or k % (2 * group)):
        group = 0  # fall back to per-channel
    qmax = 127.0 if bits == 8 else 7.0
    if group:
        blk = w32.reshape(w32.shape[:-2] + (k // group, group, w32.shape[-1]))
        amax = np.abs(blk).max(axis=-2)               # (..., K/g, out)
        scale = np.where(amax > 0, amax / qmax, 1.0).astype(np.float32)
        # grouped scales ship bf16: at group=32 an f32 scale stream is
        # +25% of the int4 weight bytes (~11 MB/frame, the whole r4 q4_0
        # deficit — see CLAUDE.md r5 floor micro); bf16 halves it. The
        # reference's own Q4_0 stores fp16 scales (src/loader.h:162-173).
        # Quantize against the ROUNDED scale so dequant is consistent.
        scale = np.asarray(jnp.asarray(scale, jnp.bfloat16))
        q = np.clip(np.round(blk / scale.astype(np.float32)[..., None, :]),
                    -qmax, qmax)
        q = q.reshape(w32.shape)
    else:
        amax = np.abs(w32).max(axis=-2)               # (..., out)
        scale = np.where(amax > 0, amax / qmax, 1.0).astype(np.float32)
        q = np.clip(np.round(w32 / scale[..., None, :]), -qmax, qmax)
    if bits == 8:
        return {"q": jnp.asarray(q.astype(np.int8)),
                "scale": jnp.asarray(scale)}
    if k % 2:
        return None  # odd contraction dim: leave unquantized
    # signed-hi packing (see ops/quant_matmul.pack_int4)
    q16 = q.astype(np.int16)
    lo = q16[..., : k // 2, :] + 8
    hi = q16[..., k // 2:, :]
    return {"q4": jnp.asarray((16 * hi + lo).astype(np.int8)),
            "scale": jnp.asarray(scale)}


# conv weights below this many elements stay bf16: the blocked-time seanet
# tail (model_9 resnet, model_11) reads tiny weights through kron-expanded
# block-diagonal matmuls that a quantized layout can't feed, and their
# streams are <100 KB/frame anyway
_MIN_CONV_QUANT_SIZE = 16384

# module names whose "w" is a conv1d (Cout, Cin, K) / convtr (Cin, Cout, K)
# weight in the seanet/mimi decode chain (models/seanet.py naming)
_CONV1D_MODULES = frozenset({"model_0", "model_11", "block_1", "block_3"})
_CONVTR_MODULES = frozenset({"model_2", "model_5", "model_8"})


def _quantize_conv1d(w32, bits: int):
    """conv1d w (Cout, Cin, K) -> {"qc"/"qc4", "scale"} over the logical
    2-D weight wf (K*Cin, Cout), wf[j*Cin + c, o] = w[o, c, j] — the layout
    ops.conv.conv1d's window-concat matmul consumes (x windows are
    [x_t | x_{t+1} | ...] along features)."""
    cout, cin, k = w32.shape
    wf = np.transpose(w32, (2, 1, 0)).reshape(k * cin, cout)
    qd = _quantize_weight(wf, bits)
    if qd is None:
        return None
    return {("qc" if bits == 8 else "qc4"): qd.get("q", qd.get("q4")),
            "scale": qd["scale"]}


def _quantize_convtr(w32, bits: int):
    """convtr w (Cin, Cout, K), K == 2*stride -> {"qt"/"qt4", "scale"} over
    the j-major flattened weight w2 (Cin, K*Cout) that both the flat and
    blocked-time streaming transposed convs already matmul against
    (ops/conv.py conv_transpose1d)."""
    cin, cout, k = w32.shape
    w2 = np.transpose(w32, (0, 2, 1)).reshape(cin, k * cout)
    qd = _quantize_weight(w2, bits)
    if qd is None:
        return None
    return {("qt" if bits == 8 else "qt4"): qd.get("q", qd.get("q4")),
            "scale": qd["scale"]}


def quantize_params(params, bits: int = 8, convs: bool = False,
                    group: int = 0) -> dict:
    """Quantize every eligible weight in a params pytree.

    Linear {"w": 2-D / stacked (L, in, out)} -> {"q"/"q4", "scale"}.
    group > 0 (int4 linears only): K-grouped scales, shape (K/group, out)
    — the Q4_0-granularity option (VERDICT r2 #7). The fused layer /
    megalayer kernels reject grouped layouts and fall back to the
    separate dequant-matmul kernels, which dequantize in-kernel at the
    group granularity. group=32 matches the reference's Q4_0 exactly.
    convs=True additionally quantizes seanet conv1d / k==2s convtr weights
    -> {"qc(4)"/"qt(4)", "scale"} (per-output-channel, consumed by
    ops/conv.py's fused matmul paths) — the analog of the reference's
    quantize-everything-the-op-allows policy (src/loader.h:162-173,206-210).
    Measured OFF by default on v5e (BENCH r3): the conv weight stream is
    only ~6 MB/frame, so the window-concat activation copies plus ~6 extra
    kernel dispatches net ~0 at B=1 and cost ~8% aggregate at batch-32
    serving, where the weight stream is shared across streams anyway.
    Small tensors, biases, norms, the depthwise upsample and the
    blocked-time seanet tail stay full precision either way. bits: 8 or 4.
    """
    assert bits in (8, 4), bits

    def eligible(val):
        if not hasattr(val, "ndim") or val.size < _MIN_QUANT_SIZE:
            return False
        if val.ndim == 2:
            return True
        # stacked linear (L, in, out) vs conv (out, in, K): a conv's
        # trailing kernel dim is small
        return val.ndim == 3 and val.shape[2] >= 128

    def conv_kind(name, val):
        if (not convs or not hasattr(val, "ndim") or val.ndim != 3
                or val.size < _MIN_CONV_QUANT_SIZE):
            return None
        if name in _CONV1D_MODULES:
            return "conv1d"
        if name in _CONVTR_MODULES and val.shape[2] >= 2:
            return "convtr"
        return None

    def walk(node, name=""):
        if isinstance(node, dict):
            out = {}
            for key, val in node.items():
                if key == "w":
                    kind = conv_kind(name, val)
                    if kind is not None:
                        qd = (_quantize_conv1d if kind == "conv1d"
                              else _quantize_convtr)(
                                  np.asarray(val, np.float32), bits)
                        if qd is not None:
                            out.update(qd)
                            continue
                    elif eligible(val):
                        qd = _quantize_weight(np.asarray(val, np.float32),
                                              bits, group=group)
                        if qd is not None:
                            out.update(qd)
                            continue
                out[key] = walk(val, key)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, name) for v in node)
        return node
    return walk(params)


def quantization_error_report(params, bits: int = 4, convs: bool = False,
                              group: int = 0) -> dict:
    """Per-weight max relative quantization error: {keypath: err}.

    The real-weights-day instrument for the per-channel-vs-grouped-scale
    question: the reference's Q4_0 uses 32-element block scales
    (src/loader.h:162-173) and per-OUTPUT-CHANNEL int4 scales (ours) can
    lose precision on channels with in-row outliers. Run this on the real
    checkpoint (python -m pocket_tts_tpu.ab dumps it into the probes
    JSON); any module whose error is far above the ~0.08 int4 / ~0.005
    int8 baseline needs grouped scales or an int8/bf16 fallback there.
    """
    pq = quantize_params(params, bits=bits, convs=convs, group=group)
    report = {}
    flat_o, _ = jax.tree_util.tree_flatten_with_path(params)
    orig = {jax.tree_util.keystr(k): v for k, v in flat_o}
    flat_q, _ = jax.tree_util.tree_flatten_with_path(pq)
    qmap = {jax.tree_util.keystr(k): v for k, v in flat_q}
    _QKEYS = ("['q']", "['q4']", "['qc']", "['qc4']", "['qt']", "['qt4']")
    for key, qv in qmap.items():
        if not key.endswith(_QKEYS):
            continue
        kind = key[key.rfind("['") + 2: -2]
        base = key[: key.rfind("[")] + "['w']"
        if base not in orig:
            continue
        w = np.asarray(orig[base], np.float32)
        if kind in ("qc", "qc4"):
            # conv1d (Cout, Cin, K) was quantized over wf (K*Cin, Cout) —
            # compare in that domain (see _quantize_conv1d)
            cout, cin, k = w.shape
            w = np.transpose(w, (2, 1, 0)).reshape(k * cin, cout)
        elif kind in ("qt", "qt4"):
            # convtr (Cin, Cout, K) over w2 (Cin, K*Cout) (_quantize_convtr)
            cin, cout, k = w.shape
            w = np.transpose(w, (0, 2, 1)).reshape(cin, k * cout)
        scale = np.asarray(qmap[key[: key.rfind("[")] + "['scale']"],
                           np.float32)
        if kind.endswith("4"):
            from ..ops.quant_matmul import unpack_int4
            q4 = np.asarray(qv)
            if q4.ndim == 3:
                deq = np.stack([np.asarray(unpack_int4(q4[l]), np.float32)
                                for l in range(q4.shape[0])])
            else:
                deq = np.asarray(unpack_int4(q4), np.float32)
            if scale.ndim == deq.ndim:    # K-grouped: repeat per block
                scale = np.repeat(scale, deq.shape[-2] // scale.shape[-2],
                                  axis=-2)
                deq = deq * scale
            else:
                deq = deq * scale[..., None, :]
        else:
            deq = np.asarray(qv, np.float32) * scale[..., None, :]
        denom = np.abs(w).max(axis=-2, keepdims=True) + 1e-12
        report[base] = float((np.abs(deq - w) / denom).max())
    return report


# ---------------------------------------------------------------------------
# param cache: any params pytree <-> one safetensors file
# ---------------------------------------------------------------------------

def save_params_cache(params, path: str, gguf_quantize=None):
    """Serialize a params pytree (quantized or not) to a cache file; the
    pytree structure is recorded in metadata for exact round-trip.

    `.gguf` paths write the reference-interoperable GGUF container
    (src/loader.h:228-272 analog); anything else writes safetensors."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    tensors = {}
    for keypath, leaf in flat:
        tensors[jax.tree_util.keystr(keypath)] = np.asarray(leaf)
    structure = json.dumps(_tree_skeleton(params))
    if path.endswith(".gguf"):
        from .gguf import write_gguf
        write_gguf(path, tensors,
                   metadata={"pocket_tts.tree": structure,
                             "pocket_tts.layout": _LAYOUT_VERSION},
                   quantize=gguf_quantize)
    else:
        if gguf_quantize:
            raise ValueError("gguf_quantize requires a .gguf path")
        from .safetensors_io import save_safetensors
        save_safetensors(tensors, path,
                         metadata={"pocket_tts_tree": structure,
                                   "pocket_tts_layout": _LAYOUT_VERSION})


def load_params_cache(path: str):
    if path.endswith(".gguf"):
        from .gguf import read_gguf
        tensors, meta = read_gguf(path)
        structure = json.loads(meta["pocket_tts.tree"])
        layout = meta.get("pocket_tts.layout")
    else:
        from .safetensors_io import load_safetensors
        tensors, meta = load_safetensors(path, with_metadata=True)
        structure = json.loads(meta["pocket_tts_tree"])
        layout = meta.get("pocket_tts_layout")
    if layout != _LAYOUT_VERSION:
        raise ValueError(
            f"params cache {path!r} has layout {layout!r}, this build needs "
            f"{_LAYOUT_VERSION!r} (in_proj RoPE column permutation) — "
            "re-save it from the original checkpoint")
    flat = {k: jnp.asarray(np.asarray(v)) for k, v in tensors.items()}
    return _tree_unskeleton(structure, flat, "")


def _tree_skeleton(node):
    if isinstance(node, dict):
        return {"__kind__": "dict",
                "items": {k: _tree_skeleton(v) for k, v in node.items()}}
    if isinstance(node, tuple):
        return {"__kind__": "tuple",
                "items": [_tree_skeleton(v) for v in node]}
    if isinstance(node, list):
        return {"__kind__": "list",
                "items": [_tree_skeleton(v) for v in node]}
    return {"__kind__": "leaf"}


def _tree_unskeleton(skel, flat, prefix):
    kind = skel["__kind__"]
    if kind == "leaf":
        return flat[prefix]
    if kind == "dict":
        return {k: _tree_unskeleton(v, flat, prefix + f"['{k}']")
                for k, v in skel["items"].items()}
    seq = [_tree_unskeleton(v, flat, prefix + f"[{i}]")
           for i, v in enumerate(skel["items"])]
    return tuple(seq) if kind == "tuple" else seq
