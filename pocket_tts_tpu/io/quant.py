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


def _quantize_weight(w32, bits: int):
    """w32 (..., in, out) -> (payload dict) with per-output-channel scales;
    symmetric int8 (q) or packed-halves int4 (q4, see ops/quant_matmul)."""
    amax = np.abs(w32).max(axis=-2)                   # (..., out)
    qmax = 127.0 if bits == 8 else 7.0
    scale = np.where(amax > 0, amax / qmax, 1.0).astype(np.float32)
    q = np.clip(np.round(w32 / scale[..., None, :]), -qmax, qmax)
    if bits == 8:
        return {"q": jnp.asarray(q.astype(np.int8)),
                "scale": jnp.asarray(scale)}
    k = q.shape[-2]
    if k % 2:
        return None  # odd contraction dim: leave unquantized
    # signed-hi packing (see ops/quant_matmul.pack_int4)
    q16 = q.astype(np.int16)
    lo = q16[..., : k // 2, :] + 8
    hi = q16[..., k // 2:, :]
    return {"q4": jnp.asarray((16 * hi + lo).astype(np.int8)),
            "scale": jnp.asarray(scale)}


def quantize_params(params, bits: int = 8) -> dict:
    """Quantize every eligible linear weight in a params pytree.

    A dict node {"w": 2-D weight, ...} becomes {"q"/"q4", "scale", ...};
    conv weights (3-D with small trailing kernel dim) and small tensors are
    left alone. Stacked layer weights (L, in, out) quantize per
    layer x output channel. bits: 8 or 4.
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

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for key, val in node.items():
                if key == "w" and eligible(val):
                    qd = _quantize_weight(np.asarray(val, np.float32), bits)
                    if qd is not None:
                        out.update(qd)
                        continue
                out[key] = walk(val)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node
    return walk(params)


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
        write_gguf(path, tensors, metadata={"pocket_tts.tree": structure},
                   quantize=gguf_quantize)
    else:
        if gguf_quantize:
            raise ValueError("gguf_quantize requires a .gguf path")
        from .safetensors_io import save_safetensors
        save_safetensors(tensors, path,
                         metadata={"pocket_tts_tree": structure})


def load_params_cache(path: str):
    if path.endswith(".gguf"):
        from .gguf import read_gguf
        tensors, meta = read_gguf(path)
        structure = json.loads(meta["pocket_tts.tree"])
    else:
        from .safetensors_io import load_safetensors
        tensors, meta = load_safetensors(path, with_metadata=True)
        structure = json.loads(meta["pocket_tts_tree"])
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
