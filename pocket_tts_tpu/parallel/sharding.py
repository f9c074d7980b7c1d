"""Device-mesh sharding for batched / multi-stream serving.

The reference is strictly single-device single-stream (SURVEY.md §2.8); this
layer is the new TPU-native capability: a ("data", "model") mesh where
concurrent streams shard over "data" and the transformer weights/heads shard
over "model" (tensor parallel). XLA GSPMD inserts the ICI collectives — there
is no hand-written communication code, by design.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    dev = np.asarray(devices).reshape(data, model)
    return Mesh(dev, ("data", "model"))


def _spec_for_param(path: str, ndim: int) -> P:
    """Tensor-parallel layout for the stacked-layer params pytree.

    Column-parallel: in_proj / linear1 (contract dim replicated, output dim
    sharded). Row-parallel: out_proj / linear2 (input dim sharded; XLA inserts
    the psum on their outputs). Everything else replicated.
    """
    if "in_proj" in path or "linear1" in path:
        # weight (L, in, out) or bias (L, out): shard the output dim
        return P(*([None] * (ndim - 1)), "model")
    if "out_proj" in path or "linear2" in path:
        if path.endswith("['w']"):
            return P(*([None] * (ndim - 2)), "model", None)
        return P()  # bias on the summed output: replicated
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree matching `params` for TP over the "model" axis."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        pstr = jax.tree_util.keystr(path)
        specs.append(NamedSharding(mesh, _spec_for_param(pstr, np.ndim(leaf))))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def _spec_for_state(path: str, ndim: int, shape=None, mesh=None) -> P:
    """Batched stream-state sharding: leading batch dim over "data"; KV head
    dim (axis -2 of (B, L, S, H, Dh)) over "model"."""
    if ndim == 0:
        return P()
    if ".pk[" in path or ".pv[" in path:
        # shared-prefix prompt tables: head-major (H, P, D) and
        # batch-UNBATCHED (one copy per batch, not per lane) — replicate
        # over "data", slice the head axis over "model" to line up with
        # the head-sliced attention (the default data-leading spec would
        # wrongly scatter heads across the data axis). H is smaller than
        # the H*D the cache specs split, so check divisibility here.
        mdl = ("model" if shape is None or mesh is None
               or shape[0] % mesh.shape["model"] == 0 else None)
        return P(mdl, *([None] * (ndim - 1)))
    if ndim >= 3 and (".k[" in path or ".v[" in path):
        # batched flat cache (B, S, H*Dh) or (B, cap, H, Dh): shard the
        # head-carrying trailing dims over "model"
        if ndim == 3:
            return P("data", None, "model")
        return P("data", None, "model", *([None] * (ndim - 3)))
    return P("data", *([None] * (ndim - 1)))


def batched_state_shardings(state, mesh: Mesh):
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    specs = []
    for path, leaf in flat:
        pstr = jax.tree_util.keystr(path)
        specs.append(NamedSharding(mesh, _spec_for_state(
            pstr, np.ndim(leaf), np.shape(leaf), mesh)))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_batched_state(state, mesh: Mesh):
    return jax.device_put(state, batched_state_shardings(state, mesh))
