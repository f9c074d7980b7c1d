"""Fused ring-insert + T=16 attention kernel for the mimi decoder
transformer.

Per frame the mimi transformer inserts 16 KV rows into a 256-slot ring and
attends 16 queries over it, twice (2 layers). In XLA that cost ~60 us per
batch-32 frame: the dynamic-offset insert read-modify-writes partial
(8, 128) tiles (~9 us per cache) and the seg-matmul attention plus its
host-shaped bias run as separate fusions re-reading the cache. This kernel
does the whole step in one pass per stream:

  - the ring bias is ARITHMETIC, not data: slot ring-positions, the
    sliding window, the continuous-batching `start` fence, and the
    exclusion of the slots being overwritten this frame are all computed
    from iotas + two scalars (shared `offset`, per-stream `start`);
  - the 16 new rows are attended analytically from their VMEM operand
    (single-step flash merge of the old-cache and new-block pieces), so
    the cache read can race the insert write harmlessly — either byte
    version of the overwritten slots is masked;
  - the insert itself is one 16-row DMA into the HBM cache through
    input_output_aliasing — 16 rows satisfy the bf16 (2, 128) tiling that
    rejects the backbone's single-row inserts;
  - queries expand to one row per (timestep, head) against a block-diag
    segment mask so both contractions are plain bf16 MXU passes
    (ops.attention.sdpa_seg's trick, done on-chip).

Numerics match ops.attention.sdpa_seg + ring_cache_bias: f32 logits and
softmax, same 1/sqrt(D) scale, same -1e9 mask.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(off_ref, starts_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
            out_ref, kc_out, vc_out, sems, *, t, num_heads, head_dim,
            context, group):
    """One stream-group grid step. Block shapes: q/kn/vn (G, T, H*D);
    k/v (G, cap, H*D); out (G, T, H*D); kc/vc_out full HBM caches aliased
    onto the cache inputs (written, never read)."""
    b = pl.program_id(0)
    h, d = num_heads, head_dim
    hd = h * d
    th = t * h
    cap = k_ref.shape[1]
    off = off_ref[0]
    # insert start: algebraically off % cap, but written as
    # (block index) * T so Mosaic's divisibility prover accepts the
    # dynamic sublane offset of the row DMA (off advances in whole
    # T-frames by construction)
    slot0 = ((off // t) % (cap // t)) * t
    scale = 1.0 / jnp.sqrt(jnp.float32(d))

    # constants from iotas
    lane = jax.lax.broadcasted_iota(jnp.int32, (th, hd), 1)
    rowh = jax.lax.broadcasted_iota(jnp.int32, (th, hd), 0) % h
    seg = (lane // d == rowh).astype(jnp.float32)          # (TH, H*D)
    rsel = (jax.lax.broadcasted_iota(jnp.int32, (th, t), 0) // h
            == jax.lax.broadcasted_iota(jnp.int32, (th, t), 1)
            ).astype(jnp.bfloat16)                         # (TH, T)

    for g in range(group):
        pltpu.make_async_copy(kn_ref.at[g], kc_out.at[b * group + g,
                                                      pl.ds(slot0, t)],
                              sems.at[g, 0]).start()
        pltpu.make_async_copy(vn_ref.at[g], vc_out.at[b * group + g,
                                                      pl.ds(slot0, t)],
                              sems.at[g, 1]).start()

    for g in range(group):
        start = starts_ref[b * group + g]
        q = q_ref[g]                                       # (T, H*D) bf16
        kn = kn_ref[g]
        vn = vn_ref[g]
        kc = k_ref[g]                                      # (cap, H*D)
        vc = v_ref[g]

        # qm[t*H+h'] = q[t] masked to head h's lane segment
        qm = (jax.lax.dot_general(
            rsel, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * seg).astype(q.dtype)

        # absolute query positions per row: off + row // H
        pq = off + (jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0) // h)

        # ---- old cache piece -------------------------------------------
        logits_o = jax.lax.dot_general(
            qm, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (TH, cap)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (th, cap), 1)
        # pre-insert ring positions (ring_positions(off) semantics)
        last = off - 1
        end_index = last % cap
        delta = sidx - end_index
        pk = last + delta - jnp.where(delta > 0, cap, 0)
        written = sidx < off
        # slots being overwritten THIS frame hold stale bytes: mask them —
        # their replacement rows are attended analytically below
        overwrite = ((sidx - slot0) % cap) < t
        ok = (written & ~overwrite & (pk >= start) & (pq >= pk)
              & (pq - pk < context))
        logits_o = logits_o + jnp.where(ok, 0.0, NEG_INF)

        # ---- new rows piece (positions off + j, causal in-block) --------
        logits_n = jax.lax.dot_general(
            qm, kn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (TH, T)
        pj = off + jax.lax.broadcasted_iota(jnp.int32, (th, t), 1)
        logits_n = logits_n + jnp.where(pq >= pj, 0.0, NEG_INF)

        # ---- single-step flash merge -----------------------------------
        m = jnp.maximum(jnp.max(logits_o, axis=1, keepdims=True),
                        jnp.max(logits_n, axis=1, keepdims=True))
        p_o = jnp.exp(logits_o - m)
        p_n = jnp.exp(logits_n - m)
        l = (jnp.sum(p_o, axis=1, keepdims=True)
             + jnp.sum(p_n, axis=1, keepdims=True))
        pv = (jax.lax.dot_general(
                  p_o.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(
                  p_n.astype(vn.dtype), vn, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32))     # (TH, H*D)
        out_full = (pv / jnp.maximum(l, 1e-30)) * seg
        # collapse (TH, H*D) -> (T, H*D): per lane only the owning head's
        # row is non-zero after the seg mask
        out = jax.lax.dot_general(
            rsel.astype(jnp.float32), out_full, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (T, H*D)
        out_ref[g] = out.astype(out_ref.dtype)

    for g in range(group):
        pltpu.make_async_copy(kn_ref.at[g], kc_out.at[b * group + g,
                                                      pl.ds(slot0, t)],
                              sems.at[g, 0]).wait()
        pltpu.make_async_copy(vn_ref.at[g], vc_out.at[b * group + g,
                                                      pl.ds(slot0, t)],
                              sems.at[g, 1]).wait()


def _make_ring_attention(num_heads: int, context: int, interpret: bool):
    h = num_heads

    @functools.partial(jax.jit, static_argnames=())
    def batched(q, k_new, v_new, k_cache, v_cache, offset, starts):
        bsz, t, hd = q.shape
        cap = k_cache.shape[1]
        assert cap % t == 0, (cap, t)
        # streams per grid step: each step's serial cost is DMA of the
        # (group, cap, hd) cache blocks + ~1 us sequencing; fewer/bigger
        # steps win until the double-buffered blocks threaten VMEM
        # (2 caches x 2 buffers x group x cap x hd x itemsize <= 12 MB —
        # the q/kn/vn/out blocks and scratch stay well under the
        # remaining 4 MB of the 16 MB scoped limit)
        ebytes = k_cache.dtype.itemsize
        group = 1
        for cand in (8, 4, 2):
            if (bsz % cand == 0
                    and cand * cap * hd * 2 * 2 * ebytes <= 12 * 2**20):
                group = cand
                break
        kernel = functools.partial(
            _kernel, t=t, num_heads=h, head_dim=hd // h, context=context,
            group=group)
        blk = lambda b, o, s: (b, 0, 0)
        out, kc, vc = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bsz // group,),
                in_specs=[
                    pl.BlockSpec((group, t, hd), blk,
                                 memory_space=pltpu.VMEM),   # q
                    pl.BlockSpec((group, t, hd), blk,
                                 memory_space=pltpu.VMEM),   # k_new
                    pl.BlockSpec((group, t, hd), blk,
                                 memory_space=pltpu.VMEM),   # v_new
                    pl.BlockSpec((group, cap, hd), blk,
                                 memory_space=pltpu.VMEM),   # k_cache
                    pl.BlockSpec((group, cap, hd), blk,
                                 memory_space=pltpu.VMEM),   # v_cache
                ],
                out_specs=[
                    pl.BlockSpec((group, t, hd), blk,
                                 memory_space=pltpu.VMEM),   # attn
                    pl.BlockSpec(memory_space=pl.ANY),       # k_cache out
                    pl.BlockSpec(memory_space=pl.ANY),       # v_cache out
                ],
                scratch_shapes=[pltpu.SemaphoreType.DMA((group, 2))],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bsz, t, hd), q.dtype),
                jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            ],
            # operand numbering includes the two scalar-prefetch args:
            # offset=0, starts=1, q=2, k_new=3, v_new=4, k_cache=5,
            # v_cache=6
            input_output_aliases={5: 1, 6: 2},
            interpret=interpret,
            name="mimi_ring_attn",
        )(jnp.asarray(offset, jnp.int32).reshape(1),
          jnp.asarray(starts, jnp.int32),
          q, k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype),
          k_cache, v_cache)
        return out, kc, vc

    return batched


def _shard_batched(mesh, num_heads: int, context: int, interpret: bool):
    """shard_map wrapper: streams over "data", heads over "model" (specs
    match parallel/sharding.py's serving layouts — no collectives). Each
    shard runs the unmodified kernel with its LOCAL head count; see
    pallas_attn._shard_batched for the rationale (GSPMD cannot partition
    Mosaic custom calls)."""
    from jax.sharding import PartitionSpec as P
    assert {"data", "model"} <= set(mesh.axis_names), mesh.axis_names
    model = mesh.shape.get("model", 1)
    local = _make_ring_attention(num_heads // model, context, interpret)
    row_s = P("data", None, "model")
    # check_vma=False: see pallas_attn._shard_batched
    return jax.shard_map(
        lambda q, kn, vn, kc, vc, off, st: local(q, kn, vn, kc, vc, off, st),
        mesh=mesh,
        in_specs=(row_s, row_s, row_s, row_s, row_s, P(), P("data")),
        out_specs=(row_s, row_s, row_s), check_vma=False)


@functools.lru_cache(maxsize=None)
def _make_ring_attention_vmapped(num_heads: int, context: int,
                                 interpret: bool, mesh=None):
    """Single-stream fused ring insert+attend with a custom vmap rule
    dispatching the batched kernel (shared `offset`, per-stream `start`).
    mesh: run the batched kernel inside shard_map (vmapped calls only)."""
    batched = _make_ring_attention(num_heads, context, interpret)

    @jax.custom_batching.custom_vmap
    def fn(q, k_new, v_new, k_cache, v_cache, offset, start):
        out, kc, vc = batched(q[None], k_new[None], v_new[None],
                              k_cache[None], v_cache[None], offset,
                              start.reshape(1))
        return out[0], kc[0], vc[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, q, k_new, v_new, k_cache, v_cache,
              offset, start):
        qb, knb, vnb, kb, vb, ob, sb = in_batched
        assert not ob, "ring offset must be batch-uniform"

        def bat(x, isb):
            return x if isb else jnp.broadcast_to(x, (axis_size,) + x.shape)

        starts = (start if sb
                  else jnp.broadcast_to(start, (axis_size,)))
        if mesh is not None:
            data = mesh.shape.get("data", 1)
            model = mesh.shape.get("model", 1)
            if axis_size % data or num_heads % model:
                raise ValueError(
                    f"mimi ring shard_map needs batch {axis_size} % data "
                    f"{data} == 0 and heads {num_heads} % model {model} "
                    "== 0; use runtime.batched.mesh_cfg")
            dispatch = _shard_batched(mesh, num_heads, context, interpret)
            out = dispatch(bat(q, qb), bat(k_new, knb), bat(v_new, vnb),
                           bat(k_cache, kb), bat(v_cache, vb),
                           jnp.asarray(offset, jnp.int32).reshape(1),
                           starts)
        else:
            out = batched(bat(q, qb), bat(k_new, knb), bat(v_new, vnb),
                          bat(k_cache, kb), bat(v_cache, vb), offset, starts)
        return out, (True, True, True)

    return fn


def ring_insert_attention(q, k_new, v_new, k_cache, v_cache, offset, start,
                          num_heads: int, context: int,
                          interpret: bool = False, mesh=None):
    """Fused mimi ring step for one stream (batch via vmap).

    q/k_new/v_new: (T, H*D) post-rope rows; k/v_cache: (cap, H*D)
    PRE-insert, cap % T == 0 and offset % T == 0; offset: () total
    timesteps written (batch-uniform under vmap); start: () first timestep
    owned by this stream (continuous batching fence); mesh: shard the
    batched kernel over ("data" streams, "model" heads) — set through
    runtime.batched.mesh_cfg. Returns (attn (T, H*D), k_cache', v_cache')
    — the caches updated in place.
    """
    return _make_ring_attention_vmapped(num_heads, context, interpret, mesh)(
        q, k_new, v_new, k_cache, v_cache,
        jnp.asarray(offset, jnp.int32), jnp.asarray(start, jnp.int32))
