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


def _kernel(off_ref, starts_ref, *rest, t, num_heads, head_dim,
            context, group, quant):
    """One stream-group grid step. Block shapes: q/kn/vn (G, T, H*D);
    k/v (G, cap, H*D); out (G, T, H*D); kc/vc_out full HBM caches aliased
    onto the cache inputs (written, never read). quant adds (G, 1, T)
    new-row scale blocks, (G, 1, cap) cache scale blocks in AND out
    (composed whole — 1 KB/stream), int8 caches, and a (G, WIN, H*D)
    aligned-window scratch: int8's (32, 128) tiling rejects the bf16
    path's 16-row DMA at odd half-tile offsets, so the insert composes
    the enclosing 32-row window in VMEM (old block rows + new rows) and
    writes it back aligned — the backbone's fused-insert trick."""
    if quant:
        (q_ref, kn_ref, vn_ref, ksn_ref, vsn_ref, k_ref, v_ref, ks_ref,
         vs_ref, out_ref, kc_out, vc_out, kso_ref, vso_ref, kwin, vwin,
         sems) = rest
    else:
        (q_ref, kn_ref, vn_ref, k_ref, v_ref, out_ref, kc_out, vc_out,
         sems) = rest
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

    if quant:
        win = kwin.shape[1]
        # window start: slot0 rounded down to the int8 tile (32 rows);
        # slot0 = block*T with T | win | cap, so a0 is 32-aligned and the
        # window never wraps
        a0 = (slot0 // win) * win
        sh = slot0 - a0                                    # 0 or win - T
        rw = jax.lax.broadcasted_iota(jnp.int32, (win, hd), 0)
        isnew = (rw >= sh) & (rw < sh + t)
        # place the T new rows at window offset sh via a constant-shape
        # selection matmul (no offset-carrying concat)
        place = (jax.lax.broadcasted_iota(jnp.int32, (win, t), 0) - sh
                 == jax.lax.broadcasted_iota(jnp.int32, (win, t), 1)
                 ).astype(jnp.float32)                     # (WIN, T)
        m = isnew.astype(jnp.float32)
        for g in range(group):
            knf = jax.lax.dot_general(
                place, kn_ref[g].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            vnf = jax.lax.dot_general(
                place, vn_ref[g].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # int8 select through f32 arithmetic — Mosaic's v5e backend
            # has no int8 vector select (see pallas_attn._win_select)
            oldk = k_ref[g, pl.ds(a0, win), :].astype(jnp.float32)
            oldv = v_ref[g, pl.ds(a0, win), :].astype(jnp.float32)
            kwin[g] = (knf * m + oldk * (1.0 - m)).astype(kwin.dtype)
            vwin[g] = (vnf * m + oldv * (1.0 - m)).astype(vwin.dtype)
        for g in range(group):
            pltpu.make_async_copy(kwin.at[g],
                                  kc_out.at[b * group + g, pl.ds(a0, win)],
                                  sems.at[g, 0]).start()
            pltpu.make_async_copy(vwin.at[g],
                                  vc_out.at[b * group + g, pl.ds(a0, win)],
                                  sems.at[g, 1]).start()
    else:
        for g in range(group):
            pltpu.make_async_copy(kn_ref.at[g], kc_out.at[b * group + g,
                                                          pl.ds(slot0, t)],
                                  sems.at[g, 0]).start()
            pltpu.make_async_copy(vn_ref.at[g], vc_out.at[b * group + g,
                                                          pl.ds(slot0, t)],
                                  sems.at[g, 1]).start()

    # ring-mask algebra shared by every lane in the group (only the
    # per-stream `start` term differs): hoisted out of the g-loop — at
    # batch these (TH, cap) iota/compare passes were re-issued per lane
    # and per-lane VPU passes are additive on v5e (r5 floor micro)
    sidx = jax.lax.broadcasted_iota(jnp.int32, (th, cap), 1)
    pq = off + (jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0) // h)
    # pre-insert ring positions (ring_positions(off) semantics)
    last = off - 1
    end_index = last % cap
    delta = sidx - end_index
    pk = last + delta - jnp.where(delta > 0, cap, 0)
    written = sidx < off
    # slots being overwritten THIS frame hold stale bytes: mask them —
    # their replacement rows are attended analytically below
    overwrite = ((sidx - slot0) % cap) < t
    ok_shared = written & ~overwrite & (pq >= pk) & (pq - pk < context)
    pen_shared = jnp.where(ok_shared, 0.0, NEG_INF)
    # causal-in-block penalty for the new rows (start-independent)
    pj_new = off + jax.lax.broadcasted_iota(jnp.int32, (th, t), 1)
    pen_new = jnp.where(pq >= pj_new, 0.0, NEG_INF)

    for g in range(group):
        start = starts_ref[b * group + g]
        q = q_ref[g]                                       # (T, H*D) bf16
        kn = kn_ref[g]
        vn = vn_ref[g]
        kc = k_ref[g]                                      # (cap, H*D)
        vc = v_ref[g]
        if quant:
            kn = kn.astype(q.dtype)
            vn = vn.astype(q.dtype)
            kc = kc.astype(q.dtype)
            vc = vc.astype(q.dtype)

        # qm[t*H+h'] = q[t] masked to head h's lane segment
        qm = (jax.lax.dot_general(
            rsel, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * seg).astype(q.dtype)

        # ---- old cache piece -------------------------------------------
        logits_o = jax.lax.dot_general(
            qm, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (TH, cap)
        if quant:
            logits_o = logits_o * ks_ref[g]                # (1, cap) scales
        logits_o = (logits_o + pen_shared
                    + jnp.where(pk >= start, 0.0, NEG_INF))

        # ---- new rows piece (positions off + j, causal in-block) --------
        logits_n = jax.lax.dot_general(
            qm, kn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (TH, T)
        if quant:
            logits_n = logits_n * ksn_ref[g]               # (1, T) scales
        logits_n = logits_n + pen_new

        # ---- single-step flash merge -----------------------------------
        m = jnp.maximum(jnp.max(logits_o, axis=1, keepdims=True),
                        jnp.max(logits_n, axis=1, keepdims=True))
        p_o = jnp.exp(logits_o - m)
        p_n = jnp.exp(logits_n - m)
        l = (jnp.sum(p_o, axis=1, keepdims=True)
             + jnp.sum(p_n, axis=1, keepdims=True))
        if quant:
            # fold the v dequant scales into p (backbone int8-KV pattern)
            p_o = p_o * vs_ref[g]
            p_n = p_n * vsn_ref[g]
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

        if quant:
            # updated scale rows: whole (1, cap) blocks with the T new
            # scales placed at [slot0, slot0+T) by a selection matmul
            sidx1 = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
            isnew_s = (sidx1 >= slot0) & (sidx1 < slot0 + t)
            sel = (jax.lax.broadcasted_iota(jnp.int32, (t, cap), 1) - slot0
                   == jax.lax.broadcasted_iota(jnp.int32, (t, cap), 0)
                   ).astype(jnp.float32)                   # (T, cap)
            kso_ref[g] = jnp.where(
                isnew_s,
                jax.lax.dot_general(ksn_ref[g], sel, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32),
                ks_ref[g])
            vso_ref[g] = jnp.where(
                isnew_s,
                jax.lax.dot_general(vsn_ref[g], sel, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32),
                vs_ref[g])

    if quant:
        win = kwin.shape[1]
        a0 = ((slot0 // win) * win)
        for g in range(group):
            pltpu.make_async_copy(kwin.at[g],
                                  kc_out.at[b * group + g, pl.ds(a0, win)],
                                  sems.at[g, 0]).wait()
            pltpu.make_async_copy(vwin.at[g],
                                  vc_out.at[b * group + g, pl.ds(a0, win)],
                                  sems.at[g, 1]).wait()
    else:
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
    def batched(q, k_new, v_new, k_cache, v_cache, offset, starts,
                ks_new=None, vs_new=None, k_scale=None, v_scale=None):
        bsz, t, hd = q.shape
        cap = k_cache.shape[1]
        assert cap % t == 0, (cap, t)
        quant = k_scale is not None
        win = 32 if quant else t  # int8 (32, 128) tiling window
        if quant:
            assert cap % win == 0 and win % t == 0, (cap, win, t)
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
            group=group, quant=quant)
        blk = lambda b, o, s: (b, 0, 0)
        new_spec = pl.BlockSpec((group, t, hd), blk,
                                memory_space=pltpu.VMEM)
        cache_spec = pl.BlockSpec((group, cap, hd), blk,
                                  memory_space=pltpu.VMEM)
        nscale_spec = pl.BlockSpec((group, 1, t), blk,
                                   memory_space=pltpu.VMEM)
        cscale_spec = pl.BlockSpec((group, 1, cap), blk,
                                   memory_space=pltpu.VMEM)
        in_specs = [new_spec, new_spec, new_spec]            # q, k_new, v_new
        operands = [q, k_new.astype(k_cache.dtype),
                    v_new.astype(v_cache.dtype)]
        if quant:
            in_specs += [nscale_spec, nscale_spec]           # ks/vs_new
            operands += [ks_new.reshape(bsz, 1, t).astype(jnp.float32),
                         vs_new.reshape(bsz, 1, t).astype(jnp.float32)]
        in_specs += [cache_spec, cache_spec]                 # k/v_cache
        operands += [k_cache, v_cache]
        if quant:
            in_specs += [cscale_spec, cscale_spec]           # k/v_scale
            operands += [k_scale.reshape(bsz, 1, cap).astype(jnp.float32),
                         v_scale.reshape(bsz, 1, cap).astype(jnp.float32)]
        out_specs = [
            new_spec,                                        # attn
            pl.BlockSpec(memory_space=pl.ANY),               # k_cache out
            pl.BlockSpec(memory_space=pl.ANY),               # v_cache out
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bsz, t, hd), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ]
        # operand numbering includes the two scalar-prefetch args:
        # offset=0, starts=1, q=2, k_new=3, v_new=4,
        # bf16:  k_cache=5, v_cache=6
        # quant: ks_new=5, vs_new=6, k_cache=7, v_cache=8, ks=9, vs=10
        if quant:
            aliases = {7: 1, 8: 2, 9: 3, 10: 4}
            out_specs += [cscale_spec, cscale_spec]          # scale rows out
            out_shape += [
                jax.ShapeDtypeStruct((bsz, 1, cap), jnp.float32),
                jax.ShapeDtypeStruct((bsz, 1, cap), jnp.float32),
            ]
            scratch = [pltpu.VMEM((group, win, hd), k_cache.dtype),
                       pltpu.VMEM((group, win, hd), v_cache.dtype),
                       pltpu.SemaphoreType.DMA((group, 2))]
        else:
            aliases = {5: 1, 6: 2}
            scratch = [pltpu.SemaphoreType.DMA((group, 2))]
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bsz // group,),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            input_output_aliases=aliases,
            interpret=interpret,
            name="mimi_ring_attn",
        )(jnp.asarray(offset, jnp.int32).reshape(1),
          jnp.asarray(starts, jnp.int32), *operands)
        if quant:
            return (outs[0], outs[1], outs[2],
                    outs[3].reshape(bsz, cap), outs[4].reshape(bsz, cap))
        return outs[0], outs[1], outs[2]

    return batched


def _shard_batched(mesh, num_heads: int, context: int, interpret: bool,
                   quant: bool = False):
    """shard_map wrapper: streams over "data", heads over "model" (specs
    match parallel/sharding.py's serving layouts — no collectives). Each
    shard runs the unmodified kernel with its LOCAL head count; see
    pallas_attn._shard_batched for the rationale (GSPMD cannot partition
    Mosaic custom calls). In int8-KV mode the per-row scales are computed
    over the FULL row, so each head-shard applies the same replicated
    (B, cap)/(B, T) scale arrays."""
    from jax.sharding import PartitionSpec as P
    assert {"data", "model"} <= set(mesh.axis_names), mesh.axis_names
    model = mesh.shape.get("model", 1)
    local = _make_ring_attention(num_heads // model, context, interpret)
    row_s = P("data", None, "model")
    sc_s = P("data", None)
    # check_vma=False: see pallas_attn._shard_batched
    if quant:
        return jax.shard_map(
            lambda q, kn, vn, kc, vc, off, st, ksn, vsn, ks, vs: local(
                q, kn, vn, kc, vc, off, st, ks_new=ksn, vs_new=vsn,
                k_scale=ks, v_scale=vs),
            mesh=mesh,
            in_specs=(row_s, row_s, row_s, row_s, row_s, P(), P("data"),
                      sc_s, sc_s, sc_s, sc_s),
            out_specs=(row_s, row_s, row_s, sc_s, sc_s), check_vma=False)
    return jax.shard_map(
        lambda q, kn, vn, kc, vc, off, st: local(q, kn, vn, kc, vc, off, st),
        mesh=mesh,
        in_specs=(row_s, row_s, row_s, row_s, row_s, P(), P("data")),
        out_specs=(row_s, row_s, row_s), check_vma=False)


def _mesh_check(mesh, axis_size, num_heads):
    data = mesh.shape.get("data", 1)
    model = mesh.shape.get("model", 1)
    if axis_size % data or num_heads % model:
        raise ValueError(
            f"mimi ring shard_map needs batch {axis_size} % data "
            f"{data} == 0 and heads {num_heads} % model {model} "
            "== 0; use runtime.batched.mesh_cfg")


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
            _mesh_check(mesh, axis_size, num_heads)
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


@functools.lru_cache(maxsize=None)
def _make_ring_attention_vmapped_q(num_heads: int, context: int,
                                   interpret: bool, mesh=None):
    """int8-KV variant of _make_ring_attention_vmapped: new rows arrive
    pre-quantized with (T,) f32 scales, caches are int8 with (cap,) f32
    per-row scales threaded alongside (and returned updated)."""
    batched = _make_ring_attention(num_heads, context, interpret)

    @jax.custom_batching.custom_vmap
    def fn(q, k_new, v_new, ks_new, vs_new, k_cache, v_cache,
           k_scale, v_scale, offset, start):
        out, kc, vc, ks, vs = batched(
            q[None], k_new[None], v_new[None], k_cache[None], v_cache[None],
            offset, start.reshape(1), ks_new=ks_new[None],
            vs_new=vs_new[None], k_scale=k_scale[None], v_scale=v_scale[None])
        return out[0], kc[0], vc[0], ks[0], vs[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, q, k_new, v_new, ks_new, vs_new,
              k_cache, v_cache, k_scale, v_scale, offset, start):
        qb, knb, vnb, ksnb, vsnb, kb, vb, ksb, vsb, ob, sb = in_batched
        assert not ob, "ring offset must be batch-uniform"

        def bat(x, isb):
            return x if isb else jnp.broadcast_to(x, (axis_size,) + x.shape)

        starts = (start if sb
                  else jnp.broadcast_to(start, (axis_size,)))
        args = (bat(q, qb), bat(k_new, knb), bat(v_new, vnb),
                bat(k_cache, kb), bat(v_cache, vb))
        sc = dict(ks_new=bat(ks_new, ksnb), vs_new=bat(vs_new, vsnb),
                  k_scale=bat(k_scale, ksb), v_scale=bat(v_scale, vsb))
        if mesh is not None:
            _mesh_check(mesh, axis_size, num_heads)
            dispatch = _shard_batched(mesh, num_heads, context, interpret,
                                      quant=True)
            out = dispatch(*args,
                           jnp.asarray(offset, jnp.int32).reshape(1),
                           starts, sc["ks_new"], sc["vs_new"],
                           sc["k_scale"], sc["v_scale"])
        else:
            out = batched(*args, offset, starts, **sc)
        return out, (True,) * 5

    return fn


def ring_insert_attention(q, k_new, v_new, k_cache, v_cache, offset, start,
                          num_heads: int, context: int,
                          interpret: bool = False, mesh=None,
                          ks_new=None, vs_new=None, k_scale=None,
                          v_scale=None):
    """Fused mimi ring step for one stream (batch via vmap).

    q/k_new/v_new: (T, H*D) post-rope rows; k/v_cache: (cap, H*D)
    PRE-insert, cap % T == 0 and offset % T == 0; offset: () total
    timesteps written (batch-uniform under vmap); start: () first timestep
    owned by this stream (continuous batching fence); mesh: shard the
    batched kernel over ("data" streams, "model" heads) — set through
    runtime.batched.mesh_cfg. int8-KV mode (cfg.mimi_transformer
    .quantize_kv): k_new/v_new arrive pre-quantized int8 with ks_new/vs_new
    (T,) f32 scales; k/v_scale are the (cap,) per-row cache scales,
    returned updated. Returns (attn (T, H*D), k_cache', v_cache'
    [, k_scale', v_scale']) — the caches updated in place.
    """
    if k_scale is not None:
        return _make_ring_attention_vmapped_q(
            num_heads, context, interpret, mesh)(
            q, k_new, v_new, ks_new, vs_new, k_cache, v_cache,
            k_scale, v_scale,
            jnp.asarray(offset, jnp.int32), jnp.asarray(start, jnp.int32))
    return _make_ring_attention_vmapped(num_heads, context, interpret, mesh)(
        q, k_new, v_new, k_cache, v_cache,
        jnp.asarray(offset, jnp.int32), jnp.asarray(start, jnp.int32))
