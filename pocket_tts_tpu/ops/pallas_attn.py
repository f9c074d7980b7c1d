"""Pallas flash-decode attention over the backbone's linear KV cache.

The hot loop is one query token (T=1) per stream attending to a KV cache
that is mostly empty early in a sentence. The XLA sdpa path has two costs
this kernel removes:

  1. it reads the whole (bucketed) cache capacity every frame — the kernel
     stops at the live prefix (ceil((end+1)/BS) blocks), cutting cache
     bandwidth by the fill factor;
  2. inside the decode while-loop XLA lays the batched cache carry out
     S-major (the layout the one-slot insert prefers), which makes the
     per-stream attention reads strided — measured 1.5x over
     bandwidth-ideal. A Mosaic custom call requires default (B-major)
     layouts, so its presence flips the carry layout and the reads stream
     contiguously.

Design: grid (B, NB) with BlockSpec-driven pipelining — Mosaic prefetches
block (b, i+1) while (b, i) computes, including across stream boundaries
(a manual DMA double-buffer restarts its pipeline per stream and was
measured ~1.7x slower). Dead blocks clamp their index_map to the last live
block: a revisited block issues no new copy, and pl.when skips its compute.

Masking needs no position comparison at decode time: a slot is attendable
iff its recorded position is >= 0 (written and not padding); all written
positions precede the current query by construction.

Mosaic-friendly layout: caches stream as (BS, H*D) panels (the natural HBM
layout of (S, H, D) — the reshape outside is a bitcast), heads are static
lane slices, every intermediate is 2-D, flash stats are (1, H), and both
contractions are native bf16 MXU passes (an f32 dot is multi-pass on the
MXU; full-width f32 elementwise ops were the old kernel's main cost).

Numerics: logits and softmax statistics are f32 with the same 1/sqrt(D)
scale as ops.attention.sdpa, but the PV contraction accumulates at the
INPUT dtype (bf16 MXU on the real model), so outputs differ from the XLA
path by bf16 rounding — same honest note as config.reference_exact_config,
which therefore pins this kernel off.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# Measurement-only ablation of insert-kernel features (tools/micro_insert.py
# attribution): comma-separated {nowin, nomerge, noscalerows, nocacheout}.
# NEVER set in production — ablated kernels return wrong caches/outputs.
_ABLATE = frozenset(
    x for x in os.environ.get("PTTS_ATTN_ABLATE", "").split(",") if x)


def _pick_group(bsz: int, bytes_per_stream: int, itemsize: int):
    """Streams per grid step: amortize the fixed per-step cost (~0.3-0.8 us
    of sequencing), bounded by VMEM for the double-buffered k+v blocks.

    int8 caches (serving mode) are small enough for group 8 once the
    kernel's scoped-VMEM limit is raised past the 16 MB default (v5e has
    128 MB of VMEM; the raise is per-kernel and the serving path's weights
    stream through Mosaic kernels, not XLA's alternate-memory prefetcher,
    so nothing competes for the headroom). >=2-byte caches keep the
    conservative 8 MB budget (group 4 tops) — THEIR programs rely on XLA
    prefetching the bf16 weight stream. Returns (group, vmem_limit|None).
    """
    budget = 15 * 1024 * 1024 if itemsize == 1 else 8 * 1024 * 1024
    # group 8 (and the 24 MB VMEM raise) are int8-only: >=2-byte caches
    # must keep the old group-4 ceiling so their programs leave alternate
    # memory to XLA's bf16 weight prefetcher.
    for cand in ((8, 4, 2) if itemsize == 1 else (4, 2)):
        if bsz % cand == 0 and cand * bytes_per_stream <= budget:
            # headroom for scratch/qm/pos/out on top of the k+v buffers
            lim = (24 * 1024 * 1024
                   if itemsize == 1
                   and cand * bytes_per_stream > 7 * 1024 * 1024 else None)
            return cand, lim
    return 1, None


def _rep_const(rows, group):
    """(rows, group) 0/1 f32: rep[r, g] = 1 iff stacked row r belongs to
    lane-group member g (r // (rows/group) == g). Dotting it against a
    (group, N) array broadcasts each lane's row to its H stacked rows as
    ONE MXU pass — exact for 0/1 and integer-valued operands even under
    the MXU's default-precision bf16 input truncation."""
    h = rows // group
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, group), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, group), 1)
    return (r // h == c).astype(jnp.float32)


def _sel_const(group, h):
    """(group, group*h) 0/1 f32 selector: the transpose of _rep_const —
    collapses per-head stacked rows back to one row per lane."""
    rows = group * h
    c = jax.lax.broadcasted_iota(jnp.int32, (group, rows), 1)
    g = jax.lax.broadcasted_iota(jnp.int32, (group, rows), 0)
    return (c // h == g).astype(jnp.float32)


def _seg_tile(rows, h, d):
    """(rows, h*d) 0/1 f32: row r keeps only head (r % h)'s lane segment —
    the per-lane seg mask tiled over the whole stacked scratch."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, h * d), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, h * d), 0)
    return (lane // d == row % h).astype(jnp.float32)


def _flash_main_block(i, qm_ref, pos_ref, ks_ref, vs_ref, k_ref, v_ref,
                      m_s, l_s, acc_s, logit_s, pen_s, *, h, d, group,
                      quant, ws=None):
    """The shared (stream-group x cache-block) flash step, restructured so
    ONLY the MXU dots (and tiny (1, BS) row staging) run per-lane: every
    elementwise phase (penalty, running max, exp, normalizer) runs ONCE on
    the stacked (G*H, BS) scratch. The r5 floor micro (tools/micro_floor.py)
    showed per-lane VPU passes do NOT hide behind the cache stream on v5e —
    they are additive per issue.

    ws: the write slot to exclude (insert kernel) or None (plain decode).
    Block shapes must keep their trailing two dims tile-legal for EVERY
    group (bf16 runs group 4/2), so pos stays whole-row (G, NB, BS) and
    per-block validity is staged per-lane into the (G, BS) pen_s scratch.
    """
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    if ws is not None:
        sidx = (i * k_ref.shape[1]
                + jax.lax.broadcasted_iota(jnp.int32, (1, k_ref.shape[1]),
                                           1))
    for g in range(group):
        lo, hi = g * h, (g + 1) * h
        qm = qm_ref[lo:hi]                         # (H, H*D) bf16
        kb = k_ref[g]                              # (BS, H*D) bf16/int8
        if quant:
            # int8 rows with per-row absmax scales: dequantize by folding
            # the k scales into the logits and the v scales into p — the
            # MXU passes stay bf16 x bf16
            kb = kb.astype(qm.dtype)
        # logits[h, s] = sum_i qm[h, i] * kb[s, i] — bf16 MXU pass
        lg = jax.lax.dot_general(
            qm, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if quant:
            lg = lg * ks_ref[g, pl.ds(i, 1), :]    # (1, BS)
        logit_s[lo:hi] = lg
        ok = pos_ref[g, pl.ds(i, 1), :] >= 0       # (1, BS)
        if ws is not None:
            # exclude the write slot: its bytes are pre-insert (stale in
            # ring mode); the new row is merged analytically at the end
            ok = ok & (sidx != ws)
        pen_s[g:g + 1] = ok.astype(jnp.float32)
    # ---- batched phase: one pass over the stacked (G*H, BS) scratch ----
    pen = pen_s[...]                               # (G, BS) 0/1 f32
    if group > 1:
        okf = jax.lax.dot_general(
            _rep_const(group * h, group), pen, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (G*H, BS), exact 0/1
    else:
        okf = pen                                  # (1, BS) broadcasts
    logits = logit_s[...] + jnp.where(okf >= 0.5, 0.0, NEG_INF)
    m = m_s[...]                                   # (G*H, 1)
    m_blk = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m, m_blk)
    corr = jnp.exp(m - m_new)
    p = jnp.exp(logits - m_new)                    # (G*H, BS)
    l_s[...] = l_s[...] * corr + jnp.sum(p, axis=1, keepdims=True)
    m_s[...] = m_new
    logit_s[...] = p
    for g in range(group):
        lo, hi = g * h, (g + 1) * h
        vb = v_ref[g]
        pg = logit_s[lo:hi]
        if quant:
            pg = pg * vs_ref[g, pl.ds(i, 1), :]    # fold v scales
            vb = vb.astype(qm_ref.dtype)
        # pv[h, i] = sum_s p[h, s] * vb[s, i]: second bf16 MXU pass
        pvh = jax.lax.dot_general(
            pg.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (H, H*D)
        acc_s[lo:hi] = acc_s[lo:hi] * corr[lo:hi] + pvh


def _collapse_out(out_ref, acc, l, group, h, d):
    """Normalize the stacked (G*H, H*D) accumulator and collapse each
    lane's H rows to its (1, H*D) seg-packed output row — one masked MXU
    pass for the whole group (exact: 0/1 selector x values that round to
    bf16 once either way, 15 of 16 summands exact zeros). out_ref is the
    (G, 1, H*D) block (tile-legal at every group size); rows are stored
    per lane."""
    norm = acc / jnp.maximum(l, 1e-30)
    seg = _seg_tile(group * h, h, d)
    if group > 1:
        res = jax.lax.dot_general(
            _sel_const(group, h), norm * seg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
        for g in range(group):
            out_ref[g] = res[g:g + 1, :]
    else:
        out_ref[0] = jnp.sum(norm * seg, axis=0,
                             keepdims=True).astype(out_ref.dtype)


def _decode_attn_kernel(end_ref, qm_ref, pos_ref, *rest, num_heads,
                        head_dim, nb_total, quant, group, stats=False):
    """One (stream-group, cache-block) grid step of batched flash decode.

    Each step processes `group` consecutive streams — the fixed per-step
    cost (~0.3-0.8 us of sequencing) dominated single-stream steps once
    the int8 cache halved the DMA time.

    Block shapes: qm_ref (G*H, H*D) stacked seg-masked queries (built once
    in XLA — rebuilding them per grid step cost real VPU time); pos_ref
    (G, NB, BS) whole stream rows (1.5 KB each); k_ref/v_ref (G, BS, H*D);
    out_ref (G, 1, H*D). Scratch (persists across grid steps): m_s/l_s
    (G*H, 1) f32 running max / normalizer, acc_s (G*H, H*D) f32
    unnormalized per-head output, logit_s (G*H, BS) f32 stacked logits/p
    staging, pen_s (G, BS) f32 staged slot validity.

    Everything is oriented so the per-slot mask adds LANE-wise ((., BS)
    logits): the transposed formulation needed a (1, BS) -> (BS, 1)
    sublane relayout every step, a measurable per-step cost.
    """
    st_ref = None
    if quant:
        ks_ref, vs_ref, k_ref, v_ref, out_ref, *tail = rest
    else:
        ks_ref = vs_ref = None
        k_ref, v_ref, out_ref, *tail = rest
    if stats:
        st_ref, m_s, l_s, acc_s, logit_s, pen_s = tail
    else:
        m_s, l_s, acc_s, logit_s, pen_s = tail
    i = pl.program_id(1)
    bs = k_ref.shape[1]
    h, d = num_heads, head_dim
    end = end_ref[0]
    nb = jnp.minimum((end + bs) // bs, nb_total)  # ceil((end+1)/bs), capped

    @pl.when(i == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(i < nb)
    def _():
        _flash_main_block(i, qm_ref, pos_ref, ks_ref, vs_ref, k_ref, v_ref,
                          m_s, l_s, acc_s, logit_s, pen_s, h=h, d=d,
                          group=group, quant=quant)

    @pl.when(i == nb_total - 1)
    def _():
        _collapse_out(out_ref, acc_s[...], l_s[...], group, h, d)
        if stats:
            # flash partial stats for external merges (shared-prefix
            # attention): running max + normalizer per head
            st_ref[...] = jnp.concatenate([m_s[...], l_s[...]], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("block_size", "interpret", "stats"))
def _decode_attention_batched(q, k_cache, v_cache, pos, end,
                              k_scale=None, v_scale=None,
                              block_size: int = 128,
                              interpret: bool = False,
                              stats: bool = False):
    """q: (B, H, D); k/v_cache: (B, S, H*D) flat (int8 when k_scale/v_scale
    (B, S) f32 per-row dequant scales are given); pos: (B, S); end: ()
    shared. Returns (B, H, D)."""
    bsz, h, d = q.shape
    s = k_cache.shape[1]
    assert s % block_size == 0, (s, block_size)
    nb = s // block_size
    quant = k_scale is not None
    # streams per grid step: amortize the fixed per-step cost; bounded by
    # VMEM (double-buffered k+v blocks) — sized by the ACTUAL cache
    # itemsize (f32 caches are 2x bf16; the old 2-byte assumption
    # overfilled the 16 MB scoped limit at group 4)
    bytes_per_stream = 2 * 2 * block_size * h * d * k_cache.dtype.itemsize
    group, vmem_lim = _pick_group(bsz, bytes_per_stream,
                                  k_cache.dtype.itemsize)
    kernel = functools.partial(
        _decode_attn_kernel, num_heads=h, head_dim=d, nb_total=nb,
        quant=quant, group=group, stats=stats)

    # seg-masked query built once here: qm[b*h + j, i] = q[b, j, i - j*d]
    # for lanes i in head j's segment, 0 elsewhere — stacked (B*H, H*D)
    eye = jnp.eye(h, dtype=q.dtype)
    qm = (eye[:, :, None] * q[:, None]).reshape(bsz * h, h * d)

    def live(i, end_v):
        # clamp dead blocks onto the last live one: a revisited block
        # fetches nothing and pl.when skips its compute
        last = jnp.maximum((end_v[0] + block_size) // block_size - 1, 0)
        return jnp.minimum(i, jnp.minimum(last, nb - 1))

    row_spec = pl.BlockSpec((group, nb, block_size),
                            lambda b, i, e: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((group * h, h * d), lambda b, i, e: (b, 0),
                     memory_space=pltpu.VMEM),      # qm (stacked)
        row_spec,                                   # pos (whole rows)
    ]
    operands = [qm, pos.reshape(bsz, nb, block_size)]
    if quant:
        in_specs += [row_spec, row_spec]            # k/v dequant scales
        operands += [k_scale.reshape(bsz, nb, block_size),
                     v_scale.reshape(bsz, nb, block_size)]
    in_specs += [
        pl.BlockSpec((group, block_size, h * d),
                     lambda b, i, e: (b, live(i, e), 0),
                     memory_space=pltpu.VMEM),      # k
        pl.BlockSpec((group, block_size, h * d),
                     lambda b, i, e: (b, live(i, e), 0),
                     memory_space=pltpu.VMEM),      # v
    ]
    operands += [k_cache, v_cache]

    out_specs = pl.BlockSpec((group, 1, h * d), lambda b, i, e: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bsz, 1, h * d), q.dtype)
    if stats:
        out_specs = [out_specs,
                     pl.BlockSpec((group * h, 2), lambda b, i, e: (b, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((bsz * h, 2), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz // group, nb),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((group * h, 1), jnp.float32),
                pltpu.VMEM((group * h, 1), jnp.float32),
                pltpu.VMEM((group * h, h * d), jnp.float32),
                pltpu.VMEM((group * h, block_size), jnp.float32),
                pltpu.VMEM((group, block_size), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=vmem_lim)
                         if vmem_lim else None),
        name="flash_decode",
    )(jnp.asarray(end, jnp.int32).reshape(1), *operands)
    if stats:
        out, st = out
        st = st.reshape(bsz, h, 2)
        return out.reshape(bsz, h, d), st[..., 0], st[..., 1]
    return out.reshape(bsz, h, d)


def _shard_batched(mesh, quant: bool, block_size: int, interpret: bool,
                   stats: bool = False):
    """shard_map wrapper: streams shard over "data", heads over "model".

    GSPMD cannot partition a Mosaic custom call, so under a mesh the
    batched kernel runs inside an explicit jax.shard_map whose specs match
    the serving layouts (parallel/sharding.py): q (B, H, D) ->
    P(data, model, ·); flat caches (B, S, H*D) -> P(data, ·, model); pos
    and dequant scales (B, S) -> P(data, ·); the shared slot cursor `end`
    replicated. Each shard runs the unmodified kernel on its local
    (B/data) streams x (H/model) heads — both embarrassingly parallel, no
    collectives. The kernel's per-head segment logic only needs the LOCAL
    head count, which it reads from the local shapes.
    """
    from jax.sharding import PartitionSpec as P
    assert {"data", "model"} <= set(mesh.axis_names), mesh.axis_names
    q_s = P("data", "model", None)
    kv_s = P("data", None, "model")
    row_s = P("data", None)
    in_specs = ((q_s, kv_s, kv_s, row_s, row_s, row_s, P())
                if quant else (q_s, kv_s, kv_s, row_s, P()))

    def call(*args):
        if quant:
            q, k, v, ks, vs, pos, end = args
            return _decode_attention_batched(
                q, k, v, pos, end, ks, vs,
                block_size=block_size, interpret=interpret, stats=stats)
        q, k, v, pos, end = args
        return _decode_attention_batched(
            q, k, v, pos, end, block_size=block_size, interpret=interpret,
            stats=stats)

    # stats (B, H) shard like q's (batch, head) axes
    out_specs = (q_s, P("data", "model"), P("data", "model")) if stats \
        else q_s
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # info, which the checker would demand (both kernels are per-shard pure
    # maps, so the check adds nothing here anyway)
    return jax.shard_map(call, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def _check_mesh_divides(mesh, axis_size: int, num_heads: int):
    data = mesh.shape.get("data", 1)
    model = mesh.shape.get("model", 1)
    if axis_size % data or num_heads % model:
        raise ValueError(
            f"flash-decode shard_map needs batch {axis_size} % data {data} "
            f"== 0 and heads {num_heads} % model {model} == 0; use "
            "runtime.batched.mesh_cfg (it falls back to the XLA path)")


@functools.lru_cache(maxsize=None)
def _make_decode_attention(block_size: int, interpret: bool, mesh=None,
                           stats: bool = False):
    """Single-stream decode attention with a custom vmap rule that dispatches
    the explicitly-batched kernel (so the engine's vmap lands here instead
    of an unbatchable custom call). mesh: run the batched kernel inside
    shard_map (vmapped calls only — the unvmapped base case is solo-stream
    and never sharded). stats: also return the flash (m, l) per head for
    external partial merges (shared-prefix attention)."""

    @jax.custom_batching.custom_vmap
    def fn(q, k_cache, v_cache, pos, end):
        out = _decode_attention_batched(
            q[None], k_cache[None], v_cache[None], pos[None], end,
            block_size=block_size, interpret=interpret, stats=stats)
        if stats:
            return tuple(o[0] for o in out)
        return out[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, q, k_cache, v_cache, pos, end):
        qb, kb, vb, pb, eb = in_batched
        assert not eb, "slot cursor `end` must be batch-uniform"

        def bat(x, isb):
            return x if isb else jnp.broadcast_to(x, (axis_size,) + x.shape)

        args = (bat(q, qb), bat(k_cache, kb), bat(v_cache, vb),
                bat(pos, pb), jnp.asarray(end, jnp.int32))
        if mesh is not None:
            _check_mesh_divides(mesh, axis_size, q.shape[-2])
            out = _shard_batched(mesh, False, block_size, interpret,
                                 stats)(*args)
        else:
            out = _decode_attention_batched(
                *args, block_size=block_size, interpret=interpret,
                stats=stats)
        if stats:
            return tuple(out), (True,) * len(out)
        return out, True

    return fn


@functools.lru_cache(maxsize=None)
def _make_decode_attention_q(block_size: int, interpret: bool, mesh=None,
                             stats: bool = False):
    """int8-KV variant (per-row dequant scales as extra operands)."""

    @jax.custom_batching.custom_vmap
    def fn(q, k_cache, v_cache, k_scale, v_scale, pos, end):
        out = _decode_attention_batched(
            q[None], k_cache[None], v_cache[None], pos[None], end,
            k_scale[None], v_scale[None],
            block_size=block_size, interpret=interpret, stats=stats)
        if stats:
            return tuple(o[0] for o in out)
        return out[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, q, k_cache, v_cache, k_scale, v_scale,
              pos, end):
        qb, kb, vb, ksb, vsb, pb, eb = in_batched
        assert not eb, "slot cursor `end` must be batch-uniform"

        def bat(x, isb):
            return x if isb else jnp.broadcast_to(x, (axis_size,) + x.shape)

        if mesh is not None:
            _check_mesh_divides(mesh, axis_size, q.shape[-2])
            out = _shard_batched(mesh, True, block_size, interpret, stats)(
                bat(q, qb), bat(k_cache, kb), bat(v_cache, vb),
                bat(k_scale, ksb), bat(v_scale, vsb), bat(pos, pb),
                jnp.asarray(end, jnp.int32))
        else:
            out = _decode_attention_batched(
                bat(q, qb), bat(k_cache, kb), bat(v_cache, vb), bat(pos, pb),
                end, bat(k_scale, ksb), bat(v_scale, vsb),
                block_size=block_size, interpret=interpret, stats=stats)
        if stats:
            return tuple(out), (True,) * len(out)
        return out, True

    return fn


# ---------------------------------------------------------------------------
# fused insert + flash decode
# ---------------------------------------------------------------------------
#
# The XLA decode path pays 2-4 dynamic_update_slice dispatches per layer to
# insert the current token's K/V row (plus scale scatters in int8-KV mode)
# BEFORE the attention kernel can run — measured ~50 us of the 785 us
# batch-32 serving frame, almost all fixed per-op cost. This variant folds
# the insert into the attention kernel itself, the same way the mimi ring
# kernel does (ops/pallas_mimi.py):
#
#   - the new row is attended ANALYTICALLY from its VMEM operand (a
#     single-row flash merge after the block loop), so the cache never
#     needs to contain it; the slot being overwritten is masked out of the
#     block pass (its bytes are stale in ring mode);
#   - the cache write is one async DMA of the tiling-aligned window of
#     rows around the write slot: the window's OLD rows are sliced from
#     the cache block the flash pass already has in VMEM (no read-back),
#     the new row is selected in, and the window DMAs out through
#     input_output_aliasing — overlapped with the remaining block steps;
#   - int8-KV scale rows ride along as whole-row VMEM blocks (they are
#     ~1.5 KB/stream) with the new scale selected in by lane.
#
# Window sizes: DMA slices must be sublane-tile aligned ((16, 128) bf16,
# (32, 128) int8 worst case — Mosaic rejected single-row slices outright,
# see CLAUDE.md r2). The window write replaces the DUS's own partial-tile
# read-modify-write, so even the conservative windows move no more bytes
# than the XLA path did.
_INSERT_WIN = {jnp.bfloat16: 16, jnp.int8: 32, jnp.float32: 8}


def _win_select(rowsel, new_row, old):
    """Select `new_row` into the window rows where rowsel. int8 goes
    through f32 arithmetic (Mosaic's v5e backend has no int8 vector
    select); values are exact at int8 magnitudes."""
    if old.dtype == jnp.int8:
        m = rowsel.astype(jnp.float32)
        return (new_row.astype(jnp.float32) * m
                + old.astype(jnp.float32) * (1.0 - m)).astype(jnp.int8)
    return jnp.where(rowsel, new_row.astype(old.dtype), old)


def _insert_attn_kernel(ends_ref, cpos_ref, *rest, num_heads, head_dim,
                        nb_total, quant, group, win, stats=False):
    """Fused single-token insert + batched flash decode.

    Grid (B//G, NB). ends_ref (2,) SMEM: [read extent, write slot]
    (both batch-uniform); cpos_ref (B,) SMEM: the new row's position per
    stream (-1 = invalid row). quant adds ksn/vsn (B,) f32 SMEM new-row
    scales, (G, NB, BS) scale-row blocks, and whole-row scale outputs.

    Like _decode_attn_kernel, only the MXU dots run per-lane; the flash
    phases, the analytic new-row merge, and the output collapse all run
    batched on stacked (G*H, .) arrays, and the window write-back is ONE
    3-D DMA per cache (the write slot is batch-uniform, so every lane's
    aligned window starts at the same row) instead of 2*G single-lane
    copies per grid step.
    """
    st_ref = kc_out = vc_out = kso_ref = vso_ref = None
    if quant:
        (ksn_ref, vsn_ref, qm_ref, pos_ref, ks_ref, vs_ref, kn_ref, vn_ref,
         k_ref, v_ref, out_ref, *tail) = rest
    else:
        ksn_ref = vsn_ref = ks_ref = vs_ref = None
        (qm_ref, pos_ref, kn_ref, vn_ref, k_ref, v_ref,
         out_ref, *tail) = rest
    if "nocacheout" not in _ABLATE:
        kc_out, vc_out, *tail = tail
    if quant and "noscalerows" not in _ABLATE:
        kso_ref, vso_ref, *tail = tail
    if stats:
        (st_ref, m_s, l_s, acc_s, logit_s, pen_s, col_s, new_s, kwin, vwin,
         sems) = tail
    else:
        m_s, l_s, acc_s, logit_s, pen_s, col_s, new_s, kwin, vwin, sems = \
            tail
    b = pl.program_id(0)
    i = pl.program_id(1)
    bs = k_ref.shape[1]
    h, d = num_heads, head_dim
    g_h = group * h
    end = ends_ref[0]
    ws = ends_ref[1]
    nb = jnp.minimum((end + bs) // bs, nb_total)
    iw = ws // bs                       # block holding the write slot
    a0 = (ws // win) * win              # aligned window start (global)
    r = ws - a0                         # row within the window

    def win_copies():
        return pltpu.make_async_copy(
            kwin, kc_out.at[pl.ds(b * group, group), pl.ds(a0, win)],
            sems.at[0]), pltpu.make_async_copy(
            vwin, vc_out.at[pl.ds(b * group, group), pl.ds(a0, win)],
            sems.at[1])

    @pl.when(i == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(i < nb)
    def _():
        _flash_main_block(i, qm_ref, pos_ref, ks_ref, vs_ref, k_ref, v_ref,
                          m_s, l_s, acc_s, logit_s, pen_s, h=h, d=d,
                          group=group, quant=quant, ws=ws)

    do_win = not ({"nowin", "nocacheout"} & _ABLATE)

    @pl.when(i == iw)
    def _():
        if not do_win:
            return
        # snapshot the window's OLD rows from the block already in VMEM,
        # select the new row in, and start the write-back DMA — it
        # overlaps the remaining block steps
        a_loc = (ws % bs) // win * win
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (win, h * d), 0) == r)
        for g in range(group):
            kwin[g] = _win_select(rowsel, kn_ref[g],
                                  k_ref[g, pl.ds(a_loc, win), :])
            vwin[g] = _win_select(rowsel, vn_ref[g],
                                  v_ref[g, pl.ds(a_loc, win), :])
        ck, cv = win_copies()
        ck.start()
        cv.start()

    if "nomerge" in _ABLATE:
        @pl.when(i == nb_total - 1)
        def _():
            _collapse_out(out_ref, acc_s[...], l_s[...], group, h, d)
            if stats:
                st_ref[...] = jnp.concatenate([m_s[...], l_s[...]], axis=1)
            if quant and "noscalerows" not in _ABLATE:
                for g in range(group):
                    kso_ref[g] = ks_ref[g]
                    vso_ref[g] = vs_ref[g]
            if do_win:
                ck, cv = win_copies()
                ck.wait()
                cv.wait()
        return

    @pl.when(i == nb_total - 1)
    def _():
        scale = 1.0 / jnp.sqrt(jnp.float32(d))
        # ---- analytic merge of the new row, batched over the group -----
        # new rows staged per lane (the (G, 1, H*D) block keeps its trailing
        # dims tile-legal at every group; a squeezed 2-D read would not be)
        for g in range(group):
            new_s[g:g + 1] = kn_ref[g].astype(jnp.float32)
            new_s[group + g:group + g + 1] = vn_ref[g].astype(jnp.float32)
        kn2 = new_s[0:group]                                 # (G, H*D)
        vn2 = new_s[group:2 * group]
        if group > 1:
            rep = _rep_const(g_h, group)
            knf = jax.lax.dot_general(                       # (G*H, H*D)
                rep, kn2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            vnf = jax.lax.dot_general(
                rep, vn2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            knf, vnf = kn2, vn2                              # (1, H*D)
        if quant:
            # new-row scales stay exact f32: written per lane from SMEM
            # (an MXU expansion would truncate them to bf16)
            for g in range(group):
                col_s[g * h:(g + 1) * h] = jnp.full(
                    (h, 1), ksn_ref[b * group + g], jnp.float32)
            knf = knf * col_s[...]
            for g in range(group):
                col_s[g * h:(g + 1) * h] = jnp.full(
                    (h, 1), vsn_ref[b * group + g], jnp.float32)
            vnf = vnf * col_s[...]
        qmf = qm_ref[...].astype(jnp.float32)                # (G*H, H*D)
        logit_n = (jnp.sum(qmf * knf, axis=1, keepdims=True)
                   * scale)                                  # (G*H, 1)
        for g in range(group):
            col_s[g * h:(g + 1) * h] = jnp.full(
                (h, 1),
                jnp.where(cpos_ref[b * group + g] >= 0, 0.0, NEG_INF),
                jnp.float32)
        logit_n = logit_n + col_s[...]
        m_old = m_s[...]
        m_fin = jnp.maximum(m_old, logit_n)
        corr = jnp.exp(m_old - m_fin)
        p_n = jnp.exp(logit_n - m_fin)                       # (G*H, 1)
        l_fin = l_s[...] * corr + p_n
        acc_fin = acc_s[...] * corr + p_n * vnf              # (G*H, H*D)
        _collapse_out(out_ref, acc_fin, l_fin, group, h, d)
        if stats:
            # post-merge flash stats (shared-prefix external merge)
            st_ref[...] = jnp.concatenate([m_fin, l_fin], axis=1)
        # ---- scale rows (whole-row VMEM blocks, lane select) -----------
        if quant and "noscalerows" not in _ABLATE:
            flat = (jax.lax.broadcasted_iota(
                        jnp.int32, (nb_total, bs), 0) * bs
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (nb_total, bs), 1))
            for g in range(group):
                babs = b * group + g
                kso_ref[g] = jnp.where(flat == ws, ksn_ref[babs], ks_ref[g])
                vso_ref[g] = jnp.where(flat == ws, vsn_ref[babs], vs_ref[g])
        if do_win:
            ck, cv = win_copies()
            ck.wait()
            cv.wait()


@functools.partial(jax.jit,
                   static_argnames=("block_size", "interpret", "stats"))
def _decode_insert_attention_batched(q, k_new, v_new, cur_pos, k_cache,
                                     v_cache, pos, read_end, write_slot,
                                     ks_new=None, vs_new=None,
                                     k_scale=None, v_scale=None,
                                     block_size: int = 128,
                                     interpret: bool = False,
                                     stats: bool = False):
    """Fused insert + flash decode. q (B, H, D); k_new/v_new (B, 1, H*D)
    in CACHE dtype (pre-quantized rows in int8-KV mode, with ks_new/vs_new
    (B,) f32 scales); cur_pos (B,) i32 the new row's position (-1 =
    invalid); caches (B, S, H*D) PRE-insert; pos (B, S) POST-insert (the
    1-element pos update stays one cheap XLA op per frame, shared by all
    layers); read_end/write_slot () batch-uniform. Returns
    (out (B, H, D), k_cache', v_cache'[, k_scale', v_scale'])."""
    bsz, h, d = q.shape
    s = k_cache.shape[1]
    assert s % block_size == 0, (s, block_size)
    nb = s // block_size
    quant = k_scale is not None
    win = min(_INSERT_WIN.get(k_cache.dtype.type, 32), block_size)
    assert block_size % win == 0, (block_size, win)
    # sized by the actual cache itemsize — see _decode_attention_batched
    bytes_per_stream = 2 * 2 * block_size * h * d * k_cache.dtype.itemsize
    group, vmem_lim = _pick_group(bsz, bytes_per_stream,
                                  k_cache.dtype.itemsize)
    kernel = functools.partial(
        _insert_attn_kernel, num_heads=h, head_dim=d, nb_total=nb,
        quant=quant, group=group, win=win, stats=stats)

    eye = jnp.eye(h, dtype=q.dtype)
    qm = (eye[:, :, None] * q[:, None]).reshape(bsz * h, h * d)
    ends = jnp.stack([jnp.asarray(read_end, jnp.int32),
                      jnp.asarray(write_slot, jnp.int32)])

    def live(i, ends_v):
        last = jnp.maximum((ends_v[0] + block_size) // block_size - 1, 0)
        return jnp.minimum(i, jnp.minimum(last, nb - 1))

    row_spec = pl.BlockSpec((group, nb, block_size),
                            lambda b, i, *s: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((group, 1, h * d), lambda b, i, *s: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((group, block_size, h * d),
                           lambda b, i, *s: (b, live(i, s[0]), 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((group * h, h * d), lambda b, i, *s: (b, 0),
                     memory_space=pltpu.VMEM),      # qm (stacked)
        row_spec,                                   # pos
    ]
    operands = [qm, pos.reshape(bsz, nb, block_size)]
    scalars = [ends, jnp.asarray(cur_pos, jnp.int32)]
    if quant:
        scalars += [ks_new.astype(jnp.float32), vs_new.astype(jnp.float32)]
        in_specs += [row_spec, row_spec]
        operands += [k_scale.reshape(bsz, nb, block_size),
                     v_scale.reshape(bsz, nb, block_size)]
    in_specs += [new_spec, new_spec, kv_spec, kv_spec]
    operands += [k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype),
                 k_cache, v_cache]

    out_specs = [
        pl.BlockSpec((group, 1, h * d), lambda b, i, *s: (b, 0, 0),
                     memory_space=pltpu.VMEM),      # attn out
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, 1, h * d), q.dtype),
    ]
    # operand numbering INCLUDES the scalar-prefetch args
    nsc = len(scalars)
    base = nsc + 2 + (2 if quant else 0)            # qm, pen01[, ks, vs]
    aliases = {}
    if "nocacheout" not in _ABLATE:
        out_specs += [
            pl.BlockSpec(memory_space=pl.ANY),      # k_cache (aliased)
            pl.BlockSpec(memory_space=pl.ANY),      # v_cache (aliased)
        ]
        out_shape += [
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ]
        aliases = {base + 2: 1, base + 3: 2}        # k_cache, v_cache
    if quant and "noscalerows" not in _ABLATE:
        n_out = len(out_shape)
        out_specs += [row_spec, row_spec]           # k/v scale rows
        out_shape += [
            jax.ShapeDtypeStruct((bsz, nb, block_size), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nb, block_size), jnp.float32),
        ]
        aliases[nsc + 2] = n_out                    # k_scale rows
        aliases[nsc + 3] = n_out + 1                # v_scale rows
    if stats:
        out_specs += [pl.BlockSpec((group * h, 2),
                                   lambda b, i, *s: (b, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((bsz * h, 2), jnp.float32)]

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsc,
            grid=(bsz // group, nb),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((group * h, 1), jnp.float32),
                pltpu.VMEM((group * h, 1), jnp.float32),
                pltpu.VMEM((group * h, h * d), jnp.float32),
                pltpu.VMEM((group * h, block_size), jnp.float32),
                pltpu.VMEM((group, block_size), jnp.float32),
                pltpu.VMEM((group * h, 1), jnp.float32),
                pltpu.VMEM((2 * group, h * d), jnp.float32),
                pltpu.VMEM((group, win, h * d), k_cache.dtype),
                pltpu.VMEM((group, win, h * d), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=vmem_lim)
                         if vmem_lim else None),
        name="flash_decode_insert",
    )(*scalars, *operands)
    if _ABLATE:
        # measurement-only: pad ablated outputs with the (stale) operands
        out = outs[0].reshape(bsz, h, d)
        res = (out, k_cache, v_cache)
        if quant:
            res += (k_scale, v_scale)
        if stats:
            st = outs[-1].reshape(bsz, h, 2)
            res += (st[..., 0], st[..., 1])
        return res
    out, kc, vc = outs[0], outs[1], outs[2]
    out = out.reshape(bsz, h, d)
    res = (out, kc, vc)
    if quant:
        res += (outs[3].reshape(bsz, s), outs[4].reshape(bsz, s))
    if stats:
        st = outs[-1].reshape(bsz, h, 2)
        res += (st[..., 0], st[..., 1])
    return res


def _shard_insert_batched(mesh, quant: bool, block_size: int,
                          interpret: bool, stats: bool = False):
    """shard_map wrapper for the fused insert kernel: streams over "data",
    heads over "model" — same seams as _shard_batched; the per-row scale
    arrays are replicated over "model" (each head-shard selects in the
    identical new scale)."""
    from jax.sharding import PartitionSpec as P
    assert {"data", "model"} <= set(mesh.axis_names), mesh.axis_names
    q_s = P("data", "model", None)
    kv_s = P("data", None, "model")
    row_s = P("data", None)
    vec_s = P("data")
    if quant:
        in_specs = (q_s, kv_s, kv_s, kv_s, kv_s, vec_s, vec_s, vec_s,
                    row_s, row_s, row_s, P(), P())
        out_specs = (q_s, kv_s, kv_s, row_s, row_s)
    else:
        in_specs = (q_s, kv_s, kv_s, kv_s, kv_s, vec_s, row_s, P(), P())
        out_specs = (q_s, kv_s, kv_s)
    if stats:
        out_specs += (P("data", "model"), P("data", "model"))

    def call(*args):
        if quant:
            (q, kn, vn, k, v, cpos, ksn, vsn, ks, vs, pos, re_, ws_) = args
            return _decode_insert_attention_batched(
                q, kn, vn, cpos, k, v, pos, re_, ws_, ksn, vsn, ks, vs,
                block_size=block_size, interpret=interpret, stats=stats)
        q, kn, vn, k, v, cpos, pos, re_, ws_ = args
        return _decode_insert_attention_batched(
            q, kn, vn, cpos, k, v, pos, re_, ws_,
            block_size=block_size, interpret=interpret, stats=stats)

    return jax.shard_map(call, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


@functools.lru_cache(maxsize=None)
def _make_insert_attention(quant: bool, block_size: int, interpret: bool,
                           mesh=None, stats: bool = False):
    """Single-stream fused insert+decode with a custom vmap rule (the
    batch collapses into the explicitly-batched kernel; write/read slot
    cursors stay batch-uniform)."""

    @jax.custom_batching.custom_vmap
    def fn(q, k_new, v_new, cur_pos, k_cache, v_cache, pos, read_end,
           write_slot, *qargs):
        outs = _decode_insert_attention_batched(
            q[None], k_new[None], v_new[None],
            jnp.asarray(cur_pos, jnp.int32).reshape(1), k_cache[None],
            v_cache[None], pos[None], read_end, write_slot,
            *([qargs[0].reshape(1), qargs[1].reshape(1), qargs[2][None],
               qargs[3][None]] if quant else []),
            block_size=block_size, interpret=interpret, stats=stats)
        return tuple(o[0] for o in outs)

    @fn.def_vmap
    def _rule(axis_size, in_batched, q, k_new, v_new, cur_pos, k_cache,
              v_cache, pos, read_end, write_slot, *qargs):
        assert not in_batched[7] and not in_batched[8], \
            "read/write slot cursors must be batch-uniform"

        def bat(x, isb):
            return x if isb else jnp.broadcast_to(x, (axis_size,) + x.shape)

        args = [bat(q, in_batched[0]), bat(k_new, in_batched[1]),
                bat(v_new, in_batched[2]),
                bat(jnp.asarray(cur_pos, jnp.int32), in_batched[3]),
                bat(k_cache, in_batched[4]), bat(v_cache, in_batched[5]),
                bat(pos, in_batched[6])]
        re_ = jnp.asarray(read_end, jnp.int32)
        ws_ = jnp.asarray(write_slot, jnp.int32)
        qb = [bat(a, isb) for a, isb in zip(qargs, in_batched[9:])]
        if mesh is not None:
            _check_mesh_divides(mesh, axis_size, q.shape[-2])
            if quant:
                ksn, vsn, ks, vs = qb
                outs = _shard_insert_batched(mesh, True, block_size,
                                             interpret, stats)(
                    args[0], args[1], args[2], args[4], args[5], args[3],
                    ksn, vsn, ks, vs, args[6], re_, ws_)
            else:
                outs = _shard_insert_batched(mesh, False, block_size,
                                             interpret, stats)(
                    args[0], args[1], args[2], args[4], args[5], args[3],
                    args[6], re_, ws_)
        else:
            outs = _decode_insert_attention_batched(
                args[0], args[1], args[2], args[3], args[4], args[5],
                args[6], re_, ws_, *qb,
                block_size=block_size, interpret=interpret, stats=stats)
        return tuple(outs), tuple(True for _ in outs)

    return fn


def decode_insert_attention(q, k_new, v_new, cur_pos, k_cache, v_cache,
                            pos, read_end, write_slot, k_scale=None,
                            v_scale=None, ks_new=None, vs_new=None,
                            block_size: int = None, interpret: bool = False,
                            mesh=None, stats: bool = False):
    """Fused KV insert + flash decode for one stream (batch via vmap).

    q: (H, D); k_new/v_new: (1, H*D) rows in CACHE dtype (pre-quantized
    int8 rows when the cache is int8, with ks_new/vs_new () f32 scales);
    cur_pos: () i32 position of the new row (-1 = invalid); caches
    (S, H*D) PRE-insert; pos (S,) POST-insert; read_end: () read extent
    (== write_slot in linear mode, capacity-1 in ring mode); write_slot:
    () slot receiving the row (batch-uniform). Returns
    (attn (H, D), k_cache', v_cache'[, k_scale', v_scale']) — caches
    updated in place via input_output_aliasing.

    Replaces the per-layer dynamic_update_slice chain of the XLA path
    (ref insert semantics: transformer.h:55-199 complete_kv) — see the
    design note above _INSERT_WIN."""
    if block_size is None:
        block_size = _pick_block(k_cache.shape[0])
    quant = k_scale is not None
    fn = _make_insert_attention(quant, block_size, interpret, mesh, stats)
    args = [q, k_new, v_new, jnp.asarray(cur_pos, jnp.int32), k_cache,
            v_cache, pos, jnp.asarray(read_end, jnp.int32),
            jnp.asarray(write_slot, jnp.int32)]
    if quant:
        args += [jnp.asarray(ks_new, jnp.float32),
                 jnp.asarray(vs_new, jnp.float32), k_scale, v_scale]
    return fn(*args)


def _pick_block(s: int) -> int:
    """Largest divisor block <= 384: per-grid-step overhead (~0.3-0.8 us)
    dominates DMA for small blocks, so fewer/bigger blocks win; 384 was the
    measured optimum on v5e for the 384-slot bench bucket."""
    for bs in (384, 256, 128):
        if s % bs == 0:
            return bs
    return s


def decode_attention(q, k_cache, v_cache, pos, end, block_size: int = None,
                     k_scale=None, v_scale=None, interpret: bool = False,
                     mesh=None, stats: bool = False):
    """q: (H, D) single query; k/v_cache: (S, H, D) or flat (S, H*D);
    pos: (S,) int32 (-1 = invalid); end: () int32 last written slot index
    (batch-uniform under vmap); k_scale/v_scale: (S,) f32 per-row dequant
    scales when the cache is int8 (cfg.quantize_kv); mesh: shard the
    batched kernel over ("data" streams, "model" heads) via shard_map —
    set through runtime.batched.mesh_cfg. Returns (H, D) attention output
    (same semantics as sdpa(q[None], cache, cache, bias-from-pos)[0])."""
    if k_cache.ndim == 3:
        s = k_cache.shape[0]
        k_cache = k_cache.reshape(s, -1)
        v_cache = v_cache.reshape(s, -1)
    if block_size is None:
        block_size = _pick_block(k_cache.shape[0])
    if k_scale is not None:
        return _make_decode_attention_q(block_size, interpret, mesh,
                                        stats)(
            q, k_cache, v_cache, k_scale, v_scale, pos,
            jnp.asarray(end, jnp.int32))
    return _make_decode_attention(block_size, interpret, mesh, stats)(
        q, k_cache, v_cache, pos, jnp.asarray(end, jnp.int32))
