"""Pallas flash-decode attention over the backbone's linear KV cache.

The hot loop is one query token (T=1) attending to a 1024-slot cache that is
mostly empty early in a sentence. The XLA sdpa path reads the whole cache
every step; this kernel double-buffers 128-slot blocks HBM->VMEM and stops at
the live prefix (ceil((end+1)/BS) blocks), cutting cache bandwidth by the
fill factor — the dominant per-frame cost of the decode step.

Masking needs no position comparison at decode time: a slot is attendable
iff its recorded position is >= 0 (written and not padding); all written
positions precede the current query by construction.

Mosaic-friendly layout: caches stream as (BS, H*D) panels (the natural HBM
layout of (S, H, D) — the reshape outside is a bitcast), heads are static
lane slices, every intermediate is 2-D, flash stats are (1, H).

Numerics match ops.attention.sdpa: logits/softmax in f32, same 1/sqrt(D)
scale.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _decode_attn_kernel(end_ref, q_ref, pos_ref, k_hbm, v_hbm, out_ref,
                        k_buf, v_buf, sems, *, block_size, num_heads,
                        head_dim):
    """Flash decode over grid=(B,): fori_loop over live cache blocks with
    double-buffered DMA. Shapes (full arrays in VMEM, row-indexed by the
    program id — per-batch blocking would violate the (8,128) block rules):
      q_ref/out_ref: (B, H*D) VMEM; pos_ref: (B, NB, BS) VMEM int32;
      k_hbm/v_hbm: (B, S, H*D) ANY; k_buf/v_buf: (2, BS, H*D) VMEM scratch.
    """
    b = pl.program_id(0)
    bs = block_size
    h, d = num_heads, head_dim
    nb_total = k_hbm.shape[1] // bs
    end = end_ref[0]
    nb = jnp.minimum((end + bs) // bs, nb_total)  # ceil((end+1)/bs), capped

    q = q_ref[b].astype(jnp.float32)               # (1, H*D) from (B,1,H*D)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))

    # head-segment matrix: M[h, i] = 1 iff lane i belongs to head h.
    # Per-head reductions/broadcasts become MXU matmuls, which keeps every
    # intermediate a full-width 2-D vector (Mosaic-friendly layouts).
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, h * d), 1)
    head = jax.lax.broadcasted_iota(jnp.int32, (h, h * d), 0)
    seg = (lane // d == head).astype(jnp.float32)  # (H, H*D)

    def dma(slot, blk, which):
        src = k_hbm if which == 0 else v_hbm
        buf = k_buf if which == 0 else v_buf
        return pltpu.make_async_copy(
            src.at[b, pl.ds(blk * bs, bs)],
            buf.at[slot],
            sems.at[which, slot],
        )

    # warm up both streams
    dma(0, 0, 0).start()
    dma(0, 0, 1).start()

    def body(i, carry):
        m, l, acc = carry                 # (1,H), (1,H), (1,H*D)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < nb)
        def _():
            dma(nxt, i + 1, 0).start()
            dma(nxt, i + 1, 1).start()

        dma(slot, i, 0).wait()
        dma(slot, i, 1).wait()

        kb = k_buf[slot].astype(jnp.float32)       # (BS, H*D)
        vb = v_buf[slot].astype(jnp.float32)
        posb = pos_ref[b, i, :]                    # (BS,)
        penalty = jnp.where(posb >= 0, 0.0,
                            NEG_INF).astype(jnp.float32)[:, None]  # (BS,1)

        # logits[s, h] = sum_{i in head h} kb[s, i] * q[0, i]
        prod = kb * q                                        # (BS, H*D)
        logits = jax.lax.dot_general(
            prod, seg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + penalty  # (BS, H)

        m_blk = jnp.max(logits, axis=0, keepdims=True)       # (1, H)
        m_new = jnp.maximum(m, m_blk)
        corr = jnp.exp(m - m_new)                            # (1, H)
        p = jnp.exp(logits - m_new)                          # (BS, H)
        l_new = l * corr + jnp.sum(p, axis=0, keepdims=True)

        p_wide = jnp.dot(p, seg,
                         preferred_element_type=jnp.float32)  # (BS, H*D)
        pv = jnp.sum(p_wide * vb, axis=0, keepdims=True)      # (1, H*D)
        corr_wide = jnp.dot(corr, seg,
                            preferred_element_type=jnp.float32)
        acc_new = acc * corr_wide + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((1, h), NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, h), jnp.float32)
    acc0 = jnp.zeros((1, h * d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
    l_wide = jnp.dot(jnp.maximum(l, 1e-30), seg,
                     preferred_element_type=jnp.float32)
    out_ref[b] = (acc / l_wide).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_size", "interpret"))
def _decode_attention_batched(q, k_cache, v_cache, pos, end,
                              block_size: int = 128,
                              interpret: bool = False):
    """q: (B, H, D); k/v_cache: (B, S, H*D) flat; pos: (B, S); end: ()
    shared. Returns (B, H, D)."""
    bsz, h, d = q.shape
    s = k_cache.shape[1]
    assert s % block_size == 0, (s, block_size)
    nb = s // block_size
    kernel = functools.partial(
        _decode_attn_kernel, block_size=block_size, num_heads=h, head_dim=d)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),       # q (B, H*D)
                pl.BlockSpec(memory_space=pltpu.VMEM),       # pos (B,NB,BS)
                pl.BlockSpec(memory_space=pltpu.ANY),        # k_cache
                pl.BlockSpec(memory_space=pltpu.ANY),        # v_cache
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, block_size, h * d), k_cache.dtype),
                pltpu.VMEM((2, block_size, h * d), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, h * d), q.dtype),
        interpret=interpret,
    )(jnp.asarray(end, jnp.int32).reshape(1),
      q.reshape(bsz, 1, h * d),
      pos.reshape(bsz, nb, block_size),
      k_cache, v_cache)
    return out.reshape(bsz, h, d)


@functools.lru_cache(maxsize=None)
def _make_decode_attention(block_size: int, interpret: bool):
    """Single-stream decode attention with a custom vmap rule that dispatches
    the explicitly-batched kernel (pallas can't auto-batch ANY-memory-space
    operands)."""

    @jax.custom_batching.custom_vmap
    def fn(q, k_cache, v_cache, pos, end):
        return _decode_attention_batched(
            q[None], k_cache[None], v_cache[None], pos[None], end,
            block_size=block_size, interpret=interpret)[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, q, k_cache, v_cache, pos, end):
        qb, kb, vb, pb, eb = in_batched
        assert not eb, "slot cursor `end` must be batch-uniform"

        def bat(x, isb):
            return x if isb else jnp.broadcast_to(x, (axis_size,) + x.shape)

        out = _decode_attention_batched(
            bat(q, qb), bat(k_cache, kb), bat(v_cache, vb), bat(pos, pb),
            end, block_size=block_size, interpret=interpret)
        return out, True

    return fn


def decode_attention(q, k_cache, v_cache, pos, end, block_size: int = 128,
                     interpret: bool = False):
    """q: (H, D) single query; k/v_cache: (S, H, D) or flat (S, H*D);
    pos: (S,) int32 (-1 = invalid); end: () int32 last written slot index
    (batch-uniform under vmap). Returns (H, D) attention output (same
    semantics as sdpa(q[None], cache, cache, bias-from-pos)[0])."""
    if k_cache.ndim == 3:
        s = k_cache.shape[0]
        k_cache = k_cache.reshape(s, -1)
        v_cache = v_cache.reshape(s, -1)
    return _make_decode_attention(block_size, interpret)(
        q, k_cache, v_cache, pos, jnp.asarray(end, jnp.int32))
