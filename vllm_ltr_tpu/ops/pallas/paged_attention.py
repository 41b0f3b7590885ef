"""Pallas TPU paged-attention decode kernel.

TPU-native counterpart of the reference's CUDA paged-attention v1/v2 decode
kernels (``csrc/attention/attention_kernels.cu``, ~2,900 LoC): one query per
sequence attends over its block-paged KV history.

Design (per SURVEY.md §7 "hard parts"): decode attention is HBM-bandwidth
bound — the kernel streams each sequence's KV blocks HBM->VMEM with
double-buffered async DMA (hiding the gather indirection), computes the
online-softmax accumulation on the fly, and never materializes the gathered
context (the XLA reference path in ops/attention.py does, costing 2x
traffic + memory). FP8 KV caches are dequantized inline in VMEM
(``kv_scale``), matching the reference's fused fp8-e5m2 dequant.

Grid: (num_seqs, num_kv_heads). Each program owns one sequence x one KV head
and serves that head's GQA query group [G, D].
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_ltr_tpu.utils import cdiv


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [S, MB] int32 (SMEM)
    seq_lens_ref,  # [S] int32 (SMEM)
    # inputs
    q_ref,  # [1, 1, G, D] VMEM (per-grid slice)
    k_hbm,  # [KH, N+1, Bs, D] HBM
    v_hbm,  # [KH, N+1, Bs, D] HBM
    # outputs
    o_ref,  # [1, 1, G, D] VMEM
    # scratch
    k_buf,  # [2, Bs, D] VMEM
    v_buf,  # [2, Bs, D] VMEM
    sems,  # DMA semaphores [2, 2]
    acc_ref,  # [G, D] f32
    m_ref,  # [G, 128] f32 (running max, lane-broadcast)
    l_ref,  # [G, 128] f32 (running denominator)
    *,
    block_size: int,
    max_blocks: int,
    scale: float,
    kv_scale: float,
    window: int = 0,
):
    s = pl.program_id(0)
    h = pl.program_id(1)
    seq_len = seq_lens_ref[s]
    num_blocks = jnp.maximum(
        jax.lax.div(seq_len + block_size - 1, block_size), 0)
    # Sliding window: whole blocks left of the window are skipped, so
    # Mistral-class models keep the streaming fast path (the window lower
    # bound for the decode query at position seq_len-1 is seq_len-window).
    if window > 0:
        first_block = jax.lax.div(jnp.maximum(seq_len - window, 0),
                                  block_size)
    else:
        first_block = jnp.int32(0)

    q = q_ref[0, 0].astype(jnp.float32)  # [G, D]
    G = q.shape[0]

    def start_dma(slot, i):
        b = block_tables_ref[s, i]
        kd = pltpu.make_async_copy(k_hbm.at[h, b], k_buf.at[slot],
                                   sems.at[slot, 0])
        vd = pltpu.make_async_copy(v_hbm.at[h, b], v_buf.at[slot],
                                   sems.at[slot, 1])
        kd.start()
        vd.start()

    def wait_dma(slot, i):
        b = block_tables_ref[s, i]
        pltpu.make_async_copy(k_hbm.at[h, b], k_buf.at[slot],
                              sems.at[slot, 0]).wait()
        pltpu.make_async_copy(v_hbm.at[h, b], v_buf.at[slot],
                              sems.at[slot, 1]).wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, -1e30)
    l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(num_blocks > first_block)
    def _():
        start_dma(0, first_block)

    def body(i, _):
        slot = jax.lax.rem(i - first_block, 2)
        next_slot = jax.lax.rem(i - first_block + 1, 2)

        @pl.when(i + 1 < num_blocks)
        def _():
            start_dma(next_slot, i + 1)

        wait_dma(slot, i)
        k = k_buf[slot].astype(jnp.float32) * kv_scale  # [Bs, D]
        v = v_buf[slot].astype(jnp.float32) * kv_scale

        scores = jax.lax.dot_general(
            q, k, (((1, ), (1, )), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [G, Bs]

        # Mask keys beyond the live context (last partial block) and, for
        # sliding-window models, keys left of the window.
        key_pos = (i * block_size +
                   jax.lax.broadcasted_iota(jnp.int32, (G, block_size), 1))
        live = key_pos < seq_len
        if window > 0:
            live &= key_pos >= seq_len - window
        scores = jnp.where(live, scores, -1e30)

        m_prev = m_ref[:, 0:1]  # [G, 1]
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(scores, axis=1, keepdims=True)  # [G, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # [G, 1]
        p = jnp.exp(scores - m_new)  # [G, Bs]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

        pv = jax.lax.dot_general(
            p, v, (((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)  # [G, D]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
        return 0

    jax.lax.fori_loop(first_block, num_blocks, body, 0)

    l = jnp.maximum(l_ref[:, 0:1], 1e-9)
    o_ref[0, 0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "scale", "kv_scale", "window",
                     "interpret"))
def paged_attention_decode_pallas(
    q: jax.Array,  # [S, QH, D]
    layer_cache: jax.Array,  # [2, KH, N+1, Bs, D]
    block_tables: jax.Array,  # [S, MB] int32
    seq_lens: jax.Array,  # [S] int32
    *,
    block_size: int,
    scale: float,
    kv_scale: float = 1.0,
    window: int = 0,
    interpret: bool = False,
) -> jax.Array:
    S, QH, D = q.shape
    _, KH, num_blocks_p1, Bs, Dp = layer_cache.shape
    assert Bs == block_size
    G = QH // KH
    MB = block_tables.shape[1]

    # Pad the GQA group to a sublane tile and the head dim to the cache's
    # lane-padded width (zero-padded lanes contribute nothing to scores and
    # produce zero output channels, sliced off below).
    Gp = max(G, 8)
    q_grouped = q.reshape(S, KH, G, D)
    if G < Gp or D < Dp:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, Gp - G),
                                        (0, Dp - D)))
    k_cache = layer_cache[0]
    v_cache = layer_cache[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, KH),
        in_specs=[
            pl.BlockSpec((1, 1, Gp, Dp), lambda s, h, *_: (s, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, Gp, Dp),
                               lambda s, h, *_: (s, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Bs, Dp), k_cache.dtype),
            pltpu.VMEM((2, Bs, Dp), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((Gp, Dp), jnp.float32),
            pltpu.VMEM((Gp, 128), jnp.float32),
            pltpu.VMEM((Gp, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_decode_kernel,
                               block_size=block_size,
                               max_blocks=MB,
                               scale=scale,
                               kv_scale=kv_scale,
                               window=window)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, KH, Gp, Dp), q.dtype),
        interpret=interpret,
    )(block_tables, seq_lens, q_grouped, k_cache, v_cache)
    return out[:, :, :G, :D].reshape(S, QH, D)
