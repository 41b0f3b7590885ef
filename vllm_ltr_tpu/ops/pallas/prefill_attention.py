"""Pallas TPU chunked-prefill (flash) attention over the paged KV cache.

TPU-native counterpart of the reference's prefill attention stack
(vllm/attention/backends/flash_attn.py:270 flash-attn prefill and the
chunked prefix-prefill Triton kernel, vllm/attention/ops/prefix_prefill.py,
755 LoC): each query tile streams its sequence's KV pages HBM->VMEM and
accumulates an online softmax, so the gathered context is never
materialized.  The XLA reference path (ops/attention.py) costs O(T*ctx)
memory and twice the HBM traffic; this kernel reads each KV page once per
query tile.

Layout contract (produced by executor/input_batch.py): the flattened token
buffer is TILE-ALIGNED — every sequence's tokens start at a multiple of
``tile`` and are contiguous and position-ordered, so each tile of ``tile``
tokens belongs to at most one sequence.  Tile ownership is then just
``token_seq[::tile]`` / ``token_pos[::tile]``.

Serves full prefill, chunked prefill (query positions start mid-sequence
and attend to the cached prefix), prefix-cache hits, and sliding-window
models (blocks left of the window are skipped, not just masked).

Grid: (num_tiles, num_kv_heads).  Query rows are GQA-flattened: the tile's
``tile*G`` rows interleave (token, group) so one MXU matmul serves the
whole query group.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_ltr_tpu.utils import cdiv

NEG_INF = -1e30


def _prefill_kernel(
    # scalar prefetch
    layer_ref,  # [1] i32: layer index into the stacked cache
    tile_seq_ref,  # [NT] i32: sequence row owning each tile (-1 = padding)
    tile_pos_ref,  # [NT] i32: absolute position of the tile's first token
    block_tables_ref,  # [S, MB] i32
    seq_lens_ref,  # [S] i32
    # inputs
    q_ref,  # [1, 1, R, Dp] VMEM (R = tile * G query rows)
    alibi_ref,  # [KH, 128] f32 VMEM: per-kv-head ALiBi slopes (zeros = off)
    cache_hbm,  # [L, N+1, 2, KH, Bs, Dp] HBM (page-major, see ops/kv_cache)
    # outputs
    o_ref,  # [1, 1, R, Dp] VMEM
    # scratch
    k_buf,  # [2, CK, Dp] VMEM (CK = chunk_blocks * Bs keys)
    v_buf,  # [2, CK, Dp] VMEM
    sems,  # DMA semaphores [2, 2, chunk_blocks]
    acc_ref,  # [R, Dp] f32
    m_ref,  # [R, 128] f32 running max
    l_ref,  # [R, 128] f32 running denominator
    *,
    tile: int,
    group: int,
    block_size: int,
    chunk_blocks: int,
    scale: float,
    kv_scale: float,
    window: Optional[int],
    use_alibi: bool,
):
    t = pl.program_id(0)
    h = pl.program_id(1)
    lid = layer_ref[0]
    seq = tile_seq_ref[t]
    pos0 = tile_pos_ref[t]
    s = jnp.maximum(seq, 0)
    seq_len = jnp.where(seq >= 0, seq_lens_ref[s], 0)

    CK = chunk_blocks * block_size
    # Keys this tile can see: everything up to its last query position.
    kv_limit = jnp.minimum(seq_len, pos0 + tile)
    hi = jax.lax.div(kv_limit + CK - 1, CK)
    if window is None:
        lo = jnp.int32(0)
    else:
        # Sliding window: whole chunks left of the window are skipped.
        first_key = jnp.maximum(pos0 - (window - 1), 0)
        lo = jax.lax.div(first_key, CK)

    def fetch(slot, it):
        base = it * chunk_blocks
        for j in range(chunk_blocks):
            b = block_tables_ref[s, base + j]
            pltpu.make_async_copy(
                cache_hbm.at[lid, b, 0, h],
                k_buf.at[slot, pl.ds(j * block_size, block_size)],
                sems.at[slot, 0, j]).start()
            pltpu.make_async_copy(
                cache_hbm.at[lid, b, 1, h],
                v_buf.at[slot, pl.ds(j * block_size, block_size)],
                sems.at[slot, 1, j]).start()

    def await_fetch(slot, it):
        base = it * chunk_blocks
        for j in range(chunk_blocks):
            b = block_tables_ref[s, base + j]
            pltpu.make_async_copy(
                cache_hbm.at[lid, b, 0, h],
                k_buf.at[slot, pl.ds(j * block_size, block_size)],
                sems.at[slot, 0, j]).wait()
            pltpu.make_async_copy(
                cache_hbm.at[lid, b, 1, h],
                v_buf.at[slot, pl.ds(j * block_size, block_size)],
                sems.at[slot, 1, j]).wait()

    q = q_ref[0, 0].astype(jnp.float32)  # [R, Dp]
    R = q.shape[0]
    # Query row r serves token r // group: its absolute position.
    q_pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // group

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(hi > lo)
    def _():
        fetch(0, lo)

    def body(it, carry):
        slot = jax.lax.rem(it - lo, 2)

        @pl.when(it + 1 < hi)
        def _():
            fetch(jax.lax.rem(it - lo + 1, 2), it + 1)

        await_fetch(slot, it)
        k = k_buf[slot].astype(jnp.float32) * kv_scale  # [CK, Dp]
        v = v_buf[slot].astype(jnp.float32) * kv_scale

        scores = jax.lax.dot_general(
            q, k, (((1, ), (1, )), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [R, CK]

        key_pos = (it * CK +
                   jax.lax.broadcasted_iota(jnp.int32, (1, CK), 1))
        live = (key_pos <= q_pos) & (key_pos < seq_len)
        if window is not None:
            live &= key_pos > q_pos - window
        if use_alibi:
            # ALiBi: score += -slope * (q_pos - key_pos).  MHA only
            # (G == 1, every ALiBi arch in the zoo), so the whole tile
            # shares this kv-head's single slope.
            # The whole [KH, 128] slope table is resident (a (1, 128)
            # block would violate Mosaic's 8-sublane block minimum);
            # pick this program's kv-head row (h from the kernel top —
            # program_id is not available inside the fori_loop body in
            # interpret mode).
            slope = alibi_ref[pl.ds(h, 1), 0:1]  # [1, 1]
            scores = scores + slope * (key_pos - q_pos).astype(jnp.float32)
        scores = jnp.where(live, scores, NEG_INF)

        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # [R, CK]
        l_ref[...] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        pv = jax.lax.dot_general(p, v, (((1, ), (0, )), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        return carry

    jax.lax.fori_loop(lo, hi, body, 0)

    l = jnp.maximum(l_ref[:, 0:1], 1e-9)
    o_ref[0, 0] = (acc_ref[...] / l).astype(o_ref.dtype)


def prefill_tile_size(group: int) -> int:
    """Query-tile token count: keep tile*group (MXU rows) <= 512."""
    if group <= 4:
        return 128
    if group <= 8:
        return 64
    return 32


@functools.partial(
    jax.jit,
    static_argnames=("tile", "block_size", "scale", "kv_scale", "window",
                     "interpret"))
def paged_prefill_attention_pallas(
    q: jax.Array,  # [T, QH, D] tile-aligned flattened prefill tokens
    kv_cache: jax.Array,  # [L, N+1, 2, KH, Bs, Dp] (this step's KV written)
    layer_id: jax.Array,  # [] i32 layer index
    block_tables: jax.Array,  # [S, MB] i32
    token_seq: jax.Array,  # [T] i32 (-1 pad)
    token_pos: jax.Array,  # [T] i32
    seq_lens: jax.Array,  # [S] i32
    *,
    tile: int,
    block_size: int,
    scale: float,
    kv_scale: float = 1.0,
    window: Optional[int] = None,
    alibi: Optional[jax.Array] = None,  # [QH] f32 slopes (MHA only)
    interpret: bool = False,
) -> jax.Array:
    T, QH, D = q.shape
    _, _, _, KH, Bs, Dp = kv_cache.shape
    assert Bs == block_size and T % tile == 0
    if alibi is not None:
        assert QH == KH, "ALiBi prefill kernel supports MHA only (G == 1)"
    G = QH // KH
    NT = T // tile
    R = tile * G

    # Tile ownership from the aligned layout.
    tile_seq = token_seq[::tile]
    tile_pos = token_pos[::tile]

    # 128 keys per inner iteration regardless of the cache page size.
    chunk_blocks = max(128 // block_size, 1)
    # Block tables padded so a chunk's trailing fetches stay in bounds.
    MB = block_tables.shape[1]
    MBp = cdiv(MB, chunk_blocks) * chunk_blocks
    if MBp != MB:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, MBp - MB)))

    # GQA-flatten queries: [T, QH, D] -> [KH, NT, tile*G, Dp].
    qg = q.reshape(NT, tile, KH, G, D).transpose(2, 0, 1, 3, 4)
    qg = qg.reshape(KH, NT, R, D)
    if D < Dp:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))

    slopes = jnp.zeros((KH, 128), jnp.float32)
    if alibi is not None:
        slopes = jnp.broadcast_to(
            alibi.astype(jnp.float32)[:, None], (KH, 128))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(NT, KH),
        in_specs=[
            pl.BlockSpec((1, 1, R, Dp), lambda t, h, *_: (h, t, 0, 0)),
            pl.BlockSpec((KH, 128), lambda t, h, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, R, Dp), lambda t, h, *_: (h, t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_blocks * Bs, Dp), kv_cache.dtype),
            pltpu.VMEM((2, chunk_blocks * Bs, Dp), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, chunk_blocks)),
            pltpu.VMEM((R, Dp), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_prefill_kernel,
                               tile=tile,
                               group=G,
                               block_size=block_size,
                               chunk_blocks=chunk_blocks,
                               scale=scale,
                               kv_scale=kv_scale,
                               window=window,
                               use_alibi=alibi is not None)
    layer_arr = jnp.asarray(layer_id, jnp.int32).reshape(1)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((KH, NT, R, Dp), q.dtype),
        interpret=interpret,
    )(layer_arr, tile_seq, tile_pos, block_tables, seq_lens, qg, slopes,
      kv_cache)
    # Invert the GQA flattening.
    out = out[..., :D].reshape(KH, NT, tile, G, D)
    return out.transpose(1, 2, 0, 3, 4).reshape(T, QH, D)
