"""Pallas TPU fused decode step: KV write + paged attention in one kernel.

TPU-native counterpart of the reference decode path, which is two CUDA
kernels — ``reshape_and_cache`` (csrc/cache_kernels.cu) scattering the new
token's K/V into the paged cache, then ``paged_attention_v1/v2``
(csrc/attention/attention_kernels.cu) attending over it.  Here both fuse
into one Pallas kernel that updates the cache **in place**
(``input_output_aliases``), so the full multi-GiB cache array is never
copied, scattered into by XLA, or threaded through a ``lax.scan`` — the
three copies that dominated the unfused step time.

Layout: the cache is page-major, ``[L, N+1, 2, KH, Bs, Dp]`` — one page
holds every head's K and V contiguously (typ. 128 KiB), so the per-page
HBM->VMEM fetch is ONE large DMA covering both halves instead of ``2*KH``
4 KiB latency-bound DMAs (the round-1 kernel's bottleneck: ~8 ms/layer vs
a ~0.2 ms roofline).  The block loop consumes ``PPI`` pages per iteration
so the online-softmax bookkeeping and loop overhead amortize over
``PPI * KH * Bs`` keys at a time.

Measured profile (v5e, benchmarks/bench_kernels.py, 16 MHA heads x 128,
page 16): 448 GB/s effective at 32 seqs x 576 ctx and 672 GB/s at
2048 ctx — a fixed ~4 us per-sequence cost (program transition + first
unhidden DMA + epilogue) dominates short contexts.  Variants measured and
rejected: splitting K/V into two DMAs per page (parity), 256 KiB pages
(parity), bf16 scores matmul (parity — MXU passes hide under the DMA
stream), cross-program prefetch of the next sequence's first pages
(2% WORSE — the extra hazard sync outweighs the hidden latency).

GQA across heads runs as ONE block-diagonal matmul pair per iteration:
queries flatten to ``[QH, Dp]`` rows (row r = head r//G), keys/values to
``[PPI*KH*Bs, Dp]`` (column c = page c//(KH*Bs), head (c//Bs)%KH); an
additive head-match bias (precomputed once) kills the off-diagonal blocks
before the online softmax, and the zeroed probabilities make ``p @ V``
sum each row over its own head's values only.  The padding FLOPs keep
both matmuls MXU-shaped instead of ``KH`` separate [G, Dp] x [Dp, Bs]
slivers that would leave the kernel VPU-bound.

Grid: (S,). Each program serves one sequence: it streams the sequence's
pages with double-buffered DMA and accumulates the online softmax; when
the stream reaches the sequence's LAST page it injects the new token's
K/V row into the fetched page in VMEM (a masked select — Mosaic cannot
DMA a single sublane row at a dynamic offset) and DMAs the whole updated
page back to HBM, so the cache write costs one extra aligned page-store
per sequence.  TPU grid programs run sequentially, and distinct sequences
never write the same page (shared prefix pages are full and immutable;
CoW is resolved before the step), so the in-place update is race-free.

Supports GQA/MHA, sliding windows (whole pages left of the window are
skipped), ALiBi biases, and FP8 caches (values are quantized outside, the
kernel reads them back so parity with the XLA reference is bit-exact).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fused_decode_kernel(
    # scalar prefetch
    layer_ref,  # [1] i32: layer index into the stacked cache (SMEM)
    block_tables_ref,  # [S, MB] i32 (SMEM)
    seq_lens_ref,  # [S] i32, context length INCLUDING the new token (SMEM)
    slot_ref,  # [S] i32 flat slot of the new token; -1 = padded lane (SMEM)
    # inputs
    q_ref,  # [1, Rp, Dp] VMEM (Rp = padded QH query rows)
    kv_new_ref,  # [1, 2, KH, Dp] VMEM: this token's K and V rows
    alibi_ref,  # [Rp, 128] f32 VMEM: per-row ALiBi slope (zeros = off)
    cache_hbm,  # [L, N+1, 2, KH, Bs, Dp] ANY (aliased with cache_out)
    # outputs
    cache_out,  # aliased cache (same buffer as cache_hbm)
    o_ref,  # [1, Rp, Dp] VMEM
    # scratch
    kv_buf,  # [2, PPI, 2, KH, Bs, Dp] VMEM double-buffered whole pages
    sems,  # DMA semaphores [2, PPI]
    wsem,  # write-back DMA semaphore [1]
    acc_ref,  # [Rp, Dp] f32
    m_ref,  # [Rp, 128] f32 running max
    l_ref,  # [Rp, 128] f32 running denominator
    *,
    group: int,
    block_size: int,
    ppi: int,
    scale: float,
    kv_scale: float,
    window: int,
    use_alibi: bool,
):
    s = pl.program_id(0)
    lid = layer_ref[0]
    seq_len = seq_lens_ref[s]
    slot = slot_ref[s]
    Bs = block_size
    # The new token lives in the LAST logical page (position seq_len-1);
    # its physical page is block_tables[s, write_block].
    write_block = jax.lax.div(jnp.maximum(seq_len - 1, 0), Bs)
    write_off = jax.lax.rem(jnp.maximum(slot, 0), Bs)

    num_blocks = jax.lax.div(seq_len + Bs - 1, Bs)
    if window > 0:
        first_block = jax.lax.div(jnp.maximum(seq_len - window, 0), Bs)
    else:
        first_block = jnp.int32(0)
    num_iters = jax.lax.div(num_blocks - first_block + ppi - 1, ppi)

    def page_dma(slot_i, j, g):
        # One DMA per page: both K and V halves ([2, KH, Bs, Dp]) move in a
        # single contiguous copy — per-DMA issue overhead is the binding
        # constraint, so fewer/larger transfers beat split halves.
        b = block_tables_ref[s, g]
        return pltpu.make_async_copy(cache_hbm.at[lid, b],
                                     kv_buf.at[slot_i, j],
                                     sems.at[slot_i, j])

    def start_iter(slot_i, it):
        for j in range(ppi):
            g = first_block + it * ppi + j

            @pl.when(g < num_blocks)
            def _():
                page_dma(slot_i, j, g).start()

            # Never-fetched tail pages keep whatever was in VMEM — on first
            # touch that can be NaN, and 0 * NaN = NaN poisons p @ V even
            # though the masked probabilities are 0.  Zero the V slot. (K
            # garbage is harmless: its scores are masked to NEG_INF.)
            @pl.when(g >= num_blocks)
            def _():
                kv_buf[slot_i, j, 1] = jnp.zeros_like(kv_buf[slot_i, j, 1])

    # Measured (v5e, 32x576): the scores matmul dtype does not move the
    # kernel time at all — the MXU passes hide under the page DMAs — so q/k
    # stay f32 for exact parity with the XLA reference path.
    q = q_ref[0].astype(jnp.float32) * scale  # [Rp, Dp]
    Rp = q.shape[0]
    KH = kv_buf.shape[3]
    CK = ppi * KH * Bs
    # Column c of the flattened keys: page c//(KH*Bs), head (c//Bs)%KH,
    # in-page position c%Bs. Row r is head r//group (rows past QH are
    # padding and match no head). Precomputed once as an additive bias.
    col = jax.lax.broadcasted_iota(jnp.int32, (Rp, CK), 1)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (Rp, CK), 0) // group
    col_head = jax.lax.rem(col // Bs, jnp.int32(KH))
    head_bias = jnp.where(row_head == col_head, 0.0, NEG_INF)  # [Rp, CK]
    # Key position of column c relative to the iteration's first page.
    col_pos = (col // (KH * Bs)) * Bs + jax.lax.rem(col, jnp.int32(Bs))
    if use_alibi:
        slopes = alibi_ref[:, 0:1]  # [Rp, 1]
    qpos = seq_len - 1

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(num_iters > 0)
    def _():
        start_iter(0, 0)

    def body(it, _):
        slot_i = jax.lax.rem(it, 2)

        @pl.when(it + 1 < num_iters)
        def _():
            start_iter(jax.lax.rem(it + 1, 2), it + 1)

        base = first_block + it * ppi
        for j in range(ppi):
            g = base + j

            @pl.when(g < num_blocks)
            def _():
                page_dma(slot_i, j, g).wait()

        # Inject the new token's K/V row into its page and write the page
        # back (the decode-step cache update, fused into the stream).  The
        # write page is always the sequence's LAST page, i.e. it lands in
        # the final iteration — the buffer slot is never refetched before
        # the end-of-program drain below.
        @pl.when((slot >= 0) & (base <= write_block)
                 & (write_block < base + ppi))
        def _():
            jw = write_block - base
            off_eq = jax.lax.broadcasted_iota(
                jnp.int32, kv_buf.shape[3:], 1) == write_off  # [KH, Bs, Dp]
            kv_buf[slot_i, jw, 0] = jnp.where(off_eq,
                                              kv_new_ref[0, 0][:, None, :],
                                              kv_buf[slot_i, jw, 0])
            kv_buf[slot_i, jw, 1] = jnp.where(off_eq,
                                              kv_new_ref[0, 1][:, None, :],
                                              kv_buf[slot_i, jw, 1])
            b = block_tables_ref[s, write_block]
            pltpu.make_async_copy(kv_buf.at[slot_i, jw],
                                  cache_out.at[lid, b], wsem.at[0]).start()

        k = kv_buf[slot_i, :, 0].reshape(CK,
                                         kv_buf.shape[-1]).astype(jnp.float32)
        v = kv_buf[slot_i, :, 1].reshape(CK, kv_buf.shape[-1])
        if kv_scale != 1.0:
            k = k * kv_scale
            v = (v.astype(jnp.float32) * kv_scale).astype(jnp.bfloat16)

        scores = jax.lax.dot_general(
            q, k, (((1, ), (1, )), ((), ())),
            preferred_element_type=jnp.float32)  # [Rp, CK]

        key_pos = base * Bs + col_pos
        live = key_pos < seq_len
        if window > 0:
            live &= key_pos >= seq_len - window
        if use_alibi:
            scores = scores - slopes * (qpos - key_pos).astype(jnp.float32)
        scores = jnp.where(live, scores + head_bias, NEG_INF)

        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        # Floor the running max so fully-masked iterations keep
        # exp(NEG_INF - m) underflowing to 0 instead of exp(0) = 1.
        m_new = jnp.maximum(jnp.maximum(
            m_prev, jnp.max(scores, axis=1, keepdims=True)), -1e20)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # [Rp, CK]; off-diagonal blocks are 0
        l_ref[...] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)  # [Rp, Dp]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        return 0

    jax.lax.fori_loop(0, num_iters, body, 0)

    # Drain the page write-back before the buffers can be reused by the
    # next grid program.
    @pl.when(slot >= 0)
    def _():
        it_w = jax.lax.div(write_block - first_block, ppi)
        slot_w = jax.lax.rem(it_w, 2)
        jw = jax.lax.rem(write_block - first_block, ppi)
        b = block_tables_ref[s, write_block]
        pltpu.make_async_copy(kv_buf.at[slot_w, jw], cache_out.at[lid, b],
                              wsem.at[0]).wait()

    l = jnp.maximum(l_ref[:, 0:1], 1e-9)
    o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    donate_argnums=(2, ),
    static_argnames=("scale", "kv_scale", "window", "interpret"))
def fused_decode_attention(
    q: jax.Array,  # [S, QH, D]
    kv_new: jax.Array,  # [S, 2, KH, Dp] new K/V rows (cache dtype)
    kv_cache: jax.Array,  # [L, N+1, 2, KH, Bs, Dp] (donated)
    layer_id: jax.Array,  # [] or [1] i32
    block_tables: jax.Array,  # [S, MB] i32
    seq_lens: jax.Array,  # [S] i32 (context AFTER this token)
    slot_mapping: jax.Array,  # [S] i32 flat slots; -1 = padded lane
    *,
    scale: float,
    kv_scale: float = 1.0,
    window: int = 0,
    alibi: Optional[jax.Array] = None,  # [QH] f32 slopes
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (attention output [S, QH, D], updated cache)."""
    S, QH, D = q.shape
    L, num_blocks_p1, two, KH, Bs, Dp = kv_cache.shape
    G = QH // KH
    # Pages per inner iteration: target ~128 keys per head per
    # online-softmax update. Measured on v5e at 1.1B decode shapes
    # (32 seqs x 576 ctx, benchmarks/bench_kernels.py): 128 keys/iter gives
    # 448 GB/s effective vs 408 at 64 and ~430 at 256+ (bigger chunks waste
    # masked tail-page compute once ppi exceeds the typical page count).
    # LTR_TPU_DECODE_KEYS overrides for tuning.
    target = int(os.environ.get("LTR_TPU_DECODE_KEYS", "128"))
    ppi = max(1, min(max(target // Bs, 1), num_blocks_p1 - 1, 16))
    # Pad query rows to a sublane tile; padded rows match no head.
    Rp = max(8, -(-QH // 8) * 8)
    qf = q.reshape(S, QH, D)
    if D < Dp or QH < Rp:
        qf = jnp.pad(qf, ((0, 0), (0, Rp - QH), (0, Dp - D)))

    slopes = jnp.zeros((Rp, 128), jnp.float32)
    if alibi is not None:
        pad = jnp.pad(alibi.astype(jnp.float32), (0, Rp - QH))
        slopes = jnp.broadcast_to(pad[:, None], (Rp, 128))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S, ),
        in_specs=[
            pl.BlockSpec((1, Rp, Dp), lambda s, *_: (s, 0, 0)),
            pl.BlockSpec((1, 2, KH, Dp), lambda s, *_: (s, 0, 0, 0)),
            pl.BlockSpec((Rp, 128), lambda s, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Rp, Dp), lambda s, *_: (s, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ppi, 2, KH, Bs, Dp), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, ppi)),
            pltpu.SemaphoreType.DMA((1, )),
            pltpu.VMEM((Rp, Dp), jnp.float32),
            pltpu.VMEM((Rp, 128), jnp.float32),
            pltpu.VMEM((Rp, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_fused_decode_kernel,
                               group=G,
                               block_size=Bs,
                               ppi=ppi,
                               scale=scale,
                               kv_scale=kv_scale,
                               window=window,
                               use_alibi=alibi is not None)
    layer_arr = jnp.asarray(layer_id, jnp.int32).reshape(1)
    new_cache, out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
            jax.ShapeDtypeStruct((S, Rp, Dp), q.dtype),
        ],
        # scalar-prefetch args shift input indices by 4: cache is input 7.
        input_output_aliases={7: 0},
        interpret=interpret,
    )(layer_arr, block_tables, seq_lens, slot_mapping, qf, kv_new, slopes,
      kv_cache)
    return out[:, :QH, :D].reshape(S, QH, D), new_cache
