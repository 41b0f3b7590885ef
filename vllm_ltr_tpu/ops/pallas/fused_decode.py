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

Two kernels share this file (round 3):

* ``_stream_decode_kernel`` (default) — ONE program walks a flattened
  (sequence, page-group) schedule for the whole batch, precomputed as
  SMEM tables by vectorized XLA prework; the page-DMA pipeline never
  drains between sequences.  507 GB/s at 32 seqs x 576 ctx AND ~500 at
  2048 ctx (v5e, benchmarks/bench_kernels.py) — flat across context.
* ``_fused_decode_kernel`` (grid=(S,), ``LTR_TPU_DECODE_STREAM=0``) —
  one program per sequence; a fixed ~4 us per-sequence pipeline
  fill/drain caps it at 437 GB/s at 576 ctx.

Round-5 re-attribution (docs/BENCHMARKS.md "Round-5 timing-methodology
correction" — the r3 block_until_ready-based numbers were contaminated
by relay early-ack): under forced-fetch timing at QH32/KH8 32x576 the
kernel is bound by PER-ITERATION SCALAR SEQUENCING, not the page
stream — full 247 us vs 154 DMA-only vs 152 compute-only
(``LTR_TPU_DECODE_ABLATE``), keys/iter flat 64-512, pipeline depth >4
worse (``LTR_TPU_DECODE_NBUF``), fragmented vs contiguous tables +2%
(``bench_kernels.py --shuffle-pages``).  XLA's dense-matmul weight
streaming reaches 790-840 GB/s on the same part via MXU operand
prefetch — a mechanism unavailable to scatter-paged reads.  Cutting KV
*bytes* (FP8 cache, ``kv_cache_dtype=fp8``) remains the byte-side
lever.

GQA across heads runs as ONE block-diagonal matmul pair per iteration:
queries flatten to ``[QH, Dp]`` rows (row r = head r//G), keys/values to
``[PPI*KH*Bs, Dp]`` (column c = page c//(KH*Bs), head (c//Bs)%KH); an
additive head-match bias (precomputed once) kills the off-diagonal blocks
before the online softmax, and the zeroed probabilities make ``p @ V``
sum each row over its own head's values only.  The padding FLOPs keep
both matmuls MXU-shaped instead of ``KH`` separate [G, Dp] x [Dp, Bs]
slivers that would leave the kernel VPU-bound.

Cache write: when the stream reaches a sequence's LAST page it injects
the new token's K/V row into the fetched page in VMEM (a masked select —
Mosaic cannot DMA a single sublane row at a dynamic offset) and DMAs the
whole updated page back to HBM, so the write costs one extra aligned
page-store per sequence.  Programs/iterations run sequentially, and
distinct sequences never write the same page (shared prefix pages are
full and immutable; CoW is resolved before the step), so the in-place
update is race-free.

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


def _build_stream_schedule(block_tables, seq_lens, slot_mapping, *,
                           block_size: int, ppi: int, window: int,
                           vmax: int):
    """Precompute the stream kernel's per-virtual-iteration schedule as
    SMEM tables (traced XLA, vectorized over tiny [S]/[Vmax] arrays).

    The first stream kernel recomputed sequence/iteration bookkeeping —
    ceil-divisions, next-state selection, an 8-wide contiguity probe —
    on the scalar core inside every loop body; at ~1.1 us of DMA per
    iteration that serialized ~0.8 us of scalar work per iteration
    (measured 490 GB/s).  Here every decision is a table: row layout
    [s, base, npages, contig, b0, inject_jw, first, last, wb_page,
    seq_len, full] x (vmax + _NBUF) columns (pad columns so the
    _PREFETCH-deep lookahead prefetch needs no bounds check; pad columns
    have npages=0/contig=0 and issue nothing).  Returns
    (sched [11, vmax+_NBUF] i32, V [1] i32).
    """
    i32 = jnp.int32
    S, MB = block_tables.shape
    Bs = block_size
    sl_raw = seq_lens.astype(i32)
    # Padded lanes (garbage/zero lengths) are clamped to one page so the
    # schedule stays dense; their masks use the raw length and their
    # outputs are discarded by the caller.
    sl = jnp.clip(sl_raw, 1, MB * Bs)
    nb = (sl + Bs - 1) // Bs
    if window > 0:
        fb = jnp.maximum(sl - window, 0) // Bs
    else:
        fb = jnp.zeros_like(nb)
    ni = (nb - fb + ppi - 1) // ppi
    cum = jnp.cumsum(ni)
    V = cum[-1].astype(i32)
    v_idx = jnp.arange(vmax + _NBUF, dtype=i32)
    s_c = jnp.minimum(
        jnp.searchsorted(cum, v_idx, side="right").astype(i32), S - 1)
    it = v_idx - (cum[s_c] - ni[s_c])
    base = fb[s_c] + it * ppi
    live_v = v_idx < V
    npg = jnp.where(live_v, jnp.clip(nb[s_c] - base, 0, ppi), 0)
    steps = jnp.arange(ppi, dtype=i32)[None, :]
    idx = jnp.minimum(base[:, None] + steps, MB - 1)
    pages = block_tables[s_c[:, None], idx]  # [vmax+2, ppi]
    contig = (npg == ppi) & jnp.all(pages == pages[:, :1] + steps, axis=1)
    if os.environ.get("LTR_TPU_DECODE_CONTIG", "0") == "0":
        # Measured (v5e, 32x576): one fused ppi-page DMA sustains only
        # ~470 GB/s — a single DMA stream is engine-bound — while ppi
        # parallel per-page copies (distinct semaphores) spread across
        # DMA engines and reach ~670+ GB/s. Keep the per-page path; the
        # fused variant stays behind this env for future hardware.
        contig = jnp.zeros_like(contig)
    first = (it == 0) & live_v
    last = (it + 1 >= ni[s_c]) & live_v
    wblk = jnp.clip(jnp.maximum(sl_raw[s_c] - 1, 0) // Bs, 0, MB - 1)
    inject = ((slot_mapping[s_c] >= 0) & (base <= wblk)
              & (wblk < base + ppi) & live_v)
    # Interior (fully-valid) page groups skip the per-key liveness mask
    # in the kernel: every key in [base*Bs, (base+ppi)*Bs) is < seq_len
    # and (for windowed attention) >= seq_len - window, so the row's
    # head_bias alone is the correct mask (the softmax VPU chain is the
    # fp8 path's compute floor; round-3 roofline).
    full = live_v & (npg == ppi) & ((base + ppi) * Bs <= sl_raw[s_c])
    if window > 0:
        full &= base * Bs >= sl_raw[s_c] - window
    sched = jnp.stack([
        s_c, base, npg,
        contig.astype(i32), pages[:, 0],
        jnp.where(inject, wblk - base, -1),
        first.astype(i32),
        last.astype(i32),
        block_tables[s_c, wblk],
        sl_raw[s_c],
        full.astype(i32),
    ]).astype(i32)
    return sched, V.reshape(1)


def head_packed_default(cache_dtype) -> bool:
    """Default kernel-layout choice for GQA decode.

    The head-packed kernel's head-major landing splits each page-half
    DMA into KH strided segments: at bf16 those are 4 KiB runs and the
    KH-fold softmax saving nets +5-15% (measured 310-349 vs 295 GB/s at
    QH32/KH8); at fp8's 1 B/element they shrink to 2 KiB and the kernel
    goes DMA-issue-bound — measured 1.45x SLOWER than page-major at
    32x2048 fp8 (1988 vs 1374 us, in-process A/B).  So: head-packed for
    bf16 caches, page-major for fp8.  ``LTR_TPU_DECODE_HP=1/0`` forces
    either way (geometry gates — G > 1, no pad rows — still apply)."""
    hp_env = os.environ.get("LTR_TPU_DECODE_HP")
    if hp_env is not None:
        return hp_env != "0"
    return cache_dtype == jnp.bfloat16


# Stream buffer slots: _NBUF-1 page groups in flight at all times.
# LTR_TPU_DECODE_NBUF is read ONCE AT IMPORT (unlike LTR_TPU_DECODE_KEYS,
# which is read at trace time) — in-process A/Bs must use a fresh
# process per setting (the bench_kernels decode-sweep pattern).
# Measured under forced-fetch timing: deeper is worse (176 us NBUF=4 vs
# 212 us NBUF=6 at 440 chained calls, QH32/KH8 32x576) — keep 4.
_NBUF = max(3, int(os.environ.get("LTR_TPU_DECODE_NBUF", "4")))
_PREFETCH = _NBUF - 1


def _stream_decode_kernel(
    # scalar prefetch
    layer_ref,  # [1] i32 (SMEM)
    block_tables_ref,  # [S, MB] i32 (SMEM)
    slot_ref,  # [S] i32; -1 = padded lane (SMEM)
    sched_ref,  # [11, Vmax+NBUF] i32 (SMEM) — _build_stream_schedule
    vbound_ref,  # [1] i32: live virtual iterations
    # inputs
    q_ref,  # [S, Rp, Dp] VMEM (whole batch)
    kv_new_ref,  # [S, 2, KH, Dp] VMEM
    alibi_ref,  # [Rp, 128] f32 VMEM
    cache_hbm,  # [L, N+1, 2, KH, Bs, Dp] ANY (aliased with cache_out)
    # outputs
    cache_out,
    o_ref,  # [S, Rp, Dp] VMEM
    # scratch
    kv_buf,  # [NBUF, PPI, 2, KH, Bs, Dp]
    sems,  # [NBUF, PPI]
    wsem,  # [1]
    acc_ref,  # [Rp, Dp] f32
    m_ref,  # [Rp, 128] f32
    l_ref,  # [Rp, 128] f32
    scores_ref,  # [Rp, CK] f32 (mask-elision branch target)
    *,
    group: int,
    block_size: int,
    ppi: int,
    scale: float,
    kv_scale: float,
    window: int,
    use_alibi: bool,
):
    """Continuous-stream variant: ONE program walks a flattened
    (sequence, page-group) schedule for the whole batch.

    The grid=(S,) kernel above pays a fixed ~4 us per sequence (pipeline
    fill for the first page group + write-back drain + program epilogue)
    which caps effective bandwidth at ~450 GB/s for short-context decode
    (32 seqs x 576 ctx) — the cost the round-2 review flagged as the
    decode gap.  Here the page stream never drains between sequences:
    while iteration v computes, the DMAs for v+1 and v+2 — possibly the
    next sequence's — are already in flight (three buffer slots), so the
    fill bubble is paid once per *step* rather than once per *sequence*.
    All per-iteration decisions come from the precomputed SMEM schedule
    (see :func:`_build_stream_schedule`); the body is table lookups, DMA
    ops, and the online-softmax update in the cache's native dtype.
    The page write-back that injects the new token overlaps the next
    iteration's compute and is retired before its buffer slot can be
    refetched (top-of-body wait), preserving the grid kernel's
    race-freedom argument.
    """
    lid = layer_ref[0]
    Bs = block_size
    KH = kv_buf.shape[3]
    Dp = kv_buf.shape[-1]
    CK = ppi * KH * Bs

    def start_iter(buf_slot, vv):
        if os.environ.get("LTR_TPU_DECODE_ABLATE") == "compute":
            return  # tuning probe: no page fetches, math over stale VMEM
        contig = sched_ref[3, vv] > 0
        npg = sched_ref[2, vv]

        @pl.when(contig)
        def _():
            b0 = sched_ref[4, vv]
            pltpu.make_async_copy(cache_hbm.at[lid, pl.ds(b0, ppi)],
                                  kv_buf.at[buf_slot],
                                  sems.at[buf_slot, 0, 0]).start()

        @pl.when(~contig)
        def _():
            s = sched_ref[0, vv]
            base = sched_ref[1, vv]
            for j in range(ppi):

                @pl.when(j < npg)
                def _():
                    b = block_tables_ref[s, base + j]
                    # K and V halves move as separate copies: 2*ppi
                    # concurrent DMAs spread across the DMA engines (a
                    # single fused stream is engine-bound at ~470 GB/s).
                    for h in range(2):
                        pltpu.make_async_copy(
                            cache_hbm.at[lid, b, h],
                            kv_buf.at[buf_slot, j, h],
                            sems.at[buf_slot, j, h]).start()

                # Zero V of never-fetched tail pages (stale VMEM may be
                # NaN; 0 * NaN would poison p @ V despite the masked
                # probabilities).
                @pl.when(j >= npg)
                def _():
                    kv_buf[buf_slot, j,
                           1] = jnp.zeros_like(kv_buf[buf_slot, j, 1])

    def wait_iter(buf_slot, vv):
        if os.environ.get("LTR_TPU_DECODE_ABLATE") == "compute":
            return
        contig = sched_ref[3, vv] > 0

        @pl.when(contig)
        def _():
            b0 = sched_ref[4, vv]
            pltpu.make_async_copy(cache_hbm.at[lid, pl.ds(b0, ppi)],
                                  kv_buf.at[buf_slot],
                                  sems.at[buf_slot, 0, 0]).wait()

        @pl.when(~contig)
        def _():
            s = sched_ref[0, vv]
            base = sched_ref[1, vv]
            npg = sched_ref[2, vv]
            for j in range(ppi):

                @pl.when(j < npg)
                def _():
                    b = block_tables_ref[s, base + j]
                    for h in range(2):
                        pltpu.make_async_copy(
                            cache_hbm.at[lid, b, h],
                            kv_buf.at[buf_slot, j, h],
                            sems.at[buf_slot, j, h]).wait()

    V = vbound_ref[0]

    # Geometry-only masks, hoisted out of the stream loop.
    Rp = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (Rp, CK), 1)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (Rp, CK), 0) // group
    col_head = jax.lax.rem(col // Bs, jnp.int32(KH))
    head_bias = jnp.where(row_head == col_head, 0.0, NEG_INF)  # [Rp, CK]
    col_pos = (col // (KH * Bs)) * Bs + jax.lax.rem(col, jnp.int32(Bs))
    if use_alibi:
        slopes = alibi_ref[:, 0:1]  # [Rp, 1]

    # Fill the pipeline _PREFETCH groups deep (pad schedule columns are
    # no-ops).
    for _pf in range(_PREFETCH):
        start_iter(_pf, _pf)

    def body(v, carry):
        wb_pend, wb_slot, wb_j, wb_b = carry
        slot_i = jax.lax.rem(v, _NBUF)

        # Retire the outstanding page write-back before anything can
        # overwrite its buffer slot (the lookahead prefetch reaches that
        # slot one iteration after the write-back was issued).
        @pl.when(wb_pend > 0)
        def _():
            pltpu.make_async_copy(kv_buf.at[wb_slot, wb_j],
                                  cache_out.at[lid, wb_b], wsem.at[0]).wait()

        start_iter(jax.lax.rem(v + _PREFETCH, _NBUF), v + _PREFETCH)
        wait_iter(slot_i, v)

        s = sched_ref[0, v]
        base = sched_ref[1, v]
        jw = sched_ref[5, v]
        sl = sched_ref[9, v]

        @pl.when(sched_ref[6, v] > 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        # Inject the new token's K/V row and write its page back.
        writes = jw >= 0
        jw_c = jnp.clip(jw, 0, ppi - 1)
        wb = sched_ref[8, v]

        @pl.when(writes)
        def _():
            write_off = jax.lax.rem(jnp.maximum(slot_ref[s], 0), Bs)
            off_eq = jax.lax.broadcasted_iota(
                jnp.int32, kv_buf.shape[3:], 1) == write_off  # [KH, Bs, Dp]
            knew = kv_new_ref[s, 0]  # [KH, Dp]
            vnew = kv_new_ref[s, 1]
            kv_buf[slot_i, jw_c, 0] = jnp.where(off_eq, knew[:, None, :],
                                                kv_buf[slot_i, jw_c, 0])
            kv_buf[slot_i, jw_c, 1] = jnp.where(off_eq, vnew[:, None, :],
                                                kv_buf[slot_i, jw_c, 1])
            pltpu.make_async_copy(kv_buf.at[slot_i, jw_c],
                                  cache_out.at[lid, wb], wsem.at[0]).start()

        wb_pend2 = jnp.where(writes, jnp.int32(1), jnp.int32(0))
        wb_slot2 = jnp.where(writes, slot_i, wb_slot)
        wb_j2 = jnp.where(writes, jw_c, wb_j)
        wb_b2 = jnp.where(writes, wb, wb_b)

        if os.environ.get("LTR_TPU_DECODE_ABLATE") == "dma":
            # Tuning probe: DMA/bookkeeping only, no attention math.
            return (wb_pend2, wb_slot2, wb_j2, wb_b2)

        # Matmuls run in the cache's native dtype (bf16 in serving): the
        # MXU takes bf16 operands with f32 accumulation — the same
        # numerics as the XLA reference's einsum over bf16 pages.
        # kv_scale folds linearly: into q for the scores (q.(s*k) =
        # (s*q).k) and into the epilogue for V (p@(s*v) = s*(p@v)).
        cd = jnp.float32 if kv_buf.dtype == jnp.float32 else jnp.bfloat16
        q = (q_ref[s].astype(jnp.float32) * (scale * kv_scale)).astype(
            cd)  # [Rp, Dp]
        k = kv_buf[slot_i, :, 0].reshape(CK, Dp).astype(cd)
        v_vals = kv_buf[slot_i, :, 1].reshape(CK, Dp).astype(cd)

        scores = jax.lax.dot_general(
            q, k, (((1, ), (1, )), ((), ())),
            preferred_element_type=jnp.float32)  # [Rp, CK]

        if use_alibi:
            key_pos = base * Bs + col_pos
            scores = scores - slopes * (sl - 1 - key_pos).astype(jnp.float32)

        # Interior (fully-valid) groups skip the per-key liveness mask —
        # the head bias alone is correct there (schedule row 10); the VPU
        # softmax chain is the fp8 path's compute floor.
        @pl.when(sched_ref[10, v] > 0)
        def _():
            scores_ref[...] = scores + head_bias

        @pl.when(sched_ref[10, v] == 0)
        def _():
            if not use_alibi:
                kp = base * Bs + col_pos
            else:
                kp = key_pos
            live = kp < sl
            if window > 0:
                live &= kp >= sl - window
            scores_ref[...] = jnp.where(live, scores + head_bias, NEG_INF)

        scores = scores_ref[...]
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_new = jnp.maximum(
            jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True)),
            -1e20)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(cd), v_vals, (((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)  # [Rp, Dp]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

        @pl.when(sched_ref[7, v] > 0)
        def _():
            l = jnp.maximum(l_ref[:, 0:1], 1e-9)
            o_ref[s] = (acc_ref[...] * kv_scale / l).astype(o_ref.dtype)

        return (wb_pend2, wb_slot2, wb_j2, wb_b2)

    z = jnp.int32(0)
    wb_pend, wb_slot, wb_j, wb_b = jax.lax.fori_loop(
        0, V, body, (z, z, z, z))

    # Drain the final write-back before the program (and its scratch) dies.
    @pl.when(wb_pend > 0)
    def _():
        pltpu.make_async_copy(kv_buf.at[wb_slot, wb_j],
                              cache_out.at[lid, wb_b], wsem.at[0]).wait()


def _stream_decode_kernel_hp(
    # scalar prefetch
    layer_ref,  # [1] i32 (SMEM)
    block_tables_ref,  # [S, MB] i32 (SMEM)
    slot_ref,  # [S] i32; -1 = padded lane (SMEM)
    sched_ref,  # [11, Vmax+NBUF] i32 (SMEM)
    vbound_ref,  # [1] i32
    # inputs
    q_ref,  # [S, Rp, Dp] VMEM
    kv_new_ref,  # [S, 2, KH, Dp] VMEM
    alibi_ref,  # [Rp, 128] f32 VMEM
    cache_hbm,  # [L, N+1, 2, KH, Bs, Dp] ANY (aliased)
    # outputs
    cache_out,
    o_ref,  # [S, Rp, Dp] VMEM
    # scratch
    kv_buf,  # [NBUF, 2, KH, PPI, Bs, Dp]  <-- HEAD-MAJOR
    sems,  # [NBUF, PPI, 2]
    wsem,  # [2]
    acc_ref,  # [Rp, Dp] f32
    m_ref,  # [Rp, 128] f32
    l_ref,  # [Rp, 128] f32
    scores_ref,  # [Rp, PPI*Bs] f32
    *,
    group: int,
    block_size: int,
    ppi: int,
    scale: float,
    kv_scale: float,
    window: int,
    use_alibi: bool,
):
    """Head-packed GQA variant of :func:`_stream_decode_kernel`.

    The page-major kernel computes a [Rp, PPI*KH*Bs] score matrix whose
    cross-head blocks — (KH-1)/KH of it — are masked to -inf and still
    pay the full softmax VPU chain (max/exp/sum over every masked lane);
    at QH32/KH8 that is 7/8 wasted VPU work, the measured reason the 8B
    GQA shape ran at ~320 GB/s effective and fp8 narrowed to 1.28x at
    long context (docs/BENCHMARKS.md round-4 attribution).  Here the
    per-page DMAs land each page's K/V **transposed into a head-major
    VMEM buffer** ([2, KH, PPI, Bs, Dp]; destination strided over KH —
    the DMA engine pays the stride, not the VPU), so scores become a
    KH-batched [G, Dp] x [Dp, PPI*Bs] dot whose [KH, G, PPI*Bs] output
    reshapes (leading-dim merge, layout-free) to [Rp, PPI*Bs] — the
    softmax runs on KH-fold fewer lanes with NO head-match bias at all,
    and p @ V batches back the same way.  MXU pass count is unchanged
    (pass count = weight-tile count, M-independent); the win is the VPU
    chain and the mask traffic.  Requires Rp == KH*G (no pad rows) and
    G > 1 (MHA keeps the page-major kernel)."""
    lid = layer_ref[0]
    Bs = block_size
    KH = kv_buf.shape[2]
    Dp = kv_buf.shape[-1]
    CKh = ppi * Bs  # keys per head per iteration
    Rp = q_ref.shape[1]
    G = group

    def start_iter(buf_slot, vv):
        s = sched_ref[0, vv]
        base = sched_ref[1, vv]
        npg = sched_ref[2, vv]
        for j in range(ppi):

            @pl.when(j < npg)
            def _():
                b = block_tables_ref[s, base + j]
                for h in range(2):
                    # Head-major landing: [KH, Bs, Dp] page half ->
                    # kv_buf[slot, h, :, j] (stride PPI*Bs*Dp over KH).
                    pltpu.make_async_copy(
                        cache_hbm.at[lid, b, h],
                        kv_buf.at[buf_slot, h, :, j],
                        sems.at[buf_slot, j, h]).start()

            @pl.when(j >= npg)
            def _():
                kv_buf[buf_slot, 1, :,
                       j] = jnp.zeros_like(kv_buf[buf_slot, 1, :, j])

    def wait_iter(buf_slot, vv):
        s = sched_ref[0, vv]
        base = sched_ref[1, vv]
        npg = sched_ref[2, vv]
        for j in range(ppi):

            @pl.when(j < npg)
            def _():
                b = block_tables_ref[s, base + j]
                for h in range(2):
                    pltpu.make_async_copy(
                        cache_hbm.at[lid, b, h],
                        kv_buf.at[buf_slot, h, :, j],
                        sems.at[buf_slot, j, h]).wait()

    V = vbound_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, CKh), 1)  # [1, CKh]
    col_pos = (col // Bs) * Bs + jax.lax.rem(col, jnp.int32(Bs))
    if use_alibi:
        slopes = alibi_ref[:, 0:1]  # [Rp, 1]

    for _pf in range(_PREFETCH):
        start_iter(_pf, _pf)

    def body(v, carry):
        wb_pend, wb_slot, wb_j, wb_b = carry
        slot_i = jax.lax.rem(v, _NBUF)

        @pl.when(wb_pend > 0)
        def _():
            for h in range(2):
                pltpu.make_async_copy(kv_buf.at[wb_slot, h, :, wb_j],
                                      cache_out.at[lid, wb_b, h],
                                      wsem.at[h]).wait()

        start_iter(jax.lax.rem(v + _PREFETCH, _NBUF), v + _PREFETCH)
        wait_iter(slot_i, v)

        s = sched_ref[0, v]
        base = sched_ref[1, v]
        jw = sched_ref[5, v]
        sl = sched_ref[9, v]

        @pl.when(sched_ref[6, v] > 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        writes = jw >= 0
        jw_c = jnp.clip(jw, 0, ppi - 1)
        wb = sched_ref[8, v]

        @pl.when(writes)
        def _():
            write_off = jax.lax.rem(jnp.maximum(slot_ref[s], 0), Bs)
            off_eq = jax.lax.broadcasted_iota(
                jnp.int32, (KH, Bs, Dp), 1) == write_off
            knew = kv_new_ref[s, 0]  # [KH, Dp]
            vnew = kv_new_ref[s, 1]
            kv_buf[slot_i, 0, :, jw_c] = jnp.where(
                off_eq, knew[:, None, :], kv_buf[slot_i, 0, :, jw_c])
            kv_buf[slot_i, 1, :, jw_c] = jnp.where(
                off_eq, vnew[:, None, :], kv_buf[slot_i, 1, :, jw_c])
            for h in range(2):
                pltpu.make_async_copy(kv_buf.at[slot_i, h, :, jw_c],
                                      cache_out.at[lid, wb, h],
                                      wsem.at[h]).start()

        wb_pend2 = jnp.where(writes, jnp.int32(1), jnp.int32(0))
        wb_slot2 = jnp.where(writes, slot_i, wb_slot)
        wb_j2 = jnp.where(writes, jw_c, wb_j)
        wb_b2 = jnp.where(writes, wb, wb_b)

        if os.environ.get("LTR_TPU_DECODE_ABLATE") == "dma":
            return (wb_pend2, wb_slot2, wb_j2, wb_b2)

        cd = jnp.float32 if kv_buf.dtype == jnp.float32 else jnp.bfloat16
        q = (q_ref[s].astype(jnp.float32) * (scale * kv_scale)).astype(cd)
        qh = q.reshape(KH, G, Dp)
        k = kv_buf[slot_i, 0].reshape(KH, CKh, Dp).astype(cd)
        v_vals = kv_buf[slot_i, 1].reshape(KH, CKh, Dp).astype(cd)

        scores3 = jax.lax.dot_general(
            qh, k, (((2, ), (2, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)  # [KH, G, CKh]
        scores = scores3.reshape(Rp, CKh)

        if use_alibi:
            key_pos = base * Bs + col_pos  # [1, CKh]
            scores = scores - slopes * (sl - 1 - key_pos).astype(
                jnp.float32)

        @pl.when(sched_ref[10, v] > 0)
        def _():
            scores_ref[...] = scores  # interior group: no mask at all

        @pl.when(sched_ref[10, v] == 0)
        def _():
            kp = base * Bs + col_pos
            live = kp < sl
            if window > 0:
                live &= kp >= sl - window
            scores_ref[...] = jnp.where(live, scores, NEG_INF)

        scores = scores_ref[...]
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_new = jnp.maximum(
            jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True)),
            -1e20)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape)
        pv3 = jax.lax.dot_general(
            p.reshape(KH, G, CKh).astype(cd), v_vals,
            (((2, ), (1, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)  # [KH, G, Dp]
        acc_ref[...] = acc_ref[...] * alpha + pv3.reshape(Rp, Dp)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

        @pl.when(sched_ref[7, v] > 0)
        def _():
            l = jnp.maximum(l_ref[:, 0:1], 1e-9)
            o_ref[s] = (acc_ref[...] * kv_scale / l).astype(o_ref.dtype)

        return (wb_pend2, wb_slot2, wb_j2, wb_b2)

    z = jnp.int32(0)
    wb_pend, wb_slot, wb_j, wb_b = jax.lax.fori_loop(
        0, V, body, (z, z, z, z))

    @pl.when(wb_pend > 0)
    def _():
        for h in range(2):
            pltpu.make_async_copy(kv_buf.at[wb_slot, h, :, wb_j],
                                  cache_out.at[lid, wb_b, h],
                                  wsem.at[h]).wait()


@functools.partial(
    jax.jit,
    donate_argnums=(2, ),
    static_argnames=("scale", "kv_scale", "window", "interpret",
                     "head_packed"))
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
    head_packed: Optional[bool] = None,  # None = env/geometry default
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

    layer_arr = jnp.asarray(layer_id, jnp.int32).reshape(1)
    common = dict(group=G,
                  block_size=Bs,
                  ppi=ppi,
                  scale=scale,
                  kv_scale=kv_scale,
                  window=window,
                  use_alibi=alibi is not None)

    if os.environ.get("LTR_TPU_DECODE_STREAM", "1") != "0":
        # Continuous-stream kernel (default): one program, whole batch,
        # schedule precomputed as SMEM tables (vectorized XLA prework).
        MB = block_tables.shape[1]
        vmax = S * -(-MB // ppi)
        sched, vbound = _build_stream_schedule(block_tables, seq_lens,
                                               slot_mapping,
                                               block_size=Bs, ppi=ppi,
                                               window=window, vmax=vmax)
        # Head-packed GQA kernel: KH-fold less softmax VPU work, no
        # head-bias mask; needs real grouping and exact row packing.
        if head_packed is None:
            head_packed = head_packed_default(kv_cache.dtype)
        head_packed = head_packed and G > 1 and Rp == QH
        if head_packed:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(1, ),
                in_specs=[
                    pl.BlockSpec((S, Rp, Dp), lambda *_: (0, 0, 0)),
                    pl.BlockSpec((S, 2, KH, Dp), lambda *_: (0, 0, 0, 0)),
                    pl.BlockSpec((Rp, 128), lambda *_: (0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((S, Rp, Dp), lambda *_: (0, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((_NBUF, 2, KH, ppi, Bs, Dp),
                               kv_cache.dtype),
                    pltpu.SemaphoreType.DMA((_NBUF, ppi, 2)),
                    pltpu.SemaphoreType.DMA((2, )),
                    pltpu.VMEM((Rp, Dp), jnp.float32),
                    pltpu.VMEM((Rp, 128), jnp.float32),
                    pltpu.VMEM((Rp, 128), jnp.float32),
                    pltpu.VMEM((Rp, ppi * Bs), jnp.float32),
                ],
            )
            kernel = functools.partial(_stream_decode_kernel_hp, **common)
            new_cache, out = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
                    jax.ShapeDtypeStruct((S, Rp, Dp), q.dtype),
                ],
                input_output_aliases={8: 0},
                interpret=interpret,
            )(layer_arr, block_tables, slot_mapping, sched, vbound, qf,
              kv_new, slopes, kv_cache)
            return out[:, :QH, :D].reshape(S, QH, D), new_cache
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(1, ),
            in_specs=[
                pl.BlockSpec((S, Rp, Dp), lambda *_: (0, 0, 0)),
                pl.BlockSpec((S, 2, KH, Dp), lambda *_: (0, 0, 0, 0)),
                pl.BlockSpec((Rp, 128), lambda *_: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((S, Rp, Dp), lambda *_: (0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((_NBUF, ppi, 2, KH, Bs, Dp), kv_cache.dtype),
                pltpu.SemaphoreType.DMA((_NBUF, ppi, 2)),
                pltpu.SemaphoreType.DMA((1, )),
                pltpu.VMEM((Rp, Dp), jnp.float32),
                pltpu.VMEM((Rp, 128), jnp.float32),
                pltpu.VMEM((Rp, 128), jnp.float32),
                pltpu.VMEM((Rp, ppi * KH * Bs), jnp.float32),
            ],
        )
        kernel = functools.partial(_stream_decode_kernel, **common)
        new_cache, out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
                jax.ShapeDtypeStruct((S, Rp, Dp), q.dtype),
            ],
            # scalar-prefetch args shift input indices by 5: cache is 8.
            input_output_aliases={8: 0},
            interpret=interpret,
        )(layer_arr, block_tables, slot_mapping, sched, vbound, qf,
          kv_new, slopes, kv_cache)
        return out[:, :QH, :D].reshape(S, QH, D), new_cache

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
    kernel = functools.partial(_fused_decode_kernel, **common)
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
