"""Paged attention over a flattened (mixed prefill/decode) token batch.

TPU-native counterpart of the reference attention stack
(``vllm/attention/ops/paged_attn.py`` + ``csrc/attention/attention_kernels.cu``
paged-attention v1/v2 + flash-attn prefill): one unified formulation that
serves chunked prefill, full prefill, and decode in a single jitted step:

1. the step's new K/V are scattered into the paged cache first
   (ops/kv_cache.write_kv),
2. every query token then attends over its sequence's cached pages with a
   causal mask on absolute positions.

This file holds the XLA reference implementation (gather + masked softmax),
used for CPU tests and correctness baselines. The Pallas decode kernel in
``ops/pallas/paged_attention.py`` is the production fast path; both share
this interface.

Shapes:
  q:            [T, QH, D]   flattened new tokens (padded to bucket)
  kv_cache:     [2, KH, N+1, Bs, D] one layer's cache (KV already written)
  block_tables: [S, MB]     physical block numbers per sequence
  token_seq:    [T]         sequence row (0..S-1) of each token; -1 padding
  token_pos:    [T]         absolute position of each token in its sequence
  seq_lens:     [S]         context length per sequence AFTER this step
Returns:        [T, QH, D]
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def alibi_slopes(num_heads: int) -> jax.Array:
    """Standard ALiBi head slopes (power-of-two geometric ladder with the
    interleaved extension for non-power-of-two head counts)."""
    import math
    n = 2**math.floor(math.log2(num_heads))
    base = 2.0**(-8.0 / n)
    slopes = [base**(i + 1) for i in range(n)]
    if n < num_heads:
        extra_base = 2.0**(-4.0 / n)
        extra = [extra_base**(2 * i + 1) for i in range(num_heads - n)]
        slopes.extend(extra)
    return jnp.asarray(slopes[:num_heads], jnp.float32)


def paged_attention_reference(
    q: jax.Array,
    layer_cache: jax.Array,
    block_tables: jax.Array,
    token_seq: jax.Array,
    token_pos: jax.Array,
    seq_lens: jax.Array,
    scale: float,
    sliding_window: Optional[int] = None,
    kv_scale: float = 1.0,
    alibi: Optional[jax.Array] = None,
) -> jax.Array:
    T, QH, D = q.shape
    _, KH, num_blocks_p1, block_size, Dp = layer_cache.shape
    S, MB = block_tables.shape
    group = QH // KH  # GQA group size

    # Gather each sequence's pages (the cache head dim may be lane-padded).
    # The compute dtype is the query dtype; FP8 caches are upcast here
    # (fused by XLA).
    k_pages = layer_cache[0][:, block_tables, :, :D]  # [KH, S, MB, Bs, D]
    v_pages = layer_cache[1][:, block_tables, :, :D]
    ctx = MB * block_size
    k = (k_pages.transpose(1, 2, 3, 0, 4).reshape(S, ctx, KH, D).astype(
        q.dtype) * kv_scale)
    v = (v_pages.transpose(1, 2, 3, 0, 4).reshape(S, ctx, KH, D).astype(
        q.dtype) * kv_scale)

    # Per-token gather of its sequence's K/V: [T, ctx, KH, D].
    safe_seq = jnp.maximum(token_seq, 0)
    k_t = k[safe_seq]
    v_t = v[safe_seq]

    # Scores: [T, QH, ctx] with GQA head mapping.
    qh = q.reshape(T, KH, group, D)
    scores = jnp.einsum("tkgd,tckd->tkgc", qh, k_t,
                        preferred_element_type=jnp.float32) * scale

    # Causal mask on absolute positions: key position <= query position,
    # and key position < seq_len (live context only).
    key_pos = jax.lax.broadcasted_iota(jnp.int32, (T, ctx), 1)
    valid = key_pos <= token_pos[:, None]
    valid &= key_pos < seq_lens[safe_seq][:, None]
    if sliding_window is not None:
        valid &= key_pos > (token_pos[:, None] - sliding_window)
    if alibi is not None:
        # ALiBi: scores get -slope * distance (per query head).
        dist = (token_pos[:, None] - key_pos).astype(jnp.float32)  # [T, ctx]
        bias = -alibi.reshape(1, KH, group, 1) * dist[:, None, None, :]
        scores = scores + bias
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("tkgc,tckd->tkgd", probs.astype(q.dtype), v_t)
    return out.reshape(T, QH, D)


def paged_attention_prefill(
    q: jax.Array,
    layer_cache: jax.Array,
    block_tables: jax.Array,
    token_seq: jax.Array,
    token_pos: jax.Array,
    seq_lens: jax.Array,
    scale: float,
    sliding_window: Optional[int] = None,
    kv_scale: float = 1.0,
    tile: Optional[int] = None,
    alibi: Optional[jax.Array] = None,
) -> jax.Array:
    """Prefill/mixed-batch dispatcher: the Pallas chunked-prefill (flash)
    kernel on TPU when the flat layout is tile-aligned (``tile`` set by the
    batch packer), else the XLA gather reference. ALiBi models always take
    the reference path (the kernels do not carry the bias yet)."""
    import os
    T = q.shape[0]
    use_pallas = (jax.default_backend() == "tpu" and tile is not None
                  and alibi is None
                  and T % tile == 0 and T >= tile
                  and os.environ.get("LTR_TPU_DISABLE_PALLAS", "0") != "1")
    if use_pallas:
        from vllm_ltr_tpu.ops.pallas.prefill_attention import (
            paged_prefill_attention_pallas)
        return paged_prefill_attention_pallas(
            q, layer_cache, block_tables, token_seq, token_pos, seq_lens,
            tile=tile, block_size=layer_cache.shape[3], scale=scale,
            kv_scale=kv_scale, window=sliding_window)
    return paged_attention_reference(q, layer_cache, block_tables, token_seq,
                                     token_pos, seq_lens, scale,
                                     sliding_window=sliding_window,
                                     kv_scale=kv_scale, alibi=alibi)


def paged_attention_decode_reference(
    q: jax.Array,
    layer_cache: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    scale: float,
    kv_scale: float = 1.0,
    sliding_window: Optional[int] = None,
    alibi: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode-only variant: one query per sequence.

    q: [S, QH, D]; returns [S, QH, D]. Equivalent to the reference's
    paged_attention v1/v2 decode kernels (csrc attention_kernels.cu).
    """
    S, QH, D = q.shape
    token_seq = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0).squeeze(-1)
    token_pos = jnp.maximum(seq_lens - 1, 0)
    return paged_attention_reference(q, layer_cache, block_tables, token_seq,
                                     token_pos, seq_lens, scale,
                                     sliding_window=sliding_window,
                                     kv_scale=kv_scale, alibi=alibi)


def paged_attention_decode(
    q: jax.Array,
    layer_cache: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    scale: float,
    kv_scale: float = 1.0,
    sliding_window: Optional[int] = None,
    alibi: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode-path dispatcher: the Pallas streaming kernel on TPU, the XLA
    reference elsewhere (or when a feature the kernel lacks is needed)."""
    import os
    use_pallas = (jax.default_backend() == "tpu" and alibi is None
                  and os.environ.get("LTR_TPU_DISABLE_PALLAS", "0") != "1")
    if use_pallas:
        from vllm_ltr_tpu.ops.pallas.paged_attention import (
            paged_attention_decode_pallas)
        block_size = layer_cache.shape[3]
        return paged_attention_decode_pallas(q,
                                             layer_cache,
                                             block_tables,
                                             seq_lens,
                                             block_size=block_size,
                                             scale=scale,
                                             kv_scale=kv_scale,
                                             window=sliding_window or 0)
    return paged_attention_decode_reference(q, layer_cache, block_tables,
                                            seq_lens, scale,
                                            kv_scale=kv_scale,
                                            sliding_window=sliding_window,
                                            alibi=alibi)
