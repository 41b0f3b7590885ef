"""Paged attention over a flattened (mixed prefill/decode) token batch.

TPU-native counterpart of the reference attention stack
(``vllm/attention/ops/paged_attn.py`` + ``csrc/attention/attention_kernels.cu``
paged-attention v1/v2 + flash-attn prefill + ``csrc/cache_kernels.cu``
reshape_and_cache): one entry point, :func:`attend`, that writes the step's
new K/V into the paged cache and attends over it, dispatching to

* the fused Pallas decode kernel (``ops/pallas/fused_decode.py``) on TPU —
  write + attention in one kernel, cache updated in place;
* the Pallas chunked-prefill kernel (``ops/pallas/prefill_attention.py``)
  on TPU for tile-aligned prefill batches;
* the XLA gather reference below everywhere else (CPU tests, odd shapes).

The cache is the full stacked array ``[L, N+1, 2, KH, Bs, Dp]`` (see
ops/kv_cache.py) addressed at a CONSTANT layer index from the model's
unrolled layer loop, so XLA aliases every update into the donated buffer.

Shapes:
  q, k, v:      [T, H, D]     flattened new tokens (padded to bucket)
  kv_cache:     [L, N+1, 2, KH, Bs, D]
  block_tables: [S, MB]       physical block numbers per sequence
  token_seq:    [T]           sequence row (0..S-1) of each token; -1 pad
  token_pos:    [T]           absolute position of each token
  seq_lens:     [S]           context length per sequence AFTER this step
Returns:        ([T, QH, D], updated cache)
"""
from __future__ import annotations

from typing import Optional, Tuple

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


def _pallas_mode() -> Optional[bool]:
    """See :func:`vllm_ltr_tpu.ops.pallas_mode` (shared with the quantized
    matmul dispatchers)."""
    from vllm_ltr_tpu.ops import pallas_mode
    return pallas_mode()


def _pallas_enabled() -> bool:
    return _pallas_mode() is not None


def _tp_mesh(num_q_heads: int, num_kv_heads: int):
    """The mesh to shard the attention kernels over, or None when the
    model axis is trivial / the head counts don't divide (fall back to the
    GSPMD-partitioned XLA path).

    A bare ``pallas_call`` is a custom call GSPMD cannot partition: on a
    TP>1 slice it would replicate the head-sharded KV cache per step.
    ``jax.shard_map`` over the ``model`` axis runs the unchanged per-device
    kernel body on each shard's kv-heads instead — the counterpart of the
    reference's per-rank CUDA kernels under Megatron TP
    (vllm/worker/model_runner.py:827, distributed/parallel_state.py:80)."""
    from vllm_ltr_tpu.parallel.mesh import MODEL_AXIS, get_global_mesh
    mesh = get_global_mesh()
    tp = mesh.shape.get(MODEL_AXIS, 1)
    if tp <= 1 or num_q_heads % tp or num_kv_heads % tp:
        return None
    return mesh


def attend(
    kv_cache: jax.Array,
    layer: int,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    meta,
    scale: float,
    *,
    decode_mode: bool = False,
    sliding_window: Optional[int] = None,
    kv_scale=1.0,
    alibi: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Write this step's K/V for ``layer`` and attend over the paged cache.

    ``kv_scale`` (scalar, possibly traced) is the FP8 quantization scale:
    the cache stores ``x / kv_scale``; dequantization folds into the query
    and output (linearity), so the kernels never see a traced scale.
    Returns (attention output, updated cache).
    """
    is_unit_scale = isinstance(kv_scale, float) and kv_scale == 1.0
    if not is_unit_scale:
        k = k / kv_scale
        v = v / kv_scale
        q = q * kv_scale

    mode = _pallas_mode()
    if decode_mode and mode is not None:
        from vllm_ltr_tpu.ops.pallas.fused_decode import (
            fused_decode_attention)
        Dp = kv_cache.shape[-1]
        kv_new = jnp.stack([k, v], axis=1)  # [S, 2, KH, D]
        if kv_new.shape[-1] < Dp:
            kv_new = jnp.pad(kv_new, ((0, 0), (0, 0), (0, 0),
                                      (0, Dp - kv_new.shape[-1])))
        kv_new = kv_new.astype(kv_cache.dtype)
        mesh = _tp_mesh(q.shape[1], kv_cache.shape[3])
        if mesh is None:
            out, kv_cache = fused_decode_attention(
                q, kv_new, kv_cache,
                jnp.int32(layer), meta.block_tables, meta.seq_lens,
                meta.slot_mapping, scale=scale,
                window=sliding_window or 0, alibi=alibi, interpret=mode)
        else:
            out, kv_cache = _sharded_fused_decode(
                mesh, q, kv_new, kv_cache, layer, meta, scale,
                sliding_window or 0, alibi, mode)
    else:
        from vllm_ltr_tpu.ops.kv_cache import write_kv, write_kv_pages
        if meta.page_dst is not None:
            kv_cache = write_kv_pages(kv_cache, layer, k, v, meta.page_dst)
        else:
            kv_cache = write_kv(kv_cache, layer, k, v, meta.slot_mapping)
        if decode_mode:
            out = paged_attention_decode_reference(
                q, kv_cache, layer, meta.block_tables, meta.seq_lens, scale,
                sliding_window=sliding_window, alibi=alibi)
        else:
            out = _prefill_dispatch(q, kv_cache, layer, meta, scale,
                                    sliding_window=sliding_window,
                                    alibi=alibi)

    if not is_unit_scale:
        out = out * kv_scale
    return out, kv_cache


def _sharded_fused_decode(mesh, q, kv_new, kv_cache, layer, meta, scale,
                          window, alibi, interpret):
    """Fused decode kernel under shard_map over the ``model`` axis: each
    device runs the unchanged kernel on its kv-head shard of the cache and
    updates it in place; q/kv_new/outputs shard over heads, metadata
    replicates. The ``data`` axis (if any) stays auto — batch arrays are
    replicated in this engine, so every data replica performs identical
    updates (parallel/mesh.py ShardingLayout contract)."""
    from vllm_ltr_tpu.parallel.mesh import MODEL_AXIS
    from vllm_ltr_tpu.ops.pallas.fused_decode import fused_decode_attention
    from jax.sharding import PartitionSpec as P
    use_alibi = alibi is not None
    lid = jnp.int32(layer)

    def inner(q_s, kv_new_s, cache_s, bt, sl, sm, al):
        return fused_decode_attention(
            q_s, kv_new_s, cache_s, lid, bt, sl, sm, scale=scale,
            window=window, alibi=al if use_alibi else None,
            interpret=interpret)

    al_arr = (alibi.astype(jnp.float32) if use_alibi else
              jnp.zeros((q.shape[1], ), jnp.float32))
    heads = P(None, MODEL_AXIS, None)
    cache_spec = P(None, None, None, MODEL_AXIS, None, None)
    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(heads, P(None, None, MODEL_AXIS, None), cache_spec,
                  P(None, None), P(None), P(None), P(MODEL_AXIS)),
        out_specs=(heads, cache_spec),
        check_vma=False)
    return fn(q, kv_new, kv_cache, meta.block_tables, meta.seq_lens,
              meta.slot_mapping, al_arr)


def _sharded_prefill(mesh, q, kv_cache, layer, meta, scale, tile, window,
                     alibi, interpret):
    """Chunked-prefill kernel under shard_map over the ``model`` axis
    (same contract as :func:`_sharded_fused_decode`; the cache was already
    written by the GSPMD-partitioned ``write_kv`` scatter)."""
    from vllm_ltr_tpu.parallel.mesh import MODEL_AXIS
    from vllm_ltr_tpu.ops.pallas.prefill_attention import (
        paged_prefill_attention_pallas)
    from jax.sharding import PartitionSpec as P
    use_alibi = alibi is not None
    lid = jnp.int32(layer)
    block_size = kv_cache.shape[-2]

    def inner(q_s, cache_s, bt, tseq, tpos, sl, al):
        return paged_prefill_attention_pallas(
            q_s, cache_s, lid, bt, tseq, tpos, sl, tile=tile,
            block_size=block_size, scale=scale, window=window,
            alibi=al if use_alibi else None, interpret=interpret)

    al_arr = (alibi.astype(jnp.float32) if use_alibi else
              jnp.zeros((q.shape[1], ), jnp.float32))
    heads = P(None, MODEL_AXIS, None)
    cache_spec = P(None, None, None, MODEL_AXIS, None, None)
    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(heads, cache_spec, P(None, None), P(None), P(None),
                  P(None), P(MODEL_AXIS)),
        out_specs=heads,
        check_vma=False)
    return fn(q, kv_cache, meta.block_tables, meta.token_seq,
              meta.token_pos, meta.seq_lens, al_arr)


def _prefill_dispatch(q, kv_cache, layer, meta, scale, *,
                      sliding_window=None, alibi=None):
    """Prefill/mixed-batch: the Pallas chunked-prefill (flash) kernel on TPU
    when the flat layout is tile-aligned (``meta.prefill_tile`` set by the
    batch packer), else the XLA gather reference. ALiBi rides the kernel
    for MHA models (every ALiBi arch in the zoo: BLOOM, MPT, Jais,
    Baichuan-13B); a hypothetical ALiBi+GQA arch would fall back."""
    tile = meta.prefill_tile
    T = q.shape[0]
    mode = _pallas_mode()
    alibi_ok = alibi is None or q.shape[1] == kv_cache.shape[3]
    use_pallas = (mode is not None and tile is not None and alibi_ok
                  and T % tile == 0 and T >= tile)
    if use_pallas:
        mesh = _tp_mesh(q.shape[1], kv_cache.shape[3])
        if mesh is not None:
            return _sharded_prefill(mesh, q, kv_cache, layer, meta, scale,
                                    tile, sliding_window, alibi, mode)
        from vllm_ltr_tpu.ops.pallas.prefill_attention import (
            paged_prefill_attention_pallas)
        return paged_prefill_attention_pallas(
            q, kv_cache, jnp.int32(layer), meta.block_tables, meta.token_seq,
            meta.token_pos, meta.seq_lens, tile=tile,
            block_size=kv_cache.shape[-2], scale=scale,
            window=sliding_window, alibi=alibi, interpret=mode)
    return paged_attention_reference(q, kv_cache, layer, meta.block_tables,
                                     meta.token_seq, meta.token_pos,
                                     meta.seq_lens, scale,
                                     sliding_window=sliding_window,
                                     alibi=alibi)


def paged_attention_reference(
    q: jax.Array,
    kv_cache: jax.Array,
    layer,
    block_tables: jax.Array,
    token_seq: jax.Array,
    token_pos: jax.Array,
    seq_lens: jax.Array,
    scale: float,
    sliding_window: Optional[int] = None,
    alibi: Optional[jax.Array] = None,
) -> jax.Array:
    """XLA reference path (CPU tests, ALiBi prefill, odd shapes): gather
    each token's context and run masked softmax attention. The per-token
    gather is O(T*ctx); to keep the fallback usable at serving shapes the
    token axis processes in fixed 128-token chunks under ``lax.map``, so
    peak memory is O(128 * ctx) regardless of batch size."""
    CHUNK = 128
    T = q.shape[0]
    if T > CHUNK:
        Tp = -(-T // CHUNK) * CHUNK
        pad = Tp - T
        qp = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        seqp = jnp.pad(token_seq, (0, pad), constant_values=-1)
        posp = jnp.pad(token_pos, (0, pad))
        n = Tp // CHUNK

        def one_chunk(args):
            qc, sc, pc = args
            return _paged_attention_reference_chunk(
                qc, kv_cache, layer, block_tables, sc, pc, seq_lens, scale,
                sliding_window, alibi)

        out = jax.lax.map(one_chunk,
                          (qp.reshape(n, CHUNK, *q.shape[1:]),
                           seqp.reshape(n, CHUNK), posp.reshape(n, CHUNK)))
        return out.reshape(Tp, *out.shape[2:])[:T]
    return _paged_attention_reference_chunk(q, kv_cache, layer,
                                            block_tables, token_seq,
                                            token_pos, seq_lens, scale,
                                            sliding_window, alibi)


def _paged_attention_reference_chunk(
    q, kv_cache, layer, block_tables, token_seq, token_pos, seq_lens,
    scale, sliding_window=None, alibi=None,
) -> jax.Array:
    T, QH, D = q.shape
    _, num_blocks_p1, _, KH, block_size, Dp = kv_cache.shape
    S, MB = block_tables.shape
    group = QH // KH  # GQA group size

    # Gather each sequence's pages: [S, MB, 2, KH, Bs, D] -> [S, ctx, KH, D]
    # (the cache head dim may be lane-padded; FP8 caches upcast here, fused
    # by XLA).
    pages = kv_cache[layer, block_tables]  # [S, MB, 2, KH, Bs, Dp]
    ctx = MB * block_size
    k = pages[:, :, 0, :, :, :D].transpose(0, 1, 3, 2, 4).reshape(
        S, ctx, KH, D).astype(q.dtype)
    v = pages[:, :, 1, :, :, :D].transpose(0, 1, 3, 2, 4).reshape(
        S, ctx, KH, D).astype(q.dtype)

    # Per-token gather of its sequence's K/V: [T, ctx, KH, D].
    safe_seq = jnp.maximum(token_seq, 0)
    k_t = k[safe_seq]
    v_t = v[safe_seq]

    # Scores: [T, KH, group, ctx] with GQA head mapping.
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


def paged_attention_decode_reference(
    q: jax.Array,
    kv_cache: jax.Array,
    layer,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    scale: float,
    sliding_window: Optional[int] = None,
    alibi: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode-only reference: one query per sequence. q: [S, QH, D]."""
    S, QH, D = q.shape
    token_seq = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0).squeeze(-1)
    token_pos = jnp.maximum(seq_lens - 1, 0)
    return paged_attention_reference(q, kv_cache, layer, block_tables,
                                     token_seq, token_pos, seq_lens, scale,
                                     sliding_window=sliding_window,
                                     alibi=alibi)
