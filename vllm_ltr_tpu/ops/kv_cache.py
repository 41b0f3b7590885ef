"""Paged KV-cache ops: write (reshape_and_cache), copy (CoW), swap.

TPU-native counterpart of reference ``csrc/cache_kernels.cu``
(reshape_and_cache / copy_blocks / swap_blocks / convert_fp8, ~360 LoC CUDA):
here the scatter/gather are XLA ops on a stacked cache array, fused by the
compiler; FP8 conversion is a dtype cast on the value path.

Cache layout: ``[num_layers, num_blocks+1, 2, kv_heads, block_size, head_dim]``
(K at index 0 of the third axis, V at index 1). The layout is PAGE-MAJOR:
one page ``cache[l, b]`` holds every head's K and V contiguously (typically
128 KiB), so the fused decode kernel streams a sequence's context with one
large DMA per page instead of ``2*kv_heads`` 4 KiB latency-bound DMAs, and
per-(head, page) ``[block_size, head_dim]`` tiles stay contiguous for the
MXU. The cache shards over the kv-head axis of the mesh. Flat "slot"
addressing: slot = block_number * block_size + offset, with slot -1 mapping
to the reserved trash block (the last block), so padded lanes never corrupt
live cache.

The cache is ONE stacked array for all layers, threaded through the model's
unrolled layer loop at a constant layer index (never as ``lax.scan`` xs/ys,
which XLA cannot alias and would copy wholesale every step).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_ltr_tpu.utils import round_up

# The cache's head_dim is padded to a full lane tile so Pallas DMA slices of
# [block_size, head_dim] pages stay aligned (Mosaic requires 128-lane
# alignment). Real serving models have head_dim 128 already; the padding
# only costs memory for small test models.
LANE = 128


def padded_head_dim(head_dim: int) -> int:
    return round_up(head_dim, LANE)


def kv_cache_shape(num_layers: int, num_blocks: int, block_size: int,
                   num_kv_heads: int, head_dim: int) -> Tuple[int, ...]:
    # One extra trash block at the end absorbs writes from padded slots.
    return (num_layers, num_blocks + 1, 2, num_kv_heads, block_size,
            padded_head_dim(head_dim))


def allocate_kv_cache(num_layers: int,
                      num_blocks: int,
                      block_size: int,
                      num_kv_heads: int,
                      head_dim: int,
                      dtype=jnp.bfloat16,
                      sharding=None) -> jax.Array:
    shape = kv_cache_shape(num_layers, num_blocks, block_size, num_kv_heads,
                           head_dim)
    if sharding is not None:
        return jax.device_put(jnp.zeros(shape, dtype=dtype), sharding)
    return jnp.zeros(shape, dtype=dtype)


def write_kv(kv_cache: jax.Array, layer: int, key: jax.Array,
             value: jax.Array, slot_mapping: jax.Array) -> jax.Array:
    """Scatter new K/V for one layer into the paged cache (XLA path; the
    TPU decode fast path writes inside the fused Pallas kernel instead).

    kv_cache:    [L, num_blocks+1, 2, KH, block_size, D] full stacked cache
    layer:       constant layer index (the unrolled loop's python int), so
                 XLA keeps the update in place on the donated buffer
    key/value:   [T, KH, D] (compute dtype; cast to the cache dtype here;
                 FP8 quantization scales are folded by the caller)
    slot_mapping:[T] flat slots; -1 => trash block.
    """
    _, num_blocks_p1, _, KH, block_size, Dp = kv_cache.shape
    trash = (num_blocks_p1 - 1) * block_size
    slots = jnp.where(slot_mapping < 0, trash, slot_mapping)
    block_idx = slots // block_size
    block_off = slots % block_size
    # [T, 2, KH, D] rows scattered at (layer, block, :, :, offset).
    kv = jnp.stack([key, value], axis=1)
    if kv.shape[-1] < Dp:
        kv = jnp.pad(kv, ((0, 0), (0, 0), (0, 0),
                          (0, Dp - kv.shape[-1])))
    kv = kv.astype(kv_cache.dtype)
    return kv_cache.at[layer, block_idx, :, :, block_off].set(
        kv, mode="drop", unique_indices=False)


def write_kv_pages(kv_cache: jax.Array, layer: int, key: jax.Array,
                   value: jax.Array, page_dst: jax.Array) -> jax.Array:
    """Page-granular prefill K/V write.

    The per-token scatter in :func:`write_kv` lowers on TPU to a serial
    loop of one dynamic-update-slice per token (~30 us each): a T=512
    prefill across 22 layers spent ~345 ms/step just writing KV (round-4
    phase diagnostic).  Prefill destination slots are contiguous runs and
    the flat token layout is tile-aligned, so each flat page of
    ``block_size`` tokens lands in exactly ONE destination cache page —
    written here as a scatter of whole [2, KH, block_size, D] pages with
    ``unique_indices=True`` (every live page index is distinct; padding
    pages carry unique out-of-bounds indices and are dropped).

    Slots of a partially-filled tail page receive padding-token garbage
    beyond the sequence length — safe, because nothing reads a slot past
    ``seq_len`` and decode's in-kernel write replaces slot ``L`` before
    the first read of it.

    key/value: [T, KH, D]; page_dst: [T // block_size] destination block
    index per flat page (>= num_blocks+1 => dropped).
    """
    _, _, _, KH, block_size, Dp = kv_cache.shape
    kv = jnp.stack([key, value], axis=1)  # [T, 2, KH, D]
    if kv.shape[-1] < Dp:
        kv = jnp.pad(kv, ((0, 0), (0, 0), (0, 0), (0, Dp - kv.shape[-1])))
    kv = kv.astype(kv_cache.dtype)
    P = page_dst.shape[0]
    pages = kv.reshape(P, block_size, 2, KH, Dp).transpose(0, 2, 3, 1, 4)
    return kv_cache.at[layer, page_dst].set(pages, mode="drop",
                                            unique_indices=True)


def copy_blocks(kv_cache: jax.Array, src: jax.Array,
                dst: jax.Array) -> jax.Array:
    """Copy whole blocks src[i] -> dst[i] across all layers (CoW commit).

    kv_cache: [L, N+1, 2, KH, Bs, D]; src/dst: [M] block numbers. Pages are
    contiguous rows of the block axis, so this is a dense-row gather/scatter.
    """
    data = kv_cache[:, src]
    return kv_cache.at[:, dst].set(data)


@functools.partial(jax.jit, donate_argnums=(0, ))
def _copy_blocks_jit(kv_cache, src, dst):
    return copy_blocks(kv_cache, src, dst)


def run_copy_blocks(kv_cache: jax.Array,
                    blocks_to_copy: Dict[int, List[int]]) -> jax.Array:
    """Host entry: apply the scheduler's CoW mapping in one fused jit call."""
    if not blocks_to_copy:
        return kv_cache
    srcs, dsts = [], []
    for src, dst_list in blocks_to_copy.items():
        for dst in dst_list:
            srcs.append(src)
            dsts.append(dst)
    return _copy_blocks_jit(kv_cache, jnp.asarray(srcs, jnp.int32),
                            jnp.asarray(dsts, jnp.int32))


@functools.partial(jax.jit, donate_argnums=(0, ))
def _swap_in_jit(kv_cache, host_chunk, dst):
    return kv_cache.at[:, dst].set(host_chunk.astype(kv_cache.dtype))


@jax.jit
def _gather_blocks_jit(kv_cache, src):
    return kv_cache[:, src]


class HostSwapSpace:
    """Host-memory mirror for swapped-out KV blocks.

    Counterpart of the reference's pinned-CPU CacheEngine tensors +
    swap_blocks memcpys (vllm/worker/cache_engine.py, csrc
    cache_kernels.cu:swap_blocks), with the improvement SURVEY §7 calls
    for: **swap-outs overlap with compute**.  A swap-out only dispatches
    the on-device block gather and starts the D2H copy asynchronously; the
    gathered buffer is committed into the host mirror one step later (or
    the moment a swap-in needs it).  Device-stream ordering guarantees the
    gather reads the cache before the step's donated buffer is reused, so
    the blocking np.asarray happens after the copy has had a full model
    step to complete in the background.

    Blocks round-trip as raw bits (no dtype conversion), so quantized
    (FP8) caches are restored exactly.
    """

    def __init__(self, num_layers: int, num_cpu_blocks: int, block_size: int,
                 num_kv_heads: int, head_dim: int, dtype) -> None:
        self.num_cpu_blocks = num_cpu_blocks
        self._np_dtype = np.dtype(
            dtype.dtype if hasattr(dtype, "dtype") else dtype)
        self.buf = np.zeros(
            (num_layers, max(num_cpu_blocks, 1), 2, num_kv_heads, block_size,
             padded_head_dim(head_dim)),
            dtype=self._np_dtype)
        # In-flight D2H transfers: (device chunk, host block indices),
        # committed in issue order.
        self._inflight: List[Tuple[jax.Array, np.ndarray]] = []

    @staticmethod
    def _to_host(chunk: jax.Array) -> np.ndarray:
        if jax.process_count() > 1:
            # Multi-host: the gathered blocks are sharded across hosts;
            # reassemble the global value on every host.
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(chunk, tiled=True))
        return np.asarray(chunk)

    def _commit_inflight(self) -> None:
        for chunk, dst in self._inflight:
            self.buf[:, dst] = self._to_host(chunk)
        self._inflight.clear()

    def flush(self) -> None:
        """Force every pending swap-out into the host mirror."""
        self._commit_inflight()

    def swap_out(self, kv_cache: jax.Array,
                 mapping: Dict[int, int]) -> jax.Array:
        """Move device blocks to host (device_block -> host_block),
        overlapping the D2H copy with the following model step."""
        if not mapping:
            return kv_cache
        # Previous step's transfer has had a full step to finish: commit it
        # first (ordering) — usually a no-wait memcpy by now.
        self._commit_inflight()
        src = jnp.asarray(list(mapping.keys()), jnp.int32)
        chunk = _gather_blocks_jit(kv_cache, src)
        try:
            chunk.copy_to_host_async()
        except Exception:  # backends without async host copies
            pass
        self._inflight.append(
            (chunk, np.asarray(list(mapping.values()), np.int64)))
        return kv_cache

    def swap_in(self, kv_cache: jax.Array,
                mapping: Dict[int, int]) -> jax.Array:
        """Copy host blocks back into the device cache
        (host_block -> device_block)."""
        if not mapping:
            return kv_cache
        if self._inflight:
            self._commit_inflight()
        src = np.asarray(list(mapping.keys()), np.int64)
        dst = jnp.asarray(list(mapping.values()), jnp.int32)
        chunk = jnp.asarray(self.buf[:, src])
        return _swap_in_jit(kv_cache, chunk, dst)
