"""Offline repacking of AWQ / GPTQ checkpoints to the canonical INT4 layout.

Counterpart of the reference's format-specific kernel front-ends
(``layers/quantization/awq.py``/``gptq.py``/``marlin.py``): instead of one
CUDA kernel per format, checkpoints are repacked once at load time into the
single layout the Pallas kernel consumes (the Marlin strategy, SURVEY.md
§2.4):

  w_packed: int32[K, N//8] (nibbles along N), scales [K//G, N],
  zeros [K//G, N] (float; dequant = (q - zeros) * scales).

AWQ source format:  qweight int32[K, N//8] with nibble order
  [0, 2, 4, 6, 1, 3, 5, 7]; qzeros int32[K//G, N//8] same order;
  scales f16[K//G, N].
GPTQ source format: qweight int32[K//8, N] packed along K (order 0..7);
  qzeros int32[K//G, N//8]; scales f16[K//G, N]; optional g_idx (act-order)
  handled by row permutation of K at repack time (the reference's
  gptq_shuffle, csrc q_gemm.cu).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def _unpack_cols_int32(arr: np.ndarray, order=None) -> np.ndarray:
    """int32[R, C] -> int4 values [R, C*8], nibble i -> col c*8 + order[i]."""
    R, C = arr.shape
    out = np.empty((R, C, 8), dtype=np.int32)
    a = arr.astype(np.uint32)
    for i in range(8):
        vals = (a >> (4 * i)) & 0xF
        col = order[i] if order is not None else i
        out[:, :, col] = vals
    return out.reshape(R, C * 8)


def _unpack_rows_int32(arr: np.ndarray) -> np.ndarray:
    """int32[R, C] -> int4 values [R*8, C], nibble i -> row r*8 + i."""
    R, C = arr.shape
    out = np.empty((R, 8, C), dtype=np.int32)
    a = arr.astype(np.uint32)
    for i in range(8):
        out[:, i, :] = (a >> (4 * i)) & 0xF
    return out.reshape(R * 8, C)


def pack_cols_int32(vals: np.ndarray) -> np.ndarray:
    """int4 values [R, N] -> int32[R, N//8], nibble i = col n*8+i."""
    R, N = vals.shape
    v = vals.astype(np.uint32).reshape(R, N // 8, 8)
    out = np.zeros((R, N // 8), dtype=np.uint32)
    for i in range(8):
        out |= (v[:, :, i] & 0xF) << (4 * i)
    return out.astype(np.int32)


def repack_awq(qweight: np.ndarray, qzeros: np.ndarray,
               scales: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                            np.ndarray]:
    """AWQ -> canonical. Returns (w_packed, scales, zeros)."""
    w = _unpack_cols_int32(qweight, AWQ_ORDER)  # [K, N]
    z = _unpack_cols_int32(qzeros, AWQ_ORDER)  # [K//G, N]
    return (pack_cols_int32(w), scales.astype(np.float32),
            z.astype(np.float32))


def repack_gptq(qweight: np.ndarray,
                qzeros: np.ndarray,
                scales: np.ndarray,
                g_idx: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """GPTQ -> canonical. Act-order (g_idx) is resolved by permuting K rows
    so groups are contiguous; the caller must permute the activation K axis
    identically (we instead fold the permutation into the weight since
    x @ W is invariant when both are permuted — here we permute W rows back
    to natural K order using g_idx's group assignment)."""
    w = _unpack_rows_int32(qweight)  # [K, N]
    z = _unpack_cols_int32(qzeros)  # [K//G, N//8*8]
    K = w.shape[0]
    G = K // scales.shape[0]
    if g_idx is not None and not np.array_equal(
            g_idx, np.arange(K) // G):
        # Act-order: row k belongs to group g_idx[k]. Expand scales/zeros to
        # per-row granularity so the canonical layout stays group-uniform.
        s_rows = scales[g_idx]  # [K, N]
        z_rows = z[g_idx]
        # Re-group with group_size 1 equivalence is wasteful; instead emit
        # per-row groups only when needed.
        return pack_cols_int32(w), s_rows.astype(np.float32), z_rows.astype(
            np.float32)
    # GPTQ zeros are stored off-by-one in many exporters (zero point z+1).
    z = z + 1
    return (pack_cols_int32(w), scales.astype(np.float32),
            z.astype(np.float32))


def quantize_int4(w: np.ndarray,
                  group_size: int = 128,
                  symmetric: bool = False
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize a float [K, N] weight to the canonical INT4 layout (for
    tests and on-the-fly quantized serving of fp checkpoints)."""
    K, N = w.shape
    assert K % group_size == 0
    wg = w.reshape(K // group_size, group_size, N)
    if symmetric:
        maxabs = np.abs(wg).max(axis=1)  # [K//G, N]
        scales = np.maximum(maxabs / 7.0, 1e-8)
        zeros = np.full_like(scales, 8.0)
        q = np.clip(np.round(wg / scales[:, None, :]) + 8, 0, 15)
    else:
        wmin = wg.min(axis=1)
        wmax = wg.max(axis=1)
        scales = np.maximum((wmax - wmin) / 15.0, 1e-8)
        zeros = np.round(-wmin / scales)
        q = np.clip(np.round(wg / scales[:, None, :]) + zeros[:, None, :],
                    0, 15)
    q = q.reshape(K, N).astype(np.int32)
    return (pack_cols_int32(q), scales.astype(np.float32),
            zeros.astype(np.float32))
