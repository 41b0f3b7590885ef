"""Pallas INT4 weight-only fused dequant+matmul.

TPU-native counterpart of the reference's AWQ/GPTQ/Marlin CUDA GEMMs
(``csrc/quantization/awq/gemm_kernels.cu`` 533 LoC,
``gptq/q_gemm.cu`` ~2,800 LoC, ``marlin/marlin_cuda_kernel.cu`` 1,145 LoC):
a single kernel serves both weight formats after offline repacking to a
canonical layout (ops/quant_repack.py), the Marlin strategy.

Canonical layout (group-quantized, symmetric-or-asymmetric):
  w_packed: int32[K, N // 8]   — 8 int4 nibbles packed along N
                                 (nibble j of word n holds column n*8+j)
  scales:   f32/bf16[K // G, N]
  zeros:    f32/bf16[K // G, N] — dequant: (q - zeros) * scales

The kernel tiles (N, K): weights stream HBM->VMEM at INT4 width (4x less
HBM traffic than bf16 — the point of weight-only quantization for
memory-bound decode), unpack + dequant on the VPU, then MXU matmul with the
activation tile. Activations [M, K] stay resident in VMEM (decode M is
small).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_ltr_tpu.utils import cdiv


def _unpack_int4(words: jax.Array) -> jax.Array:
    """int32[K, Nw] -> int32[K, Nw*8] nibbles, nibble j -> column 8*n+j."""
    K, Nw = words.shape
    shifts = jnp.arange(8, dtype=jnp.int32) * 4  # [8]
    # [K, Nw, 8]
    nibbles = jax.lax.shift_right_logical(
        words[:, :, None], shifts[None, None, :]) & 0xF
    return nibbles.reshape(K, Nw * 8)


def _int4_matmul_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                        n_k_tiles: int, group_size: int, tile_k: int):
    """Grid (N//TN, K//TK). x [M, TK]; w [TK, TN//8] int32;
    s/z [TK//G, TN]; o [M, TN]."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = _unpack_int4(w_ref[...]).astype(jnp.float32)  # [TK, TN]
    # Broadcast group scales/zeros over the K rows of this tile.
    reps = tile_k // s_ref.shape[0] if s_ref.shape[0] else 1
    s = jnp.repeat(s_ref[...].astype(jnp.float32), group_size, axis=0)
    z = jnp.repeat(z_ref[...].astype(jnp.float32), group_size, axis=0)
    w = (q - z) * s  # [TK, TN]

    x = x_ref[...].astype(jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def int4_matmul_pallas(
    x: jax.Array,  # [M, K]
    w_packed: jax.Array,  # int32[K, N//8]
    scales: jax.Array,  # [K//G, N]
    zeros: jax.Array,  # [K//G, N]
    *,
    group_size: int,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    N = w_packed.shape[1] * 8
    TN = min(256, N)
    TK = min(512, K)
    # Tile sizes must respect the group quantization granularity.
    TK = max(TK - TK % group_size, group_size)
    assert K % TK == 0, (K, TK)
    assert N % TN == 0, (N, TN)
    n_k_tiles = K // TK

    grid = (N // TN, n_k_tiles)
    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel,
                          n_k_tiles=n_k_tiles,
                          group_size=group_size,
                          tile_k=TK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, TK), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN // 8), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // group_size, TN), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // group_size, TN), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32)],
        interpret=interpret,
    )(x, w_packed, scales, zeros)
    return out


def int4_matmul_reference(x: jax.Array, w_packed: jax.Array,
                          scales: jax.Array, zeros: jax.Array,
                          group_size: int) -> jax.Array:
    """XLA reference (materializes the dequantized weight; for tests/CPU)."""
    q = _unpack_int4(w_packed).astype(jnp.float32)  # [K, N]
    s = jnp.repeat(scales.astype(jnp.float32), group_size, axis=0)
    z = jnp.repeat(zeros.astype(jnp.float32), group_size, axis=0)
    w = (q - z) * s
    return jnp.dot(x.astype(jnp.float32), w,
                   preferred_element_type=jnp.float32).astype(x.dtype)


def int4_matmul(x: jax.Array, w_packed: jax.Array, scales: jax.Array,
                zeros: jax.Array, group_size: int) -> jax.Array:
    """Dispatcher: Pallas on TPU, XLA reference elsewhere."""
    import os
    if (jax.default_backend() == "tpu"
            and os.environ.get("LTR_TPU_DISABLE_PALLAS", "0") != "1"):
        return int4_matmul_pallas(x, w_packed, scales, zeros,
                                  group_size=group_size)
    return int4_matmul_reference(x, w_packed, scales, zeros, group_size)
