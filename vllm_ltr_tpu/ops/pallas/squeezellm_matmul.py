"""Pallas SqueezeLLM (non-uniform 4-bit LUT) fused dequant+matmul.

TPU-native counterpart of reference
``csrc/quantization/squeezellm/quant_cuda_kernel.cu`` (225 LoC): weights
are 4-bit indices into a per-output-channel 16-entry lookup table of
k-means centroids (dense NUQ4), so dequantization is a gather instead of
an affine scale — SqueezeLLM's accuracy advantage over uniform INT4.

Layout reuses the INT4 kernel's **plane-major** packing
(ops/pallas/int4_matmul.py): indices pack 8 logical column planes per
int32 word, ``packed: int32[Kp, N8p]``; the LUT stores per (entry, plane,
lane): ``lut: f32[16, 8, N8p]``.

Kernel: grid (M tiles, N-lane tiles, K tiles), K innermost.  Mosaic has
no lane-wise gather, so the LUT dequant runs as a 16-way select-sum on
the VPU — ``w = Σ_i (idx == i) * lut[i]`` — followed by one MXU matmul
per plane.  The weight stream stays 4-bit (the memory-bound-decode win);
the extra VPU selects are hidden behind the HBM fetch at decode batch
sizes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_ltr_tpu.ops.pallas.int4_matmul import (LANE, MAX_TM, MAX_TN8,
                                                 PLANES)
from vllm_ltr_tpu.utils import cdiv, round_up

LUT_SIZE = 16


def lut_plane_major(idx_vals: np.ndarray, lut: np.ndarray,
                    shards: int = 1, shard_axis: str = "n"):
    """Pack logical 4-bit indices [K, N] and LUT [N, 16] into plane-major
    ``packed int32[Kp, N8p]`` + ``lut f32[16, 8, N8p]``.

    ``shards > 1`` builds the TP-shardable concatenation of per-slice
    layouts (see int4_matmul.to_plane_major).  Row-parallel ("k") shards
    keep ONE full LUT — the table is per output channel, independent of
    K — so only the packed indices concatenate."""
    K, N = idx_vals.shape
    if shards > 1:
        if shard_axis == "n":
            Nl = N // shards
            parts = [lut_plane_major(idx_vals[:, d * Nl:(d + 1) * Nl],
                                     lut[d * Nl:(d + 1) * Nl])
                     for d in range(shards)]
            return (np.concatenate([p[0] for p in parts], axis=1),
                    np.concatenate([p[1] for p in parts], axis=2))
        assert shard_axis == "k", shard_axis
        Kl = K // shards
        parts = [lut_plane_major(idx_vals[d * Kl:(d + 1) * Kl], lut)
                 for d in range(shards)]
        return (np.concatenate([p[0] for p in parts], axis=0), parts[0][1])
    assert N % PLANES == 0, N
    N8 = N // PLANES
    N8p = round_up(max(N8, 1), LANE)
    Kp = round_up(K, LANE)

    packed = np.zeros((Kp, N8p), dtype=np.uint32)
    q = idx_vals.astype(np.uint32)
    lut_store = np.zeros((LUT_SIZE, PLANES, N8p), dtype=np.float32)
    for j in range(PLANES):
        cols = q[:, j * N8:(j + 1) * N8]
        packed[:K, :N8] |= (cols & 0xF) << (4 * j)
        lut_store[:, j, :N8] = lut[j * N8:(j + 1) * N8, :].T
    return packed.astype(np.int32), lut_store


def _squeezellm_kernel(x_ref, w_ref, lut_ref, o_ref, acc_ref, *,
                       n_k_tiles: int):
    """x [TM, TK]; w int32[TK, TN8]; lut f32[16, 8, TN8];
    o/acc [TM, 8, TN8]."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    words = w_ref[...]
    for j in range(PLANES):
        w32 = words.astype(jnp.int32)
        qj = jax.lax.shift_right_logical(w32, jnp.int32(4 * j)) & 0xF
        # LUT gather as a 16-way select-sum (no lane gather on TPU).
        w = jnp.zeros(qj.shape, jnp.float32)
        for i in range(LUT_SIZE):
            w = w + jnp.where(qj == i, lut_ref[i, j:j + 1, :], 0.0)
        acc_ref[:, j, :] += jax.lax.dot_general(
            x_ref[...], w.astype(x_ref.dtype), (((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("logical_n", "interpret"))
def squeezellm_matmul_pallas(x: jax.Array, packed: jax.Array,
                             lut: jax.Array, *, logical_n: int,
                             interpret: bool = False) -> jax.Array:
    M, K = x.shape
    Kp, N8p = packed.shape
    if K < Kp:
        x = jnp.pad(x, ((0, 0), (0, Kp - K)))
    TM = min(round_up(M, 8), MAX_TM)
    TN8 = min(N8p, MAX_TN8)
    TK = min(Kp, 512)
    n_k_tiles = cdiv(Kp, TK)
    Mp = round_up(M, TM)
    if Mp > M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_squeezellm_kernel, n_k_tiles=n_k_tiles),
        grid=(Mp // TM, N8p // TN8, n_k_tiles),
        in_specs=[
            pl.BlockSpec((TM, TK), lambda m, n, k: (m, k)),
            pl.BlockSpec((TK, TN8), lambda m, n, k: (k, n)),
            pl.BlockSpec((LUT_SIZE, PLANES, TN8), lambda m, n, k: (0, 0, n)),
        ],
        out_specs=pl.BlockSpec((TM, PLANES, TN8), lambda m, n, k: (m, 0, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, PLANES, N8p), x.dtype),
        scratch_shapes=[pltpu.VMEM((TM, PLANES, TN8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, packed, lut)
    # [Mp, 8, N8p] planes -> logical column order.
    N8 = logical_n // PLANES
    return out[:M, :, :N8].reshape(M, logical_n)


def squeezellm_matmul_reference(x: jax.Array, packed: jax.Array,
                                lut: jax.Array, logical_n: int) -> jax.Array:
    """XLA reference: unpack planes, LUT-gather, dense matmul."""
    Kp, N8p = packed.shape
    N8 = logical_n // PLANES
    words = packed.astype(jnp.uint32)
    cols = []
    for j in range(PLANES):
        idx = (jax.lax.shift_right_logical(
            words, jnp.uint32(4 * j)) & jnp.uint32(0xF))[:, :N8]
        # lut[i, j, n] -> w[k, n] = lut[idx[k, n], j, n]
        w = jnp.take_along_axis(
            lut[:, j, :N8].T[None].repeat(idx.shape[0], 0),  # [Kp, N8, 16]
            idx[:, :, None].astype(jnp.int32), axis=2)[..., 0]
        cols.append(w)
    W = jnp.concatenate(cols, axis=1)  # [Kp, N]
    Kx = x.shape[-1]
    return jnp.dot(x, W[:Kx].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)


def squeezellm_matmul(x, packed, lut, *, logical_n: int) -> jax.Array:
    from vllm_ltr_tpu.ops import pallas_mode
    mode = pallas_mode()
    if mode is not None:
        return squeezellm_matmul_pallas(x, packed, lut,
                                        logical_n=logical_n,
                                        interpret=mode)
    return squeezellm_matmul_reference(x, packed, lut, logical_n)
