"""Pallas INT4 weight-only fused dequant+matmul.

TPU-native counterpart of the reference's AWQ/GPTQ/Marlin CUDA GEMMs
(csrc/quantization/awq/gemm_kernels.cu 533 LoC, gptq/q_gemm.cu ~2,800
LoC, marlin/marlin_cuda_kernel.cu 1,145 LoC): a single kernel serves both
weight formats after offline repacking to a canonical layout — the Marlin
strategy (pre-layout the weights so the hot kernel does no data movement;
SURVEY.md §7 "sub-byte unpack layout must match MXU tiling").

Canonical **plane-major** layout (no reshapes, dynamic slices, or repeats
in the kernel — all Mosaic-hostile):

  N8  = N // 8, N8p = round_up(N8, 128) (lane padding)
  Kp  = round_up(K, 8 * group_size)
  packed: int32[Kp, N8p] — nibble j of word (k, n) holds logical weight
          column  c = j * N8 + n  (per-plane outputs concatenate back to
          logical order with a plain outer reshape)
  scales/zeros: f32[Kp // G, 8, N8p] — [group row, plane, lane]

Kernel: grid (M tiles, N-lane tiles, K tiles) with K innermost.  Each
int32 word block streams HBM->VMEM once (INT4 = 4x less weight traffic
than bf16 — the win for memory-bound decode); two static loops (8 planes
x 8 groups per K tile) do shift-mask dequant on the VPU and
MXU-accumulate.  Dequantization is factored out of the inner product:
  sum_k x_k (q - z) s  =  s * (x . q) - (s z) * (sum_k x_k)
so the hot loop is a raw-nibble matmul plus a per-group rank-1
correction.  The M/N tiling keeps the f32 accumulator at a fixed VMEM
footprint for any weight shape (Llama-7B/13B MLPs included) and any
prefill batch size.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_ltr_tpu.utils import cdiv, round_up

LANE = 128
PLANES = 8
# Per-grid-cell tile caps: acc f32[TM, 8, TN8] stays <= 2 MiB.
MAX_TM = 256
MAX_TN8 = 256
# Prefill (dequant-tile) kernel caps: tall/narrow tiles amortize the
# per-tile weight dequant over more activation rows.  v5e sweep at
# 7B-MLP shapes (docs/BENCHMARKS.md): (512, 128) reaches bf16 parity at
# M=512 (221us vs 218us) and 0.79x at M=2048; (256, 256) trails at
# 0.68-0.73x; (1024, 128) exceeds VMEM.
PREFILL_TM = 512
PREFILL_TN8 = 128


def plane_major_shapes(K: int, N: int, group_size: int):
    N8 = N // PLANES
    N8p = round_up(max(N8, 1), LANE)
    TK = PLANES * group_size
    Kp = round_up(K, TK)
    return N8, N8p, Kp, TK


def to_plane_major(q_vals: np.ndarray, scales: np.ndarray,
                   zeros: np.ndarray, group_size: int,
                   shards: int = 1, shard_axis: str = "n"):
    """Repack logical-order int4 values [K, N] (+ [K//G, N] scales/zeros)
    into the canonical plane-major arrays.

    ``shards > 1`` builds a TP-shardable layout: the logical weight is
    split into ``shards`` contiguous slices along N (``shard_axis="n"``,
    column-parallel) or K (``"k"``, row-parallel), each slice is packed
    plane-major independently, and the per-slice packings concatenate
    along the corresponding storage axis — so a NamedSharding over that
    axis hands every device a self-contained plane-major weight of its
    logical slice (the per-rank layout shard_map'd kernels require;
    nibble planes of a single full-N packing would interleave shards)."""
    K, N = q_vals.shape
    if shards > 1:
        if shard_axis == "n":
            Nl = N // shards
            parts = [to_plane_major(q_vals[:, d * Nl:(d + 1) * Nl],
                                    scales[:, d * Nl:(d + 1) * Nl],
                                    zeros[:, d * Nl:(d + 1) * Nl],
                                    group_size) for d in range(shards)]
            return (np.concatenate([p[0] for p in parts], axis=1),
                    np.concatenate([p[1] for p in parts], axis=2),
                    np.concatenate([p[2] for p in parts], axis=2))
        assert shard_axis == "k", shard_axis
        Kl = K // shards
        Gl = Kl // group_size
        parts = [to_plane_major(q_vals[d * Kl:(d + 1) * Kl],
                                scales[d * Gl:(d + 1) * Gl],
                                zeros[d * Gl:(d + 1) * Gl],
                                group_size) for d in range(shards)]
        return (np.concatenate([p[0] for p in parts], axis=0),
                np.concatenate([p[1] for p in parts], axis=0),
                np.concatenate([p[2] for p in parts], axis=0))
    assert N % PLANES == 0, N
    N8, N8p, Kp, TK = plane_major_shapes(K, N, group_size)
    G = group_size

    packed = np.zeros((Kp, N8p), dtype=np.uint32)
    q = q_vals.astype(np.uint32).reshape(K, N)
    for j in range(PLANES):
        cols = q[:, j * N8:(j + 1) * N8]  # logical plane j
        packed[:K, :N8] |= (cols & 0xF) << (4 * j)

    n_groups_p = Kp // G
    s_store = np.ones((n_groups_p, PLANES, N8p), dtype=np.float32)
    z_store = np.zeros((n_groups_p, PLANES, N8p), dtype=np.float32)
    ng = K // G
    for j in range(PLANES):
        s_store[:ng, j, :N8] = scales[:, j * N8:(j + 1) * N8]
        z_store[:ng, j, :N8] = zeros[:, j * N8:(j + 1) * N8]
    return packed.astype(np.int32), s_store, z_store


def _int4_matmul_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                        group_size: int, n_k_tiles: int):
    """Grid (MT, NT, KT), K innermost. x [TM, TK]; w [TK, TN8] int32;
    s/z [8, 8, TN8]; o/acc [TM, 8, TN8]."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    words = w_ref[...]
    for j in range(PLANES):
        # Keep the matmul in the activation dtype: bf16 in serving (full
        # MXU rate), f32 in the f32 parity tests.
        qj = (jax.lax.shift_right_logical(words, 4 * j)
              & 0xF).astype(x_ref.dtype)  # [TK, TN8]
        for g in range(PLANES):  # TK = 8 * group_size => 8 groups per tile
            r0 = g * group_size
            qg = qj[r0:r0 + group_size, :]
            s = s_ref[g, j:j + 1, :]  # [1, TN8]
            sz = s * z_ref[g, j:j + 1, :]
            xg = x_ref[:, r0:r0 + group_size]  # [TM, G]
            raw = jax.lax.dot_general(
                xg, qg, (((1, ), (0, )), ((), ())),
                preferred_element_type=jnp.float32)  # [TM, TN8]
            x_sum = jnp.sum(xg.astype(jnp.float32), axis=1,
                            keepdims=True)  # [TM, 1]
            acc_ref[:, j, :] += raw * s - x_sum * sz

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _int4_batched_matmul_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref,
                                *, group_size: int, n_k_tiles: int):
    """Decode-regime variant of the factored kernel: per plane, ONE
    batched-over-groups dot_general (8 groups in a single Mosaic op) and
    ONE [TM, 8] x [8, TN8] correction matmul, instead of 64 sliver dots
    with per-group VPU rank-1 updates.  Same math:
      sum_g s_g * (x_g . q_g) - (sum_k x_k)_g (s z)_g
    but the MXU issue count per K tile drops 8x and the zero-point
    correction rides the MXU instead of the VPU."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    words = w_ref[...]  # [TK, TN8] int32
    x = x_ref[...]  # [TM, TK]
    tm, tk = x.shape
    tn8 = words.shape[1]
    xg = x.reshape(tm, PLANES, group_size).swapaxes(0, 1)  # [8, TM, G]
    xs = jnp.sum(x.astype(jnp.float32).reshape(tm, PLANES, group_size),
                 axis=2)  # [TM, 8] per-group activation sums
    for j in range(PLANES):
        qj = (jax.lax.shift_right_logical(words, 4 * j)
              & 0xF).astype(x.dtype)
        qg = qj.reshape(PLANES, group_size, tn8)  # [8, G, TN8]
        raw = jax.lax.dot_general(
            xg, qg, (((2, ), (1, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)  # [8, TM, TN8]
        s = s_ref[:, j, :]  # [8, TN8]
        sz = s * z_ref[:, j, :]
        corr = jax.lax.dot_general(
            xs.astype(x.dtype), sz.astype(x.dtype),
            (((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)  # [TM, TN8]
        # sum_g raw[g] * s[g, n]: plain multiply + axis-0 sum (Mosaic
        # cannot lower the equivalent einsum's dot dims).
        acc_ref[:, j, :] += jnp.sum(raw * s[:, None, :], axis=0) - corr

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _int4_dequant_matmul_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref,
                                *, group_size: int, n_k_tiles: int):
    """Prefill-regime variant: dequantize the weight tile to the activation
    dtype once per (m, n, k) cell and run ONE [TM, TK] x [TK, TN8] matmul
    per plane, instead of the factored raw-nibble form's 64 group-sliced
    matmuls + rank-1 corrections.  At large M the MXU passes dominate and
    the per-group ALU of the factored form is what made INT4 prefill
    0.26-0.34x of bf16 (docs/BENCHMARKS.md round-2 table); here the
    dequant cost is 2 VPU ops per weight element, amortized over all TM
    activation rows."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    words = w_ref[...]  # [TK, TN8] int32
    x = x_ref[...]  # [TM, TK]
    tn8 = words.shape[1]
    for j in range(PLANES):
        qj = (jax.lax.shift_right_logical(words, 4 * j)
              & 0xF).astype(jnp.float32)
        # Per-group scale/zero: group g covers rows [g*G, (g+1)*G).
        qg = qj.reshape(PLANES, group_size, tn8)
        s = s_ref[:, j, :][:, None, :]  # [8, 1, TN8]
        z = z_ref[:, j, :][:, None, :]
        wj = ((qg - z) * s).reshape(words.shape).astype(x.dtype)
        acc_ref[:, j, :] += jax.lax.dot_general(
            x, wj, (((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _int4_dequant_matmul_bf16_kernel(x_ref, w_ref, s_ref, z_ref, o_ref,
                                     acc_ref, *, group_size: int,
                                     n_k_tiles: int):
    """dequant-tile variant with the affine in the ACTIVATION dtype:
    int32 nibbles cast straight to bf16 (Mosaic has the cast; uint32
    does not), zero-point subtract exact (integer zeros, |q-z| <= 15),
    one bf16 multiply.  Drops the f32 hop + final downcast — 2 of the 6
    per-element VPU ops — at the cost of rounding the scale to bf16
    (<= 0.4% relative on s, an order below the int4 RTN noise)."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    words = w_ref[...]  # [TK, TN8] int32
    x = x_ref[...]  # [TM, TK]
    tn8 = words.shape[1]
    for j in range(PLANES):
        qj = (jax.lax.shift_right_logical(words, 4 * j)
              & 0xF).astype(x.dtype)
        qg = qj.reshape(PLANES, group_size, tn8)
        s = s_ref[:, j, :].astype(x.dtype)[:, None, :]  # [8, 1, TN8]
        z = z_ref[:, j, :].astype(x.dtype)[:, None, :]
        wj = ((qg - z) * s).reshape(words.shape)
        acc_ref[:, j, :] += jax.lax.dot_general(
            x, wj, (((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _int4_wcache_matmul_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref,
                               wdeq_ref, *, group_size: int,
                               n_k_tiles: int):
    """Large-M prefill variant with the M loop INNERMOST: grid
    (NT, KT, MT).  The dequantized weight tile is computed once per
    (n, k) cell and reused by every M tile (the dequant-tile kernel
    re-dequantizes it M/TM times — the whole remaining INT4 prefill gap
    at M=2048, VERDICT r2 item 8), and the partial sums for the whole M
    stripe stay resident in scratch so K can sit outside M."""
    k_idx = pl.program_id(1)
    m_idx = pl.program_id(2)

    @pl.when(m_idx == 0)
    def _():
        words = w_ref[...]  # [TK, TN8] int32
        tn8 = words.shape[1]
        for j in range(PLANES):
            qj = (jax.lax.shift_right_logical(words, 4 * j)
                  & 0xF).astype(jnp.float32)
            qg = qj.reshape(PLANES, group_size, tn8)
            s = s_ref[:, j, :][:, None, :]  # [8, 1, TN8]
            z = z_ref[:, j, :][:, None, :]
            wdeq_ref[:, j, :] = ((qg - z) * s).reshape(
                words.shape).astype(wdeq_ref.dtype)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[m_idx] = jnp.zeros(acc_ref.shape[1:], jnp.float32)

    x = x_ref[...]  # [TM, TK]
    for j in range(PLANES):
        acc_ref[m_idx, :, j, :] += jax.lax.dot_general(
            x, wdeq_ref[:, j, :], (((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[m_idx].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "logical_n", "interpret",
                              "decode_kernel"))
def int4_matmul_plane_major(
    x: jax.Array,  # [M, K]
    packed: jax.Array,  # int32[Kp, N8p]
    scales: jax.Array,  # f32[Kp//G, 8, N8p]
    zeros: jax.Array,  # f32[Kp//G, 8, N8p]
    *,
    group_size: int,
    logical_n: int,
    interpret: bool = False,
    decode_kernel: Optional[str] = None,
) -> jax.Array:
    M, K = x.shape
    Kp, N8p = packed.shape
    N8 = logical_n // PLANES
    TK = PLANES * group_size
    n_k_tiles = Kp // TK

    prefill = M > 64  # dequant-tile kernel regime
    TM = min(max(round_up(M, 8), 8), PREFILL_TM if prefill else MAX_TM)
    # Small-M (decode) tiles afford wider N tiles: fewer grid cells, better
    # DMA pipelining, same VMEM budget.  Prefill uses tall/narrow tiles.
    if prefill:
        TN8 = min(N8p, PREFILL_TN8)
    else:
        # Decode is weight-stream-bound: pick the widest lane tile that
        # does not PAD the lane axis (e.g. N=14336 -> N8p=1792: TN8=512
        # would round to 2048 lanes, +14% wasted bytes AND dequant ALU;
        # 256 divides exactly).  Ties break toward the wider tile.
        cands = [c for c in (512, 384, 256, 128) if c <= N8p] or [N8p]
        TN8 = min(cands, key=lambda c: (cdiv(N8p, c) * c - N8p, -c))
    # w-cached prefill grid (M innermost; see _int4_wcache_matmul_kernel):
    # dequantizes each weight tile once for all M tiles, but measured
    # SLOWER end-to-end than the dequant-tile kernel (0.26x vs 0.79x of
    # bf16 at M=2048, v5e — the (n, k, m) grid rewrites every output
    # block n_k times and the m==0 dequant region serializes against the
    # block pipeline).  Kept behind an env for future parts; the default
    # large-M path is the dequant-tile kernel.
    import os
    wcache = (prefill and M > TM
              and os.environ.get("LTR_TPU_INT4_WCACHE") == "1"
              and round_up(M, 256) * PLANES * TN8 * 4 <= 4 * 2**20)
    if wcache:
        TM = min(TM, 256)
    Mp = round_up(max(M, 1), TM)
    n_m_tiles = Mp // TM
    n_n_tiles = cdiv(N8p, TN8)
    N8pp = n_n_tiles * TN8
    pad_m, pad_k = Mp - M, Kp - K
    if pad_m or pad_k:
        x = jnp.pad(x, ((0, pad_m), (0, pad_k)))
    if N8pp != N8p:
        packed = jnp.pad(packed, ((0, 0), (0, N8pp - N8p)))
        scales = jnp.pad(scales, ((0, 0), (0, 0), (0, N8pp - N8p)),
                         constant_values=1.0)
        zeros = jnp.pad(zeros, ((0, 0), (0, 0), (0, N8pp - N8p)))

    # Decode (small M, memory-bound): factored raw-nibble kernel — no
    # dequantized tile is ever materialized.  Prefill (large M, MXU-bound):
    # dequant-tile kernel — 8 large matmuls per cell; when the whole
    # M-stripe accumulator fits VMEM, the w-cached variant dequantizes
    # each weight tile ONCE for all M tiles (closes the re-dequant gap).
    if wcache:
        out = pl.pallas_call(
            functools.partial(_int4_wcache_matmul_kernel,
                              group_size=group_size,
                              n_k_tiles=n_k_tiles),
            grid=(n_n_tiles, n_k_tiles, n_m_tiles),
            in_specs=[
                pl.BlockSpec((TM, TK), lambda n, k, m: (m, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TK, TN8), lambda n, k, m: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PLANES, PLANES, TN8),
                             lambda n, k, m: (k, 0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PLANES, PLANES, TN8),
                             lambda n, k, m: (k, 0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, PLANES, TN8),
                                   lambda n, k, m: (m, 0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, PLANES, N8pp), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((n_m_tiles, TM, PLANES, TN8), jnp.float32),
                pltpu.VMEM((TK, PLANES, TN8), x.dtype),
            ],
            interpret=interpret,
        )(x, packed, scales, zeros)
        return out[:M, :, :N8].reshape(M, logical_n)

    if prefill:
        kernel_fn = _int4_dequant_matmul_kernel
    else:
        # Decode-kernel selector (measured on-chip via
        # benchmarks/bench_int4_layer.py; see docs/BENCHMARKS.md): the
        # factored raw-nibble kernel wins at M <= 8 (1.4-2.5x bf16,
        # r2 table) but its 64 sliver dots + VPU corrections lose at
        # serving batches (M=32: 10.6 vs 8.4 ms per 8B step), where the
        # dequant-tile kernel's 8 full-depth dots win.
        default = "factored" if M <= 8 else "dequant_tile"
        pick = (decode_kernel
                or os.environ.get("LTR_TPU_INT4_DECODE_KERNEL", default))
        kernel_fn = {
            "factored": _int4_matmul_kernel,
            "batched": _int4_batched_matmul_kernel,
            "dequant_tile": _int4_dequant_matmul_kernel,
            "dequant_tile_bf16": _int4_dequant_matmul_bf16_kernel,
        }[pick]
    out = pl.pallas_call(
        functools.partial(kernel_fn,
                          group_size=group_size,
                          n_k_tiles=n_k_tiles),
        grid=(n_m_tiles, n_n_tiles, n_k_tiles),
        in_specs=[
            pl.BlockSpec((TM, TK), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN8), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PLANES, PLANES, TN8), lambda m, n, k: (k, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PLANES, PLANES, TN8), lambda m, n, k: (k, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, PLANES, TN8), lambda m, n, k: (m, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, PLANES, N8pp), x.dtype),
        scratch_shapes=[pltpu.VMEM((TM, PLANES, TN8), jnp.float32)],
        interpret=interpret,
    )(x, packed, scales, zeros)
    # Plane-major storage -> logical column order by construction.
    return out[:M, :, :N8].reshape(M, logical_n)


# ---------------------------------------------------------------------------
# Logical-layout helpers (tests + CPU path keep the simple packing)
# ---------------------------------------------------------------------------


def _unpack_int4_2d(words: jax.Array) -> jax.Array:
    """int32[R, Nw] -> int32[R, Nw*8]; nibble j -> column n*8+j (the simple
    interleaved packing used by ops/quant_repack.py)."""
    R, Nw = words.shape
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    nibbles = jax.lax.shift_right_logical(
        words[:, :, None], shifts[None, None, :]) & 0xF
    return nibbles.reshape(R, Nw * 8)


_unpack_int4 = _unpack_int4_2d


def int4_matmul_reference(x: jax.Array, w_packed: jax.Array,
                          scales: jax.Array, zeros: jax.Array,
                          group_size: int) -> jax.Array:
    """XLA reference on the simple interleaved layout (tests/CPU)."""
    q = _unpack_int4_2d(w_packed).astype(jnp.float32)  # [K, N]
    s = jnp.repeat(scales.astype(jnp.float32), group_size, axis=0)
    z = jnp.repeat(zeros.astype(jnp.float32), group_size, axis=0)
    w = (q - z) * s
    return jnp.dot(x.astype(jnp.float32), w,
                   preferred_element_type=jnp.float32).astype(x.dtype)


def interleaved_to_plane_major(w_packed: np.ndarray, scales: np.ndarray,
                               zeros: np.ndarray, group_size: int,
                               shards: int = 1, shard_axis: str = "n"):
    """Convert the simple interleaved packing to the kernel layout."""
    w_packed = np.asarray(w_packed)
    q = np.zeros((w_packed.shape[0], w_packed.shape[1] * 8), np.int32)
    wu = w_packed.astype(np.uint32)
    for j in range(8):
        q[:, j::8] = ((wu >> (4 * j)) & 0xF).astype(np.int32)
    return to_plane_major(q, np.asarray(scales), np.asarray(zeros),
                          group_size, shards=shards, shard_axis=shard_axis)


def int4_matmul_pallas(x, w_packed, scales, zeros, *, group_size: int,
                       interpret: bool = False):
    """Compatibility entry taking the interleaved layout (repacks on the
    fly — use PlaneMajorWeight / int4_matmul_plane_major in the hot path)."""
    N = w_packed.shape[1] * 8
    p, s, z = interleaved_to_plane_major(np.asarray(jax.device_get(w_packed)),
                                         np.asarray(jax.device_get(scales)),
                                         np.asarray(jax.device_get(zeros)),
                                         group_size)
    return int4_matmul_plane_major(x, jnp.asarray(p), jnp.asarray(s),
                                   jnp.asarray(z), group_size=group_size,
                                   logical_n=N, interpret=interpret)


def int4_matmul(x: jax.Array, packed: jax.Array, scales: jax.Array,
                zeros: jax.Array, group_size: int,
                logical_n: Optional[int] = None) -> jax.Array:
    """Hot-path dispatcher over the PLANE-MAJOR layout: Pallas on TPU
    (interpret-mode when forced by the CPU-mesh TP tests), XLA dequant
    elsewhere."""
    from vllm_ltr_tpu.ops import pallas_mode
    assert logical_n is not None
    mode = pallas_mode()
    if mode is not None:
        if x.shape[0] >= _two_pass_m():
            return int4_matmul_two_pass(x, packed, scales, zeros,
                                        group_size, logical_n)
        import os as _os
        return int4_matmul_plane_major(
            x, packed, scales, zeros, group_size=group_size,
            logical_n=logical_n, interpret=mode,
            decode_kernel=_os.environ.get("LTR_TPU_INT4_DECODE_KERNEL"))
    return int4_matmul_xla(x, packed, scales, zeros, group_size, logical_n)


def _two_pass_m() -> int:
    """M threshold for the two-pass (dequant-to-HBM) prefill path.

    Measured v5e (benchmarks/bench_int4.py, 7B shapes): at M=2048 the
    two-pass is traffic-bound at ~0.50x of bf16 (the dequantized weight
    makes one full HBM round trip) while the w-cached tile kernel
    dequantizes in VMEM with no extra traffic — the two-pass only wins
    once the matmul dwarfs the fixed dequant pass, around M >= ~6k,
    which is beyond any realistic prefill chunk (the scheduler's token
    budget caps dispatches at max_num_batched_tokens, typ. 2048)."""
    import os
    return int(os.environ.get("LTR_TPU_INT4_TWOPASS_M", "6144"))


def _dequant_pass_kernel(packed_ref, scales_ref, zeros_ref, out_ref):
    """One K-group of rows: unpack 8 planes, affine, write bf16.

    The XLA expression of this pass measured 0.35-0.45x of bf16 at
    M=2048 (even with grouped broadcasts, the plane stack and the
    dequantized weight both materialize through HBM); this kernel is the
    guaranteed single pass: read 0.5 B, write 2 B per element.
    """
    words = packed_ref[...].astype(jnp.uint32)  # [G, N8p]
    for j in range(PLANES):
        # Mosaic has no uint32->bf16 cast; hop through int32.
        q = ((words >> (4 * j)) & 0xF).astype(jnp.int32).astype(
            out_ref.dtype)
        s = scales_ref[0, j, :][None, :]  # [1, N8p] broadcasts over rows
        z = zeros_ref[0, j, :][None, :]
        out_ref[:, j, :] = (q - z.astype(out_ref.dtype)) * s.astype(
            out_ref.dtype)


def dequant_plane_major(packed: jax.Array, scales: jax.Array,
                        zeros: jax.Array, group_size: int, logical_n: int,
                        dtype, interpret: bool = False) -> jax.Array:
    """Dequantize a plane-major INT4 weight to ``[K_rows, logical_n]`` in
    one streaming pass (grid over K groups)."""
    Kp, N8p = packed.shape
    Kg = scales.shape[0]
    rows = Kg * group_size
    if Kp < rows:
        packed = jnp.pad(packed, ((0, rows - Kp), (0, 0)))
    N8 = logical_n // PLANES
    w = pl.pallas_call(
        _dequant_pass_kernel,
        grid=(Kg, ),
        in_specs=[
            pl.BlockSpec((group_size, N8p), lambda g: (g, 0)),
            pl.BlockSpec((1, PLANES, N8p), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, PLANES, N8p), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group_size, PLANES, N8p), lambda g:
                               (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, PLANES, N8p), dtype),
        interpret=interpret,
    )(packed[:rows], scales, zeros)
    # Plane-major -> logical: column c = j * N8 + n, a free reshape.
    return w[:, :, :N8].reshape(rows, logical_n)


def int4_matmul_two_pass(x: jax.Array, packed: jax.Array, scales: jax.Array,
                         zeros: jax.Array, group_size: int,
                         logical_n: int) -> jax.Array:
    """Large-M (long-prompt prefill) regime: dequantize the whole weight to
    the activation dtype in HBM ONCE, then run a plain MXU matmul.

    The single-pass dequant-tile kernel re-dequantizes each weight tile for
    every 512-row M tile, which left INT4 at 0.79-0.83x of bf16 at M=2048
    (docs/BENCHMARKS.md r2 table; VERDICT r2 item 8).  Here the dequant is
    ONE fused pass producing the bf16 weight (0.5 B read + 2 B written per
    element), amortized over all M rows, and the matmul runs at native
    bf16 MXU rate.

    Fusion notes (first version measured 0.29x — WORSE than the tile
    kernel): stacking f32 planes and ``jnp.repeat``-ing scales/zeros to
    full [K, N] materialized ~500 MB of f32 intermediates per 7B-MLP
    dequant.  The affine now applies in the grouped shape with broadcast
    (never materialized) and every intermediate is bf16."""
    Kp, N8p = packed.shape
    N8 = logical_n // PLANES
    K = x.shape[1]
    Kg = scales.shape[0]
    from vllm_ltr_tpu.ops import pallas_mode
    mode = pallas_mode()
    cd = x.dtype  # dequant in the activation dtype (4-bit ints are exact)
    rows = Kg * group_size
    if mode is not None:
        w = dequant_plane_major(packed, scales, zeros, group_size,
                                PLANES * N8p, cd,
                                interpret=bool(mode))  # [rows, 8*N8p]
        # Matmul over the PADDED column space (slicing w to logical N
        # would cost a second full-weight pass); drop pad columns from
        # the M-sized output instead.
        y = jnp.dot(x, w[:K], preferred_element_type=jnp.float32)
        y = y.reshape(x.shape[0], PLANES, N8p)[:, :, :N8]
        return y.reshape(x.shape[0], logical_n).astype(x.dtype)
    # XLA expression (CPU tests): affine in grouped shape — broadcasts
    # fuse, repeats would materialize.
    words = packed.astype(jnp.uint32)
    planes = [((words >> (4 * j)) & 0xF).astype(cd) for j in range(PLANES)]
    q = jnp.stack(planes, axis=1)  # [Kp, 8, N8p] storage order
    if Kp < rows:
        q = jnp.pad(q, ((0, rows - Kp), (0, 0), (0, 0)))
    qg = q[:rows].reshape(Kg, group_size, PLANES, N8p)
    s = scales.astype(cd)[:, None]  # [Kg, 1, 8, N8p]
    z = zeros.astype(cd)[:, None]
    w = ((qg - z) * s).reshape(rows, PLANES, N8p)
    # Plane-major -> logical: column c = j * N8 + n, i.e. a plain reshape.
    w = w[:K, :, :N8].reshape(K, logical_n).astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def int4_matmul_xla(x: jax.Array, packed: jax.Array, scales: jax.Array,
                    zeros: jax.Array, group_size: int,
                    logical_n: int) -> jax.Array:
    """XLA dequant of the plane-major layout (CPU tests; also the TP>1
    path for weights whose shapes didn't divide into per-shard layouts —
    GSPMD can partition this where it cannot partition a pallas_call)."""
    Kp, N8p = packed.shape
    N8 = logical_n // PLANES
    words = packed.astype(jnp.uint32)
    planes = [((words >> (4 * j)) & 0xF).astype(jnp.float32)
              for j in range(PLANES)]
    q = jnp.stack(planes, axis=1)  # [Kp, 8, N8p] storage order
    s = jnp.repeat(scales.astype(jnp.float32), group_size, axis=0)
    z = jnp.repeat(zeros.astype(jnp.float32), group_size, axis=0)
    w = (q - z[:Kp]) * s[:Kp]
    K = x.shape[1]
    y = jnp.einsum("mk,kpn->mpn", x.astype(jnp.float32), w[:K],
                   preferred_element_type=jnp.float32)
    return y[:, :, :N8].reshape(x.shape[0], logical_n).astype(x.dtype)
