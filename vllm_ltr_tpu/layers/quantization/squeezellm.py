"""SqueezeLLM non-uniform 4-bit weight quantization.

Behavioral counterpart of reference
``vllm/model_executor/layers/quantization/squeezellm.py`` (+ the CUDA LUT
kernel, csrc/quantization/squeezellm/): each output channel stores a
16-entry lookup table of k-means centroids over its weights, and the
weight matrix stores 4-bit indices — non-uniform quantization that tracks
the weight distribution better than uniform INT4 at the same bit-width.

``quantization="squeezellm"`` quantizes float checkpoints on the fly
(sensitivity-unweighted k-means, the dense-only NUQ4 variant);
SqueezeLLM checkpoint state dicts (``qweight`` + ``lookup_table``)
convert via :func:`load_squeezellm_proj`.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_ltr_tpu.logger import init_logger

logger = init_logger(__name__)

LUT_SIZE = 16


@jax.tree_util.register_pytree_with_keys_class
@dataclass
class SqueezeLLMWeight:
    """Plane-major packed LUT indices + per-channel centroid tables.
    ``shards > 1``: per-shard layout concatenation (see
    lut_plane_major); logical dims stay full."""
    packed: jax.Array  # int32[Kp, N8p]
    lut: jax.Array  # f32[16, 8, N8p]
    out_features: int = 0
    in_features: int = 0
    shards: int = 1
    shard_axis: str = "n"

    def tree_flatten_with_keys(self):
        return ((("packed", self.packed), ("lut", self.lut)),
                (self.out_features, self.in_features, self.shards,
                 self.shard_axis))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def squeezellm_linear(x: jax.Array, w: SqueezeLLMWeight,
                      b: Optional[jax.Array] = None) -> jax.Array:
    from vllm_ltr_tpu.ops.pallas.squeezellm_matmul import (
        squeezellm_matmul, squeezellm_matmul_reference)
    from vllm_ltr_tpu.parallel.mesh import MODEL_AXIS, get_global_mesh
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if w.shards > 1:
        y = _sharded_squeezellm_matmul(x2, w)
    elif get_global_mesh().shape.get(MODEL_AXIS, 1) > 1:
        # Unsharded layout on a TP mesh: the GSPMD-partitionable XLA path.
        y = squeezellm_matmul_reference(x2, w.packed, w.lut, w.out_features)
    else:
        y = squeezellm_matmul(x2, w.packed, w.lut, logical_n=w.out_features)
    y = y.reshape(*lead, w.out_features).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def _sharded_squeezellm_matmul(x2: jax.Array,
                               w: SqueezeLLMWeight) -> jax.Array:
    """shard_map'd NUQ4 matmul over the ``model`` axis (same contract as
    int4._sharded_quantized_matmul; row-parallel LUTs are replicated)."""
    from jax.sharding import PartitionSpec as P
    from vllm_ltr_tpu.ops.pallas.squeezellm_matmul import squeezellm_matmul
    from vllm_ltr_tpu.parallel.mesh import MODEL_AXIS, get_global_mesh
    mesh = get_global_mesh()
    if w.shard_axis == "n":
        n_local = w.out_features // w.shards

        def inner(xl, p, l):
            return squeezellm_matmul(xl, p, l, logical_n=n_local)

        fn = jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P(None, MODEL_AXIS), P(None, None, MODEL_AXIS)),
            out_specs=P(None, MODEL_AXIS), check_vma=False)
        return fn(x2, w.packed, w.lut)

    def inner(xl, p, l):
        part = squeezellm_matmul(xl, p, l, logical_n=w.out_features)
        return jax.lax.psum(part, MODEL_AXIS)

    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(MODEL_AXIS, None), P()),
        out_specs=P(), check_vma=False)
    return fn(x2, w.packed, w.lut)


def _kmeans_1d(values: np.ndarray, k: int = LUT_SIZE,
               iters: int = 8) -> np.ndarray:
    """Lloyd's k-means on one channel's weights; centroids sorted."""
    lo, hi = float(values.min()), float(values.max())
    if hi <= lo:
        return np.full(k, lo, np.float32)
    centroids = np.linspace(lo, hi, k).astype(np.float32)
    for _ in range(iters):
        assign = np.argmin(np.abs(values[:, None] - centroids[None, :]),
                           axis=1)
        for i in range(k):
            sel = values[assign == i]
            if len(sel):
                centroids[i] = sel.mean()
        centroids = np.sort(centroids)
    return centroids


def quantize_squeezellm(w: np.ndarray, shards: int = 1,
                        shard_axis: str = "n") -> SqueezeLLMWeight:
    """Quantize one [K, N] float weight to per-channel NUQ4."""
    from vllm_ltr_tpu.ops.pallas.squeezellm_matmul import lut_plane_major
    K, N = w.shape
    w = np.asarray(w, np.float32)
    lut = np.zeros((N, LUT_SIZE), np.float32)
    idx = np.zeros((K, N), np.uint8)
    for n in range(N):
        c = _kmeans_1d(w[:, n])
        lut[n] = c
        idx[:, n] = np.argmin(np.abs(w[:, n][:, None] - c[None, :]), axis=1)
    packed, lut_pm = lut_plane_major(idx, lut, shards=shards,
                                     shard_axis=shard_axis)
    return SqueezeLLMWeight(jnp.asarray(packed), jnp.asarray(lut_pm),
                            out_features=N, in_features=K, shards=shards,
                            shard_axis=shard_axis)


def load_squeezellm_proj(sd: Dict[str, Any], prefix: str,
                         dtype) -> SqueezeLLMWeight:
    """Convert one SqueezeLLM checkpoint projection: ``qweight``
    int32[K//8, N] (8 sequential 4-bit indices per word along K) +
    ``lookup_table`` [N, 16]."""
    from vllm_ltr_tpu.ops.pallas.squeezellm_matmul import lut_plane_major
    from vllm_ltr_tpu.layers.quantization.int4 import (_HF_ROW_PARALLEL,
                                                       shard_plan)
    qweight = np.asarray(sd[prefix + ".qweight"])
    lut = np.asarray(sd[prefix + ".lookup_table"], np.float32)
    Kw, N = qweight.shape
    idx = np.zeros((Kw * 8, N), np.uint8)
    for j in range(8):
        idx[j::8] = (qweight >> (4 * j)) & 0xF
    leaf = prefix.rsplit(".", 1)[-1]
    proxy = "o_w" if leaf in _HF_ROW_PARALLEL else "q_w"
    sh, ax = shard_plan(proxy, Kw * 8, N, group_size=1)
    packed, lut_pm = lut_plane_major(idx, lut, shards=sh, shard_axis=ax)
    return SqueezeLLMWeight(jnp.asarray(packed), jnp.asarray(lut_pm),
                            out_features=N, in_features=Kw * 8, shards=sh,
                            shard_axis=ax)


def maybe_quantize_params_squeezellm(params: Dict[str, Any]
                                     ) -> Dict[str, Any]:
    """Replace eligible dense weights with SqueezeLLMWeight (mirrors
    int4.maybe_quantize_params; stacked [L, K, N] weights quantize per
    layer and restack)."""
    from vllm_ltr_tpu.layers.quantization.int4 import (QUANTIZABLE,
                                                       _is_dense_leaf)

    def convert(path, leaf):
        from vllm_ltr_tpu.layers.quantization.int4 import shard_plan
        names = [getattr(p, "key", str(p)) for p in path]
        name = names[-1] if names else ""
        if name not in QUANTIZABLE or not hasattr(leaf, "ndim"):
            return leaf
        arr = np.asarray(jax.device_get(leaf), np.float32)
        if arr.ndim == 3:
            sh, ax = shard_plan(name, arr.shape[1], arr.shape[2],
                                group_size=1)
            qs = [quantize_squeezellm(arr[i], shards=sh, shard_axis=ax)
                  for i in range(arr.shape[0])]
            return SqueezeLLMWeight(
                jnp.stack([q.packed for q in qs]),
                jnp.stack([q.lut for q in qs]),
                out_features=qs[0].out_features,
                in_features=qs[0].in_features,
                shards=qs[0].shards, shard_axis=qs[0].shard_axis)
        if arr.ndim == 2:
            sh, ax = shard_plan(name, arr.shape[0], arr.shape[1],
                                group_size=1)
            return quantize_squeezellm(arr, shards=sh, shard_axis=ax)
        return leaf

    logger.info("Quantizing weights to SqueezeLLM NUQ4")
    return jax.tree_util.tree_map_with_path(convert, params,
                                            is_leaf=_is_dense_leaf)
