"""INT4 weight-only quantized linear layers.

``QuantizedWeight`` is a pytree-registered container so quantized params
flow through ``lax.scan`` layer stacking and jit like dense arrays; the
model's ``linear()`` dispatches on it transparently.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_ltr_tpu.logger import init_logger

logger = init_logger(__name__)

DEFAULT_GROUP_SIZE = 128

# Weight names eligible for quantization (projections; embeddings, norms and
# the lm head stay in the compute dtype, matching the reference formats).
QUANTIZABLE = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w",
               "qkv_w", "gateup_w", "out_w", "fc1_w", "fc2_w")
# Tensor-parallel orientation by weight name (mirrors the executor's
# _param_spec patterns): column-parallel shards N, row-parallel shards K.
COL_PARALLEL = ("q_w", "k_w", "v_w", "gate_w", "up_w", "fc1_w", "qkv_w")
ROW_PARALLEL = ("o_w", "down_w", "fc2_w", "out_w")


def shard_plan(name: str, K: int, N: int,
               group_size: int = DEFAULT_GROUP_SIZE):
    """(shards, shard_axis) for a quantized weight: the global mesh's
    ``model``-axis size when the weight divides cleanly into per-shard
    plane-major layouts, else (1, axis) — the single-layout fallback that
    the XLA dequant path serves under GSPMD."""
    from vllm_ltr_tpu.parallel.mesh import MODEL_AXIS, get_global_mesh
    axis = "k" if name in ROW_PARALLEL else "n"
    tp = get_global_mesh().shape.get(MODEL_AXIS, 1)
    if tp <= 1:
        return 1, axis
    if axis == "n" and N % (tp * 8) == 0:
        return tp, axis
    if axis == "k" and K % (tp * group_size) == 0:
        return tp, axis
    return 1, axis


@jax.tree_util.register_pytree_with_keys_class
@dataclass
class QuantizedWeight:
    """Plane-major canonical INT4 layout (ops/pallas/int4_matmul.py).

    With ``shards > 1`` the storage arrays are a concatenation of
    per-shard plane-major layouts along the ``shard_axis`` storage axis
    (lane axis for "n", K axis for "k"); see ``to_plane_major``.
    ``out_features``/``in_features`` stay the LOGICAL full dims."""
    packed: jax.Array  # int32[Kp, N8p]
    scales: jax.Array  # f32[Kp//G, 8, N8p]
    zeros: jax.Array  # f32[Kp//G, 8, N8p]
    group_size: int = DEFAULT_GROUP_SIZE
    out_features: int = 0
    in_features: int = 0
    shards: int = 1
    shard_axis: str = "n"

    def tree_flatten_with_keys(self):
        return ((("packed", self.packed), ("scales", self.scales),
                 ("zeros", self.zeros)),
                (self.group_size, self.out_features, self.in_features,
                 self.shards, self.shard_axis))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def quantized_linear(x: jax.Array, w: QuantizedWeight,
                     b: Optional[jax.Array] = None) -> jax.Array:
    """x[..., K] @ dequant(w)[K, N] through the fused INT4 kernel
    (shard_map'd over the ``model`` axis when the weight is TP-sharded)."""
    from vllm_ltr_tpu.ops.pallas.int4_matmul import (int4_matmul,
                                                     int4_matmul_xla)
    from vllm_ltr_tpu.parallel.mesh import MODEL_AXIS, get_global_mesh
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if w.shards > 1:
        y = _sharded_quantized_matmul(x2, w)
    elif get_global_mesh().shape.get(MODEL_AXIS, 1) > 1:
        # TP>1 but the weight didn't divide into per-shard layouts: the
        # XLA dequant path, which GSPMD partitions (a bare pallas_call
        # would force replication).
        y = int4_matmul_xla(x2, w.packed, w.scales, w.zeros, w.group_size,
                            w.out_features)
    else:
        y = int4_matmul(x2, w.packed, w.scales, w.zeros, w.group_size,
                        logical_n=w.out_features)
    y = y.reshape(*lead, w.out_features).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def _sharded_quantized_matmul(x2: jax.Array, w: QuantizedWeight) -> jax.Array:
    """INT4 matmul under shard_map over the ``model`` axis: each device
    runs the unchanged Pallas kernel on its self-contained plane-major
    shard (column-parallel keeps outputs sharded over N; row-parallel
    psums partial products — the Megatron contract the reference gets from
    per-rank CUDA GEMMs + NCCL all-reduce, linear.py RowParallelLinear)."""
    from jax.sharding import PartitionSpec as P
    from vllm_ltr_tpu.ops.pallas.int4_matmul import int4_matmul
    from vllm_ltr_tpu.parallel.mesh import MODEL_AXIS, get_global_mesh
    mesh = get_global_mesh()
    if w.shard_axis == "n":
        n_local = w.out_features // w.shards

        def inner(xl, p, s, z):
            return int4_matmul(xl, p, s, z, w.group_size, logical_n=n_local)

        fn = jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P(None, MODEL_AXIS), P(None, None, MODEL_AXIS),
                      P(None, None, MODEL_AXIS)),
            out_specs=P(None, MODEL_AXIS), check_vma=False)
        return fn(x2, w.packed, w.scales, w.zeros)

    def inner(xl, p, s, z):
        part = int4_matmul(xl, p, s, z, w.group_size,
                           logical_n=w.out_features)
        return jax.lax.psum(part, MODEL_AXIS)

    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(MODEL_AXIS, None),
                  P(MODEL_AXIS, None, None), P(MODEL_AXIS, None, None)),
        out_specs=P(), check_vma=False)
    return fn(x2, w.packed, w.scales, w.zeros)


def _make_quantized(interleaved_packed, scales, zeros, group_size,
                    K, N, shards: int = 1,
                    shard_axis: str = "n") -> QuantizedWeight:
    from vllm_ltr_tpu.ops.pallas.int4_matmul import (
        interleaved_to_plane_major)
    p, s, z = interleaved_to_plane_major(interleaved_packed, scales, zeros,
                                         group_size, shards=shards,
                                         shard_axis=shard_axis)
    return QuantizedWeight(jnp.asarray(p), jnp.asarray(s), jnp.asarray(z),
                           group_size=group_size, out_features=N,
                           in_features=K, shards=shards,
                           shard_axis=shard_axis)


def quantize_array(w: np.ndarray,
                   group_size: int = DEFAULT_GROUP_SIZE,
                   shards: int = 1,
                   shard_axis: str = "n") -> QuantizedWeight:
    """Quantize one [K, N] float weight (on-the-fly 'int4' mode)."""
    from vllm_ltr_tpu.ops.quant_repack import quantize_int4
    K, N = w.shape
    g = group_size if K % group_size == 0 else _largest_group(K, group_size)
    packed, scales, zeros = quantize_int4(np.asarray(w, np.float32), g)
    return _make_quantized(packed, scales, zeros, g, K, N, shards=shards,
                           shard_axis=shard_axis)


def _largest_group(K: int, target: int) -> int:
    g = target
    while g > 1 and K % g != 0:
        g //= 2
    return max(g, 1)


def maybe_quantize_params(params: Dict[str, Any],
                          quantization: Optional[str],
                          group_size: int = DEFAULT_GROUP_SIZE
                          ) -> Dict[str, Any]:
    """'int4' mode: replace eligible dense weights with QuantizedWeight.
    Layer-stacked weights ([L, K, N]) quantize per layer and restack."""
    if quantization != "int4":
        return params

    def convert(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        name = names[-1] if names else ""
        if name not in QUANTIZABLE or not hasattr(leaf, "ndim"):
            return leaf
        arr = np.asarray(jax.device_get(leaf), np.float32)
        if arr.ndim == 3:  # stacked [L, K, N]
            sh, ax = shard_plan(name, arr.shape[1], arr.shape[2], group_size)
            qs = [quantize_array(arr[i], group_size, shards=sh, shard_axis=ax)
                  for i in range(arr.shape[0])]
            q0 = qs[0]
            return QuantizedWeight(
                jnp.stack([q.packed for q in qs]),
                jnp.stack([q.scales for q in qs]),
                jnp.stack([q.zeros for q in qs]),
                group_size=q0.group_size,
                out_features=q0.out_features,
                in_features=q0.in_features,
                shards=q0.shards, shard_axis=q0.shard_axis)
        if arr.ndim == 2:
            sh, ax = shard_plan(name, arr.shape[0], arr.shape[1], group_size)
            return quantize_array(arr, group_size, shards=sh, shard_axis=ax)
        return leaf

    logger.info("Quantizing weights to INT4 (group %d)", group_size)
    return jax.tree_util.tree_map_with_path(convert, params,
                                            is_leaf=_is_dense_leaf)


def _is_dense_leaf(x):
    return hasattr(x, "ndim") and not isinstance(x, QuantizedWeight)


# ---------------------------------------------------------------------------
# Checkpoint loading (AWQ / AutoGPTQ state dicts)
# ---------------------------------------------------------------------------


def detect_checkpoint_quantization(hf_config) -> Optional[str]:
    qc = getattr(hf_config, "quantization_config", None)
    if qc is None:
        return None
    method = (qc.get("quant_method")
              if isinstance(qc, dict) else getattr(qc, "quant_method", None))
    if method in ("awq", "gptq"):
        return method
    return None


# HF projection names -> TP orientation (checkpoint-side counterpart of
# COL_PARALLEL/ROW_PARALLEL above).
_HF_ROW_PARALLEL = ("o_proj", "down_proj", "fc2", "out_proj", "dense",
                    "dense_4h_to_h", "c_proj", "w2", "wo")


def load_quantized_proj(sd: Dict[str, Any], prefix: str,
                        method: str) -> QuantizedWeight:
    """Build a QuantizedWeight from HF checkpoint tensors at `prefix`
    (e.g. 'model.layers.0.self_attn.q_proj')."""
    from vllm_ltr_tpu.ops.quant_repack import repack_awq, repack_gptq

    def t(name):
        return np.asarray(sd.pop(prefix + "." + name).cpu().numpy())

    qweight = t("qweight")
    scales = np.asarray(sd.pop(prefix + ".scales").cpu().float().numpy())
    qzeros = t("qzeros")
    if method == "awq":
        packed, s, z = repack_awq(qweight, qzeros, scales)
    else:
        g_idx = None
        if prefix + ".g_idx" in sd:
            g_idx = np.asarray(sd.pop(prefix + ".g_idx").cpu().numpy())
        packed, s, z = repack_gptq(qweight, qzeros, scales, g_idx)
    K = packed.shape[0]
    N = packed.shape[1] * 8
    group = K // s.shape[0]
    leaf = prefix.rsplit(".", 1)[-1]
    proxy_name = "o_w" if leaf in _HF_ROW_PARALLEL else "q_w"
    sh, ax = shard_plan(proxy_name, K, N, group)
    return _make_quantized(packed, s, z, group, K, N, shards=sh,
                           shard_axis=ax)
