"""Shared model machinery: attention metadata, functional layers, init.

The model layer is pure functional JAX: parameters are pytrees of jnp
arrays; each architecture exposes

* ``init_params(hf_config, rng, dtype)`` — random init (DummyModelLoader
  equivalent, reference model_loader/loader.py:246),
* ``params_from_torch(hf_config, state_dict, dtype)`` — HF weight
  conversion (DefaultModelLoader equivalent),
* ``forward(params, tokens, positions, kv_cache, meta, cfg)`` →
  (hidden[T, H], new_kv_cache),
* ``compute_logits(params, hidden, cfg)`` → [*, V].

Per-layer parameters are stacked on a leading layer axis and the decoder
runs as a single ``lax.scan`` over layers — one compiled layer body instead
of L unrolled copies (fast compiles, XLA-friendly).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class AttentionMetadata(NamedTuple):
    """Flattened-batch attention metadata (counterpart of the reference's
    AttentionMetadata + PagedAttentionMetadata, vllm/attention/backends/
    abstract.py:60-124 and ops/paged_attn.py:14-28)."""
    # [T] sequence row of each token (-1 = padding).
    token_seq: jax.Array
    # [T] absolute position of each token (duplicates `positions` for
    # attention masking; kept separate for clarity).
    token_pos: jax.Array
    # [T] flat cache slot (block * block_size + offset; -1 = trash).
    slot_mapping: jax.Array
    # [S, MB] physical block numbers per sequence row.
    block_tables: jax.Array
    # [S] context length per sequence AFTER this step's tokens.
    seq_lens: jax.Array
    # [T] LoRA bank slot per token (0 = no adapter); None when LoRA is off.
    lora_slots: Optional[jax.Array] = None
    # LTR: produce predictor scores this step (embedded predictor hook).
    need_score: bool = False
    # Static query-tile size when the flat layout is tile-aligned (enables
    # the Pallas chunked-prefill kernel); None = unaligned layout.
    prefill_tile: Optional[int] = None


def linear(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    """x[..., in] @ w[in, out] (+ b). Weights are stored input-major so the
    MXU contraction needs no transpose. INT4-quantized weights dispatch to
    the fused dequant matmul."""
    from vllm_ltr_tpu.layers.quantization.int4 import (QuantizedWeight,
                                                       quantized_linear)
    if isinstance(w, QuantizedWeight):
        return quantized_linear(x, w, b)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * scale).astype(x.dtype)


def silu_and_mul(gate: jax.Array, up: jax.Array) -> jax.Array:
    """SwiGLU activation (reference csrc/activation_kernels.cu silu_and_mul —
    on TPU XLA fuses this into the surrounding matmuls)."""
    return jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up


def normal_init(key, shape, dtype, std: float = 0.02):
    return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)


def t2j(tensor, dtype) -> jnp.ndarray:
    """torch tensor -> jnp array in the given dtype."""
    arr = np.asarray(tensor.detach().to("cpu").float().numpy())
    return jnp.asarray(arr, dtype=dtype)


def stack_layers(layer_param_list):
    """List of per-layer param dicts -> one dict of [L, ...] arrays."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_param_list)


def dtype_by_name(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]
