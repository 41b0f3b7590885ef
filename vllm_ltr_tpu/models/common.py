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

Per-layer parameters are stacked on a leading layer axis; the decoder
runs as an UNROLLED python loop over layers (:func:`run_layers`). The KV
cache is one stacked array threaded through the loop at a constant layer
index — never ``lax.scan`` xs/ys, which XLA cannot alias into the donated
buffer and would copy the multi-GiB cache wholesale every step. Weight
slices at constant indices fuse into their consuming matmuls for free.
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
    # [T // block_size] destination cache block per flat token page when
    # the layout permits page-granular KV writes (ops/kv_cache.py
    # write_kv_pages); None = per-token scatter fallback.
    page_dst: Optional[jax.Array] = None


def linear(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    """x[..., in] @ w[in, out] (+ b). Weights are stored input-major so the
    MXU contraction needs no transpose. INT4-quantized weights dispatch to
    the fused dequant matmul."""
    from vllm_ltr_tpu.layers.quantization.int4 import (QuantizedWeight,
                                                       quantized_linear)
    if isinstance(w, QuantizedWeight):
        return quantized_linear(x, w, b)
    from vllm_ltr_tpu.layers.quantization.squeezellm import (
        SqueezeLLMWeight, squeezellm_linear)
    if isinstance(w, SqueezeLLMWeight):
        return squeezellm_linear(x, w, b)
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


def run_layers(layer_fn, h, kv_cache, params, capture_layer=None):
    """Unrolled decoder-layer driver.

    ``layer_fn(h, lp, kv_cache, lid, kv_scale) -> (h, kv_cache)`` where
    ``lp`` is the layer's parameter slice (constant index into the stacked
    [L, ...] arrays) and ``lid`` is the python layer index, so every cache
    update happens at a constant layer offset and XLA aliases it in place.

    ``capture_layer`` (static): additionally return the hidden state
    entering that layer (the embedded mid-layer predictor hook, reference
    deepseek.py:354-359 / llama.py:288-293); None otherwise.
    """
    num_layers = jax.tree.leaves(params["layers"])[0].shape[0]
    kv_scales = params.get("kv_scales")
    cap = None
    for lid in range(num_layers):
        if capture_layer is not None and lid == capture_layer:
            cap = h
        lp = jax.tree.map(lambda x: x[lid], params["layers"])
        ks = kv_scales[lid] if kv_scales is not None else 1.0
        h, kv_cache = layer_fn(h, lp, kv_cache, lid, ks)
    if capture_layer is not None and cap is None:
        cap = jnp.zeros_like(h)
    return h, kv_cache, cap


def dtype_by_name(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]
