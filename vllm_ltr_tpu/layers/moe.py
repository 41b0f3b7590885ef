"""Mixture-of-Experts layer (TPU-native fused MoE).

Counterpart of reference ``vllm/model_executor/layers/fused_moe/`` (Triton
fused expert GEMM + moe_align_block_size + topk_softmax, csrc/moe/): here
the idiomatic TPU formulation is capacity-based dispatch — one-hot combine
tensors turn the ragged token->expert assignment into dense batched einsums
that XLA maps straight onto the MXU, with no scatter/atomic ops:

  router logits -> top-k softmax -> dispatch [T, E, C] one-hot ->
  expert inputs [E, C, H] -> batched SwiGLU FFN -> combine-weighted sum.

Capacity drops (tokens beyond an expert's slot budget) are the standard
trade; the default factor is generous enough that serving batches see none.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.models.common import silu_and_mul
from vllm_ltr_tpu.utils import cdiv


def topk_softmax(router_logits: jax.Array,
                 top_k: int,
                 renormalize: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
    """[T, E] -> (weights [T, K], expert indices [T, K]).
    (Counterpart of csrc/moe topk_softmax, 499 LoC CUDA.)"""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    weights, idx = jax.lax.top_k(probs, top_k)
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, idx


def fused_moe(
    hidden: jax.Array,  # [T, H]
    router_logits: jax.Array,  # [T, E]
    gate_w: jax.Array,  # [E, H, I]
    up_w: jax.Array,  # [E, H, I]
    down_w: jax.Array,  # [E, I, H]
    top_k: int = 2,
    capacity_factor: float = 2.0,
    renormalize: bool = True,
) -> jax.Array:
    T, H = hidden.shape
    E = router_logits.shape[1]
    weights, expert_idx = topk_softmax(router_logits, top_k, renormalize)

    # Capacity per expert; positions are assigned first-come within expert.
    C = max(cdiv(T * top_k, E), 4)
    C = int(C * capacity_factor)
    C = min(C, T)

    # For each (token, k): its position in its expert's queue.
    onehot = jax.nn.one_hot(expert_idx, E, dtype=jnp.int32)  # [T, K, E]
    flat = onehot.reshape(T * top_k, E)
    position = jnp.cumsum(flat, axis=0) * flat - 1  # [T*K, E]
    pos_in_expert = position.reshape(T, top_k, E)

    keep = (pos_in_expert >= 0) & (pos_in_expert < C)
    # Dispatch tensor [T, K, E, C]: one-hot over capacity slots.
    pos_clip = jnp.clip(pos_in_expert, 0, C - 1)
    dispatch = (jax.nn.one_hot(pos_clip, C, dtype=hidden.dtype) *
                keep[..., None].astype(hidden.dtype) *
                onehot[..., None].astype(hidden.dtype))  # [T, K, E, C]
    combine = dispatch * weights[..., None, None].astype(hidden.dtype)
    dispatch_te = jnp.sum(dispatch, axis=1)  # [T, E, C]
    combine_te = jnp.sum(combine, axis=1)

    # Expert inputs [E, C, H] via one einsum; per-expert SwiGLU batched on
    # the leading expert axis (one big MXU-friendly batched matmul).
    expert_in = jnp.einsum("tec,th->ech", dispatch_te, hidden)
    gate = jnp.einsum("ech,ehi->eci", expert_in, gate_w)
    up = jnp.einsum("ech,ehi->eci", expert_in, up_w)
    act = silu_and_mul(gate, up)
    expert_out = jnp.einsum("eci,eih->ech", act, down_w)

    # Combine back to tokens with routing weights.
    return jnp.einsum("tec,ech->th", combine_te, expert_out)
