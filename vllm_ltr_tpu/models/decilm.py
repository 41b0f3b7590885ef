"""DeciLM decoder, TPU-native.

Behavioral counterpart of reference ``vllm/model_executor/models/decilm.py``:
a Llama body with *variable* grouped-query attention — the per-layer KV head
count comes from ``config.num_key_value_heads_per_layer``. Like the
reference (decilm.py:49-55, "we normalize the weights upon loading, and use
uniform GQA with the max value"), loading degroups every layer's K/V
projections to the maximum KV head count by repeating each head — an exact
transformation (query head q reads kv head q // group both before and after)
— so the paged cache and kernels stay uniform-shape. Everything after
loading IS the Llama model.
"""
from __future__ import annotations

from copy import deepcopy
from typing import Any, Dict

import torch

from vllm_ltr_tpu.models.llama import LlamaForCausalLM


def _max_kv_heads(cfg) -> int:
    per_layer = getattr(cfg, "num_key_value_heads_per_layer", None)
    if per_layer:
        return max(per_layer)
    return getattr(cfg, "num_key_value_heads",
                   cfg.num_attention_heads) or cfg.num_attention_heads


def _uniform_cfg(cfg):
    ucfg = deepcopy(cfg)
    ucfg.num_key_value_heads = _max_kv_heads(cfg)
    return ucfg


def _degroup(weight: torch.Tensor, kv_heads: int, max_kv: int,
             head_dim: int) -> torch.Tensor:
    """Repeat each KV head's projection rows so kv_heads -> max_kv.

    weight is the HF [out, in] = [kv_heads * head_dim, hidden] matrix.
    repeat_interleave keeps the query->kv mapping exact: after expansion by
    r = max_kv // kv_heads, query head q maps to expanded head q // G_max,
    whose rows are original head (q // G_max) // r = q // G_old.
    """
    if kv_heads == max_kv:
        return weight
    r = max_kv // kv_heads
    out, hidden = weight.shape
    return (weight.reshape(kv_heads, head_dim,
                           hidden).repeat_interleave(r, dim=0).reshape(
                               max_kv * head_dim, hidden))


class DeciLMForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        return LlamaForCausalLM.init_params(_uniform_cfg(cfg), rng, dtype)

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        per_layer = getattr(cfg, "num_key_value_heads_per_layer", None)
        max_kv = _max_kv_heads(cfg)
        D = cfg.hidden_size // cfg.num_attention_heads
        sd = dict(state_dict)
        if per_layer:
            for i, kv in enumerate(per_layer):
                for name in ("k_proj", "v_proj"):
                    for prefix in ("model.", ""):
                        key = f"{prefix}layers.{i}.self_attn.{name}.weight"
                        if key in sd:
                            sd[key] = _degroup(sd[key], kv, max_kv, D)
        return LlamaForCausalLM.params_from_torch(_uniform_cfg(cfg), sd,
                                                  dtype)

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta, cfg,
                decode_mode: bool = False, **kwargs):
        return LlamaForCausalLM.forward(params, tokens, positions, kv_cache,
                                        meta, _uniform_cfg(cfg),
                                        decode_mode=decode_mode, **kwargs)

    @staticmethod
    def compute_logits(params, hidden, cfg):
        return LlamaForCausalLM.compute_logits(params, hidden, cfg)
