"""Qwen2 decoder: Llama architecture + attention QKV biases.

Counterpart of reference ``vllm/model_executor/models/qwen2.py``.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, linear,
                                        normal_init, rms_norm, run_layers,
                                        silu_and_mul, stack_layers, t2j)
from vllm_ltr_tpu.models.llama import LlamaForCausalLM
from vllm_ltr_tpu.ops.attention import attend


class Qwen2ForCausalLM(LlamaForCausalLM):

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        params = LlamaForCausalLM.init_params(cfg, rng, dtype)
        H = cfg.hidden_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH) or QH
        D = H // QH
        L = cfg.num_hidden_layers
        params["layers"]["q_b"] = jnp.zeros((L, QH * D), dtype)
        params["layers"]["k_b"] = jnp.zeros((L, KH * D), dtype)
        params["layers"]["v_b"] = jnp.zeros((L, KH * D), dtype)
        return params

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)
        params = LlamaForCausalLM.params_from_torch(cfg, dict(sd), dtype)
        L = cfg.num_hidden_layers

        def pop(name):
            for prefix in ("model.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        qb, kb, vb = [], [], []
        for i in range(L):
            p = f"layers.{i}.self_attn."
            qb.append(t2j(pop(p + "q_proj.bias"), dtype))
            kb.append(t2j(pop(p + "k_proj.bias"), dtype))
            vb.append(t2j(pop(p + "v_proj.bias"), dtype))
        params["layers"]["q_b"] = jnp.stack(qb)
        params["layers"]["k_b"] = jnp.stack(kb)
        params["layers"]["v_b"] = jnp.stack(vb)
        return params

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH) or QH
        D = H // QH
        scale = D**-0.5
        rope_theta = getattr(cfg, "rope_theta", 10000.0)
        max_pos = cfg.max_position_embeddings
        eps = getattr(cfg, "rms_norm_eps", 1e-6)
        sliding_window = (getattr(cfg, "sliding_window", None) if getattr(
            cfg, "use_sliding_window", False) else None)

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = rms_norm(h, lp["input_ln"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"], lp["q_b"]).reshape(T, QH, D)
            k = linear(x, lp["k_w"], lp["k_b"]).reshape(T, KH, D)
            v = linear(x, lp["v_w"], lp["v_b"]).reshape(T, KH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                          rope_theta, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode,
                                    sliding_window=sliding_window,
                                    kv_scale=kv_scale)
            h = residual + linear(attn.reshape(T, QH * D), lp["o_w"])

            residual = h
            x = rms_norm(h, lp["post_ln"], eps)
            x = silu_and_mul(linear(x, lp["gate_w"]), linear(x, lp["up_w"]))
            h = residual + linear(x, lp["down_w"])
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = rms_norm(h, params["norm"], eps)
        return h, kv_cache
