"""Mixtral (sparse MoE Llama) decoder, TPU-native.

Counterpart of reference ``vllm/model_executor/models/mixtral.py`` (448 LoC
+ fused_moe Triton kernels): Llama attention + top-2-of-8 expert SwiGLU FFN
via the capacity-dispatch fused MoE (layers/moe.py).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.moe import fused_moe
from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, linear,
                                        normal_init, rms_norm, run_layers,
                                        stack_layers, t2j)
from vllm_ltr_tpu.ops.attention import attend


class MixtralForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H = cfg.hidden_size
        I = cfg.intermediate_size
        V = cfg.vocab_size
        L = cfg.num_hidden_layers
        E = cfg.num_local_experts
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH) or QH
        D = H // QH
        keys = jax.random.split(rng, L + 3)

        def layer_params(key):
            ks = jax.random.split(key, 8)
            return {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "o_w": normal_init(ks[3], (QH * D, H), dtype),
                "router_w": normal_init(ks[4], (H, E), dtype),
                "gate_w": normal_init(ks[5], (E, H, I), dtype),
                "up_w": normal_init(ks[6], (E, H, I), dtype),
                "down_w": normal_init(ks[7], (E, I, H), dtype),
                "input_ln": jnp.ones((H, ), dtype),
                "post_ln": jnp.ones((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm": jnp.ones((H, ), dtype),
            "lm_head": normal_init(keys[1], (H, V), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:2 + L]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)

        def pop(name):
            for prefix in ("model.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        L = cfg.num_hidden_layers
        E = cfg.num_local_experts
        params: Dict[str, Any] = {
            "embed_tokens": t2j(pop("embed_tokens.weight"), dtype),
            "norm": t2j(pop("norm.weight"), dtype),
        }
        if "lm_head.weight" in sd:
            params["lm_head"] = t2j(sd.pop("lm_head.weight"), dtype).T
        layers = []
        for i in range(L):
            p = f"layers.{i}."
            gate = [
                t2j(pop(p + f"block_sparse_moe.experts.{e}.w1.weight"),
                    dtype).T for e in range(E)
            ]
            down = [
                t2j(pop(p + f"block_sparse_moe.experts.{e}.w2.weight"),
                    dtype).T for e in range(E)
            ]
            up = [
                t2j(pop(p + f"block_sparse_moe.experts.{e}.w3.weight"),
                    dtype).T for e in range(E)
            ]
            layers.append({
                "q_w": t2j(pop(p + "self_attn.q_proj.weight"), dtype).T,
                "k_w": t2j(pop(p + "self_attn.k_proj.weight"), dtype).T,
                "v_w": t2j(pop(p + "self_attn.v_proj.weight"), dtype).T,
                "o_w": t2j(pop(p + "self_attn.o_proj.weight"), dtype).T,
                "router_w":
                t2j(pop(p + "block_sparse_moe.gate.weight"), dtype).T,
                "gate_w": jnp.stack(gate),
                "up_w": jnp.stack(up),
                "down_w": jnp.stack(down),
                "input_ln": t2j(pop(p + "input_layernorm.weight"), dtype),
                "post_ln":
                t2j(pop(p + "post_attention_layernorm.weight"), dtype),
            })
        params["layers"] = stack_layers(layers)
        return params

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH) or QH
        D = H // QH
        scale = D**-0.5
        rope_theta = getattr(cfg, "rope_theta", 1e6)
        max_pos = cfg.max_position_embeddings
        eps = getattr(cfg, "rms_norm_eps", 1e-5)
        top_k = getattr(cfg, "num_experts_per_tok", 2)

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = rms_norm(h, lp["input_ln"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"]).reshape(T, QH, D)
            k = linear(x, lp["k_w"]).reshape(T, KH, D)
            v = linear(x, lp["v_w"]).reshape(T, KH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                          rope_theta, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            h = residual + linear(attn.reshape(T, QH * D), lp["o_w"])

            residual = h
            x = rms_norm(h, lp["post_ln"], eps)
            router_logits = linear(x, lp["router_w"])
            moe_out = fused_moe(x, router_logits, lp["gate_w"], lp["up_w"],
                                lp["down_w"], top_k=top_k)
            h = residual + moe_out.astype(h.dtype)
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = rms_norm(h, params["norm"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        if "lm_head" in params:
            return jnp.dot(hidden, params["lm_head"],
                           preferred_element_type=jnp.float32)
        return jnp.dot(hidden, params["embed_tokens"].T,
                       preferred_element_type=jnp.float32)
