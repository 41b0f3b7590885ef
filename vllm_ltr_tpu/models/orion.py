"""Orion (OrionStarAI) decoder, TPU-native.

Behavioral counterpart of reference ``vllm/model_executor/models/orion.py``:
a Llama-shaped body (rotary GQA attention, SwiGLU MLP) whose norms are
biased **LayerNorm** instead of RMSNorm (reference orion.py:166-169,218 —
note the LayerNorm eps comes from ``rms_norm_eps``), with a plain
(non-fused-add) residual chain.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm, linear,
                                        normal_init, run_layers, silu_and_mul,
                                        stack_layers, t2j)
from vllm_ltr_tpu.ops.attention import attend


class OrionForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH) or QH
        D = H // QH
        keys = jax.random.split(rng, cfg.num_hidden_layers + 2)

        def layer_params(key):
            ks = jax.random.split(key, 7)
            return {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "o_w": normal_init(ks[3], (QH * D, H), dtype),
                "gate_w": normal_init(ks[4], (H, F), dtype),
                "up_w": normal_init(ks[5], (H, F), dtype),
                "down_w": normal_init(ks[6], (F, H), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
                "ln2_b": jnp.zeros((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm_s": jnp.ones((H, ), dtype),
            "norm_b": jnp.zeros((H, ), dtype),
            "lm_head": normal_init(keys[1], (H, V), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)

        def pop(name):
            for prefix in ("model.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"layers.{i}."
            layers.append({
                "q_w": t2j(pop(p + "self_attn.q_proj.weight"), dtype).T,
                "k_w": t2j(pop(p + "self_attn.k_proj.weight"), dtype).T,
                "v_w": t2j(pop(p + "self_attn.v_proj.weight"), dtype).T,
                "o_w": t2j(pop(p + "self_attn.o_proj.weight"), dtype).T,
                "gate_w": t2j(pop(p + "mlp.gate_proj.weight"), dtype).T,
                "up_w": t2j(pop(p + "mlp.up_proj.weight"), dtype).T,
                "down_w": t2j(pop(p + "mlp.down_proj.weight"), dtype).T,
                "ln1_s": t2j(pop(p + "input_layernorm.weight"), dtype),
                "ln1_b": t2j(pop(p + "input_layernorm.bias"), dtype),
                "ln2_s": t2j(pop(p + "post_attention_layernorm.weight"),
                             dtype),
                "ln2_b": t2j(pop(p + "post_attention_layernorm.bias"),
                             dtype),
            })
        return {
            "embed_tokens": t2j(pop("embed_tokens.weight"), dtype),
            "norm_s": t2j(pop("norm.weight"), dtype),
            "norm_b": t2j(pop("norm.bias"), dtype),
            "lm_head": t2j(sd.pop("lm_head.weight"), dtype).T,
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH) or QH
        D = H // QH
        scale = D**-0.5
        eps = getattr(cfg, "rms_norm_eps", 1e-5)  # LayerNorm eps, see module doc
        base = getattr(cfg, "rope_theta", 10000.0)
        max_pos = cfg.max_position_embeddings

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = layer_norm(h, lp["ln1_s"], lp["ln1_b"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"]).reshape(T, QH, D)
            k = linear(x, lp["k_w"]).reshape(T, KH, D)
            v = linear(x, lp["v_w"]).reshape(T, KH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                          base, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            h = residual + linear(attn.reshape(T, QH * D), lp["o_w"])

            residual = h
            x = layer_norm(h, lp["ln2_s"], lp["ln2_b"], eps)
            x = silu_and_mul(linear(x, lp["gate_w"]), linear(x, lp["up_w"]))
            h = residual + linear(x, lp["down_w"])
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = layer_norm(h, params["norm_s"], params["norm_b"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return jnp.dot(hidden, params["lm_head"],
                       preferred_element_type=jnp.float32)
