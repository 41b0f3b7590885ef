"""Phi (1/1.5/2) decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/phi.py: parallel
attention + MLP sharing one pre-LayerNorm, partial rotary embeddings
(``partial_rotary_factor`` of the head dim), biased projections, and a
biased lm_head.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm, linear,
                                        normal_init, run_layers, stack_layers,
                                        t2j)
from vllm_ltr_tpu.ops.attention import attend


class PhiForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", None) or QH
        D = H // QH
        keys = jax.random.split(rng, cfg.num_hidden_layers + 2)

        def layer_params(key):
            ks = jax.random.split(key, 6)
            return {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "q_b": jnp.zeros((QH * D, ), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "k_b": jnp.zeros((KH * D, ), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "v_b": jnp.zeros((KH * D, ), dtype),
                "o_w": normal_init(ks[3], (QH * D, H), dtype),
                "o_b": jnp.zeros((H, ), dtype),
                "fc1_w": normal_init(ks[4], (H, F), dtype),
                "fc1_b": jnp.zeros((F, ), dtype),
                "fc2_w": normal_init(ks[5], (F, H), dtype),
                "fc2_b": jnp.zeros((H, ), dtype),
                "ln_s": jnp.ones((H, ), dtype),
                "ln_b": jnp.zeros((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "final_ln_s": jnp.ones((H, ), dtype),
            "final_ln_b": jnp.zeros((H, ), dtype),
            "lm_head": normal_init(keys[1], (H, V), dtype),
            "lm_head_b": jnp.zeros((V, ), dtype),
            "layers": stack_layers(
                [layer_params(k) for k in keys[2:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)
        pop = sd.pop
        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"model.layers.{i}."
            layers.append({
                "q_w": t2j(pop(p + "self_attn.q_proj.weight").T, dtype),
                "q_b": t2j(pop(p + "self_attn.q_proj.bias"), dtype),
                "k_w": t2j(pop(p + "self_attn.k_proj.weight").T, dtype),
                "k_b": t2j(pop(p + "self_attn.k_proj.bias"), dtype),
                "v_w": t2j(pop(p + "self_attn.v_proj.weight").T, dtype),
                "v_b": t2j(pop(p + "self_attn.v_proj.bias"), dtype),
                "o_w": t2j(pop(p + "self_attn.dense.weight").T, dtype),
                "o_b": t2j(pop(p + "self_attn.dense.bias"), dtype),
                "fc1_w": t2j(pop(p + "mlp.fc1.weight").T, dtype),
                "fc1_b": t2j(pop(p + "mlp.fc1.bias"), dtype),
                "fc2_w": t2j(pop(p + "mlp.fc2.weight").T, dtype),
                "fc2_b": t2j(pop(p + "mlp.fc2.bias"), dtype),
                "ln_s": t2j(pop(p + "input_layernorm.weight"), dtype),
                "ln_b": t2j(pop(p + "input_layernorm.bias"), dtype),
            })
        return {
            "embed_tokens": t2j(pop("model.embed_tokens.weight"), dtype),
            "final_ln_s": t2j(pop("model.final_layernorm.weight"), dtype),
            "final_ln_b": t2j(pop("model.final_layernorm.bias"), dtype),
            "lm_head": t2j(pop("lm_head.weight").T, dtype),
            "lm_head_b": t2j(pop("lm_head.bias"), dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", None) or QH
        D = H // QH
        rot = int(getattr(cfg, "partial_rotary_factor", 0.5) * D)
        scale = D**-0.5
        eps = getattr(cfg, "layer_norm_eps", 1e-5)
        rope_theta = getattr(cfg, "rope_theta", 10000.0)
        max_pos = cfg.max_position_embeddings

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = layer_norm(h, lp["ln_s"], lp["ln_b"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"], lp["q_b"]).reshape(T, QH, D)
            k = linear(x, lp["k_w"], lp["k_b"]).reshape(T, KH, D)
            v = linear(x, lp["v_w"], lp["v_b"]).reshape(T, KH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, rot, max_pos,
                                          rope_theta, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            attn_out = linear(attn.reshape(T, QH * D), lp["o_w"], lp["o_b"])
            # Parallel MLP over the same normed input (phi blocks).
            mlp = linear(x, lp["fc1_w"], lp["fc1_b"])
            mlp = jax.nn.gelu(mlp.astype(jnp.float32),
                              approximate=True).astype(h.dtype)
            mlp = linear(mlp, lp["fc2_w"], lp["fc2_b"])
            h = residual + attn_out + mlp
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = layer_norm(h, params["final_ln_s"], params["final_ln_b"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return (jnp.dot(hidden, params["lm_head"],
                        preferred_element_type=jnp.float32) +
                params["lm_head_b"].astype(jnp.float32))
