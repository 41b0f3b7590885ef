"""StarCoder2 decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/starcoder2.py: GQA
with biased projections, LayerNorms, rotary positions, tanh-GELU c_fc /
c_proj MLP, optional sliding window, optionally tied lm_head.
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


class Starcoder2ForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        QH, KH = cfg.num_attention_heads, cfg.num_key_value_heads
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
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
                "ln2_b": jnp.zeros((H, ), dtype),
            }

        params = {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm_s": jnp.ones((H, ), dtype),
            "norm_b": jnp.zeros((H, ), dtype),
            "layers": stack_layers(
                [layer_params(k) for k in keys[2:]]),
        }
        if not getattr(cfg, "tie_word_embeddings", True):
            params["lm_head"] = normal_init(keys[1], (H, V), dtype)
        return params

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
                "o_w": t2j(pop(p + "self_attn.o_proj.weight").T, dtype),
                "o_b": t2j(pop(p + "self_attn.o_proj.bias"), dtype),
                "fc1_w": t2j(pop(p + "mlp.c_fc.weight").T, dtype),
                "fc1_b": t2j(pop(p + "mlp.c_fc.bias"), dtype),
                "fc2_w": t2j(pop(p + "mlp.c_proj.weight").T, dtype),
                "fc2_b": t2j(pop(p + "mlp.c_proj.bias"), dtype),
                "ln1_s": t2j(pop(p + "input_layernorm.weight"), dtype),
                "ln1_b": t2j(pop(p + "input_layernorm.bias"), dtype),
                "ln2_s": t2j(pop(p + "post_attention_layernorm.weight"),
                             dtype),
                "ln2_b": t2j(pop(p + "post_attention_layernorm.bias"),
                             dtype),
            })
        params = {
            "embed_tokens": t2j(pop("model.embed_tokens.weight"), dtype),
            "norm_s": t2j(pop("model.norm.weight"), dtype),
            "norm_b": t2j(pop("model.norm.bias"), dtype),
            "layers": stack_layers(layers),
        }
        if "lm_head.weight" in sd:
            params["lm_head"] = t2j(pop("lm_head.weight").T, dtype)
        return params

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        QH, KH = cfg.num_attention_heads, cfg.num_key_value_heads
        D = H // QH
        scale = D**-0.5
        eps = getattr(cfg, "norm_epsilon", 1e-5)
        rope_theta = getattr(cfg, "rope_theta", 10000.0)
        max_pos = cfg.max_position_embeddings
        window = getattr(cfg, "sliding_window", None)

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = layer_norm(h, lp["ln1_s"], lp["ln1_b"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"], lp["q_b"]).reshape(T, QH, D)
            k = linear(x, lp["k_w"], lp["k_b"]).reshape(T, KH, D)
            v = linear(x, lp["v_w"], lp["v_b"]).reshape(T, KH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                          rope_theta, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode,
                                    sliding_window=window)
            h = residual + linear(attn.reshape(T, QH * D), lp["o_w"],
                                  lp["o_b"])

            residual = h
            x = layer_norm(h, lp["ln2_s"], lp["ln2_b"], eps)
            x = linear(x, lp["fc1_w"], lp["fc1_b"])
            x = jax.nn.gelu(x.astype(jnp.float32),
                            approximate=True).astype(h.dtype)
            h = residual + linear(x, lp["fc2_w"], lp["fc2_b"])
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = layer_norm(h, params["norm_s"], params["norm_b"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        if "lm_head" in params:
            return jnp.dot(hidden, params["lm_head"],
                           preferred_element_type=jnp.float32)
        return jnp.dot(hidden, params["embed_tokens"].T,
                       preferred_element_type=jnp.float32)
