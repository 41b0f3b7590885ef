"""GPT-J decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/gpt_j.py: interleaved
(GPT-J style) partial rotary, parallel attention+MLP residual off a single
LayerNorm, bias-free attention projections, untied lm_head with bias.
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


class GPTJForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, V = cfg.n_embd, cfg.vocab_size
        NH = cfg.n_head
        D = H // NH
        F = getattr(cfg, "n_inner", None) or 4 * H
        keys = jax.random.split(rng, cfg.n_layer + 2)

        def layer_params(key):
            ks = jax.random.split(key, 6)
            return {
                "q_w": normal_init(ks[0], (H, NH * D), dtype),
                "k_w": normal_init(ks[1], (H, NH * D), dtype),
                "v_w": normal_init(ks[2], (H, NH * D), dtype),
                "o_w": normal_init(ks[3], (NH * D, H), dtype),
                "fc1_w": normal_init(ks[4], (H, F), dtype),
                "fc1_b": jnp.zeros((F, ), dtype),
                "fc2_w": normal_init(ks[5], (F, H), dtype),
                "fc2_b": jnp.zeros((H, ), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm_s": jnp.ones((H, ), dtype),
            "norm_b": jnp.zeros((H, ), dtype),
            "lm_head": normal_init(keys[1], (H, V), dtype),
            "lm_head_b": jnp.zeros((V, ), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)
        pop = sd.pop
        layers = []
        for i in range(cfg.n_layer):
            p = f"transformer.h.{i}."
            layers.append({
                "q_w": t2j(pop(p + "attn.q_proj.weight").T, dtype),
                "k_w": t2j(pop(p + "attn.k_proj.weight").T, dtype),
                "v_w": t2j(pop(p + "attn.v_proj.weight").T, dtype),
                "o_w": t2j(pop(p + "attn.out_proj.weight").T, dtype),
                "fc1_w": t2j(pop(p + "mlp.fc_in.weight").T, dtype),
                "fc1_b": t2j(pop(p + "mlp.fc_in.bias"), dtype),
                "fc2_w": t2j(pop(p + "mlp.fc_out.weight").T, dtype),
                "fc2_b": t2j(pop(p + "mlp.fc_out.bias"), dtype),
                "ln1_s": t2j(pop(p + "ln_1.weight"), dtype),
                "ln1_b": t2j(pop(p + "ln_1.bias"), dtype),
            })
        return {
            "embed_tokens": t2j(pop("transformer.wte.weight"), dtype),
            "norm_s": t2j(pop("transformer.ln_f.weight"), dtype),
            "norm_b": t2j(pop("transformer.ln_f.bias"), dtype),
            "lm_head": t2j(pop("lm_head.weight").T, dtype),
            "lm_head_b": t2j(pop("lm_head.bias"), dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.n_embd
        NH = cfg.n_head
        D = H // NH
        scale = D**-0.5
        eps = getattr(cfg, "layer_norm_epsilon", 1e-5)
        rotary_dim = getattr(cfg, "rotary_dim", None) or D
        max_pos = cfg.n_positions

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            x = layer_norm(h, lp["ln1_s"], lp["ln1_b"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"]).reshape(T, NH, D)
            k = linear(x, lp["k_w"]).reshape(T, NH, D)
            v = linear(x, lp["v_w"]).reshape(T, NH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, rotary_dim,
                                          max_pos, 10000.0, False)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            attn_out = linear(attn.reshape(T, NH * D), lp["o_w"])

            # Parallel residual: MLP reads the same normed input.
            m = linear(x, lp["fc1_w"], lp["fc1_b"])
            m = jax.nn.gelu(m.astype(jnp.float32),
                            approximate=True).astype(h.dtype)
            m = linear(m, lp["fc2_w"], lp["fc2_b"])
            return h + attn_out + m, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = layer_norm(h, params["norm_s"], params["norm_b"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return (jnp.dot(hidden, params["lm_head"],
                        preferred_element_type=jnp.float32) +
                params["lm_head_b"].astype(jnp.float32))
