"""GPTBigCode (StarCoder / SantaCoder) decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/gpt_bigcode.py:
multi-query attention (1 shared KV head), learned absolute positions,
fused [Q | K | V] c_attn, tanh-GELU MLP, tied lm_head.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm, linear,
                                        normal_init, run_layers, stack_layers,
                                        t2j)
from vllm_ltr_tpu.ops.attention import attend


def _kv_heads(cfg) -> int:
    return 1 if getattr(cfg, "multi_query", True) else cfg.n_head


class GPTBigCodeForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, V = cfg.n_embd, cfg.vocab_size
        NH, KH = cfg.n_head, _kv_heads(cfg)
        D = H // NH
        F = getattr(cfg, "n_inner", None) or 4 * H
        keys = jax.random.split(rng, cfg.n_layer + 2)

        def layer_params(key):
            ks = jax.random.split(key, 5)
            return {
                "q_w": normal_init(ks[0], (H, NH * D), dtype),
                "q_b": jnp.zeros((NH * D, ), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "k_b": jnp.zeros((KH * D, ), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "v_b": jnp.zeros((KH * D, ), dtype),
                "o_w": normal_init(ks[3], (NH * D, H), dtype),
                "o_b": jnp.zeros((H, ), dtype),
                "fc1_w": normal_init(ks[4], (H, F), dtype),
                "fc1_b": jnp.zeros((F, ), dtype),
                "fc2_w": normal_init(ks[4], (F, H), dtype),
                "fc2_b": jnp.zeros((H, ), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
                "ln2_b": jnp.zeros((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "embed_pos": normal_init(keys[1], (cfg.n_positions, H), dtype),
            "norm_s": jnp.ones((H, ), dtype),
            "norm_b": jnp.zeros((H, ), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)
        pop = sd.pop
        H = cfg.n_embd
        NH, KH = cfg.n_head, _kv_heads(cfg)
        D = H // NH
        kv_dim = KH * D

        layers = []
        for i in range(cfg.n_layer):
            p = f"transformer.h.{i}."
            # Rows of c_attn: [Q (H) | K (kv_dim) | V (kv_dim)].
            w = pop(p + "attn.c_attn.weight").T
            b = pop(p + "attn.c_attn.bias")
            layers.append({
                "q_w": t2j(w[:, :H], dtype),
                "q_b": t2j(b[:H], dtype),
                "k_w": t2j(w[:, H:H + kv_dim], dtype),
                "k_b": t2j(b[H:H + kv_dim], dtype),
                "v_w": t2j(w[:, H + kv_dim:], dtype),
                "v_b": t2j(b[H + kv_dim:], dtype),
                "o_w": t2j(pop(p + "attn.c_proj.weight").T, dtype),
                "o_b": t2j(pop(p + "attn.c_proj.bias"), dtype),
                "fc1_w": t2j(pop(p + "mlp.c_fc.weight").T, dtype),
                "fc1_b": t2j(pop(p + "mlp.c_fc.bias"), dtype),
                "fc2_w": t2j(pop(p + "mlp.c_proj.weight").T, dtype),
                "fc2_b": t2j(pop(p + "mlp.c_proj.bias"), dtype),
                "ln1_s": t2j(pop(p + "ln_1.weight"), dtype),
                "ln1_b": t2j(pop(p + "ln_1.bias"), dtype),
                "ln2_s": t2j(pop(p + "ln_2.weight"), dtype),
                "ln2_b": t2j(pop(p + "ln_2.bias"), dtype),
            })
        return {
            "embed_tokens": t2j(pop("transformer.wte.weight"), dtype),
            "embed_pos": t2j(pop("transformer.wpe.weight"), dtype),
            "norm_s": t2j(pop("transformer.ln_f.weight"), dtype),
            "norm_b": t2j(pop("transformer.ln_f.bias"), dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.n_embd
        NH, KH = cfg.n_head, _kv_heads(cfg)
        D = H // NH
        scale = D**-0.5
        eps = getattr(cfg, "layer_norm_epsilon", 1e-5)

        h = params["embed_tokens"][tokens] + params["embed_pos"][positions]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = layer_norm(h, lp["ln1_s"], lp["ln1_b"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"], lp["q_b"]).reshape(T, NH, D)
            k = linear(x, lp["k_w"], lp["k_b"]).reshape(T, KH, D)
            v = linear(x, lp["v_w"], lp["v_b"]).reshape(T, KH, D)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            h = residual + linear(attn.reshape(T, NH * D), lp["o_w"],
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
        return jnp.dot(hidden, params["embed_tokens"].T,
                       preferred_element_type=jnp.float32)
