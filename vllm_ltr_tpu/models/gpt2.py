"""GPT-2 decoder, TPU-native.

Counterpart of reference ``vllm/model_executor/models/gpt2.py``: learned
positional embeddings, pre-LN blocks, fused c_attn QKV, GELU(new) MLP,
tied lm head. HF GPT-2 Conv1D weights are already [in, out] — no transpose.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm, linear,
                                        normal_init, run_layers, stack_layers,
                                        t2j)
from vllm_ltr_tpu.ops.attention import attend


class GPT2LMHeadModel:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H = cfg.hidden_size if hasattr(cfg, "hidden_size") else cfg.n_embd
        F = getattr(cfg, "n_inner", None) or 4 * H
        V = cfg.vocab_size
        L = cfg.num_hidden_layers
        keys = jax.random.split(rng, L + 3)

        def layer_params(key):
            ks = jax.random.split(key, 4)
            return {
                "qkv_w": normal_init(ks[0], (H, 3 * H), dtype),
                "qkv_b": jnp.zeros((3 * H, ), dtype),
                "out_w": normal_init(ks[1], (H, H), dtype),
                "out_b": jnp.zeros((H, ), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
                "fc1_w": normal_init(ks[2], (H, F), dtype),
                "fc1_b": jnp.zeros((F, ), dtype),
                "fc2_w": normal_init(ks[3], (F, H), dtype),
                "fc2_b": jnp.zeros((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
                "ln2_b": jnp.zeros((H, ), dtype),
            }

        return {
            "wte": normal_init(keys[0], (V, H), dtype),
            "wpe": normal_init(keys[1], (cfg.max_position_embeddings, H),
                               dtype),
            "ln_f_s": jnp.ones((H, ), dtype),
            "ln_f_b": jnp.zeros((H, ), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:2 + L]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)

        def pop(name):
            for prefix in ("transformer.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        L = cfg.num_hidden_layers
        params: Dict[str, Any] = {
            "wte": t2j(pop("wte.weight"), dtype),
            "wpe": t2j(pop("wpe.weight"), dtype),
            "ln_f_s": t2j(pop("ln_f.weight"), dtype),
            "ln_f_b": t2j(pop("ln_f.bias"), dtype),
        }
        layers = []
        for i in range(L):
            p = f"h.{i}."
            layers.append({
                # Conv1D stores [in, out] already.
                "qkv_w": t2j(pop(p + "attn.c_attn.weight"), dtype),
                "qkv_b": t2j(pop(p + "attn.c_attn.bias"), dtype),
                "out_w": t2j(pop(p + "attn.c_proj.weight"), dtype),
                "out_b": t2j(pop(p + "attn.c_proj.bias"), dtype),
                "ln1_s": t2j(pop(p + "ln_1.weight"), dtype),
                "ln1_b": t2j(pop(p + "ln_1.bias"), dtype),
                "fc1_w": t2j(pop(p + "mlp.c_fc.weight"), dtype),
                "fc1_b": t2j(pop(p + "mlp.c_fc.bias"), dtype),
                "fc2_w": t2j(pop(p + "mlp.c_proj.weight"), dtype),
                "fc2_b": t2j(pop(p + "mlp.c_proj.bias"), dtype),
                "ln2_s": t2j(pop(p + "ln_2.weight"), dtype),
                "ln2_b": t2j(pop(p + "ln_2.bias"), dtype),
            })
        params["layers"] = stack_layers(layers)
        return params

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size if hasattr(cfg, "hidden_size") else cfg.n_embd
        num_heads = cfg.num_attention_heads
        D = H // num_heads
        scale = D**-0.5
        eps = getattr(cfg, "layer_norm_epsilon", 1e-5)

        h = params["wte"][tokens] + params["wpe"][positions]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = layer_norm(h, lp["ln1_s"], lp["ln1_b"], eps)
            qkv = linear(x, lp["qkv_w"], lp["qkv_b"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            T = q.shape[0]
            q = q.reshape(T, num_heads, D)
            k = k.reshape(T, num_heads, D)
            v = v.reshape(T, num_heads, D)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            h = residual + linear(attn.reshape(T, H), lp["out_w"],
                                  lp["out_b"])

            residual = h
            x = layer_norm(h, lp["ln2_s"], lp["ln2_b"], eps)
            x = linear(x, lp["fc1_w"], lp["fc1_b"])
            x = jax.nn.gelu(x.astype(jnp.float32),
                            approximate=True).astype(x.dtype)
            x = linear(x, lp["fc2_w"], lp["fc2_b"])
            h = residual + x
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = layer_norm(h, params["ln_f_s"], params["ln_f_b"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return jnp.dot(hidden, params["wte"].T,
                       preferred_element_type=jnp.float32)
