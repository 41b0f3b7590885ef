"""OLMo decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/olmo.py: Llama-style
block with NON-parametric LayerNorm (no scale/bias, eps 1e-5), optional
QKV clipping, full NeoX rotary, SiLU-gated MLP, optionally tied lm_head.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, linear,
                                        normal_init, run_layers, silu_and_mul,
                                        stack_layers, t2j)
from vllm_ltr_tpu.ops.attention import attend


def _nonparam_layer_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean)**2).mean(axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class OlmoForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH)
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
            }

        params = {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:]]),
        }
        if not getattr(cfg, "tie_word_embeddings", False):
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
                "k_w": t2j(pop(p + "self_attn.k_proj.weight").T, dtype),
                "v_w": t2j(pop(p + "self_attn.v_proj.weight").T, dtype),
                "o_w": t2j(pop(p + "self_attn.o_proj.weight").T, dtype),
                "gate_w": t2j(pop(p + "mlp.gate_proj.weight").T, dtype),
                "up_w": t2j(pop(p + "mlp.up_proj.weight").T, dtype),
                "down_w": t2j(pop(p + "mlp.down_proj.weight").T, dtype),
            })
        params = {
            "embed_tokens": t2j(pop("model.embed_tokens.weight"), dtype),
            "layers": stack_layers(layers),
        }
        if "lm_head.weight" in sd:
            params["lm_head"] = t2j(pop("lm_head.weight").T, dtype)
        return params

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH)
        D = H // QH
        scale = D**-0.5
        base = getattr(cfg, "rope_theta", 10000.0)
        max_pos = cfg.max_position_embeddings
        clip = getattr(cfg, "clip_qkv", None)

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = _nonparam_layer_norm(h)
            T = x.shape[0]
            q = linear(x, lp["q_w"])
            k = linear(x, lp["k_w"])
            v = linear(x, lp["v_w"])
            if clip is not None:
                q = jnp.clip(q, -clip, clip)
                k = jnp.clip(k, -clip, clip)
                v = jnp.clip(v, -clip, clip)
            q = q.reshape(T, QH, D)
            k = k.reshape(T, KH, D)
            v = v.reshape(T, KH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                          base, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            h = residual + linear(attn.reshape(T, QH * D), lp["o_w"])

            residual = h
            x = _nonparam_layer_norm(h)
            x = silu_and_mul(linear(x, lp["gate_w"]), linear(x, lp["up_w"]))
            h = residual + linear(x, lp["down_w"])
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = _nonparam_layer_norm(h)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        if "lm_head" in params:
            return jnp.dot(hidden, params["lm_head"],
                           preferred_element_type=jnp.float32)
        return jnp.dot(hidden, params["embed_tokens"].T,
                       preferred_element_type=jnp.float32)
