"""Cohere Command-R decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/commandr.py:
mean-centered LayerNorm (weight only), parallel attention+MLP residual
off a single input LayerNorm, GPT-J-style interleaved rotary, optional
per-head QK-norm, tied embeddings with a logit_scale multiplier.
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


def _cohere_layer_norm(x: jax.Array, scale: jax.Array,
                       eps: float) -> jax.Array:
    """Mean-centered LayerNorm with weight only; broadcasts per-head
    weights when ``scale`` has a leading heads axis."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean)**2).mean(axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale.ndim > 1:
        normed = normed * scale[None].astype(jnp.float32)
    else:
        normed = normed * scale.astype(jnp.float32)
    return normed.astype(x.dtype)


class CohereForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH)
        D = H // QH
        qk_norm = getattr(cfg, "use_qk_norm", False)
        keys = jax.random.split(rng, cfg.num_hidden_layers + 1)

        def layer_params(key):
            ks = jax.random.split(key, 7)
            p = {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "o_w": normal_init(ks[3], (QH * D, H), dtype),
                "gate_w": normal_init(ks[4], (H, F), dtype),
                "up_w": normal_init(ks[5], (H, F), dtype),
                "down_w": normal_init(ks[6], (F, H), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
            }
            if qk_norm:
                p["qn_s"] = jnp.ones((QH, D), dtype)
                p["kn_s"] = jnp.ones((KH, D), dtype)
            return p

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm_s": jnp.ones((H, ), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[1:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)
        pop = sd.pop
        qk_norm = getattr(cfg, "use_qk_norm", False)
        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"model.layers.{i}."
            lp = {
                "q_w": t2j(pop(p + "self_attn.q_proj.weight").T, dtype),
                "k_w": t2j(pop(p + "self_attn.k_proj.weight").T, dtype),
                "v_w": t2j(pop(p + "self_attn.v_proj.weight").T, dtype),
                "o_w": t2j(pop(p + "self_attn.o_proj.weight").T, dtype),
                "gate_w": t2j(pop(p + "mlp.gate_proj.weight").T, dtype),
                "up_w": t2j(pop(p + "mlp.up_proj.weight").T, dtype),
                "down_w": t2j(pop(p + "mlp.down_proj.weight").T, dtype),
                "ln1_s": t2j(pop(p + "input_layernorm.weight"), dtype),
            }
            if qk_norm:
                lp["qn_s"] = t2j(pop(p + "self_attn.q_norm.weight"), dtype)
                lp["kn_s"] = t2j(pop(p + "self_attn.k_norm.weight"), dtype)
            layers.append(lp)
        return {
            "embed_tokens": t2j(pop("model.embed_tokens.weight"), dtype),
            "norm_s": t2j(pop("model.norm.weight"), dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH)
        D = H // QH
        scale = D**-0.5
        eps = getattr(cfg, "layer_norm_eps", 1e-5)
        base = getattr(cfg, "rope_theta", 10000.0)
        max_pos = cfg.max_position_embeddings
        qk_norm = getattr(cfg, "use_qk_norm", False)

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            x = _cohere_layer_norm(h, lp["ln1_s"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"]).reshape(T, QH, D)
            k = linear(x, lp["k_w"]).reshape(T, KH, D)
            v = linear(x, lp["v_w"]).reshape(T, KH, D)
            if qk_norm:
                q = _cohere_layer_norm(q, lp["qn_s"], eps)
                k = _cohere_layer_norm(k, lp["kn_s"], eps)
            q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                          base, False)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            attn_out = linear(attn.reshape(T, QH * D), lp["o_w"])

            # Parallel residual off the same normed input.
            m = linear(
                silu_and_mul(linear(x, lp["gate_w"]), linear(x, lp["up_w"])),
                lp["down_w"])
            return h + attn_out + m, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = _cohere_layer_norm(h, params["norm_s"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        logits = jnp.dot(hidden, params["embed_tokens"].T,
                         preferred_element_type=jnp.float32)
        return logits * getattr(cfg, "logit_scale", 1.0)
