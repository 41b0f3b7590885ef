"""Gemma decoder, TPU-native.

Counterpart of reference ``vllm/model_executor/models/gemma.py``: Llama-like
with sqrt(H)-scaled embeddings, (1 + w) RMSNorm weights, GELU(tanh) gated
MLP, explicit head_dim, tied lm head.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, linear,
                                        normal_init, run_layers, stack_layers,
                                        t2j)
from vllm_ltr_tpu.ops.attention import attend


def _gemma_rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def _gelu_tanh_mul(gate, up):
    return (jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(
        gate.dtype) * up)


class GemmaForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H = cfg.hidden_size
        I = cfg.intermediate_size
        V = cfg.vocab_size
        L = cfg.num_hidden_layers
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH) or QH
        D = getattr(cfg, "head_dim", H // QH)
        keys = jax.random.split(rng, L + 2)

        def layer_params(key):
            ks = jax.random.split(key, 7)
            return {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "o_w": normal_init(ks[3], (QH * D, H), dtype),
                "gate_w": normal_init(ks[4], (H, I), dtype),
                "up_w": normal_init(ks[5], (H, I), dtype),
                "down_w": normal_init(ks[6], (I, H), dtype),
                "input_ln": jnp.zeros((H, ), dtype),
                "post_ln": jnp.zeros((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm": jnp.zeros((H, ), dtype),
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
        params: Dict[str, Any] = {
            "embed_tokens": t2j(pop("embed_tokens.weight"), dtype),
            "norm": t2j(pop("norm.weight"), dtype),
        }
        layers = []
        for i in range(L):
            p = f"layers.{i}."
            layers.append({
                "q_w": t2j(pop(p + "self_attn.q_proj.weight"), dtype).T,
                "k_w": t2j(pop(p + "self_attn.k_proj.weight"), dtype).T,
                "v_w": t2j(pop(p + "self_attn.v_proj.weight"), dtype).T,
                "o_w": t2j(pop(p + "self_attn.o_proj.weight"), dtype).T,
                "gate_w": t2j(pop(p + "mlp.gate_proj.weight"), dtype).T,
                "up_w": t2j(pop(p + "mlp.up_proj.weight"), dtype).T,
                "down_w": t2j(pop(p + "mlp.down_proj.weight"), dtype).T,
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
        D = getattr(cfg, "head_dim", H // QH)
        scale = D**-0.5
        rope_theta = getattr(cfg, "rope_theta", 10000.0)
        max_pos = cfg.max_position_embeddings
        eps = getattr(cfg, "rms_norm_eps", 1e-6)

        h = params["embed_tokens"][tokens]
        h = h * jnp.asarray(H**0.5, h.dtype)  # Gemma embed scaling

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = _gemma_rms_norm(h, lp["input_ln"], eps)
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
            x = _gemma_rms_norm(h, lp["post_ln"], eps)
            x = _gelu_tanh_mul(linear(x, lp["gate_w"]),
                               linear(x, lp["up_w"]))
            h = residual + linear(x, lp["down_w"])
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = _gemma_rms_norm(h, params["norm"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return jnp.dot(hidden, params["embed_tokens"].T,
                       preferred_element_type=jnp.float32)
