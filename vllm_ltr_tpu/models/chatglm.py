"""GLM (ChatGLM lineage / GLM-4) decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/chatglm.py: grouped
query attention with biased QKV, partial INTERLEAVED rotary (GPT-J style
over half the head dim), fused gate_up SwiGLU MLP, RMSNorm.  Loads both
the modern GLM weight naming (model.layers.*.self_attn.*) and the classic
ChatGLM2/3 encoder naming (transformer.encoder.layers.* with fused
query_key_value and dense_h_to_4h).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, linear,
                                        normal_init, rms_norm, run_layers,
                                        silu_and_mul, stack_layers, t2j)
from vllm_ltr_tpu.ops.attention import attend


def _dims(cfg):
    H = cfg.hidden_size
    QH = cfg.num_attention_heads
    KH = (getattr(cfg, "num_key_value_heads", None)
          or getattr(cfg, "multi_query_group_num", None) or QH)
    D = getattr(cfg, "head_dim", None) or H // QH
    return H, QH, KH, D


class GlmForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, QH, KH, D = _dims(cfg)
        F = getattr(cfg, "intermediate_size", None) or cfg.ffn_hidden_size
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
                "gate_w": normal_init(ks[4], (H, F), dtype),
                "up_w": normal_init(ks[4], (H, F), dtype),
                "down_w": normal_init(ks[5], (F, H), dtype),
                "input_ln": jnp.ones((H, ), dtype),
                "post_ln": jnp.ones((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (cfg.vocab_size, H), dtype),
            "norm": jnp.ones((H, ), dtype),
            "lm_head": normal_init(keys[1], (H, cfg.vocab_size), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)
        if any(k.startswith("transformer.encoder.") for k in sd):
            return GlmForCausalLM._from_chatglm_naming(cfg, sd, dtype)
        pop = sd.pop
        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"model.layers.{i}."
            gate_up = pop(p + "mlp.gate_up_proj.weight").float()
            F = gate_up.shape[0] // 2
            layers.append({
                "q_w": t2j(pop(p + "self_attn.q_proj.weight").T, dtype),
                "q_b": t2j(pop(p + "self_attn.q_proj.bias"), dtype),
                "k_w": t2j(pop(p + "self_attn.k_proj.weight").T, dtype),
                "k_b": t2j(pop(p + "self_attn.k_proj.bias"), dtype),
                "v_w": t2j(pop(p + "self_attn.v_proj.weight").T, dtype),
                "v_b": t2j(pop(p + "self_attn.v_proj.bias"), dtype),
                "o_w": t2j(pop(p + "self_attn.o_proj.weight").T, dtype),
                "gate_w": t2j(gate_up[:F].T.contiguous(), dtype),
                "up_w": t2j(gate_up[F:].T.contiguous(), dtype),
                "down_w": t2j(pop(p + "mlp.down_proj.weight").T, dtype),
                "input_ln": t2j(pop(p + "input_layernorm.weight"), dtype),
                "post_ln": t2j(pop(p + "post_attention_layernorm.weight"),
                               dtype),
            })
        params = {
            "embed_tokens": t2j(pop("model.embed_tokens.weight"), dtype),
            "norm": t2j(pop("model.norm.weight"), dtype),
            "layers": stack_layers(layers),
        }
        if "lm_head.weight" in sd:
            params["lm_head"] = t2j(sd.pop("lm_head.weight").T, dtype)
        return params

    @staticmethod
    def _from_chatglm_naming(cfg, sd, dtype) -> Dict[str, Any]:
        """ChatGLM2/3 checkpoints: transformer.encoder.layers.* with fused
        query_key_value and dense_h_to_4h."""
        H, QH, KH, D = _dims(cfg)

        def pop(name):
            return sd.pop("transformer." + name)

        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"encoder.layers.{i}."
            qkv_w = pop(p + "self_attention.query_key_value.weight").float()
            qkv_b = pop(p + "self_attention.query_key_value.bias").float()
            q_w, k_w, v_w = (qkv_w[:QH * D], qkv_w[QH * D:QH * D + KH * D],
                             qkv_w[QH * D + KH * D:])
            q_b, k_b, v_b = (qkv_b[:QH * D], qkv_b[QH * D:QH * D + KH * D],
                             qkv_b[QH * D + KH * D:])
            h4h = pop(p + "mlp.dense_h_to_4h.weight").float()
            F = h4h.shape[0] // 2
            layers.append({
                "q_w": t2j(q_w.T.contiguous(), dtype),
                "q_b": t2j(q_b, dtype),
                "k_w": t2j(k_w.T.contiguous(), dtype),
                "k_b": t2j(k_b, dtype),
                "v_w": t2j(v_w.T.contiguous(), dtype),
                "v_b": t2j(v_b, dtype),
                "o_w": t2j(pop(p + "self_attention.dense.weight").T, dtype),
                "gate_w": t2j(h4h[:F].T.contiguous(), dtype),
                "up_w": t2j(h4h[F:].T.contiguous(), dtype),
                "down_w": t2j(pop(p + "mlp.dense_4h_to_h.weight").T, dtype),
                "input_ln": t2j(pop(p + "input_layernorm.weight"), dtype),
                "post_ln": t2j(pop(p + "post_attention_layernorm.weight"),
                               dtype),
            })
        return {
            "embed_tokens": t2j(
                pop("embedding.word_embeddings.weight"), dtype),
            "norm": t2j(pop("encoder.final_layernorm.weight"), dtype),
            "lm_head": t2j(pop("output_layer.weight").T, dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H, QH, KH, D = _dims(cfg)
        scale = D**-0.5
        eps = getattr(cfg, "rms_norm_eps",
                      getattr(cfg, "layernorm_epsilon", 1e-5))
        rot = int(getattr(cfg, "partial_rotary_factor", 0.5) * D)
        rope_theta = getattr(cfg, "rope_theta", 10000.0)
        max_pos = getattr(cfg, "max_position_embeddings",
                          getattr(cfg, "seq_length", 8192))

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = rms_norm(h, lp["input_ln"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"], lp["q_b"]).reshape(T, QH, D)
            k = linear(x, lp["k_w"], lp["k_b"]).reshape(T, KH, D)
            v = linear(x, lp["v_w"], lp["v_b"]).reshape(T, KH, D)
            # GLM rotary: interleaved (GPT-J style) over the first half.
            q, k = apply_rotary_embedding(positions, q, k, D, rot, max_pos,
                                          rope_theta, False)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            h = residual + linear(attn.reshape(T, QH * D), lp["o_w"])

            residual = h
            x = rms_norm(h, lp["post_ln"], eps)
            x = silu_and_mul(linear(x, lp["gate_w"]), linear(x, lp["up_w"]))
            h = residual + linear(x, lp["down_w"])
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


# The ChatGLM2/3 arch names resolve to the same implementation.
ChatGLMForCausalLM = GlmForCausalLM
