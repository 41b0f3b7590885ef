"""MiniCPM decoder, TPU-native.

Behavioral counterpart of reference ``vllm/model_executor/models/minicpm.py``:
a Llama body with MiniCPM's μP-style scaling — embeddings multiplied by
``scale_emb`` (reference :353-355), every sublayer residual add scaled by
``scale_depth / sqrt(num_hidden_layers)`` (:314-322), and logits divided by
``hidden_size / dim_model_base`` (:436-444) — plus an optional per-layer MoE
MLP when ``num_experts`` is set (:126-131). lm_head is tied to the input
embeddings when ``tie_word_embeddings``.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.moe import fused_moe
from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, linear,
                                        normal_init, rms_norm, run_layers,
                                        silu_and_mul, stack_layers, t2j)
from vllm_ltr_tpu.ops.attention import attend


def _num_experts(cfg) -> int:
    return getattr(cfg, "num_experts", 0) or 0


class MiniCPMForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH) or QH
        D = H // QH
        E = _num_experts(cfg)
        keys = jax.random.split(rng, cfg.num_hidden_layers + 2)

        def layer_params(key):
            ks = jax.random.split(key, 8)
            p = {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "o_w": normal_init(ks[3], (QH * D, H), dtype),
                "input_ln": jnp.ones((H, ), dtype),
                "post_ln": jnp.ones((H, ), dtype),
            }
            if E:
                p["router_w"] = normal_init(ks[7], (H, E), dtype)
                p["gate_w"] = normal_init(ks[4], (E, H, F), dtype)
                p["up_w"] = normal_init(ks[5], (E, H, F), dtype)
                p["down_w"] = normal_init(ks[6], (E, F, H), dtype)
            else:
                p["gate_w"] = normal_init(ks[4], (H, F), dtype)
                p["up_w"] = normal_init(ks[5], (H, F), dtype)
                p["down_w"] = normal_init(ks[6], (F, H), dtype)
            return p

        params = {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm": jnp.ones((H, ), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:]]),
        }
        if not getattr(cfg, "tie_word_embeddings", True):
            params["lm_head"] = normal_init(keys[1], (H, V), dtype)
        return params

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)

        def pop(name):
            for prefix in ("model.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        E = _num_experts(cfg)
        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"layers.{i}."
            lp = {
                "q_w": t2j(pop(p + "self_attn.q_proj.weight"), dtype).T,
                "k_w": t2j(pop(p + "self_attn.k_proj.weight"), dtype).T,
                "v_w": t2j(pop(p + "self_attn.v_proj.weight"), dtype).T,
                "o_w": t2j(pop(p + "self_attn.o_proj.weight"), dtype).T,
                "input_ln": t2j(pop(p + "input_layernorm.weight"), dtype),
                "post_ln": t2j(pop(p + "post_attention_layernorm.weight"),
                               dtype),
            }
            if E:
                # HF MoE naming: experts.{e}.w1=gate, w3=up, w2=down.
                lp["router_w"] = t2j(pop(p + "mlp.gate.weight"), dtype).T
                lp["gate_w"] = jnp.stack([
                    t2j(pop(p + f"mlp.experts.{e}.w1.weight"), dtype).T
                    for e in range(E)
                ])
                lp["up_w"] = jnp.stack([
                    t2j(pop(p + f"mlp.experts.{e}.w3.weight"), dtype).T
                    for e in range(E)
                ])
                lp["down_w"] = jnp.stack([
                    t2j(pop(p + f"mlp.experts.{e}.w2.weight"), dtype).T
                    for e in range(E)
                ])
            else:
                lp["gate_w"] = t2j(pop(p + "mlp.gate_proj.weight"), dtype).T
                lp["up_w"] = t2j(pop(p + "mlp.up_proj.weight"), dtype).T
                lp["down_w"] = t2j(pop(p + "mlp.down_proj.weight"), dtype).T
            layers.append(lp)
        params = {
            "embed_tokens": t2j(pop("embed_tokens.weight"), dtype),
            "norm": t2j(pop("norm.weight"), dtype),
            "layers": stack_layers(layers),
        }
        if "lm_head.weight" in sd:
            params["lm_head"] = t2j(sd.pop("lm_head.weight"), dtype).T
        return params

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH) or QH
        D = H // QH
        scale = D**-0.5
        eps = getattr(cfg, "rms_norm_eps", 1e-5)
        base = getattr(cfg, "rope_theta", 10000.0)
        max_pos = cfg.max_position_embeddings
        E = _num_experts(cfg)
        top_k = getattr(cfg, "num_experts_per_tok", 2)
        # μP residual scale (reference minicpm.py:314-322).
        res_scale = (getattr(cfg, "scale_depth", 1.0) /
                     math.sqrt(cfg.num_hidden_layers))

        h = params["embed_tokens"][tokens] * getattr(cfg, "scale_emb", 1.0)

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = rms_norm(h, lp["input_ln"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"]).reshape(T, QH, D)
            k = linear(x, lp["k_w"]).reshape(T, KH, D)
            v = linear(x, lp["v_w"]).reshape(T, KH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                          base, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            h = residual + linear(attn.reshape(T, QH * D),
                                  lp["o_w"]) * res_scale

            residual = h
            x = rms_norm(h, lp["post_ln"], eps)
            if E:
                router_logits = linear(x, lp["router_w"])
                ffn = fused_moe(x, router_logits, lp["gate_w"], lp["up_w"],
                                lp["down_w"], top_k=top_k,
                                renormalize=True).astype(h.dtype)
            else:
                ffn = linear(
                    silu_and_mul(linear(x, lp["gate_w"]),
                                 linear(x, lp["up_w"])), lp["down_w"])
            h = residual + ffn * res_scale
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = rms_norm(h, params["norm"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        # Logit scaling: hidden / (hidden_size / dim_model_base)
        # (reference minicpm.py:436-444).
        width = cfg.hidden_size / getattr(cfg, "dim_model_base",
                                          cfg.hidden_size)
        hidden = hidden / width
        head = params.get("lm_head")
        if head is None:
            head = params["embed_tokens"].T
        return jnp.dot(hidden, head, preferred_element_type=jnp.float32)
