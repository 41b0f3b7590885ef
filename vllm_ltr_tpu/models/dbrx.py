"""DBRX decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/dbrx.py: fused+clipped
QKV over GQA, bias-free LayerNorms, full NeoX rotary, and a 16-expert
top-4 GLU MoE FFN served by the capacity-dispatch fused MoE
(layers/moe.py).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.moe import fused_moe
from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, linear,
                                        normal_init, run_layers, stack_layers,
                                        t2j)
from vllm_ltr_tpu.ops.attention import attend


def _bias_free_layer_norm(x: jax.Array, scale: jax.Array,
                          eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean)**2).mean(axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) *
            scale.astype(jnp.float32)).astype(x.dtype)


class DbrxForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, V = cfg.d_model, cfg.vocab_size
        QH = cfg.n_heads
        KH = cfg.attn_config.kv_n_heads
        D = H // QH
        E = cfg.ffn_config.moe_num_experts
        F = cfg.ffn_config.ffn_hidden_size
        keys = jax.random.split(rng, cfg.n_layers + 2)

        def layer_params(key):
            ks = jax.random.split(key, 8)
            return {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "o_w": normal_init(ks[3], (QH * D, H), dtype),
                "router_w": normal_init(ks[4], (H, E), dtype),
                "gate_w": normal_init(ks[5], (E, H, F), dtype),
                "up_w": normal_init(ks[6], (E, H, F), dtype),
                "down_w": normal_init(ks[7], (E, F, H), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm_s": jnp.ones((H, ), dtype),
            "lm_head": normal_init(keys[1], (H, V), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)
        pop = sd.pop
        H = cfg.d_model
        QH = cfg.n_heads
        KH = cfg.attn_config.kv_n_heads
        D = H // QH
        kv_dim = KH * D
        E = cfg.ffn_config.moe_num_experts
        F = cfg.ffn_config.ffn_hidden_size

        layers = []
        for i in range(cfg.n_layers):
            p = f"transformer.blocks.{i}."
            w = pop(p + "norm_attn_norm.attn.Wqkv.weight").T
            # Expert GLU banks: w1/v1 stored [E*F, H] row-major by expert,
            # used as x @ w1.T; w2 used un-transposed as inter @ w2.
            w1 = pop(p + "ffn.experts.mlp.w1").reshape(E, F, H)
            v1 = pop(p + "ffn.experts.mlp.v1").reshape(E, F, H)
            w2 = pop(p + "ffn.experts.mlp.w2").reshape(E, F, H)
            layers.append({
                "q_w": t2j(w[:, :H], dtype),
                "k_w": t2j(w[:, H:H + kv_dim], dtype),
                "v_w": t2j(w[:, H + kv_dim:], dtype),
                "o_w": t2j(pop(p + "norm_attn_norm.attn.out_proj.weight").T,
                           dtype),
                "router_w": t2j(pop(p + "ffn.router.layer.weight").T, dtype),
                "gate_w": t2j(w1.permute(0, 2, 1), dtype),
                "up_w": t2j(v1.permute(0, 2, 1), dtype),
                "down_w": t2j(w2, dtype),
                "ln1_s": t2j(pop(p + "norm_attn_norm.norm_1.weight"), dtype),
                "ln2_s": t2j(pop(p + "norm_attn_norm.norm_2.weight"), dtype),
            })
        return {
            "embed_tokens": t2j(pop("transformer.wte.weight"), dtype),
            "norm_s": t2j(pop("transformer.norm_f.weight"), dtype),
            "lm_head": t2j(pop("lm_head.weight").T, dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.d_model
        QH = cfg.n_heads
        KH = cfg.attn_config.kv_n_heads
        D = H // QH
        scale = D**-0.5
        base = getattr(cfg.attn_config, "rope_theta", 10000.0)
        max_pos = cfg.max_seq_len
        clip = getattr(cfg.attn_config, "clip_qkv", None)
        top_k = cfg.ffn_config.moe_top_k
        renorm = cfg.ffn_config.moe_normalize_expert_weights is not None

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = _bias_free_layer_norm(h, lp["ln1_s"])
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
            x = _bias_free_layer_norm(h, lp["ln2_s"])
            router_logits = linear(x, lp["router_w"])
            moe_out = fused_moe(x, router_logits, lp["gate_w"], lp["up_w"],
                                lp["down_w"], top_k=top_k,
                                renormalize=renorm)
            return residual + moe_out, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = _bias_free_layer_norm(h, params["norm_s"])
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return jnp.dot(hidden, params["lm_head"],
                       preferred_element_type=jnp.float32)
