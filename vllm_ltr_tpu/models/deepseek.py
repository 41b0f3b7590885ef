"""DeepSeek (v1) MoE decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/deepseek.py: Llama
attention; the first ``first_k_dense_replace`` layers (and any layer not
on the ``moe_layer_freq`` stride) use a dense SwiGLU MLP, the rest a
sparse expert FFN with unconditional SHARED experts added on top.  Also
carries the LTR fork's embedded mid-layer predictor hook (reference
deepseek.py:354-359) via ``capture_layer``.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.moe import fused_moe
from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, linear,
                                        normal_init, rms_norm, run_layers,
                                        silu_and_mul, stack_layers, t2j)
from vllm_ltr_tpu.ops.attention import attend


def _dims(cfg):
    H = cfg.hidden_size
    QH = cfg.num_attention_heads
    KH = getattr(cfg, "num_key_value_heads", QH) or QH
    return H, QH, KH, H // QH


def _is_sparse(cfg, layer_idx: int) -> bool:
    n_experts = getattr(cfg, "n_routed_experts", None)
    if not n_experts:
        return False
    first_dense = getattr(cfg, "first_k_dense_replace", 0)
    freq = getattr(cfg, "moe_layer_freq", 1)
    return layer_idx >= first_dense and layer_idx % max(freq, 1) == 0


class DeepseekForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, QH, KH, D = _dims(cfg)
        E = getattr(cfg, "n_routed_experts", 0) or 1
        I = getattr(cfg, "moe_intermediate_size", cfg.intermediate_size)
        SI = I * getattr(cfg, "n_shared_experts", 1)
        keys = jax.random.split(rng, cfg.num_hidden_layers + 2)

        def layer_params(key):
            ks = jax.random.split(key, 10)
            return {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "o_w": normal_init(ks[3], (QH * D, H), dtype),
                "router_w": normal_init(ks[4], (H, E), dtype),
                "gate_w": normal_init(ks[5], (E, H, I), dtype),
                "up_w": normal_init(ks[6], (E, H, I), dtype),
                "down_w": normal_init(ks[7], (E, I, H), dtype),
                "sh_gate_w": normal_init(ks[8], (H, SI), dtype),
                "sh_up_w": normal_init(ks[8], (H, SI), dtype),
                "sh_down_w": normal_init(ks[9], (SI, H), dtype),
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

        def pop(name):
            for prefix in ("model.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        H = cfg.hidden_size
        E = getattr(cfg, "n_routed_experts", 0) or 1
        I = getattr(cfg, "moe_intermediate_size", cfg.intermediate_size)
        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"layers.{i}."
            lp = {
                "q_w": t2j(pop(p + "self_attn.q_proj.weight").T, dtype),
                "k_w": t2j(pop(p + "self_attn.k_proj.weight").T, dtype),
                "v_w": t2j(pop(p + "self_attn.v_proj.weight").T, dtype),
                "o_w": t2j(pop(p + "self_attn.o_proj.weight").T, dtype),
                "input_ln": t2j(pop(p + "input_layernorm.weight"), dtype),
                "post_ln": t2j(pop(p + "post_attention_layernorm.weight"),
                               dtype),
            }
            if _is_sparse(cfg, i):
                lp["router_w"] = t2j(pop(p + "mlp.gate.weight").T, dtype)
                lp["gate_w"] = jnp.stack([
                    t2j(pop(p + f"mlp.experts.{e}.gate_proj.weight").T,
                        dtype) for e in range(E)
                ])
                lp["up_w"] = jnp.stack([
                    t2j(pop(p + f"mlp.experts.{e}.up_proj.weight").T, dtype)
                    for e in range(E)
                ])
                lp["down_w"] = jnp.stack([
                    t2j(pop(p + f"mlp.experts.{e}.down_proj.weight").T,
                        dtype) for e in range(E)
                ])
                lp["sh_gate_w"] = t2j(
                    pop(p + "mlp.shared_experts.gate_proj.weight").T, dtype)
                lp["sh_up_w"] = t2j(
                    pop(p + "mlp.shared_experts.up_proj.weight").T, dtype)
                lp["sh_down_w"] = t2j(
                    pop(p + "mlp.shared_experts.down_proj.weight").T, dtype)
            else:
                lp["router_w"] = jnp.zeros((H, E), dtype)
                lp["gate_w"] = jnp.zeros((E, H, I), dtype)
                lp["up_w"] = jnp.zeros((E, H, I), dtype)
                lp["down_w"] = jnp.zeros((E, I, H), dtype)
                lp["sh_gate_w"] = t2j(pop(p + "mlp.gate_proj.weight").T,
                                      dtype)
                lp["sh_up_w"] = t2j(pop(p + "mlp.up_proj.weight").T, dtype)
                lp["sh_down_w"] = t2j(pop(p + "mlp.down_proj.weight").T,
                                      dtype)
            layers.append(lp)

        return {
            "embed_tokens": t2j(pop("embed_tokens.weight"), dtype),
            "norm": t2j(pop("norm.weight"), dtype),
            "lm_head": t2j(sd.pop("lm_head.weight").float().T.contiguous(),
                           dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False, capture_layer=None):
        H, QH, KH, D = _dims(cfg)
        scale = D**-0.5
        eps = getattr(cfg, "rms_norm_eps", 1e-6)
        rope_theta = getattr(cfg, "rope_theta", 10000.0)
        max_pos = cfg.max_position_embeddings
        E = getattr(cfg, "n_routed_experts", 0) or 1
        top_k = min(getattr(cfg, "num_experts_per_tok", 2), E)
        renorm = bool(getattr(cfg, "norm_topk_prob", False))
        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            is_sparse = _is_sparse(cfg, lid)  # python static (unrolled)
            residual = h
            x = rms_norm(h, lp["input_ln"], eps)
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
            x = rms_norm(h, lp["post_ln"], eps)
            # Shared/dense MLP path; sparse layers add routed experts
            # (static per-layer pattern, so dense layers skip the MoE).
            dense = linear(
                silu_and_mul(linear(x, lp["sh_gate_w"]),
                             linear(x, lp["sh_up_w"])), lp["sh_down_w"])
            if is_sparse:
                router_logits = linear(x, lp["router_w"])
                moe_out = fused_moe(x, router_logits, lp["gate_w"],
                                    lp["up_w"], lp["down_w"], top_k=top_k,
                                    renormalize=renorm)
                ffn = moe_out.astype(h.dtype) + dense
            else:
                ffn = dense
            h = residual + ffn
            return h, kv_cache

        h, kv_cache, cap = run_layers(layer_fn, h, kv_cache, params,
                                      capture_layer)
        h = rms_norm(h, params["norm"], eps)
        if capture_layer is not None:
            return h, kv_cache, cap
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return jnp.dot(hidden, params["lm_head"],
                       preferred_element_type=jnp.float32)
