"""Qwen2-MoE decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/qwen2_moe.py (448
LoC): Qwen2 attention (biased QKV) + sparse expert FFN with a SHARED
expert whose output is blended through a sigmoid gate, plus optional
dense layers (``mlp_only_layers`` / ``decoder_sparse_step``).  The expert
dispatch rides the capacity-based fused MoE (layers/moe.py).
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


def _is_sparse(cfg, layer_idx: int) -> bool:
    if layer_idx in (getattr(cfg, "mlp_only_layers", None) or []):
        return False
    step = getattr(cfg, "decoder_sparse_step", 1)
    return cfg.num_experts > 0 and (layer_idx + 1) % max(step, 1) == 0


class Qwen2MoeForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, V = cfg.hidden_size, cfg.vocab_size
        QH = cfg.num_attention_heads
        KH = cfg.num_key_value_heads
        D = H // QH
        E = cfg.num_experts
        I = cfg.moe_intermediate_size
        SI = getattr(cfg, "shared_expert_intermediate_size", I)
        DI = cfg.intermediate_size  # dense layers
        keys = jax.random.split(rng, cfg.num_hidden_layers + 2)

        def layer_params(key):
            ks = jax.random.split(key, 12)
            return {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "q_b": jnp.zeros((QH * D, ), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "k_b": jnp.zeros((KH * D, ), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "v_b": jnp.zeros((KH * D, ), dtype),
                "o_w": normal_init(ks[3], (QH * D, H), dtype),
                "router_w": normal_init(ks[4], (H, E), dtype),
                "gate_w": normal_init(ks[5], (E, H, I), dtype),
                "up_w": normal_init(ks[6], (E, H, I), dtype),
                "down_w": normal_init(ks[7], (E, I, H), dtype),
                "sh_gate_w": normal_init(ks[8], (H, SI), dtype),
                "sh_up_w": normal_init(ks[9], (H, SI), dtype),
                "sh_down_w": normal_init(ks[10], (SI, H), dtype),
                "sh_gate_proj": normal_init(ks[11], (H, 1), dtype),
                # Dense fallback weights (unused on sparse layers; kept so
                # the scanned pytree is uniform). Zero-size trick avoided:
                # dense layers reuse the shared-expert weights with DI==SI.
                "input_ln": jnp.ones((H, ), dtype),
                "post_ln": jnp.ones((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm": jnp.ones((H, ), dtype),
            "lm_head": normal_init(keys[1], (H, V), dtype),
            "layers": stack_layers(
                [layer_params(k) for k in keys[2:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)

        def pop(name):
            for prefix in ("model.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        E = cfg.num_experts
        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"layers.{i}."
            lp = {
                "q_w": t2j(pop(p + "self_attn.q_proj.weight").T, dtype),
                "q_b": t2j(pop(p + "self_attn.q_proj.bias"), dtype),
                "k_w": t2j(pop(p + "self_attn.k_proj.weight").T, dtype),
                "k_b": t2j(pop(p + "self_attn.k_proj.bias"), dtype),
                "v_w": t2j(pop(p + "self_attn.v_proj.weight").T, dtype),
                "v_b": t2j(pop(p + "self_attn.v_proj.bias"), dtype),
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
                    pop(p + "mlp.shared_expert.gate_proj.weight").T, dtype)
                lp["sh_up_w"] = t2j(
                    pop(p + "mlp.shared_expert.up_proj.weight").T, dtype)
                lp["sh_down_w"] = t2j(
                    pop(p + "mlp.shared_expert.down_proj.weight").T, dtype)
                lp["sh_gate_proj"] = t2j(
                    pop(p + "mlp.shared_expert_gate.weight").T, dtype)
            else:
                # Dense layer: stored in the shared-expert slots; router
                # zeroed so fused_moe output is ignored.
                H = cfg.hidden_size
                I = cfg.moe_intermediate_size
                lp["router_w"] = jnp.zeros((H, E), dtype)
                lp["gate_w"] = jnp.zeros((E, H, I), dtype)
                lp["up_w"] = jnp.zeros((E, H, I), dtype)
                lp["down_w"] = jnp.zeros((E, I, H), dtype)
                lp["sh_gate_w"] = t2j(pop(p + "mlp.gate_proj.weight").T,
                                      dtype)
                lp["sh_up_w"] = t2j(pop(p + "mlp.up_proj.weight").T, dtype)
                lp["sh_down_w"] = t2j(pop(p + "mlp.down_proj.weight").T,
                                      dtype)
                # Gate fixed wide-open (sigmoid(+30) ~= 1) for dense layers.
                lp["sh_gate_proj"] = jnp.full((cfg.hidden_size, 1), 0.0,
                                              dtype)
            layers.append(lp)

        params = {
            "embed_tokens": t2j(pop("embed_tokens.weight"), dtype),
            "norm": t2j(pop("norm.weight"), dtype),
            "layers": stack_layers(layers),
            # Per-layer flags consumed by forward (static python list).
        }
        if "lm_head.weight" in sd:
            params["lm_head"] = t2j(sd.pop("lm_head.weight").T, dtype)
        return params

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        QH, KH = cfg.num_attention_heads, cfg.num_key_value_heads
        D = H // QH
        scale = D**-0.5
        eps = getattr(cfg, "rms_norm_eps", 1e-6)
        rope_theta = getattr(cfg, "rope_theta", 10000.0)
        max_pos = cfg.max_position_embeddings
        top_k = cfg.num_experts_per_tok
        renorm = bool(getattr(cfg, "norm_topk_prob", False))
        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            # Per-layer sparse/dense pattern: a PYTHON static in the
            # unrolled loop, so dense layers skip the MoE compute entirely.
            is_sparse = _is_sparse(cfg, lid)
            residual = h
            x = rms_norm(h, lp["input_ln"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"], lp["q_b"]).reshape(T, QH, D)
            k = linear(x, lp["k_w"], lp["k_b"]).reshape(T, KH, D)
            v = linear(x, lp["v_w"], lp["v_b"]).reshape(T, KH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                          rope_theta, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            h = residual + linear(attn.reshape(T, QH * D), lp["o_w"])

            residual = h
            x = rms_norm(h, lp["post_ln"], eps)
            # Shared expert path (also the dense-layer MLP).
            shared = linear(
                silu_and_mul(linear(x, lp["sh_gate_w"]),
                             linear(x, lp["sh_up_w"])), lp["sh_down_w"])
            if is_sparse:
                gate = jax.nn.sigmoid(
                    linear(x, lp["sh_gate_proj"]).astype(jnp.float32))
                shared_out = gate.astype(h.dtype) * shared
                router_logits = linear(x, lp["router_w"])
                moe_out = fused_moe(x, router_logits, lp["gate_w"],
                                    lp["up_w"], lp["down_w"], top_k=top_k,
                                    renormalize=renorm)
                ffn = moe_out.astype(h.dtype) + shared_out
            else:
                ffn = shared
            h = residual + ffn
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
