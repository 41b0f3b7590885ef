"""Llama-family decoder (Llama 1/2/3, Mistral), TPU-native.

Behavioral counterpart of reference ``vllm/model_executor/models/llama.py``
(448 LoC): RMSNorm, SwiGLU MLP, rotary embeddings, grouped-query attention,
paged KV cache, FP8-KV scale hook (reference llama.py:126,429-445). Pure
functional JAX with stacked layer params and an unrolled layer loop
(common.run_layers) so the paged cache updates in place.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, linear,
                                        normal_init, rms_norm, run_layers,
                                        silu_and_mul, stack_layers, t2j)
from vllm_ltr_tpu.ops.attention import attend


def _lora(lp, name, x, scalings, slots):
    """Additive LoRA delta when the bank carries this target (static)."""
    if f"lora_{name}_a" not in lp:
        return 0.0
    from vllm_ltr_tpu.lora.models import apply_lora
    return apply_lora(x, lp[f"lora_{name}_a"], lp[f"lora_{name}_b"],
                      scalings, slots)


class LlamaForCausalLM:

    @staticmethod
    def prefuse_for_quantization(params: Dict[str, Any]) -> Dict[str, Any]:
        """Fuse q|k|v -> qkv_w and gate|up -> gateup_w (column concat of
        the float weights) before INT4 quantization: 4 fused kernels per
        layer instead of 7 measured 6.91 vs 8.36 ms per 8B decode step
        (bench_int4_layer --fused).  Single-chip only — the fused column
        layout would interleave TP shards (Megatron splits q/k/v EACH
        across ranks); TP keeps split projections.  Bias/LoRA deltas add
        after the split in forward, so semantics are unchanged."""
        from vllm_ltr_tpu.parallel.mesh import MODEL_AXIS, get_global_mesh
        if get_global_mesh().shape.get(MODEL_AXIS, 1) > 1:
            return params
        layers = dict(params.get("layers", {}))
        if not {"q_w", "k_w", "v_w"} <= set(layers):
            return params

        def cat(names):
            parts = [np.asarray(jax.device_get(layers.pop(n)))
                     for n in names]
            return np.concatenate(parts, axis=-1)

        layers["qkv_w"] = cat(["q_w", "k_w", "v_w"])
        if {"gate_w", "up_w"} <= set(layers):
            layers["gateup_w"] = cat(["gate_w", "up_w"])
        out = dict(params)
        out["layers"] = layers
        return out

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H = cfg.hidden_size
        I = cfg.intermediate_size
        V = cfg.vocab_size
        L = cfg.num_hidden_layers
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH) or QH
        D = H // QH
        keys = jax.random.split(rng, L + 3)

        # InternLM v1 / Aquila / Smaug run through this module with
        # attention biases enabled (reference llama.py:186-199 reads
        # attention_bias/bias off the config the same way).
        attn_bias = bool(getattr(cfg, "attention_bias", False)
                         or getattr(cfg, "bias", False))

        def layer_params(key):
            ks = jax.random.split(key, 7)
            p = {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "o_w": normal_init(ks[3], (QH * D, H), dtype),
                "gate_w": normal_init(ks[4], (H, I), dtype),
                "up_w": normal_init(ks[5], (H, I), dtype),
                "down_w": normal_init(ks[6], (I, H), dtype),
                "input_ln": jnp.ones((H, ), dtype),
                "post_ln": jnp.ones((H, ), dtype),
            }
            if attn_bias:
                p["q_b"] = jnp.zeros((QH * D, ), dtype)
                p["k_b"] = jnp.zeros((KH * D, ), dtype)
                p["v_b"] = jnp.zeros((KH * D, ), dtype)
                p["o_b"] = jnp.zeros((H, ), dtype)
            return p

        params = {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm": jnp.ones((H, ), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:2 + L]]),
        }
        if not getattr(cfg, "tie_word_embeddings", False):
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

        L = cfg.num_hidden_layers
        params: Dict[str, Any] = {
            "embed_tokens": t2j(pop("embed_tokens.weight"), dtype),
            "norm": t2j(pop("norm.weight"), dtype),
        }
        if "lm_head.weight" in sd:
            params["lm_head"] = t2j(sd.pop("lm_head.weight"), dtype).T
        layers = []
        for i in range(L):
            p = f"layers.{i}."
            lp = {
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
            }
            for short, full in (("q_b", "q_proj"), ("k_b", "k_proj"),
                                ("v_b", "v_proj"), ("o_b", "o_proj")):
                name = p + f"self_attn.{full}.bias"
                for prefix in ("model.", ""):
                    if prefix + name in sd:
                        lp[short] = t2j(sd.pop(prefix + name), dtype)
                        break
            layers.append(lp)
        params["layers"] = stack_layers(layers)
        return params

    @staticmethod
    def params_from_torch_quantized(cfg, state_dict, dtype,
                                    method: str) -> Dict[str, Any]:
        """Convert an AutoAWQ / AutoGPTQ Llama checkpoint: quantized
        projections repack to the canonical INT4 layout; everything else
        converts as usual."""
        from vllm_ltr_tpu.layers.quantization.int4 import (
            load_quantized_proj)
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
        if "lm_head.weight" in sd:
            params["lm_head"] = t2j(sd.pop("lm_head.weight"), dtype).T
        layers = []
        for i in range(L):
            p = f"model.layers.{i}."
            layers.append({
                "q_w": load_quantized_proj(sd, p + "self_attn.q_proj",
                                           method),
                "k_w": load_quantized_proj(sd, p + "self_attn.k_proj",
                                           method),
                "v_w": load_quantized_proj(sd, p + "self_attn.v_proj",
                                           method),
                "o_w": load_quantized_proj(sd, p + "self_attn.o_proj",
                                           method),
                "gate_w": load_quantized_proj(sd, p + "mlp.gate_proj",
                                              method),
                "up_w": load_quantized_proj(sd, p + "mlp.up_proj", method),
                "down_w": load_quantized_proj(sd, p + "mlp.down_proj",
                                              method),
                "input_ln":
                t2j(sd.pop(p + "input_layernorm.weight"), dtype),
                "post_ln":
                t2j(sd.pop(p + "post_attention_layernorm.weight"), dtype),
            })
        params["layers"] = stack_layers(layers)
        return params

    @staticmethod
    def forward(params, tokens: jax.Array, positions: jax.Array,
                kv_cache: jax.Array, meta: AttentionMetadata,
                cfg, decode_mode: bool = False, capture_layer=None,
                inputs_embeds=None):
        """decode_mode (static): every token is one decode step of the
        same-index sequence row; attention runs the streaming Pallas decode
        kernel instead of the mixed-batch reference path.
        capture_layer (static): when set, additionally return the hidden
        state entering that layer (the embedded mid-layer predictor hook,
        reference llama.py:288-293)."""
        H = cfg.hidden_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH) or QH
        D = H // QH
        scale = D**-0.5
        rope_theta = getattr(cfg, "rope_theta", 10000.0)
        rope_scaling = getattr(cfg, "rope_scaling", None) or {}
        scaling_type = rope_scaling.get("type",
                                        rope_scaling.get("rope_type"))
        scaling_factor = rope_scaling.get("factor", 1.0)
        max_pos = cfg.max_position_embeddings
        eps = getattr(cfg, "rms_norm_eps", 1e-6)
        sliding_window = getattr(cfg, "sliding_window", None)

        # inputs_embeds: pre-merged embeddings (the LLaVA vision path).
        h = (inputs_embeds if inputs_embeds is not None else
             params["embed_tokens"][tokens])
        lora_scalings = params.get("lora_scalings")
        lora_slots = meta.lora_slots
        if inputs_embeds is None and lora_slots is not None:
            from vllm_ltr_tpu.lora.models import apply_embedding_lora
            h = apply_embedding_lora(params, tokens, h, lora_slots)

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            # Per-layer FP8-KV scale (reference llama.py:126,429-445);
            # folded by attend() into q/out so kernels never see it.
            residual = h
            x = rms_norm(h, lp["input_ln"], eps)
            T = x.shape[0]
            if "qkv_w" in lp:
                # Fused projection (INT4 single-chip; see
                # prefuse_for_quantization).  Bias/LoRA add post-split.
                qkv = linear(x, lp["qkv_w"])
                q_, k_, v_ = (qkv[:, :QH * D],
                              qkv[:, QH * D:(QH + KH) * D],
                              qkv[:, (QH + KH) * D:])
            else:
                q_ = linear(x, lp["q_w"])
                k_ = linear(x, lp["k_w"])
                v_ = linear(x, lp["v_w"])
            q = (q_ + lp.get("q_b", 0) +
                 _lora(lp, "q", x, lora_scalings, lora_slots)).reshape(
                     T, QH, D)
            k = (k_ + lp.get("k_b", 0) +
                 _lora(lp, "k", x, lora_scalings, lora_slots)).reshape(
                     T, KH, D)
            v = (v_ + lp.get("v_b", 0) +
                 _lora(lp, "v", x, lora_scalings, lora_slots)).reshape(
                     T, KH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                          rope_theta, True, scaling_type,
                                          scaling_factor)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode,
                                    sliding_window=sliding_window,
                                    kv_scale=kv_scale)
            attn2 = attn.reshape(T, QH * D)
            h = (residual + linear(attn2, lp["o_w"]) + lp.get("o_b", 0) +
                 _lora(lp, "o", attn2, lora_scalings, lora_slots))

            residual = h
            x = rms_norm(h, lp["post_ln"], eps)
            if "gateup_w" in lp:
                gu = linear(x, lp["gateup_w"])
                I = gu.shape[-1] // 2
                g_, u_ = gu[:, :I], gu[:, I:]
            else:
                g_ = linear(x, lp["gate_w"])
                u_ = linear(x, lp["up_w"])
            x = silu_and_mul(
                g_ + _lora(lp, "gate", x, lora_scalings, lora_slots),
                u_ + _lora(lp, "up", x, lora_scalings, lora_slots))
            h = residual + linear(x, lp["down_w"]) + _lora(
                lp, "down", x, lora_scalings, lora_slots)
            return h, kv_cache

        h, kv_cache, cap = run_layers(layer_fn, h, kv_cache, params,
                                      capture_layer)
        h = rms_norm(h, params["norm"], eps)
        if capture_layer is not None:
            return h, kv_cache, cap
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        if "lm_head" in params:
            return jnp.dot(hidden, params["lm_head"],
                           preferred_element_type=jnp.float32)
        return jnp.dot(hidden, params["embed_tokens"].T,
                       preferred_element_type=jnp.float32)
