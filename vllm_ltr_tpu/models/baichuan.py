"""Baichuan decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/baichuan.py: a Llama
body with a fused W_pack QKV projection, rotary positions for the 7B
models ("BaichuanForCausalLM") and ALiBi for the 13B models
("BaiChuanForCausalLM" — the capitalization split follows the upstream
checkpoints, as in the reference registry).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, linear,
                                        normal_init, rms_norm, run_layers,
                                        silu_and_mul, stack_layers, t2j)
from vllm_ltr_tpu.ops.attention import alibi_slopes, attend


class BaichuanForCausalLM:
    """Rotary variant (Baichuan/Baichuan2 7B)."""

    POSITION = "rope"

    @classmethod
    def init_params(cls, cfg, rng, dtype) -> Dict[str, Any]:
        H, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        keys = jax.random.split(rng, cfg.num_hidden_layers + 2)

        def layer_params(key):
            ks = jax.random.split(key, 5)
            return {
                "q_w": normal_init(ks[0], (H, H), dtype),
                "k_w": normal_init(ks[1], (H, H), dtype),
                "v_w": normal_init(ks[2], (H, H), dtype),
                "o_w": normal_init(ks[2], (H, H), dtype),
                "gate_w": normal_init(ks[3], (H, F), dtype),
                "up_w": normal_init(ks[3], (H, F), dtype),
                "down_w": normal_init(ks[4], (F, H), dtype),
                "input_ln": jnp.ones((H, ), dtype),
                "post_ln": jnp.ones((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm": jnp.ones((H, ), dtype),
            "lm_head": normal_init(keys[1], (H, V), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:]]),
        }

    @classmethod
    def params_from_torch(cls, cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)

        def pop(name):
            for prefix in ("model.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        H = cfg.hidden_size
        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"layers.{i}."
            w_pack = pop(p + "self_attn.W_pack.weight").float()  # [3H, H]
            layers.append({
                "q_w": t2j(w_pack[:H].T.contiguous(), dtype),
                "k_w": t2j(w_pack[H:2 * H].T.contiguous(), dtype),
                "v_w": t2j(w_pack[2 * H:].T.contiguous(), dtype),
                "o_w": t2j(pop(p + "self_attn.o_proj.weight").T, dtype),
                "gate_w": t2j(pop(p + "mlp.gate_proj.weight").T, dtype),
                "up_w": t2j(pop(p + "mlp.up_proj.weight").T, dtype),
                "down_w": t2j(pop(p + "mlp.down_proj.weight").T, dtype),
                "input_ln": t2j(pop(p + "input_layernorm.weight"), dtype),
                "post_ln": t2j(pop(p + "post_attention_layernorm.weight"),
                               dtype),
            })
        return {
            "embed_tokens": t2j(pop("embed_tokens.weight"), dtype),
            "norm": t2j(pop("norm.weight"), dtype),
            "lm_head": t2j(sd.pop("lm_head.weight").float().T.contiguous(),
                           dtype),
            "layers": stack_layers(layers),
        }

    @classmethod
    def forward(cls, params, tokens, positions, kv_cache,
                meta: AttentionMetadata, cfg,
                decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        QH = cfg.num_attention_heads
        D = H // QH
        scale = D**-0.5
        eps = getattr(cfg, "rms_norm_eps", 1e-6)
        rope_theta = getattr(cfg, "rope_theta", 10000.0)
        max_pos = getattr(cfg, "max_position_embeddings", 4096)
        use_alibi = cls.POSITION == "alibi"
        slopes = alibi_slopes(QH) if use_alibi else None

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = rms_norm(h, lp["input_ln"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"]).reshape(T, QH, D)
            k = linear(x, lp["k_w"]).reshape(T, QH, D)
            v = linear(x, lp["v_w"]).reshape(T, QH, D)
            if not use_alibi:
                q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                              rope_theta, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode,
                                    alibi=slopes)
            h = residual + linear(attn.reshape(T, H), lp["o_w"])

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
        return jnp.dot(hidden, params["lm_head"],
                       preferred_element_type=jnp.float32)


class BaiChuanForCausalLM(BaichuanForCausalLM):
    """ALiBi variant (Baichuan/Baichuan2 13B)."""

    POSITION = "alibi"
