"""Qwen (v1, QWenLMHeadModel) decoder, TPU-native.

Behavioral counterpart of reference ``vllm/model_executor/models/qwen.py``:
RMSNorm (ln_1/ln_2/ln_f), fused biased c_attn QKV, bias-free c_proj,
full-head rotary, MHA, and a SwiGLU MLP whose HF naming is w2=gate / w1=up
with per-branch width ``intermediate_size // 2`` (reference qwen.py:36-57,
weight mapping :256-259). Untied lm_head.
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


def _max_pos(cfg) -> int:
    return (getattr(cfg, "max_position_embeddings", None)
            or getattr(cfg, "seq_length", 2048))


class QWenLMHeadModel:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, V = cfg.hidden_size, cfg.vocab_size
        F = cfg.intermediate_size // 2
        keys = jax.random.split(rng, cfg.num_hidden_layers + 2)

        def layer_params(key):
            ks = jax.random.split(key, 5)
            return {
                "qkv_w": normal_init(ks[0], (H, 3 * H), dtype),
                "qkv_b": jnp.zeros((3 * H, ), dtype),
                "o_w": normal_init(ks[1], (H, H), dtype),
                "gate_w": normal_init(ks[2], (H, F), dtype),
                "up_w": normal_init(ks[3], (H, F), dtype),
                "down_w": normal_init(ks[4], (F, H), dtype),
                "ln1": jnp.ones((H, ), dtype),
                "ln2": jnp.ones((H, ), dtype),
            }

        return {
            "wte": normal_init(keys[0], (V, H), dtype),
            "ln_f": jnp.ones((H, ), dtype),
            "lm_head": normal_init(keys[1], (H, V), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)

        def pop(name):
            for prefix in ("transformer.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"h.{i}."
            layers.append({
                "qkv_w": t2j(pop(p + "attn.c_attn.weight"), dtype).T,
                "qkv_b": t2j(pop(p + "attn.c_attn.bias"), dtype),
                "o_w": t2j(pop(p + "attn.c_proj.weight"), dtype).T,
                # HF naming: w2 is the gate branch, w1 the up branch.
                "gate_w": t2j(pop(p + "mlp.w2.weight"), dtype).T,
                "up_w": t2j(pop(p + "mlp.w1.weight"), dtype).T,
                "down_w": t2j(pop(p + "mlp.c_proj.weight"), dtype).T,
                "ln1": t2j(pop(p + "ln_1.weight"), dtype),
                "ln2": t2j(pop(p + "ln_2.weight"), dtype),
            })
        return {
            "wte": t2j(pop("wte.weight"), dtype),
            "ln_f": t2j(pop("ln_f.weight"), dtype),
            "lm_head": t2j(sd.pop("lm_head.weight"), dtype).T,
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        NH = cfg.num_attention_heads
        D = H // NH
        scale = D**-0.5
        eps = getattr(cfg, "layer_norm_epsilon", 1e-6)
        base = getattr(cfg, "rotary_emb_base", 10000.0)
        max_pos = _max_pos(cfg)

        h = params["wte"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = rms_norm(h, lp["ln1"], eps)
            qkv = linear(x, lp["qkv_w"], lp["qkv_b"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            T = q.shape[0]
            q = q.reshape(T, NH, D)
            k = k.reshape(T, NH, D)
            v = v.reshape(T, NH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                          base, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            h = residual + linear(attn.reshape(T, H), lp["o_w"])

            residual = h
            x = rms_norm(h, lp["ln2"], eps)
            x = silu_and_mul(linear(x, lp["gate_w"]), linear(x, lp["up_w"]))
            h = residual + linear(x, lp["down_w"])
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = rms_norm(h, params["ln_f"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return jnp.dot(hidden, params["lm_head"],
                       preferred_element_type=jnp.float32)
