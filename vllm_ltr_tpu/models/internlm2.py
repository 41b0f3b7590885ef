"""InternLM2 decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/internlm2.py: a Llama
body with a grouped fused ``wqkv`` projection (per-kv-group: G queries,
k, v), w1/w3/w2 MLP naming, tok_embeddings / output head naming — and the
LTR fork's embedded mid-layer predictor hook (reference
internlm2.py:227-232), exposed through ``capture_layer`` like llama.
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
    KH = getattr(cfg, "num_key_value_heads", QH) or QH
    return H, QH, KH, H // QH


class InternLM2ForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, QH, KH, D = _dims(cfg)
        F = cfg.intermediate_size
        keys = jax.random.split(rng, cfg.num_hidden_layers + 2)

        def layer_params(key):
            ks = jax.random.split(key, 5)
            return {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "o_w": normal_init(ks[2], (QH * D, H), dtype),
                "gate_w": normal_init(ks[3], (H, F), dtype),
                "up_w": normal_init(ks[3], (H, F), dtype),
                "down_w": normal_init(ks[4], (F, H), dtype),
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

        H, QH, KH, D = _dims(cfg)
        G = QH // KH
        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"layers.{i}."
            wqkv = pop(p + "attention.wqkv.weight").float()
            grouped = wqkv.view(KH, G + 2, D, H)
            q = grouped[:, :G].reshape(QH * D, H)
            k = grouped[:, G].reshape(KH * D, H)
            v = grouped[:, G + 1].reshape(KH * D, H)
            layers.append({
                "q_w": t2j(q.T.contiguous(), dtype),
                "k_w": t2j(k.T.contiguous(), dtype),
                "v_w": t2j(v.T.contiguous(), dtype),
                "o_w": t2j(pop(p + "attention.wo.weight").T, dtype),
                "gate_w": t2j(pop(p + "feed_forward.w1.weight").T, dtype),
                "up_w": t2j(pop(p + "feed_forward.w3.weight").T, dtype),
                "down_w": t2j(pop(p + "feed_forward.w2.weight").T, dtype),
                "input_ln": t2j(pop(p + "attention_norm.weight"), dtype),
                "post_ln": t2j(pop(p + "ffn_norm.weight"), dtype),
            })
        return {
            "embed_tokens": t2j(pop("tok_embeddings.weight"), dtype),
            "norm": t2j(pop("norm.weight"), dtype),
            "lm_head": t2j(sd.pop("output.weight").float().T.contiguous(),
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
        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
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
            x = silu_and_mul(linear(x, lp["gate_w"]), linear(x, lp["up_w"]))
            h = residual + linear(x, lp["down_w"])
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
