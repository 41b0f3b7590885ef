"""Falcon decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/falcon.py: covers the
new decoder architecture (40B/180B: per-group fused QKV, parallel
attention+MLP with twin layer norms), the classic multi-query 7B layout,
and the sequential RW variant; rotary or ALiBi positions.  The fused HF
QKV projection is un-fused into separate q/k/v at load time so the
serving kernels see the standard [T, heads, D] layout.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm, linear,
                                        normal_init, run_layers, stack_layers,
                                        t2j)
from vllm_ltr_tpu.ops.attention import alibi_slopes, attend


def _geometry(cfg) -> Tuple[int, int, int]:
    """(query heads, kv heads, head_dim)."""
    QH = cfg.num_attention_heads
    D = cfg.hidden_size // QH
    if getattr(cfg, "new_decoder_architecture", False):
        KH = cfg.num_kv_heads
    elif getattr(cfg, "multi_query", False):
        KH = 1
    else:
        KH = QH
    return QH, KH, D


def _unfuse_qkv(w, cfg, dtype):
    """HF fused query_key_value [out, H] -> (q [H, QH*D], k, v [H, KH*D])."""
    import torch
    QH, KH, D = _geometry(cfg)
    H = cfg.hidden_size
    w = w.float()
    if getattr(cfg, "new_decoder_architecture", False):
        # Per-kv-group layout: G queries, then k, then v.
        G = QH // KH
        grouped = w.view(KH, G + 2, D, H)
        q = grouped[:, :G].reshape(QH * D, H)
        k = grouped[:, G].reshape(KH * D, H)
        v = grouped[:, G + 1].reshape(KH * D, H)
    elif getattr(cfg, "multi_query", False):
        q, k, v = w[:QH * D], w[QH * D:QH * D + D], w[QH * D + D:]
    else:
        per_head = w.view(QH, 3, D, H)
        q = per_head[:, 0].reshape(QH * D, H)
        k = per_head[:, 1].reshape(QH * D, H)
        v = per_head[:, 2].reshape(QH * D, H)
    # [out, in] -> [in, out]
    return (t2j(q.T.contiguous(), dtype), t2j(k.T.contiguous(), dtype),
            t2j(v.T.contiguous(), dtype))


class FalconForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        QH, KH, D = _geometry(cfg)
        H = cfg.hidden_size
        F = getattr(cfg, "ffn_hidden_size", None) or 4 * H
        keys = jax.random.split(rng, cfg.num_hidden_layers + 1)

        def layer_params(key):
            ks = jax.random.split(key, 4)
            p = {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[0], (H, KH * D), dtype),
                "v_w": normal_init(ks[0], (H, KH * D), dtype),
                "o_w": normal_init(ks[1], (H, H), dtype),
                "fc1_w": normal_init(ks[2], (H, F), dtype),
                "fc2_w": normal_init(ks[3], (F, H), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
                "ln2_b": jnp.zeros((H, ), dtype),
            }
            return p

        return {
            "embed_tokens": normal_init(keys[0], (cfg.vocab_size, H), dtype),
            "ln_f_s": jnp.ones((H, ), dtype),
            "ln_f_b": jnp.zeros((H, ), dtype),
            "layers": stack_layers(
                [layer_params(k) for k in keys[1:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)

        def pop(name):
            for prefix in ("transformer.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        new_arch = getattr(cfg, "new_decoder_architecture", False)
        parallel = new_arch or getattr(cfg, "parallel_attn", False)
        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"h.{i}."
            q, k, v = _unfuse_qkv(pop(p + "self_attention.query_key_value."
                                      "weight"), cfg, dtype)
            lp = {
                "q_w": q, "k_w": k, "v_w": v,
                "o_w": t2j(pop(p + "self_attention.dense.weight").T, dtype),
                "fc1_w": t2j(pop(p + "mlp.dense_h_to_4h.weight").T, dtype),
                "fc2_w": t2j(pop(p + "mlp.dense_4h_to_h.weight").T, dtype),
            }
            if new_arch:
                lp["ln1_s"] = t2j(pop(p + "ln_attn.weight"), dtype)
                lp["ln1_b"] = t2j(pop(p + "ln_attn.bias"), dtype)
                lp["ln2_s"] = t2j(pop(p + "ln_mlp.weight"), dtype)
                lp["ln2_b"] = t2j(pop(p + "ln_mlp.bias"), dtype)
            else:
                lp["ln1_s"] = t2j(pop(p + "input_layernorm.weight"), dtype)
                lp["ln1_b"] = t2j(pop(p + "input_layernorm.bias"), dtype)
                if parallel:
                    lp["ln2_s"] = lp["ln1_s"]
                    lp["ln2_b"] = lp["ln1_b"]
                else:
                    lp["ln2_s"] = t2j(
                        pop(p + "post_attention_layernorm.weight"), dtype)
                    lp["ln2_b"] = t2j(
                        pop(p + "post_attention_layernorm.bias"), dtype)
            layers.append(lp)

        return {
            "embed_tokens": t2j(pop("word_embeddings.weight"), dtype),
            "ln_f_s": t2j(pop("ln_f.weight"), dtype),
            "ln_f_b": t2j(pop("ln_f.bias"), dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        QH, KH, D = _geometry(cfg)
        H = cfg.hidden_size
        scale = D**-0.5
        eps = getattr(cfg, "layer_norm_epsilon", 1e-5)
        use_alibi = getattr(cfg, "alibi", False)
        parallel = (getattr(cfg, "new_decoder_architecture", False)
                    or getattr(cfg, "parallel_attn", False))
        rope_theta = getattr(cfg, "rope_theta", 10000.0)
        max_pos = getattr(cfg, "max_position_embeddings", 2048)
        slopes = alibi_slopes(QH) if use_alibi else None

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x_attn = layer_norm(h, lp["ln1_s"], lp["ln1_b"], eps)
            x_mlp = (layer_norm(h, lp["ln2_s"], lp["ln2_b"], eps)
                     if parallel else None)
            T = x_attn.shape[0]
            q = linear(x_attn, lp["q_w"]).reshape(T, QH, D)
            k = linear(x_attn, lp["k_w"]).reshape(T, KH, D)
            v = linear(x_attn, lp["v_w"]).reshape(T, KH, D)
            if not use_alibi:
                q, k = apply_rotary_embedding(positions, q, k, D, D, max_pos,
                                              rope_theta, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode,
                                    alibi=slopes)
            attn_out = linear(attn.reshape(T, QH * D), lp["o_w"])

            if parallel:
                mlp = linear(
                    jax.nn.gelu(
                        linear(x_mlp, lp["fc1_w"]).astype(jnp.float32),
                        approximate=False).astype(h.dtype), lp["fc2_w"])
                h = residual + attn_out + mlp
            else:
                h = residual + attn_out
                residual = h
                x = layer_norm(h, lp["ln2_s"], lp["ln2_b"], eps)
                mlp = linear(
                    jax.nn.gelu(
                        linear(x, lp["fc1_w"]).astype(jnp.float32),
                        approximate=False).astype(h.dtype), lp["fc2_w"])
                h = residual + mlp
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = layer_norm(h, params["ln_f_s"], params["ln_f_b"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return jnp.dot(hidden, params["embed_tokens"].T,
                       preferred_element_type=jnp.float32)
