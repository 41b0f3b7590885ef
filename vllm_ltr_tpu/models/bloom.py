"""BLOOM decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/bloom.py: ALiBi
attention (no positional embeddings), embedding LayerNorm, per-head
interleaved fused QKV, tanh-GELU MLP, tied lm_head.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm, linear,
                                        normal_init, run_layers, stack_layers,
                                        t2j)
from vllm_ltr_tpu.ops.attention import alibi_slopes, attend


class BloomForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, V = cfg.hidden_size, cfg.vocab_size
        NH = cfg.n_head
        D = H // NH
        keys = jax.random.split(rng, cfg.n_layer + 1)

        def layer_params(key):
            ks = jax.random.split(key, 4)
            return {
                # Stored split per-projection; the HF checkpoint's fused,
                # per-head-interleaved QKV is unpacked at load time.
                "q_w": normal_init(ks[0], (H, NH * D), dtype),
                "q_b": jnp.zeros((NH * D, ), dtype),
                "k_w": normal_init(ks[1], (H, NH * D), dtype),
                "k_b": jnp.zeros((NH * D, ), dtype),
                "v_w": normal_init(ks[1], (H, NH * D), dtype),
                "v_b": jnp.zeros((NH * D, ), dtype),
                "o_w": normal_init(ks[2], (NH * D, H), dtype),
                "o_b": jnp.zeros((H, ), dtype),
                "fc1_w": normal_init(ks[3], (H, 4 * H), dtype),
                "fc1_b": jnp.zeros((4 * H, ), dtype),
                "fc2_w": normal_init(ks[3], (4 * H, H), dtype),
                "fc2_b": jnp.zeros((H, ), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
                "ln2_b": jnp.zeros((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "embed_ln_s": jnp.ones((H, ), dtype),
            "embed_ln_b": jnp.zeros((H, ), dtype),
            "norm_s": jnp.ones((H, ), dtype),
            "norm_b": jnp.zeros((H, ), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[1:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)
        pop = sd.pop
        H = cfg.hidden_size
        NH = cfg.n_head
        D = H // NH

        def split_qkv(w, b):
            # HF fuses per head: rows are NH blocks of (q, k, v) x D.
            w = w.T.reshape(H, NH, 3, D)
            b = b.reshape(NH, 3, D)
            return ([t2j(w[:, :, i, :].reshape(H, NH * D), dtype)
                     for i in range(3)],
                    [t2j(b[:, i, :].reshape(NH * D), dtype)
                     for i in range(3)])

        layers = []
        for i in range(cfg.n_layer):
            p = f"transformer.h.{i}."
            (qw, kw, vw), (qb, kb, vb) = split_qkv(
                pop(p + "self_attention.query_key_value.weight"),
                pop(p + "self_attention.query_key_value.bias"))
            layers.append({
                "q_w": qw, "q_b": qb,
                "k_w": kw, "k_b": kb,
                "v_w": vw, "v_b": vb,
                "o_w": t2j(pop(p + "self_attention.dense.weight").T, dtype),
                "o_b": t2j(pop(p + "self_attention.dense.bias"), dtype),
                "fc1_w": t2j(pop(p + "mlp.dense_h_to_4h.weight").T, dtype),
                "fc1_b": t2j(pop(p + "mlp.dense_h_to_4h.bias"), dtype),
                "fc2_w": t2j(pop(p + "mlp.dense_4h_to_h.weight").T, dtype),
                "fc2_b": t2j(pop(p + "mlp.dense_4h_to_h.bias"), dtype),
                "ln1_s": t2j(pop(p + "input_layernorm.weight"), dtype),
                "ln1_b": t2j(pop(p + "input_layernorm.bias"), dtype),
                "ln2_s": t2j(pop(p + "post_attention_layernorm.weight"),
                             dtype),
                "ln2_b": t2j(pop(p + "post_attention_layernorm.bias"),
                             dtype),
            })
        return {
            "embed_tokens": t2j(pop("transformer.word_embeddings.weight"),
                                dtype),
            "embed_ln_s": t2j(
                pop("transformer.word_embeddings_layernorm.weight"), dtype),
            "embed_ln_b": t2j(
                pop("transformer.word_embeddings_layernorm.bias"), dtype),
            "norm_s": t2j(pop("transformer.ln_f.weight"), dtype),
            "norm_b": t2j(pop("transformer.ln_f.bias"), dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        NH = cfg.n_head
        D = H // NH
        scale = D**-0.5
        eps = getattr(cfg, "layer_norm_epsilon", 1e-5)
        slopes = alibi_slopes(NH)

        h = params["embed_tokens"][tokens]
        h = layer_norm(h, params["embed_ln_s"], params["embed_ln_b"], eps)

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = layer_norm(h, lp["ln1_s"], lp["ln1_b"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"], lp["q_b"]).reshape(T, NH, D)
            k = linear(x, lp["k_w"], lp["k_b"]).reshape(T, NH, D)
            v = linear(x, lp["v_w"], lp["v_b"]).reshape(T, NH, D)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode,
                                    alibi=slopes)
            h = residual + linear(attn.reshape(T, NH * D), lp["o_w"],
                                  lp["o_b"])

            residual = h
            x = layer_norm(h, lp["ln2_s"], lp["ln2_b"], eps)
            x = linear(x, lp["fc1_w"], lp["fc1_b"])
            x = jax.nn.gelu(x.astype(jnp.float32),
                            approximate=True).astype(h.dtype)
            h = residual + linear(x, lp["fc2_w"], lp["fc2_b"])
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = layer_norm(h, params["norm_s"], params["norm_b"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return jnp.dot(hidden, params["embed_tokens"].T,
                       preferred_element_type=jnp.float32)
