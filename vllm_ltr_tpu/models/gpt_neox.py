"""GPT-NeoX (Pythia) decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/gpt_neox.py: partial
NeoX-style rotary, per-head fused QKV, parallel or sequential residual,
untied embed_out.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm, linear,
                                        normal_init, run_layers, stack_layers,
                                        t2j)
from vllm_ltr_tpu.ops.attention import attend


def _gelu(x: jax.Array, act: str) -> jax.Array:
    approx = act in ("gelu_new", "gelu_fast", "gelu_pytorch_tanh")
    return jax.nn.gelu(x.astype(jnp.float32),
                       approximate=approx).astype(x.dtype)


class GPTNeoXForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, V, F = cfg.hidden_size, cfg.vocab_size, cfg.intermediate_size
        NH = cfg.num_attention_heads
        D = H // NH
        keys = jax.random.split(rng, cfg.num_hidden_layers + 2)

        def layer_params(key):
            ks = jax.random.split(key, 5)
            return {
                "q_w": normal_init(ks[0], (H, NH * D), dtype),
                "q_b": jnp.zeros((NH * D, ), dtype),
                "k_w": normal_init(ks[1], (H, NH * D), dtype),
                "k_b": jnp.zeros((NH * D, ), dtype),
                "v_w": normal_init(ks[2], (H, NH * D), dtype),
                "v_b": jnp.zeros((NH * D, ), dtype),
                "o_w": normal_init(ks[3], (NH * D, H), dtype),
                "o_b": jnp.zeros((H, ), dtype),
                "fc1_w": normal_init(ks[4], (H, F), dtype),
                "fc1_b": jnp.zeros((F, ), dtype),
                "fc2_w": normal_init(ks[4], (F, H), dtype),
                "fc2_b": jnp.zeros((H, ), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
                "ln2_b": jnp.zeros((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (V, H), dtype),
            "norm_s": jnp.ones((H, ), dtype),
            "norm_b": jnp.zeros((H, ), dtype),
            "lm_head": normal_init(keys[1], (H, V), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)
        pop = sd.pop
        H = cfg.hidden_size
        NH = cfg.num_attention_heads
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
        for i in range(cfg.num_hidden_layers):
            p = f"gpt_neox.layers.{i}."
            (qw, kw, vw), (qb, kb, vb) = split_qkv(
                pop(p + "attention.query_key_value.weight"),
                pop(p + "attention.query_key_value.bias"))
            layers.append({
                "q_w": qw, "q_b": qb,
                "k_w": kw, "k_b": kb,
                "v_w": vw, "v_b": vb,
                "o_w": t2j(pop(p + "attention.dense.weight").T, dtype),
                "o_b": t2j(pop(p + "attention.dense.bias"), dtype),
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
            "embed_tokens": t2j(pop("gpt_neox.embed_in.weight"), dtype),
            "norm_s": t2j(pop("gpt_neox.final_layer_norm.weight"), dtype),
            "norm_b": t2j(pop("gpt_neox.final_layer_norm.bias"), dtype),
            "lm_head": t2j(pop("embed_out.weight").T, dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        NH = cfg.num_attention_heads
        D = H // NH
        scale = D**-0.5
        eps = getattr(cfg, "layer_norm_eps", 1e-5)
        rotary_dim = int(D * getattr(cfg, "rotary_pct", 1.0))
        base = getattr(cfg, "rotary_emb_base", 10000.0)
        max_pos = cfg.max_position_embeddings
        act = getattr(cfg, "hidden_act", "gelu")
        parallel = getattr(cfg, "use_parallel_residual", True)

        h = params["embed_tokens"][tokens]

        def self_attn(x, lp, kv_cache, lid):
            T = x.shape[0]
            q = linear(x, lp["q_w"], lp["q_b"]).reshape(T, NH, D)
            k = linear(x, lp["k_w"], lp["k_b"]).reshape(T, NH, D)
            v = linear(x, lp["v_w"], lp["v_b"]).reshape(T, NH, D)
            q, k = apply_rotary_embedding(positions, q, k, D, rotary_dim,
                                          max_pos, base, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            return linear(attn.reshape(T, NH * D), lp["o_w"],
                          lp["o_b"]), kv_cache

        def mlp(x, lp):
            x = linear(x, lp["fc1_w"], lp["fc1_b"])
            x = _gelu(x, act)
            return linear(x, lp["fc2_w"], lp["fc2_b"])

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            attn_out, kv_cache = self_attn(
                layer_norm(h, lp["ln1_s"], lp["ln1_b"], eps), lp,
                kv_cache, lid)
            if parallel:
                mlp_out = mlp(layer_norm(h, lp["ln2_s"], lp["ln2_b"], eps),
                              lp)
                h = h + attn_out + mlp_out
            else:
                h = h + attn_out
                h = h + mlp(layer_norm(h, lp["ln2_s"], lp["ln2_b"], eps), lp)
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = layer_norm(h, params["norm_s"], params["norm_b"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return jnp.dot(hidden, params["lm_head"],
                       preferred_element_type=jnp.float32)
