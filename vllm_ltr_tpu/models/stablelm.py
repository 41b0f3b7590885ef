"""StableLM (stablelm-3b/StableLM-2) decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/stablelm.py: partial
NeoX rotary, LayerNorm (biased), optional QKV bias, optional per-head
QK-LayerNorm, parallel or sequential residual, SiLU-gated MLP, untied
lm_head.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.rotary import apply_rotary_embedding
from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm, linear,
                                        normal_init, run_layers, silu_and_mul,
                                        stack_layers, t2j)
from vllm_ltr_tpu.ops.attention import attend


def _per_head_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                         eps: float) -> jax.Array:
    """LayerNorm over head_dim with per-head affine ([T, NH, D] weights
    [NH, D])."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean)**2).mean(axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * scale[None].astype(jnp.float32) +
            bias[None].astype(jnp.float32)).astype(x.dtype)


class StableLmForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH)
        D = H // QH
        use_bias = getattr(cfg, "use_qkv_bias", False)
        qk_ln = getattr(cfg, "qk_layernorm", False)
        keys = jax.random.split(rng, cfg.num_hidden_layers + 2)

        def layer_params(key):
            ks = jax.random.split(key, 7)
            p = {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[1], (H, KH * D), dtype),
                "v_w": normal_init(ks[2], (H, KH * D), dtype),
                "o_w": normal_init(ks[3], (QH * D, H), dtype),
                "gate_w": normal_init(ks[4], (H, F), dtype),
                "up_w": normal_init(ks[5], (H, F), dtype),
                "down_w": normal_init(ks[6], (F, H), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
                "ln2_b": jnp.zeros((H, ), dtype),
            }
            if use_bias:
                p["q_b"] = jnp.zeros((QH * D, ), dtype)
                p["k_b"] = jnp.zeros((KH * D, ), dtype)
                p["v_b"] = jnp.zeros((KH * D, ), dtype)
            if qk_ln:
                p["qln_s"] = jnp.ones((QH, D), dtype)
                p["qln_b"] = jnp.zeros((QH, D), dtype)
                p["kln_s"] = jnp.ones((KH, D), dtype)
                p["kln_b"] = jnp.zeros((KH, D), dtype)
            return p

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
        use_bias = getattr(cfg, "use_qkv_bias", False)
        qk_ln = getattr(cfg, "qk_layernorm", False)
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH)
        parallel = getattr(cfg, "use_parallel_residual", False)

        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"model.layers.{i}."
            lp = {
                "q_w": t2j(pop(p + "self_attn.q_proj.weight").T, dtype),
                "k_w": t2j(pop(p + "self_attn.k_proj.weight").T, dtype),
                "v_w": t2j(pop(p + "self_attn.v_proj.weight").T, dtype),
                "o_w": t2j(pop(p + "self_attn.o_proj.weight").T, dtype),
                "gate_w": t2j(pop(p + "mlp.gate_proj.weight").T, dtype),
                "up_w": t2j(pop(p + "mlp.up_proj.weight").T, dtype),
                "down_w": t2j(pop(p + "mlp.down_proj.weight").T, dtype),
                "ln1_s": t2j(pop(p + "input_layernorm.weight"), dtype),
                "ln1_b": t2j(pop(p + "input_layernorm.bias"), dtype),
            }
            if parallel:
                lp["ln2_s"] = jnp.ones_like(lp["ln1_s"])
                lp["ln2_b"] = jnp.zeros_like(lp["ln1_b"])
            else:
                lp["ln2_s"] = t2j(
                    pop(p + "post_attention_layernorm.weight"), dtype)
                lp["ln2_b"] = t2j(
                    pop(p + "post_attention_layernorm.bias"), dtype)
            if use_bias:
                lp["q_b"] = t2j(pop(p + "self_attn.q_proj.bias"), dtype)
                lp["k_b"] = t2j(pop(p + "self_attn.k_proj.bias"), dtype)
                lp["v_b"] = t2j(pop(p + "self_attn.v_proj.bias"), dtype)
            if qk_ln:
                D = cfg.hidden_size // QH
                lp["qln_s"] = jnp.stack([
                    t2j(pop(p + f"self_attn.q_layernorm.norms.{h}.weight"),
                        dtype) for h in range(QH)
                ])
                lp["qln_b"] = jnp.stack([
                    t2j(pop(p + f"self_attn.q_layernorm.norms.{h}.bias"),
                        dtype) for h in range(QH)
                ])
                lp["kln_s"] = jnp.stack([
                    t2j(pop(p + f"self_attn.k_layernorm.norms.{h}.weight"),
                        dtype) for h in range(KH)
                ])
                lp["kln_b"] = jnp.stack([
                    t2j(pop(p + f"self_attn.k_layernorm.norms.{h}.bias"),
                        dtype) for h in range(KH)
                ])
            layers.append(lp)
        return {
            "embed_tokens": t2j(pop("model.embed_tokens.weight"), dtype),
            "norm_s": t2j(pop("model.norm.weight"), dtype),
            "norm_b": t2j(pop("model.norm.bias"), dtype),
            "lm_head": t2j(pop("lm_head.weight").T, dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        QH = cfg.num_attention_heads
        KH = getattr(cfg, "num_key_value_heads", QH)
        D = H // QH
        scale = D**-0.5
        eps = getattr(cfg, "layer_norm_eps", 1e-5)
        rotary_dim = int(D * getattr(cfg, "partial_rotary_factor", 0.25))
        base = getattr(cfg, "rope_theta", 10000.0)
        max_pos = cfg.max_position_embeddings
        parallel = getattr(cfg, "use_parallel_residual", False)
        qk_ln = getattr(cfg, "qk_layernorm", False)

        h = params["embed_tokens"][tokens]

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            x = layer_norm(h, lp["ln1_s"], lp["ln1_b"], eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"], lp.get("q_b")).reshape(T, QH, D)
            k = linear(x, lp["k_w"], lp.get("k_b")).reshape(T, KH, D)
            v = linear(x, lp["v_w"], lp.get("v_b")).reshape(T, KH, D)
            if qk_ln:
                q = _per_head_layer_norm(q, lp["qln_s"], lp["qln_b"], eps)
                k = _per_head_layer_norm(k, lp["kln_s"], lp["kln_b"], eps)
            q, k = apply_rotary_embedding(positions, q, k, D, rotary_dim,
                                          max_pos, base, True)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            attn_out = linear(attn.reshape(T, QH * D), lp["o_w"])

            def mlp(y):
                return linear(
                    silu_and_mul(linear(y, lp["gate_w"]),
                                 linear(y, lp["up_w"])), lp["down_w"])

            if parallel:
                h = h + attn_out + mlp(x)
            else:
                h = h + attn_out
                h = h + mlp(layer_norm(h, lp["ln2_s"], lp["ln2_b"], eps))
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = layer_norm(h, params["norm_s"], params["norm_b"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return jnp.dot(hidden, params["lm_head"],
                       preferred_element_type=jnp.float32)
