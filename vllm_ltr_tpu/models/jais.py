"""Jais (core42) decoder, TPU-native.

Behavioral counterpart of reference ``vllm/model_executor/models/jais.py``:
a GPT-2 body with μP scaling and ALiBi — embeddings times
``embeddings_scale`` (reference :225-249), attention scale ``1/D`` when
``mup_scale_qk_dot_by_d`` else ``1/sqrt(D)`` (:81-84), SwiGLU MLP variant
``c_proj(c_fc(x) * silu(c_fc2(x)))`` (:135-162), learned positions only
when ``position_embedding_type != "alibi"`` (:222-224), logits times
``width_scale`` (or mup_output_alpha * mup_width_scale, :271-277), and an
lm_head tied to wte. HF Conv1D weights are [in, out] — no transpose.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm, linear,
                                        normal_init, run_layers, stack_layers,
                                        t2j)
from vllm_ltr_tpu.ops.attention import alibi_slopes, attend


def _use_alibi(cfg) -> bool:
    return getattr(cfg, "position_embedding_type", "alibi") == "alibi"


def _swiglu(cfg) -> bool:
    return getattr(cfg, "activation_function", "gelu_new") == "swiglu"


class JAISLMHeadModel:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H = cfg.hidden_size
        F = getattr(cfg, "n_inner", None) or 4 * H
        V = cfg.vocab_size
        L = cfg.num_hidden_layers
        keys = jax.random.split(rng, L + 2)
        swiglu = _swiglu(cfg)

        def layer_params(key):
            ks = jax.random.split(key, 5)
            p = {
                "qkv_w": normal_init(ks[0], (H, 3 * H), dtype),
                "qkv_b": jnp.zeros((3 * H, ), dtype),
                "out_w": normal_init(ks[1], (H, H), dtype),
                "out_b": jnp.zeros((H, ), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
                "fc_w": normal_init(ks[2], (H, F), dtype),
                "fc_b": jnp.zeros((F, ), dtype),
                "proj_w": normal_init(ks[3], (F, H), dtype),
                "proj_b": jnp.zeros((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
                "ln2_b": jnp.zeros((H, ), dtype),
            }
            if swiglu:
                p["fc2_w"] = normal_init(ks[4], (H, F), dtype)
                p["fc2_b"] = jnp.zeros((F, ), dtype)
            return p

        params = {
            "wte": normal_init(keys[0], (V, H), dtype),
            "ln_f_s": jnp.ones((H, ), dtype),
            "ln_f_b": jnp.zeros((H, ), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:2 + L]]),
        }
        if not _use_alibi(cfg):
            params["wpe"] = normal_init(keys[1],
                                        (cfg.max_position_embeddings, H),
                                        dtype)
        return params

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)

        def pop(name):
            for prefix in ("transformer.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        params: Dict[str, Any] = {
            "wte": t2j(pop("wte.weight"), dtype),
            "ln_f_s": t2j(pop("ln_f.weight"), dtype),
            "ln_f_b": t2j(pop("ln_f.bias"), dtype),
        }
        if not _use_alibi(cfg):
            params["wpe"] = t2j(pop("wpe.weight"), dtype)
        swiglu = _swiglu(cfg)
        layers = []
        for i in range(cfg.num_hidden_layers):
            p = f"h.{i}."
            lp = {
                "qkv_w": t2j(pop(p + "attn.c_attn.weight"), dtype),
                "qkv_b": t2j(pop(p + "attn.c_attn.bias"), dtype),
                "out_w": t2j(pop(p + "attn.c_proj.weight"), dtype),
                "out_b": t2j(pop(p + "attn.c_proj.bias"), dtype),
                "ln1_s": t2j(pop(p + "ln_1.weight"), dtype),
                "ln1_b": t2j(pop(p + "ln_1.bias"), dtype),
                "fc_w": t2j(pop(p + "mlp.c_fc.weight"), dtype),
                "fc_b": t2j(pop(p + "mlp.c_fc.bias"), dtype),
                "proj_w": t2j(pop(p + "mlp.c_proj.weight"), dtype),
                "proj_b": t2j(pop(p + "mlp.c_proj.bias"), dtype),
                "ln2_s": t2j(pop(p + "ln_2.weight"), dtype),
                "ln2_b": t2j(pop(p + "ln_2.bias"), dtype),
            }
            if swiglu:
                lp["fc2_w"] = t2j(pop(p + "mlp.c_fc2.weight"), dtype)
                lp["fc2_b"] = t2j(pop(p + "mlp.c_fc2.bias"), dtype)
            layers.append(lp)
        params["layers"] = stack_layers(layers)
        return params

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H = cfg.hidden_size
        NH = cfg.num_attention_heads
        D = H // NH
        mup_qk = getattr(cfg, "mup_scale_qk_dot_by_d",
                         getattr(cfg, "scale_qk_dot_by_d", False))
        scale = D**(-1.0) if mup_qk else D**(-0.5)
        eps = getattr(cfg, "layer_norm_epsilon", 1e-5)
        use_alibi = _use_alibi(cfg)
        emb_scale = getattr(cfg, "embeddings_scale",
                            getattr(cfg, "mup_embeddings_scale", 1.0))
        slopes = alibi_slopes(NH) if use_alibi else None
        swiglu = _swiglu(cfg)

        h = params["wte"][tokens]
        if not use_alibi:
            h = h + params["wpe"][positions]
        h = h * jnp.asarray(emb_scale, h.dtype)

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = layer_norm(h, lp["ln1_s"], lp["ln1_b"], eps)
            qkv = linear(x, lp["qkv_w"], lp["qkv_b"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            T = q.shape[0]
            q = q.reshape(T, NH, D)
            k = k.reshape(T, NH, D)
            v = v.reshape(T, NH, D)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode, alibi=slopes)
            h = residual + linear(attn.reshape(T, H), lp["out_w"],
                                  lp["out_b"])

            residual = h
            x = layer_norm(h, lp["ln2_s"], lp["ln2_b"], eps)
            if swiglu:
                up = linear(x, lp["fc_w"], lp["fc_b"])
                gate = linear(x, lp["fc2_w"], lp["fc2_b"])
                x = up * jax.nn.silu(gate.astype(jnp.float32)).astype(
                    up.dtype)
            else:
                x = linear(x, lp["fc_w"], lp["fc_b"])
                x = jax.nn.gelu(x.astype(jnp.float32),
                                approximate=True).astype(x.dtype)
            h = residual + linear(x, lp["proj_w"], lp["proj_b"])
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = layer_norm(h, params["ln_f_s"], params["ln_f_b"], eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        if hasattr(cfg, "width_scale"):
            logits_scale = cfg.width_scale
        else:
            logits_scale = (getattr(cfg, "mup_output_alpha", 1.0) *
                            getattr(cfg, "mup_width_scale", 1.0))
        logits = jnp.dot(hidden, params["wte"].T,
                         preferred_element_type=jnp.float32)
        return logits * logits_scale
