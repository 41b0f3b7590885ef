"""MPT decoder, TPU-native.

Counterpart of reference vllm/model_executor/models/mpt.py: ALiBi
positions (no rotary), fused Wqkv un-fused at load, bias-free LayerNorms
(``no_bias``), GELU MLP, tied embeddings.  ALiBi batches run through the
XLA attention path (the Pallas kernels don't carry the bias yet).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm, linear,
                                        normal_init, run_layers, stack_layers,
                                        t2j)
from vllm_ltr_tpu.ops.attention import alibi_slopes, attend


def _dims(cfg):
    H = cfg.d_model
    QH = cfg.n_heads
    attn_cfg = getattr(cfg, "attn_config", None)
    KH = getattr(attn_cfg, "kv_n_heads", None) or QH
    return H, QH, KH, H // QH


class MptForCausalLM:

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H, QH, KH, D = _dims(cfg)
        F = int(getattr(cfg, "expansion_ratio", 4) * H)
        keys = jax.random.split(rng, cfg.n_layers + 1)

        def layer_params(key):
            ks = jax.random.split(key, 4)
            return {
                "q_w": normal_init(ks[0], (H, QH * D), dtype),
                "k_w": normal_init(ks[0], (H, KH * D), dtype),
                "v_w": normal_init(ks[0], (H, KH * D), dtype),
                "o_w": normal_init(ks[1], (QH * D, H), dtype),
                "fc1_w": normal_init(ks[2], (H, F), dtype),
                "fc2_w": normal_init(ks[3], (F, H), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
            }

        return {
            "embed_tokens": normal_init(keys[0], (cfg.vocab_size, H), dtype),
            "ln_f_s": jnp.ones((H, ), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[1:]]),
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)

        def pop(name):
            for prefix in ("transformer.", ""):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        H, QH, KH, D = _dims(cfg)
        layers = []
        for i in range(cfg.n_layers):
            p = f"blocks.{i}."
            wqkv = pop(p + "attn.Wqkv.weight").float()  # [(QH+2KH)*D, H]
            q = wqkv[:QH * D]
            k = wqkv[QH * D:QH * D + KH * D]
            v = wqkv[QH * D + KH * D:]
            layers.append({
                "q_w": t2j(q.T.contiguous(), dtype),
                "k_w": t2j(k.T.contiguous(), dtype),
                "v_w": t2j(v.T.contiguous(), dtype),
                "o_w": t2j(pop(p + "attn.out_proj.weight").T, dtype),
                "fc1_w": t2j(pop(p + "ffn.up_proj.weight").T, dtype),
                "fc2_w": t2j(pop(p + "ffn.down_proj.weight").T, dtype),
                "ln1_s": t2j(pop(p + "norm_1.weight"), dtype),
                "ln2_s": t2j(pop(p + "norm_2.weight"), dtype),
            })
        return {
            "embed_tokens": t2j(pop("wte.weight"), dtype),
            "ln_f_s": t2j(pop("norm_f.weight"), dtype),
            "layers": stack_layers(layers),
        }

    @staticmethod
    def forward(params, tokens, positions, kv_cache, meta: AttentionMetadata,
                cfg, decode_mode: bool = False) -> Tuple[jax.Array, jax.Array]:
        H, QH, KH, D = _dims(cfg)
        attn_cfg = getattr(cfg, "attn_config", None)
        scale = (getattr(attn_cfg, "softmax_scale", None) or D**-0.5)
        clip = getattr(attn_cfg, "clip_qkv", None)
        slopes = alibi_slopes(QH)
        eps = 1e-5

        h = params["embed_tokens"][tokens]
        zero_b = jnp.zeros((H, ), h.dtype)

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            residual = h
            x = layer_norm(h, lp["ln1_s"], zero_b, eps)
            T = x.shape[0]
            q = linear(x, lp["q_w"])
            k = linear(x, lp["k_w"])
            v = linear(x, lp["v_w"])
            if clip:
                q = jnp.clip(q, -clip, clip)
                k = jnp.clip(k, -clip, clip)
                v = jnp.clip(v, -clip, clip)
            q = q.reshape(T, QH, D)
            k = k.reshape(T, KH, D)
            v = v.reshape(T, KH, D)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode,
                                    alibi=slopes)
            h = residual + linear(attn.reshape(T, QH * D), lp["o_w"])

            residual = h
            x = layer_norm(h, lp["ln2_s"], zero_b, eps)
            x = linear(x, lp["fc1_w"])
            x = jax.nn.gelu(x.astype(jnp.float32),
                            approximate=False).astype(h.dtype)
            h = residual + linear(x, lp["fc2_w"])
            return h, kv_cache

        h, kv_cache, _ = run_layers(layer_fn, h, kv_cache, params)
        h = layer_norm(h, params["ln_f_s"], zero_b, eps)
        return h, kv_cache

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return jnp.dot(hidden, params["embed_tokens"].T,
                       preferred_element_type=jnp.float32)
