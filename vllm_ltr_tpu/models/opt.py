"""OPT decoder + OPT sequence-classification predictor, TPU-native.

Behavioral counterpart of reference ``vllm/model_executor/models/opt.py``
(444 LoC torch modules), incl. ``OPTForSequenceClassification`` — the LTR
output-length predictor with a scalar score head over the last token's
hidden state (reference opt.py:362-445). Here both are pure functional JAX:
stacked layer params + unrolled layer loop, paged attention via
ops/attention, KV writes via ops/kv_cache.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm,
                                        linear, normal_init, run_layers,
                                        stack_layers, t2j)
from vllm_ltr_tpu.ops.attention import attend

# OPT's learned positional embedding is offset by 2 (HF convention).
POS_OFFSET = 2


class OPTForCausalLM:
    """Namespace of pure functions for the OPT architecture."""

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        H = cfg.hidden_size
        P = cfg.word_embed_proj_dim
        F = cfg.ffn_dim
        V = cfg.vocab_size
        L = cfg.num_hidden_layers
        keys = jax.random.split(rng, L + 4)

        def layer_params(key):
            ks = jax.random.split(key, 6)
            return {
                "qkv_w": normal_init(ks[0], (H, 3 * H), dtype),
                "qkv_b": jnp.zeros((3 * H, ), dtype),
                "out_w": normal_init(ks[1], (H, H), dtype),
                "out_b": jnp.zeros((H, ), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
                "fc1_w": normal_init(ks[2], (H, F), dtype),
                "fc1_b": jnp.zeros((F, ), dtype),
                "fc2_w": normal_init(ks[3], (F, H), dtype),
                "fc2_b": jnp.zeros((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
                "ln2_b": jnp.zeros((H, ), dtype),
            }

        params = {
            "embed_tokens": normal_init(keys[0], (V, P), dtype),
            "embed_positions":
            normal_init(keys[1], (cfg.max_position_embeddings + POS_OFFSET,
                                  H), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[2:2 + L]]),
        }
        if P != H:
            params["project_in"] = normal_init(keys[-2], (P, H), dtype)
            params["project_out"] = normal_init(keys[-1], (H, P), dtype)
        if getattr(cfg, "do_layer_norm_before", True):
            params["final_ln_s"] = jnp.ones((H, ), dtype)
            params["final_ln_b"] = jnp.zeros((H, ), dtype)
        return params

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        """Convert an HF OPTForCausalLM / OPTModel state dict."""
        sd = dict(state_dict)

        def pop(name):
            for prefix in ("model.decoder.", "decoder.", "model.", ""):
                key = prefix + name
                if key in sd:
                    return sd.pop(key)
            raise KeyError(name)

        H = cfg.hidden_size
        L = cfg.num_hidden_layers
        params: Dict[str, Any] = {
            "embed_tokens": t2j(pop("embed_tokens.weight"), dtype),
            "embed_positions": t2j(pop("embed_positions.weight"), dtype),
        }
        if cfg.word_embed_proj_dim != H:
            params["project_in"] = t2j(pop("project_in.weight"), dtype).T
            params["project_out"] = t2j(pop("project_out.weight"), dtype).T
        if getattr(cfg, "do_layer_norm_before", True):
            params["final_ln_s"] = t2j(pop("final_layer_norm.weight"), dtype)
            params["final_ln_b"] = t2j(pop("final_layer_norm.bias"), dtype)

        layers = []
        for i in range(L):
            p = f"layers.{i}."
            qw = t2j(pop(p + "self_attn.q_proj.weight"), dtype)
            kw = t2j(pop(p + "self_attn.k_proj.weight"), dtype)
            vw = t2j(pop(p + "self_attn.v_proj.weight"), dtype)
            qb = t2j(pop(p + "self_attn.q_proj.bias"), dtype)
            kb = t2j(pop(p + "self_attn.k_proj.bias"), dtype)
            vb = t2j(pop(p + "self_attn.v_proj.bias"), dtype)
            layers.append({
                # torch stores [out, in]; we store [in, out].
                "qkv_w": jnp.concatenate([qw.T, kw.T, vw.T], axis=1),
                "qkv_b": jnp.concatenate([qb, kb, vb]),
                "out_w": t2j(pop(p + "self_attn.out_proj.weight"), dtype).T,
                "out_b": t2j(pop(p + "self_attn.out_proj.bias"), dtype),
                "ln1_s": t2j(pop(p + "self_attn_layer_norm.weight"), dtype),
                "ln1_b": t2j(pop(p + "self_attn_layer_norm.bias"), dtype),
                "fc1_w": t2j(pop(p + "fc1.weight"), dtype).T,
                "fc1_b": t2j(pop(p + "fc1.bias"), dtype),
                "fc2_w": t2j(pop(p + "fc2.weight"), dtype).T,
                "fc2_b": t2j(pop(p + "fc2.bias"), dtype),
                "ln2_s": t2j(pop(p + "final_layer_norm.weight"), dtype),
                "ln2_b": t2j(pop(p + "final_layer_norm.bias"), dtype),
            })
        params["layers"] = stack_layers(layers)
        return params

    @staticmethod
    def forward(params, tokens: jax.Array, positions: jax.Array,
                kv_cache: jax.Array, meta: AttentionMetadata,
                cfg, decode_mode: bool = False, capture_layer=None):
        """tokens/positions: [T]; kv_cache: [L, N+1, 2, KH, Bs, D].
        Returns (hidden [T, H], updated kv_cache[, captured hidden]).
        decode_mode / capture_layer: see llama (reference opt.py:250-255)."""
        H = cfg.hidden_size
        num_heads = cfg.num_attention_heads
        head_dim = H // num_heads
        scale = head_dim**-0.5
        do_lnb = getattr(cfg, "do_layer_norm_before", True)

        h = params["embed_tokens"][tokens]
        lora_scalings = params.get("lora_scalings")
        lora_slots = meta.lora_slots
        if lora_slots is not None:
            from vllm_ltr_tpu.lora.models import apply_embedding_lora
            h = apply_embedding_lora(params, tokens, h, lora_slots)
        if "project_in" in params:
            h = linear(h, params["project_in"])
        pos_emb = params["embed_positions"][positions + POS_OFFSET]
        h = h + pos_emb

        def layer_fn(h, lp, kv_cache, lid, kv_scale):
            # LoRA targets (reference wraps all parallel layers,
            # vllm/lora/layers.py): q/k/v fold into the fused qkv proj.
            from vllm_ltr_tpu.models.llama import _lora
            residual = h
            x = layer_norm(h, lp["ln1_s"], lp["ln1_b"]) if do_lnb else h
            qkv = linear(x, lp["qkv_w"], lp["qkv_b"])
            if "lora_q_a" in lp or "lora_k_a" in lp or "lora_v_a" in lp:
                qkv = qkv + jnp.concatenate([
                    _lora(lp, "q", x, lora_scalings, lora_slots) +
                    jnp.zeros((x.shape[0], H), qkv.dtype),
                    _lora(lp, "k", x, lora_scalings, lora_slots) +
                    jnp.zeros((x.shape[0], H), qkv.dtype),
                    _lora(lp, "v", x, lora_scalings, lora_slots) +
                    jnp.zeros((x.shape[0], H), qkv.dtype),
                ], axis=-1)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            T = q.shape[0]
            q = q.reshape(T, num_heads, head_dim)
            k = k.reshape(T, num_heads, head_dim)
            v = v.reshape(T, num_heads, head_dim)
            attn, kv_cache = attend(kv_cache, lid, q, k, v, meta, scale,
                                    decode_mode=decode_mode)
            attn = attn.reshape(T, H)
            x = (linear(attn, lp["out_w"], lp["out_b"]) +
                 _lora(lp, "out", attn, lora_scalings, lora_slots))
            h = residual + x
            if not do_lnb:
                h = layer_norm(h, lp["ln1_s"], lp["ln1_b"])

            residual = h
            x = layer_norm(h, lp["ln2_s"], lp["ln2_b"]) if do_lnb else h
            x = (linear(x, lp["fc1_w"], lp["fc1_b"]) +
                 _lora(lp, "fc1", x, lora_scalings, lora_slots))
            x = jax.nn.relu(x)
            x = (linear(x, lp["fc2_w"], lp["fc2_b"]) +
                 _lora(lp, "fc2", x, lora_scalings, lora_slots))
            h = residual + x
            if not do_lnb:
                h = layer_norm(h, lp["ln2_s"], lp["ln2_b"])
            return h, kv_cache

        h, kv_cache, cap = run_layers(layer_fn, h, kv_cache, params,
                                      capture_layer)
        if do_lnb and "final_ln_s" in params:
            h = layer_norm(h, params["final_ln_s"], params["final_ln_b"])
        if capture_layer is not None:
            return h, kv_cache, cap
        return h, kv_cache

    @staticmethod
    def params_to_torch(cfg, params) -> Dict[str, Any]:
        """Export params back to an HF OPT state dict (model.decoder.*),
        for save_pretrained interop (used by the predictor trainer)."""
        import numpy as np
        import torch

        def t(x, transpose=False):
            arr = np.asarray(jax.device_get(x), dtype=np.float32)
            if transpose:
                arr = arr.T
            return torch.from_numpy(arr)

        H = cfg.hidden_size
        sd: Dict[str, Any] = {
            "model.decoder.embed_tokens.weight": t(params["embed_tokens"]),
            "model.decoder.embed_positions.weight":
            t(params["embed_positions"]),
        }
        if "project_in" in params:
            sd["model.decoder.project_in.weight"] = t(params["project_in"],
                                                      True)
            sd["model.decoder.project_out.weight"] = t(
                params["project_out"], True)
        if "final_ln_s" in params:
            sd["model.decoder.final_layer_norm.weight"] = t(
                params["final_ln_s"])
            sd["model.decoder.final_layer_norm.bias"] = t(
                params["final_ln_b"])
        L = cfg.num_hidden_layers
        lp = params["layers"]
        for i in range(L):
            p = f"model.decoder.layers.{i}."
            qkv_w = np.asarray(jax.device_get(lp["qkv_w"][i]),
                               dtype=np.float32)
            qkv_b = np.asarray(jax.device_get(lp["qkv_b"][i]),
                               dtype=np.float32)
            import torch as _torch
            qw, kw, vw = np.split(qkv_w, 3, axis=1)
            qb, kb, vb = np.split(qkv_b, 3)
            sd[p + "self_attn.q_proj.weight"] = _torch.from_numpy(qw.T.copy())
            sd[p + "self_attn.k_proj.weight"] = _torch.from_numpy(kw.T.copy())
            sd[p + "self_attn.v_proj.weight"] = _torch.from_numpy(vw.T.copy())
            sd[p + "self_attn.q_proj.bias"] = _torch.from_numpy(qb.copy())
            sd[p + "self_attn.k_proj.bias"] = _torch.from_numpy(kb.copy())
            sd[p + "self_attn.v_proj.bias"] = _torch.from_numpy(vb.copy())
            sd[p + "self_attn.out_proj.weight"] = t(lp["out_w"][i], True)
            sd[p + "self_attn.out_proj.bias"] = t(lp["out_b"][i])
            sd[p + "self_attn_layer_norm.weight"] = t(lp["ln1_s"][i])
            sd[p + "self_attn_layer_norm.bias"] = t(lp["ln1_b"][i])
            sd[p + "fc1.weight"] = t(lp["fc1_w"][i], True)
            sd[p + "fc1.bias"] = t(lp["fc1_b"][i])
            sd[p + "fc2.weight"] = t(lp["fc2_w"][i], True)
            sd[p + "fc2.bias"] = t(lp["fc2_b"][i])
            sd[p + "final_layer_norm.weight"] = t(lp["ln2_s"][i])
            sd[p + "final_layer_norm.bias"] = t(lp["ln2_b"][i])
        if "score" in params:
            sd["score.weight"] = t(params["score"], True)
        return sd

    @staticmethod
    def dense_forward(params, tokens: jax.Array, positions: jax.Array,
                      mask: jax.Array, cfg) -> jax.Array:
        """Dense batched prefill (no KV cache): tokens/positions/mask [B, L]
        -> hidden [B, L, H]. Used by the AUX predictor scorer (one-shot
        prompt scoring needs no cache) and by training."""
        H = cfg.hidden_size
        num_heads = cfg.num_attention_heads
        head_dim = H // num_heads
        scale = head_dim**-0.5
        do_lnb = getattr(cfg, "do_layer_norm_before", True)
        B, L = tokens.shape

        h = params["embed_tokens"][tokens]
        if "project_in" in params:
            h = linear(h, params["project_in"])
        h = h + params["embed_positions"][positions + POS_OFFSET]

        causal = jnp.tril(jnp.ones((L, L), bool))
        attn_mask = causal[None, :, :] & (mask[:, None, :] > 0)

        def layer_fn(h, lp):
            residual = h
            x = layer_norm(h, lp["ln1_s"], lp["ln1_b"]) if do_lnb else h
            qkv = linear(x, lp["qkv_w"], lp["qkv_b"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, L, num_heads, head_dim)
            k = k.reshape(B, L, num_heads, head_dim)
            v = v.reshape(B, L, num_heads, head_dim)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(attn_mask[:, None, :, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, H)
            x = linear(attn, lp["out_w"], lp["out_b"])
            h = residual + x
            if not do_lnb:
                h = layer_norm(h, lp["ln1_s"], lp["ln1_b"])
            residual = h
            x = layer_norm(h, lp["ln2_s"], lp["ln2_b"]) if do_lnb else h
            x = linear(x, lp["fc1_w"], lp["fc1_b"])
            x = jax.nn.relu(x)
            x = linear(x, lp["fc2_w"], lp["fc2_b"])
            h = residual + x
            if not do_lnb:
                h = layer_norm(h, lp["ln2_s"], lp["ln2_b"])
            return h, None

        h, _ = jax.lax.scan(layer_fn, h, params["layers"])
        if do_lnb and "final_ln_s" in params:
            h = layer_norm(h, params["final_ln_s"], params["final_ln_b"])
        return h

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        """hidden [*, H] -> logits [*, V] (tied lm head)."""
        h = hidden
        if "project_out" in params:
            h = linear(h, params["project_out"])
        return jnp.dot(h, params["embed_tokens"].T,
                       preferred_element_type=jnp.float32)


class OPTForSequenceClassification(OPTForCausalLM):
    """The LTR output-length predictor: OPT backbone + score head
    ``score: [proj_dim, num_labels]`` (no bias) applied to the last token's
    hidden state (reference opt.py:362-445)."""

    @staticmethod
    def init_params(cfg, rng, dtype):
        params = OPTForCausalLM.init_params(cfg, rng, dtype)
        num_labels = getattr(cfg, "num_labels", 1)
        params["score"] = normal_init(
            jax.random.fold_in(rng, 7),
            (cfg.word_embed_proj_dim, num_labels), dtype)
        return params

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype):
        sd = dict(state_dict)
        score = None
        for key in list(sd):
            if key.endswith("score.weight"):
                score = t2j(sd.pop(key), dtype).T
        params = OPTForCausalLM.params_from_torch(cfg, sd, dtype)
        if score is None:
            raise KeyError("score.weight not found in predictor checkpoint")
        params["score"] = score
        return params

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        """hidden [*, H] -> scores [*, num_labels]. For ranking predictors
        (num_labels == 1), score[..., 0] is the priority; for classification
        predictors the argmax bucket is the prediction (reference
        opt.py:389-408)."""
        h = hidden
        if "project_out" in params:
            h = linear(h, params["project_out"])
        return jnp.dot(h, params["score"],
                       preferred_element_type=jnp.float32)
