"""LLaVA vision-language model, TPU-native.

Behavioral counterpart of reference ``vllm/model_executor/models/llava.py``:
a CLIP vision tower (features taken from ``vision_feature_layer``, CLS
dropped under the "default" select strategy), a 2-layer GELU projector, and
a Llama language model whose input embeddings are replaced by projected
image features at ``image_token_index`` positions (reference llava.py
``_merge_vision_embeddings``).

TPU design: the vision tower is a SEPARATE jitted function
(:meth:`encode_images`) run once per request at prefill — patch extraction
is a reshape + one matmul (no conv op), the encoder is plain bidirectional
attention (no paged cache). The language model receives the merged
embeddings via the optional ``image_embeds`` argument: a [T, H] array
holding projected features at image-token rows, produced host-side by the
executor from the flat batch layout. Decode steps never touch the tower.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.models.common import (AttentionMetadata, layer_norm, linear,
                                        normal_init, stack_layers, t2j)
from vllm_ltr_tpu.models.llama import LlamaForCausalLM


def _quick_gelu(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def _vision_geometry(vcfg) -> Tuple[int, int]:
    grid = vcfg.image_size // vcfg.patch_size
    return grid * grid, grid


class LlavaForConditionalGeneration:
    """Params tree: {"vision": {...}, "projector": {...}, "lm": <llama>}."""

    # ------------------------------------------------------------------
    # Vision tower (CLIP) + projector
    # ------------------------------------------------------------------

    @staticmethod
    def _init_vision(vcfg, rng, dtype) -> Dict[str, Any]:
        H = vcfg.hidden_size
        F = vcfg.intermediate_size
        P = vcfg.patch_size
        n_patches, _ = _vision_geometry(vcfg)
        keys = jax.random.split(rng, vcfg.num_hidden_layers + 3)

        def layer_params(key):
            ks = jax.random.split(key, 6)
            return {
                "q_w": normal_init(ks[0], (H, H), dtype),
                "q_b": jnp.zeros((H, ), dtype),
                "k_w": normal_init(ks[1], (H, H), dtype),
                "k_b": jnp.zeros((H, ), dtype),
                "v_w": normal_init(ks[2], (H, H), dtype),
                "v_b": jnp.zeros((H, ), dtype),
                "o_w": normal_init(ks[3], (H, H), dtype),
                "o_b": jnp.zeros((H, ), dtype),
                "fc1_w": normal_init(ks[4], (H, F), dtype),
                "fc1_b": jnp.zeros((F, ), dtype),
                "fc2_w": normal_init(ks[5], (F, H), dtype),
                "fc2_b": jnp.zeros((H, ), dtype),
                "ln1_s": jnp.ones((H, ), dtype),
                "ln1_b": jnp.zeros((H, ), dtype),
                "ln2_s": jnp.ones((H, ), dtype),
                "ln2_b": jnp.zeros((H, ), dtype),
            }

        return {
            "class_embedding": normal_init(keys[0], (H, ), dtype),
            "patch_w": normal_init(keys[1], (3 * P * P, H), dtype),
            "pos_embedding": normal_init(keys[2], (n_patches + 1, H), dtype),
            "pre_ln_s": jnp.ones((H, ), dtype),
            "pre_ln_b": jnp.zeros((H, ), dtype),
            "layers": stack_layers([layer_params(k) for k in keys[3:]]),
        }

    @staticmethod
    def init_params(cfg, rng, dtype) -> Dict[str, Any]:
        k_lm, k_v, k_p = jax.random.split(rng, 3)
        tcfg, vcfg = cfg.text_config, cfg.vision_config
        Hv, Ht = vcfg.hidden_size, tcfg.hidden_size
        kp1, kp2 = jax.random.split(k_p)
        return {
            "lm": LlamaForCausalLM.init_params(tcfg, k_lm, dtype),
            "vision": LlavaForConditionalGeneration._init_vision(
                vcfg, k_v, dtype),
            "projector": {
                "l1_w": normal_init(kp1, (Hv, Ht), dtype),
                "l1_b": jnp.zeros((Ht, ), dtype),
                "l2_w": normal_init(kp2, (Ht, Ht), dtype),
                "l2_b": jnp.zeros((Ht, ), dtype),
            },
        }

    @staticmethod
    def params_from_torch(cfg, state_dict, dtype) -> Dict[str, Any]:
        sd = dict(state_dict)
        vcfg = cfg.vision_config

        def pop(name):
            # Both HF layouts: flat ("vision_tower...") and nested under
            # "model." (transformers >= 4.52).
            for prefix in ("", "model."):
                if prefix + name in sd:
                    return sd.pop(prefix + name)
            raise KeyError(name)

        vt = "vision_tower.vision_model."
        vision: Dict[str, Any] = {
            "class_embedding": t2j(pop(vt + "embeddings.class_embedding"),
                                   dtype),
            "patch_w": t2j(
                pop(vt + "embeddings.patch_embedding.weight"),
                dtype).reshape(vcfg.hidden_size, -1).T,
            "pos_embedding": t2j(
                pop(vt + "embeddings.position_embedding.weight"), dtype),
            "pre_ln_s": t2j(pop(vt + "pre_layrnorm.weight"), dtype),
            "pre_ln_b": t2j(pop(vt + "pre_layrnorm.bias"), dtype),
        }
        layers = []
        for i in range(vcfg.num_hidden_layers):
            p = vt + f"encoder.layers.{i}."
            layers.append({
                "q_w": t2j(pop(p + "self_attn.q_proj.weight"), dtype).T,
                "q_b": t2j(pop(p + "self_attn.q_proj.bias"), dtype),
                "k_w": t2j(pop(p + "self_attn.k_proj.weight"), dtype).T,
                "k_b": t2j(pop(p + "self_attn.k_proj.bias"), dtype),
                "v_w": t2j(pop(p + "self_attn.v_proj.weight"), dtype).T,
                "v_b": t2j(pop(p + "self_attn.v_proj.bias"), dtype),
                "o_w": t2j(pop(p + "self_attn.out_proj.weight"), dtype).T,
                "o_b": t2j(pop(p + "self_attn.out_proj.bias"), dtype),
                "fc1_w": t2j(pop(p + "mlp.fc1.weight"), dtype).T,
                "fc1_b": t2j(pop(p + "mlp.fc1.bias"), dtype),
                "fc2_w": t2j(pop(p + "mlp.fc2.weight"), dtype).T,
                "fc2_b": t2j(pop(p + "mlp.fc2.bias"), dtype),
                "ln1_s": t2j(pop(p + "layer_norm1.weight"), dtype),
                "ln1_b": t2j(pop(p + "layer_norm1.bias"), dtype),
                "ln2_s": t2j(pop(p + "layer_norm2.weight"), dtype),
                "ln2_b": t2j(pop(p + "layer_norm2.bias"), dtype),
            })
        vision["layers"] = stack_layers(layers)

        projector = {
            "l1_w": t2j(pop("multi_modal_projector.linear_1.weight"),
                        dtype).T,
            "l1_b": t2j(pop("multi_modal_projector.linear_1.bias"), dtype),
            "l2_w": t2j(pop("multi_modal_projector.linear_2.weight"),
                        dtype).T,
            "l2_b": t2j(pop("multi_modal_projector.linear_2.bias"), dtype),
        }

        # Language model: strip the prefix and delegate to the Llama loader.
        lm_sd = {}
        for key in list(sd.keys()):
            for prefix in ("language_model.", "model.language_model.",
                           "lm."):
                if key.startswith(prefix):
                    lm_sd[key[len(prefix):]] = sd.pop(key)
                    break
        if "lm_head.weight" in sd:  # nested layout keeps lm_head top-level
            lm_sd["lm_head.weight"] = sd.pop("lm_head.weight")
        lm = LlamaForCausalLM.params_from_torch(cfg.text_config, lm_sd,
                                                dtype)
        return {"lm": lm, "vision": vision, "projector": projector}

    # ------------------------------------------------------------------

    @staticmethod
    def encode_images(params, pixel_values: jax.Array, cfg) -> jax.Array:
        """Vision tower + projector: [N, 3, img, img] pixel values ->
        [N, n_patches, text_hidden] projected features (CLS dropped)."""
        vcfg = cfg.vision_config
        vp = params["vision"]
        P = vcfg.patch_size
        H = vcfg.hidden_size
        N = pixel_values.shape[0]
        n_patches, grid = _vision_geometry(vcfg)
        eps = getattr(vcfg, "layer_norm_eps", 1e-5)

        # Patch embedding as reshape + matmul (patch vector in (c, ph, pw)
        # order, matching the conv weight layout).
        x = pixel_values.astype(vp["patch_w"].dtype)
        x = x.reshape(N, 3, grid, P, grid, P).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, n_patches, 3 * P * P) @ vp["patch_w"]
        cls = jnp.broadcast_to(vp["class_embedding"][None, None], (N, 1, H))
        h = jnp.concatenate([cls, x], axis=1) + vp["pos_embedding"][None]
        h = layer_norm(h, vp["pre_ln_s"], vp["pre_ln_b"], eps)

        NH = vcfg.num_attention_heads
        D = H // NH
        scale = D**-0.5
        # vision_feature_layer counts from the end (-2 = skip last layer).
        feat_layer = getattr(cfg, "vision_feature_layer", -2)
        L = vcfg.num_hidden_layers
        n_run = L + 1 + feat_layer if feat_layer < 0 else feat_layer

        for lid in range(n_run):
            lp = jax.tree.map(lambda w: w[lid], vp["layers"])
            residual = h
            y = layer_norm(h, lp["ln1_s"], lp["ln1_b"], eps)
            T = y.shape[1]
            q = linear(y, lp["q_w"], lp["q_b"]).reshape(N, T, NH, D)
            k = linear(y, lp["k_w"], lp["k_b"]).reshape(N, T, NH, D)
            v = linear(y, lp["v_w"], lp["v_b"]).reshape(N, T, NH, D)
            scores = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            attn = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(N, T, H)
            h = residual + linear(attn, lp["o_w"], lp["o_b"])
            residual = h
            y = layer_norm(h, lp["ln2_s"], lp["ln2_b"], eps)
            y = linear(_quick_gelu(linear(y, lp["fc1_w"], lp["fc1_b"])),
                       lp["fc2_w"], lp["fc2_b"])
            h = residual + y

        feats = h[:, 1:]  # "default" strategy: drop CLS
        pp = params["projector"]
        proj = linear(feats, pp["l1_w"], pp["l1_b"])
        proj = jax.nn.gelu(proj.astype(jnp.float32),
                           approximate=False).astype(proj.dtype)
        return linear(proj, pp["l2_w"], pp["l2_b"])

    @staticmethod
    def forward(params, tokens, positions, kv_cache,
                meta: AttentionMetadata, cfg, decode_mode: bool = False,
                image_embeds: Optional[jax.Array] = None, **kwargs):
        """image_embeds: [T, text_hidden] rows holding projected image
        features at image-token positions (any values elsewhere); merged by
        the image_token_index mask (reference _merge_vision_embeddings)."""
        tcfg = cfg.text_config
        h = params["lm"]["embed_tokens"][tokens]
        if image_embeds is not None:
            is_image = (tokens == cfg.image_token_index)[:, None]
            h = jnp.where(is_image, image_embeds.astype(h.dtype), h)
        return LlamaForCausalLM.forward(params["lm"], tokens, positions,
                                        kv_cache, meta, tcfg,
                                        decode_mode=decode_mode,
                                        inputs_embeds=h, **kwargs)

    @staticmethod
    def compute_logits(params, hidden: jax.Array, cfg) -> jax.Array:
        return LlamaForCausalLM.compute_logits(params["lm"], hidden,
                                               cfg.text_config)
