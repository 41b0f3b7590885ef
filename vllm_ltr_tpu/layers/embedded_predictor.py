"""Embedded mid-layer output-length predictor.

Counterpart of reference ``vllm/model_executor/predictor.py`` (LTRModel /
FCModel / OutputLayer, 146 LoC) + the per-model hooks (opt.py:250-255,
llama.py:288-293, deepseek/internlm2): an MLP head grafted onto the
*serving* model at ``pred_layer_idx`` — during prefill steps flagged with
``need_score``, the hidden state entering that layer (at each request's
last prompt token) is scored into a per-request ``pred_score``.

Configured by PredictorConfig (config_predictor.py): ``fc_model`` =
{sizes, input_norm, activation, dropout}, ``post_model`` = {d_output,
output_activation}, ``n_features``, ``pred_layer_idx``; optional
``weights`` points at a torch state dict saved from the reference classes.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_ltr_tpu.config import PredictorConfig
from vllm_ltr_tpu.models.common import layer_norm, linear, normal_init

_ACTIVATIONS = {
    None: lambda x: x,
    "Identity": lambda x: x,
    "ReLU": jax.nn.relu,
    "GELU": jax.nn.gelu,
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
}


def init_predictor_params(config: PredictorConfig, rng,
                          dtype=jnp.float32) -> Dict[str, Any]:
    fc = config.fc_model if isinstance(config.fc_model, dict) else {}
    post = config.post_model if isinstance(config.post_model, dict) else {}
    n_features = config.n_features
    sizes = [n_features] + list(fc.get("sizes", []))
    d_model = sizes[-1]
    d_output = post.get("d_output", 1)

    keys = jax.random.split(rng, len(sizes) + 1)
    params: Dict[str, Any] = {"fc": []}
    if fc.get("input_norm"):
        params["in_norm_s"] = jnp.ones((n_features, ), dtype)
        params["in_norm_b"] = jnp.zeros((n_features, ), dtype)
    for i, (s_in, s_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        params["fc"].append({
            "w": normal_init(keys[i], (s_in, s_out), dtype,
                             std=(2.0 / (s_in + s_out))**0.5),
            "b": jnp.zeros((s_out, ), dtype),
        })
    params["out_w"] = normal_init(keys[-1], (d_model, d_output), dtype,
                                  std=(2.0 / (d_model + d_output))**0.5)
    params["out_b"] = jnp.zeros((d_output, ), dtype)
    return params


def load_predictor_params(config: PredictorConfig, weights_path: str,
                          dtype=jnp.float32) -> Dict[str, Any]:
    """Load a torch state dict saved from the reference LTRModel."""
    import torch
    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    def t(name, transpose=False):
        arr = np.asarray(sd[name].float().numpy())
        return jnp.asarray(arr.T if transpose else arr, dtype)

    params: Dict[str, Any] = {"fc": []}
    if "input_layer.input_norm.weight" in sd:
        params["in_norm_s"] = t("input_layer.input_norm.weight")
        params["in_norm_b"] = t("input_layer.input_norm.bias")
    i = 0
    while f"input_layer.layers.{i}.weight" in sd:
        params["fc"].append({
            "w": t(f"input_layer.layers.{i}.weight", True),
            "b": t(f"input_layer.layers.{i}.bias"),
        })
        i += 1
    params["out_w"] = t("output_layer.w_1.weight", True)
    params["out_b"] = t("output_layer.w_1.bias")
    return params


def predictor_score(params: Dict[str, Any], x: jax.Array,
                    config: PredictorConfig) -> jax.Array:
    """x: [S, n_features] -> scores [S] (reference LTRModel.score +
    OutputLayer.score: sum outputs when d_output > 1)."""
    fc = config.fc_model if isinstance(config.fc_model, dict) else {}
    post = config.post_model if isinstance(config.post_model, dict) else {}
    act = _ACTIVATIONS[fc.get("activation")]
    out_act = _ACTIVATIONS[post.get("output_activation")]

    h = x.astype(jnp.float32)
    if "in_norm_s" in params:
        h = layer_norm(h, params["in_norm_s"].astype(jnp.float32),
                       params["in_norm_b"].astype(jnp.float32))
    for lp in params["fc"]:
        h = act(linear(h, lp["w"].astype(jnp.float32),
                       lp["b"].astype(jnp.float32)))
    out = out_act(linear(h, params["out_w"].astype(jnp.float32),
                         params["out_b"].astype(jnp.float32)))
    if out.shape[-1] > 1:
        return jnp.sum(out, axis=-1)
    return out[..., 0]
