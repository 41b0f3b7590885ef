"""Model weight loading.

Counterpart of reference ``vllm/model_executor/model_loader/`` (936 LoC):
``load_params`` resolves a model source to a params pytree:

* local HF directory (safetensors / pytorch_bin iterators, like
  DefaultModelLoader, loader.py:200-243),
* ``dummy`` / built-in test configs -> random init (DummyModelLoader,
  loader.py:246-268).

Sharded placement happens at the executor via NamedShardings.
"""
from __future__ import annotations

import glob
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.logger import init_logger

logger = init_logger(__name__)


def load_hf_state_dict(model_dir: str) -> Dict[str, Any]:
    """Load all tensors from a local HF checkpoint directory."""
    import torch
    state: Dict[str, Any] = {}
    safes = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if safes:
        from safetensors.torch import load_file
        for f in safes:
            state.update(load_file(f))
        return state
    bins = sorted(glob.glob(os.path.join(model_dir, "*.bin"))) or sorted(
        glob.glob(os.path.join(model_dir, "*.pt")))
    if not bins:
        raise FileNotFoundError(
            f"No *.safetensors or *.bin weights under {model_dir}")
    for f in bins:
        state.update(torch.load(f, map_location="cpu", weights_only=True))
    return state


def load_params(model_cls, model_source: str, hf_config, dtype,
                load_format: str = "auto", seed: int = 0,
                quantization=None):
    """Resolve params for `model_cls` from a source path or built-in name.

    quantization: None | "int4" (quantize float weights at load) |
    "awq"/"gptq" (checkpoint already quantized; converter repacks).
    """
    from vllm_ltr_tpu.layers.quantization import maybe_quantize_params
    from vllm_ltr_tpu.layers.quantization.int4 import (
        detect_checkpoint_quantization)
    if load_format == "dummy" or not os.path.isdir(model_source):
        logger.info("Initializing random weights for %s (%s)", model_source,
                    model_cls.__name__)
        rng = jax.random.PRNGKey(seed)
        params = model_cls.init_params(hf_config, rng, dtype)
        return maybe_quantize_params(params, quantization)
    logger.info("Loading weights from %s", model_source)
    state_dict = load_hf_state_dict(model_source)
    ckpt_method = detect_checkpoint_quantization(hf_config)
    if ckpt_method in ("awq", "gptq"):
        if quantization not in (None, ckpt_method):
            raise ValueError(
                f"Checkpoint is {ckpt_method}-quantized but "
                f"quantization={quantization!r} was requested.")
        converter = getattr(model_cls, "params_from_torch_quantized", None)
        if converter is None:
            raise ValueError(
                f"{model_cls.__name__} does not support {ckpt_method} "
                "checkpoints yet.")
        return converter(hf_config, state_dict, dtype, ckpt_method)
    params = model_cls.params_from_torch(hf_config, state_dict, dtype)
    return maybe_quantize_params(params, quantization)
