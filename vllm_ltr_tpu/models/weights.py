"""Model weight loading.

Counterpart of reference ``vllm/model_executor/model_loader/`` (936 LoC):
``load_params`` resolves a model source to a params pytree:

* local HF directory (safetensors / pytorch_bin iterators, like
  DefaultModelLoader, loader.py:200-243),
* ``dummy`` / built-in test configs -> random init (DummyModelLoader,
  loader.py:246-268),
* ``npcache``: a streamed native cache of the CONVERTED params tree — the
  first load converts from torch and writes one memory-mappable .npy per
  leaf plus a manifest; later loads stream leaves straight into jnp arrays
  with no torch, no transposes, and near-zero peak host memory. This is
  the TPU equivalent of the reference's np_cache format AND its tensorizer
  fast-reload path (model_loader/tensorizer.py) in one mechanism.

Sharded placement happens at the executor via NamedShardings.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vllm_ltr_tpu.logger import init_logger

logger = init_logger(__name__)

_NP_CACHE_DIR = "np_cache_tpu"


def _flatten_with_names(params):
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        out.append((name, leaf))
    return out


def _unwrap_quantized(params):
    """Replace QuantizedWeight / SqueezeLLMWeight nodes with plain dicts
    of their storage arrays, returning (tree, qnodes) where qnodes maps
    the node's path to its reconstruction metadata — npcache would
    otherwise flatten the dataclasses into bare arrays and lose the
    structure (an 8B INT4 relaunch would re-pay the ~25 min host
    quantize npcache exists to skip)."""
    from vllm_ltr_tpu.layers.quantization.int4 import QuantizedWeight
    from vllm_ltr_tpu.layers.quantization.squeezellm import SqueezeLLMWeight
    qnodes: Dict[str, Dict[str, Any]] = {}

    def walk(node, prefix):
        if isinstance(node, QuantizedWeight):
            qnodes["/".join(prefix)] = {
                "type": "int4", "group_size": node.group_size,
                "out_features": node.out_features,
                "in_features": node.in_features, "shards": node.shards,
                "shard_axis": node.shard_axis,
            }
            return {"packed": node.packed, "scales": node.scales,
                    "zeros": node.zeros}
        if isinstance(node, SqueezeLLMWeight):
            qnodes["/".join(prefix)] = {
                "type": "squeezellm",
                "out_features": node.out_features,
                "in_features": node.in_features, "shards": node.shards,
                "shard_axis": node.shard_axis,
            }
            return {"packed": node.packed, "lut": node.lut}
        if isinstance(node, dict):
            return {k: walk(v, prefix + [str(k)]) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(
                walk(v, prefix + [str(i)]) for i, v in enumerate(node))
        return node

    return walk(params, []), qnodes


def _rewrap_quantized(params: Dict[str, Any],
                      qnodes: Dict[str, Dict[str, Any]]):
    from vllm_ltr_tpu.layers.quantization.int4 import QuantizedWeight
    from vllm_ltr_tpu.layers.quantization.squeezellm import SqueezeLLMWeight
    for path, meta in qnodes.items():
        parts = path.split("/")
        node = params
        for p in parts[:-1]:
            node = node[p]
        raw = node[parts[-1]]
        if meta["type"] == "int4":
            node[parts[-1]] = QuantizedWeight(
                raw["packed"], raw["scales"], raw["zeros"],
                group_size=meta["group_size"],
                out_features=meta["out_features"],
                in_features=meta["in_features"], shards=meta["shards"],
                shard_axis=meta["shard_axis"])
        else:
            node[parts[-1]] = SqueezeLLMWeight(
                raw["packed"], raw["lut"],
                out_features=meta["out_features"],
                in_features=meta["in_features"], shards=meta["shards"],
                shard_axis=meta["shard_axis"])
    return params


def save_np_cache(params, cache_dir: str) -> None:
    """Write the converted params tree as per-leaf .npy files + manifest.
    bfloat16/fp8 leaves store as raw uint8/16 views (np.save cannot
    round-trip ml_dtypes descrs through mmap); quantized-weight nodes
    record reconstruction metadata in the manifest."""
    os.makedirs(cache_dir, exist_ok=True)
    params, qnodes = _unwrap_quantized(params)
    manifest = {"__qnodes__": qnodes} if qnodes else {}
    for i, (name, leaf) in enumerate(_flatten_with_names(params)):
        arr = np.asarray(leaf)
        dtype_name = arr.dtype.name
        if arr.dtype.itemsize == 2 and dtype_name == "bfloat16":
            stored = arr.view(np.uint16)
        elif dtype_name.startswith("float8"):
            stored = arr.view(np.uint8)
        else:
            stored = arr
        fname = f"leaf_{i:05d}.npy"
        np.save(os.path.join(cache_dir, fname), stored)
        manifest[name] = {"file": fname, "dtype": dtype_name,
                          "shape": list(arr.shape)}
    with open(os.path.join(cache_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_np_cache(cache_dir: str) -> Dict[str, Any]:
    """Stream the cached leaves back into a nested params dict."""
    import ml_dtypes
    with open(os.path.join(cache_dir, "manifest.json")) as f:
        manifest = json.load(f)
    qnodes = manifest.pop("__qnodes__", {})
    params: Dict[str, Any] = {}
    for name, info in manifest.items():
        raw = np.load(os.path.join(cache_dir, info["file"]), mmap_mode="r")
        dtype = getattr(jnp, info["dtype"], None) or getattr(
            ml_dtypes, info["dtype"])
        if raw.dtype.kind == "u" and info["dtype"] != raw.dtype.name:
            raw = raw.view(np.dtype(dtype))
        leaf = jnp.asarray(raw).reshape(info["shape"])
        node = params
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return _rewrap_quantized(params, qnodes)


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


def _maybe_prefuse(model_cls, params, quantization):
    """Give the model a chance to FUSE projections before weight-only
    quantization (llama: q|k|v -> qkv_w, gate|up -> gateup_w).  Fused
    INT4 matmuls measured 6.91 vs 8.36 ms per 8B decode step
    (benchmarks/bench_int4_layer.py --fused): fewer, larger kernels
    amortize per-dispatch and tile-edge overheads."""
    hook = getattr(model_cls, "prefuse_for_quantization", None)
    if quantization == "int4" and hook is not None:
        return hook(params)
    return params


def load_params(model_cls, model_source: str, hf_config, dtype,
                load_format: str = "auto", seed: int = 0,
                quantization=None, download_dir=None):
    """Resolve params for `model_cls` from a source path or built-in name.

    quantization: None | "int4" (quantize float weights at load) |
    "awq"/"gptq" (checkpoint already quantized; converter repacks).
    download_dir: cache root for built-in (random-init) QUANTIZED models
    with load_format="npcache" — host-side quantization of an 8B random
    init costs ~20 min; the cache streams it back in seconds on re-runs
    (real checkpoints cache under the checkpoint dir instead).
    """
    from vllm_ltr_tpu.layers.quantization import maybe_quantize_params
    from vllm_ltr_tpu.layers.quantization.int4 import (
        detect_checkpoint_quantization)
    if load_format == "dummy" or not os.path.isdir(model_source):
        logger.info("Initializing random weights for %s (%s)", model_source,
                    model_cls.__name__)
        rng = jax.random.PRNGKey(seed)
        rand_cache = None
        if (load_format == "npcache" and download_dir and quantization):
            rand_cache = os.path.join(
                download_dir, f"npcache-{os.path.basename(model_source)}"
                f"-s{seed}-{quantization}")
            if os.path.exists(os.path.join(rand_cache, "manifest.json")):
                logger.info("Streaming random-init quantized cache from %s",
                            rand_cache)
                return load_np_cache(rand_cache)
        if quantization:
            # Host-side init for quantized random weights: the bf16 tree
            # of an 8B model (16.1 GiB) would OOM a 16 GiB device before
            # quantization ever ran — which is exactly the configuration
            # INT4 exists for (bench llama-8b-int4).  eval_shape gives
            # the tree without allocating; leaves materialize as host
            # numpy (simple scaled-normal init — distribution fidelity
            # is irrelevant for random benchmarking weights) and the
            # quantizer consumes them host-side; sharded device
            # placement happens downstream in shard_params.
            tree = jax.eval_shape(
                lambda: model_cls.init_params(hf_config, rng, dtype))
            # SFC64 is ~5x faster than the legacy MT19937 for the ~8e9
            # draws an 8B init needs.
            nprng = np.random.Generator(np.random.SFC64(seed))

            def materialize(leaf):
                arr = nprng.standard_normal(leaf.shape, dtype=np.float32)
                return (arr * 0.02).astype(leaf.dtype)

            params = jax.tree.map(materialize, tree)
            params = _maybe_prefuse(model_cls, params, quantization)
            params = maybe_quantize_params(params, quantization)
            if rand_cache:
                logger.info("Writing random-init quantized cache to %s",
                            rand_cache)
                save_np_cache(params, rand_cache)
            return params
        params = model_cls.init_params(hf_config, rng, dtype)
        params = _maybe_prefuse(model_cls, params, quantization)
        return maybe_quantize_params(params, quantization)
    cache_dir = os.path.join(model_source, _NP_CACHE_DIR)
    if load_format == "npcache" and os.path.exists(
            os.path.join(cache_dir, "manifest.json")):
        logger.info("Streaming native weight cache from %s", cache_dir)
        return load_np_cache(cache_dir)
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
    params = _maybe_prefuse(model_cls, params, quantization)
    params = maybe_quantize_params(params, quantization)
    if load_format == "npcache":
        logger.info("Writing native weight cache to %s", cache_dir)
        save_np_cache(params, cache_dir)
    return params
