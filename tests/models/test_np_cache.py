"""npcache streamed weight loading: first load converts + caches, second
load streams without torch and produces identical params and generations
(reference np_cache / tensorizer fast-reload behavior)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from vllm_ltr_tpu.models.weights import (load_np_cache, load_params,
                                         save_np_cache)
from vllm_ltr_tpu.transformers_utils.config import get_hf_config


def _llama_dir(tmp_path):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval()
    d = tmp_path / "model"
    hf.save_pretrained(d)
    return str(d), cfg


def test_np_cache_roundtrip_identical(tmp_path):
    from vllm_ltr_tpu.models.llama import LlamaForCausalLM
    d, cfg = _llama_dir(tmp_path)
    first = load_params(LlamaForCausalLM, d, cfg, jnp.bfloat16,
                        load_format="npcache")
    second = load_params(LlamaForCausalLM, d, cfg, jnp.bfloat16,
                         load_format="npcache")
    flat1 = jax.tree_util.tree_leaves_with_path(first)
    flat2 = jax.tree_util.tree_leaves_with_path(second)
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a).view(np.uint8),
                                      np.asarray(b).view(np.uint8))


def test_np_cache_preserves_fp8_and_int_leaves(tmp_path):
    params = {
        "w": jnp.asarray(np.arange(8, dtype=np.float32)),
        "fp8": jnp.asarray(np.linspace(-2, 2, 8), jnp.float8_e5m2),
        "nested": {"ids": jnp.asarray(np.arange(6, dtype=np.int32))},
    }
    d = str(tmp_path / "cache")
    save_np_cache(params, d)
    back = load_np_cache(d)
    for name in ("w",):
        np.testing.assert_array_equal(np.asarray(back[name]),
                                      np.asarray(params[name]))
    np.testing.assert_array_equal(
        np.asarray(back["fp8"]).view(np.uint8),
        np.asarray(params["fp8"]).view(np.uint8))
    np.testing.assert_array_equal(np.asarray(back["nested"]["ids"]),
                                  np.asarray(params["nested"]["ids"]))


def test_np_cache_roundtrips_quantized_weights(tmp_path):
    """Round 4: QuantizedWeight / SqueezeLLMWeight nodes survive the
    cache (reconstruction metadata in the manifest) — an 8B INT4 reload
    must not re-pay the host quantize."""
    from vllm_ltr_tpu.layers.quantization.int4 import (QuantizedWeight,
                                                       quantize_array)
    from vllm_ltr_tpu.layers.quantization.squeezellm import (
        SqueezeLLMWeight, quantize_squeezellm)
    rng = np.random.RandomState(0)
    qw = quantize_array(rng.randn(128, 64).astype(np.float32), 32)
    sq = quantize_squeezellm(rng.randn(128, 64).astype(np.float32))
    params = {
        "layer": {"q_w": qw, "norm": jnp.ones((64,), jnp.float32)},
        "sq_w": sq,
    }
    d = str(tmp_path / "qcache")
    save_np_cache(params, d)
    back = load_np_cache(d)

    got = back["layer"]["q_w"]
    assert isinstance(got, QuantizedWeight)
    assert (got.group_size, got.out_features, got.in_features,
            got.shards, got.shard_axis) == (qw.group_size, qw.out_features,
                                            qw.in_features, qw.shards,
                                            qw.shard_axis)
    np.testing.assert_array_equal(np.asarray(got.packed),
                                  np.asarray(qw.packed))
    np.testing.assert_array_equal(np.asarray(got.scales),
                                  np.asarray(qw.scales))

    got_sq = back["sq_w"]
    assert isinstance(got_sq, SqueezeLLMWeight)
    np.testing.assert_array_equal(np.asarray(got_sq.packed),
                                  np.asarray(sq.packed))
    np.testing.assert_array_equal(np.asarray(got_sq.lut),
                                  np.asarray(sq.lut))
    np.testing.assert_array_equal(np.asarray(back["layer"]["norm"]),
                                  np.ones(64, np.float32))


def test_np_cache_quantized_load_params_roundtrip(tmp_path):
    """load_params(npcache, quantization=int4): first call quantizes and
    writes the cache; the second streams it back with QuantizedWeight
    structure intact and identical packed storage."""
    from vllm_ltr_tpu.layers.quantization.int4 import QuantizedWeight
    from vllm_ltr_tpu.models.llama import LlamaForCausalLM
    d, cfg = _llama_dir(tmp_path)
    first = load_params(LlamaForCausalLM, d, cfg, jnp.bfloat16,
                        load_format="npcache", quantization="int4")
    second = load_params(LlamaForCausalLM, d, cfg, jnp.bfloat16,
                         load_format="npcache", quantization="int4")

    def collect_q(tree, out):
        if isinstance(tree, QuantizedWeight):
            out.append(tree)
        elif isinstance(tree, dict):
            for v in tree.values():
                collect_q(v, out)
        return out

    q1, q2 = collect_q(first, []), collect_q(second, [])
    assert q1 and len(q1) == len(q2)
    for a, b in zip(q1, q2):
        assert a.group_size == b.group_size
        np.testing.assert_array_equal(np.asarray(a.packed),
                                      np.asarray(b.packed))
        np.testing.assert_array_equal(np.asarray(a.scales),
                                      np.asarray(b.scales))
