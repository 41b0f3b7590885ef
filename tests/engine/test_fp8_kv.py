"""FP8 KV-cache tests: generation with an E4M3-scaled (and E5M2 unscaled)
cache must stay close to the bf16/f32 baseline (reference tests/fp8_kv
golden-scales pattern)."""
import json

import numpy as np
import pytest
import torch

from vllm_ltr_tpu import LLM, SamplingParams
from vllm_ltr_tpu.transformers_utils.config import get_hf_config


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    d = tmp_path_factory.mktemp("fp8_llama")
    hf.save_pretrained(d)
    return str(d), hf


def make_llm(model_dir, cache_dtype, scales_path=None):
    return LLM(model=model_dir,
               skip_tokenizer_init=True,
               dtype="float32",
               max_model_len=128,
               max_num_seqs=8,
               num_gpu_blocks_override=64,
               block_size=16,
               swap_space=0.01,
               kv_cache_dtype=cache_dtype,
               quantization_param_path=scales_path)


PROMPTS = [[5, 9, 13, 17, 21], [7, 3, 2, 8]]


def _generate(llm, n=8):
    params = SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=PROMPTS,
                        sampling_params=params,
                        use_tqdm=False)
    return [o.outputs[0].token_ids for o in outs]


def test_fp8_e5m2_kv_generation_close_to_fp32(llama_dir):
    d, _ = llama_dir
    base = _generate(make_llm(d, "auto"))
    fp8 = _generate(make_llm(d, "fp8"))
    # Greedy tokens should mostly agree despite the quantized cache; require
    # exact agreement on the first few steps (short context, small error).
    for b, f in zip(base, fp8):
        assert b[:4] == f[:4], (b, f)


def test_fp8_e4m3_scaled_kv(llama_dir, tmp_path):
    d, _ = llama_dir
    cfg = get_hf_config("test-llama-tiny")
    L = cfg.num_hidden_layers
    scales_path = tmp_path / "kv_cache_scales.json"
    scales_path.write_text(json.dumps({"kv_cache_scales": [0.05] * L}))
    base = _generate(make_llm(d, "auto"))
    fp8 = _generate(make_llm(d, "fp8_e4m3", str(scales_path)))
    for b, f in zip(base, fp8):
        assert b[:4] == f[:4], (b, f)


def test_fp8_reference_schema_parses(tmp_path):
    from vllm_ltr_tpu.executor.tpu_executor import load_kv_cache_scales
    p = tmp_path / "scales.json"
    p.write_text(
        json.dumps({
            "kv_cache": {
                "scaling_factor": {
                    "0": {str(i): 0.01 * (i + 1)
                          for i in range(4)}
                }
            }
        }))
    scales = load_kv_cache_scales(str(p), 4)
    assert scales == [0.01, 0.02, 0.03, 0.04]
