"""Prefix caching through the engine: shared prompt prefixes reuse cached
blocks AND skip recomputing the cached tokens (reference
block_manager_v1 prefix caching + model_runner.py:314-342 context slicing)."""
import numpy as np
import pytest
import torch

from vllm_ltr_tpu import LLM, SamplingParams
from vllm_ltr_tpu.transformers_utils.config import get_hf_config


def _instrument_prefill_tokens(llm, counts):
    """Record the dispatched prefill token count of every executed step."""
    ex = llm.llm_engine.model_executor
    inner = ex.execute_model

    def wrapped(seq_group_metadata_list, *a, **kw):
        counts.append(
            sum(m.token_chunk_size for m in seq_group_metadata_list
                if m.is_prompt))
        return inner(seq_group_metadata_list, *a, **kw)

    ex.execute_model = wrapped


def _build(model_dir, enable):
    return LLM(model=str(model_dir),
               skip_tokenizer_init=True,
               dtype="float32",
               max_model_len=128,
               max_num_seqs=8,
               num_gpu_blocks_override=64,
               block_size=16,
               swap_space=0.01,
               enable_prefix_caching=enable)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    d = tmp_path_factory.mktemp("prefix_model") / "m"
    hf.save_pretrained(d)
    return d


def test_prefix_caching_generation_consistent(model_dir):
    shared_prefix = list(range(1, 33))  # two full blocks
    prompts = [shared_prefix + [100 + i] for i in range(4)]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    base = _build(model_dir, False).generate(prompt_token_ids=prompts,
                                             sampling_params=params,
                                             use_tqdm=False)
    llm = _build(model_dir, True)
    cached = llm.generate(prompt_token_ids=prompts,
                          sampling_params=params,
                          use_tqdm=False)
    for b, c in zip(base, cached):
        assert b.outputs[0].token_ids == c.outputs[0].token_ids

    # Physical sharing at peak: while the 4 requests run, the two shared
    # prefix blocks are stored once. 4 prompts x 3 blocks = 12 without
    # sharing; with sharing: 2 shared + 4 uniques = 6 (+1 growth block per
    # seq as decode proceeds). Snoop the block manager mid-run.
    peak = {"used": 0}
    bm = llm.llm_engine.scheduler.block_manager
    ex = llm.llm_engine.model_executor
    inner = ex.execute_model

    def snoop(*a, **kw):
        peak["used"] = max(peak["used"], 64 - bm.get_num_free_gpu_blocks())
        return inner(*a, **kw)

    ex.execute_model = snoop
    outs2 = llm.generate(prompt_token_ids=prompts,
                         sampling_params=params,
                         use_tqdm=False)
    ex.execute_model = inner
    for b, c in zip(base, outs2):
        assert b.outputs[0].token_ids == c.outputs[0].token_ids
    assert bm.enable_caching
    # 12 distinct logical blocks unshared; sharing keeps peak below that.
    assert 0 < peak["used"] < 12
    # After completion everything is freed back to the cache/evictor.
    assert bm.get_num_free_gpu_blocks() == 64


def test_prefix_cache_hits_skip_prefill_compute(model_dir):
    """A prompt whose prefix is cached dispatches only the uncached
    suffix; outputs stay token-for-token identical to the cold run."""
    # 52 tokens = 3 full blocks + 4; at prefill scheduling the manager
    # marks interior blocks 0 and 1 computed, so a follow-up prompt
    # sharing >= 32 tokens skips exactly 2 blocks of compute.
    shared = list(range(1, 49))  # three full blocks
    p_first = shared + [101, 102, 103, 104]
    p_second = shared + [201, 202, 203, 204]
    params = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)

    # Cold engine, no caching: reference outputs.
    ref = _build(model_dir, False).generate(prompt_token_ids=[p_second],
                                            sampling_params=params,
                                            use_tqdm=False)

    llm = _build(model_dir, True)
    counts: list = []
    _instrument_prefill_tokens(llm, counts)

    llm.generate(prompt_token_ids=[p_first], sampling_params=params,
                 use_tqdm=False)
    cold_prefill = sum(counts)
    assert cold_prefill == len(p_first)

    counts.clear()
    out = llm.generate(prompt_token_ids=[p_second], sampling_params=params,
                       use_tqdm=False)
    warm_prefill = sum(counts)
    # Blocks 0 and 1 (32 tokens) were cache hits -> only 20 dispatched.
    assert warm_prefill == len(p_second) - 32, (warm_prefill, counts)
    assert out[0].outputs[0].token_ids == ref[0].outputs[0].token_ids
