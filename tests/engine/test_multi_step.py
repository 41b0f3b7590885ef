"""Fused multi-step decode (executor/multi_step.py): K decode iterations
per dispatch must be token-identical to one-step dispatch, including
penalty bookkeeping, non-divisible max_tokens, and HF greedy parity
(reference behavior bar: single-step scheduling, worker/model_runner.py)."""
import numpy as np
import pytest
import torch

from vllm_ltr_tpu import LLM, SamplingParams
from vllm_ltr_tpu.transformers_utils.config import get_hf_config


@pytest.fixture(scope="module")
def tiny_llama_dir(tmp_path_factory):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    d = tmp_path_factory.mktemp("tiny_llama_ms")
    hf.save_pretrained(d)
    return str(d), hf, cfg


@pytest.fixture(scope="module")
def fused_llm(tiny_llama_dir):
    d, _, _ = tiny_llama_dir
    return LLM(model=d,
               skip_tokenizer_init=True,
               dtype="float32",
               max_model_len=256,
               max_num_seqs=16,
               num_gpu_blocks_override=128,
               block_size=16,
               swap_space=0.01,
               decode_steps_per_dispatch=4)


def hf_greedy(hf, prompt, n):
    with torch.no_grad():
        out = hf.generate(torch.tensor([prompt]),
                          max_new_tokens=n,
                          do_sample=False)
    return out[0].tolist()[len(prompt):]


def test_fused_decode_matches_hf_greedy(fused_llm, tiny_llama_dir):
    _, hf, cfg = tiny_llama_dir
    rng = np.random.RandomState(0)
    prompts = [list(map(int, rng.randint(1, cfg.vocab_size, size=n)))
               for n in (5, 11, 3, 14)]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outputs = fused_llm.generate(prompt_token_ids=prompts,
                                 sampling_params=params,
                                 use_tqdm=False)
    for prompt, out in zip(prompts, outputs):
        expected = hf_greedy(hf, prompt, 8)
        assert out.outputs[0].token_ids == expected
        assert out.finished and out.outputs[0].finish_reason == "length"


def test_fused_decode_non_divisible_max_tokens(fused_llm, tiny_llama_dir):
    """max_tokens = 6 with K = 4: the second fused step overshoots and the
    host must truncate at exactly max_tokens."""
    _, hf, cfg = tiny_llama_dir
    rng = np.random.RandomState(1)
    prompt = list(map(int, rng.randint(1, cfg.vocab_size, size=7)))
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    (out, ) = fused_llm.generate(prompt_token_ids=[prompt],
                                 sampling_params=params,
                                 use_tqdm=False)
    assert len(out.outputs[0].token_ids) == 6
    assert out.outputs[0].token_ids == hf_greedy(hf, prompt, 6)


def test_fused_decode_with_penalties(fused_llm, tiny_llama_dir):
    """Penalty counts must advance on-device between fused steps: fused
    greedy decoding under penalties must match the one-step-per-dispatch
    path token-for-token."""
    d, _, cfg = tiny_llama_dir
    plain_llm = LLM(model=d,
                    skip_tokenizer_init=True,
                    dtype="float32",
                    max_model_len=256,
                    max_num_seqs=16,
                    num_gpu_blocks_override=128,
                    block_size=16,
                    swap_space=0.01)
    rng = np.random.RandomState(2)
    prompts = [list(map(int, rng.randint(1, cfg.vocab_size, size=n)))
               for n in (9, 4)]
    params = SamplingParams(temperature=0.0,
                            max_tokens=8,
                            ignore_eos=True,
                            frequency_penalty=1.5,
                            repetition_penalty=1.7)
    fused = fused_llm.generate(prompt_token_ids=prompts,
                               sampling_params=params,
                               use_tqdm=False)
    plain = plain_llm.generate(prompt_token_ids=prompts,
                               sampling_params=params,
                               use_tqdm=False)
    for f, p in zip(fused, plain):
        assert f.outputs[0].token_ids == p.outputs[0].token_ids
