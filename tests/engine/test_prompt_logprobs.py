"""prompt_logprobs: per-position prompt token logprobs from the
teacher-forced scorer dispatch, validated against an HF forward
(reference computes these in the sampler, vllm/model_executor/layers/
sampler.py:38-90)."""
import numpy as np
import pytest
import torch

from vllm_ltr_tpu import LLM, SamplingParams
from vllm_ltr_tpu.transformers_utils.config import get_hf_config


@pytest.fixture(scope="module")
def hf_and_dir(tmp_path_factory):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    d = tmp_path_factory.mktemp("plp_model") / "m"
    hf.save_pretrained(d)
    return hf, d


def _hf_prompt_logprobs(hf, ids):
    with torch.no_grad():
        logits = hf(torch.tensor([ids])).logits[0].float()
    lps = torch.log_softmax(logits, dim=-1)
    # position p (>=1) is scored by logits at p-1
    return [float(lps[p - 1, ids[p]]) for p in range(1, len(ids))]


def _run(d, prompt, chunked=False, **kw):
    llm = LLM(model=str(d),
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=128,
              max_num_seqs=4,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01,
              enable_chunked_prefill=chunked,
              **kw)
    params = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                            prompt_logprobs=2)
    return llm.generate(prompt_token_ids=[prompt], sampling_params=params,
                        use_tqdm=False)[0]


def _check(out, hf, prompt):
    plp = out.prompt_logprobs
    assert plp is not None and len(plp) == len(prompt)
    assert plp[0] is None
    want = _hf_prompt_logprobs(hf, prompt)
    for p in range(1, len(prompt)):
        entry = plp[p]
        assert prompt[p] in entry
        got = entry[prompt[p]].logprob
        assert got == pytest.approx(want[p - 1], abs=3e-3), (p, got)
        # top-k alternates: ranked, and each at least as likely as the
        # actual token's logprob when the actual token is not ranked.
        ranked = [lp for lp in entry.values() if lp.rank is not None]
        assert 1 <= len(ranked) <= 2 + 1


def test_prompt_logprobs_match_hf(hf_and_dir):
    hf, d = hf_and_dir
    prompt = list(range(2, 25))
    out = _run(d, prompt)
    _check(out, hf, prompt)


def test_prompt_logprobs_chunked_prefill(hf_and_dir):
    """A prompt split across prefill chunks emits identical entries."""
    hf, d = hf_and_dir
    prompt = list(range(2, 42))  # 40 tokens; 16-token chunks
    out = _run(d, prompt, chunked=True, max_num_batched_tokens=16)
    _check(out, hf, prompt)


def test_prompt_logprobs_with_prefix_caching(hf_and_dir):
    """prompt_logprobs forces full recompute even when the prefix is
    cached — every position still gets an entry."""
    hf, d = hf_and_dir
    llm = LLM(model=str(d),
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=128,
              max_num_seqs=4,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01,
              enable_prefix_caching=True)
    warm = list(range(2, 40))
    params0 = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True)
    llm.generate(prompt_token_ids=[warm], sampling_params=params0,
                 use_tqdm=False)
    params = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                            prompt_logprobs=2)
    out = llm.generate(prompt_token_ids=[warm], sampling_params=params,
                       use_tqdm=False)[0]
    _check(out, hf, warm)
