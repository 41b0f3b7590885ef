"""Speculative decoding tests.

The fundamental invariant: greedy spec decoding emits EXACTLY the tokens
non-speculative greedy decoding would (rejection sampling preserves the
target distribution; for argmax it's equality). Reference
vllm/spec_decode + rejection_sampler behavior."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vllm_ltr_tpu import LLM, SamplingParams
from vllm_ltr_tpu.transformers_utils.config import get_hf_config


def test_rejection_sampler_greedy_prefix():
    from vllm_ltr_tpu.layers.rejection_sampler import rejection_sample
    S, k, V = 3, 3, 8
    target = np.full((S, k + 1, V), 1e-6, np.float32)
    draft = np.full((S, k, V), 1e-6, np.float32)
    # Target argmaxes: row0 = [1,2,3,4]; row1 = [5,5,5,5]; row2 = [7,0,1,2]
    argmaxes = [[1, 2, 3, 4], [5, 5, 5, 5], [7, 0, 1, 2]]
    for s in range(S):
        for j in range(k + 1):
            target[s, j, argmaxes[s][j]] = 1.0
    # Draft proposals: row0 matches all (full accept -> bonus 4);
    # row1 mismatches at j=1; row2 mismatches immediately.
    draft_tokens = np.asarray([[1, 2, 3], [5, 6, 5], [0, 1, 2]], np.int32)
    for s in range(S):
        for j in range(k):
            draft[s, j, draft_tokens[s, j]] = 1.0
    tokens, counts = rejection_sample(
        jnp.asarray(target / target.sum(-1, keepdims=True)),
        jnp.asarray(draft / draft.sum(-1, keepdims=True)),
        jnp.asarray(draft_tokens), jax.random.PRNGKey(0),
        jnp.asarray([True, True, True]))
    tokens = np.asarray(tokens)
    counts = np.asarray(counts)
    assert counts.tolist() == [4, 2, 1]
    assert tokens[0].tolist() == [1, 2, 3, 4]
    assert tokens[1, :2].tolist() == [5, 5]
    assert tokens[2, :1].tolist() == [7]


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    tmp = tmp_path_factory.mktemp("spec")
    torch.manual_seed(0)
    target = HFLlama(cfg).eval().float()
    target_dir = tmp / "target"
    target.save_pretrained(target_dir)
    # Draft = same arch, different (worse) weights.
    torch.manual_seed(123)
    draft = HFLlama(cfg).eval().float()
    draft_dir = tmp / "draft"
    draft.save_pretrained(draft_dir)
    return str(target_dir), str(draft_dir), target


def hf_greedy(model, prompt, n):
    with torch.no_grad():
        return model.generate(torch.tensor([prompt]), max_new_tokens=n,
                              do_sample=False)[0].tolist()[len(prompt):]


def test_greedy_spec_decode_matches_nonspec(models):
    target_dir, draft_dir, hf_target = models
    llm = LLM(model=target_dir,
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=128,
              max_num_seqs=8,
              num_gpu_blocks_override=96,
              block_size=16,
              swap_space=0.01,
              speculative_model=draft_dir,
              num_speculative_tokens=3)
    rng = np.random.RandomState(0)
    prompts = [list(map(int, rng.randint(1, 500, size=n)))
               for n in (5, 9, 3)]
    params = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts,
                        sampling_params=params,
                        use_tqdm=False)
    for prompt, out in zip(prompts, outs):
        expected = hf_greedy(hf_target, prompt, 12)
        assert out.outputs[0].token_ids == expected, (
            out.outputs[0].token_ids, expected)


def test_spec_decode_with_identical_draft_accepts_everything(models):
    """Draft == target: every proposal accepted, outputs still exact."""
    target_dir, _, hf_target = models
    llm = LLM(model=target_dir,
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=128,
              max_num_seqs=8,
              num_gpu_blocks_override=96,
              block_size=16,
              swap_space=0.01,
              speculative_model=target_dir,
              num_speculative_tokens=4)
    prompt = [5, 9, 13, 17]
    params = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    out = llm.generate(prompt_token_ids=[prompt],
                       sampling_params=params,
                       use_tqdm=False)[0]
    assert out.outputs[0].token_ids == hf_greedy(hf_target, prompt, 10)


def test_spec_decode_temperature_sampling_runs(models):
    target_dir, draft_dir, _ = models
    llm = LLM(model=target_dir,
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=128,
              max_num_seqs=8,
              num_gpu_blocks_override=96,
              block_size=16,
              swap_space=0.01,
              speculative_model=draft_dir,
              num_speculative_tokens=3)
    params = SamplingParams(temperature=0.9, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=[[5, 6, 7], [8, 9]],
                        sampling_params=params,
                        use_tqdm=False)
    for out in outs:
        assert len(out.outputs[0].token_ids) == 8
