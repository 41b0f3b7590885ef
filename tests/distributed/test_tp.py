"""Tensor-parallel correctness on the virtual CPU mesh (SURVEY.md §4: test
sharding logic without hardware via xla_force_host_platform_device_count).

The reference's 2-GPU distributed correctness test
(tests/distributed/test_basic_distributed_correctness.py) compares TP=2 vs
HF; here TP=2 (and TP=4 with GQA-head replication) must match TP=1
token-for-token through the full engine.
"""
import numpy as np
import pytest
import torch

from vllm_ltr_tpu import LLM, SamplingParams
from vllm_ltr_tpu.transformers_utils.config import get_hf_config


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    d = tmp_path_factory.mktemp("tp_llama")
    hf.save_pretrained(d)
    return str(d), hf


def run(model_dir, tp, dp=1):
    llm = LLM(model=model_dir,
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=128,
              max_num_seqs=8,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01,
              tensor_parallel_size=tp,
              data_parallel_size=dp)
    rng = np.random.RandomState(0)
    prompts = [list(map(int, rng.randint(1, 500, size=n))) for n in (5, 9)]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts,
                        sampling_params=params,
                        use_tqdm=False)
    return [o.outputs[0].token_ids for o in outs]


def test_tp2_matches_tp1(model_dir):
    d, _ = model_dir
    assert run(d, 1) == run(d, 2)


def test_tp2_dp2_matches_tp1(model_dir):
    d, _ = model_dir
    assert run(d, 1) == run(d, 2, dp=2)
