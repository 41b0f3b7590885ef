"""End-to-end engine tests: LLM.generate through scheduler + executor +
paged KV cache, validated token-for-token against HF transformers
(the reference's basic_correctness test pattern, SURVEY.md §4)."""
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
    d = tmp_path_factory.mktemp("tiny_llama")
    hf.save_pretrained(d)
    return str(d), hf, cfg


@pytest.fixture(scope="module")
def tiny_llm(tiny_llama_dir):
    d, _, _ = tiny_llama_dir
    return LLM(model=d,
               skip_tokenizer_init=True,
               dtype="float32",
               max_model_len=256,
               max_num_seqs=16,
               num_gpu_blocks_override=128,
               block_size=16,
               swap_space=0.01)


def hf_greedy(hf, prompt, n):
    with torch.no_grad():
        out = hf.generate(torch.tensor([prompt]),
                          max_new_tokens=n,
                          do_sample=False)
    return out[0].tolist()[len(prompt):]


def test_llm_generate_greedy_matches_hf(tiny_llm, tiny_llama_dir):
    _, hf, cfg = tiny_llama_dir
    rng = np.random.RandomState(0)
    prompts = [list(map(int, rng.randint(1, cfg.vocab_size, size=n)))
               for n in (5, 11, 3, 14)]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outputs = tiny_llm.generate(prompt_token_ids=prompts,
                                sampling_params=params,
                                use_tqdm=False)
    assert len(outputs) == len(prompts)
    for prompt, out in zip(prompts, outputs):
        expected = hf_greedy(hf, prompt, 8)
        assert out.outputs[0].token_ids == expected, (
            f"prompt={prompt}: {out.outputs[0].token_ids} != {expected}")
        assert out.finished
        assert out.outputs[0].finish_reason == "length"


def test_llm_generate_eos_stops(tiny_llm, tiny_llama_dir):
    _, hf, cfg = tiny_llama_dir
    prompt = [7, 3, 9]
    # Use the first greedy token as a stop token: generation must stop at 1.
    first = hf_greedy(hf, prompt, 1)[0]
    params = SamplingParams(temperature=0.0,
                            max_tokens=8,
                            stop_token_ids=[first])
    out = tiny_llm.generate(prompt_token_ids=[prompt],
                            sampling_params=params,
                            use_tqdm=False)[0]
    assert out.outputs[0].token_ids == [first]
    assert out.outputs[0].finish_reason == "stop"
    assert out.outputs[0].stop_reason == first


def test_llm_generate_logprobs(tiny_llm):
    params = SamplingParams(temperature=0.0,
                            max_tokens=4,
                            ignore_eos=True,
                            logprobs=3)
    out = tiny_llm.generate(prompt_token_ids=[[5, 6, 7]],
                            sampling_params=params,
                            use_tqdm=False)[0]
    lp = out.outputs[0].logprobs
    assert len(lp) == 4
    for step_lp, token in zip(lp, out.outputs[0].token_ids):
        assert token in step_lp
        assert len(step_lp) >= 3
        # Greedy: the sampled token is the argmax -> logprob rank 1.
        best = max(step_lp.values(), key=lambda l: l.logprob)
        assert step_lp[token].logprob == best.logprob


def test_llm_random_sampling_seeded_runs(tiny_llm):
    params = SamplingParams(temperature=0.8, top_p=0.9, top_k=40,
                            max_tokens=6, ignore_eos=True)
    outs = tiny_llm.generate(prompt_token_ids=[[5, 6, 7], [8, 9, 10]],
                             sampling_params=params,
                             use_tqdm=False)
    for out in outs:
        assert len(out.outputs[0].token_ids) == 6


def test_dispatch_stats_populate(tiny_llm):
    """The executor accounts every device dispatch by kind; benchmarks
    rely on these counters to attribute throughput between policies."""
    ex = tiny_llm.llm_engine.model_executor
    before = dict(ex.dispatch_stats)
    params = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    tiny_llm.generate(prompt_token_ids=[[5, 6, 7], [8, 9, 10]],
                      sampling_params=params,
                      use_tqdm=False)
    after = ex.dispatch_stats
    assert after["steps"] > before["steps"]
    assert after["prefill_dispatches"] > before["prefill_dispatches"]
    assert after["prefill_tokens"] >= before["prefill_tokens"] + 6
    new_decode = (after["decode_fused_dispatches"] +
                  after["decode_single_dispatches"] -
                  before["decode_fused_dispatches"] -
                  before["decode_single_dispatches"])
    assert new_decode > 0
    assert after["decode_tokens"] >= before["decode_tokens"] + 6


def test_llm_opt_policy_end_to_end(tiny_llama_dir, tmp_path):
    """Ranked scheduling with a real (random-weight) OPT classifier
    predictor wired through prefill_predictor_model_config."""
    from transformers import OPTForSequenceClassification as HFCls
    d, hf, cfg = tiny_llama_dir

    pred_cfg = get_hf_config("test-opt-tiny")
    pred_cfg.num_labels = 1
    torch.manual_seed(1)
    pred = HFCls(pred_cfg).eval().float()
    pred_dir = tmp_path / "pred"
    pred.save_pretrained(pred_dir)

    usage_config = tmp_path / "usage_config.json"
    import json
    usage_config.write_text(
        json.dumps({
            "pred_model": str(pred_dir),
            "num_labels": 1,
            "mtype": "rank",
            "max_length": 64,
            "max_batch_size": 32,
        }))

    llm = LLM(model=d,
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=256,
              max_num_seqs=4,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01,
              schedule_type="opt",
              prefill_predictor_model_config=str(usage_config))

    rng = np.random.RandomState(1)
    prompts = [list(map(int, rng.randint(1, cfg.vocab_size, size=n)))
               for n in (5, 9, 7, 4, 6, 8)]
    params = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    outputs = llm.generate(prompt_token_ids=prompts,
                           sampling_params=params,
                           use_tqdm=False)
    assert len(outputs) == len(prompts)
    # Every request got scored exactly once by the predictor...
    for out in outputs:
        assert out.outputs[0].aux_model_score is not None
    # ...and generation still matches HF greedy (scheduling must not change
    # results, only order).
    for prompt, out in zip(prompts, outputs):
        expected = hf_greedy(hf, prompt, 5)
        assert out.outputs[0].token_ids == expected


def test_llm_mlfq_end_to_end(tiny_llama_dir):
    d, hf, cfg = tiny_llama_dir
    llm = LLM(model=d,
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=256,
              max_num_seqs=4,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01,
              schedule_type="mlfq-quant0.05-thres2")
    prompts = [[5, 6, 7], [8, 9, 10, 11], [12, 13]]
    params = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    outputs = llm.generate(prompt_token_ids=prompts,
                           sampling_params=params,
                           use_tqdm=False)
    assert len(outputs) == len(prompts)
    for prompt, out in zip(prompts, outputs):
        assert out.outputs[0].token_ids == hf_greedy(hf, prompt, 5)


def test_parallel_sampling_best_of(tiny_llm):
    """n=best_of=3: three distinct streams forked at prefill completion."""
    params = SamplingParams(n=3, best_of=3, temperature=0.8, top_p=0.95,
                            max_tokens=5, ignore_eos=True)
    out = tiny_llm.generate(prompt_token_ids=[[5, 6, 7, 8]],
                            sampling_params=params,
                            use_tqdm=False)[0]
    assert len(out.outputs) == 3
    firsts = {o.token_ids[0] for o in out.outputs}
    assert len(firsts) == 3  # distinct first tokens per stream
    for o in out.outputs:
        assert len(o.token_ids) == 5


def test_beam_search(tiny_llm, tiny_llama_dir):
    """Beam search: best_of beams, highest-cumulative-logprob first;
    the top hypothesis must match HF transformers' beam output."""
    _, hf, cfg = tiny_llama_dir
    prompt = [5, 9, 13, 17]
    params = SamplingParams(n=2, best_of=2, use_beam_search=True,
                            temperature=0.0, max_tokens=6, ignore_eos=True)
    out = tiny_llm.generate(prompt_token_ids=[prompt],
                            sampling_params=params,
                            use_tqdm=False)[0]
    assert len(out.outputs) == 2
    for o in out.outputs:
        assert len(o.token_ids) == 6
    # Ordered by beam score (cumulative logprob, length penalty 1).
    assert (out.outputs[0].cumulative_logprob
            >= out.outputs[1].cumulative_logprob)
    assert out.outputs[0].token_ids != out.outputs[1].token_ids
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor([prompt]), max_new_tokens=6,
                             num_beams=2, do_sample=False,
                             early_stopping=False,
                             num_return_sequences=1)
    expected = hf_out[0].tolist()[len(prompt):]
    assert out.outputs[0].token_ids == expected
