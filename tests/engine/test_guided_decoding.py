"""End-to-end guided decoding + per-request logits processors.

Reference parity: vllm/model_executor/guided_decoding/ (outlines-backed
guided_json/regex/choice) and per-request ``logits_processors`` applied at
vllm/model_executor/layers/logits_processor.py:82-98.  Here the guide is
a host-compiled token FSM whose packed mask rides into the jitted
sampler, and logits_processors run host-side in a two-phase dispatch.
"""
import asyncio
import json

import numpy as np
import pytest
import torch

from vllm_ltr_tpu.transformers_utils.config import get_hf_config

MAXLEN3 = {"type": "string", "maxLength": 3}


@pytest.fixture(scope="module")
def guided_model_dir(tmp_path_factory):
    """Tiny llama + a BPE tokenizer whose alphabet covers JSON output."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import LlamaForCausalLM as HFLlama
    from transformers import PreTrainedTokenizerFast

    d = tmp_path_factory.mktemp("guided_model")
    corpus = [
        '{"name":"fox","age":42,"ok":true}',
        '{"name":"dog","age":7,"ok":false}',
        "yes no maybe 0123456789",
        "the quick brown fox jumps over the lazy dog",
        "null true false [1,2,3] {\"a\":\"b\"}",
    ] * 50
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")  # char-level
    trainer = trainers.BpeTrainer(
        vocab_size=480, special_tokens=["<unk>", "<s>", "</s>"])
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(tokenizer_object=tok,
                                   unk_token="<unk>",
                                   bos_token="<s>",
                                   eos_token="</s>")
    fast.save_pretrained(d)

    cfg = get_hf_config("test-llama-tiny")  # vocab 512 >= tokenizer vocab
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    hf.save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def guided_llm(guided_model_dir):
    from vllm_ltr_tpu import LLM
    return LLM(model=guided_model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, num_gpu_blocks_override=64, block_size=16,
               swap_space=0.01)


def _completed_text(llm, out):
    # The guide constrains the concatenation of token strings; the test
    # char-level tokenizer's decode() would add spaces between tokens.
    from vllm_ltr_tpu.guided.manager import token_strings
    strings = token_strings(llm.get_tokenizer())
    return "".join(strings[t] for t in out.outputs[0].token_ids)


def test_guided_choice_forces_valid_output(guided_llm):
    from vllm_ltr_tpu import SamplingParams
    sp = SamplingParams(temperature=1.0, max_tokens=16, seed=7,
                        guided_choice=["yes", "no", "maybe"])
    outs = guided_llm.generate(["the answer is"] * 4, sp, use_tqdm=False)
    for out in outs:
        assert _completed_text(guided_llm, out) in ("yes", "no", "maybe")
        assert out.outputs[0].finish_reason == "stop"  # EOS after match


def test_guided_regex_forces_match(guided_llm):
    import re

    from vllm_ltr_tpu import SamplingParams
    pattern = r"[1-9][0-9]{0,2} (fox|dog)"
    sp = SamplingParams(temperature=1.0, max_tokens=24, seed=3,
                        guided_regex=pattern)
    outs = guided_llm.generate(["count:"] * 3, sp, use_tqdm=False)
    for out in outs:
        assert re.fullmatch(pattern, _completed_text(guided_llm, out))


def test_guided_json_parses_and_validates(guided_llm):
    from vllm_ltr_tpu import SamplingParams
    schema = {
        "type": "object",
        "properties": {
            "name": MAXLEN3,
            "age": {"type": "integer"},
            "ok": {"type": "boolean"},
        },
    }
    sp = SamplingParams(temperature=1.0, max_tokens=80, seed=11,
                        guided_json=schema)
    outs = guided_llm.generate(["give me json"] * 2, sp, use_tqdm=False)
    for out in outs:
        doc = json.loads(_completed_text(guided_llm, out))
        assert list(doc) == ["name", "age", "ok"]
        assert isinstance(doc["name"], str) and len(doc["name"]) <= 3
        assert isinstance(doc["age"], int)
        assert isinstance(doc["ok"], bool)


def test_guided_json_lmfe_backend(guided_llm):
    """lm-format-enforcer backend (per-request override): guided_json
    compiles the whitespace-tolerant form — output still parses and
    matches the schema shape, and whitespace tokens are legal between
    structural characters (the strict backend would mask them out).
    Reference: DecodingConfig backends, lm_format_enforcer_decoding.py."""
    from vllm_ltr_tpu import SamplingParams
    schema = {"type": "object",
              "properties": {"name": MAXLEN3, "ok": {"type": "boolean"}}}
    sp = SamplingParams(temperature=1.0, max_tokens=80, seed=3,
                        guided_json=schema,
                        guided_decoding_backend="lm-format-enforcer")
    outs = guided_llm.generate(["give me json"] * 2, sp, use_tqdm=False)
    for out in outs:
        doc = json.loads(_completed_text(guided_llm, out))
        assert list(doc) == ["name", "ok"]
    # The two backends compile to distinct guides for the same schema.
    mgr = guided_llm.llm_engine._guided_manager()
    assert (mgr.guide_for("json", schema) is not
            mgr.guide_for("json", schema, "lm-format-enforcer"))
    # Unknown backend fails the request at add_request, not mid-decode.
    bad = SamplingParams(guided_json=schema, guided_decoding_backend="x")
    with pytest.raises(ValueError, match="guided_decoding_backend"):
        guided_llm.generate(["q"], bad, use_tqdm=False)


def test_guided_greedy_and_multi_step_exclusion(guided_llm):
    """Greedy + guided works, and guided requests mix with unguided ones
    in the same batch without cross-contamination."""
    from vllm_ltr_tpu import SamplingParams
    guided = SamplingParams(temperature=0.0, max_tokens=12,
                            guided_choice=["maybe"])
    free = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = guided_llm.generate(["a", "b"], [guided, free], use_tqdm=False)
    assert _completed_text(guided_llm, outs[0]) == "maybe"
    assert len(outs[1].outputs[0].token_ids) == 12  # unguided ran free


def test_logits_processors_apply_host_side(guided_llm):
    from vllm_ltr_tpu import SamplingParams
    forced = [9, 4, 7]

    def force_tokens(past_ids, logits):
        # Deterministically force a fixed token sequence.
        want = forced[min(len(past_ids), len(forced) - 1)]
        out = np.full_like(logits, -1e9)
        out[want] = 0.0
        return out

    sp = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True,
                        logits_processors=[force_tokens])
    outs = guided_llm.generate(["x"], sp, use_tqdm=False)
    assert outs[0].outputs[0].token_ids == forced


def test_logits_processor_chain_and_mixed_batch(guided_llm):
    from vllm_ltr_tpu import SamplingParams

    def bias_even(past_ids, logits):
        logits = logits.copy()
        logits[1::2] = -1e9
        return logits

    def pick_min_even(past_ids, logits):
        out = np.full_like(logits, -1e9)
        out[2] = 0.0
        return out

    chained = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                             logits_processors=[bias_even, pick_min_even])
    plain = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True)
    outs = guided_llm.generate(["p", "q"], [chained, plain], use_tqdm=False)
    assert outs[0].outputs[0].token_ids == [2, 2]
    assert len(outs[1].outputs[0].token_ids) == 2


def test_guided_rejects_without_tokenizer():
    from vllm_ltr_tpu import LLM, SamplingParams
    llm = LLM(model="test-llama-tiny", skip_tokenizer_init=True,
              max_model_len=64, max_num_seqs=4, num_gpu_blocks_override=32,
              swap_space=0.01)
    with pytest.raises(ValueError, match="tokenizer"):
        llm.generate(None, SamplingParams(guided_choice=["a"]),
                     prompt_token_ids=[[1, 2]], use_tqdm=False)


def test_sampling_params_guided_validation():
    from vllm_ltr_tpu import SamplingParams
    with pytest.raises(ValueError, match="at most one"):
        SamplingParams(guided_choice=["a"], guided_regex="b")
    with pytest.raises(ValueError, match="beam"):
        SamplingParams(guided_regex="a+", use_beam_search=True,
                       temperature=0.0, best_of=2)


# ---------------------------------------------------------------------------
# OpenAI protocol surface
# ---------------------------------------------------------------------------


def test_openai_guided_fields(guided_model_dir):
    import vllm_ltr_tpu.entrypoints.openai.api_server as srv
    from aiohttp.test_utils import TestClient, TestServer
    from vllm_ltr_tpu.engine.arg_utils import AsyncEngineArgs
    from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
    from vllm_ltr_tpu.entrypoints.openai.serving_completion import (
        OpenAIServingCompletion)

    engine_args = AsyncEngineArgs(model=guided_model_dir, dtype="float32",
                                  max_model_len=128, max_num_seqs=8,
                                  num_gpu_blocks_override=64, block_size=16,
                                  swap_space=0.01, disable_log_stats=True,
                                  disable_log_requests=True)
    srv.engine = AsyncLLMEngine.from_engine_args(engine_args)
    srv.openai_serving_completion = OpenAIServingCompletion(
        srv.engine, guided_model_dir)

    async def run():
        server = TestServer(srv.build_app())
        client = TestClient(server)
        await client.start_server()
        try:
            r = await client.post(
                "/v1/completions",
                json={"model": guided_model_dir, "prompt": "answer:",
                      "max_tokens": 16, "temperature": 1.0, "seed": 5,
                      "guided_choice": ["yes", "no"]})
            assert r.status == 200
            body = await r.json()
            # The char-level test tokenizer's detokenizer space-joins
            # tokens; compare space-insensitively.
            text = body["choices"][0]["text"].replace(" ", "")
            assert text in ("yes", "no")

            # guided_grammar is served (CFG pushdown guide); a grammar
            # in a foreign syntax (GBNF '::=') fails with a clear 400.
            r2 = await client.post(
                "/v1/completions",
                json={"model": guided_model_dir, "prompt": "x",
                      "max_tokens": 16, "temperature": 1.0, "seed": 7,
                      "guided_grammar":
                      'start: "yes" | "no" | "maybe"'})
            assert r2.status == 200
            body2 = await r2.json()
            text2 = body2["choices"][0]["text"].replace(" ", "")
            assert text2 in ("yes", "no", "maybe")

            r2b = await client.post(
                "/v1/completions",
                json={"model": guided_model_dir, "prompt": "x",
                      "max_tokens": 4,
                      "guided_grammar": "root ::= \"a\""})
            assert r2b.status == 400

            r3 = await client.post(
                "/v1/completions",
                json={"model": guided_model_dir, "prompt": "x",
                      "max_tokens": 4, "guided_regex": "(unbalanced"})
            assert r3.status == 400

            # logit_bias (OpenAI semantics) is real: a huge bias forces
            # the token under greedy decoding.
            r4 = await client.post(
                "/v1/completions",
                json={"model": guided_model_dir, "prompt": "x",
                      "max_tokens": 3, "temperature": 0,
                      "ignore_eos": True, "logprobs": 0,
                      "logit_bias": {"9": 100.0}})
            assert r4.status == 200
            body4 = await r4.json()
            assert body4["usage"]["completion_tokens"] == 3
            toks = body4["choices"][0]["logprobs"]["tokens"]
            # Greedy + a +100 bias on one id: every step picks it.
            assert len(toks) == 3 and len(set(toks)) == 1

            # response_format json_object -> valid JSON object output.
            r5 = await client.post(
                "/v1/completions",
                json={"model": guided_model_dir, "prompt": "data:",
                      "max_tokens": 60, "temperature": 1.0, "seed": 9,
                      "response_format": {"type": "json_object"}})
            assert r5.status == 200
            body5 = await r5.json()
            text5 = body5["choices"][0]["text"].replace(" ", "")
            doc = json.loads(text5)
            assert isinstance(doc, dict)

            # truncate_prompt_tokens keeps the LAST N token ids.
            r6 = await client.post(
                "/v1/completions",
                json={"model": guided_model_dir,
                      "prompt": "the quick brown fox jumps",
                      "max_tokens": 2, "temperature": 0,
                      "ignore_eos": True, "truncate_prompt_tokens": 4})
            assert r6.status == 200
            body6 = await r6.json()
            assert body6["usage"]["prompt_tokens"] <= 4
        finally:
            await client.close()

    asyncio.run(run())
