"""Chat completions + incremental detokenization with a real (locally
trained) tokenizer — closes the text-path coverage that token-id-only tests
skip."""
import asyncio
import json

import numpy as np
import pytest
import torch

from vllm_ltr_tpu.transformers_utils.config import get_hf_config

CHAT_TEMPLATE = (
    "{% for message in messages %}{{ message['role'] }}: "
    "{{ message['content'] }}\n{% endfor %}"
    "{% if add_generation_prompt %}assistant:{% endif %}")


@pytest.fixture(scope="module")
def tok_model_dir(tmp_path_factory):
    """Train a tiny BPE tokenizer offline and save model + tokenizer."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import LlamaForCausalLM as HFLlama
    from transformers import PreTrainedTokenizerFast

    d = tmp_path_factory.mktemp("chat_model")
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "hello world how are you today",
        "tpu serving with learning to rank scheduling",
        "pack my box with five dozen liquor jugs",
    ] * 50
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=490, special_tokens=["<unk>", "<s>", "</s>"])
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(tokenizer_object=tok,
                                   unk_token="<unk>",
                                   bos_token="<s>",
                                   eos_token="</s>")
    fast.chat_template = CHAT_TEMPLATE
    fast.save_pretrained(d)

    cfg = get_hf_config("test-llama-tiny")  # vocab 512 >= tokenizer vocab
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    hf.save_pretrained(d)
    return str(d)


def test_generate_with_text_prompts(tok_model_dir):
    from vllm_ltr_tpu import LLM, SamplingParams
    llm = LLM(model=tok_model_dir,
              dtype="float32",
              max_model_len=128,
              max_num_seqs=8,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01)
    tokenizer = llm.get_tokenizer()
    assert tokenizer is not None
    outs = llm.generate(["the quick brown fox", "hello world"],
                        SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True),
                        use_tqdm=False)
    for out in outs:
        # Incremental detokenization produced text matching a full decode.
        full = tokenizer.decode(out.outputs[0].token_ids,
                                skip_special_tokens=True)
        assert out.outputs[0].text.strip() == full.strip()
        assert len(out.outputs[0].token_ids) == 6


def test_chat_completions_http(tok_model_dir):
    import vllm_ltr_tpu.entrypoints.openai.api_server as srv
    from vllm_ltr_tpu.engine.arg_utils import AsyncEngineArgs
    from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
    from vllm_ltr_tpu.entrypoints.openai.serving_chat import OpenAIServingChat
    from vllm_ltr_tpu.entrypoints.openai.serving_completion import (
        OpenAIServingCompletion)

    engine_args = AsyncEngineArgs(model=tok_model_dir,
                                  dtype="float32",
                                  max_model_len=128,
                                  max_num_seqs=8,
                                  num_gpu_blocks_override=64,
                                  block_size=16,
                                  swap_space=0.01,
                                  disable_log_stats=True,
                                  disable_log_requests=True)
    srv.engine = AsyncLLMEngine.from_engine_args(engine_args)
    srv.openai_serving_completion = OpenAIServingCompletion(
        srv.engine, tok_model_dir)
    srv.openai_serving_chat = OpenAIServingChat(srv.engine, tok_model_dir)

    async def scenario():
        from aiohttp.test_utils import TestClient, TestServer
        client = TestClient(TestServer(srv.build_app()))
        await client.start_server()
        try:
            r = await client.post("/v1/chat/completions",
                                  json={
                                      "model": tok_model_dir,
                                      "messages": [{
                                          "role": "user",
                                          "content": "hello world"
                                      }],
                                      "max_tokens": 5,
                                      "temperature": 0,
                                      "ignore_eos": True,
                                  })
            assert r.status == 200, await r.text()
            data = await r.json()
            choice = data["choices"][0]
            assert choice["message"]["role"] == "assistant"
            assert data["usage"]["completion_tokens"] == 5
            # Streaming chat.
            r = await client.post("/v1/chat/completions",
                                  json={
                                      "model": tok_model_dir,
                                      "messages": [{
                                          "role": "user",
                                          "content": "the quick brown fox"
                                      }],
                                      "max_tokens": 4,
                                      "temperature": 0,
                                      "ignore_eos": True,
                                      "stream": True,
                                  })
            assert r.status == 200
            body = (await r.read()).decode()
            assert body.strip().endswith("data: [DONE]")
            events = [
                json.loads(l[6:]) for l in body.splitlines()
                if l.startswith("data: ") and l != "data: [DONE]"
            ]
            assert events[0]["choices"][0]["delta"]["role"] == "assistant"
        finally:
            await client.close()

    asyncio.run(scenario())
