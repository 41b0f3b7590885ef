"""OpenAI API server tests: real HTTP through aiohttp's test server
(reference pattern: tests/entrypoints spin up the server and hit it)."""
import asyncio
import json

import numpy as np
import pytest
import torch

from vllm_ltr_tpu.transformers_utils.config import get_hf_config


@pytest.fixture(scope="module")
def served_app(tmp_path_factory):
    from transformers import LlamaForCausalLM as HFLlama
    import vllm_ltr_tpu.entrypoints.openai.api_server as srv
    from vllm_ltr_tpu.engine.arg_utils import AsyncEngineArgs
    from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
    from vllm_ltr_tpu.entrypoints.openai.serving_chat import OpenAIServingChat
    from vllm_ltr_tpu.entrypoints.openai.serving_completion import (
        OpenAIServingCompletion)

    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    d = tmp_path_factory.mktemp("served_llama")
    hf.save_pretrained(d)

    engine_args = AsyncEngineArgs(model=str(d),
                                  skip_tokenizer_init=True,
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
        srv.engine, str(d))
    srv.openai_serving_chat = OpenAIServingChat(srv.engine, str(d))
    # An aiohttp Application binds to one event loop; hand back the factory
    # so each asyncio.run builds a fresh app over the shared engine.
    return srv.build_app, str(d), hf


async def _with_client(app_factory, fn):
    from aiohttp.test_utils import TestClient, TestServer
    server = TestServer(app_factory())
    client = TestClient(server)
    await client.start_server()
    try:
        return await fn(client)
    finally:
        await client.close()


def test_health_and_models(served_app):
    app, model, _ = served_app

    async def scenario(client):
        r = await client.get("/health")
        assert r.status == 200
        r = await client.get("/v1/models")
        data = await r.json()
        assert data["data"][0]["id"] == model
        r = await client.get("/version")
        assert (await r.json())["version"]

    asyncio.run(_with_client(app, scenario))


def test_completion_token_prompt_matches_hf(served_app):
    app, model, hf = served_app
    prompt = [5, 9, 13, 17]
    with torch.no_grad():
        expected = hf.generate(torch.tensor([prompt]),
                               max_new_tokens=6,
                               do_sample=False)[0].tolist()[len(prompt):]

    async def scenario(client):
        r = await client.post("/v1/completions",
                              json={
                                  "model": model,
                                  "prompt": prompt,
                                  "max_tokens": 6,
                                  "temperature": 0,
                                  "ignore_eos": True,
                                  "logprobs": 2,
                                  "est_tokens": 6,
                              })
        assert r.status == 200
        data = await r.json()
        choice = data["choices"][0]
        assert choice["finish_reason"] == "length"
        assert data["usage"]["completion_tokens"] == 6
        # Token ids are recoverable from logprobs tokens (no tokenizer:
        # token strings are the ids).
        toks = [int(t) for t in choice["logprobs"]["tokens"]]
        assert toks == expected
        assert len(choice["logprobs"]["top_logprobs"][0]) >= 2

    asyncio.run(_with_client(app, scenario))


def test_completion_echo_prompt_logprobs(served_app):
    """echo + logprobs returns per-position PROMPT logprobs matching a
    teacher-forced HF forward (VERDICT r4 item 6; reference
    serving_completion echo contract)."""
    app, model, hf = served_app
    prompt = [5, 9, 13, 17, 21, 25]
    with torch.no_grad():
        logits = hf(torch.tensor([prompt])).logits[0].float()
    lps = torch.log_softmax(logits, dim=-1)
    expected = [float(lps[p - 1, prompt[p]]) for p in range(1, len(prompt))]

    async def scenario(client):
        r = await client.post("/v1/completions",
                              json={
                                  "model": model,
                                  "prompt": prompt,
                                  "max_tokens": 0,
                                  "temperature": 0,
                                  "echo": True,
                                  "logprobs": 1,
                              })
        assert r.status == 200
        data = await r.json()
        lp = data["choices"][0]["logprobs"]
        toks = [int(t) for t in lp["tokens"]]
        assert toks == prompt
        # First prompt token has no logprob (null); the rest match HF.
        assert lp["token_logprobs"][0] is None
        for p in range(1, len(prompt)):
            assert lp["token_logprobs"][p] == pytest.approx(
                expected[p - 1], abs=3e-3)

    asyncio.run(_with_client(app, scenario))


def test_completion_streaming(served_app):
    app, model, _ = served_app

    async def scenario(client):
        r = await client.post("/v1/completions",
                              json={
                                  "model": model,
                                  "prompt": [3, 4, 5],
                                  "max_tokens": 4,
                                  "temperature": 0,
                                  "ignore_eos": True,
                                  "stream": True,
                              })
        assert r.status == 200
        body = (await r.read()).decode()
        events = [
            line[len("data: "):] for line in body.splitlines()
            if line.startswith("data: ")
        ]
        assert events[-1] == "[DONE]"
        parsed = [json.loads(e) for e in events[:-1]]
        assert len(parsed) == 4  # one chunk per generated token
        assert parsed[-1]["choices"][0]["finish_reason"] == "length"

        # stream_options.include_usage: final frame carries exact token
        # counts (what the serving benchmark's client consumes — a fused
        # multi-step wave emits many tokens per SSE frame).
        r = await client.post("/v1/completions",
                              json={
                                  "model": model,
                                  "prompt": [3, 4, 5],
                                  "max_tokens": 4,
                                  "temperature": 0,
                                  "ignore_eos": True,
                                  "stream": True,
                                  "stream_options": {
                                      "include_usage": True
                                  },
                              })
        assert r.status == 200
        body = (await r.read()).decode()
        events = [
            line[len("data: "):] for line in body.splitlines()
            if line.startswith("data: ")
        ]
        assert events[-1] == "[DONE]"
        usage_frame = json.loads(events[-2])
        assert usage_frame["choices"] == []
        assert usage_frame["usage"] == {
            "prompt_tokens": 3,
            "total_tokens": 7,
            "completion_tokens": 4,
        }

    asyncio.run(_with_client(app, scenario))


def test_wrong_model_404_and_bad_request(served_app):
    app, model, _ = served_app

    async def scenario(client):
        r = await client.post("/v1/completions",
                              json={
                                  "model": "nope",
                                  "prompt": [1, 2]
                              })
        assert r.status == 404
        # String prompt without a tokenizer -> clean 400.
        r = await client.post("/v1/completions",
                              json={
                                  "model": model,
                                  "prompt": "hello"
                              })
        assert r.status == 400
        # Over-long request -> clean 400.
        r = await client.post("/v1/completions",
                              json={
                                  "model": model,
                                  "prompt": [1] * 100,
                                  "max_tokens": 100
                              })
        assert r.status == 400
        data = await r.json()
        assert "maximum context length" in data["message"]

    asyncio.run(_with_client(app, scenario))
