"""LoRA breadth (VERDICT r4 item 8): non-llama targets (OPT family),
embedding + lm_head adapters, and multi-adapter OpenAI serving via
--lora-modules — each validated against an HF model with the delta
merged (reference vllm/lora/layers.py wraps every parallel layer, the
vocab embedding, and the logits head)."""
import asyncio
import json

import numpy as np
import pytest
import torch

from vllm_ltr_tpu import LLM, SamplingParams
from vllm_ltr_tpu.lora import LoRARequest
from vllm_ltr_tpu.transformers_utils.config import get_hf_config

RANK = 4
ALPHA = 8


def _save_adapter(tmp_path, name, sd, targets):
    from safetensors.numpy import save_file
    d = tmp_path / name
    d.mkdir()
    (d / "adapter_config.json").write_text(
        json.dumps({"r": RANK, "lora_alpha": ALPHA,
                    "target_modules": targets}))
    save_file(sd, str(d / "adapter_model.safetensors"))
    return str(d)


def hf_greedy(model, prompt, n):
    with torch.no_grad():
        return model.generate(torch.tensor([prompt]), max_new_tokens=n,
                              do_sample=False)[0].tolist()[len(prompt):]


# ---------------------------------------------------------------------------
# OPT-family targets
# ---------------------------------------------------------------------------


OPT_TARGETS = ["q_proj", "v_proj", "out_proj", "fc1", "fc2"]


def make_opt_adapter(tmp_path, cfg, seed, name):
    rng = np.random.RandomState(seed)
    H = cfg.hidden_size
    F = cfg.ffn_dim
    dims = {"q_proj": (H, H), "v_proj": (H, H), "out_proj": (H, H),
            "fc1": (H, F), "fc2": (F, H)}
    sd = {}
    for i in range(cfg.num_hidden_layers):
        for t in OPT_TARGETS:
            h_in, h_out = dims[t]
            infix = "self_attn." if t.endswith("_proj") else ""
            base = f"base_model.model.model.decoder.layers.{i}.{infix}{t}"
            sd[base + ".lora_A.weight"] = rng.normal(
                size=(RANK, h_in)).astype(np.float32) * 0.05
            sd[base + ".lora_B.weight"] = rng.normal(
                size=(h_out, RANK)).astype(np.float32) * 0.05
    return _save_adapter(tmp_path, name, sd, OPT_TARGETS)


def merge_opt_adapter(hf, adapter_dir):
    import copy
    from safetensors.numpy import load_file
    merged = copy.deepcopy(hf)
    sd = load_file(adapter_dir + "/adapter_model.safetensors")
    scaling = ALPHA / RANK
    with torch.no_grad():
        for i, layer in enumerate(merged.model.decoder.layers):
            for t in OPT_TARGETS:
                infix = "self_attn." if t.endswith("_proj") else ""
                base = (f"base_model.model.model.decoder.layers.{i}."
                        f"{infix}{t}")
                a = torch.from_numpy(sd[base + ".lora_A.weight"])
                b = torch.from_numpy(sd[base + ".lora_B.weight"])
                mod = (getattr(layer.self_attn, t)
                       if t.endswith("_proj") else getattr(layer, t))
                mod.weight += scaling * (b @ a)
    return merged


def test_opt_lora_matches_merged_model(tmp_path):
    from transformers import OPTForCausalLM
    cfg = get_hf_config("test-opt-tiny")
    torch.manual_seed(0)
    hf = OPTForCausalLM(cfg).eval().float()
    model_dir = tmp_path / "opt"
    hf.save_pretrained(model_dir)
    adapter = make_opt_adapter(tmp_path, cfg, seed=3, name="opt_a")

    llm = LLM(model=str(model_dir), skip_tokenizer_init=True,
              dtype="float32", max_model_len=128, max_num_seqs=4,
              num_gpu_blocks_override=64, block_size=16, swap_space=0.01,
              enable_lora=True, max_loras=2, max_lora_rank=8)
    prompt = [5, 9, 13, 17]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    base = llm.generate(prompt_token_ids=[prompt], sampling_params=params,
                        use_tqdm=False)[0].outputs[0].token_ids
    assert base == hf_greedy(hf, prompt, 6)

    req = LoRARequest("opt_a", 1, adapter)
    got = llm.generate(prompt_token_ids=[prompt], sampling_params=params,
                       lora_request=req,
                       use_tqdm=False)[0].outputs[0].token_ids
    want = hf_greedy(merge_opt_adapter(hf, adapter), prompt, 6)
    assert got == want
    assert got != base  # the adapter actually changed the output


# ---------------------------------------------------------------------------
# Embedding + lm_head adapters (llama family)
# ---------------------------------------------------------------------------


def make_embed_head_adapter(tmp_path, cfg, seed, name):
    rng = np.random.RandomState(seed)
    H, V = cfg.hidden_size, cfg.vocab_size
    sd = {
        # peft Embedding adapters: A [r, V], B [H, r].
        "base_model.model.model.embed_tokens.lora_embedding_A":
        rng.normal(size=(RANK, V)).astype(np.float32) * 0.05,
        "base_model.model.model.embed_tokens.lora_embedding_B":
        rng.normal(size=(H, RANK)).astype(np.float32) * 0.05,
        # lm_head: plain Linear adapter, A [r, H], B [V, r].
        "base_model.model.lm_head.lora_A.weight":
        rng.normal(size=(RANK, H)).astype(np.float32) * 0.05,
        "base_model.model.lm_head.lora_B.weight":
        rng.normal(size=(V, RANK)).astype(np.float32) * 0.05,
    }
    return _save_adapter(tmp_path, name, sd,
                         ["embed_tokens", "lm_head"])


def merge_embed_head_adapter(hf, adapter_dir):
    import copy
    from safetensors.numpy import load_file
    merged = copy.deepcopy(hf)
    sd = load_file(adapter_dir + "/adapter_model.safetensors")
    scaling = ALPHA / RANK
    with torch.no_grad():
        ea = torch.from_numpy(
            sd["base_model.model.model.embed_tokens.lora_embedding_A"])
        eb = torch.from_numpy(
            sd["base_model.model.model.embed_tokens.lora_embedding_B"])
        merged.model.embed_tokens.weight += scaling * (eb @ ea).T
        ha = torch.from_numpy(
            sd["base_model.model.lm_head.lora_A.weight"])
        hb = torch.from_numpy(
            sd["base_model.model.lm_head.lora_B.weight"])
        merged.lm_head.weight += scaling * (hb @ ha)
    return merged


def test_embed_and_lm_head_lora_matches_merged_model(tmp_path):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    # Untie: the adapter targets embed and head independently.
    hf.config.tie_word_embeddings = False
    hf.lm_head.weight = torch.nn.Parameter(
        hf.lm_head.weight.detach().clone())
    model_dir = tmp_path / "llama"
    hf.save_pretrained(model_dir)
    adapter = make_embed_head_adapter(tmp_path, cfg, seed=4, name="eh_a")

    llm = LLM(model=str(model_dir), skip_tokenizer_init=True,
              dtype="float32", max_model_len=128, max_num_seqs=4,
              num_gpu_blocks_override=64, block_size=16, swap_space=0.01,
              enable_lora=True, max_loras=2, max_lora_rank=8)
    prompt = [5, 9, 13, 17, 21]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    base = llm.generate(prompt_token_ids=[prompt], sampling_params=params,
                        use_tqdm=False)[0].outputs[0].token_ids
    assert base == hf_greedy(hf, prompt, 6)

    req = LoRARequest("eh_a", 1, adapter)
    got = llm.generate(prompt_token_ids=[prompt], sampling_params=params,
                       lora_request=req,
                       use_tqdm=False)[0].outputs[0].token_ids
    want = hf_greedy(merge_embed_head_adapter(hf, adapter), prompt, 6)
    assert got == want
    assert got != base


# ---------------------------------------------------------------------------
# Multi-adapter OpenAI serving (--lora-modules)
# ---------------------------------------------------------------------------


def test_openai_multi_adapter_serving(tmp_path):
    from transformers import LlamaForCausalLM as HFLlama
    import vllm_ltr_tpu.entrypoints.openai.api_server as srv
    from vllm_ltr_tpu.engine.arg_utils import AsyncEngineArgs
    from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
    from vllm_ltr_tpu.entrypoints.openai.serving_completion import (
        OpenAIServingCompletion)
    from vllm_ltr_tpu.entrypoints.openai.serving_engine import LoRAModulePath
    from tests.engine.test_lora import (make_adapter_dir,
                                        merge_adapter_into_hf)

    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    model_dir = tmp_path / "m"
    hf.save_pretrained(model_dir)
    a1 = make_adapter_dir(tmp_path, cfg, seed=11, name="a1")
    a2 = make_adapter_dir(tmp_path, cfg, seed=12, name="a2")

    engine_args = AsyncEngineArgs(model=str(model_dir),
                                  skip_tokenizer_init=True,
                                  dtype="float32", max_model_len=128,
                                  max_num_seqs=8,
                                  num_gpu_blocks_override=64,
                                  block_size=16, swap_space=0.01,
                                  enable_lora=True, max_loras=2,
                                  max_lora_rank=8,
                                  disable_log_stats=True,
                                  disable_log_requests=True)
    srv.engine = AsyncLLMEngine.from_engine_args(engine_args)
    mods = [LoRAModulePath("sql-lora", a1), LoRAModulePath("tldr-lora", a2)]
    srv.openai_serving_completion = OpenAIServingCompletion(
        srv.engine, str(model_dir), lora_modules=mods)
    srv.openai_serving_chat = None

    prompt = [5, 9, 13, 17]
    expect = {
        str(model_dir): hf_greedy(hf, prompt, 5),
        "sql-lora": hf_greedy(merge_adapter_into_hf(hf, a1), prompt, 5),
        "tldr-lora": hf_greedy(merge_adapter_into_hf(hf, a2), prompt, 5),
    }
    assert len({tuple(v) for v in expect.values()}) == 3  # all distinct

    async def scenario(client):
        r = await client.get("/v1/models")
        ids = {m["id"] for m in (await r.json())["data"]}
        assert {"sql-lora", "tldr-lora", str(model_dir)} <= ids
        for name, want in expect.items():
            r = await client.post("/v1/completions",
                                  json={"model": name, "prompt": prompt,
                                        "max_tokens": 5, "temperature": 0,
                                        "ignore_eos": True, "logprobs": 0})
            assert r.status == 200, (name, await r.text())
            body = await r.json()
            toks = [int(t)
                    for t in body["choices"][0]["logprobs"]["tokens"]]
            assert toks == want, name
        r = await client.post("/v1/completions",
                              json={"model": "missing-lora",
                                    "prompt": prompt, "max_tokens": 2})
        assert r.status == 404

    async def run():
        from aiohttp.test_utils import TestClient, TestServer
        server = TestServer(srv.build_app())
        client = TestClient(server)
        await client.start_server()
        try:
            await scenario(client)
        finally:
            await client.close()

    asyncio.run(run())
