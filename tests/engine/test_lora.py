"""LoRA serving tests: peft-format adapters, per-request application
validated against the HF model with merged weights (reference vllm/lora +
punica BGMV behavior)."""
import json

import numpy as np
import pytest
import torch

from vllm_ltr_tpu import LLM, SamplingParams
from vllm_ltr_tpu.lora import LoRARequest
from vllm_ltr_tpu.transformers_utils.config import get_hf_config

RANK = 4
TARGETS = ["q_proj", "v_proj"]


def make_adapter_dir(tmp_path, cfg, seed, name):
    """Create a peft-format adapter with random A/B weights."""
    from safetensors.numpy import save_file
    rng = np.random.RandomState(seed)
    d = tmp_path / name
    d.mkdir()
    (d / "adapter_config.json").write_text(
        json.dumps({
            "r": RANK,
            "lora_alpha": 8,
            "target_modules": TARGETS,
        }))
    sd = {}
    H = cfg.hidden_size
    KH = cfg.num_key_value_heads
    D = H // cfg.num_attention_heads
    out_dims = {"q_proj": H, "v_proj": KH * D}
    for i in range(cfg.num_hidden_layers):
        for t in TARGETS:
            a = rng.normal(size=(RANK, H)).astype(np.float32) * 0.05
            b = rng.normal(size=(out_dims[t], RANK)).astype(np.float32) * 0.05
            base = f"base_model.model.model.layers.{i}.self_attn.{t}"
            sd[base + ".lora_A.weight"] = a
            sd[base + ".lora_B.weight"] = b
    save_file(sd, str(d / "adapter_model.safetensors"))
    return str(d)


def merge_adapter_into_hf(hf, adapter_dir):
    """Return a copy of the HF model with the LoRA delta merged."""
    import copy
    from safetensors.numpy import load_file
    merged = copy.deepcopy(hf)
    sd = load_file(adapter_dir + "/adapter_model.safetensors")
    cfg = json.loads(open(adapter_dir + "/adapter_config.json").read())
    scaling = cfg["lora_alpha"] / cfg["r"]
    with torch.no_grad():
        for i, layer in enumerate(merged.model.layers):
            for t in TARGETS:
                base = f"base_model.model.model.layers.{i}.self_attn.{t}"
                a = torch.from_numpy(sd[base + ".lora_A.weight"])
                b = torch.from_numpy(sd[base + ".lora_B.weight"])
                proj = getattr(layer.self_attn, t)
                proj.weight += scaling * (b @ a)
    return merged


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    tmp = tmp_path_factory.mktemp("lora")
    model_dir = tmp / "model"
    hf.save_pretrained(model_dir)
    adapter1 = make_adapter_dir(tmp, cfg, seed=1, name="a1")
    adapter2 = make_adapter_dir(tmp, cfg, seed=2, name="a2")
    llm = LLM(model=str(model_dir),
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=128,
              max_num_seqs=8,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01,
              enable_lora=True,
              max_loras=2,
              max_lora_rank=8)
    return llm, hf, cfg, adapter1, adapter2


def hf_greedy(model, prompt, n):
    with torch.no_grad():
        return model.generate(torch.tensor([prompt]), max_new_tokens=n,
                              do_sample=False)[0].tolist()[len(prompt):]


def test_lora_request_matches_merged_model(setup):
    llm, hf, cfg, adapter1, _ = setup
    prompt = [5, 9, 13, 17]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    out = llm.generate(prompt_token_ids=[prompt],
                       sampling_params=params,
                       use_tqdm=False,
                       lora_request=LoRARequest("a1", 1, adapter1))[0]
    merged = merge_adapter_into_hf(hf, adapter1)
    assert out.outputs[0].token_ids == hf_greedy(merged, prompt, 6)


def test_mixed_lora_batch(setup):
    """Requests with different adapters (and none) in one batch."""
    llm, hf, cfg, adapter1, adapter2 = setup
    prompts = [[5, 9, 13], [5, 9, 13], [5, 9, 13]]
    params = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    reqs = [
        LoRARequest("a1", 1, adapter1),
        LoRARequest("a2", 2, adapter2),
        None,
    ]
    outs = llm.generate(prompt_token_ids=prompts,
                        sampling_params=params,
                        use_tqdm=False,
                        lora_request=reqs)
    merged1 = merge_adapter_into_hf(hf, adapter1)
    merged2 = merge_adapter_into_hf(hf, adapter2)
    assert outs[0].outputs[0].token_ids == hf_greedy(merged1, prompts[0], 5)
    assert outs[1].outputs[0].token_ids == hf_greedy(merged2, prompts[1], 5)
    assert outs[2].outputs[0].token_ids == hf_greedy(hf, prompts[2], 5)
    # Different adapters must give different generations for this seed.
    assert (outs[0].outputs[0].token_ids != outs[2].outputs[0].token_ids
            or outs[1].outputs[0].token_ids != outs[2].outputs[0].token_ids)
