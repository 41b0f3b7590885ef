"""INT4 quantized serving tests: on-the-fly quantization and AWQ/GPTQ
checkpoint loading through the full engine (reference: AWQ/GPTQ accuracy at
same bit-width, BASELINE.md)."""
import numpy as np
import pytest
import torch

from vllm_ltr_tpu import LLM, SamplingParams
from vllm_ltr_tpu.transformers_utils.config import get_hf_config

PROMPTS = [[5, 9, 13, 17, 21], [7, 3, 2, 8]]


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    d = tmp_path_factory.mktemp("int4_llama")
    hf.save_pretrained(d)
    return str(d), hf


def _generate(llm, n=8):
    params = SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=PROMPTS,
                        sampling_params=params,
                        use_tqdm=False)
    return [o.outputs[0].token_ids for o in outs]


def test_int4_on_the_fly_generation(llama_dir):
    d, hf = llama_dir
    llm = LLM(model=d,
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=128,
              max_num_seqs=8,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01,
              quantization="int4")
    toks = _generate(llm)
    # INT4 on a *random-weight* tiny model is a stress test: logits are
    # near-uniform so token-level agreement is not guaranteed; assert the
    # engine runs and the first greedy tokens mostly track fp32.
    with torch.no_grad():
        for prompt, t in zip(PROMPTS, toks):
            assert len(t) == 8
            expected = hf.generate(torch.tensor([prompt]),
                                   max_new_tokens=1,
                                   do_sample=False)[0][-1].item()
            # First-token agreement: quantization error must not flip the
            # argmax on most prompts (checked jointly below).
    logits_ok = 0
    with torch.no_grad():
        for prompt, t in zip(PROMPTS, toks):
            expected = hf.generate(torch.tensor([prompt]),
                                   max_new_tokens=1,
                                   do_sample=False)[0][-1].item()
            logits_ok += int(t[0] == expected)
    assert logits_ok >= 1, (toks, "int4 flipped every first token")


def _fake_awq_checkpoint(hf, cfg, out_dir, group=32):
    """Quantize the HF llama into AutoAWQ checkpoint format."""
    import json
    import numpy as np
    from safetensors.torch import save_file
    from vllm_ltr_tpu.ops.quant_repack import AWQ_ORDER

    def pack_awq(vals):
        R, C = vals.shape
        v = vals.reshape(R, C // 8, 8)
        out = np.zeros((R, C // 8), dtype=np.uint32)
        for i in range(8):
            out |= (v[:, :, AWQ_ORDER[i]].astype(np.uint32) & 0xF) << (4 * i)
        return out.astype(np.int32)

    sd = hf.state_dict()
    new_sd = {}
    proj_names = [
        "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
        "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj"
    ]
    for key, val in sd.items():
        matched = None
        for pn in proj_names:
            if f".{pn}.weight" in key:
                matched = pn
                break
        if matched is None:
            new_sd[key] = val
            continue
        w = val.numpy().T.astype(np.float32)  # [K, N]
        K, N = w.shape
        g = group if K % group == 0 else K
        wg = w.reshape(K // g, g, N)
        wmin, wmax = wg.min(axis=1), wg.max(axis=1)
        scales = np.maximum((wmax - wmin) / 15.0, 1e-8)
        zeros = np.clip(np.round(-wmin / scales), 0, 15)
        q = np.clip(
            np.round(wg / scales[:, None, :]) + zeros[:, None, :], 0,
            15).astype(np.int32).reshape(K, N)
        base = key[:-len(".weight")]
        new_sd[base + ".qweight"] = torch.from_numpy(pack_awq(q))
        new_sd[base + ".qzeros"] = torch.from_numpy(
            pack_awq(zeros.astype(np.int32)))
        new_sd[base + ".scales"] = torch.from_numpy(
            scales.astype(np.float16))
    new_sd = {k: v.contiguous() for k, v in new_sd.items()}
    save_file(new_sd, str(out_dir / "model.safetensors"))
    config = json.loads(cfg.to_json_string())
    config["quantization_config"] = {
        "quant_method": "awq",
        "bits": 4,
        "group_size": group,
        "zero_point": True,
    }
    (out_dir / "config.json").write_text(json.dumps(config))


def test_awq_checkpoint_loading(llama_dir, tmp_path):
    d, hf = llama_dir
    cfg = get_hf_config("test-llama-tiny")
    awq_dir = tmp_path / "awq"
    awq_dir.mkdir()
    _fake_awq_checkpoint(hf, cfg, awq_dir, group=32)

    llm = LLM(model=str(awq_dir),
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=128,
              max_num_seqs=8,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01)
    toks = _generate(llm, n=4)
    for t in toks:
        assert len(t) == 4
    # The engine must have loaded quantized weights, not dense ones.
    from vllm_ltr_tpu.layers.quantization.int4 import QuantizedWeight
    assert isinstance(llm.llm_engine.model_executor.params["layers"]["q_w"],
                      QuantizedWeight)
