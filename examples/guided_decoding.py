"""Guided decoding demo: constrain generation to a choice list, a regex,
or a JSON schema — no outlines dependency, the constraint compiles to a
token-level FSM whose packed mask runs inside the jitted sampler.

Self-contained: trains a tiny char-level BPE tokenizer and pairs it with
a random-weight model, so the *structure* of the output is entirely the
guide's doing.

    python examples/guided_decoding.py --platform cpu
    python examples/guided_decoding.py --model /path/to/hf_checkpoint
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build_demo_model(tmpdir: str) -> str:
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import LlamaForCausalLM, PreTrainedTokenizerFast
    from vllm_ltr_tpu.transformers_utils.config import get_hf_config

    corpus = [
        '{"name":"fox","age":42,"ok":true}',
        "yes no maybe 0123456789",
        "the quick brown fox jumps over the lazy dog",
        'null true false [1,2,3] {"a":"b"}',
    ] * 50
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    tok.train_from_iterator(
        corpus,
        trainers.BpeTrainer(vocab_size=480,
                            special_tokens=["<unk>", "<s>", "</s>"]))
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                                   bos_token="<s>", eos_token="</s>")
    fast.save_pretrained(tmpdir)
    torch.manual_seed(0)
    LlamaForCausalLM(
        get_hf_config("test-llama-tiny")).eval().float().save_pretrained(
            tmpdir)
    return tmpdir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--model", default=None,
                    help="HF checkpoint dir with a tokenizer; defaults to "
                    "a self-built tiny random model")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from vllm_ltr_tpu import LLM, SamplingParams

    with tempfile.TemporaryDirectory() as td:
        model = args.model or build_demo_model(td)
        llm = LLM(model=model, dtype="float32", max_model_len=128,
                  max_num_seqs=4, num_gpu_blocks_override=64, block_size=16,
                  swap_space=0.01)

        demos = [
            ("guided_choice",
             SamplingParams(temperature=1.0, seed=0, max_tokens=16,
                            guided_choice=["yes", "no", "maybe"])),
            ("guided_regex",
             SamplingParams(temperature=1.0, seed=1, max_tokens=24,
                            guided_regex=r"[1-9][0-9]{0,2} (fox|dog)")),
            ("guided_json",
             SamplingParams(
                 temperature=1.0, seed=2, max_tokens=80,
                 guided_json={
                     "type": "object",
                     "properties": {
                         "name": {"type": "string", "maxLength": 3},
                         "age": {"type": "integer"},
                         "ok": {"type": "boolean"},
                     },
                 })),
        ]
        from vllm_ltr_tpu.guided.manager import token_strings
        strings = token_strings(llm.get_tokenizer())
        for label, params in demos:
            out = llm.generate(["the answer is"], params, use_tqdm=False)[0]
            text = "".join(strings[t] for t in out.outputs[0].token_ids)
            print(f"{label:14} -> {text!r}")
            if label == "guided_json":
                print(" " * 17 + f"json.loads -> {json.loads(text)}")


if __name__ == "__main__":
    main()
