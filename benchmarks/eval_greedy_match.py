"""Greedy-decode token parity: serving engine vs HF transformers.

VERDICT r2 item 3's second half: with a real (trained, non-random)
checkpoint, the serving stack (paged KV cache + Pallas/XLA attention +
device sampler) must reproduce HF's greedy continuations.  Run after
benchmarks/train_tiny_lm.py:

  python benchmarks/eval_greedy_match.py --model /tmp/tiny_lm \
      [--platform cpu] [--num-prompts 8] [--prompt-len 64] [--gen 32]

Prints one JSON line: {"match_rate": ..., "exact_seqs": ...}.  On a
trained model greedy argmaxes are decisive (unlike random weights, where
near-uniform logits flip on any numeric jitter), so match_rate is a real
correctness signal for the whole serving numerics path.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--num-prompts", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--gen", type=int, default=32)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--quantization", default=None,
                    help="Optionally serve quantized (int4/squeezellm) and "
                    "report drift vs the HF float baseline.")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    import torch
    from transformers import AutoModelForCausalLM

    # Prompts: held-out windows of the training chain when the checkpoint
    # carries a corpus recipe, else random tokens.
    corpus_path = os.path.join(args.model, "corpus.json")
    if os.path.exists(corpus_path):
        from train_tiny_lm import build_markov_corpus
        cfg = json.load(open(corpus_path))
        toks, _ = build_markov_corpus(cfg["vocab"], 500_000, cfg["seed"])
        prompts = [
            list(map(int, toks[430_000 + i * 2048:430_000 + i * 2048 +
                               args.prompt_len]))
            for i in range(args.num_prompts)
        ]
    else:
        rng = np.random.RandomState(args.seed)
        prompts = [
            list(map(int, rng.randint(1, 1000, size=args.prompt_len)))
            for _ in range(args.num_prompts)
        ]

    hf = AutoModelForCausalLM.from_pretrained(args.model).eval().float()
    hf_out = []
    with torch.no_grad():
        for p in prompts:
            ids = torch.tensor([p])
            gen = hf.generate(ids, max_new_tokens=args.gen, do_sample=False,
                              num_beams=1)
            hf_out.append(gen[0, len(p):].tolist())

    from vllm_ltr_tpu import LLM, SamplingParams
    llm = LLM(model=args.model,
              skip_tokenizer_init=True,
              dtype=args.dtype,
              quantization=args.quantization,
              max_model_len=args.prompt_len + args.gen + 16,
              max_num_seqs=args.num_prompts,
              num_gpu_blocks_override=args.num_prompts *
              ((args.prompt_len + args.gen) // 16 + 2),
              block_size=16,
              swap_space=0.05,
              disable_log_stats=True)
    outs = llm.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=args.gen,
                                       ignore_eos=True),
        use_tqdm=False)
    ours = [list(o.outputs[0].token_ids) for o in outs]

    total = match = exact = 0
    for a, b in zip(hf_out, ours):
        n = min(len(a), len(b))
        m = sum(int(x == y) for x, y in zip(a[:n], b[:n]))
        match += m
        total += n
        exact += int(m == n)
    print(json.dumps({
        "model": args.model,
        "quantization": args.quantization,
        "num_prompts": args.num_prompts,
        "gen_tokens": total,
        "match_rate": round(match / max(total, 1), 4),
        "exact_seqs": exact,
    }))


if __name__ == "__main__":
    main()
