"""Build a real-generation trace by running the serving model.

Behavioral counterpart of reference
``benchmarks/benchmark_generate_dataset.py`` (:17-126): sample prompts from
a chat dataset, run the model with free-running sampling (ignore_eos=False),
and record each prompt together with its real generation length. The output
trace is consumed by
  * the predictor trainer (rows carry ``prompt_token_ids`` +
    ``generation_len``), and
  * ``benchmark_throughput.py`` (rows carry ``output_len``).

Differences from the reference: prompts come from a local jsonl/json file
(or a synthetic generator) instead of HF-hub downloads, and chat formatting
uses the tokenizer's own chat template instead of fastchat.
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".."))


def load_prompts(args, tokenizer):
    """Returns a list of text prompts or token-id prompts."""
    if args.dataset is None:
        rng = random.Random(args.seed)
        return [[rng.randint(1, 8000) for _ in range(args.input_len)]
                for _ in range(args.num_prompts)]
    prompts = []
    with open(args.dataset) as f:
        if args.dataset.endswith(".json"):
            rows = json.load(f)
        else:
            rows = [json.loads(l) for l in f if l.strip()]
    for row in rows:
        if "prompt_token_ids" in row:
            prompts.append(row["prompt_token_ids"])
            continue
        text = row.get("prompt")
        if text is None:
            # ShareGPT-style conversations: first human turn.
            convs = row.get("conversations", [])
            for turn in convs:
                if turn.get("from") in ("human", "user") or \
                        turn.get("role") == "user":
                    text = turn.get("value", turn.get("content"))
                    break
        if text is None:
            continue
        if args.apply_chat_template and tokenizer is not None and \
                getattr(tokenizer, "chat_template", None):
            text = tokenizer.apply_chat_template(
                [{"role": "user", "content": text}],
                tokenize=False,
                add_generation_prompt=True)
        prompts.append(text)
    if args.shuffle_dataset:
        random.Random(args.seed).shuffle(prompts)
    # Prune prompts outside the reference's length window (:112-118).
    if tokenizer is not None:
        kept = []
        for p in prompts:
            n = len(p) if isinstance(p, list) else len(tokenizer(p).input_ids)
            if args.min_prompt_len <= n <= args.max_prompt_len:
                kept.append(p)
        prompts = kept
    return prompts[:args.num_prompts]


def main(args):
    from vllm_ltr_tpu import LLM, SamplingParams

    llm = LLM(model=args.model,
              tokenizer=args.tokenizer,
              dtype=args.dtype,
              max_model_len=args.max_model_len,
              max_num_seqs=args.max_num_seqs,
              max_num_batched_tokens=args.max_num_batched_tokens,
              num_gpu_blocks_override=args.num_gpu_blocks_override,
              swap_space=args.swap_space,
              skip_tokenizer_init=args.dataset is None,
              gpu_memory_utilization=args.gpu_memory_utilization)
    tokenizer = llm.get_tokenizer()
    prompts = load_prompts(args, tokenizer)
    if not prompts:
        raise SystemExit("no prompts after filtering")

    params = SamplingParams(temperature=args.temperature,
                            top_p=args.top_p,
                            ignore_eos=False,
                            max_tokens=args.max_output_len,
                            seed=args.seed)
    if isinstance(prompts[0], list):
        outputs = llm.generate(prompt_token_ids=prompts,
                               sampling_params=params,
                               use_tqdm=True)
    else:
        outputs = llm.generate(prompts, params, use_tqdm=True)

    with open(args.output, "w") as f:
        for out in outputs:
            gen_len = len(out.outputs[0].token_ids)
            row = {
                "prompt_token_ids": list(out.prompt_token_ids),
                "generated": out.outputs[0].text,
                "generation_len": gen_len,
                "output_len": gen_len,
            }
            if out.prompt is not None:
                row["prompt"] = out.prompt
            f.write(json.dumps(row) + "\n")
    lens = sorted(len(o.outputs[0].token_ids) for o in outputs)
    print(f"wrote {len(outputs)} rows to {args.output}; "
          f"generation_len min/median/max = "
          f"{lens[0]}/{lens[len(lens) // 2]}/{lens[-1]}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Generate a real-generation trace for predictor "
        "training and benchmarking.")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--dataset", type=str, default=None,
                        help="jsonl/json with 'prompt', 'prompt_token_ids' "
                        "or ShareGPT 'conversations' rows; omitted => "
                        "synthetic token prompts")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--num-prompts", type=int, default=256)
    parser.add_argument("--input-len", type=int, default=64,
                        help="synthetic prompt length (no --dataset)")
    parser.add_argument("--min-prompt-len", type=int, default=4)
    parser.add_argument("--max-prompt-len", type=int, default=1024)
    parser.add_argument("--max-output-len", type=int, default=512)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--top-p", type=float, default=1.0)
    parser.add_argument("--apply-chat-template", action="store_true")
    parser.add_argument("--shuffle-dataset", action="store_true")
    parser.add_argument("--dtype", type=str, default="auto")
    parser.add_argument("--max-model-len", type=int, default=None)
    parser.add_argument("--max-num-seqs", type=int, default=64)
    parser.add_argument("--max-num-batched-tokens", type=int, default=None)
    parser.add_argument("--num-gpu-blocks-override", type=int, default=None)
    parser.add_argument("--swap-space", type=float, default=1.0)
    parser.add_argument("--gpu-memory-utilization", type=float, default=0.9)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    main(args)
