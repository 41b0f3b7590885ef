"""Append PO (prompt-the-LLM-for-its-own-length) labels to a trace.

Behavioral counterpart of reference
``benchmarks/benchmark_append_dataset_PO.py`` (:36-47, :99-121): the PO
baseline asks the serving model itself to predict the length of its
response — an instruction is spliced into each prompt ("predict the number
of words in your response in the first line"), the model generates up to
100 tokens at temperature 1.0, and the first integer in the output becomes
the request's predicted length. The label is written back so
``benchmark_throughput.py --est-tokens-field po_est_tokens`` can replay the
trace with the PO policy.

Rows whose output contains no parseable integer keep the SamplingParams
default (est_tokens=16), matching the reference PO policy's "short
requests stay FCFS" behavior (reference vllm/core/scheduler.py:880-902).
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".."))

PO_PROMPT = ("\nBefore responding to the above instruction, you have to "
             "predict the length of your response. Print the estimated "
             "number of words in your response in the first line. Then "
             "change to a new line to respond to the instruction.")


def parse_predicted_words(text: str):
    m = re.search(r"\d+", text)
    return int(m.group()) if m else None


def main(args):
    from vllm_ltr_tpu import LLM, SamplingParams

    rows = []
    with open(args.dataset) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    prompts = []
    for row in rows:
        if "prompt" not in row:
            raise SystemExit(
                "PO labeling needs text prompts ('prompt' field): the "
                "length-prediction instruction is spliced into the text.")
        prompts.append(row["prompt"] + PO_PROMPT)

    llm = LLM(model=args.model,
              tokenizer=args.tokenizer,
              dtype=args.dtype,
              max_model_len=args.max_model_len,
              max_num_seqs=args.max_num_seqs,
              max_num_batched_tokens=args.max_num_batched_tokens,
              num_gpu_blocks_override=args.num_gpu_blocks_override,
              swap_space=args.swap_space,
              gpu_memory_utilization=args.gpu_memory_utilization)
    params = SamplingParams(temperature=1.0,
                            top_p=1.0,
                            ignore_eos=False,
                            max_tokens=args.max_tokens,
                            seed=args.seed)
    outputs = llm.generate(prompts, params, use_tqdm=True)

    n_labeled = 0
    with open(args.output, "w") as f:
        for row, out in zip(rows, outputs):
            words = parse_predicted_words(out.outputs[0].text)
            if words is not None:
                # Words -> tokens with the reference's implicit ~1 word/token
                # granularity; the PO policy only needs relative order.
                row["po_words"] = words
                row["po_est_tokens"] = max(int(words * args.tokens_per_word),
                                           1)
                n_labeled += 1
            f.write(json.dumps(row) + "\n")
    print(f"wrote {len(rows)} rows to {args.output}; "
          f"{n_labeled} carry PO labels "
          f"({len(rows) - n_labeled} unparseable -> default est_tokens)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Append PO length-prediction labels to a trace.")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--dataset", type=str, required=True,
                        help="jsonl trace from generate_dataset.py "
                        "(text prompts required)")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--max-tokens", type=int, default=100)
    parser.add_argument("--tokens-per-word", type=float, default=1.3)
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
