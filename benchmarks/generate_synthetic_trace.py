"""Generate a synthetic benchmark trace (hermetic counterpart of reference
``benchmarks/benchmark_generate_dataset.py``, which builds ShareGPT/LMSYS
traces with real generations).

Produces jsonl records {"prompt_token_ids": [...], "output_len": N} with a
ShareGPT-like output-length distribution (log-normal body + long tail), and
a marker token at position 0 correlated with the output length so a
predictor can actually learn to rank (position-0 task markers stand in for
the real traces' instruction prefixes).
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--num-prompts", type=int, default=2000)
    parser.add_argument("--vocab-size", type=int, default=8192)
    parser.add_argument("--prompt-len-mean", type=int, default=128)
    parser.add_argument("--max-prompt-len", type=int, default=1024)
    parser.add_argument("--output-len-scale", type=float, default=128.0)
    parser.add_argument("--max-output-len", type=int, default=2048)
    parser.add_argument("--num-markers", type=int, default=16,
                        help="distinct task-marker tokens (ids 2..)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = np.random.RandomState(args.seed)
    # Each marker maps to a length regime; lengths are log-normal within it.
    marker_scale = np.exp(
        rng.uniform(np.log(4), np.log(args.output_len_scale * 4),
                    size=args.num_markers))

    with open(args.output, "w") as f:
        for _ in range(args.num_prompts):
            marker = int(rng.randint(0, args.num_markers))
            out_len = int(
                np.clip(rng.lognormal(np.log(marker_scale[marker]), 0.4), 1,
                        args.max_output_len))
            plen = int(
                np.clip(rng.lognormal(np.log(args.prompt_len_mean), 0.6), 4,
                        args.max_prompt_len))
            ids = [2 + marker] + list(
                map(int,
                    rng.randint(2 + args.num_markers, args.vocab_size,
                                size=plen - 1)))
            f.write(
                json.dumps({
                    "prompt_token_ids": ids,
                    "output_len": out_len
                }) + "\n")
    print(f"wrote {args.num_prompts} prompts to {args.output}")


if __name__ == "__main__":
    main()
