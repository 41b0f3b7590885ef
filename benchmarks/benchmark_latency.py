"""Benchmark the latency of processing a single batch of requests.

Behavioral counterpart of reference ``benchmarks/benchmark_latency.py``
(:21-120): one fixed batch of dummy token prompts, run to completion
``--num-iters`` times after warmup, report mean latency and percentiles.
Instead of the torch/CUDA profiler, ``--profile`` dumps a JAX device
profile (viewable in TensorBoard / xprof) for the first timed iteration.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".."))

import numpy as np


def main(args):
    from vllm_ltr_tpu import LLM, SamplingParams

    llm = LLM(model=args.model,
              tokenizer=args.tokenizer,
              skip_tokenizer_init=True,
              dtype=args.dtype,
              max_model_len=args.max_model_len,
              max_num_seqs=args.batch_size,
              max_num_batched_tokens=args.max_num_batched_tokens,
              num_gpu_blocks_override=args.num_gpu_blocks_override,
              block_size=args.block_size,
              swap_space=args.swap_space,
              kv_cache_dtype=args.kv_cache_dtype,
              gpu_memory_utilization=args.gpu_memory_utilization)

    params = SamplingParams(n=args.n,
                            temperature=0.0,
                            ignore_eos=True,
                            max_tokens=args.output_len)
    rng = np.random.RandomState(args.seed)
    prompts = rng.randint(1, 8000,
                          size=(args.batch_size, args.input_len)).tolist()

    def run_to_completion():
        t0 = time.perf_counter()
        llm.generate(prompt_token_ids=prompts,
                     sampling_params=params,
                     use_tqdm=False)
        return time.perf_counter() - t0

    for _ in range(args.num_iters_warmup):
        run_to_completion()

    latencies = []
    for i in range(args.num_iters):
        if args.profile and i == 0:
            import jax
            with jax.profiler.trace(args.profile):
                latencies.append(run_to_completion())
            print(f"profile written to {args.profile}")
        else:
            latencies.append(run_to_completion())
    latencies = np.array(latencies)

    result = {
        "batch_size": args.batch_size,
        "input_len": args.input_len,
        "output_len": args.output_len,
        "avg_latency_s": float(latencies.mean()),
        "latency_percentiles": {
            f"p{p}": float(np.percentile(latencies, p))
            for p in (10, 25, 50, 75, 90, 99)
        },
    }
    for k, v in result.items():
        print(f"{k}: {v}")
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Latency of one batch run to completion.")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--input-len", type=int, default=32)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--n", type=int, default=1)
    parser.add_argument("--num-iters-warmup", type=int, default=2)
    parser.add_argument("--num-iters", type=int, default=5)
    parser.add_argument("--dtype", type=str, default="auto")
    parser.add_argument("--kv-cache-dtype", type=str, default="auto")
    parser.add_argument("--block-size", type=int, default=16)
    parser.add_argument("--max-model-len", type=int, default=None)
    parser.add_argument("--max-num-batched-tokens", type=int, default=None)
    parser.add_argument("--num-gpu-blocks-override", type=int, default=None)
    parser.add_argument("--swap-space", type=float, default=1.0)
    parser.add_argument("--gpu-memory-utilization", type=float, default=0.9)
    parser.add_argument("--profile", type=str, default=None,
                        help="directory for a JAX profiler trace of the "
                        "first timed iteration")
    parser.add_argument("--output-json", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    main(args)
