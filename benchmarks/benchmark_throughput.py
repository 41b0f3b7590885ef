"""Offline burst benchmark.

Behavioral counterpart of reference
``benchmarks/benchmark_throughput_original.py``: submit all prompts at once
through the offline LLM API, report throughput, latency / per-output-token-
normalized-latency percentiles, swap counters, and the Kendall tau of finish
order vs output length (:428-442) — the signature of SJF-like scheduling.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import random
import time
from typing import List, Optional, Tuple

import numpy as np


def load_trace(path: str, num_prompts: int, seed: int,
               est_tokens_field: Optional[str] = None):
    entries = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            obj = json.loads(line)
            prompt = obj.get("prompt_token_ids", obj.get("prompt"))
            est = obj.get(est_tokens_field) if est_tokens_field else None
            entries.append((prompt, int(obj["output_len"]), est))
    random.Random(seed).shuffle(entries)
    return entries[:num_prompts]


def run_benchmark(llm, requests, use_est_tokens: bool):
    from vllm_ltr_tpu import SamplingParams
    prompts, sampling_params = [], []
    for prompt, output_len, est in requests:
        prompts.append(prompt)
        if use_est_tokens:
            est = output_len  # oracle
        sampling_params.append(
            SamplingParams(
                n=1,
                temperature=0.0,
                ignore_eos=True,
                max_tokens=output_len,
                est_tokens=int(est) if est is not None else 16,
            ))
    start = time.perf_counter()
    if isinstance(prompts[0], str):
        outputs = llm.generate(prompts, sampling_params, use_tqdm=True)
    else:
        outputs = llm.generate(prompt_token_ids=prompts,
                               sampling_params=sampling_params,
                               use_tqdm=True)
    elapsed = time.perf_counter() - start
    return outputs, elapsed


def report(requests, outputs, elapsed: float) -> dict:
    total_prompt = sum(
        len(o.prompt_token_ids) for o in outputs)
    total_gen = sum(len(o.outputs[0].token_ids) for o in outputs)

    latencies = [o.latency for o in outputs]
    norm_latencies = [
        o.latency / max(len(o.outputs[0].token_ids), 1) for o in outputs
    ]
    swap_outs = sum(o.swap_out for o in outputs)
    swap_blocks = sum(o.swap_blocks for o in outputs)

    # Finish order vs output length: SJF-like scheduling gives high tau
    # (reference :428-433).
    order = np.argsort([o.latency for o in outputs])
    finish_rank = np.empty(len(outputs), dtype=int)
    finish_rank[order] = np.arange(len(outputs))
    lens = [len(o.outputs[0].token_ids) for o in outputs]
    from scipy.stats import kendalltau
    tau, _ = kendalltau(finish_rank, lens)

    result = {
        "requests": len(outputs),
        "elapsed_s": elapsed,
        "requests_per_s": len(outputs) / elapsed,
        "total_tokens_per_s": (total_prompt + total_gen) / elapsed,
        "output_tokens_per_s": total_gen / elapsed,
        "finish_order_kendall_tau": float(tau) if tau == tau else 0.0,
        "swap_out_count": swap_outs,
        "swap_block_count": swap_blocks,
        "latency_percentiles": {
            f"p{p}": float(np.percentile(latencies, p))
            for p in (50, 80, 90, 95, 99)
        },
        "norm_latency_percentiles": {
            f"p{p}": float(np.percentile(norm_latencies, p))
            for p in (50, 80, 90, 95, 99)
        },
    }
    for k, v in result.items():
        print(f"{k}: {v}")
    return result


def main(args):
    from vllm_ltr_tpu import LLM

    requests = load_trace(args.dataset, args.num_prompts, args.seed,
                          args.est_tokens_field)
    prompt_is_tokens = not isinstance(requests[0][0], str)

    llm = LLM(
        model=args.model,
        tokenizer=args.tokenizer,
        skip_tokenizer_init=prompt_is_tokens,
        dtype=args.dtype,
        max_model_len=args.max_model_len,
        max_num_seqs=args.max_num_seqs,
        max_num_batched_tokens=args.max_num_batched_tokens,
        num_gpu_blocks_override=args.num_gpu_blocks_override,
        swap_space=args.swap_space,
        schedule_type=args.schedule_type,
        enable_starvation_prevent=args.enable_starvation_prevent,
        prefill_predictor_model_config=args.prefill_predictor_model_config,
        gpu_memory_utilization=args.gpu_memory_utilization,
        decode_steps_per_dispatch=args.decode_steps_per_dispatch,
    )
    outputs, elapsed = run_benchmark(llm, requests,
                                     args.use_oracle_est_tokens)
    result = report(requests, outputs, elapsed)
    stats = getattr(llm.llm_engine.model_executor, "dispatch_stats", None)
    if stats:
        stats = {k: round(v, 3) if isinstance(v, float) else v
                 for k, v in stats.items()}
        print(f"dispatch_stats: {stats}")
        result["dispatch_stats"] = stats
    step_times = getattr(llm.llm_engine, "step_times", None)
    if step_times:
        step_times = {k: round(v, 3) if isinstance(v, float) else v
                      for k, v in step_times.items()}
        print(f"step_times: {step_times}")
        result["step_times"] = step_times
    if args.save_result:
        result["args"] = {
            k: v
            for k, v in vars(args).items() if v is not None
        }
        with open(args.save_result, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Offline burst benchmark.")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--num-prompts", type=int, default=1000)
    parser.add_argument("--dtype", type=str, default="auto")
    parser.add_argument("--max-model-len", type=int, default=None)
    parser.add_argument("--max-num-seqs", type=int, default=256)
    parser.add_argument("--max-num-batched-tokens", type=int, default=None)
    parser.add_argument("--num-gpu-blocks-override", type=int, default=None)
    parser.add_argument("--swap-space", type=float, default=4.0)
    parser.add_argument("--gpu-memory-utilization", type=float, default=0.9)
    parser.add_argument("--schedule-type", type=str, default="fcfs")
    parser.add_argument("--enable-starvation-prevent", action="store_true")
    parser.add_argument("--prefill-predictor-model-config", type=str,
                        default=None)
    parser.add_argument("--use-oracle-est-tokens", action="store_true",
                        help="feed true output lengths as est_tokens "
                        "(the PO/sjf oracle baselines)")
    parser.add_argument("--est-tokens-field", type=str, default=None,
                        help="read est_tokens from this trace field (e.g. "
                        "po_est_tokens from append_dataset_po.py)")
    parser.add_argument("--decode-steps-per-dispatch", type=int, default=1,
                        help="fused decode iterations per host dispatch")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--save-result", type=str, default=None)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    main(args)
