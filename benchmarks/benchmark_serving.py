"""Online serving benchmark with gamma arrivals.

Behavioral counterpart of reference ``benchmarks/benchmark_serving_real.py``:
replay a trace against an OpenAI-compatible server with gamma inter-arrival
times (rate, cv — reference :159-178), recording TTFT/TPOT mean/median/p99
and request latency + per-output-token-normalized latency percentiles
p50/p80/p90/p95/p99 (:181-239,360-401), dumping raw arrays to JSON.

Traces are jsonl with either {"prompt": ..., "output_len": N} or
{"prompt_token_ids": [...], "output_len": N} records (build with
generate_synthetic_trace.py in hermetic environments).
"""
from __future__ import annotations

import argparse
import asyncio
import json
import random
import time
from dataclasses import dataclass, field
from typing import AsyncGenerator, List, Optional, Tuple

import numpy as np

from backend_request_func import (ASYNC_REQUEST_FUNCS, RequestFuncInput,
                                  RequestFuncOutput)


@dataclass
class BenchmarkMetrics:
    completed: int
    total_input: int
    total_output: int
    request_throughput: float
    input_throughput: float
    output_throughput: float
    mean_ttft_ms: float
    median_ttft_ms: float
    p99_ttft_ms: float
    mean_tpot_ms: float
    median_tpot_ms: float
    p99_tpot_ms: float
    latency_percentiles: dict = field(default_factory=dict)
    norm_latency_percentiles: dict = field(default_factory=dict)


def load_trace(path: str, num_prompts: int,
               seed: int) -> List[Tuple[object, int, int]]:
    """Returns [(prompt_or_token_ids, prompt_len, output_len)]."""
    entries = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            obj = json.loads(line)
            if "prompt_token_ids" in obj:
                prompt = obj["prompt_token_ids"]
                plen = len(prompt)
            else:
                prompt = obj["prompt"]
                plen = obj.get("prompt_len", len(prompt.split()))
            entries.append((prompt, plen, int(obj["output_len"])))
    random.Random(seed).shuffle(entries)
    return entries[:num_prompts]


async def get_request(
    input_requests: List[Tuple[object, int, int]],
    request_rate: float,
    cv: float = 1.0,
) -> AsyncGenerator[Tuple[object, int, int], None]:
    """Gamma-distributed inter-arrival times with mean 1/rate and the given
    coefficient of variation (reference :159-178). rate=inf => burst."""
    input_requests = iter(input_requests)
    for request in input_requests:
        yield request
        if request_rate == float("inf"):
            continue
        shape = 1.0 / (cv * cv)
        scale = cv * cv / request_rate
        interval = np.random.gamma(shape, scale)
        await asyncio.sleep(interval)


def percentile_dict(values: List[float]) -> dict:
    if not values:
        return {}
    return {
        f"p{p}": float(np.percentile(values, p))
        for p in (50, 80, 90, 95, 99)
    }


def calculate_metrics(
    input_requests: List[Tuple[object, int, int]],
    outputs: List[RequestFuncOutput],
    dur_s: float,
) -> BenchmarkMetrics:
    total_output = 0
    total_input = 0
    completed = 0
    tpots: List[float] = []
    ttfts: List[float] = []
    latencies: List[float] = []
    norm_latencies: List[float] = []
    for i, output in enumerate(outputs):
        if output.success:
            output_len = output.output_len
            total_output += output_len
            total_input += input_requests[i][1]
            if output_len > 1:
                tpots.append(
                    (output.latency - output.ttft) / (output_len - 1))
            ttfts.append(output.ttft)
            latencies.append(output.latency)
            norm_latencies.append(output.latency / max(output_len, 1))
            completed += 1

    return BenchmarkMetrics(
        completed=completed,
        total_input=total_input,
        total_output=total_output,
        request_throughput=completed / dur_s,
        input_throughput=total_input / dur_s,
        output_throughput=total_output / dur_s,
        mean_ttft_ms=float(np.mean(ttfts or [0]) * 1000),
        median_ttft_ms=float(np.median(ttfts or [0]) * 1000),
        p99_ttft_ms=float(np.percentile(ttfts or [0], 99) * 1000),
        mean_tpot_ms=float(np.mean(tpots or [0]) * 1000),
        median_tpot_ms=float(np.median(tpots or [0]) * 1000),
        p99_tpot_ms=float(np.percentile(tpots or [0], 99) * 1000),
        latency_percentiles=percentile_dict(latencies),
        norm_latency_percentiles=percentile_dict(norm_latencies),
    )


async def benchmark(api_url: str, model: str,
                    input_requests: List[Tuple[object, int, int]],
                    request_rate: float, cv: float,
                    backend: str = "openai") -> dict:
    import aiohttp
    request_func = ASYNC_REQUEST_FUNCS[backend]
    benchmark_start_time = time.perf_counter()
    tasks = []
    async with aiohttp.ClientSession() as session:
        async for request in get_request(input_requests, request_rate, cv):
            prompt, prompt_len, output_len = request
            request_func_input = RequestFuncInput(
                model=model,
                prompt=prompt,
                api_url=api_url,
                prompt_len=prompt_len,
                output_len=output_len,
                est_tokens=output_len,
            )
            tasks.append(
                asyncio.create_task(
                    request_func(request_func_input, session)))
        outputs: List[RequestFuncOutput] = await asyncio.gather(*tasks)
    benchmark_duration = time.perf_counter() - benchmark_start_time

    metrics = calculate_metrics(input_requests, outputs,
                                benchmark_duration)
    print("{s:{c}^{n}}".format(s=" Serving Benchmark Result ", n=50, c="="))
    print("{:<40} {:<10}".format("Successful requests:", metrics.completed))
    print("{:<40} {:<10.2f}".format("Benchmark duration (s):",
                                    benchmark_duration))
    print("{:<40} {:<10}".format("Total input tokens:", metrics.total_input))
    print("{:<40} {:<10}".format("Total generated tokens:",
                                 metrics.total_output))
    print("{:<40} {:<10.2f}".format("Request throughput (req/s):",
                                    metrics.request_throughput))
    print("{:<40} {:<10.2f}".format("Output token throughput (tok/s):",
                                    metrics.output_throughput))
    print("{:<40} {:<10.2f}".format("Mean TTFT (ms):", metrics.mean_ttft_ms))
    print("{:<40} {:<10.2f}".format("Median TTFT (ms):",
                                    metrics.median_ttft_ms))
    print("{:<40} {:<10.2f}".format("P99 TTFT (ms):", metrics.p99_ttft_ms))
    print("{:<40} {:<10.2f}".format("Mean TPOT (ms):", metrics.mean_tpot_ms))
    print("{:<40} {:<10.2f}".format("Median TPOT (ms):",
                                    metrics.median_tpot_ms))
    print("{:<40} {:<10.2f}".format("P99 TPOT (ms):", metrics.p99_tpot_ms))
    for name, d in (("latency", metrics.latency_percentiles),
                    ("norm_latency", metrics.norm_latency_percentiles)):
        for k, v in d.items():
            print("{:<40} {:<10.4f}".format(f"{name} {k} (s):", v))
    print("=" * 50)

    return {
        "duration": benchmark_duration,
        "completed": metrics.completed,
        "total_input_tokens": metrics.total_input,
        "total_output_tokens": metrics.total_output,
        "request_throughput": metrics.request_throughput,
        "output_throughput": metrics.output_throughput,
        "mean_ttft_ms": metrics.mean_ttft_ms,
        "median_ttft_ms": metrics.median_ttft_ms,
        "p99_ttft_ms": metrics.p99_ttft_ms,
        "mean_tpot_ms": metrics.mean_tpot_ms,
        "median_tpot_ms": metrics.median_tpot_ms,
        "p99_tpot_ms": metrics.p99_tpot_ms,
        "latency_percentiles": metrics.latency_percentiles,
        "norm_latency_percentiles": metrics.norm_latency_percentiles,
        "ttfts": [o.ttft for o in outputs],
        "latencies": [o.latency for o in outputs],
        "output_lens": [o.output_len for o in outputs],
        "errors": [o.error for o in outputs if not o.success],
    }


def main(args: argparse.Namespace):
    random.seed(args.seed)
    np.random.seed(args.seed)

    api_url = f"http://{args.host}:{args.port}{args.endpoint}"
    input_requests = load_trace(args.dataset, args.num_prompts, args.seed)

    result = asyncio.run(
        benchmark(api_url, args.model, input_requests, args.request_rate,
                  args.cv, args.backend))

    if args.save_result:
        result["args"] = vars(args)
        with open(args.save_result, "w") as f:
            json.dump(result, f, indent=2)
        print(f"saved results to {args.save_result}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Benchmark online serving latency/throughput.")
    parser.add_argument("--backend", type=str, default="openai",
                        choices=list(ASYNC_REQUEST_FUNCS.keys()))
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--endpoint", type=str, default="/v1/completions")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True,
                        help="jsonl trace path")
    parser.add_argument("--num-prompts", type=int, default=1000)
    parser.add_argument("--request-rate", type=float, default=float("inf"),
                        help="req/s (inf = burst)")
    parser.add_argument("--cv", type=float, default=1.0,
                        help="coefficient of variation of arrivals")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--save-result", type=str, default=None)
    main(parser.parse_args())
