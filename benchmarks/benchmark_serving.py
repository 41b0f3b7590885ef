"""Online serving benchmark: trace replay with gamma arrivals.

Behavioral counterpart of reference benchmarks/benchmark_serving_real.py:
replay a jsonl trace against an OpenAI-compatible server with
gamma-distributed inter-arrival times (rate, cv — reference :159-178),
reporting TTFT/TPOT mean/median/p99 plus request-latency and
per-output-token-normalized-latency percentiles p50..p99 (:181-239,
360-401), and dumping the raw per-request arrays to JSON.

Trace rows: {"prompt": ...} or {"prompt_token_ids": [...]}, each with
"output_len" (build hermetic traces with generate_synthetic_trace.py).
"""
from __future__ import annotations

import argparse
import asyncio
import json
import random
import time
from dataclasses import dataclass
from typing import List, Optional, Union

import numpy as np

from backend_request_func import (ASYNC_REQUEST_FUNCS, RequestFuncInput,
                                  RequestFuncOutput)

PCTS = (50, 80, 90, 95, 99)


@dataclass
class TraceEntry:
    prompt: Union[str, List[int]]
    prompt_len: int
    output_len: int


def load_trace(path: str, num_prompts: int, seed: int) -> List[TraceEntry]:
    rows: List[TraceEntry] = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            if "prompt_token_ids" in rec:
                prompt = rec["prompt_token_ids"]
                plen = len(prompt)
            else:
                prompt = rec["prompt"]
                plen = rec.get("prompt_len", len(prompt.split()))
            rows.append(TraceEntry(prompt, plen, int(rec["output_len"])))
    random.Random(seed).shuffle(rows)
    return rows[:num_prompts]


def arrival_gaps(n: int, rate: float, cv: float) -> List[float]:
    """n-1 inter-arrival gaps: gamma with mean 1/rate and the given
    coefficient of variation; rate=inf means a single burst."""
    if rate == float("inf"):
        return [0.0] * max(n - 1, 0)
    shape = 1.0 / (cv * cv)
    scale = cv * cv / rate
    return list(np.random.gamma(shape, scale, size=max(n - 1, 0)))


def _pcts(values: List[float]) -> dict:
    if not values:
        return {}
    return {f"p{p}": float(np.percentile(values, p)) for p in PCTS}


def _stats_ms(values: List[float]) -> dict:
    v = values or [0.0]
    return {
        "mean": float(np.mean(v)) * 1000,
        "median": float(np.median(v)) * 1000,
        "p99": float(np.percentile(v, 99)) * 1000,
    }


def summarize(entries: List[TraceEntry], outputs: List[RequestFuncOutput],
              elapsed: float) -> dict:
    ok = [(e, o) for e, o in zip(entries, outputs) if o.success]
    in_tokens = sum(e.prompt_len for e, _ in ok)
    out_tokens = sum(o.new_tokens for _, o in ok)
    ttfts = [o.ttft for _, o in ok]
    lats = [o.latency for _, o in ok]
    norm_lats = [o.latency / max(o.new_tokens, 1) for _, o in ok]
    # Per-output-token time excludes the first token (that's TTFT).
    tpots = [(o.latency - o.ttft) / (o.new_tokens - 1) for _, o in ok
             if o.new_tokens > 1]

    ttft = _stats_ms(ttfts)
    tpot = _stats_ms(tpots)
    # Fairness metric (reference --eval-max-tpot, fair-*.sh drivers;
    # benchmark_serving_real.py:438-451): each request's WORST token gap
    # — max(TTFT, max inter-token latency) — exposes scheduling stalls
    # (preemption, starvation) that mean/median TPOT averages away.
    # Gaps are measured between SSE frames: at decode_steps_per_dispatch
    # K=1 (the reference's setting) a frame is one token and this IS
    # max TPOT; at K>1 a frame carries up to K tokens and gaps scale
    # with K — compare runs only at equal K (run_online_ab.py holds K
    # fixed across schedules).
    max_tpots = [
        max([o.ttft] + o.itl) for _, o in ok if o.new_tokens > 0
    ]
    return {
        "duration": elapsed,
        "completed": len(ok),
        "total_input_tokens": in_tokens,
        "total_output_tokens": out_tokens,
        "request_throughput": len(ok) / elapsed,
        "output_throughput": out_tokens / elapsed,
        "mean_ttft_ms": ttft["mean"],
        "median_ttft_ms": ttft["median"],
        "p99_ttft_ms": ttft["p99"],
        "mean_tpot_ms": tpot["mean"],
        "median_tpot_ms": tpot["median"],
        "p99_tpot_ms": tpot["p99"],
        "latency_percentiles": _pcts(lats),
        "norm_latency_percentiles": _pcts(norm_lats),
        "mean_max_tpot_ms": float(np.mean(max_tpots or [0.0])) * 1000,
        "max_tpot_percentiles": _pcts(max_tpots),
    }


async def benchmark(api_url: str, model: str, entries: List[TraceEntry],
                    request_rate: float, cv: float,
                    backend: str = "openai") -> dict:
    import aiohttp

    from backend_request_func import _NO_TIMEOUT
    send = ASYNC_REQUEST_FUNCS[backend]
    gaps = arrival_gaps(len(entries), request_rate, cv)

    t0 = time.perf_counter()
    # aiohttp's default ClientTimeout(total=300) silently failed every
    # request of the round-3 opt warm pass while the server compiled its
    # first aux-score shapes; benchmarks must never time out client-side.
    async with aiohttp.ClientSession(timeout=_NO_TIMEOUT) as session:
        inflight = []
        for i, entry in enumerate(entries):
            spec = RequestFuncInput(
                model=model,
                prompt=entry.prompt,
                endpoint=api_url,
                prompt_tokens=entry.prompt_len,
                max_new_tokens=entry.output_len,
                est_tokens=entry.output_len,
            )
            inflight.append(asyncio.create_task(send(spec, session)))
            if i < len(gaps) and gaps[i] > 0:
                await asyncio.sleep(gaps[i])
        outputs: List[RequestFuncOutput] = await asyncio.gather(*inflight)
    elapsed = time.perf_counter() - t0

    report = summarize(entries, outputs, elapsed)
    _print_report(report)
    report.update({
        "ttfts": [o.ttft for o in outputs],
        "latencies": [o.latency for o in outputs],
        "output_lens": [o.new_tokens for o in outputs],
        "errors": [o.error for o in outputs if not o.success],
    })
    return report


def _print_report(r: dict) -> None:
    rows = [
        ("Successful requests:", f"{r['completed']}"),
        ("Benchmark duration (s):", f"{r['duration']:.2f}"),
        ("Total input tokens:", f"{r['total_input_tokens']}"),
        ("Total generated tokens:", f"{r['total_output_tokens']}"),
        ("Request throughput (req/s):", f"{r['request_throughput']:.2f}"),
        ("Output token throughput (tok/s):", f"{r['output_throughput']:.2f}"),
        ("Mean TTFT (ms):", f"{r['mean_ttft_ms']:.2f}"),
        ("Median TTFT (ms):", f"{r['median_ttft_ms']:.2f}"),
        ("P99 TTFT (ms):", f"{r['p99_ttft_ms']:.2f}"),
        ("Mean TPOT (ms):", f"{r['mean_tpot_ms']:.2f}"),
        ("Median TPOT (ms):", f"{r['median_tpot_ms']:.2f}"),
        ("P99 TPOT (ms):", f"{r['p99_tpot_ms']:.2f}"),
    ]
    rows.append(("Mean MAX-TPOT (ms):", f"{r['mean_max_tpot_ms']:.2f}"))
    for family in ("latency_percentiles", "norm_latency_percentiles",
                   "max_tpot_percentiles"):
        label = family.replace("_percentiles", "")
        for key, val in r[family].items():
            rows.append((f"{label} {key} (s):", f"{val:.4f}"))
    print(" Serving Benchmark Result ".center(50, "="))
    for name, val in rows:
        print(f"{name:<40} {val:<10}")
    print("=" * 50)


def main(args: argparse.Namespace):
    random.seed(args.seed)
    np.random.seed(args.seed)

    api_url = f"http://{args.host}:{args.port}{args.endpoint}"
    entries = load_trace(args.dataset, args.num_prompts, args.seed)

    report = asyncio.run(
        benchmark(api_url, args.model, entries, args.request_rate, args.cv,
                  args.backend))

    if args.save_result:
        report["args"] = vars(args)

        def _finite(o):
            import math
            if isinstance(o, float):
                return o if math.isfinite(o) else None
            if isinstance(o, dict):
                return {k: _finite(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return [_finite(v) for v in o]
            return o

        with open(args.save_result, "w") as f:
            # Strict JSON: bare Infinity/NaN breaks non-Python readers.
            json.dump(_finite(report), f, indent=2, allow_nan=False)
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
