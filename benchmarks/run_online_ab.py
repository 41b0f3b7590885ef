"""Online ranked-vs-FCFS A/B driver (VERDICT r2 item 4).

Counterpart of the reference's benchmarks/bench.sh operating points: for
each schedule type, start the OpenAI server on the real chip, replay the
same gamma-arrival trace at each request rate with
benchmarks/benchmark_serving.py, and collect client-side TTFT/TPOT and
latency/norm-latency percentiles plus the server's own /metrics
histograms.  The first pass per server primes jit caches and is
discarded (remote-relay compiles would otherwise bury the scheduling
signal — docs/BENCHMARKS.md round-2 methodology note).

Usage:
  python benchmarks/run_online_ab.py --model test-llama-1b \
      --trace /tmp/ltr_trace.jsonl --rates 4 8 \
      --schedules fcfs opt --predictor .artifacts/trace_pred/usage_config.json \
      --num-prompts 192 --out /tmp/online_ab.json

Prints one JSON line per (schedule, rate) and a final summary table.
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_health(port: int, timeout_s: float) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            with urllib.request.urlopen(
                    f"http://localhost:{port}/health", timeout=10) as r:
                if r.status == 200:
                    return True
        except Exception:
            time.sleep(3)
    return False


def scrape_metrics(port: int) -> str:
    try:
        with urllib.request.urlopen(
                f"http://localhost:{port}/metrics", timeout=10) as r:
            return r.read().decode()
    except Exception:
        return ""


def hist_quantile(prom_text: str, name: str, q: float):
    """Approximate quantile from a Prometheus histogram dump."""
    buckets = []
    total = None
    for line in prom_text.splitlines():
        if line.startswith(name + "_bucket"):
            le = line.split('le="')[1].split('"')[0]
            val = float(line.rsplit(" ", 1)[1])
            buckets.append((float("inf") if le == "+Inf" else float(le),
                            val))
        elif line.startswith(name + "_count"):
            total = float(line.rsplit(" ", 1)[1])
    if not buckets or not total:
        return None
    buckets.sort()
    target = q * total
    for le, cum in buckets:
        if cum >= target:
            return le
    return buckets[-1][0]


def run_client(args, rate: float, tag: str) -> dict:
    out_path = f"/tmp/ab_{tag}.json"
    cmd = [
        sys.executable,
        os.path.join(_REPO, "benchmarks", "benchmark_serving.py"),
        "--model", args.model, "--port", str(args.port),
        "--dataset", args.trace, "--num-prompts", str(args.num_prompts),
        "--request-rate", str(rate), "--cv", "1.0",
        "--seed", str(args.seed), "--save-result", out_path,
    ]
    subprocess.run(cmd, check=True, cwd=os.path.join(_REPO, "benchmarks"))
    with open(out_path) as f:
        return json.load(f)


def _strict_json(obj):
    """Recursively replace non-finite floats with None: strict JSON has
    no Infinity/NaN literal (an unreachable histogram quantile is
    'no data', which is null)."""
    import math
    if isinstance(obj, float):
        return obj if math.isfinite(obj) else None
    if isinstance(obj, dict):
        return {k: _strict_json(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_strict_json(v) for v in obj]
    return obj


def scrape_debug(port):
    import urllib.request
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/debug/stats", timeout=10) as r:
            return json.loads(r.read())
    except Exception:
        return None


def debug_delta(d0, d1):
    """Per-pass deltas of the engine's /debug/stats counters."""
    if not d0 or not d1:
        return None
    st0, st1 = d0.get("step_times", {}), d1.get("step_times", {})
    sc0, sc1 = d0.get("scheduler") or {}, d1.get("scheduler") or {}
    aux0, aux1 = sc0.get("aux") or {}, sc1.get("aux") or {}
    steps = (st1.get("steps", 0) or 0) - (st0.get("steps", 0) or 0)
    out = {
        "steps": steps,
        "schedule_s": round((st1.get("schedule_s", 0) or 0) -
                            (st0.get("schedule_s", 0) or 0), 4),
        "aux_scored": (aux1.get("total_scored", 0) or 0) -
        (aux0.get("total_scored", 0) or 0),
        "aux_seconds": round((aux1.get("total_seconds", 0) or 0) -
                             (aux0.get("total_seconds", 0) or 0), 4),
        "lazy_score_skips": (sc1.get("lazy_score_skips", 0) or 0) -
        (sc0.get("lazy_score_skips", 0) or 0),
    }
    if steps > 0:
        out["aux_ms_per_step"] = round(out["aux_seconds"] / steps * 1e3, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="test-llama-1b")
    ap.add_argument("--trace", required=True)
    ap.add_argument("--rates", type=float, nargs="+", default=[4.0, 8.0])
    ap.add_argument("--schedules", nargs="+", default=["fcfs", "opt"])
    ap.add_argument("--predictor", default=None,
                    help="usage_config.json for the ranked policies")
    ap.add_argument("--num-prompts", type=int, default=192)
    ap.add_argument("--warm-prompts", type=int, default=48,
                    help="size of the discarded cache-priming pass")
    ap.add_argument("--port", type=int, default=8322)
    ap.add_argument("--decode-steps", type=int, default=8)
    ap.add_argument("--max-num-seqs", type=int, default=32)
    ap.add_argument("--max-model-len", type=int, default=1024)
    ap.add_argument("--blocks", type=int, default=1536,
                    help="default matches bench.py's engine config so the "
                    "persistent compile cache is shared")
    ap.add_argument("--precompile", action="store_true",
                    help="walk every shape bucket at startup (tens of "
                    "minutes through a remote-compile relay); the default "
                    "relies on the discarded warm pass compiling just the "
                    "shapes the trace actually hits")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--health-timeout", type=float, default=2400)
    ap.add_argument("--out", default="/tmp/online_ab.json")
    ap.add_argument("--extra-server-arg", action="append", default=[],
                    help="extra flag(s) passed to every server, e.g. "
                    "--extra-server-arg=--disable-pipeline-admission")
    args = ap.parse_args()

    results = []
    for sched in args.schedules:
        cmd = [
            sys.executable, "-m",
            "vllm_ltr_tpu.entrypoints.openai.api_server",
            "--model", args.model, "--skip-tokenizer-init",
            "--schedule-type", sched,
            "--max-model-len", str(args.max_model_len),
            "--max-num-seqs", str(args.max_num_seqs),
            "--max-num-batched-tokens", str(2048),
            "--num-gpu-blocks-override", str(args.blocks),
            "--block-size", "16", "--swap-space", "0.25",
            "--decode-steps-per-dispatch", str(args.decode_steps),
            "--port", str(args.port),
            "--disable-log-requests",
        ] + list(args.extra_server_arg)
        if args.precompile:
            cmd.append("--precompile-shapes")
        if args.predictor and sched not in ("fcfs", "fifo", "mlfq"):
            cmd += ["--prefill-predictor-model-config", args.predictor]
        log_path = f"/tmp/ab_server_{sched}.log"
        with open(log_path, "w") as logf:
            server = subprocess.Popen(cmd, cwd=_REPO, stdout=logf,
                                      stderr=subprocess.STDOUT)
        try:
            if not wait_health(args.port, args.health_timeout):
                raise RuntimeError(
                    f"server ({sched}) never became healthy; see "
                    f"{log_path}")
            # Discarded priming pass (compiles every live shape) — paced
            # like the measured runs so the same step shapes occur.
            warm_args = argparse.Namespace(**vars(args))
            warm_args.num_prompts = args.warm_prompts
            run_client(warm_args, rate=max(args.rates), tag=f"{sched}_warm")
            for rate in args.rates:
                before = scrape_metrics(args.port)
                dbg0 = scrape_debug(args.port)
                res = run_client(args, rate, f"{sched}_r{rate:g}")
                after = scrape_metrics(args.port)
                dbg1 = scrape_debug(args.port)
                hist = "ltr_tpu:time_to_first_token_seconds"
                row = {
                    "schedule": sched,
                    "rate": rate,
                    "client": {
                        k: res.get(k)
                        for k in ("output_throughput",
                                  "request_throughput", "completed",
                                  "mean_ttft_ms", "median_ttft_ms",
                                  "p99_ttft_ms", "median_tpot_ms",
                                  "p99_tpot_ms", "latency_percentiles",
                                  "norm_latency_percentiles")
                    },
                    "server_ttft_p50_le": hist_quantile(after, hist, .5),
                    "server_ttft_p99_le": hist_quantile(after, hist, .99),
                    # Per-pass /debug/stats delta: aux-scoring cost per
                    # engine step is the VERDICT r4 item-5 done metric.
                    "server_debug": debug_delta(dbg0, dbg1),
                }
                results.append(_strict_json(row))
                print(json.dumps(results[-1]))
                del before
        finally:
            server.send_signal(signal.SIGTERM)
            try:
                server.wait(timeout=30)
            except subprocess.TimeoutExpired:
                server.kill()
            time.sleep(3)

    with open(args.out, "w") as f:
        # allow_nan=False guards the artifact: bare Infinity/NaN is not
        # JSON and breaks any non-Python consumer (VERDICT r4 weak #7).
        json.dump(results, f, indent=1, allow_nan=False)
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
