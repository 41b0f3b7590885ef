"""On-chip microbenchmarks for the hot Pallas kernels.

Measures device time with a chained dependency loop (iteration i+1
consumes iteration i's output) so XLA cannot overlap or elide work, and
subtracts the host<->device relay round trip measured on an empty jitted
function.  Reports effective HBM bandwidth for the memory-bound decode
kernel (the number that matters: decode attention streams the whole KV
working set every step).

Counterpart of the reference's kernel benchmarks
(/root/reference/benchmarks/kernels/benchmark_paged_attention.py), built
for TPU: geometry defaults match the 1.1B bench model in bench.py
(22 layers, 16 heads, head_dim 128, page 16) at 32 sequences x 576
context — the steady-state decode shape of the driver benchmark.

Usage:
  python benchmarks/bench_kernels.py decode [--seqs 32] [--ctx 576] ...
  python benchmarks/bench_kernels.py decode-sweep   # keys/iter tuning
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compilation cache: compiles through the remote relay run
# 20-140 s per shape; reruns of the same geometry must not pay it again.
from vllm_ltr_tpu.executor.tpu_executor import _enable_compilation_cache

_enable_compilation_cache()


def relay_floor(n=20):
    """Median round-trip of an empty jitted fn (host->device->host)."""
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    # float() forces a host round trip: through the relay tunnel,
    # block_until_ready can acknowledge before execution drains, letting
    # queued work pollute the next timed region (observed 2026-08).
    float(f(x)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_decode(args):
    from vllm_ltr_tpu.ops.pallas.fused_decode import fused_decode_attention

    S, KH, QH, Dp, Bs = args.seqs, args.kv_heads, args.heads, args.head_dim, args.page
    L, ctx = args.layers, args.ctx
    pages_per_seq = -(-ctx // Bs)
    MB = pages_per_seq + 2
    N = S * MB
    dtype = jnp.float8_e5m2 if args.fp8 else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    cache = jax.random.normal(key, (L, N + 1, 2, KH, Bs, Dp),
                              jnp.bfloat16).astype(dtype)
    q = jax.random.normal(key, (S, QH, Dp), jnp.bfloat16)
    kv_new = jax.random.normal(key, (S, 2, KH, Dp), jnp.bfloat16).astype(dtype)
    # Disjoint pages per sequence.  Default arange = every page group is
    # a contiguous run, so the kernel's fused whole-group DMA path
    # (schedule 'contig') covers all fetches — the best case.  Real
    # serving tables fragment as requests churn; --shuffle-pages
    # permutes the assignment so every group takes the per-page DMA
    # path — the worst case.  Serving truth lies between.
    bt = np.arange(1, S * MB + 1, dtype=np.int32).reshape(S, MB)
    if args.shuffle_pages:
        flat = bt.reshape(-1)
        np.random.RandomState(0).shuffle(flat)
        bt = flat.reshape(S, MB)
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.full((S,), ctx, jnp.int32)
    slot_mapping = jnp.asarray(
        (bt[:, (ctx - 1) // Bs] * Bs + (ctx - 1) % Bs).astype(np.int32))
    scale = 1.0 / float(np.sqrt(Dp))

    iters = args.iters

    def make_chained(hp, iters):
        @jax.jit
        def chained(q, kv_new, cache):
            def body(i, carry):
                q, cache = carry
                out, cache = fused_decode_attention(
                    q, kv_new, cache, jax.lax.rem(i, L), block_tables,
                    seq_lens, slot_mapping, scale=scale,
                    window=args.window, head_packed=hp)
                # Chain: fold output back into q to serialize iterations.
                q = q + 0.0 * out
                return (q, cache)
            q, cache = jax.lax.fori_loop(0, iters, body, (q, cache))
            return q[0, 0, 0], cache
        return chained

    variants = ([False, True] if args.hp == "both" else
                [args.hp == "1"] if args.hp in ("0", "1") else [None])
    floor = relay_floor()
    page_bytes = 2 * KH * Bs * Dp * np.dtype(
        np.uint8 if args.fp8 else np.float16).itemsize
    read = S * pages_per_seq * page_bytes
    results = []
    # Two-length delta (the bench_int4.py method): per-call time comes
    # from (deep chain - shallow chain) / extra iterations, cancelling
    # BOTH the relay round trip and the fixed per-chain cost that the
    # floor subtraction misses (measured: the same kernel reads 220-247
    # us/call from a single 110-iter chain minus floor, but 176-197 from
    # the 440-vs-110 delta — the delta is the honest number).
    shallow_iters = max(iters // 4, 1)
    extra = iters - shallow_iters
    for hp in variants:
        deep = make_chained(hp, iters)
        shallow = make_chained(hp, shallow_iters)

        def run(fn):
            r, c = fn(q, kv_new, cache)
            float(r)  # full drain (see relay_floor note)
            del c

        run(deep)
        run(shallow)
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            run(shallow)
            t1 = time.perf_counter()
            run(deep)
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / extra)
        dt = float(np.median(ts))
        bw = read / dt / 1e9
        tag = {None: "env", False: "page-major", True: "head-packed"}[hp]
        print(f"decode fused kernel [{tag}]: S={S} ctx={ctx} QH={QH} "
              f"KH={KH} D={Dp} Bs={Bs} fp8={args.fp8} "
              f"keys/iter={os.environ.get('LTR_TPU_DECODE_KEYS', '128')}")
        print(f"  {dt*1e6:.1f} us/call  ({read/2**20:.1f} MiB KV read)  "
              f"effective {bw:.0f} GB/s   [relay floor {floor*1e3:.1f} ms, "
              f"{iters}-vs-{shallow_iters} chain delta]")
        results.append((dt, bw))
    return results[-1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["decode", "decode-sweep"])
    p.add_argument("--seqs", type=int, default=32)
    p.add_argument("--ctx", type=int, default=576)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--kv-heads", type=int, default=16)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--page", type=int, default=16)
    p.add_argument("--layers", type=int, default=22)
    p.add_argument("--window", type=int, default=0)
    p.add_argument("--fp8", action="store_true")
    p.add_argument("--iters", type=int, default=110)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--shuffle-pages", action="store_true",
                   help="fragmented block tables (per-page DMA path)")
    p.add_argument("--hp", default="env", choices=["env", "0", "1", "both"],
                   help="head-packed GQA kernel: both = A/B in-process")
    args = p.parse_args()

    if args.mode == "decode":
        bench_decode(args)
    elif args.mode == "decode-sweep":
        # Fresh process per setting: LTR_TPU_DECODE_KEYS is read at trace
        # time and jit caches would otherwise pin the first value.
        import subprocess
        argv = [sys.executable, os.path.abspath(__file__), "decode"]
        argv += [a for a in sys.argv[2:]]
        for keys in (32, 64, 128, 256, 512):
            env = dict(os.environ, LTR_TPU_DECODE_KEYS=str(keys))
            subprocess.run(argv, env=env, check=False)


if __name__ == "__main__":
    main()
