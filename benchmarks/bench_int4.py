"""INT4 kernel vs bf16 dense matmul timing sweep (real chip).

Produces the docs/BENCHMARKS.md INT4 table: decode (small M, the
memory-bound regime the Marlin-class kernel targets) and prefill
(large M, MXU-bound) on 7B/13B projection shapes, comparing

  bf16   — jnp.dot at the weight's native dtype,
  int4   — the production dispatcher (ops/pallas/int4_matmul.int4_matmul),
           which picks the factored decode kernel, the dequant-tile
           prefill kernel, or the two-pass dequant-to-HBM path by M.

Timing: chained loop of ``iters`` dependent matmuls inside one jit so the
per-dispatch relay latency amortizes away; median of ``repeats``.

Usage: python benchmarks/bench_int4.py [--shapes 4096x4096,4096x11008]
           [--ms 8,512,2048] [--iters 30] [--dtype bfloat16]
Prints one line per (shape, M): bf16_us int4_us ratio.
"""
from __future__ import annotations

import argparse
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="4096x4096,4096x11008")
    ap.add_argument("--ms", default="8,512,2048")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--group", type=int, default=128)
    ap.add_argument("--twopass-m", type=int, default=None,
                    help="Override LTR_TPU_INT4_TWOPASS_M for the sweep.")
    args = ap.parse_args()
    if args.twopass_m is not None:
        os.environ["LTR_TPU_INT4_TWOPASS_M"] = str(args.twopass_m)

    import jax
    import jax.numpy as jnp
    from vllm_ltr_tpu.layers.quantization.int4 import quantize_array
    from vllm_ltr_tpu.ops.pallas.int4_matmul import int4_matmul

    dtype = getattr(jnp, args.dtype)
    rng = np.random.RandomState(0)

    def timed(fn, *arrs):
        """Per-matmul device time via chained-loop DIFFERENCING: time a
        deep loop and a shallow loop (each one dispatch + one D2H fetch
        through the relay) and divide the time difference by the extra
        iterations — the ~25 ms relay dispatch+fetch floor cancels.  The
        fold makes iteration i+1 depend on i so XLA can neither elide nor
        overlap iterations."""

        def make_loop(n_iters):
            @jax.jit
            def loop(x, *rest):
                def body(i, x):
                    y = fn(x, *rest)
                    # Fold the output back into an [M, K]-shaped input
                    # (N >= K in all swept shapes).
                    K = x.shape[1]
                    if y.shape[1] < K:  # narrow outputs (e.g. kv projs)
                        reps = -(-K // y.shape[1])
                        y = jnp.tile(y, (1, reps))
                    return (x + y[:, :K] * 1e-6).astype(x.dtype)

                return jax.lax.fori_loop(0, n_iters, body, x)

            return loop

        shallow_iters = max(args.iters // 10, 1)
        deep = make_loop(args.iters)
        shallow = make_loop(shallow_iters)
        extra = args.iters - shallow_iters

        def run(loop):
            # One-element D2H fetch: through the remote-relay backend
            # block_until_ready can return before the program drains, so
            # a readback is the only reliable completion barrier.
            return float(np.asarray(jax.device_get(loop(*arrs)[0, 0])))

        run(deep), run(shallow)  # compile + warm both
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            run(shallow)
            t1 = time.perf_counter()
            run(deep)
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / extra)
        return statistics.median(ts) * 1e6  # us per matmul

    for shape in args.shapes.split(","):
        K, N = map(int, shape.split("x"))
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
        q = quantize_array(w, args.group)
        wq = jnp.asarray(w, dtype)
        for M in map(int, args.ms.split(",")):
            x = jnp.asarray(rng.normal(size=(M, K)), dtype)

            bf16_us = timed(
                lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.
                                     float32).astype(a.dtype), x, wq)
            int4_us = timed(
                functools.partial(
                    lambda a, p, s, z: int4_matmul(
                        a, p, s, z, q.group_size, logical_n=N)), x,
                q.packed, q.scales, q.zeros)
            print(f"{K}x{N} M={M}: bf16={bf16_us:.1f}us "
                  f"int4={int4_us:.1f}us ratio={bf16_us/int4_us:.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
