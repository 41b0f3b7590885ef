"""In-process A/B of INT4 decode-kernel variants (real chip).

Chip throughput wanders between measurement windows (docs/BENCHMARKS.md
methodology; today's windows have measured 3x apart), so cross-process
variant comparisons are noise.  This driver compiles every variant in ONE
process and interleaves their timed loops round-robin, so each repeat of
each variant samples the same window mix.  Reports per-variant
us/layer + ms/model-step on the Llama-3-8B fused projection shapes
(the llama-8b-int4 serving config's matmul work), plus the weight-stream
floor ratio (VERDICT r4 item 1's acceptance metric).

Usage:
  python benchmarks/bench_int4_ab.py --m 32 --iters 60 --repeats 5 \
      [--variants factored batched dequant_tile ...]
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

SHAPES_FUSED = [
    ("qkv", 4096, 6144),
    ("o", 4096, 4096),
    ("gate_up", 4096, 28672),
    ("down", 14336, 4096),
]
N_LAYERS = 32
HBM_GBPS = 660.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--group", type=int, default=128)
    ap.add_argument("--variants", nargs="+",
                    default=["factored", "batched", "dequant_tile",
                             "dequant_tile_bf16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vllm_ltr_tpu.layers.quantization.int4 import quantize_array
    from vllm_ltr_tpu.ops.pallas.int4_matmul import int4_matmul_plane_major

    rng = np.random.RandomState(0)
    ws = []
    total_w_elems = 0
    H = 4096
    for name, K, N in SHAPES_FUSED:
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
        ws.append((name, K, N, quantize_array(w, args.group)))
        total_w_elems += K * N

    M = args.m

    def make_loop(variant, n):
        def layer(x):
            h = x
            for name, K, N, q in ws:
                xin = h if K == H else jnp.tile(h, (1, K // H))[:, :K]
                y = int4_matmul_plane_major(
                    xin, q.packed, q.scales, q.zeros,
                    group_size=q.group_size, logical_n=N,
                    decode_kernel=variant)
                if N >= H:
                    h = (h + y[:, :H] * 1e-6).astype(h.dtype)
                else:
                    h = (h + jnp.tile(y, (1, H // N))[:, :H] * 1e-6).astype(
                        h.dtype)
            return h

        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, n, lambda i, x: layer(x), x)

        return loop

    x0 = jnp.asarray(rng.normal(size=(M, H)), jnp.bfloat16)

    shallow_iters = max(args.iters // 10, 1)
    extra = args.iters - shallow_iters
    loops = {}
    t0 = time.perf_counter()
    for v in args.variants:
        loops[v] = (make_loop(v, args.iters), make_loop(v, shallow_iters))

    def run(loop):
        return float(np.asarray(jax.device_get(loop(x0)[0, 0])))

    for v in args.variants:
        run(loops[v][0]), run(loops[v][1])
    print(f"# compiled {len(args.variants)} variants in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    samples = {v: [] for v in args.variants}
    for r in range(args.repeats):
        for v in args.variants:  # round-robin: same window mix for all
            deep, shallow = loops[v]
            a = time.perf_counter()
            run(shallow)
            b = time.perf_counter()
            run(deep)
            c = time.perf_counter()
            samples[v].append(((c - b) - (b - a)) / extra)

    stream_ms = (total_w_elems * 0.5) * N_LAYERS / (HBM_GBPS * 1e9) * 1e3
    print(f"M={M}  weight-stream floor {stream_ms:.2f} ms/model-step "
          f"(at {HBM_GBPS:.0f} GB/s)")
    for v in args.variants:
        us = statistics.median(samples[v]) * 1e6
        lo = min(samples[v]) * 1e6
        hi = max(samples[v]) * 1e6
        model_ms = us * N_LAYERS / 1e3
        print(f"  {v:20s} {us:8.1f} us/layer  [{lo:.1f}..{hi:.1f}]  "
              f"-> {model_ms:6.2f} ms/model  ({model_ms / stream_ms:.2f}x "
              f"floor)")


if __name__ == "__main__":
    main()
