"""INT4 decode-regime layer-chain timing (real chip).

Times one Llama-8B decoder layer's worth of INT4 projections (q, k, v, o,
gate, up, down — optionally the fused qkv / gate_up shapes) as a chained
loop at decode batch sizes, so the per-iteration device time (~0.5 ms) is
large enough for the differencing harness to beat the 25-90 ms relay
dispatch jitter (docs/BENCHMARKS.md methodology; bench_int4.py's
single-shape sweep is noise-dominated below ~100 us).

Reports us/layer, the implied whole-model matmul time (x n_layers), and
the weight-stream floor (int4 bytes / measured HBM rate) — the VERDICT r4
item-1 "within 1.5x of the byte stream" acceptance metric.

Usage:
  python benchmarks/bench_int4_layer.py [--m 32] [--iters 120]
      [--variant factored|dequant_tile|batched] [--fused]
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

# Llama-3-8B: H=4096, I=14336, 32 QH / 8 KH x 128 = q 4096, kv 1024.
SHAPES_UNFUSED = [
    ("q", 4096, 4096),
    ("k", 4096, 1024),
    ("v", 4096, 1024),
    ("o", 4096, 4096),
    ("gate", 4096, 14336),
    ("up", 4096, 14336),
    ("down", 14336, 4096),
]
SHAPES_FUSED = [
    ("qkv", 4096, 6144),
    ("o", 4096, 4096),
    ("gate_up", 4096, 28672),
    ("down", 14336, 4096),
]
N_LAYERS = 32
HBM_GBPS = 660.0  # measured paged-DMA ceiling on this v5e (memory notes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--variant", default="factored")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--group", type=int, default=128)
    args = ap.parse_args()
    if args.variant != "factored":
        os.environ["LTR_TPU_INT4_DECODE_KERNEL"] = args.variant

    import jax
    import jax.numpy as jnp
    from vllm_ltr_tpu.layers.quantization.int4 import quantize_array
    from vllm_ltr_tpu.ops.pallas.int4_matmul import int4_matmul

    shapes = SHAPES_FUSED if args.fused else SHAPES_UNFUSED
    rng = np.random.RandomState(0)
    ws = []
    total_w_elems = 0
    for name, K, N in shapes:
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
        ws.append((name, K, N, quantize_array(w, args.group)))
        total_w_elems += K * N

    M = args.m
    H = 4096

    def layer(x):
        # x: [M, 4096]; chain the projections with cheap folds so no
        # matmul is elided and each depends on the previous.
        h = x
        for name, K, N, q in ws:
            xin = h if K == H else jnp.tile(h, (1, K // H))[:, :K]
            y = int4_matmul(xin, q.packed, q.scales, q.zeros,
                            q.group_size, logical_n=N)
            if N >= H:
                h = (h + y[:, :H] * 1e-6).astype(h.dtype)
            else:
                h = (h + jnp.tile(y, (1, H // N))[:, :H] * 1e-6).astype(
                    h.dtype)
        return h

    def make_loop(n):
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, n, lambda i, x: layer(x), x)
        return loop

    x0 = jnp.asarray(rng.normal(size=(M, H)), jnp.bfloat16)
    deep = make_loop(args.iters)
    shallow_iters = max(args.iters // 10, 1)
    shallow = make_loop(shallow_iters)
    extra = args.iters - shallow_iters

    def run(loop):
        return float(np.asarray(jax.device_get(loop(x0)[0, 0])))

    t0 = time.perf_counter()
    run(deep), run(shallow)
    print(f"# compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(args.repeats):
        a = time.perf_counter()
        run(shallow)
        b = time.perf_counter()
        run(deep)
        c = time.perf_counter()
        ts.append(((c - b) - (b - a)) / extra)
    us = statistics.median(ts) * 1e6
    model_ms = us * N_LAYERS / 1e3
    stream_ms = (total_w_elems * 0.5) * N_LAYERS / (HBM_GBPS * 1e9) * 1e3
    print(f"variant={args.variant} fused={args.fused} M={M}: "
          f"{us:.1f} us/layer -> {model_ms:.2f} ms/model-step "
          f"(weight-stream floor {stream_ms:.2f} ms, "
          f"ratio {model_ms / stream_ms:.2f}x)")


if __name__ == "__main__":
    main()
