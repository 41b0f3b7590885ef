"""In-process A/B of pipelined (batched) sync admissions (real chip).

VERDICT r4 item 9: the sync engine's step() now enqueues a waiting
cohort's prefill waves back-to-back behind the main dispatch, so the
cohort pays one device round trip instead of one per wave.  This driver
builds TWO engines in one process — pipelined admission on and off —
and alternates measured burst passes between them, so both sample the
same chip windows (cross-process comparisons are noise; see
docs/BENCHMARKS.md methodology).

The workload forces multi-wave cohorts: seats <= 8 and prompts sized so
one token budget (2048) admits only a fraction of the free seats.

Usage:
  python benchmarks/bench_admission_ab.py [--seats 8] [--repeats 3]
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
    ap.add_argument("--seats", type=int, default=8)
    ap.add_argument("--num-requests", type=int, default=24)
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--decode-steps", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from vllm_ltr_tpu import LLM, SamplingParams

    def build(pipeline: bool) -> LLM:
        return LLM(model=args.model, skip_tokenizer_init=True,
                   dtype="bfloat16", max_model_len=1024,
                   max_num_seqs=args.seats,
                   max_num_batched_tokens=2048,
                   num_gpu_blocks_override=1024, block_size=16,
                   swap_space=0.25, disable_log_stats=True,
                   decode_steps_per_dispatch=args.decode_steps,
                   disable_pipeline_admission=not pipeline)

    rng = np.random.RandomState(0)
    prompts = [
        list(map(int, rng.randint(1, args.vocab, size=args.prompt_len)))
        for _ in range(args.num_requests)
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=args.max_tokens,
                        ignore_eos=True)

    engines = {"pipelined": build(True), "stepwise": build(False)}

    def burst(llm: LLM):
        ex = llm.llm_engine.model_executor
        st0 = dict(ex.dispatch_stats)
        steps0 = llm.llm_engine.step_times["steps"]
        t0 = time.time()
        outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                            use_tqdm=False)
        dt = time.time() - t0
        gen = sum(len(o.outputs[0].token_ids) for o in outs)
        st1 = ex.dispatch_stats
        return {
            "tok_s": gen / dt,
            "steps": llm.llm_engine.step_times["steps"] - steps0,
            "prefill_dispatches": (st1["prefill_dispatches"] -
                                   st0["prefill_dispatches"]),
            "decode_single": (st1["decode_single_dispatches"] -
                              st0["decode_single_dispatches"]),
            "decode_fused": (st1["decode_fused_dispatches"] -
                             st0["decode_fused_dispatches"]),
        }

    for name, llm in engines.items():
        r = burst(llm)  # warm: compiles shapes
        print(f"# warm {name}: {r}", flush=True)

    samples = {k: [] for k in engines}
    stats = {k: None for k in engines}
    for _ in range(args.repeats):
        for name, llm in engines.items():
            r = burst(llm)
            samples[name].append(r["tok_s"])
            stats[name] = r
    print(f"workload: {args.num_requests} x {args.prompt_len}-token "
          f"prompts, {args.max_tokens} gen, seats={args.seats}, "
          f"budget 2048 (cohort needs "
          f"{args.seats * args.prompt_len // 2048} waves)")
    for name in engines:
        med = statistics.median(samples[name])
        s = stats[name]
        print(f"  {name:10s} {med:7.1f} tok/s  [{min(samples[name]):.0f}.."
              f"{max(samples[name]):.0f}]  engine_steps={s['steps']} "
              f"prefill_disp={s['prefill_dispatches']} "
              f"decode_single={s['decode_single']} "
              f"decode_fused={s['decode_fused']}")


if __name__ == "__main__":
    main()
