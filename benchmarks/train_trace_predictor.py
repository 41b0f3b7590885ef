"""Train the aux OPT scorer on a benchmark trace -> usage_config.json.

Glue for the online A/B (reference workflow: train/train.sh fine-tunes
OPT-125M/350M on (prompt -> generation length) pairs from the serving
traces, then benchmarks/bench.sh serves with
--prefill-predictor-model-config <usage_config.json>).  Here the trace is
the hermetic jsonl from generate_synthetic_trace.py whose rows carry
``prompt_token_ids`` + ``output_len``; output_len doubles as the
generation-length label (online replay pins max_tokens to it, so it IS
the realized length).

Usage:
  python benchmarks/train_trace_predictor.py --trace /tmp/ltr_trace.jsonl \
      --job-dir /tmp/ltr_pred [--pred-model test-opt-tiny] [--epochs 6]

Prints one JSON line {"tau": ..., "usage_config": ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", required=True)
    ap.add_argument("--job-dir", required=True)
    ap.add_argument("--pred-model", default="test-opt-tiny")
    ap.add_argument("--loss", default="listMLE")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--max-length", type=int, default=32)
    ap.add_argument("--label-max-length", type=int, default=8192)
    ap.add_argument("--platform", default="cpu",
                    help="Train on CPU by default; the serving chip stays "
                    "free for the benchmark itself.")
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    from vllm_ltr_tpu.config import PrefillPredictorConfig
    from vllm_ltr_tpu.train.trainer import Example, PredictorTrainer
    from vllm_ltr_tpu.transformers_utils.config import get_hf_config

    examples = []
    with open(args.trace) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            glen = rec.get("generation_len", rec.get("output_len"))
            ids = rec["prompt_token_ids"]
            examples.append(Example(ids[:args.max_length], int(glen)))
    if not examples:
        raise SystemExit("empty trace")

    cfg = PrefillPredictorConfig(pred_model=args.pred_model,
                                 num_labels=1,
                                 mtype="rank",
                                 max_length=args.max_length,
                                 max_batch_size=64)
    trainer = PredictorTrainer(cfg,
                               loss=args.loss,
                               lr=args.lr,
                               label_max_length=args.label_max_length,
                               label_group_size=1,
                               hf_config=get_hf_config(args.pred_model))
    holdout = examples[:max(len(examples) // 10, 16)]
    train_set = examples[len(holdout):]
    trainer.train(train_set, epochs=args.epochs,
                  batch_size=args.batch_size)
    tau, _ = trainer.evaluate(holdout)
    usage_path = trainer.save(args.job_dir)
    print(json.dumps({"tau": round(float(tau), 4),
                      "examples": len(examples),
                      "usage_config": usage_path}))


if __name__ == "__main__":
    main()
