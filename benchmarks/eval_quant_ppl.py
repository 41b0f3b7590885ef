"""Quantization accuracy harness: Δ-perplexity of INT4 weights and FP8 KV
cache vs the bf16 baseline.

Counterpart of the reference's quantization accuracy checks (BASELINE.md:
"matching reference accuracy at the same bit-width — AWQ/GPTQ Δppl,
FP8-KV Δaccuracy"; reference context csrc/quantization/*, tests/fp8_kv/).

Method: teacher-forced NLL over a fixed token set, running the real
serving forward (paged KV cache + causal attention), with three engines'
worth of numerics:
  1. baseline dtype weights + baseline KV,
  2. INT4 weight-only quantization (group-128, AWQ/GPTQ-class),
  3. FP8-E5M2 KV cache.

Usage:
  python benchmarks/eval_quant_ppl.py --model <hf-dir | builtin-name>
      [--platform cpu] [--dataset trace.jsonl] [--num-seqs 8]
      [--seq-len 256] [--dtype float32]

With an HF checkpoint directory this reports real Δppl; with a builtin
random-weight config it still measures the numeric fidelity of the
quantized serving path (useful hermetically, stated as such).
Prints one JSON line with ppl_baseline / ppl_int4 / ppl_fp8kv and deltas.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def build_eval_tokens(args, vocab: int) -> np.ndarray:
    # A checkpoint trained by benchmarks/train_tiny_lm.py carries its
    # corpus recipe: evaluate on held-out sequences of the SAME Markov
    # chain, so Δppl reflects in-distribution degradation (random tokens
    # would measure the model far off its data manifold).
    corpus_path = os.path.join(str(args.model), "corpus.json")
    args.eval_set = "synthetic_zipf" if not args.dataset else "dataset"
    if not args.dataset and os.path.exists(corpus_path):
        args.eval_set = "markov_heldout"
        from train_tiny_lm import build_markov_corpus
        cfg = json.load(open(corpus_path))
        # Held-out tail: the trainer samples starts from its
        # corpus_len-token stream (400k historically; the trained value
        # is persisted in corpus.json); continue the same chain past it
        # with enough margin for the requested eval size.
        train_len = int(cfg.get("corpus_len", 400_000))
        need = args.num_seqs * args.seq_len
        margin = 20_000  # trainer windows end at train_len + seq_len
        toks, _ = build_markov_corpus(cfg["vocab"],
                                      train_len + margin + need,
                                      cfg["seed"])
        tail = toks[train_len + margin:]
        assert len(tail) >= need
        rows = [
            tail[i * args.seq_len:(i + 1) * args.seq_len]
            for i in range(args.num_seqs)
        ]
        print("# eval on held-out Markov-chain corpus "
              f"(vocab {cfg['vocab']}, chain entropy "
              f"{cfg['chain_entropy']:.3f} nats -> ppl floor "
              f"{np.exp(cfg['chain_entropy']):.2f})", file=sys.stderr)
        return np.asarray(rows, np.int32)
    if args.dataset:
        rows = []
        with open(args.dataset) as f:
            for line in f:
                if line.strip():
                    rec = json.loads(line)
                    ids = rec.get("prompt_token_ids")
                    if ids and len(ids) >= args.seq_len:
                        rows.append(ids[:args.seq_len])
                if len(rows) >= args.num_seqs:
                    break
        if len(rows) >= args.num_seqs:
            return np.asarray(rows, np.int32)
        print(f"dataset too small, padding with synthetic rows",
              file=sys.stderr)
    # Synthetic Zipf-ish token stream (hermetic fallback).
    rng = np.random.RandomState(args.seed)
    ranks = np.arange(1, vocab)
    probs = 1.0 / ranks**1.2
    probs /= probs.sum()
    return rng.choice(ranks, size=(args.num_seqs, args.seq_len),
                      p=probs).astype(np.int32)


def run_nll(model_cls, params, cfg, tokens: np.ndarray, kv_dtype,
            dtype) -> float:
    """Teacher-forced mean NLL via the serving prefill path (paged cache)."""
    import jax
    import jax.numpy as jnp
    from vllm_ltr_tpu.models.common import AttentionMetadata
    from vllm_ltr_tpu.ops.kv_cache import allocate_kv_cache

    S, L = tokens.shape
    BLOCK = 16
    mb = -(-L // BLOCK)
    kv_heads = getattr(cfg, "num_key_value_heads", None) or \
        cfg.num_attention_heads
    head_dim = (getattr(cfg, "head_dim", None)
                or cfg.hidden_size // cfg.num_attention_heads)

    total_nll, total_tok = 0.0, 0
    for s in range(S):
        kv = allocate_kv_cache(cfg.num_hidden_layers, mb, BLOCK, kv_heads,
                               head_dim, dtype=kv_dtype)
        ids = jnp.asarray(tokens[s], jnp.int32)
        pos = jnp.arange(L, dtype=jnp.int32)
        meta = AttentionMetadata(
            token_seq=jnp.zeros((L, ), jnp.int32),
            token_pos=pos,
            slot_mapping=pos,
            block_tables=jnp.arange(mb, dtype=jnp.int32)[None, :],
            seq_lens=jnp.full((1, ), L, jnp.int32),
        )
        hidden, _ = model_cls.forward(params, ids, pos, kv, meta, cfg)
        logits = model_cls.compute_logits(params, hidden, cfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # Predict token t+1 from position t.
        nll = -jnp.take_along_axis(logp[:-1], ids[1:, None],
                                   axis=1).squeeze(-1)
        total_nll += float(jnp.sum(nll))
        total_tok += L - 1
    return total_nll / total_tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="bench-llama-s")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--num-seqs", type=int, default=8, dest="num_seqs")
    ap.add_argument("--seq-len", type=int, default=256, dest="seq_len")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--skip-squeezellm", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.platform:
        import os
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vllm_ltr_tpu.layers.quantization.int4 import maybe_quantize_params
    from vllm_ltr_tpu.models import resolve_model_cls
    from vllm_ltr_tpu.models.common import dtype_by_name
    from vllm_ltr_tpu.models.weights import load_params
    from vllm_ltr_tpu.transformers_utils.config import get_hf_config

    cfg = get_hf_config(args.model)
    model_cls = resolve_model_cls(cfg.architectures)
    dtype = dtype_by_name(args.dtype)
    params = load_params(model_cls, args.model, cfg, dtype, "auto", args.seed)
    tokens = build_eval_tokens(args, cfg.vocab_size)

    ppl = {}
    nll = run_nll(model_cls, params, cfg, tokens, dtype, dtype)
    ppl["baseline"] = float(np.exp(nll))

    q_params = maybe_quantize_params(params, "int4")
    nll_q = run_nll(model_cls, q_params, cfg, tokens, dtype, dtype)
    ppl["int4"] = float(np.exp(nll_q))

    # SqueezeLLM NUQ4 (per-channel k-means LUT; slow host-side quantize,
    # so opt-in for big models via --skip-squeezellm).
    if not args.skip_squeezellm:
        from vllm_ltr_tpu.layers.quantization.squeezellm import (
            maybe_quantize_params_squeezellm)
        sq_params = maybe_quantize_params_squeezellm(params)
        nll_sq = run_nll(model_cls, sq_params, cfg, tokens, dtype, dtype)
        ppl["squeezellm"] = float(np.exp(nll_sq))

    nll_f8 = run_nll(model_cls, params, cfg, tokens, jnp.float8_e5m2, dtype)
    ppl["fp8_kv"] = float(np.exp(nll_f8))

    out = {
        "model": args.model,
        "eval_tokens": int(tokens.size),
        "eval_set": getattr(args, "eval_set", "synthetic_zipf"),
        "ppl_baseline": ppl["baseline"],
        "ppl_int4": ppl["int4"],
        "ppl_fp8_kv": ppl["fp8_kv"],
        "delta_ppl_int4": ppl["int4"] - ppl["baseline"],
        "delta_ppl_fp8_kv": ppl["fp8_kv"] - ppl["baseline"],
    }
    if "squeezellm" in ppl:
        out["ppl_squeezellm"] = ppl["squeezellm"]
        out["delta_ppl_squeezellm"] = ppl["squeezellm"] - ppl["baseline"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
