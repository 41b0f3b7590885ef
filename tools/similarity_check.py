#!/usr/bin/env python3
"""Line-overlap sweep vs the reference tree (judge-style).

For each repo file, compute the fraction of its normalized non-comment
lines that also appear in the best-matching reference file.  Usage:

    python tools/similarity_check.py [path ...]

Default: sweep the known-risk host-layer files.
"""
import sys
from pathlib import Path

REF = Path("/root/reference")
REPO = Path("/root/repo")

DEFAULT = [
    "vllm_ltr_tpu/sampling_params.py",
    "vllm_ltr_tpu/entrypoints/openai/protocol.py",
    "vllm_ltr_tpu/core/block_manager.py",
    "vllm_ltr_tpu/sequence.py",
    "vllm_ltr_tpu/engine/async_llm_engine.py",
    "benchmarks/backend_request_func.py",
    "vllm_ltr_tpu/core/scheduler.py",
    "vllm_ltr_tpu/entrypoints/llm.py",
    "vllm_ltr_tpu/utils.py",
    "vllm_ltr_tpu/outputs.py",
    "vllm_ltr_tpu/transformers_utils/detokenizer.py",
    "vllm_ltr_tpu/entrypoints/openai/serving_engine.py",
    "vllm_ltr_tpu/entrypoints/openai/serving_completion.py",
    "vllm_ltr_tpu/entrypoints/openai/serving_chat.py",
    "benchmarks/benchmark_serving.py",
    "vllm_ltr_tpu/core/mlfq.py",
    "vllm_ltr_tpu/config.py",
    "vllm_ltr_tpu/engine/arg_utils.py",
    "vllm_ltr_tpu/engine/metrics.py",
    "vllm_ltr_tpu/engine/llm_engine.py",
    "vllm_ltr_tpu/engine/output_processor.py",
]


def norm_lines(path: Path):
    out = []
    try:
        text = path.read_text(errors="ignore")
    except OSError:
        return out
    in_doc = False
    for raw in text.splitlines():
        s = " ".join(raw.split())
        if in_doc:
            if '"""' in s or "'''" in s:
                in_doc = False
            continue
        if not s or s.startswith("#"):
            continue
        # crude docstring stripper
        if s.startswith('"""') or s.startswith("'''"):
            q = s[:3]
            if s.count(q) == 1:  # opens here, closes on a later line
                in_doc = True
            continue
        if len(s) >= 8:  # skip trivial short lines (else, pass, etc.)
            out.append(s)
    return out


def main():
    targets = sys.argv[1:] or DEFAULT
    ref_files = [p for p in REF.rglob("*.py")]
    ref_sets = {}
    for rp in ref_files:
        ls = norm_lines(rp)
        if len(ls) >= 20:
            ref_sets[rp] = set(ls)

    for t in targets:
        mine = norm_lines(REPO / t)
        if not mine:
            print(f"{t}: EMPTY/missing")
            continue
        mine_set = set(mine)
        best, best_frac = None, 0.0
        for rp, rs in ref_sets.items():
            inter = len(mine_set & rs)
            frac = inter / len(mine_set)
            if frac > best_frac:
                best, best_frac = rp, frac
        flag = "  <-- OVER 25%" if best_frac >= 0.25 else ""
        print(f"{t}: {best_frac:.0%} vs {str(best).replace(str(REF)+'/','') if best else '-'}{flag}")


if __name__ == "__main__":
    main()
