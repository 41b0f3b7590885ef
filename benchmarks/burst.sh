#!/bin/bash
# Offline burst benchmark driver (counterpart of reference burst-*.sh):
# all prompts at once; compares FCFS vs ranked scheduling on throughput and
# finish-order Kendall tau.
#
# Usage: burst.sh <model_dir> [predictor_usage_config.json]
set -e
cd "$(dirname "$0")/.."

MODEL=${1:-test-llama-tiny}
PREDICTOR=${2:-}
TRACE=${TRACE:-/tmp/ltr_trace.jsonl}
NUM_PROMPTS=${NUM_PROMPTS:-512}

[ -f "$TRACE" ] || python benchmarks/generate_synthetic_trace.py --output "$TRACE"

python benchmarks/benchmark_throughput.py --model "$MODEL" --dataset "$TRACE" \
    --num-prompts "$NUM_PROMPTS" --schedule-type fcfs \
    --save-result burst_fcfs.json

# Oracle SJF upper bound.
python benchmarks/benchmark_throughput.py --model "$MODEL" --dataset "$TRACE" \
    --num-prompts "$NUM_PROMPTS" --schedule-type FAKEPO --use-oracle-est-tokens \
    --save-result burst_oracle.json

if [ -n "$PREDICTOR" ]; then
  python benchmarks/benchmark_throughput.py --model "$MODEL" --dataset "$TRACE" \
      --num-prompts "$NUM_PROMPTS" --schedule-type opt \
      --prefill-predictor-model-config "$PREDICTOR" \
      --save-result burst_opt.json
fi
