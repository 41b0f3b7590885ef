#!/bin/bash
# Online serving benchmark driver (counterpart of reference benchmarks/bench.sh):
# start the OpenAI server with the given schedule type, replay a trace at
# several request rates, record TTFT/TPOT/latency percentiles.
#
# Usage: bench.sh <model_dir> <schedule_type> [predictor_usage_config.json]
set -e
cd "$(dirname "$0")/.."

MODEL=${1:-test-llama-tiny}
SCHEDULE=${2:-fcfs}
PREDICTOR=${3:-}
PORT=${PORT:-8322}
TRACE=${TRACE:-/tmp/ltr_trace.jsonl}
RATES=${RATES:-"2 4 8 16"}
NUM_PROMPTS=${NUM_PROMPTS:-256}

[ -f "$TRACE" ] || python benchmarks/generate_synthetic_trace.py --output "$TRACE"

EXTRA=""
[ -n "$PREDICTOR" ] && EXTRA="--prefill-predictor-model-config $PREDICTOR"

python -m vllm_ltr_tpu.entrypoints.openai.api_server \
    --model "$MODEL" --schedule-type "$SCHEDULE" $EXTRA \
    --skip-tokenizer-init --port "$PORT" --disable-log-requests &
SERVER_PID=$!
trap "kill $SERVER_PID 2>/dev/null || true" EXIT

until curl -sf localhost:$PORT/health > /dev/null; do sleep 2; done

for RATE in $RATES; do
  python benchmarks/benchmark_serving.py \
      --model "$MODEL" --port "$PORT" --dataset "$TRACE" \
      --num-prompts "$NUM_PROMPTS" --request-rate "$RATE" --cv 1.0 \
      --save-result "bench_${SCHEDULE}_rate${RATE}.json"
done
