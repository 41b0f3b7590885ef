"""Offline batched generation (mirror of reference examples/offline_inference.py).

Runs a tiny random-weight model when no local checkpoint is given, so it
works in hermetic environments; pass --model /path/to/hf_dir for real runs.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None,
                        help="Force a jax platform (e.g. 'cpu'); the host "
                        "sitecustomize pins the tunneled TPU otherwise.")
    parser.add_argument("--model", default="test-llama-tiny")
    parser.add_argument("--schedule-type", default="fcfs")
    parser.add_argument("--max-tokens", type=int, default=16)
    parser.add_argument("--prompt", action="append", default=None)
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from vllm_ltr_tpu import LLM, SamplingParams

    llm = LLM(model=args.model,
              skip_tokenizer_init=args.model.startswith("test-"),
              schedule_type=args.schedule_type,
              max_model_len=512,
              num_gpu_blocks_override=(512 if args.model.startswith("test-")
                                       else None))
    sampling_params = SamplingParams(temperature=0.8,
                                     top_p=0.95,
                                     max_tokens=args.max_tokens,
                                     ignore_eos=args.model.startswith("test-"))

    if args.prompt and not args.model.startswith("test-"):
        outputs = llm.generate(args.prompt, sampling_params)
    else:
        prompt_token_ids = [[1, 5, 9, 13], [2, 4, 8], [3, 33, 333, 77, 11]]
        outputs = llm.generate(prompt_token_ids=prompt_token_ids,
                               sampling_params=sampling_params)

    for output in outputs:
        print(f"req={output.request_id} prompt={output.prompt_token_ids} "
              f"-> tokens={output.outputs[0].token_ids} "
              f"text={output.outputs[0].text!r} "
              f"finish={output.outputs[0].finish_reason} "
              f"latency={output.latency:.3f}s")


if __name__ == "__main__":
    main()
