"""Offline LLM API.

Behavioral counterpart of reference ``vllm/entrypoints/llm.py`` (247 LoC):
batch generation with continuous batching, `schedule_type` kwarg
(reference llm.py:91) and per-request latency stamping (llm.py:236).
"""
from __future__ import annotations

import time
from typing import List, Optional, Union

from tqdm import tqdm

from vllm_ltr_tpu.engine.arg_utils import EngineArgs
from vllm_ltr_tpu.engine.llm_engine import LLMEngine
from vllm_ltr_tpu.outputs import RequestOutput
from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.utils import Counter


class LLM:
    """An LLM for offline batched generation on TPU."""

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        skip_tokenizer_init: bool = False,
        trust_remote_code: bool = False,
        tensor_parallel_size: int = 1,
        dtype: str = "auto",
        quantization: Optional[str] = None,
        revision: Optional[str] = None,
        seed: int = 0,
        gpu_memory_utilization: float = 0.9,
        swap_space: float = 4.0,
        enforce_eager: bool = False,
        max_model_len: Optional[int] = None,
        schedule_type: str = "fcfs",
        enable_starvation_prevent: bool = False,
        disable_log_stats: bool = True,
        **kwargs,
    ) -> None:
        engine_args = EngineArgs(
            model=model,
            tokenizer=tokenizer,
            tokenizer_mode=tokenizer_mode,
            skip_tokenizer_init=skip_tokenizer_init,
            trust_remote_code=trust_remote_code,
            tensor_parallel_size=tensor_parallel_size,
            dtype=dtype,
            quantization=quantization,
            revision=revision,
            seed=seed,
            gpu_memory_utilization=gpu_memory_utilization,
            swap_space=swap_space,
            enforce_eager=enforce_eager,
            max_model_len=max_model_len,
            schedule_type=schedule_type,
            enable_starvation_prevent=enable_starvation_prevent,
            disable_log_stats=disable_log_stats,
            **kwargs,
        )
        self.llm_engine = LLMEngine.from_engine_args(engine_args)
        self.request_counter = Counter()

    def get_tokenizer(self):
        return self.llm_engine.tokenizer

    def generate(
        self,
        prompts: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[SamplingParams,
                                        List[SamplingParams]]] = None,
        prompt_token_ids: Optional[List[List[int]]] = None,
        use_tqdm: bool = True,
        lora_request=None,
    ) -> List[RequestOutput]:
        if prompts is None and prompt_token_ids is None:
            raise ValueError("Either prompts or prompt_token_ids must be "
                             "provided.")
        if isinstance(prompts, str):
            prompts = [prompts]
        num_requests = (len(prompts)
                        if prompts is not None else len(prompt_token_ids))
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, list):
            if len(sampling_params) != num_requests:
                raise ValueError("sampling_params list length must match "
                                 "prompts")
        for i in range(num_requests):
            prompt = prompts[i] if prompts is not None else None
            token_ids = (prompt_token_ids[i]
                         if prompt_token_ids is not None else None)
            sp = (sampling_params[i]
                  if isinstance(sampling_params, list) else sampling_params)
            lr = (lora_request[i]
                  if isinstance(lora_request, list) else lora_request)
            self._add_request(prompt, sp, token_ids, lr)
        return self._run_engine(use_tqdm)

    def _add_request(self, prompt, sampling_params, prompt_token_ids,
                     lora_request=None) -> None:
        request_id = str(next(self.request_counter))
        self.llm_engine.add_request(request_id,
                                    prompt,
                                    sampling_params,
                                    prompt_token_ids=prompt_token_ids,
                                    lora_request=lora_request)

    def _run_engine(self, use_tqdm: bool) -> List[RequestOutput]:
        if use_tqdm:
            num_requests = self.llm_engine.get_num_unfinished_requests()
            pbar = tqdm(total=num_requests,
                        desc="Processed prompts",
                        dynamic_ncols=True)
        outputs: List[RequestOutput] = []
        start = time.time()
        while self.llm_engine.has_unfinished_requests():
            step_outputs = self.llm_engine.step()
            for output in step_outputs:
                if output.finished:
                    # Client-side latency stamp (reference llm.py:236).
                    output.latency = time.time() - start
                    outputs.append(output)
                    if use_tqdm:
                        pbar.update(1)
        if use_tqdm:
            pbar.close()
        # Restore original request order (engine may finish out of order).
        return sorted(outputs, key=lambda x: int(x.request_id))
