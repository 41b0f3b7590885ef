"""Offline batch-generation API.

Behavioral counterpart of reference vllm/entrypoints/llm.py (247 LoC):
continuous-batched generation over a prompt list, the LTR fork's
``schedule_type`` kwarg (llm.py:91) and client-side latency stamping on
finished outputs (llm.py:236).
"""
from __future__ import annotations

import time
from typing import Sequence

import tqdm.auto

from vllm_ltr_tpu.engine.arg_utils import EngineArgs
from vllm_ltr_tpu.engine.llm_engine import LLMEngine
from vllm_ltr_tpu.outputs import RequestOutput
from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.utils import Counter


def _broadcast(value, n: int, what: str) -> list:
    """Expand a scalar-or-list argument to one entry per request."""
    if not isinstance(value, list):
        return [value] * n
    if len(value) != n:
        raise ValueError(f"{what} list length {len(value)} != "
                         f"number of prompts {n}")
    return list(value)


class LLM:
    """Offline batched generation on the TPU serving engine.

    Accepts every :class:`EngineArgs` field as a keyword (notably
    ``schedule_type=`` for the LTR policies, ``tensor_parallel_size=``,
    ``swap_space=``); only the stat-logging default differs (off for
    offline runs).
    """

    def __init__(self, model: str, **engine_kwargs) -> None:
        engine_kwargs.setdefault("disable_log_stats", True)
        args = EngineArgs(model=model, **engine_kwargs)
        self.llm_engine = LLMEngine.from_engine_args(args)
        self.request_counter = Counter()

    def get_tokenizer(self):
        return self.llm_engine.tokenizer

    def generate(
            self, prompts: str | list[str] | None = None,
            sampling_params: (SamplingParams | list[SamplingParams]
                              | None) = None,
            prompt_token_ids: list[list[int]] | None = None,
            use_tqdm: bool = True, lora_request=None,
            multi_modal_data=None) -> list[RequestOutput]:
        if prompts is None and prompt_token_ids is None:
            raise ValueError("provide prompts and/or prompt_token_ids")
        if isinstance(prompts, str):
            prompts = [prompts]  # singleton batch
        n = len(prompts) if prompts is not None else len(prompt_token_ids)

        texts: Sequence = prompts if prompts is not None else [None] * n
        ids: Sequence = (prompt_token_ids
                         if prompt_token_ids is not None else [None] * n)
        params = _broadcast(sampling_params or SamplingParams(), n,
                            "sampling_params")
        loras = _broadcast(lora_request, n, "lora_request")
        mm: Sequence = (multi_modal_data
                        if isinstance(multi_modal_data, list) else
                        [multi_modal_data] * n)

        for text, tok_ids, sp, lr, md in zip(texts, ids, params, loras, mm):
            self.llm_engine.add_request(
                str(next(self.request_counter)), text, sp,
                prompt_token_ids=tok_ids, lora_request=lr,
                multi_modal_data=md)
        return self._drain(use_tqdm)

    def _drain(self, use_tqdm: bool) -> list[RequestOutput]:
        """Step the engine to completion, stamping client-side latency."""
        bar = None
        if use_tqdm:
            pending = self.llm_engine.get_num_unfinished_requests()
            bar = tqdm.auto.tqdm(total=pending, dynamic_ncols=True,
                                 desc="Generating")
        done: list[RequestOutput] = []
        started = time.time()
        while self.llm_engine.has_unfinished_requests():  # step to drain
            for out in self.llm_engine.step():
                if not out.finished:
                    continue
                out.latency = time.time() - started
                done.append(out)
                if bar is not None:
                    bar.update(1)
        if bar is not None:
            bar.close()
        # The scheduler finishes requests out of order; restore submission
        # order for the caller.
        done.sort(key=lambda o: int(o.request_id))
        return done
