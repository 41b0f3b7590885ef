"""Request outputs returned to clients.

Counterpart of reference ``vllm/outputs.py`` incl. LTR fields
(pred_score/aux_model_score, outputs.py:37-51,123-134; latency :100).
"""
from __future__ import annotations

import time
from typing import List, Optional, Union

from vllm_ltr_tpu.sequence import (PromptLogprobs, RequestMetrics,
                                   SampleLogprobs, SequenceGroup,
                                   SequenceStatus)


class CompletionOutput:
    """One completed (or in-progress) generation of a request."""

    def __init__(
        self,
        index: int,
        text: str,
        token_ids: List[int],
        cumulative_logprob: float,
        logprobs: Optional[SampleLogprobs],
        finish_reason: Optional[str] = None,
        stop_reason: Union[int, str, None] = None,
        lora_request: Optional[object] = None,
        pred_score: Optional[float] = None,
        aux_model_score: Optional[float] = None,
    ) -> None:
        self.index = index
        self.text = text
        self.token_ids = token_ids
        self.cumulative_logprob = cumulative_logprob
        self.logprobs = logprobs
        self.finish_reason = finish_reason
        self.stop_reason = stop_reason
        self.lora_request = lora_request
        self.pred_score = pred_score
        self.aux_model_score = aux_model_score

    def finished(self) -> bool:
        return self.finish_reason is not None

    def __repr__(self) -> str:
        return (f"CompletionOutput(index={self.index}, "
                f"text={self.text!r}, "
                f"token_ids={self.token_ids}, "
                f"cumulative_logprob={self.cumulative_logprob}, "
                f"finish_reason={self.finish_reason}, "
                f"stop_reason={self.stop_reason}, "
                f"pred_score={self.pred_score}, "
                f"aux_model_score={self.aux_model_score})")


class RequestOutput:
    """The output of a whole request, carrying swap accounting and the
    client-settable latency field used by the benchmark harness."""

    def __init__(
        self,
        request_id: str,
        prompt: Optional[str],
        prompt_token_ids: List[int],
        prompt_logprobs: Optional[PromptLogprobs],
        outputs: List[CompletionOutput],
        finished: bool,
        metrics: Optional[RequestMetrics] = None,
        lora_request: Optional[object] = None,
        swap_out: int = 0,
        swap_blocks: int = 0,
    ) -> None:
        self.request_id = request_id
        self.prompt = prompt
        self.prompt_token_ids = prompt_token_ids
        self.prompt_logprobs = prompt_logprobs
        self.outputs = outputs
        self.finished = finished
        self.metrics = metrics
        self.lora_request = lora_request
        # Set by clients (reference outputs.py:100; llm.py:236).
        self.latency: Optional[float] = None
        # Swap accounting (reference outputs.py:124-134).
        self.swap_out = swap_out
        self.swap_blocks = swap_blocks

    @classmethod
    def from_seq_group(cls, seq_group: SequenceGroup) -> "RequestOutput":
        seqs = seq_group.get_seqs()
        if seq_group.sampling_params.use_beam_search:
            sorting_key = lambda seq: seq.get_beam_search_score(
                seq_group.sampling_params.length_penalty)
        else:
            sorting_key = lambda seq: seq.get_cumulative_logprob()
        sorted_seqs = sorted(seqs, key=sorting_key, reverse=True)
        top_n_seqs = sorted_seqs[:seq_group.sampling_params.n]

        include_logprobs = seq_group.sampling_params.logprobs is not None
        text_buffer_length = 0
        outputs = [
            CompletionOutput(
                index=seqs.index(seq),
                text=seq.output_text,
                token_ids=seq.get_output_token_ids(),
                cumulative_logprob=seq.get_cumulative_logprob(),
                logprobs=seq.output_logprobs if include_logprobs else None,
                finish_reason=SequenceStatus.get_finished_reason(seq.status),
                stop_reason=seq.stop_reason,
                pred_score=seq_group.pred_score,
                aux_model_score=seq_group.aux_model_score,
            ) for seq in top_n_seqs
        ]

        finished = seq_group.is_finished()
        if finished:
            seq_group.set_finished_time(time.time())
        return cls(
            request_id=seq_group.request_id,
            prompt=seq_group.prompt,
            prompt_token_ids=seq_group.prompt_token_ids,
            prompt_logprobs=seq_group.prompt_logprobs,
            outputs=outputs,
            finished=finished,
            metrics=seq_group.metrics,
            lora_request=seq_group.lora_request,
            swap_out=seq_group.running_info.swap_out,
            swap_blocks=seq_group.running_info.swap_blocks,
        )

    def __repr__(self) -> str:
        return (f"RequestOutput(request_id={self.request_id}, "
                f"prompt={self.prompt!r}, "
                f"outputs={self.outputs}, "
                f"finished={self.finished}, "
                f"metrics={self.metrics})")
