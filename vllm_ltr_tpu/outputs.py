"""Client-facing result types.

Behavioral counterpart of reference vllm/outputs.py including the LTR
extensions: per-completion pred_score / aux_model_score
(outputs.py:37-51,123-134), swap accounting, and the client-settable
``latency`` field (:100) used by the benchmark harness.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, Union

from vllm_ltr_tpu.sequence import (PromptLogprobs, RequestMetrics,
                                   SampleLogprobs, SequenceGroup,
                                   SequenceStatus)


@dataclass(eq=False)
class CompletionOutput:
    """One generation stream of a request (n/best_of may produce several)."""
    index: int
    text: str
    token_ids: List[int]
    cumulative_logprob: float
    logprobs: Optional[SampleLogprobs]
    finish_reason: Optional[str] = None
    stop_reason: Union[int, str, None] = None
    lora_request: Optional[object] = None
    # LTR scores: embedded mid-layer predictor / AUX ranking predictor.
    pred_score: Optional[float] = None
    aux_model_score: Optional[float] = None

    def finished(self) -> bool:
        return self.finish_reason is not None

    def __repr__(self) -> str:
        return (f"CompletionOutput#{self.index}(text={self.text!r}, "
                f"tokens={len(self.token_ids)}, "
                f"finish={self.finish_reason}/{self.stop_reason}, "
                f"scores=({self.pred_score}, {self.aux_model_score}))")


@dataclass(eq=False)
class RequestOutput:
    """Everything the engine reports back for one request."""
    request_id: str
    prompt: Optional[str]
    prompt_token_ids: List[int]
    prompt_logprobs: Optional[PromptLogprobs]
    outputs: List[CompletionOutput]
    finished: bool
    metrics: Optional[RequestMetrics] = None
    lora_request: Optional[object] = None
    # Swap accounting surfaced for the benchmark harness.
    swap_out: int = 0
    swap_blocks: int = 0
    # Written by clients that time their own round-trips.
    latency: Optional[float] = None

    @classmethod
    def from_seq_group(cls, group: SequenceGroup) -> "RequestOutput":
        params = group.sampling_params
        all_seqs = group.get_seqs()

        # Pick the n best streams: beam score under beam search, else
        # cumulative logprob.
        if params.use_beam_search:
            rank = lambda s: s.get_beam_search_score(params.length_penalty)
        else:
            rank = lambda s: s.get_cumulative_logprob()
        best = sorted(all_seqs, key=rank, reverse=True)[:params.n]

        want_logprobs = params.logprobs is not None
        completions = []
        for seq in best:
            completions.append(
                CompletionOutput(
                    index=all_seqs.index(seq),
                    text=seq.output_text,
                    token_ids=seq.get_output_token_ids(),
                    cumulative_logprob=seq.get_cumulative_logprob(),
                    logprobs=seq.output_logprobs if want_logprobs else None,
                    finish_reason=SequenceStatus.get_finished_reason(
                        seq.status),
                    stop_reason=seq.stop_reason,
                    pred_score=group.pred_score,
                    aux_model_score=group.aux_model_score,
                ))

        done = group.is_finished()
        if done:
            group.set_finished_time(time.time())
        return cls(
            request_id=group.request_id,
            prompt=group.prompt,
            prompt_token_ids=group.prompt_token_ids,
            prompt_logprobs=group.prompt_logprobs,
            outputs=completions,
            finished=done,
            metrics=group.metrics,
            lora_request=group.lora_request,
            swap_out=group.running_info.swap_out,
            swap_blocks=group.running_info.swap_blocks,
        )

    def __repr__(self) -> str:
        return (f"RequestOutput({self.request_id}, "
                f"finished={self.finished}, "
                f"outputs={self.outputs})")
