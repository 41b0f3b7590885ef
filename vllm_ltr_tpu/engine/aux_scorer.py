"""AUX predictor scorer bridging scheduler and executor.

Behavioral counterpart of reference ``vllm/engine/aux_llm_engine.py``'s
``obtain_aux_scores`` (:332-412): score each new request exactly once, on its
truncated prompt, before first scheduling. The reference needed a full nested
vLLM engine with fake block allocation and dual Ray workers to share GPUs;
on TPU the predictor is one dense pjit forward on the serving mesh
(SURVEY.md §7 "one process tree, one mesh, two jitted functions").
"""
from __future__ import annotations

import os
import time
from typing import List

from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.sequence import SequenceGroup

logger = init_logger(__name__)


class AuxScorer:

    def __init__(self, executor, prefill_predictor_config) -> None:
        self.executor = executor
        self.config = prefill_predictor_config
        self.total_scored = 0
        self.total_time = 0.0
        # Per-call durations since the last stats drain: aux scoring runs
        # inside schedule() on the critical path (reference SURVEY §3.2
        # boundary note), so its latency is a first-class serving metric.
        self._recent: List[float] = []

    def obtain_aux_scores(self,
                          seq_groups: List[SequenceGroup]) -> List[float]:
        t0 = time.time()
        prompts = [g.prompt_token_ids for g in seq_groups]
        scores = self.executor.score_prompts(prompts)
        for g, s in zip(seq_groups, scores):
            g.set_aux_model_score(float(s))
        dt = time.time() - t0
        self.total_scored += len(seq_groups)
        self.total_time += dt
        self._recent.append(dt)
        if int(os.environ.get("OPT_TIME", "0")):
            # Reference's ad-hoc scoring timer (scheduler.py:977-982).
            print("OPT-TIME: ", dt)
        return [float(s) for s in scores]

    def drain_recent_times(self) -> List[float]:
        out, self._recent = self._recent, []
        return out
