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
    """``async_mode`` (``--async-aux-scoring``): instead of blocking
    ``schedule()`` on a predictor round trip (~90 ms/step through the
    relay at trickle arrival rates — round-4 soak attribution),
    dispatches ride the device queue behind the in-flight serving wave
    and results are folded in, non-blocking, at a later scheduling
    pass.  Each request is scored exactly once; while its score is in
    flight it ranks LAST, so it can never outrank scored work — it may
    still be admitted when capacity is otherwise idle (a deliberate
    relaxation of the reference's strict score-before-first-scheduling
    contract: with no contention there is nothing to rank against)."""

    def __init__(self, executor, prefill_predictor_config,
                 async_mode: bool = False) -> None:
        self.executor = executor
        self.config = prefill_predictor_config
        self.async_mode = async_mode
        self.total_scored = 0
        self.total_time = 0.0
        self.total_prefetched = 0
        self.prefetch_hits = 0  # groups whose score had landed by pass time
        # Per-call durations since the last stats drain: aux scoring runs
        # inside schedule() on the critical path (reference SURVEY §3.2
        # boundary note), so its latency is a first-class serving metric.
        self._recent: List[float] = []
        # Dispatched-but-unfetched batches (async mode + prefetch).
        self._pending: List = []  # [(groups, fetch_fn)]
        self._pending_ids: set = set()

    def prefetch(self, seq_groups: List[SequenceGroup]) -> None:
        """Dispatch scoring for new arrivals NOW, off the scheduling
        critical path (score-at-arrival).  The device queues the
        predictor forward behind whatever is executing, so by the time
        the next scheduling pass needs the scores they have usually
        landed — the pass pays a ready-fetch instead of a blocking
        dispatch round trip (~30-90 ms/step at r4/r5 soak attribution).
        Exactness is preserved: ``obtain_aux_scores`` still BLOCKS on
        any prefetch that has not landed, so no request is ever ranked
        or admitted unscored (unlike ``--async-aux-scoring`` /
        ``--lazy-aux-scoring``, both measured negatives under load)."""
        new = [
            g for g in seq_groups if g.need_aux_model_score()
            and g.request_id not in self._pending_ids
        ]
        if not new:
            return
        fetch = self.executor.score_prompts_begin(
            [g.prompt_token_ids for g in new])
        self._pending.append((new, fetch))
        self._pending_ids.update(g.request_id for g in new)
        self.total_prefetched += len(new)

    def poll(self) -> None:
        """Fold in scores from COMPLETED dispatches only — never blocks.
        A dispatch queued behind the in-flight serving wave stays pending
        and its requests simply rank last for one more pass (blocking
        here from the sneak-admission path serialized the whole engine
        to wave boundaries — measured as a collapse at rate 32)."""
        pending, self._pending = self._pending, []
        for groups, fetch in pending:
            if not getattr(fetch, "ready", lambda: True)():
                self._pending.append((groups, fetch))
                continue
            for g, s in zip(groups, fetch()):
                g.set_aux_model_score(float(s))
                self._pending_ids.discard(g.request_id)
                self.total_scored += 1

    def obtain_aux_scores(self,
                          seq_groups: List[SequenceGroup]) -> List[float]:
        t0 = time.time()
        if self.async_mode:
            self.poll()
            new = [
                g for g in seq_groups if g.need_aux_model_score()
                and g.request_id not in self._pending_ids
            ]
            if new:
                fetch = self.executor.score_prompts_begin(
                    [g.prompt_token_ids for g in new])
                self._pending.append((new, fetch))
                self._pending_ids.update(g.request_id for g in new)
            dt = time.time() - t0
            self.total_time += dt
            self._recent.append(dt)
            return []
        # Fold in landed prefetches for free, then BLOCK on any pending
        # prefetch that covers a still-unscored group (the fetch is
        # usually ready — the dispatch overlapped the serving wave).
        if self._pending:
            self.poll()
            self.prefetch_hits += sum(
                1 for g in seq_groups if not g.need_aux_model_score())
            if any(g.request_id in self._pending_ids for g in seq_groups):
                pending, self._pending = self._pending, []
                for groups, fetch in pending:
                    for g, s in zip(groups, fetch()):
                        self._pending_ids.discard(g.request_id)
                        if g.need_aux_model_score():
                            g.set_aux_model_score(float(s))
                            self.total_scored += 1
        remaining = [g for g in seq_groups if g.need_aux_model_score()]
        if remaining:
            prompts = [g.prompt_token_ids for g in remaining]
            scores = self.executor.score_prompts(prompts)
            for g, s in zip(remaining, scores):
                g.set_aux_model_score(float(s))
            self.total_scored += len(remaining)
        dt = time.time() - t0
        self.total_time += dt
        self._recent.append(dt)
        if int(os.environ.get("OPT_TIME", "0")):
            # Reference's ad-hoc scoring timer (scheduler.py:977-982).
            print("OPT-TIME: ", dt)
        return [g.aux_model_score for g in seq_groups]

    def drain_recent_times(self) -> List[float]:
        out, self._recent = self._recent, []
        return out
