"""Multi-level feedback queue scheduler (the paper's MLFQ baseline).

Behavioral counterpart of reference vllm/core/mlfq_scheduler.py (1,190
LoC): requests enter at level 0; each time a request's accumulated
process time exceeds ``base_quantum * threshold ** level`` it drops one
level (reference :1040-1047).  Starvation prevention hoists requests
idle >= ``starvation_threshold`` seconds back to level 0 every
``starvation_period`` iterations (reference :395-418).

Implementation: the level structure is a dict of per-level lists
(:class:`LevelQueues`); each step flattens it into a ranking and reuses
``Scheduler._ranked_schedule`` — the same pack / reserve / swap engine as
the generalized LTR path — so MLFQ carries no budget or block machinery
of its own.
"""
from __future__ import annotations

import copy, time
from typing import Iterable

from vllm_ltr_tpu.config import CacheConfig, LoRAConfig, SchedulerConfig
from vllm_ltr_tpu.core.scheduler import Scheduler, SchedulerOutputs
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.sequence import SequenceGroup

logger = init_logger(__name__)


class LevelQueues:
    """Requests bucketed by MLFQ level; iteration yields level 0 first,
    FIFO within a level."""

    def __init__(self):
        self._levels: dict[int, list[SequenceGroup]] = {}

    def enqueue(self, group: SequenceGroup, front: bool = False) -> None:
        bucket = self._levels.setdefault(group.get_priority(), [])
        bucket.insert(0, group) if front else bucket.append(group)

    def discard(self, request_id: str) -> None:
        for bucket in self._levels.values():
            for i, g in enumerate(bucket):
                if g.request_id == request_id:
                    del bucket[i]
                    return

    def flatten(self) -> list[SequenceGroup]:
        ordered = sorted(self._levels)
        return [g for level in ordered for g in self._levels[level]]

    def drain_starved(self, cutoff: float) -> list[SequenceGroup]:
        """Remove and return requests whose last scheduling is older than
        ``cutoff``."""
        starved: list[SequenceGroup] = []
        for level, bucket in self._levels.items():
            fresh = []
            for g in bucket:
                (starved if g.lst_process_time <= cutoff else fresh).append(g)
            self._levels[level] = fresh
        return starved

    def __len__(self): return sum(len(b) for b in self._levels.values())


class MLFQScheduler(Scheduler):

    def __init__(self, scheduler_config: SchedulerConfig,
                 cache_config: CacheConfig,
                 lora_config: LoRAConfig | None = None) -> None:
        spec = scheduler_config.schedule_spec
        assert spec.is_mlfq and spec.mlfq is not None
        self._mlfq_cfg = spec.mlfq
        # The base class rejects mlfq specs; hand it a neutral fcfs twin
        # for the lane/block plumbing.
        base = copy.copy(scheduler_config)
        base.schedule_spec = copy.copy(spec)
        base.schedule_spec.policy = "fcfs"
        base.schedule_spec.mlfq = None
        super().__init__(base, cache_config, lora_config)
        self.scheduler_config = scheduler_config  # restore the mlfq spec

        self.base_quantum = self._mlfq_cfg.base_quantum
        self.threshold = self._mlfq_cfg.threshold
        self.starvation_threshold = self._mlfq_cfg.starvation_threshold
        self.starvation_period = self._mlfq_cfg.starvation_period
        self.enable_starvation_prevent = (
            scheduler_config.enable_starvation_prevent)

        self.levels, self.iteration_num = LevelQueues(), 0
        # Groups scheduled last step; they re-enter the levels (with
        # quantum accounting) in free_finished_seq_groups.
        self.real_running: list[SequenceGroup] = []

    # ------------------------------------------------------------------

    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        seq_group.set_priority(0)  # everyone starts at the top level
        seq_group.process_time, seq_group.lst_process_time = 0.0, time.time()
        self.levels.enqueue(seq_group)
        super().add_seq_group(seq_group)

    def abort_seq_group(self, request_id: str | Iterable[str]) -> None:
        ids = (request_id, ) if isinstance(request_id, str) else request_id
        for rid in ids:
            self.levels.discard(rid)
        super().abort_seq_group(request_id)

    def prevent_starvation(self) -> None:
        """Hoist long-idle requests back to level 0 (reference :395-418)."""
        cutoff = time.time() - self.starvation_threshold
        for group in self.levels.drain_starved(cutoff):
            group.set_priority(0)
            self.levels.enqueue(group, front=True)

    # ------------------------------------------------------------------

    def _schedule(self) -> SchedulerOutputs:
        self.iteration_num = self.iteration_num + 1
        if (self.enable_starvation_prevent
                and self.iteration_num % self.starvation_period == 0):
            self.prevent_starvation()

        ranking = self.levels.flatten()
        # Defensive dedupe: packing the same group twice corrupts lane
        # state (the pack/reserve engine assumes a set).
        seen: set[int] = set()
        ranking = [
            g for g in ranking
            if not (id(g) in seen or seen.add(id(g)))
        ]
        outputs, executing = self._ranked_schedule(ranking, need_score=False)

        # Scheduled groups leave the level structure until they come back
        # through free_finished_seq_groups with updated quantum accounting.
        stamp = time.time()
        for pick in executing:
            self.levels.discard(pick.group.request_id)
            pick.group.lst_process_time = stamp
        self.real_running = [s.seq_group for s in outputs.scheduled_seq_groups]
        return outputs

    # ------------------------------------------------------------------

    def free_finished_seq_groups(self) -> None:
        """Re-queue unfinished scheduled requests, demoting any that have
        used up their level's quantum (reference :1040-1047).

        ``real_running`` is consumed exactly once: with pipelined
        admission the engine calls step_finish (and therefore this hook)
        once per dispatched plan — a full step plus any sneak-admission
        plans — and re-enqueuing the same groups on the second call put
        duplicates into the level queues, which the next ranked pass
        then packed twice (the round-4 online mlfq@32 crash:
        ``self.running.remove(group)`` on the second copy)."""
        drained, self.real_running = self.real_running, []
        for group in drained:
            if group.is_finished():
                continue
            now = time.time()
            group.process_time += now - group.lst_process_time
            quantum = self.base_quantum * self.threshold**group.get_priority()
            if group.process_time > quantum:
                group.set_priority(group.get_priority() + 1)
                group.process_time = 0.0
            self.levels.enqueue(group, front=True)

        for group in self.running:
            if group.is_finished():
                self.levels.discard(group.request_id)
        self.running = [g for g in self.running if not g.is_finished()]
