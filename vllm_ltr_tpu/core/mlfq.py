"""Multi-level feedback queue scheduler (the paper's MLFQ baseline).

Behavioral counterpart of reference ``vllm/core/mlfq_scheduler.py`` (1,190
LoC): requests start in the top priority queue; after each scheduled step a
request accumulates process time and is demoted one level when
``process_time > base_quantum * threshold ** priority``
(reference :1040-1047). Starvation prevention promotes requests idle
>= ``starvation_threshold`` seconds back to the top queue every
``starvation_period`` iterations (reference :395-418). Budget packing and
block reservation reuse the generalized scheduler's machinery.
"""
from __future__ import annotations

import time
from collections import deque
from typing import Dict, Iterable, List, Optional, Union

from vllm_ltr_tpu.config import CacheConfig, LoRAConfig, SchedulerConfig
from vllm_ltr_tpu.core.block_manager import AllocStatus
from vllm_ltr_tpu.core.scheduler import (Scheduler, SchedulerOutputs,
                                         SchedulerPrefillOutputs,
                                         SchedulerRunningOutputs,
                                         SchedulerSwappedInOutputs,
                                         ScheduledSequenceGroup,
                                         SchedulingBudget)
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.sequence import SequenceGroup, SequenceStatus

logger = init_logger(__name__)


class PriorityQueue:

    def __init__(self, priority: int):
        self.priority = priority
        self.requests: List[SequenceGroup] = []

    def push_front(self, request) -> None:
        self.requests.insert(0, request)

    def push_back(self, request) -> None:
        self.requests.append(request)

    def pop_front(self):
        return self.requests.pop(0)

    def __len__(self):
        return len(self.requests)


class PriorityQueues:

    def __init__(self):
        self.queues: List[PriorityQueue] = []

    def add_new_queue(self, priority: int) -> None:
        for p in range(len(self.queues), priority + 1):
            self.queues.append(PriorityQueue(p))

    def push_back(self, request) -> None:
        self.add_new_queue(request.get_priority())
        self.queues[request.get_priority()].push_back(request)

    def push_front(self, request) -> None:
        self.add_new_queue(request.get_priority())
        self.queues[request.get_priority()].push_front(request)

    def del_request(self, request_id) -> None:
        for queue in self.queues:
            for i, request in enumerate(queue.requests):
                if request.request_id == request_id:
                    del queue.requests[i]
                    return

    def queue_list(self) -> List[SequenceGroup]:
        out: List[SequenceGroup] = []
        for queue in self.queues:
            out.extend(queue.requests)
        return out

    def __len__(self):
        return sum(len(q) for q in self.queues)


class MLFQScheduler(Scheduler):

    def __init__(self,
                 scheduler_config: SchedulerConfig,
                 cache_config: CacheConfig,
                 lora_config: Optional[LoRAConfig] = None) -> None:
        # Parent init builds queues/block manager; the mlfq spec carries the
        # quantum parameters.
        spec = scheduler_config.schedule_spec
        assert spec.is_mlfq and spec.mlfq is not None
        self._mlfq_cfg = spec.mlfq
        # Trick the parent constructor (it rejects mlfq): temporarily
        # present as fcfs for the base-class plumbing.
        import copy
        base_config = copy.copy(scheduler_config)
        base_config.schedule_spec = copy.copy(spec)
        base_config.schedule_spec.policy = "fcfs"
        base_config.schedule_spec.mlfq = None
        super().__init__(base_config, cache_config, lora_config)
        self.scheduler_config = scheduler_config

        self.base_quantum = self._mlfq_cfg.base_quantum
        self.threshold = self._mlfq_cfg.threshold
        self.starvation_threshold = self._mlfq_cfg.starvation_threshold
        self.starvation_period = self._mlfq_cfg.starvation_period
        self.enable_starvation_prevent = (
            scheduler_config.enable_starvation_prevent)

        self.priority_queues = PriorityQueues()
        self.iteration_num = 0
        # Requests scheduled in the last step (not currently in the queues).
        self.real_running: List[SequenceGroup] = []

    # ------------------------------------------------------------------

    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        seq_group.set_priority(0)
        seq_group.process_time = 0.0
        seq_group.lst_process_time = time.time()
        self.priority_queues.push_back(seq_group)
        super().add_seq_group(seq_group)

    def abort_seq_group(self, request_id: Union[str, Iterable[str]]) -> None:
        ids = (request_id, ) if isinstance(request_id, str) else request_id
        for rid in ids:
            self.priority_queues.del_request(rid)
        super().abort_seq_group(request_id)

    def prevent_starvation(self) -> None:
        """Promote requests idle >= starvation_threshold seconds to the top
        queue (reference :395-418)."""
        promote: List[SequenceGroup] = []
        cur_time = time.time()
        for q in self.priority_queues.queues:
            keep = []
            for request in q.requests:
                if cur_time - request.lst_process_time >= (
                        self.starvation_threshold):
                    promote.append(request)
                else:
                    keep.append(request)
            q.requests = keep
        for request in promote:
            request.set_priority(0)
            self.priority_queues.push_front(request)

    # ------------------------------------------------------------------

    def _schedule(self) -> SchedulerOutputs:
        self.iteration_num += 1
        if (self.enable_starvation_prevent
                and self.iteration_num % self.starvation_period == 0):
            self.prevent_starvation()

        ordered_requests = self.priority_queues.queue_list()
        original_len = self.get_num_unfinished_seq_groups()

        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs)
        final_budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs)

        remaining_waiting = self.waiting
        remaining_running = self.running
        remaining_swapped = self.swapped

        selected: List[SequenceGroup] = []
        gpu_block_required = 0
        num_new_tokens_map: Dict[str, int] = {}
        num_new_seqs_map: Dict[str, int] = {}

        for seq_group in ordered_requests:
            seq = seq_group.get_seqs()[0]
            if seq_group in remaining_running:
                num_new_tokens = self._get_num_new_tokens(
                    seq_group, SequenceStatus.RUNNING, True, budget)
                if num_new_tokens == 0:
                    break
                num_new_seqs = seq_group.get_max_num_running_seqs()
                if not budget.can_schedule(num_new_tokens=num_new_tokens,
                                           num_new_seqs=num_new_seqs):
                    break
                gpu_block_required += num_new_seqs
            elif seq_group in remaining_swapped:
                num_new_seqs = seq_group.get_max_num_running_seqs()
                num_new_tokens = self._get_num_new_tokens(
                    seq_group, SequenceStatus.SWAPPED, True, budget)
                if (num_new_tokens == 0 or not budget.can_schedule(
                        num_new_tokens=num_new_tokens,
                        num_new_seqs=num_new_seqs)):
                    break
                gpu_block_required += (
                    len(self.block_manager._get_physical_blocks(seq_group)) +
                    seq_group.num_seqs(status=SequenceStatus.SWAPPED))
            elif seq_group in remaining_waiting:
                num_new_tokens = self._get_num_new_tokens(
                    seq_group, SequenceStatus.WAITING, True, budget)
                num_new_seqs = seq_group.get_max_num_running_seqs()
                if (num_new_tokens == 0 or not budget.can_schedule(
                        num_new_tokens=num_new_tokens,
                        num_new_seqs=num_new_seqs)):
                    break
                gpu_block_required += len(seq.logical_token_blocks)
            else:
                raise AssertionError("mlfq request not in any queue")
            budget.add_num_batched_tokens(seq_group.request_id,
                                          num_new_tokens)
            budget.add_num_seqs(seq_group.request_id, num_new_seqs)
            num_new_tokens_map[seq_group.request_id] = num_new_tokens
            num_new_seqs_map[seq_group.request_id] = num_new_seqs
            selected.append(seq_group)

        for seq_group in selected:
            self.priority_queues.del_request(seq_group.request_id)
        victims = self.priority_queues.queue_list()

        (execute_pinned, preempted, swapped_out, blocks_to_swap_out,
         blocks_to_swap_in) = self._reserve_free_blocks(
             gpu_block_required, selected, victims, remaining_running,
             final_budget, num_new_tokens_map, num_new_seqs_map)

        # Un-pinned (pushed-back) requests return to the FRONT of their
        # priority queue (they were highest-priority among the popped).
        unpinned = [g for g in selected if g not in execute_pinned]
        for seq_group in reversed(unpinned):
            self.priority_queues.push_front(seq_group)

        blocks_to_copy: Dict[int, List[int]] = {}
        exe_waiting, exe_run_prefill, exe_run_decode = [], [], []
        exe_swap_prefill, exe_swap_decode = [], []

        now = time.time()
        for seq_group in execute_pinned:
            token_chunk = num_new_tokens_map[seq_group.request_id]
            if seq_group in remaining_waiting:
                remaining_waiting.remove(seq_group)
                assert self.block_manager.can_allocate(
                    seq_group) == AllocStatus.OK
                self._allocate_and_set_running(seq_group)
                seq_group.lst_process_time = now
                exe_waiting.append(
                    ScheduledSequenceGroup(seq_group,
                                           token_chunk_size=token_chunk))
            elif seq_group in remaining_running:
                remaining_running.remove(seq_group)
                assert self.block_manager.can_append_slots(seq_group)
                self._append_slots(seq_group, blocks_to_copy)
                seq_group.lst_process_time = now
                if seq_group.is_prefill():
                    exe_run_prefill.append(
                        ScheduledSequenceGroup(seq_group,
                                               token_chunk_size=token_chunk))
                else:
                    exe_run_decode.append(
                        ScheduledSequenceGroup(seq_group,
                                               token_chunk_size=1))
            elif seq_group in remaining_swapped:
                remaining_swapped.remove(seq_group)
                assert self.block_manager.can_append_slots(seq_group)
                self._append_slots(seq_group, blocks_to_copy)
                seq_group.lst_process_time = now
                if seq_group.is_prefill():
                    exe_swap_prefill.append(
                        ScheduledSequenceGroup(seq_group,
                                               token_chunk_size=token_chunk))
                else:
                    exe_swap_decode.append(
                        ScheduledSequenceGroup(seq_group,
                                               token_chunk_size=1))
            else:
                raise AssertionError("pinned mlfq request not in any queue")

        prefills = SchedulerPrefillOutputs(
            seq_groups=exe_waiting,
            ignored_seq_groups=[],
            num_lookahead_slots=0)
        swapped_in = SchedulerSwappedInOutputs(
            decode_seq_groups=exe_swap_decode,
            prefill_seq_groups=exe_swap_prefill,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_copy=blocks_to_copy,
            num_lookahead_slots=0)
        running_scheduled = SchedulerRunningOutputs(
            decode_seq_groups=exe_run_decode,
            prefill_seq_groups=exe_run_prefill,
            preempted=preempted,
            swapped_out=swapped_out,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            num_lookahead_slots=0)

        self.waiting = remaining_waiting
        self.waiting.extendleft(running_scheduled.preempted)
        self.running = remaining_running
        for group in (prefills.seq_groups + running_scheduled.decode_seq_groups
                      + running_scheduled.prefill_seq_groups +
                      swapped_in.decode_seq_groups +
                      swapped_in.prefill_seq_groups):
            self.running.append(group.seq_group)
        self.swapped = remaining_swapped
        self.swapped.extend(running_scheduled.swapped_out)

        ret = SchedulerOutputs(
            scheduled_seq_groups=(prefills.seq_groups +
                                  running_scheduled.prefill_seq_groups +
                                  swapped_in.prefill_seq_groups +
                                  running_scheduled.decode_seq_groups +
                                  swapped_in.decode_seq_groups),
            num_prefill_groups=(len(prefills.seq_groups) +
                                len(swapped_in.prefill_seq_groups) +
                                len(running_scheduled.prefill_seq_groups)),
            num_batched_tokens=final_budget.num_batched_tokens,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            ignored_seq_groups=[],
            num_lookahead_slots=0,
            need_score=False,
            allow_both_swap=True)
        self.real_running = [s.seq_group for s in ret.scheduled_seq_groups]
        assert self.get_num_unfinished_seq_groups() == original_len
        return ret

    # ------------------------------------------------------------------

    def free_finished_seq_groups(self) -> None:
        """Re-queue unfinished scheduled requests, applying quantum demotion
        (reference :1040-1047)."""
        new_real_running = []
        for seq_group in self.real_running:
            if not seq_group.is_finished():
                current_time = time.time()
                seq_group.process_time += (current_time -
                                           seq_group.lst_process_time)
                if seq_group.process_time > self.base_quantum * pow(
                        self.threshold, seq_group.get_priority()):
                    seq_group.set_priority(seq_group.get_priority() + 1)
                    seq_group.process_time = 0
                self.priority_queues.push_front(seq_group)
                new_real_running.append(seq_group)
        self.real_running = new_real_running

        # Victim requests swapped out by reserve_free_blocks stayed in the
        # priority queues; finished requests leave every structure.
        for seq_group in list(self.running):
            if seq_group.is_finished():
                self.priority_queues.del_request(seq_group.request_id)
        self.running = deque(g for g in self.running if not g.is_finished())
