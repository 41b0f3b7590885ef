"""Request scheduler with generalized (rank-ordered) scheduling.

Behavioral counterpart of reference ``vllm/core/scheduler.py`` (1,888 LoC):

* the stock vLLM-0.4.1 default path (prefill-first batching with
  swap-priority, reference :763-855) and chunked-prefill path (:1505-1592),
* the LTR fork's **generalized priority scheduler**: every step, globally
  re-order *all* requests (waiting + running + swapped) by a pluggable policy,
  greedily pack the token/seq budget from the top, and preempt/swap the
  lowest-priority victims to make the needed KV blocks free
  (``_general_schedule`` :1101-1373, ``reserve_free_blocks`` :1376-1502),
* starvation control (promote requests idle >= N steps for M steps, :984-996),
* synthetic-data-gen / timelimit termination (:1697-1721),
* fake allocation for the AUX predictor engine (:1647-1650).

The scheduler is pure host Python with no device dependencies: on TPU it runs
on the controller host and its outputs feed the pjit-compiled model step.
"""
from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from typing import Deque, Dict, Iterable, List, Optional, Set, Tuple, Union

from vllm_ltr_tpu.config import (CacheConfig, LoRAConfig, ScheduleSpec,
                                 SchedulerConfig)
from vllm_ltr_tpu.core.block_manager import AllocStatus, BlockSpaceManager
from vllm_ltr_tpu.core.policy import (Policy, PolicyContext, PolicyFactory,
                                      get_ordering_fn)
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.sequence import (Sequence, SequenceData, SequenceGroup,
                                   SequenceGroupMetadata, SequenceStatus)
from vllm_ltr_tpu.utils import merge_dicts

logger = init_logger(__name__)

import enum


class PreemptionMode(enum.Enum):
    """SWAP: copy KV blocks to the host mirror and back later.
    RECOMPUTE: drop the KV and re-prefill from scratch (lower overhead for
    single-sequence groups)."""
    SWAP = enum.auto()
    RECOMPUTE = enum.auto()


@dataclass
class SchedulingBudget:
    """Per-step token/sequence budget. A request id is only counted once even
    if add is called twice for it."""
    token_budget: int
    max_num_seqs: int
    _request_ids_num_batched_tokens: Set[str] = field(default_factory=set)
    _request_ids_num_curr_seqs: Set[str] = field(default_factory=set)
    _num_batched_tokens: int = 0
    _num_curr_seqs: int = 0

    def can_schedule(self, *, num_new_tokens: int, num_new_seqs: int):
        assert num_new_tokens != 0
        assert num_new_seqs != 0
        return (self.num_batched_tokens + num_new_tokens <= self.token_budget
                and self.num_curr_seqs + num_new_seqs <= self.max_num_seqs)

    def remaining_token_budget(self):
        return self.token_budget - self.num_batched_tokens

    def add_num_batched_tokens(self, req_id: str, num_batched_tokens: int):
        if req_id in self._request_ids_num_batched_tokens:
            return
        self._request_ids_num_batched_tokens.add(req_id)
        self._num_batched_tokens += num_batched_tokens

    def subtract_num_batched_tokens(self, req_id: str,
                                    num_batched_tokens: int):
        if req_id in self._request_ids_num_batched_tokens:
            self._request_ids_num_batched_tokens.remove(req_id)
            self._num_batched_tokens -= num_batched_tokens

    def add_num_seqs(self, req_id: str, num_curr_seqs: int):
        if req_id in self._request_ids_num_curr_seqs:
            return
        self._request_ids_num_curr_seqs.add(req_id)
        self._num_curr_seqs += num_curr_seqs

    def subtract_num_seqs(self, req_id: str, num_curr_seqs: int):
        if req_id in self._request_ids_num_curr_seqs:
            self._request_ids_num_curr_seqs.remove(req_id)
            self._num_curr_seqs -= num_curr_seqs

    @property
    def num_batched_tokens(self):
        return self._num_batched_tokens

    @property
    def num_curr_seqs(self):
        return self._num_curr_seqs


@dataclass
class ScheduledSequenceGroup:
    seq_group: SequenceGroup
    # The total chunk size (number of tokens) to process for next iteration.
    # 1 for decode. Same as prompt tokens for prefill, but if prefill is
    # chunked, it can be smaller than that.
    token_chunk_size: int


@dataclass
class SchedulerOutputs:
    """The per-step scheduling decision handed to the engine/executor."""
    scheduled_seq_groups: List[ScheduledSequenceGroup]
    num_prefill_groups: int
    num_batched_tokens: int
    # device<->host KV block moves (block number -> block number).
    blocks_to_swap_in: Dict[int, int]
    blocks_to_swap_out: Dict[int, int]
    # CoW: src device block -> list of dst device blocks.
    blocks_to_copy: Dict[int, List[int]]
    ignored_seq_groups: List[SequenceGroup]
    num_lookahead_slots: int
    # LTR: whether the model should produce predictor scores this step.
    need_score: bool = False
    # Generalized path may both swap in and out in one step.
    allow_both_swap: bool = False

    def __post_init__(self):
        # Swap in and swap out should never happen at the same time on the
        # stock paths (the generalized path explicitly allows it).
        if not self.allow_both_swap:
            assert not (self.blocks_to_swap_in and self.blocks_to_swap_out)

    def is_empty(self) -> bool:
        # NOTE: We do not consider the ignored sequence groups.
        return (not self.scheduled_seq_groups and not self.blocks_to_swap_in
                and not self.blocks_to_swap_out and not self.blocks_to_copy)


@dataclass
class SchedulerRunningOutputs:
    decode_seq_groups: List[ScheduledSequenceGroup]
    prefill_seq_groups: List[ScheduledSequenceGroup]
    preempted: List[SequenceGroup]
    swapped_out: List[SequenceGroup]
    blocks_to_swap_out: Dict[int, int]
    blocks_to_copy: Dict[int, List[int]]
    num_lookahead_slots: int

    @classmethod
    def create_empty(cls) -> "SchedulerRunningOutputs":
        return cls([], [], [], [], {}, {}, 0)


@dataclass
class SchedulerSwappedInOutputs:
    decode_seq_groups: List[ScheduledSequenceGroup]
    prefill_seq_groups: List[ScheduledSequenceGroup]
    blocks_to_swap_in: Dict[int, int]
    blocks_to_copy: Dict[int, List[int]]
    num_lookahead_slots: int

    @classmethod
    def create_empty(cls) -> "SchedulerSwappedInOutputs":
        return cls([], [], {}, {}, 0)


@dataclass
class SchedulerPrefillOutputs:
    seq_groups: List[ScheduledSequenceGroup]
    ignored_seq_groups: List[SequenceGroup]
    num_lookahead_slots: int

    @classmethod
    def create_empty(cls) -> "SchedulerPrefillOutputs":
        return cls([], [], 0)


class Scheduler:

    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        lora_config: Optional[LoRAConfig] = None,
    ) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.lora_config = lora_config

        if self.scheduler_config.chunked_prefill_enabled:
            self.prompt_limit = self.scheduler_config.max_model_len
        else:
            self.prompt_limit = min(
                self.scheduler_config.max_model_len,
                self.scheduler_config.max_num_batched_tokens)

        self.spec: ScheduleSpec = scheduler_config.schedule_spec
        assert not self.spec.is_mlfq, (
            "Use MLFQScheduler for mlfq schedule types.")

        # xpt distribution (score buckets -> expected lengths).
        self._distribution: Optional[Tuple[List[float], List[float]]] = None
        if self.spec.distribution_path:
            self._distribution = _load_distribution(
                self.spec.distribution_path)
        self._policy_records: List[float] = []

        # Synthetic-bound finished-request counters.
        self._finished_req = [0 for _ in self.spec.synthetic_bounds]
        self.start_time = time.time()

        self.block_manager = BlockSpaceManager(
            block_size=self.cache_config.block_size,
            num_gpu_blocks=self.cache_config.num_gpu_blocks or 0,
            num_cpu_blocks=self.cache_config.num_cpu_blocks or 0,
            sliding_window=self.cache_config.sliding_window,
            enable_caching=self.cache_config.enable_prefix_caching)

        # The AUX predictor scorer; attached by the engine when the schedule
        # policy needs learned scores (reference llm_engine.py:224-242).
        self.aux_model = None

        self.waiting: Deque[SequenceGroup] = deque()
        self.running: Deque[SequenceGroup] = deque()
        self.swapped: Deque[SequenceGroup] = deque()

        # Time at previous scheduling step / prompt-delay state.
        self.prev_time = 0.0
        self.prev_prompt = False
        self.last_prompt_latency = 0.0
        self.fake_allocate = scheduler_config.fake_allocate

    @property
    def lora_enabled(self) -> bool:
        return bool(self.lora_config)

    @property
    def num_decoding_tokens_per_seq(self) -> int:
        return 1

    # ------------------------------------------------------------------
    # Queue management
    # ------------------------------------------------------------------

    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        self.waiting.append(seq_group)
        seq_group.idle = 0
        seq_group.runs = 0
        seq_group.pri = 0

    def abort_seq_group(self, request_id: Union[str, Iterable[str]]) -> None:
        if isinstance(request_id, str):
            request_id = (request_id, )
        request_ids = set(request_id)
        for state_queue in [self.waiting, self.running, self.swapped]:
            aborted_groups: List[SequenceGroup] = []
            for seq_group in state_queue:
                if not request_ids:
                    break
                if seq_group.request_id in request_ids:
                    aborted_groups.append(seq_group)
                    request_ids.remove(seq_group.request_id)
            for aborted_group in aborted_groups:
                state_queue.remove(aborted_group)
                for seq in aborted_group.get_seqs():
                    if seq.is_finished():
                        continue
                    seq.status = SequenceStatus.FINISHED_ABORTED
                    self.free_seq(seq)

    def has_unfinished_seqs(self) -> bool:
        return bool(self.waiting or self.running or self.swapped)

    def get_num_unfinished_seq_groups(self) -> int:
        return len(self.waiting) + len(self.running) + len(self.swapped)

    # ------------------------------------------------------------------
    # Stock scheduling paths
    # ------------------------------------------------------------------

    def _schedule_running(
        self,
        running_queue: Deque[SequenceGroup],
        budget: SchedulingBudget,
        curr_loras: Optional[Set[int]],
        policy: Policy,
        enable_chunking: bool = False,
    ) -> Tuple[Deque[SequenceGroup], SchedulerRunningOutputs]:
        """Schedule requests that are already running; preempt from the tail
        of the priority-sorted queue when KV space runs out."""
        blocks_to_swap_out: Dict[int, int] = {}
        blocks_to_copy: Dict[int, List[int]] = {}
        decode_seq_groups: List[ScheduledSequenceGroup] = []
        prefill_seq_groups: List[ScheduledSequenceGroup] = []
        preempted: List[SequenceGroup] = []
        swapped_out: List[SequenceGroup] = []

        now = time.time()
        running_queue = policy.sort_by_priority(now, running_queue)

        while running_queue:
            seq_group = running_queue[0]
            num_running_tokens = self._get_num_new_tokens(
                seq_group, SequenceStatus.RUNNING, enable_chunking, budget)
            if num_running_tokens == 0:
                break
            running_queue.popleft()
            while not self._can_append_slots(seq_group):
                budget.subtract_num_batched_tokens(seq_group.request_id,
                                                   num_running_tokens)
                num_running_seqs = seq_group.get_max_num_running_seqs()
                budget.subtract_num_seqs(seq_group.request_id,
                                         num_running_seqs)
                if curr_loras is not None and seq_group.lora_int_id > 0:
                    curr_loras.discard(seq_group.lora_int_id)
                if running_queue:
                    # Preempt the lowest-priority sequence group.
                    victim_seq_group = running_queue.pop()
                    preempted_mode = self._preempt(victim_seq_group,
                                                   blocks_to_swap_out)
                    if preempted_mode == PreemptionMode.RECOMPUTE:
                        preempted.append(victim_seq_group)
                    else:
                        swapped_out.append(victim_seq_group)
                else:
                    # No other sequence group to preempt: preempt itself.
                    preempted_mode = self._preempt(seq_group,
                                                   blocks_to_swap_out)
                    if preempted_mode == PreemptionMode.RECOMPUTE:
                        preempted.append(seq_group)
                    else:
                        swapped_out.append(seq_group)
                    break
            else:
                self._append_slots(seq_group, blocks_to_copy)
                is_prefill = seq_group.is_prefill()
                if is_prefill:
                    prefill_seq_groups.append(
                        ScheduledSequenceGroup(
                            seq_group=seq_group,
                            token_chunk_size=num_running_tokens))
                else:
                    decode_seq_groups.append(
                        ScheduledSequenceGroup(seq_group=seq_group,
                                               token_chunk_size=1))
                budget.add_num_batched_tokens(seq_group.request_id,
                                              num_running_tokens)
                # Sequence count was charged when the request first entered
                # the running set; only chunked prefill needs the re-add.
                if enable_chunking:
                    num_running_seqs = seq_group.get_max_num_running_seqs()
                    budget.add_num_seqs(seq_group.request_id,
                                        num_running_seqs)
                if curr_loras is not None and seq_group.lora_int_id > 0:
                    curr_loras.add(seq_group.lora_int_id)

        return running_queue, SchedulerRunningOutputs(
            decode_seq_groups=decode_seq_groups,
            prefill_seq_groups=prefill_seq_groups,
            preempted=preempted,
            swapped_out=swapped_out,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            num_lookahead_slots=self._get_num_lookahead_slots(
                is_prefill=False))

    def _schedule_swapped(
        self,
        swapped_queue: Deque[SequenceGroup],
        budget: SchedulingBudget,
        curr_loras: Optional[Set[int]],
        policy: Policy,
        enable_chunking: bool = False,
    ) -> Tuple[Deque[SequenceGroup], SchedulerSwappedInOutputs]:
        blocks_to_swap_in: Dict[int, int] = {}
        blocks_to_copy: Dict[int, List[int]] = {}
        decode_seq_groups: List[ScheduledSequenceGroup] = []
        prefill_seq_groups: List[ScheduledSequenceGroup] = []
        now = time.time()
        swapped_queue = policy.sort_by_priority(now, swapped_queue)
        leftover_swapped: Deque[SequenceGroup] = deque()

        while swapped_queue:
            seq_group = swapped_queue[0]
            is_prefill = seq_group.is_prefill()
            if not self.block_manager.can_swap_in(seq_group):
                break

            lora_int_id = 0
            if self.lora_enabled:
                lora_int_id = seq_group.lora_int_id
                if (lora_int_id > 0 and lora_int_id not in curr_loras
                        and len(curr_loras) >= self.lora_config.max_loras):
                    leftover_swapped.appendleft(seq_group)
                    swapped_queue.popleft()
                    continue

            num_new_seqs = seq_group.get_max_num_running_seqs()
            num_new_tokens = self._get_num_new_tokens(seq_group,
                                                      SequenceStatus.SWAPPED,
                                                      enable_chunking, budget)
            if (num_new_tokens == 0
                    or not budget.can_schedule(num_new_tokens=num_new_tokens,
                                               num_new_seqs=num_new_seqs)):
                break

            if lora_int_id > 0 and curr_loras is not None:
                curr_loras.add(lora_int_id)
            swapped_queue.popleft()
            self._swap_in(seq_group, blocks_to_swap_in)
            self._append_slots(seq_group, blocks_to_copy)
            if is_prefill:
                prefill_seq_groups.append(
                    ScheduledSequenceGroup(seq_group,
                                           token_chunk_size=num_new_tokens))
            else:
                decode_seq_groups.append(
                    ScheduledSequenceGroup(seq_group, token_chunk_size=1))
            budget.add_num_batched_tokens(seq_group.request_id,
                                          num_new_tokens)
            budget.add_num_seqs(seq_group.request_id, num_new_seqs)

        swapped_queue.extendleft(leftover_swapped)
        return swapped_queue, SchedulerSwappedInOutputs(
            decode_seq_groups=decode_seq_groups,
            prefill_seq_groups=prefill_seq_groups,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_copy=blocks_to_copy,
            num_lookahead_slots=self._get_num_lookahead_slots(
                is_prefill=False))

    def _schedule_prefills(
        self,
        waiting_queue: Deque[SequenceGroup],
        budget: SchedulingBudget,
        curr_loras: Optional[Set[int]],
        enable_chunking: bool = False,
    ) -> Tuple[Deque[SequenceGroup], SchedulerPrefillOutputs]:
        ignored_seq_groups: List[SequenceGroup] = []
        seq_groups: List[ScheduledSequenceGroup] = []
        # Copy to avoid mutating the caller's deque until commit below.
        waiting_queue = deque([s for s in waiting_queue])

        leftover_waiting_sequences: Deque[SequenceGroup] = deque()
        while self._passed_delay(time.time()) and waiting_queue:
            seq_group = waiting_queue[0]

            waiting_seqs = seq_group.get_seqs(status=SequenceStatus.WAITING)
            assert len(waiting_seqs) == 1, (
                "Waiting sequence group should have only one prompt "
                "sequence.")
            num_new_tokens = self._get_num_new_tokens(seq_group,
                                                      SequenceStatus.WAITING,
                                                      enable_chunking, budget)
            if not enable_chunking:
                num_prompt_tokens = waiting_seqs[0].get_len()
                assert num_new_tokens == num_prompt_tokens

            if num_new_tokens > self.prompt_limit:
                logger.warning(
                    "Input prompt (%d tokens) is too long and exceeds limit "
                    "of %d", num_new_tokens, self.prompt_limit)
                for seq in waiting_seqs:
                    seq.status = SequenceStatus.FINISHED_IGNORED
                ignored_seq_groups.append(seq_group)
                waiting_queue.popleft()
                continue

            if self.fake_allocate:
                can_allocate = AllocStatus.OK
            else:
                can_allocate = self.block_manager.can_allocate(seq_group)
                if can_allocate == AllocStatus.LATER:
                    break
                elif can_allocate == AllocStatus.NEVER:
                    logger.warning(
                        "Input prompt (%d tokens) is too long and exceeds "
                        "the capacity of block_manager", num_new_tokens)
                    for seq in waiting_seqs:
                        seq.status = SequenceStatus.FINISHED_IGNORED
                    ignored_seq_groups.append(seq_group)
                    waiting_queue.popleft()
                    continue

            lora_int_id = 0
            if self.lora_enabled:
                lora_int_id = seq_group.lora_int_id
                if (lora_int_id > 0 and lora_int_id not in curr_loras
                        and len(curr_loras) >= self.lora_config.max_loras):
                    leftover_waiting_sequences.appendleft(seq_group)
                    waiting_queue.popleft()
                    continue

            num_new_seqs = seq_group.get_max_num_running_seqs()
            if (num_new_tokens == 0
                    or not budget.can_schedule(num_new_tokens=num_new_tokens,
                                               num_new_seqs=num_new_seqs)):
                break

            # Can schedule this request.
            if curr_loras is not None and lora_int_id > 0:
                curr_loras.add(lora_int_id)
            waiting_queue.popleft()
            if self.fake_allocate:
                self._fake_allocate_and_set_running(seq_group)
            else:
                self._allocate_and_set_running(seq_group)
            seq_groups.append(
                ScheduledSequenceGroup(seq_group=seq_group,
                                       token_chunk_size=num_new_tokens))
            budget.add_num_batched_tokens(seq_group.request_id,
                                          num_new_tokens)
            budget.add_num_seqs(seq_group.request_id, num_new_seqs)

        waiting_queue.extendleft(leftover_waiting_sequences)
        if len(seq_groups) > 0:
            self.prev_prompt = True

        return waiting_queue, SchedulerPrefillOutputs(
            seq_groups=seq_groups,
            ignored_seq_groups=ignored_seq_groups,
            num_lookahead_slots=self._get_num_lookahead_slots(
                is_prefill=True))

    def _schedule_default(self) -> SchedulerOutputs:
        """Prefill-first batching: prefer new prompts; only run decodes when
        no prefill was scheduled (reference :763-855, incl. the sjf/ljf
        waiting-queue sorts)."""
        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs,
        )
        # Make sure we include num running seqs before scheduling prefill, so
        # that we don't schedule beyond max_num_seqs for prefill.
        for seq_group in self.running:
            budget.add_num_seqs(seq_group.request_id,
                                seq_group.get_max_num_running_seqs())
        curr_loras = set(
            seq_group.lora_int_id
            for seq_group in self.running) if self.lora_enabled else None

        remaining_waiting, prefills = (self.waiting,
                                       SchedulerPrefillOutputs.create_empty())
        remaining_running, running_scheduled = (
            self.running, SchedulerRunningOutputs.create_empty())
        remaining_swapped, swapped_in = (
            self.swapped, SchedulerSwappedInOutputs.create_empty())

        policy_name = self.spec.policy
        if policy_name == "sjf" and self.waiting:
            self.waiting = deque(
                sorted(self.waiting,
                       key=lambda req: req.sampling_params.est_tokens))
        elif policy_name == "ljf" and self.waiting:
            self.waiting = deque(
                sorted(self.waiting,
                       key=lambda req: -req.sampling_params.est_tokens))

        # If any requests are swapped, prioritize swapped requests.
        if not self.swapped:
            remaining_waiting, prefills = self._schedule_prefills(
                self.waiting, budget, curr_loras, enable_chunking=False)

        fcfs_policy = PolicyFactory.get_policy(policy_name="fcfs")
        # Don't schedule decodes if prefills are scheduled.
        if len(prefills.seq_groups) == 0:
            remaining_running, running_scheduled = self._schedule_running(
                self.running,
                budget,
                curr_loras,
                fcfs_policy,
                enable_chunking=False)

            # If any sequence group is preempted, do not swap in any sequence
            # group because it means there's no slot for new running requests.
            if len(running_scheduled.preempted) + len(
                    running_scheduled.swapped_out) == 0:
                remaining_swapped, swapped_in = self._schedule_swapped(
                    self.swapped, budget, curr_loras, fcfs_policy)

        assert (budget.num_batched_tokens <=
                self.scheduler_config.max_num_batched_tokens)
        assert budget.num_curr_seqs <= self.scheduler_config.max_num_seqs

        # Update waiting requests.
        self.waiting = remaining_waiting
        self.waiting.extendleft(running_scheduled.preempted)
        # Update new running requests.
        self.running = remaining_running
        self.running.extend([s.seq_group for s in prefills.seq_groups])
        self.running.extend(
            [s.seq_group for s in running_scheduled.decode_seq_groups])
        self.running.extend(
            [s.seq_group for s in swapped_in.decode_seq_groups])
        # Update swapped requests.
        self.swapped = remaining_swapped
        self.swapped.extend(running_scheduled.swapped_out)

        # There should be no prefill from running queue because this policy
        # doesn't allow chunked prefills.
        assert len(running_scheduled.prefill_seq_groups) == 0
        assert len(swapped_in.prefill_seq_groups) == 0
        return SchedulerOutputs(
            scheduled_seq_groups=(prefills.seq_groups +
                                  running_scheduled.decode_seq_groups +
                                  swapped_in.decode_seq_groups),
            num_prefill_groups=len(prefills.seq_groups),
            num_batched_tokens=budget.num_batched_tokens,
            blocks_to_swap_in=swapped_in.blocks_to_swap_in,
            blocks_to_swap_out=running_scheduled.blocks_to_swap_out,
            blocks_to_copy=merge_dicts(running_scheduled.blocks_to_copy,
                                       swapped_in.blocks_to_copy),
            ignored_seq_groups=prefills.ignored_seq_groups,
            num_lookahead_slots=running_scheduled.num_lookahead_slots,
            need_score=False,
            allow_both_swap=False)

    def _schedule_chunked_prefill(self) -> SchedulerOutputs:
        """Decode-first batching with chunked prefills filling the remaining
        token budget (reference :1505-1592)."""
        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs,
        )
        curr_loras: Set[int] = set()

        remaining_waiting, prefills = (self.waiting,
                                       SchedulerPrefillOutputs.create_empty())
        remaining_running, running_scheduled = (
            self.running, SchedulerRunningOutputs.create_empty())
        remaining_swapped, swapped_in = (
            self.swapped, SchedulerSwappedInOutputs.create_empty())

        # Decoding should be always scheduled first by fcfs.
        fcfs_policy = PolicyFactory.get_policy(policy_name="fcfs")
        remaining_running, running_scheduled = self._schedule_running(
            self.running,
            budget,
            curr_loras,
            fcfs_policy,
            enable_chunking=True)

        # Schedule swapped out requests.
        # If preemption happens, it means we don't have space for swap-in.
        if len(running_scheduled.preempted) + len(
                running_scheduled.swapped_out) == 0:
            remaining_swapped, swapped_in = self._schedule_swapped(
                self.swapped, budget, curr_loras, fcfs_policy)

        # Schedule new prefills.
        remaining_waiting, prefills = self._schedule_prefills(
            self.waiting, budget, curr_loras, enable_chunking=True)

        assert (budget.num_batched_tokens <=
                self.scheduler_config.max_num_batched_tokens)
        assert budget.num_curr_seqs <= self.scheduler_config.max_num_seqs

        # Update waiting requests.
        self.waiting = remaining_waiting
        self.waiting.extendleft(running_scheduled.preempted)
        # Update new running requests.
        self.running = remaining_running
        self.running.extend([s.seq_group for s in prefills.seq_groups])
        self.running.extend(
            [s.seq_group for s in running_scheduled.decode_seq_groups])
        self.running.extend(
            [s.seq_group for s in running_scheduled.prefill_seq_groups])
        self.running.extend(
            [s.seq_group for s in swapped_in.decode_seq_groups])
        self.running.extend(
            [s.seq_group for s in swapped_in.prefill_seq_groups])
        # Update swapped requests.
        self.swapped = remaining_swapped
        self.swapped.extend(running_scheduled.swapped_out)

        return SchedulerOutputs(
            scheduled_seq_groups=(prefills.seq_groups +
                                  running_scheduled.prefill_seq_groups +
                                  swapped_in.prefill_seq_groups +
                                  running_scheduled.decode_seq_groups +
                                  swapped_in.decode_seq_groups),
            num_prefill_groups=(len(prefills.seq_groups) +
                                len(swapped_in.prefill_seq_groups) +
                                len(running_scheduled.prefill_seq_groups)),
            num_batched_tokens=budget.num_batched_tokens,
            blocks_to_swap_in=swapped_in.blocks_to_swap_in,
            blocks_to_swap_out=running_scheduled.blocks_to_swap_out,
            blocks_to_copy=merge_dicts(running_scheduled.blocks_to_copy,
                                       swapped_in.blocks_to_copy),
            ignored_seq_groups=prefills.ignored_seq_groups,
            num_lookahead_slots=running_scheduled.num_lookahead_slots,
            need_score=False,
            allow_both_swap=False)

    # ------------------------------------------------------------------
    # Generalized (rank-ordered) scheduling — the LTR path
    # ------------------------------------------------------------------

    def _make_policy_context(self) -> PolicyContext:
        starv = self.spec.starvation
        return PolicyContext(
            waiting=list(self.waiting),
            running=list(self.running),
            swapped=list(self.swapped),
            aux_scorer=self.aux_model,
            starvation_threshold=starv.threshold if starv else -1,
            starvation_period=starv.period if starv else 0,
            distribution=self._distribution,
            records=self._policy_records,
        )

    def _general_schedule(self) -> SchedulerOutputs:
        """Global-reorder scheduling (reference :1101-1373):

        1. order ALL requests by the policy (scoring new arrivals first),
        2. greedily pack the token/seq budget from the top of the order,
        3. reserve the KV blocks the packed set needs, swapping out victims
           from the tail of the order (and un-packing tail requests if still
           short),
        4. proactively swap in high-priority swapped requests when no
           swap-out happened,
        5. allocate/append slots and emit the step plan.
        """
        ordering_fn = get_ordering_fn(self.spec.policy)
        ordered_requests = ordering_fn(self._make_policy_context())
        original_len = (len(self.swapped) + len(self.running) +
                        len(self.waiting))

        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs,
        )
        final_budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs,
        )

        remaining_waiting = self.waiting
        remaining_running = self.running
        remaining_swapped = self.swapped

        enable_chunking = True
        selected_seq_groups: List[SequenceGroup] = []
        exe_waiting: List[ScheduledSequenceGroup] = []
        exe_swapped_prefill: List[ScheduledSequenceGroup] = []
        exe_swapped_decode: List[ScheduledSequenceGroup] = []
        exe_running_prefill: List[ScheduledSequenceGroup] = []
        exe_running_decode: List[ScheduledSequenceGroup] = []
        gpu_block_required = 0

        # Per-request packing state for this step (token chunk + seq count).
        num_new_tokens_map: Dict[str, int] = {}
        num_new_seqs_map: Dict[str, int] = {}

        # Identity sets make queue-membership checks O(1) (the reference
        # scans deques per request, O(n^2) per step at high load).
        running_ids = {id(g) for g in remaining_running}
        swapped_ids = {id(g) for g in remaining_swapped}
        waiting_ids = {id(g) for g in remaining_waiting}

        # -- 2. greedy packing from the top of the order --------------------
        for seq_group in ordered_requests:
            seq = seq_group.get_seqs()[0]
            if id(seq_group) in running_ids:
                num_new_tokens = self._get_num_new_tokens(
                    seq_group, SequenceStatus.RUNNING, enable_chunking,
                    budget)
                if num_new_tokens == 0:
                    assert budget.remaining_token_budget() == 0
                    break
                num_new_seqs = seq_group.get_max_num_running_seqs()
                if not budget.can_schedule(num_new_tokens=num_new_tokens,
                                           num_new_seqs=num_new_seqs):
                    break
                budget.add_num_batched_tokens(seq_group.request_id,
                                              num_new_tokens)
                budget.add_num_seqs(seq_group.request_id, num_new_seqs)
                num_new_tokens_map[seq_group.request_id] = num_new_tokens
                num_new_seqs_map[seq_group.request_id] = num_new_seqs
                selected_seq_groups.append(seq_group)
                # Each running sequence may need one new block this step.
                gpu_block_required += num_new_seqs

            elif id(seq_group) in swapped_ids:
                num_new_seqs = seq_group.get_max_num_running_seqs()
                num_new_tokens = self._get_num_new_tokens(
                    seq_group, SequenceStatus.SWAPPED, enable_chunking,
                    budget)
                num_swapped_seqs = seq_group.num_seqs(
                    status=SequenceStatus.SWAPPED)
                if (num_new_tokens == 0 or not budget.can_schedule(
                        num_new_tokens=num_new_tokens,
                        num_new_seqs=num_new_seqs)):
                    break
                budget.add_num_batched_tokens(seq_group.request_id,
                                              num_new_tokens)
                budget.add_num_seqs(seq_group.request_id, num_new_seqs)
                num_new_tokens_map[seq_group.request_id] = num_new_tokens
                num_new_seqs_map[seq_group.request_id] = num_new_seqs
                selected_seq_groups.append(seq_group)
                # Swap-in copies all its blocks + one growth block per seq.
                gpu_block_required += (len(
                    self.block_manager._get_physical_blocks(seq_group)) +
                                       num_swapped_seqs)

            elif id(seq_group) in waiting_ids:
                num_new_tokens = self._get_num_new_tokens(
                    seq_group, SequenceStatus.WAITING, enable_chunking,
                    budget)
                # The general path always chunks, so the limit is the model
                # context length, not the per-step token budget.
                if seq.get_prompt_len() > self.scheduler_config.max_model_len:
                    raise AssertionError("req exceeds prompt limit")
                num_new_seqs = seq_group.get_max_num_running_seqs()
                if (num_new_tokens == 0 or not budget.can_schedule(
                        num_new_tokens=num_new_tokens,
                        num_new_seqs=num_new_seqs)):
                    break
                num_new_tokens_map[seq_group.request_id] = num_new_tokens
                num_new_seqs_map[seq_group.request_id] = num_new_seqs
                selected_seq_groups.append(seq_group)
                budget.add_num_batched_tokens(seq_group.request_id,
                                              num_new_tokens)
                budget.add_num_seqs(seq_group.request_id, num_new_seqs)
                gpu_block_required += len(seq.logical_token_blocks)
            else:
                raise AssertionError("seq group not in any queue")

        selected_ids = {id(g) for g in selected_seq_groups}
        ordered_requests = [
            g for g in ordered_requests if id(g) not in selected_ids
        ]

        # -- 3/4. make room & proactive swap-in ------------------------------
        (execute_pinned_requests, preempted, swapped_out, blocks_to_swap_out,
         blocks_to_swap_in) = self._reserve_free_blocks(
             gpu_block_required, selected_seq_groups, ordered_requests,
             remaining_running, final_budget, num_new_tokens_map,
             num_new_seqs_map)
        blocks_to_copy: Dict[int, List[int]] = {}

        # -- 5. allocate / append slots --------------------------------------
        for seq_group in execute_pinned_requests:
            token_chunk = num_new_tokens_map[seq_group.request_id]
            if id(seq_group) in waiting_ids:
                remaining_waiting.remove(seq_group)
                assert self.block_manager.can_allocate(
                    seq_group) == AllocStatus.OK, "cannot allocate new req"
                self._allocate_and_set_running(seq_group)
                exe_waiting.append(
                    ScheduledSequenceGroup(seq_group=seq_group,
                                           token_chunk_size=token_chunk))
            elif id(seq_group) in running_ids:
                remaining_running.remove(seq_group)
                assert self.block_manager.can_append_slots(seq_group)
                self._append_slots(seq_group, blocks_to_copy)
                if seq_group.is_prefill():
                    exe_running_prefill.append(
                        ScheduledSequenceGroup(seq_group=seq_group,
                                               token_chunk_size=token_chunk))
                else:
                    exe_running_decode.append(
                        ScheduledSequenceGroup(seq_group=seq_group,
                                               token_chunk_size=1))
            elif id(seq_group) in swapped_ids:
                remaining_swapped.remove(seq_group)
                assert self.block_manager.can_append_slots(seq_group)
                self._append_slots(seq_group, blocks_to_copy)
                if seq_group.is_prefill():
                    exe_swapped_prefill.append(
                        ScheduledSequenceGroup(seq_group,
                                               token_chunk_size=token_chunk))
                else:
                    assert token_chunk == 1
                    exe_swapped_decode.append(
                        ScheduledSequenceGroup(seq_group,
                                               token_chunk_size=1))
            else:
                raise AssertionError("pinned req not in any queue")

        prefills = SchedulerPrefillOutputs(
            seq_groups=exe_waiting,
            ignored_seq_groups=[],
            num_lookahead_slots=self._get_num_lookahead_slots(
                is_prefill=True))
        swapped_in = SchedulerSwappedInOutputs(
            decode_seq_groups=exe_swapped_decode,
            prefill_seq_groups=exe_swapped_prefill,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_copy=blocks_to_copy,
            num_lookahead_slots=self._get_num_lookahead_slots(
                is_prefill=False))
        running_scheduled = SchedulerRunningOutputs(
            decode_seq_groups=exe_running_decode,
            prefill_seq_groups=exe_running_prefill,
            preempted=preempted,
            swapped_out=swapped_out,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            num_lookahead_slots=self._get_num_lookahead_slots(
                is_prefill=False))

        assert (final_budget.num_batched_tokens <=
                self.scheduler_config.max_num_batched_tokens)
        assert budget.num_curr_seqs <= self.scheduler_config.max_num_seqs

        self.waiting = remaining_waiting
        self.waiting.extendleft(running_scheduled.preempted)
        self.running = remaining_running
        self.running.extend([s.seq_group for s in prefills.seq_groups])
        self.running.extend(
            [s.seq_group for s in running_scheduled.decode_seq_groups])
        self.running.extend(
            [s.seq_group for s in running_scheduled.prefill_seq_groups])
        self.running.extend(
            [s.seq_group for s in swapped_in.decode_seq_groups])
        self.running.extend(
            [s.seq_group for s in swapped_in.prefill_seq_groups])
        self.swapped = remaining_swapped
        self.swapped.extend(running_scheduled.swapped_out)

        all_requests = (list(self.swapped) + list(self.running) +
                        list(self.waiting))
        # Queue-conservation invariant (reference :1338).
        assert len(all_requests) == original_len

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
            blocks_to_swap_in=swapped_in.blocks_to_swap_in,
            blocks_to_swap_out=running_scheduled.blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            ignored_seq_groups=prefills.ignored_seq_groups,
            num_lookahead_slots=running_scheduled.num_lookahead_slots,
            need_score=self.spec.needs_scores,
            allow_both_swap=True)

        # Starvation bookkeeping (reference :1358-1365).
        running_this_step = {
            id(s.seq_group)
            for s in ret.scheduled_seq_groups
        }
        for req in all_requests:
            if id(req) in running_this_step:
                if req.pri == -1:
                    req.runs -= 1
                req.idle = 0
            else:
                req.idle += 1
        return ret

    def _reserve_free_blocks(
        self,
        num_blocks_needed: int,
        pinned_requests: List[SequenceGroup],
        priority_requests: List[SequenceGroup],
        remaining_running: Deque[SequenceGroup],
        final_budget: SchedulingBudget,
        num_new_tokens_map: Dict[str, int],
        num_new_seqs_map: Dict[str, int],
    ) -> Tuple[List[SequenceGroup], List[SequenceGroup],
               List[SequenceGroup], Dict[int, int], Dict[int, int]]:
        """Free enough device blocks for the pinned (selected) requests by
        swapping out victims from the tail of the priority order; swap pinned
        requests in; proactively swap in more when there was headroom
        (reference reserve_free_blocks :1376-1502)."""
        blocks_to_swap_out: Dict[int, int] = {}
        blocks_to_swap_in: Dict[int, int] = {}
        preempted: List[SequenceGroup] = []
        swapped_out: List[SequenceGroup] = []

        num_swap_out_blocks_needed = (
            num_blocks_needed -
            self.block_manager.gpu_allocator.get_num_free_blocks() +
            self.block_manager.watermark_blocks)
        swap_out_needed = num_swap_out_blocks_needed > 0

        execute_pinned_requests = pinned_requests.copy()

        if swap_out_needed:
            pinned_ids = {r.request_id for r in pinned_requests}
            # Swap out victims starting from the lowest priority.
            for request in reversed(priority_requests):
                assert request.request_id not in pinned_ids
                if num_swap_out_blocks_needed <= 0:
                    break
                if request.get_seqs(status=SequenceStatus.RUNNING):
                    num_swap_out_blocks_needed -= len(
                        self.block_manager._get_physical_blocks(request))
                    mode = self._preempt(request,
                                         blocks_to_swap_out,
                                         preemption_mode=PreemptionMode.SWAP)
                    if mode == PreemptionMode.RECOMPUTE:
                        preempted.append(request)
                    else:
                        swapped_out.append(request)
                    assert request in remaining_running
                    remaining_running.remove(request)

            # Still short: un-pin selected requests from the tail.
            while (num_swap_out_blocks_needed > 0
                   and len(execute_pinned_requests) > 0):
                request = execute_pinned_requests.pop(-1)
                if request.get_seqs(status=SequenceStatus.RUNNING):
                    num_swap_out_blocks_needed -= request.num_seqs(
                        status=SequenceStatus.RUNNING)
                    num_swap_out_blocks_needed -= len(
                        self.block_manager._get_physical_blocks(request))
                    mode = self._preempt(request,
                                         blocks_to_swap_out,
                                         preemption_mode=PreemptionMode.SWAP)
                    remaining_running.remove(request)
                    if mode == PreemptionMode.RECOMPUTE:
                        preempted.append(request)
                    else:
                        swapped_out.append(request)
                elif request.get_seqs(status=SequenceStatus.SWAPPED):
                    num_swap_out_blocks_needed -= (
                        len(self.block_manager._get_physical_blocks(request))
                        + request.num_seqs(status=SequenceStatus.SWAPPED))
                else:
                    num_swap_out_blocks_needed -= len(
                        request.get_seqs()[0].logical_token_blocks)

            assert num_swap_out_blocks_needed <= 0, (
                "could not free enough device blocks for the pinned requests")

        # Swap in pinned requests that live on the host.
        for seq_group in execute_pinned_requests:
            if seq_group.get_seqs(status=SequenceStatus.SWAPPED):
                self._swap_in(seq_group, blocks_to_swap_in)
            final_budget.add_num_batched_tokens(
                seq_group.request_id,
                num_new_tokens_map[seq_group.request_id])
            final_budget.add_num_seqs(seq_group.request_id,
                                      num_new_seqs_map[seq_group.request_id])

        # Proactive swap-in of high-priority swapped requests, only when no
        # swap-out happened this step (avoids ping-pong swapping).
        if not swap_out_needed:
            for request in priority_requests:
                if not request.get_seqs(status=SequenceStatus.SWAPPED):
                    continue
                num_new_seqs = request.get_max_num_running_seqs()
                num_new_tokens = self._get_num_new_tokens(
                    request, SequenceStatus.SWAPPED, True, final_budget)
                request_blocks = (
                    len(self.block_manager._get_physical_blocks(request)) +
                    request.num_seqs(status=SequenceStatus.SWAPPED))
                if (self.block_manager.can_swap_in(request)
                        and (num_swap_out_blocks_needed + request_blocks) < 0
                        and num_new_tokens > 0 and final_budget.can_schedule(
                            num_new_tokens=num_new_tokens,
                            num_new_seqs=num_new_seqs)):
                    num_new_tokens_map[request.request_id] = sum(
                        seq.get_num_new_tokens() for seq in request.get_seqs(
                            status=SequenceStatus.SWAPPED))
                    num_new_seqs_map[request.request_id] = num_new_seqs
                    self._swap_in(request, blocks_to_swap_in)
                    final_budget.add_num_batched_tokens(
                        request.request_id,
                        num_new_tokens_map[request.request_id])
                    final_budget.add_num_seqs(request.request_id,
                                              num_new_seqs)
                    execute_pinned_requests.append(request)
                    num_swap_out_blocks_needed += request_blocks
                else:
                    break

        return (execute_pinned_requests, preempted, swapped_out,
                blocks_to_swap_out, blocks_to_swap_in)

    # ------------------------------------------------------------------
    # Dispatch + metadata assembly
    # ------------------------------------------------------------------

    def _schedule(self) -> SchedulerOutputs:
        if self.spec.uses_general_path:
            return self._general_schedule()
        if self.scheduler_config.chunked_prefill_enabled:
            return self._schedule_chunked_prefill()
        return self._schedule_default()

    def schedule(
            self
    ) -> Tuple[List[SequenceGroupMetadata], SchedulerOutputs]:
        scheduler_outputs = self._schedule()
        now = time.time()

        seq_group_metadata_list: List[SequenceGroupMetadata] = []
        for scheduled_seq_group in scheduler_outputs.scheduled_seq_groups:
            seq_group = scheduled_seq_group.seq_group
            token_chunk_size = scheduled_seq_group.token_chunk_size
            seq_group.maybe_set_first_scheduled_time(now)

            seq_data: Dict[int, SequenceData] = {}
            block_tables: Dict[int, List[int]] = {}
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                seq_id = seq.seq_id
                seq_data[seq_id] = seq.data
                if self.fake_allocate:
                    block_tables[seq_id] = (
                        self.block_manager.get_fake_block_table_and_delete(
                            seq))
                else:
                    block_tables[seq_id] = self.block_manager.get_block_table(
                        seq)
                self.block_manager.access_all_blocks_in_seq(seq, now)

            common_computed_block_nums = (
                self.block_manager.get_common_computed_block_ids(
                    seq_group.get_seqs(status=SequenceStatus.RUNNING)))

            is_prompt = seq_group.is_prefill()
            seq_group_metadata = SequenceGroupMetadata(
                request_id=seq_group.request_id,
                is_prompt=is_prompt,
                seq_data=seq_data,
                sampling_params=seq_group.sampling_params,
                block_tables=block_tables,
                token_chunk_size=token_chunk_size,
                lora_request=seq_group.lora_request,
                computed_block_nums=common_computed_block_nums,
                state=seq_group.state,
                multi_modal_data=seq_group.multi_modal_data
                if scheduler_outputs.num_prefill_groups > 0 else None,
                need_score=scheduler_outputs.need_score,
            )
            seq_group_metadata_list.append(seq_group_metadata)

        # Blocks in this batch will be computed before the next scheduling
        # invocation (prefix-caching bookkeeping).
        for scheduled_seq_group in scheduler_outputs.scheduled_seq_groups:
            self.block_manager.mark_blocks_as_computed(
                scheduled_seq_group.seq_group)

        return seq_group_metadata_list, scheduler_outputs

    # ------------------------------------------------------------------
    # Free / fork / termination
    # ------------------------------------------------------------------

    def fork_seq(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        self.block_manager.fork(parent_seq, child_seq)

    def free_seq(self, seq: Sequence) -> None:
        self.block_manager.free(seq)

    def free_finished_seq_groups(self) -> None:
        # Synthetic-data-gen termination accounting (reference :1697-1721).
        bounds = self.spec.synthetic_bounds
        for req in self.running:
            if req.is_finished() and bounds:
                count_token = req.get_seqs()[0].data.get_output_len()
                for ib, bound in enumerate(bounds):
                    if ((bound.lo == -1 or count_token >= bound.lo)
                            and (bound.hi == -1 or count_token <= bound.hi)):
                        self._finished_req[ib] += 1
                        break
        all_bounds_met = bounds and all(
            self._finished_req[i] >= bounds[i].count
            for i in range(len(bounds)))
        timed_out = (self.spec.timelimit is not None
                     and time.time() - self.start_time >= self.spec.timelimit)
        if timed_out or all_bounds_met:
            # Drain everything: the synthetic-generation run is complete.
            for queue in (self.running, self.swapped, self.waiting):
                for seq_group in queue:
                    for seq in seq_group.get_seqs():
                        if not seq.is_finished():
                            seq.status = SequenceStatus.FINISHED_ABORTED
                            self.free_seq(seq)
            self.running = deque()
            self.swapped = deque()
            self.waiting = deque()
        self.running = deque(seq_group for seq_group in self.running
                             if not seq_group.is_finished())

    # ------------------------------------------------------------------
    # Allocation helpers
    # ------------------------------------------------------------------

    def _allocate_and_set_running(self, seq_group: SequenceGroup) -> None:
        self.block_manager.allocate(seq_group)
        for seq in seq_group.get_seqs(status=SequenceStatus.WAITING):
            seq.status = SequenceStatus.RUNNING

    def _fake_allocate_and_set_running(self,
                                       seq_group: SequenceGroup) -> None:
        self.block_manager.fake_allocate(seq_group)
        for seq in seq_group.get_seqs(status=SequenceStatus.WAITING):
            seq.status = SequenceStatus.RUNNING

    def _append_slots(self, seq_group: SequenceGroup,
                      blocks_to_copy: Dict[int, List[int]]) -> None:
        num_lookahead_slots = self._get_num_lookahead_slots(is_prefill=False)
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            cows = self.block_manager.append_slots(seq, num_lookahead_slots)
            for src, dests in cows.items():
                blocks_to_copy.setdefault(src, []).extend(dests)

    def _can_append_slots(self, seq_group: SequenceGroup) -> bool:
        return self.block_manager.can_append_slots(
            seq_group,
            num_lookahead_slots=self._get_num_lookahead_slots(
                is_prefill=False))

    def _preempt(
        self,
        seq_group: SequenceGroup,
        blocks_to_swap_out: Dict[int, int],
        preemption_mode: Optional[PreemptionMode] = None,
    ) -> PreemptionMode:
        # Recompute by default (cheaper); swap when the group has multiple
        # sequences (beam) or the caller forces SWAP (generalized path).
        if preemption_mode is None:
            if seq_group.get_max_num_running_seqs() == 1:
                preemption_mode = PreemptionMode.RECOMPUTE
            else:
                preemption_mode = PreemptionMode.SWAP
        if preemption_mode == PreemptionMode.RECOMPUTE:
            self._preempt_by_recompute(seq_group)
        elif preemption_mode == PreemptionMode.SWAP:
            self._preempt_by_swap(seq_group, blocks_to_swap_out)
        else:
            raise AssertionError("Invalid preemption mode.")
        return preemption_mode

    def _preempt_by_recompute(self, seq_group: SequenceGroup) -> None:
        seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
        assert len(seqs) == 1
        for seq in seqs:
            seq.status = SequenceStatus.WAITING
            self.free_seq(seq)
            seq.reset_state_for_recompute()

    def _preempt_by_swap(self, seq_group: SequenceGroup,
                         blocks_to_swap_out: Dict[int, int]) -> None:
        self._swap_out(seq_group, blocks_to_swap_out)
        seq_group.count_swap_out()

    def _swap_in(self, seq_group: SequenceGroup,
                 blocks_to_swap_in: Dict[int, int]) -> None:
        mapping = self.block_manager.swap_in(seq_group)
        blocks_to_swap_in.update(mapping)
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            seq.status = SequenceStatus.RUNNING

    def _swap_out(self, seq_group: SequenceGroup,
                  blocks_to_swap_out: Dict[int, int]) -> None:
        if not self.block_manager.can_swap_out(seq_group):
            raise RuntimeError(
                "Aborted due to the lack of host swap space. Please increase "
                "the swap space to avoid this error.")
        mapping = self.block_manager.swap_out(seq_group)
        blocks_to_swap_out.update(mapping)
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            seq.status = SequenceStatus.SWAPPED

    # ------------------------------------------------------------------
    # Misc
    # ------------------------------------------------------------------

    def _passed_delay(self, now: float) -> bool:
        if self.prev_prompt:
            self.last_prompt_latency = now - self.prev_time
        self.prev_time, self.prev_prompt = now, False
        # Delay scheduling prompts to let the waiting queue fill up.
        if self.scheduler_config.delay_factor > 0 and self.waiting:
            earliest_arrival_time = min(
                [e.metrics.arrival_time for e in self.waiting])
            passed_delay = ((now - earliest_arrival_time) >
                            (self.scheduler_config.delay_factor *
                             self.last_prompt_latency) or not self.running)
        else:
            passed_delay = True
        return passed_delay

    def _get_num_lookahead_slots(self, is_prefill: bool) -> int:
        if is_prefill:
            return 0
        return self.scheduler_config.num_lookahead_slots

    def _get_num_new_tokens(self, seq_group: SequenceGroup,
                            status: SequenceStatus, enable_chunking: bool,
                            budget: SchedulingBudget) -> int:
        num_new_tokens = 0
        seqs = seq_group.get_seqs(status=status)
        for seq in seqs:
            num_new_tokens += seq.get_num_new_tokens()
        # Chunk a single-sequence request to what fits in the budget.
        if enable_chunking and len(seqs) == 1:
            num_new_tokens = min(num_new_tokens,
                                 budget.remaining_token_budget())
        return num_new_tokens


def _load_distribution(path: str) -> Tuple[List[float], List[float]]:
    """Load an xpt score->expected-length distribution. Supports .json
    ([keys, values]) and torch .pt files (reference loads via torch.load)."""
    if path.endswith(".json"):
        import json
        with open(path) as f:
            key, value = json.load(f)
        return list(key), list(value)
    import torch
    key, value = torch.load(path, weights_only=False)
    return list(key), list(value)
