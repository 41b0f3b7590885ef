"""Request scheduler: stock batching paths + the LTR generalized path.

Behavioral counterpart of reference vllm/core/scheduler.py (1,888 LoC):

* prefill-first batching with swap priority (reference :763-855),
* chunked-prefill batching (decode-first, :1505-1592),
* the LTR fork's generalized priority scheduler — every step globally
  re-rank ALL requests with a pluggable policy, greedily pack the
  token/seq budget from the top, and evict the lowest-ranked victims to
  free the KV blocks the packed set needs (``_general_schedule`` :1101,
  ``reserve_free_blocks`` :1376),
* starvation promotion (:984-996), synthetic-bound / timelimit
  termination (:1697-1721), and fake allocation for the AUX predictor
  engine (:1647-1650).

Architecture here: requests sit in three lane lists (waiting / running /
swapped).  Each scheduling step builds one mutable :class:`StepPlan` by
running lane passes over the population; the plan is then committed to
the lanes in a single place.  Token/seq accounting is a per-request
charge map (:class:`SchedulingBudget`).  The scheduler is pure host
Python — on TPU it runs on the controller and its plan feeds the
pjit-compiled step function.
"""
from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Tuple, Union

from vllm_ltr_tpu.config import (CacheConfig, LoRAConfig, ScheduleSpec,
                                 SchedulerConfig)
from vllm_ltr_tpu.core.block_manager import AllocStatus, BlockSpaceManager
from vllm_ltr_tpu.core.policy import PolicyContext, get_ordering_fn
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.sequence import (Sequence, SequenceGroup,
                                   SequenceGroupMetadata, SequenceStatus)

logger = init_logger(__name__)


class PreemptionMode(enum.Enum):
    """SWAP parks the KV on the host mirror; RECOMPUTE drops it and
    re-prefills later (cheaper for single-stream requests)."""
    SWAP = enum.auto()
    RECOMPUTE = enum.auto()


class SchedulingBudget:
    """Step-wide token/seat budget with idempotent per-request charging.

    Charges are recorded per request id, so charging the same request
    twice is a no-op and a charge can be refunded exactly once.
    """

    def __init__(self, token_budget: int, max_num_seqs: int,
                 prefill_align: int = 1) -> None:
        self.token_budget = token_budget
        self.max_num_seqs = max_num_seqs
        # Prefill chunks are charged rounded up to this many tokens: the
        # executor tile-aligns each prefill row in the flat token layout
        # (input_batch.py dest_offsets), so the PADDED step size is what
        # must stay inside the largest compiled bucket — otherwise a step
        # overflows into an unwarmed coarse jit shape and pays a compile
        # in the serving critical path.
        self.prefill_align = max(prefill_align, 1)
        self._token_charges: Dict[str, int] = {}
        self._seat_charges: Dict[str, int] = {}

    def charge_for(self, tokens: int, prefill: bool) -> int:
        if not prefill or self.prefill_align == 1:
            return tokens
        a = self.prefill_align
        return -(-tokens // a) * a

    @property
    def num_batched_tokens(self) -> int:
        return sum(self._token_charges.values())

    @property
    def num_curr_seqs(self) -> int:
        return sum(self._seat_charges.values())

    def remaining_token_budget(self) -> int:
        return self.token_budget - self.num_batched_tokens

    def can_schedule(self, *, num_new_tokens: int, num_new_seqs: int,
                     prefill: bool = False) -> bool:
        assert num_new_tokens > 0 and num_new_seqs > 0
        cost = self.charge_for(num_new_tokens, prefill)
        return (self.num_batched_tokens + cost <= self.token_budget
                and self.num_curr_seqs + num_new_seqs <= self.max_num_seqs)

    def add_num_batched_tokens(self, req_id: str, tokens: int,
                               prefill: bool = False) -> None:
        self._token_charges.setdefault(req_id,
                                       self.charge_for(tokens, prefill))

    def subtract_num_batched_tokens(self, req_id: str, tokens: int) -> None:
        self._token_charges.pop(req_id, None)

    def add_num_seqs(self, req_id: str, seats: int) -> None:
        self._seat_charges.setdefault(req_id, seats)

    def subtract_num_seqs(self, req_id: str, seats: int) -> None:
        self._seat_charges.pop(req_id, None)


@dataclass
class ScheduledSequenceGroup:
    seq_group: SequenceGroup
    # Tokens the model computes for this group this step: 1 for decode,
    # up to the whole remaining prompt for (possibly chunked) prefill.
    token_chunk_size: int


@dataclass
class SchedulerOutputs:
    """The committed per-step decision handed to the engine/executor."""
    scheduled_seq_groups: List[ScheduledSequenceGroup]
    num_prefill_groups: int
    num_batched_tokens: int
    # Host<->device KV page moves and device-side CoW copies.
    blocks_to_swap_in: Dict[int, int]
    blocks_to_swap_out: Dict[int, int]
    blocks_to_copy: Dict[int, List[int]]
    ignored_seq_groups: List[SequenceGroup]
    num_lookahead_slots: int
    # LTR: ask the model for predictor scores this step.
    need_score: bool = False
    # Only the generalized path may swap both directions in one step.
    allow_both_swap: bool = False

    def __post_init__(self):
        if not self.allow_both_swap:
            assert not (self.blocks_to_swap_in and self.blocks_to_swap_out)

    def is_empty(self) -> bool:
        return (not self.scheduled_seq_groups and not self.blocks_to_swap_in
                and not self.blocks_to_swap_out and not self.blocks_to_copy)


@dataclass
class StepPlan:
    """Mutable working state for one scheduling step.

    Lane passes append here; ``Scheduler._commit`` folds it back into the
    lane lists and shapes the SchedulerOutputs.
    """
    new_prefills: List[ScheduledSequenceGroup] = field(default_factory=list)
    ongoing_prefills: List[ScheduledSequenceGroup] = field(
        default_factory=list)
    decodes: List[ScheduledSequenceGroup] = field(default_factory=list)
    ignored: List[SequenceGroup] = field(default_factory=list)
    recomputed: List[SequenceGroup] = field(default_factory=list)  # ->waiting
    parked: List[SequenceGroup] = field(default_factory=list)      # ->swapped
    h2d: Dict[int, int] = field(default_factory=dict)   # swap in
    d2h: Dict[int, int] = field(default_factory=dict)   # swap out
    dup: Dict[int, List[int]] = field(default_factory=dict)  # CoW copies

    def evictions(self) -> int:
        return len(self.recomputed) + len(self.parked)


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

        # Executor prefill tile (set on the config by the engine once the
        # executor exists): prefill token charges round up to this, so the
        # PADDED step never overflows the largest compiled bucket.
        self.token_align = max(
            getattr(scheduler_config, "prefill_token_align", 1) or 1, 1)
        if self.token_align > scheduler_config.max_num_batched_tokens:
            # Tiny test budgets below one tile: aligned charging would
            # admit nothing; fall back to exact charging (the executor's
            # coarse-shape overflow path covers the padding).
            self.token_align = 1

        if scheduler_config.chunked_prefill_enabled:
            self.prompt_limit = scheduler_config.max_model_len
        else:
            # A full prompt must fit the budget AFTER tile alignment.
            usable = (scheduler_config.max_num_batched_tokens //
                      self.token_align * self.token_align)
            self.prompt_limit = min(scheduler_config.max_model_len, usable)

        self.spec: ScheduleSpec = scheduler_config.schedule_spec
        assert not self.spec.is_mlfq, (
            "Use MLFQScheduler for mlfq schedule types.")

        # xpt score-bucket -> expected-length table.
        self._distribution: Optional[Tuple[List[float], List[float]]] = None
        if self.spec.distribution_path:
            self._distribution = _load_distribution(
                self.spec.distribution_path)
        self._policy_records: List[float] = []
        self._xpt_expected: Dict[str, float] = {}

        # Synthetic-bound termination counters (one per bound).
        self._finished_req = [0] * len(self.spec.synthetic_bounds)
        self.start_time = time.time()

        self.block_manager = BlockSpaceManager(
            block_size=cache_config.block_size,
            num_gpu_blocks=cache_config.num_gpu_blocks or 0,
            num_cpu_blocks=cache_config.num_cpu_blocks or 0,
            sliding_window=cache_config.sliding_window,
            enable_caching=cache_config.enable_prefix_caching)

        # AUX predictor scorer, attached by the engine when the policy
        # needs learned scores (reference llm_engine.py:224-242).
        self.aux_model = None
        # --lazy-aux-scoring observability (/debug/stats): passes where
        # the no-contention proof let the predictor dispatch be skipped.
        self.lazy_score_skips = 0

        # Lane lists. Public: the engine and tests read them directly.
        self.waiting: List[SequenceGroup] = []
        self.running: List[SequenceGroup] = []
        self.swapped: List[SequenceGroup] = []

        # Prompt-delay state (delay_factor batching heuristic).
        self.prev_time = 0.0
        self.prev_prompt = False
        self.last_prompt_latency = 0.0
        self.fake_allocate = scheduler_config.fake_allocate

    @property
    def lora_enabled(self) -> bool:
        return bool(self.lora_config)

    # ------------------------------------------------------------------
    # Population management
    # ------------------------------------------------------------------

    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        seq_group.idle = 0
        seq_group.runs = 0
        seq_group.pri = 0
        self.waiting.append(seq_group)

    def abort_seq_group(self, request_id: Union[str, Iterable[str]]) -> None:
        wanted = {request_id} if isinstance(request_id, str) else set(
            request_id)
        for lane in (self.waiting, self.running, self.swapped):
            keep: List[SequenceGroup] = []
            for group in lane:
                if group.request_id not in wanted:
                    keep.append(group)
                    continue
                wanted.discard(group.request_id)
                self._xpt_expected.pop(group.request_id, None)
                for seq in group.get_seqs():
                    if not seq.is_finished():
                        seq.status = SequenceStatus.FINISHED_ABORTED
                        self.free_seq(seq)
            lane[:] = keep

    def has_unfinished_seqs(self) -> bool:
        return bool(self.waiting or self.running or self.swapped)

    def get_num_unfinished_seq_groups(self) -> int:
        return len(self.waiting) + len(self.running) + len(self.swapped)

    # ------------------------------------------------------------------
    # Lane passes (shared by the stock paths)
    # ------------------------------------------------------------------

    def _chunk_for(self, group: SequenceGroup, status: SequenceStatus,
                   chunking: bool, budget: SchedulingBudget) -> int:
        """Tokens this group needs next step; trimmed to the remaining
        budget when chunking a single-stream request."""
        seqs = group.get_seqs(status=status)
        total = sum(s.get_num_new_tokens() for s in seqs)
        if chunking and len(seqs) == 1:
            allowed = budget.remaining_token_budget()
            if group.is_prefill() and budget.prefill_align > 1:
                # The chunk is charged tile-aligned; only hand out whole
                # tiles so the charge fits what remains.
                allowed = (allowed // budget.prefill_align *
                           budget.prefill_align)
            total = min(total, allowed)
        return total

    def _admit(self, plan: StepPlan, budget: SchedulingBudget,
               chunking: bool) -> None:
        """Admit new prompts from the waiting lane (in lane order)."""
        if not self._passed_delay(time.time()):
            return
        admitted: List[SequenceGroup] = []
        for group in list(self.waiting):
            prompt_seqs = group.get_seqs(status=SequenceStatus.WAITING)
            assert len(prompt_seqs) == 1, (
                "a waiting group carries exactly one prompt stream")
            chunk = self._chunk_for(group, SequenceStatus.WAITING, chunking,
                                    budget)
            full_len = prompt_seqs[0].get_len()
            if not chunking:
                assert chunk == full_len

            if full_len > self.prompt_limit:
                logger.warning(
                    "prompt of %d tokens exceeds the %d-token limit; "
                    "ignoring request %s", full_len, self.prompt_limit,
                    group.request_id)
                self._ignore(group, plan)
                admitted.append(group)  # leaves the lane
                continue

            if self.fake_allocate:
                verdict = AllocStatus.OK
            else:
                verdict = self.block_manager.can_allocate(group)
            if verdict == AllocStatus.NEVER:
                logger.warning(
                    "prompt of %d tokens can never fit the KV cache; "
                    "ignoring request %s", full_len, group.request_id)
                self._ignore(group, plan)
                admitted.append(group)
                continue
            if verdict == AllocStatus.LATER:
                break

            seats = group.get_max_num_running_seqs()
            if chunk == 0 or not budget.can_schedule(num_new_tokens=chunk,
                                                     num_new_seqs=seats,
                                                     prefill=True):
                break

            cached = self._start_running(group)
            if cached:
                # Prefix-cache hits shrink this prefill: only the
                # uncached suffix is dispatched (budget was checked with
                # the full chunk — charging less is safe).
                chunk = min(chunk, max(full_len - cached, 1))
            plan.new_prefills.append(
                ScheduledSequenceGroup(seq_group=group,
                                       token_chunk_size=chunk))
            budget.add_num_batched_tokens(group.request_id, chunk,
                                          prefill=True)
            budget.add_num_seqs(group.request_id, seats)
            admitted.append(group)

        for group in admitted:
            self.waiting.remove(group)
        if plan.new_prefills:
            self.prev_prompt = True

    def _grow(self, plan: StepPlan, budget: SchedulingBudget,
              chunking: bool) -> List[SequenceGroup]:
        """Keep already-running requests going, oldest-first; on block
        exhaustion evict from the *youngest* end.  Returns the groups that
        stay scheduled (they re-enter the running lane at commit)."""
        order = sorted(self.running, key=lambda g: g.metrics.arrival_time)
        survivors: List[SequenceGroup] = []
        idx = 0
        while idx < len(order):
            group = order[idx]
            chunk = self._chunk_for(group, SequenceStatus.RUNNING, chunking,
                                    budget)
            if chunk == 0:
                break  # token budget exhausted
            # Claw back KV space if this group can't grow.
            evicted_self = False
            while not self.block_manager.can_append_slots(
                    group,
                    num_lookahead_slots=self._lookahead(is_prefill=False)):
                if idx + 1 < len(order):
                    victim = order.pop()  # youngest non-scheduled request
                    self._evict(victim, plan, mode=None)
                else:
                    order.pop()
                    self._evict(group, plan, mode=None)
                    evicted_self = True
                    break
            if evicted_self:
                break
            self._grow_tables(group, plan.dup)
            entry = ScheduledSequenceGroup(
                seq_group=group,
                token_chunk_size=chunk if group.is_prefill() else 1)
            (plan.ongoing_prefills
             if group.is_prefill() else plan.decodes).append(entry)
            budget.add_num_batched_tokens(group.request_id, chunk,
                                          prefill=group.is_prefill())
            budget.add_num_seqs(group.request_id,
                                group.get_max_num_running_seqs())
            survivors.append(group)
            idx += 1
        # Anything after the cutoff stays running but isn't scheduled.
        survivors.extend(order[idx:])
        return survivors

    def _revive(self, plan: StepPlan, budget: SchedulingBudget,
                chunking: bool) -> None:
        """Swap parked requests back in, oldest-first, while they fit."""
        revived: List[SequenceGroup] = []
        for group in sorted(self.swapped,
                            key=lambda g: g.metrics.arrival_time):
            if not self.block_manager.can_swap_in(group):
                break
            seats = group.get_max_num_running_seqs()
            chunk = self._chunk_for(group, SequenceStatus.SWAPPED, chunking,
                                    budget)
            was_prefill = group.is_prefill()
            if chunk == 0 or not budget.can_schedule(num_new_tokens=chunk,
                                                     num_new_seqs=seats,
                                                     prefill=was_prefill):
                break
            self._swap_in(group, plan.h2d)
            self._grow_tables(group, plan.dup)
            entry = ScheduledSequenceGroup(
                seq_group=group, token_chunk_size=chunk if was_prefill else 1)
            (plan.ongoing_prefills if was_prefill else plan.decodes).append(
                entry)
            budget.add_num_batched_tokens(group.request_id, chunk,
                                          prefill=was_prefill)
            budget.add_num_seqs(group.request_id, seats)
            revived.append(group)
        for group in revived:
            self.swapped.remove(group)
            self.running.append(group)

    # ------------------------------------------------------------------
    # Stock scheduling paths
    # ------------------------------------------------------------------

    def _schedule_default(self) -> SchedulerOutputs:
        """Prefill-first batching: admit prompts when possible; decode-only
        steps otherwise (reference :763-855, incl. sjf/ljf waiting sorts)."""
        plan = StepPlan()
        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs,
            prefill_align=self.token_align)
        # Seats of already-running requests count against prefill admission.
        for group in self.running:
            budget.add_num_seqs(group.request_id,
                                group.get_max_num_running_seqs())

        if self.spec.policy in ("sjf", "ljf"):
            flip = -1 if self.spec.policy == "ljf" else 1
            self.waiting.sort(
                key=lambda g: flip * g.sampling_params.est_tokens)

        # Parked requests take priority over new prompts.
        if not self.swapped:
            self._admit(plan, budget, chunking=False)

        if not plan.new_prefills:
            survivors = self._grow(plan, budget, chunking=False)
            self.running = survivors
            if plan.evictions() == 0:
                self._revive(plan, budget, chunking=False)

        assert budget.num_batched_tokens <= budget.token_budget
        assert budget.num_curr_seqs <= budget.max_num_seqs
        assert not plan.ongoing_prefills  # no chunking on this path
        return self._commit(plan, budget.num_batched_tokens,
                            need_score=False, allow_both_swap=False)

    def _schedule_chunked_prefill(self) -> SchedulerOutputs:
        """Decode-first batching; chunked prefills soak up the leftover
        token budget (reference :1505-1592)."""
        plan = StepPlan()
        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs,
            prefill_align=self.token_align)

        self.running = self._grow(plan, budget, chunking=True)
        if plan.evictions() == 0:
            self._revive(plan, budget, chunking=True)
        self._admit(plan, budget, chunking=True)

        assert budget.num_batched_tokens <= budget.token_budget
        assert budget.num_curr_seqs <= budget.max_num_seqs
        return self._commit(plan, budget.num_batched_tokens,
                            need_score=False, allow_both_swap=False)

    def _commit(self, plan: StepPlan, num_batched_tokens: int, *,
                need_score: bool, allow_both_swap: bool) -> SchedulerOutputs:
        """Fold the plan into the lanes and shape SchedulerOutputs."""
        # Evictions first: recomputed requests cut the waiting line.
        self.waiting[:0] = plan.recomputed
        self.swapped.extend(plan.parked)
        for entry in plan.new_prefills:
            self.running.append(entry.seq_group)

        prefills = plan.new_prefills + plan.ongoing_prefills
        return SchedulerOutputs(
            scheduled_seq_groups=prefills + plan.decodes,
            num_prefill_groups=len(prefills),
            num_batched_tokens=num_batched_tokens,
            blocks_to_swap_in=plan.h2d,
            blocks_to_swap_out=plan.d2h,
            blocks_to_copy=plan.dup,
            ignored_seq_groups=plan.ignored,
            num_lookahead_slots=self._lookahead(is_prefill=False),
            need_score=need_score,
            allow_both_swap=allow_both_swap)

    # ------------------------------------------------------------------
    # Generalized (rank-ordered) scheduling — the LTR path
    # ------------------------------------------------------------------

    def _ranking_matters(self) -> bool:
        """False only when this pass provably admits/keeps the ENTIRE
        population regardless of order — then a predictor round trip
        cannot change the outcome (--lazy-aux-scoring skips it; the
        round-4 soak measured ~90 ms/step of schedule() blocked on
        2.7-prompt scoring dispatches at trickle arrival rates)."""
        if not self.scheduler_config.lazy_aux_scoring:
            return True
        cfg = self.scheduler_config
        lanes = (self.waiting, self.running, self.swapped)
        seats = sum(g.get_max_num_running_seqs() for lane in lanes
                    for g in lane)
        if seats > cfg.max_num_seqs:
            return True
        tokens = sum(s.get_num_new_tokens() for g in self.waiting
                     for s in g.get_seqs(status=SequenceStatus.WAITING))
        tokens += sum(g.num_seqs() for g in self.running)
        tokens += sum(g.num_seqs() for g in self.swapped)
        if tokens > cfg.max_num_batched_tokens:
            return True
        bm = self.block_manager
        need = sum(g.get_seqs()[0].num_blocks() for g in self.waiting)
        need += sum(g.num_seqs() for g in self.running)  # growth blocks
        for g in self.swapped:
            need += len(bm._group_block_ids(g)) + g.num_seqs()
        free = bm.get_num_free_gpu_blocks()
        if need > max(free - bm.watermark_blocks, 0):
            return True
        self.lazy_score_skips += 1
        return False

    def _rank_population(self) -> List[SequenceGroup]:
        starv = self.spec.starvation
        ctx = PolicyContext(
            waiting=list(self.waiting),
            running=list(self.running),
            swapped=list(self.swapped),
            aux_scorer=self.aux_model,
            starvation_threshold=starv.threshold if starv else -1,
            starvation_period=starv.period if starv else 0,
            distribution=self._distribution,
            records=self._policy_records,
            expected_lengths=self._xpt_expected,
            scores_required=self._ranking_matters(),
        )
        return get_ordering_fn(self.spec.policy)(ctx)

    def _general_schedule(self) -> SchedulerOutputs:
        """Global-reorder scheduling (reference :1101-1373): rank ALL
        requests with the policy (scoring new arrivals first), pack + run
        the ranked step, then apply starvation bookkeeping."""
        ranking = self._rank_population()
        outputs, _ = self._ranked_schedule(ranking,
                                           need_score=self.spec.needs_scores)

        # Starvation bookkeeping (reference :1358-1365).
        scheduled = {id(s.seq_group) for s in outputs.scheduled_seq_groups}
        for lane in (self.waiting, self.running, self.swapped):
            for group in lane:
                if id(group) in scheduled:
                    if group.pri == -1:
                        group.runs -= 1
                    group.idle = 0
                else:
                    group.idle += 1
        return outputs

    def _ranked_schedule(
            self, ranking: List[SequenceGroup],
            need_score: bool) -> Tuple[SchedulerOutputs, List["_Pick"]]:
        """Shared core of the generalized and MLFQ paths:

        1. greedily pack the token/seat budget down the given ranking,
        2. reserve the device blocks the packed set needs by swapping out
           victims from the tail of the ranking (un-packing tail picks if
           still short),
        3. proactively swap in ranked parked requests when nothing was
           swapped out,
        4. allocate/grow tables and emit the plan.

        Returns (outputs, executing picks).
        """
        population = self.get_num_unfinished_seq_groups()

        lane_of: Dict[int, str] = {}
        for name, lane in (("waiting", self.waiting),
                           ("running", self.running),
                           ("swapped", self.swapped)):
            for g in lane:
                lane_of[id(g)] = name

        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs,
            prefill_align=self.token_align)

        # -- 2. pack from the top of the ranking -------------------------
        picked: List[_Pick] = []
        demand = 0  # device blocks the picked set needs
        for group in ranking:
            lane = lane_of[id(group)]
            if lane == "running":
                chunk = self._chunk_for(group, SequenceStatus.RUNNING, True,
                                        budget)
                blocks = group.get_max_num_running_seqs()  # growth blocks
            elif lane == "swapped":
                chunk = self._chunk_for(group, SequenceStatus.SWAPPED, True,
                                        budget)
                blocks = (len(self.block_manager._group_block_ids(group)) +
                          group.num_seqs(status=SequenceStatus.SWAPPED))
            else:  # waiting
                seq = group.get_seqs()[0]
                if seq.get_prompt_len() > self.scheduler_config.max_model_len:
                    raise AssertionError("prompt exceeds the model window")
                chunk = self._chunk_for(group, SequenceStatus.WAITING, True,
                                        budget)
                blocks = seq.num_blocks()
            seats = group.get_max_num_running_seqs()
            if chunk == 0 or not budget.can_schedule(
                    num_new_tokens=chunk, num_new_seqs=seats,
                    prefill=group.is_prefill()):
                break
            budget.add_num_batched_tokens(group.request_id, chunk,
                                          prefill=group.is_prefill())
            budget.add_num_seqs(group.request_id, seats)
            picked.append(_Pick(group, lane, chunk, seats))
            demand += blocks

        picked_ids = {id(p.group) for p in picked}
        spill = [g for g in ranking if id(g) not in picked_ids]

        # -- 3/4. reserve blocks, maybe proactively swap in ----------------
        plan = StepPlan()
        final_budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs,
            prefill_align=self.token_align)
        executing = self._reserve_free_blocks(demand, picked, spill, plan,
                                              final_budget)

        # -- 5. allocate / grow tables -------------------------------------
        for pick in executing:
            group, chunk = pick.group, pick.chunk
            if pick.lane == "waiting":
                self.waiting.remove(group)
                assert self.block_manager.can_allocate(
                    group) == AllocStatus.OK, "cannot allocate new request"
                cached = self._start_running(group)
                if cached:
                    remaining = sum(
                        s.get_num_new_tokens() for s in group.get_seqs(
                            status=SequenceStatus.RUNNING))
                    chunk = min(chunk, max(remaining, 1))
                plan.new_prefills.append(
                    ScheduledSequenceGroup(seq_group=group,
                                           token_chunk_size=chunk))
                continue
            if pick.lane == "running":
                self.running.remove(group)
            else:  # swapped (already moved to device in reserve)
                self.swapped.remove(group)
            assert self.block_manager.can_append_slots(group)
            self._grow_tables(group, plan.dup)
            if group.is_prefill():
                plan.ongoing_prefills.append(
                    ScheduledSequenceGroup(seq_group=group,
                                           token_chunk_size=chunk))
            else:
                plan.decodes.append(
                    ScheduledSequenceGroup(seq_group=group,
                                           token_chunk_size=1))

        assert final_budget.num_batched_tokens <= final_budget.token_budget
        assert budget.num_curr_seqs <= budget.max_num_seqs

        outputs = self._commit(plan, final_budget.num_batched_tokens,
                               need_score=need_score,
                               allow_both_swap=True)
        # Executing groups rejoin the running lane.
        for pick in executing:
            if pick.lane != "waiting":  # new prefills were added by _commit
                self.running.append(pick.group)

        # Queue-conservation invariant (reference :1338).
        assert self.get_num_unfinished_seq_groups() == population
        return outputs, executing

    def _reserve_free_blocks(
        self,
        demand: int,
        picked: List["_Pick"],
        spill: List[SequenceGroup],
        plan: StepPlan,
        final_budget: SchedulingBudget,
    ) -> List["_Pick"]:
        """Make the device pool cover ``demand`` blocks for the picked set
        (reference reserve_free_blocks :1376-1502).

        Victims are swapped out lowest-rank-first from ``spill``; if still
        short, picks are dropped from the tail.  When no swap-out was
        needed, top-ranked parked requests are proactively swapped in with
        the leftover headroom.
        """
        shortfall = (demand - self.block_manager.get_num_free_gpu_blocks() +
                     self.block_manager.watermark_blocks)
        pressured = shortfall > 0
        executing = list(picked)

        if pressured:
            # Evict spill requests, worst-ranked first.
            for victim in reversed(spill):
                if shortfall <= 0:
                    break
                if victim.get_seqs(status=SequenceStatus.RUNNING):
                    shortfall -= len(
                        self.block_manager._group_block_ids(victim))
                    self._evict(victim, plan, mode=PreemptionMode.SWAP)
                    self.running.remove(victim)
            # Still short: give up on the lowest-ranked picks.
            while shortfall > 0 and executing:
                dropped = executing.pop()
                group = dropped.group
                if group.get_seqs(status=SequenceStatus.RUNNING):
                    shortfall -= (
                        group.num_seqs(status=SequenceStatus.RUNNING) +
                        len(self.block_manager._group_block_ids(group)))
                    self._evict(group, plan, mode=PreemptionMode.SWAP)
                    self.running.remove(group)
                elif group.get_seqs(status=SequenceStatus.SWAPPED):
                    shortfall -= (
                        len(self.block_manager._group_block_ids(group)) +
                        group.num_seqs(status=SequenceStatus.SWAPPED))
                else:
                    shortfall -= group.get_seqs()[0].num_blocks()
            assert shortfall <= 0, (
                "could not reserve enough device blocks for the picked set")

        # Bring picked parked requests onto the device and charge them.
        for pick in executing:
            if pick.group.get_seqs(status=SequenceStatus.SWAPPED):
                self._swap_in(pick.group, plan.h2d)
            final_budget.add_num_batched_tokens(
                pick.group.request_id, pick.chunk,
                prefill=pick.group.is_prefill())
            final_budget.add_num_seqs(pick.group.request_id, pick.seats)

        # Proactive swap-in with leftover headroom (only when nothing was
        # swapped out this step, to avoid ping-pong).
        if not pressured:
            for group in spill:
                if not group.get_seqs(status=SequenceStatus.SWAPPED):
                    continue
                seats = group.get_max_num_running_seqs()
                chunk = self._chunk_for(group, SequenceStatus.SWAPPED, True,
                                        final_budget)
                need = (len(self.block_manager._group_block_ids(group)) +
                        group.num_seqs(status=SequenceStatus.SWAPPED))
                if (self.block_manager.can_swap_in(group)
                        and shortfall + need < 0 and chunk > 0
                        and final_budget.can_schedule(
                            num_new_tokens=chunk, num_new_seqs=seats,
                            prefill=group.is_prefill())):
                    chunk = sum(
                        s.get_num_new_tokens()
                        for s in group.get_seqs(
                            status=SequenceStatus.SWAPPED))
                    self._swap_in(group, plan.h2d)
                    final_budget.add_num_batched_tokens(
                        group.request_id, chunk,
                        prefill=group.is_prefill())
                    final_budget.add_num_seqs(group.request_id, seats)
                    executing.append(_Pick(group, "swapped", chunk, seats))
                    shortfall += need
                else:
                    break

        return executing

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
            self) -> Tuple[List[SequenceGroupMetadata], SchedulerOutputs]:
        outputs = self._schedule()
        return self._build_metadata(outputs), outputs

    def schedule_admissions(
            self) -> Tuple[List[SequenceGroupMetadata], SchedulerOutputs]:
        """Admission-only pass: schedule new prefills from the waiting
        lane without touching running/swapped groups.

        Used by the async engine to sneak prompt prefills in behind an
        in-flight decode dispatch (the device queues them after the
        current wave, so a request's first token no longer waits for the
        wave plus a full scheduling round trip).  Never preempts and
        never swaps; parked (swapped) requests keep their priority by
        blocking sneak admission entirely, exactly like the default
        path's "parked requests take priority" rule.
        """
        plan = StepPlan()
        if self.swapped or not self.waiting:
            return [], self._commit(plan, 0, need_score=False,
                                    allow_both_swap=False)
        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs,
            prefill_align=self.token_align)
        for group in self.running:
            budget.add_num_seqs(group.request_id,
                                group.get_max_num_running_seqs())

        self._order_waiting_for_admission()

        chunking = self.scheduler_config.chunked_prefill_enabled
        self._admit(plan, budget, chunking=chunking)
        outputs = self._commit(plan, budget.num_batched_tokens,
                               need_score=self.spec.needs_scores,
                               allow_both_swap=False)
        return self._build_metadata(outputs), outputs

    def _order_waiting_for_admission(self) -> None:
        """Sort the waiting lane by the active policy before a sneak
        admission pass, so ``_admit`` (which consumes the lane in order)
        sees policy order, not FCFS — otherwise a mid-step burst under
        ``opt`` would prefill in arrival order and forfeit the
        short-job-first effect exactly where pipelined admission matters.

        Uses the same ordering functions as :meth:`_general_schedule`
        with a waiting-only context; ``ensure_scores`` inside the
        ordering fn keeps the scored-before-first-scheduling contract.
        Starvation promotion is disabled here (brand-new arrivals cannot
        be starved, and the full ranked pass owns that bookkeeping).
        """
        if self.spec.policy in ("sjf", "ljf"):
            flip = -1 if self.spec.policy == "ljf" else 1
            self.waiting.sort(
                key=lambda g: flip * g.sampling_params.est_tokens)
            return
        if self.spec.policy in ("fcfs", "fifo"):
            return  # lane order is arrival order already
        if self.spec.needs_scores and self.aux_model is None:
            return  # scoreless engine: keep lane order (tests/offline)
        try:
            ordering = get_ordering_fn(self.spec.policy)
        except KeyError:
            return
        ctx = PolicyContext(
            waiting=list(self.waiting),
            running=[],
            swapped=[],
            aux_scorer=self.aux_model,
            starvation_threshold=-1,
            starvation_period=0,
            distribution=self._distribution,
            records=self._policy_records,
            expected_lengths=self._xpt_expected,
            scores_required=self._ranking_matters(),
        )
        self.waiting[:] = ordering(ctx)

    def _build_metadata(
            self,
            outputs: SchedulerOutputs) -> List[SequenceGroupMetadata]:
        now = time.time()

        metadata: List[SequenceGroupMetadata] = []
        for entry in outputs.scheduled_seq_groups:
            group = entry.seq_group
            group.maybe_set_first_scheduled_time(now)

            seq_data: Dict[int, Sequence] = {}
            tables: Dict[int, List[int]] = {}
            for seq in group.get_seqs(status=SequenceStatus.RUNNING):
                seq_data[seq.seq_id] = seq.data
                if self.fake_allocate:
                    tables[seq.seq_id] = (
                        self.block_manager.get_fake_block_table_and_delete(
                            seq))
                else:
                    tables[seq.seq_id] = self.block_manager.get_block_table(
                        seq)
                self.block_manager.access_all_blocks_in_seq(seq, now)

            cached_ids = self.block_manager.get_common_computed_block_ids(
                group.get_seqs(status=SequenceStatus.RUNNING))

            metadata.append(
                SequenceGroupMetadata(
                    request_id=group.request_id,
                    is_prompt=group.is_prefill(),
                    seq_data=seq_data,
                    sampling_params=group.sampling_params,
                    block_tables=tables,
                    token_chunk_size=entry.token_chunk_size,
                    lora_request=group.lora_request,
                    computed_block_nums=cached_ids,
                    state=group.state,
                    multi_modal_data=group.multi_modal_data
                    if outputs.num_prefill_groups > 0 else None,
                    need_score=outputs.need_score,
                    guide=group.guide,
                ))

        # This batch's blocks are computed before the next schedule call.
        for entry in outputs.scheduled_seq_groups:
            self.block_manager.mark_blocks_as_computed(entry.seq_group)

        return metadata

    # ------------------------------------------------------------------
    # Free / fork / termination
    # ------------------------------------------------------------------

    def fork_seq(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        self.block_manager.fork(parent_seq, child_seq)

    def free_seq(self, seq: Sequence) -> None:
        self.block_manager.free(seq)

    def free_finished_seq_groups(self) -> None:
        # Synthetic-data-generation accounting (reference :1697-1721).
        bounds = self.spec.synthetic_bounds
        if bounds:
            for group in self.running:
                if not group.is_finished():
                    continue
                produced = group.get_seqs()[0].get_output_len()
                for i, b in enumerate(bounds):
                    if ((b.lo == -1 or produced >= b.lo)
                            and (b.hi == -1 or produced <= b.hi)):
                        self._finished_req[i] += 1
                        break

        bounds_met = bounds and all(
            self._finished_req[i] >= bounds[i].count
            for i in range(len(bounds)))
        timed_out = (self.spec.timelimit is not None and
                     time.time() - self.start_time >= self.spec.timelimit)
        if bounds_met or timed_out:
            # Data-generation run complete: drain everything.
            for lane in (self.waiting, self.running, self.swapped):
                for group in lane:
                    for seq in group.get_seqs():
                        if not seq.is_finished():
                            seq.status = SequenceStatus.FINISHED_ABORTED
                            self.free_seq(seq)
                lane.clear()
            self._xpt_expected.clear()

        for g in self.running:
            if g.is_finished():
                # Per-request policy state dies with the request (the
                # expected-length table would otherwise grow without
                # bound in a long-running server under xpt).
                self._xpt_expected.pop(g.request_id, None)
        self.running = [g for g in self.running if not g.is_finished()]

    # ------------------------------------------------------------------
    # State-transition helpers
    # ------------------------------------------------------------------

    def _ignore(self, group: SequenceGroup, plan: StepPlan) -> None:
        for seq in group.get_seqs(status=SequenceStatus.WAITING):
            seq.status = SequenceStatus.FINISHED_IGNORED
        plan.ignored.append(group)

    def _start_running(self, group: SequenceGroup) -> int:
        """Allocate + transition to RUNNING; returns the number of leading
        prompt tokens satisfied by prefix-cache hits.  Those tokens are
        marked computed on the sequence ledger so the executor's prefill
        chunk starts at the cached boundary and the chunked-prefill kernel
        runs context attention over the shared blocks instead of
        recomputing them (reference model_runner.py:314-342)."""
        if self.fake_allocate:
            self.block_manager.fake_allocate(group)
            cached = 0
        else:
            cached = self.block_manager.allocate(group)
        for seq in group.get_seqs(status=SequenceStatus.WAITING):
            seq.status = SequenceStatus.RUNNING
        sp = group.sampling_params
        if sp is not None and sp.prompt_logprobs is not None:
            # prompt_logprobs needs logits at EVERY prompt position; keep
            # the blocks shared but recompute the cached tokens.
            cached = 0
        if cached:
            group.update_num_computed_tokens(cached)
        return cached

    def _grow_tables(self, group: SequenceGroup,
                     dup: Dict[int, List[int]]) -> None:
        lookahead = self._lookahead(is_prefill=False)
        for seq in group.get_seqs(status=SequenceStatus.RUNNING):
            for src, dsts in self.block_manager.append_slots(
                    seq, lookahead).items():
                dup.setdefault(src, []).extend(dsts)

    def _evict(self, group: SequenceGroup, plan: StepPlan,
               mode: Optional[PreemptionMode]) -> None:
        """Take a running request off the device.  Default policy:
        recompute single-stream requests, swap multi-stream ones; the
        generalized path always forces SWAP."""
        if mode is None:
            mode = (PreemptionMode.RECOMPUTE
                    if group.get_max_num_running_seqs() == 1 else
                    PreemptionMode.SWAP)
        if mode is PreemptionMode.RECOMPUTE:
            seqs = group.get_seqs(status=SequenceStatus.RUNNING)
            assert len(seqs) == 1
            for seq in seqs:
                seq.status = SequenceStatus.WAITING
                self.free_seq(seq)
                seq.reset_state_for_recompute()
            plan.recomputed.append(group)
        else:
            self._swap_out(group, plan.d2h)
            group.count_swap_out()
            plan.parked.append(group)

    def _swap_in(self, group: SequenceGroup, h2d: Dict[int, int]) -> None:
        h2d.update(self.block_manager.swap_in(group))
        for seq in group.get_seqs(status=SequenceStatus.SWAPPED):
            seq.status = SequenceStatus.RUNNING

    def _swap_out(self, group: SequenceGroup, d2h: Dict[int, int]) -> None:
        if not self.block_manager.can_swap_out(group):
            raise RuntimeError(
                "host swap space exhausted; increase swap_space")
        d2h.update(self.block_manager.swap_out(group))
        for seq in group.get_seqs(status=SequenceStatus.RUNNING):
            seq.status = SequenceStatus.SWAPPED

    # ------------------------------------------------------------------
    # Misc
    # ------------------------------------------------------------------

    def _passed_delay(self, now: float) -> bool:
        if self.prev_prompt:
            self.last_prompt_latency = now - self.prev_time
        self.prev_time, self.prev_prompt = now, False
        if self.scheduler_config.delay_factor > 0 and self.waiting:
            earliest = min(g.metrics.arrival_time for g in self.waiting)
            return ((now - earliest) > self.scheduler_config.delay_factor *
                    self.last_prompt_latency or not self.running)
        return True

    def _lookahead(self, is_prefill: bool) -> int:
        return 0 if is_prefill else self.scheduler_config.num_lookahead_slots


@dataclass
class _Pick:
    """One packed request in the generalized path."""
    group: SequenceGroup
    lane: str      # lane at pack time
    chunk: int     # tokens charged this step
    seats: int     # seq seats charged this step


def _load_distribution(path: str) -> Tuple[List[float], List[float]]:
    """xpt score->expected-length table: .json ([keys, values]) or a torch
    .pt pair (the reference stores it with torch.save)."""
    if path.endswith(".json"):
        import json
        with open(path) as f:
            keys, values = json.load(f)
        return list(keys), list(values)
    import torch
    keys, values = torch.load(path, weights_only=False)
    return list(keys), list(values)
