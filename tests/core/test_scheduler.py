"""Scheduler unit tests: stock paths + the LTR generalized path.

Style follows reference tests/core/test_scheduler.py: construct the Scheduler
directly with tiny configs (no accelerator, no model), drive it with dummy
prompts. The reference fork shipped NO tests for the LTR scheduler; these
cover it (SURVEY.md §4 note)."""
import time
from typing import List

import pytest

from vllm_ltr_tpu.config import CacheConfig, SchedulerConfig
from vllm_ltr_tpu.core.scheduler import Scheduler, SchedulingBudget
from vllm_ltr_tpu.sequence import SequenceGroup, SequenceStatus

from .utils import (append_new_token, create_dummy_prompt,
                    schedule_and_update_computed_tokens)


def make_scheduler(schedule_type="fcfs",
                   max_num_batched_tokens=4096,
                   max_num_seqs=64,
                   max_model_len=2048,
                   num_gpu_blocks=16,
                   num_cpu_blocks=16,
                   block_size=4,
                   enable_chunked_prefill=False,
                   watermark=0.0,
                   lazy_aux_scoring=False):
    scheduler_config = SchedulerConfig(
        max_num_batched_tokens=max_num_batched_tokens,
        max_num_seqs=max_num_seqs,
        max_model_len=max_model_len,
        enable_chunked_prefill=enable_chunked_prefill,
        schedule_type=schedule_type,
        lazy_aux_scoring=lazy_aux_scoring)
    cache_config = CacheConfig(block_size=block_size, hbm_utilization=0.9)
    cache_config.num_gpu_blocks = num_gpu_blocks
    cache_config.num_cpu_blocks = num_cpu_blocks
    scheduler = Scheduler(scheduler_config, cache_config, None)
    scheduler.block_manager.watermark_blocks = int(watermark *
                                                   num_gpu_blocks)
    return scheduler


def test_add_seq_group():
    scheduler = make_scheduler()
    for i in range(4):
        _, seq_group = create_dummy_prompt(str(i), 4, block_size=4)
        scheduler.add_seq_group(seq_group)
        assert scheduler.get_num_unfinished_seq_groups() == i + 1
        assert seq_group.idle == 0 and seq_group.pri == 0


def test_abort_seq_group():
    scheduler = make_scheduler()
    request_ids = set()
    for i in range(4):
        _, seq_group = create_dummy_prompt(str(i), 4, block_size=4)
        scheduler.add_seq_group(seq_group)
        request_ids.add(str(i))
    scheduler.abort_seq_group(request_ids)
    assert scheduler.get_num_unfinished_seq_groups() == 0


def test_fcfs_schedule_simple():
    scheduler = make_scheduler(max_num_seqs=4, num_gpu_blocks=64)
    groups: List[SequenceGroup] = []
    for i in range(3):
        _, g = create_dummy_prompt(str(i), 8, block_size=4)
        scheduler.add_seq_group(g)
        groups.append(g)

    # First step: all three prefills fit the budget.
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert out.num_prefill_groups == 3
    assert len(metas) == 3
    assert all(m.is_prompt for m in metas)
    assert set(m.request_id for m in metas) == {"0", "1", "2"}
    assert out.num_batched_tokens == 24

    # Decode step.
    for g in groups:
        append_new_token(g, 42)
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert out.num_prefill_groups == 0
    assert len(metas) == 3
    assert all(not m.is_prompt for m in metas)
    assert out.num_batched_tokens == 3


def test_fcfs_prefill_batch_respects_token_budget():
    scheduler = make_scheduler(max_num_batched_tokens=2048,
                               max_num_seqs=64,
                               num_gpu_blocks=1024)
    for i in range(3):
        _, g = create_dummy_prompt(str(i), 1000, block_size=4)
        scheduler.add_seq_group(g)
    _, out = schedule_and_update_computed_tokens(scheduler)
    # Only two 1000-token prompts fit in the 2048 budget.
    assert out.num_prefill_groups == 2
    assert out.num_batched_tokens == 2000
    for s in out.scheduled_seq_groups:
        append_new_token(s.seq_group, 1)
    _, out = schedule_and_update_computed_tokens(scheduler)
    # Remaining prompt is a prefill-first step (default path).
    assert out.num_prefill_groups == 1


def test_preemption_recompute_on_oom():
    """When decoding outgrows the cache, the lowest-priority running request
    is preempted by recompute and rejoins the waiting queue."""
    scheduler = make_scheduler(max_num_seqs=4,
                               num_gpu_blocks=4,
                               num_cpu_blocks=4,
                               block_size=4)
    _, g0 = create_dummy_prompt("0", 8, block_size=4)
    _, g1 = create_dummy_prompt("1", 8, block_size=4)
    scheduler.add_seq_group(g0)
    scheduler.add_seq_group(g1)
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert out.num_prefill_groups == 2  # all 4 blocks used

    # Decode: both need one more block -> only one can grow.
    append_new_token(g0, 1)
    append_new_token(g1, 1)
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert len(out.scheduled_seq_groups) == 1
    assert len(scheduler.waiting) == 1  # recompute-preempted
    preempted = scheduler.waiting[0]
    assert preempted.get_seqs()[0].status == SequenceStatus.WAITING
    assert preempted.get_seqs()[0].data.get_num_computed_tokens() == 0


def test_scheduling_budget():
    budget = SchedulingBudget(token_budget=100, max_num_seqs=4)
    assert budget.can_schedule(num_new_tokens=50, num_new_seqs=2)
    budget.add_num_batched_tokens("r1", 50)
    budget.add_num_seqs("r1", 2)
    # Double-add of the same request id is idempotent.
    budget.add_num_batched_tokens("r1", 50)
    assert budget.num_batched_tokens == 50
    assert budget.remaining_token_budget() == 50
    assert not budget.can_schedule(num_new_tokens=51, num_new_seqs=1)
    budget.subtract_num_batched_tokens("r1", 50)
    assert budget.num_batched_tokens == 0


def test_chunked_prefill_chunks_long_prompt():
    scheduler = make_scheduler(max_num_batched_tokens=64,
                               max_num_seqs=8,
                               enable_chunked_prefill=True,
                               num_gpu_blocks=256)
    _, g = create_dummy_prompt("0", 100, block_size=4)
    scheduler.add_seq_group(g)
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert out.num_prefill_groups == 1
    assert out.scheduled_seq_groups[0].token_chunk_size == 64
    assert g.get_seqs()[0].data.get_num_computed_tokens() == 64
    # Second chunk finishes the prompt.
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert out.scheduled_seq_groups[0].token_chunk_size == 36
    assert not g.is_prefill()


def test_chunked_prefill_mixes_decode_and_prefill():
    scheduler = make_scheduler(max_num_batched_tokens=32,
                               max_num_seqs=8,
                               enable_chunked_prefill=True,
                               num_gpu_blocks=256)
    _, g0 = create_dummy_prompt("0", 8, block_size=4)
    scheduler.add_seq_group(g0)
    _, out = schedule_and_update_computed_tokens(scheduler)
    append_new_token(g0, 7)
    # New prompt arrives; decode of g0 should still be scheduled first.
    _, g1 = create_dummy_prompt("1", 40, block_size=4)
    scheduler.add_seq_group(g1)
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert len(out.scheduled_seq_groups) == 2
    kinds = {
        s.seq_group.request_id: s.token_chunk_size
        for s in out.scheduled_seq_groups
    }
    assert kinds["0"] == 1  # decode
    assert kinds["1"] == 31  # chunked prefill filling the leftover budget


# ---------------------------------------------------------------------------
# Generalized (rank-ordered) path
# ---------------------------------------------------------------------------


class FakeScorer:
    """Deterministic aux scorer: score = -est_tokens (so higher score =
    shorter predicted output, like the real LTR predictor)."""

    def __init__(self):
        self.calls = 0

    def obtain_aux_scores(self, seq_groups):
        self.calls += 1
        scores = []
        for g in seq_groups:
            score = -float(g.sampling_params.est_tokens)
            g.set_aux_model_score(score)
            scores.append(score)
        return scores


def test_fifo_general_schedule_orders_by_arrival():
    scheduler = make_scheduler(schedule_type="fifo",
                               max_num_seqs=2,
                               num_gpu_blocks=64)
    now = time.time()
    for i, arrival in [(0, now + 2), (1, now + 0), (2, now + 1)]:
        _, g = create_dummy_prompt(str(i), 8, block_size=4,
                                   arrival_time=arrival)
        scheduler.add_seq_group(g)
    _, out = schedule_and_update_computed_tokens(scheduler)
    # max_num_seqs=2: the two earliest arrivals run.
    ids = [s.seq_group.request_id for s in out.scheduled_seq_groups]
    assert set(ids) == {"1", "2"}


def test_opt_policy_schedules_by_score():
    scheduler = make_scheduler(schedule_type="opt",
                               max_num_seqs=2,
                               num_gpu_blocks=64)
    scheduler.aux_model = FakeScorer()
    for i, est in [(0, 500), (1, 10), (2, 100)]:
        _, g = create_dummy_prompt(str(i), 8, block_size=4, est_tokens=est)
        scheduler.add_seq_group(g)
    _, out = schedule_and_update_computed_tokens(scheduler)
    ids = [s.seq_group.request_id for s in out.scheduled_seq_groups]
    # Highest score = smallest est_tokens first.
    assert ids == ["1", "2"]
    assert out.need_score
    # Each request is scored exactly once, before first scheduling.
    assert scheduler.aux_model.calls == 1
    for s in out.scheduled_seq_groups:
        append_new_token(s.seq_group, 1)
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert scheduler.aux_model.calls == 1  # no rescoring


def test_lazy_aux_scoring_skips_uncontended_passes():
    """--lazy-aux-scoring: passes that admit the whole population never
    dispatch the predictor; the first contended pass scores every
    unscored request (any lane) in ONE batch."""
    scheduler = make_scheduler(schedule_type="opt",
                               max_num_seqs=3,
                               num_gpu_blocks=64,
                               lazy_aux_scoring=True)
    scheduler.aux_model = FakeScorer()
    for i, est in [(0, 500), (1, 10)]:
        _, g = create_dummy_prompt(str(i), 8, block_size=4, est_tokens=est)
        scheduler.add_seq_group(g)
    _, out = schedule_and_update_computed_tokens(scheduler)
    # 2 requests, 3 seats: no contention -> no scoring dispatch.
    assert scheduler.aux_model.calls == 0
    assert len(out.scheduled_seq_groups) == 2
    for s in out.scheduled_seq_groups:
        append_new_token(s.seq_group, 1)

    # Two more arrivals exceed the seats: NOW everything unscored gets
    # scored in one batched dispatch, including the running lane.
    for i, est in [(2, 100), (3, 5)]:
        _, g = create_dummy_prompt(str(i), 8, block_size=4, est_tokens=est)
        scheduler.add_seq_group(g)
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert scheduler.aux_model.calls == 1
    assert all(not g.need_aux_model_score()
               for g in scheduler.waiting + scheduler.running)
    ids = {s.seq_group.request_id for s in out.scheduled_seq_groups}
    # The three best-ranked (smallest est_tokens) hold the 3 seats.
    assert ids == {"1", "2", "3"}


def test_opt_policy_preempts_lower_ranked_requests():
    """A newly arriving short request must preempt a long-running one once
    the cache is full: blocks are taken from the lowest-ranked victim."""
    scheduler = make_scheduler(schedule_type="opt",
                               max_num_seqs=8,
                               num_gpu_blocks=12,
                               num_cpu_blocks=12,
                               block_size=4)
    scheduler.aux_model = FakeScorer()
    # Long job takes 4 of the 12 blocks.
    _, long_g = create_dummy_prompt("long", 16, block_size=4,
                                    est_tokens=1000)
    scheduler.add_seq_group(long_g)
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert [s.seq_group.request_id for s in out.scheduled_seq_groups
            ] == ["long"]
    append_new_token(long_g, 1)

    # Short job arrives needing 4 blocks (+1 growth for long): fits.
    _, short_g = create_dummy_prompt("short", 16, block_size=4, est_tokens=5)
    scheduler.add_seq_group(short_g)
    _, out = schedule_and_update_computed_tokens(scheduler)
    ids = [s.seq_group.request_id for s in out.scheduled_seq_groups]
    assert "short" in ids and "long" in ids

    append_new_token(short_g, 1)
    append_new_token(long_g, 1)

    # Another short job: no free blocks -> the long job must be swapped out.
    _, short2 = create_dummy_prompt("short2", 16, block_size=4, est_tokens=2)
    scheduler.add_seq_group(short2)
    _, out = schedule_and_update_computed_tokens(scheduler)
    ids = [s.seq_group.request_id for s in out.scheduled_seq_groups]
    assert "short2" in ids
    assert "long" not in ids
    assert len(scheduler.swapped) == 1
    assert scheduler.swapped[0].request_id == "long"
    assert out.blocks_to_swap_out  # KV moved to host
    assert long_g.running_info.swap_out == 1

    # Finish the shorts -> the long job is proactively swapped back in.
    for s in (short_g, short2):
        for seq in s.get_seqs():
            seq.status = SequenceStatus.FINISHED_STOPPED
            scheduler.free_seq(seq)
    scheduler.free_finished_seq_groups()
    _, out = schedule_and_update_computed_tokens(scheduler)
    ids = [s.seq_group.request_id for s in out.scheduled_seq_groups]
    assert ids == ["long"]
    assert out.blocks_to_swap_in
    assert len(scheduler.swapped) == 0


def test_sneak_admission_follows_policy_order():
    """schedule_admissions must admit in the ranked policy's order, not
    FCFS: under ``opt`` with one free seat, the shorter-predicted of two
    simultaneous arrivals prefills first (VERDICT r3 item 5)."""
    scheduler = make_scheduler(schedule_type="opt",
                               max_num_seqs=2,
                               num_gpu_blocks=64)
    scheduler.aux_model = FakeScorer()
    # One running request occupies a seat.
    _, running = create_dummy_prompt("running", 8, block_size=4,
                                     est_tokens=50)
    scheduler.add_seq_group(running)
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert [s.seq_group.request_id
            for s in out.scheduled_seq_groups] == ["running"]
    append_new_token(running, 1)

    # Burst: long arrives BEFORE short (FCFS order would pick "long").
    _, long_g = create_dummy_prompt("long", 8, block_size=4,
                                    est_tokens=500)
    _, short_g = create_dummy_prompt("short", 8, block_size=4,
                                     est_tokens=10)
    scheduler.add_seq_group(long_g)
    scheduler.add_seq_group(short_g)

    metas, out = scheduler.schedule_admissions()
    ids = [s.seq_group.request_id for s in out.scheduled_seq_groups]
    assert ids == ["short"], ids  # policy order, one free seat
    # Scored exactly once, before first scheduling (contract kept).
    assert scheduler.aux_model.calls == 2  # initial pass + sneak pass
    assert not long_g.need_aux_model_score()
    assert not short_g.need_aux_model_score()


def test_sneak_admission_fcfs_keeps_arrival_order():
    scheduler = make_scheduler(schedule_type="fcfs",
                               max_num_seqs=2,
                               num_gpu_blocks=64)
    _, a = create_dummy_prompt("a", 8, block_size=4)
    _, b = create_dummy_prompt("b", 8, block_size=4)
    scheduler.add_seq_group(a)
    scheduler.add_seq_group(b)
    _, out = scheduler.schedule_admissions()
    ids = [s.seq_group.request_id for s in out.scheduled_seq_groups]
    assert ids == ["a", "b"]


def test_starvation_promotion():
    """With starv2-period2, a request idle for >=2 steps is promoted above
    higher-scored requests for 2 scheduled steps, then demoted."""
    scheduler = make_scheduler(schedule_type="opt-starv2-period2",
                               max_num_seqs=1,
                               num_gpu_blocks=64)
    scheduler.aux_model = FakeScorer()
    _, short = create_dummy_prompt("short", 4, block_size=4, est_tokens=1)
    _, long_g = create_dummy_prompt("long", 4, block_size=4, est_tokens=100)
    scheduler.add_seq_group(short)
    scheduler.add_seq_group(long_g)

    # Steps 1-2: short runs (higher score), long idles to the threshold.
    for _ in range(2):
        _, out = schedule_and_update_computed_tokens(scheduler)
        assert [s.seq_group.request_id for s in out.scheduled_seq_groups
                ] == ["short"]
        append_new_token(short, 1)
    assert long_g.idle == 2

    # Steps 3-4: long is promoted (pri=-1) above short for period=2 steps.
    for _ in range(2):
        _, out = schedule_and_update_computed_tokens(scheduler)
        assert [s.seq_group.request_id for s in out.scheduled_seq_groups
                ] == ["long"]
        assert long_g.pri == -1
        append_new_token(long_g, 1)
    assert long_g.runs == 0

    # Step 5: short (idle >= 2) takes over promotion; long is demoted.
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert [s.seq_group.request_id for s in out.scheduled_seq_groups
            ] == ["short"]
    assert long_g.pri == 0


def test_srtf_policy():
    scheduler = make_scheduler(schedule_type="srtf",
                               max_num_seqs=1,
                               num_gpu_blocks=64)
    _, a = create_dummy_prompt("a", 4, block_size=4, est_tokens=100)
    _, b = create_dummy_prompt("b", 4, block_size=4, est_tokens=50)
    scheduler.add_seq_group(a)
    scheduler.add_seq_group(b)
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert [s.seq_group.request_id for s in out.scheduled_seq_groups] == ["b"]


def test_queue_conservation_invariant():
    """No request is ever lost or duplicated by the generalized path."""
    scheduler = make_scheduler(schedule_type="opt",
                               max_num_seqs=4,
                               num_gpu_blocks=12,
                               num_cpu_blocks=32,
                               block_size=4)
    scheduler.aux_model = FakeScorer()
    import random
    rng = random.Random(0)
    groups = []
    for i in range(10):
        _, g = create_dummy_prompt(str(i), rng.randint(4, 12), block_size=4,
                                   est_tokens=rng.randint(1, 200))
        scheduler.add_seq_group(g)
        groups.append(g)
    for step in range(20):
        total = scheduler.get_num_unfinished_seq_groups()
        _, out = schedule_and_update_computed_tokens(scheduler)
        assert scheduler.get_num_unfinished_seq_groups() == total
        for s in out.scheduled_seq_groups:
            if not s.seq_group.is_prefill():
                append_new_token(s.seq_group, step)


def test_synthetic_bound_termination():
    """fcfs-synthetic((-1,-1,N),) drains all queues after N finished."""
    scheduler = make_scheduler(schedule_type="fcfs-synthetic((-1,-1,1),)",
                               max_num_seqs=4,
                               num_gpu_blocks=64)
    _, g0 = create_dummy_prompt("0", 4, block_size=4)
    _, g1 = create_dummy_prompt("1", 4, block_size=4)
    scheduler.add_seq_group(g0)
    scheduler.add_seq_group(g1)
    _, out = schedule_and_update_computed_tokens(scheduler)
    # Finish g0.
    append_new_token(g0, 1)
    for seq in g0.get_seqs():
        seq.status = SequenceStatus.FINISHED_STOPPED
        scheduler.free_seq(seq)
    scheduler.free_finished_seq_groups()
    # The bound (1 finished request) is met: everything is drained.
    assert scheduler.get_num_unfinished_seq_groups() == 0


def test_schedule_spec_parsing():
    from vllm_ltr_tpu.config import ScheduleSpec
    spec = ScheduleSpec.parse("opt-starv200-period10")
    assert spec.policy == "opt"
    assert spec.starvation.threshold == 200
    assert spec.starvation.period == 10
    assert spec.needs_scores and spec.uses_general_path

    spec = ScheduleSpec.parse("fcfs-synthetic((100,200,100),(-1,-1,200))")
    assert spec.policy == "fcfs"
    assert len(spec.synthetic_bounds) == 2
    assert spec.synthetic_bounds[0].lo == 100
    assert spec.synthetic_bounds[1].count == 200

    spec = ScheduleSpec.parse("fifo-timelimit600")
    assert spec.policy == "fifo" and spec.timelimit == 600

    spec = ScheduleSpec.parse("mlfq-async-quant0.03-thres10")
    assert spec.is_mlfq
    assert spec.mlfq.base_quantum == 0.03
    assert spec.mlfq.threshold == 10
    assert spec.mlfq.use_async

    # The reference's own spelling (bench-70B.sh: mlfq-base0.03-thres10).
    spec = ScheduleSpec.parse("mlfq-base0.03-thres10")
    assert spec.is_mlfq and spec.mlfq.base_quantum == 0.03
    assert spec.mlfq.threshold == 10 and not spec.mlfq.use_async

    spec = ScheduleSpec.parse("rPO")
    assert spec.policy == "rPO"
    spec = ScheduleSpec.parse("ropt")
    assert spec.policy == "ropt"
    spec = ScheduleSpec.parse("sjf")
    assert not spec.uses_general_path
