"""Pipelined admission: new prefills dispatched behind an in-flight step.

The async engine admits mid-step arrivals through
``LLMEngine.admission_step_begin`` (scheduler.schedule_admissions) while
the previous dispatch is still executing.  These tests drive the split
step API directly on the sync engine and check end-state parity with the
plain step-by-step path.
"""
import numpy as np
import pytest

from vllm_ltr_tpu import SamplingParams
from vllm_ltr_tpu.engine.arg_utils import EngineArgs
from vllm_ltr_tpu.engine.llm_engine import LLMEngine


def make_engine():
    args = EngineArgs(model="test-llama-tiny", skip_tokenizer_init=True,
                      max_model_len=128, max_num_seqs=8,
                      num_gpu_blocks_override=64, swap_space=0.01,
                      disable_log_stats=True)
    return LLMEngine.from_engine_args(args)


def prompts(seed=0, n=3, length=12):
    rng = np.random.RandomState(seed)
    return [list(map(int, rng.randint(5, 500, size=length)))
            for _ in range(n)]


def collect(engine):
    done = {}
    for _ in range(200):
        if not engine.has_unfinished_requests():
            break
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out.outputs[0].token_ids
    return done


@pytest.mark.parametrize("max_tokens", [6])
def test_sneak_admission_matches_stepwise(max_tokens):
    ps = prompts()
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                        ignore_eos=True)

    # Reference: plain stepwise engine.
    ref = make_engine()
    for i, p in enumerate(ps):
        ref.add_request(str(i), None, sp, prompt_token_ids=p)
    want = collect(ref)

    # Pipelined: request 0 prefills; requests 1..n arrive "mid-step" and
    # are admitted while request 0's dispatch is notionally in flight.
    eng = make_engine()
    eng.add_request("0", None, sp, prompt_token_ids=ps[0])
    fin1, plan1 = eng.step_begin()
    assert fin1 is not None
    for i, p in enumerate(ps[1:], start=1):
        eng.add_request(str(i), None, sp, prompt_token_ids=p)
    fin2, plan2 = eng.admission_step_begin()
    assert fin2 is not None, "sneak admission produced no prefill"
    assert plan2.num_prefill_groups == len(ps) - 1
    # Finish in dispatch order (device executes them in queue order).
    for out in eng.step_finish(fin1(), plan1):
        assert not out.finished
    sneak_outs = eng.step_finish(fin2(), plan2)
    assert {o.request_id for o in sneak_outs} == {str(i) for i in
                                                  range(1, len(ps))}
    got = collect(eng)

    assert set(got) == set(want)
    for rid in want:
        assert got[rid] == want[rid], f"request {rid} diverged"


def test_sneak_admission_respects_seat_budget():
    """Admissions never exceed max_num_seqs minus running seats."""
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    eng = make_engine()  # max_num_seqs=8
    ps = prompts(seed=1, n=10)
    for i, p in enumerate(ps[:2]):
        eng.add_request(str(i), None, sp, prompt_token_ids=p)
    fin1, plan1 = eng.step_begin()
    for i, p in enumerate(ps[2:], start=2):
        eng.add_request(str(i), None, sp, prompt_token_ids=p)
    fin2, plan2 = eng.admission_step_begin()
    admitted = plan2.num_prefill_groups
    assert admitted <= 6  # 8 seats - 2 running
    eng.step_finish(fin1(), plan1)
    if fin2 is not None:
        eng.step_finish(fin2(), plan2)
    done = collect(eng)
    assert len(done) == len(ps)


def test_mlfq_survives_pipelined_admission():
    """Regression (round-4 online mlfq@32 crash): with pipelined
    admission step_finish runs once per dispatched plan, and MLFQ's
    free_finished hook must consume real_running exactly once — the
    double re-enqueue put duplicate groups into the level queues and
    the next ranked pass packed one twice."""
    args = EngineArgs(model="test-llama-tiny", skip_tokenizer_init=True,
                      max_model_len=128, max_num_seqs=8,
                      num_gpu_blocks_override=64, swap_space=0.01,
                      schedule_type="mlfq", disable_log_stats=True)
    eng = LLMEngine.from_engine_args(args)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    ps = prompts(seed=7, n=12)
    rid = 0
    for p in ps[:3]:
        eng.add_request(str(rid), None, sp, prompt_token_ids=p)
        rid += 1
    steps = 0
    while eng.has_unfinished_requests() and steps < 300:
        fin, plan = eng.step_begin()
        fin2 = plan2 = None
        if steps % 2 == 0 and rid < len(ps):
            eng.add_request(str(rid), None, sp, prompt_token_ids=ps[rid])
            rid += 1
            fin2, plan2 = eng.admission_step_begin()
        raw = fin() if fin is not None else []
        eng.step_finish(raw, plan)
        if fin2 is not None:
            eng.step_finish(fin2(), plan2)
        steps += 1
    assert not eng.has_unfinished_requests()
    assert rid == len(ps)


def test_sync_step_batches_admission_cohort():
    """The sync engine's step() enqueues a waiting cohort's prefill waves
    behind the main dispatch (one device round trip per cohort, VERDICT
    r4 'admission cadence'): with a token budget that fits 2 prompts per
    wave, one step() call still admits all 8 seats."""
    def engine(pipeline):
        args = EngineArgs(model="test-llama-tiny", skip_tokenizer_init=True,
                          max_model_len=128, max_num_seqs=8,
                          max_num_batched_tokens=128,
                          num_gpu_blocks_override=128, swap_space=0.01,
                          disable_log_stats=True,
                          disable_pipeline_admission=not pipeline)
        return LLMEngine.from_engine_args(args)

    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    ps = prompts(seed=3, n=8, length=48)

    eng = engine(pipeline=True)
    for i, p in enumerate(ps):
        eng.add_request(str(i), None, sp, prompt_token_ids=p)
    eng.step()
    from vllm_ltr_tpu.sequence import SequenceStatus
    running = [g for g in eng.scheduler.running
               if g.get_seqs(status=SequenceStatus.RUNNING)]
    assert len(running) == 8, (
        f"cohort not batched into one step: {len(running)} running")
    got = collect(eng)

    ref = engine(pipeline=False)
    for i, p in enumerate(ps):
        ref.add_request(str(i), None, sp, prompt_token_ids=p)
    ref.step()
    assert len(ref.scheduler.waiting) > 0  # stepwise path really is slower
    want = collect(ref)
    assert set(got) == set(want)
    for rid in want:
        assert got[rid] == want[rid], f"request {rid} diverged"


def test_sneak_admission_empty_waiting_is_noop():
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    eng = make_engine()
    eng.add_request("0", None, sp, prompt_token_ids=prompts(n=1)[0])
    fin1, plan1 = eng.step_begin()
    fin2, plan2 = eng.admission_step_begin()
    assert fin2 is None and plan2.is_empty()
    eng.step_finish(fin1(), plan1)
    assert len(collect(eng)) == 1
