"""Async pipelined-admission path: the actual loop-thread / worker-thread
interleaving production serving runs (VERDICT r3 item 6).

Drives :class:`AsyncLLMEngine` with requests injected while a step is in
flight and asserts (a) sneak dispatches occur before the in-flight step
finishes and (b) token parity with the non-pipelined engine.
"""
import asyncio
import time

import numpy as np
import pytest

from vllm_ltr_tpu import SamplingParams
from vllm_ltr_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine


def make_async_engine(pipeline: bool) -> AsyncLLMEngine:
    args = AsyncEngineArgs(model="test-llama-tiny", skip_tokenizer_init=True,
                           max_model_len=128, max_num_seqs=8,
                           num_gpu_blocks_override=64, swap_space=0.01,
                           disable_log_stats=True,
                           disable_log_requests=True)
    args.disable_pipeline_admission = not pipeline
    return AsyncLLMEngine.from_engine_args(args)


def prompts(n=3, length=12, seed=0):
    rng = np.random.RandomState(seed)
    return [list(map(int, rng.randint(5, 500, size=length)))
            for _ in range(n)]


async def _consume(eng, rid, prompt, sp):
    tokens = None
    async for out in eng.generate(None, sp, rid, prompt_token_ids=prompt):
        if out.finished:
            tokens = out.outputs[0].token_ids
    return rid, tokens


async def _run_pipelined(ps, sp):
    eng = make_async_engine(pipeline=True)

    # Stretch every device fetch so the event loop has time to fold
    # mid-step arrivals and dispatch sneak admissions behind it — on CPU
    # a step completes faster than the loop can interleave.
    orig_step_begin = eng.engine.step_begin
    in_flight = {"n": 0}

    def slow_step_begin():
        fin, plan = orig_step_begin()
        if fin is None:
            return fin, plan
        in_flight["n"] += 1  # in flight from dispatch until fetch returns

        def slow_fin():
            time.sleep(0.25)
            try:
                return fin()
            finally:
                in_flight["n"] -= 1
        return slow_fin, plan

    eng.engine.step_begin = slow_step_begin

    sneaks = []
    orig_adm = eng.engine.admission_step_begin

    def counting_adm():
        # Sample at entry: whether the main step's fetch was still
        # executing when the driver decided to sneak (the dispatch
        # itself may compile a first-seen shape and outlast the step).
        was_in_flight = in_flight["n"] > 0
        fin2, plan2 = orig_adm()
        if fin2 is not None:
            sneaks.append(was_in_flight)
        return fin2, plan2

    eng.engine.admission_step_begin = counting_adm

    first = asyncio.create_task(_consume(eng, "0", ps[0], sp))
    # Let request 0's step dispatch and enter its (slowed) fetch.
    await asyncio.sleep(0.1)
    rest = [asyncio.create_task(_consume(eng, str(i), p, sp))
            for i, p in enumerate(ps[1:], start=1)]
    results = dict([await first] + [await t for t in rest])
    return results, sneaks


async def _run_plain(ps, sp):
    eng = make_async_engine(pipeline=False)
    tasks = [asyncio.create_task(_consume(eng, str(i), p, sp))
             for i, p in enumerate(ps)]
    return dict([await t for t in tasks])


def test_async_pipelined_sneaks_and_parity():
    ps = prompts()
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    got, sneaks = asyncio.run(_run_pipelined(ps, sp))
    assert len(got) == len(ps) and all(v for v in got.values())
    assert sneaks, "no sneak admission was dispatched mid-step"
    assert any(sneaks), "sneaks dispatched only after the step finished"

    want = asyncio.run(_run_plain(ps, sp))
    assert set(got) == set(want)
    for rid in want:
        assert got[rid] == want[rid], f"request {rid} diverged"


def test_async_cancel_mid_step():
    """Aborting a request while its step is in flight must not wedge the
    driver or other requests."""
    ps = prompts(n=2, seed=3)
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)

    async def run():
        eng = make_async_engine(pipeline=True)

        async def consume_some(rid, prompt):
            n = 0
            async for _ in eng.generate(None, sp, rid,
                                        prompt_token_ids=prompt):
                n += 1
                if rid == "0" and n >= 2:
                    raise asyncio.CancelledError  # client disconnect
            return n

        t0 = asyncio.create_task(consume_some("0", ps[0]))
        t1 = asyncio.create_task(consume_some("1", ps[1]))
        with pytest.raises(asyncio.CancelledError):
            await t0
        # The surviving request still runs to completion.
        assert await t1 > 0
        assert not eng.errored

    asyncio.run(run())
