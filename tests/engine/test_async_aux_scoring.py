"""Async aux scoring (--async-aux-scoring): the predictor dispatch rides
the device queue behind the in-flight wave instead of blocking
schedule(); scores land one pass later, requests still score exactly
once and never schedule before their score (they rank last while it is
in flight).  Round-4 soak attribution motivated this: ~90 ms/step of
scheduling time was small synchronous scorer round trips.
"""
import numpy as np
import pytest

from vllm_ltr_tpu import SamplingParams
from vllm_ltr_tpu.engine.arg_utils import EngineArgs
from vllm_ltr_tpu.engine.aux_scorer import AuxScorer
from vllm_ltr_tpu.engine.llm_engine import LLMEngine

PRED = ".artifacts/trace_pred/usage_config.json"


class FakeExecutor:
    """score_prompts_begin returns a fetch closure; scores = -len(prompt)
    (shorter prompt => higher score, SJF-flavored)."""

    def __init__(self):
        self.begin_calls = 0
        self.fetch_calls = 0

    def score_prompts_begin(self, prompts):
        self.begin_calls += 1

        def fetch():
            self.fetch_calls += 1
            return [-float(len(p)) for p in prompts]

        return fetch

    def score_prompts(self, prompts):
        return self.score_prompts_begin(prompts)()


class FakeGroup:

    def __init__(self, rid, n):
        self.request_id = rid
        self.prompt_token_ids = [1] * n
        self.aux_model_score = None

    def need_aux_model_score(self):
        return self.aux_model_score is None

    def set_aux_model_score(self, s):
        self.aux_model_score = s


def test_async_scorer_defers_one_pass():
    ex = FakeExecutor()
    scorer = AuxScorer(ex, None, async_mode=True)
    groups = [FakeGroup("a", 5), FakeGroup("b", 3)]

    # Pass 1: dispatch only — nothing assigned, nothing fetched.
    scorer.obtain_aux_scores(groups)
    assert ex.begin_calls == 1 and ex.fetch_calls == 0
    assert all(g.aux_model_score is None for g in groups)

    # Pass 2 (next schedule): poll folds the scores in; the repeat
    # request set does NOT re-dispatch (score-once contract).
    scorer.obtain_aux_scores(groups)
    assert ex.fetch_calls == 1 and ex.begin_calls == 1
    assert groups[0].aux_model_score == -5.0
    assert groups[1].aux_model_score == -3.0
    assert scorer.total_scored == 2

    # A new arrival dispatches without touching the scored ones.
    g3 = FakeGroup("c", 7)
    scorer.obtain_aux_scores(groups + [g3])
    assert ex.begin_calls == 2
    scorer.poll()
    assert g3.aux_model_score == -7.0


def test_prefetch_scores_land_without_blocking_dispatch():
    """Score-at-arrival: prefetch dispatches once; the scheduling pass
    folds the landed scores without a new dispatch (the r5 fix for the
    ~30-90 ms/step blocking scorer round trip)."""
    ex = FakeExecutor()
    scorer = AuxScorer(ex, None)  # sync default mode
    groups = [FakeGroup("a", 5), FakeGroup("b", 3)]
    scorer.prefetch(groups)
    assert ex.begin_calls == 1 and ex.fetch_calls == 0
    assert scorer.total_prefetched == 2
    # Re-prefetch of pending requests is a no-op (score-once).
    scorer.prefetch(groups)
    assert ex.begin_calls == 1

    # The pass consumes the prefetched scores; no sync dispatch.
    out = scorer.obtain_aux_scores(groups)
    assert ex.begin_calls == 1 and ex.fetch_calls == 1
    assert groups[0].aux_model_score == -5.0
    assert groups[1].aux_model_score == -3.0
    assert out == [-5.0, -3.0]
    assert scorer.total_scored == 2

    # Mixed pass: one prefetched, one brand-new -> the new one gets a
    # sync dispatch, the prefetched one is never re-scored.
    g3, g4 = FakeGroup("c", 7), FakeGroup("d", 2)
    scorer.prefetch([g3])
    out = scorer.obtain_aux_scores([g3, g4])
    assert g3.aux_model_score == -7.0 and g4.aux_model_score == -2.0
    assert scorer.total_scored == 4


def test_prefetch_engine_parity():
    """Engine end-to-end: prefetch_aux_scores at arrival, then step —
    tokens and score-once bookkeeping identical to the plain path."""
    rng = np.random.RandomState(1)
    ps = [list(map(int, rng.randint(5, 500, size=10))) for _ in range(6)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    def run(prefetch):
        eng = make_engine(False)
        for i, p in enumerate(ps):
            eng.add_request(str(i), None, sp, prompt_token_ids=p)
            if prefetch:
                eng.prefetch_aux_scores()
        done = {}
        for _ in range(300):
            if not eng.has_unfinished_requests():
                break
            for out in eng.step():
                if out.finished:
                    done[out.request_id] = out.outputs[0].token_ids
        assert eng.scheduler.aux_model.total_scored == len(ps)
        return done, eng.scheduler.aux_model

    plain, _ = run(False)
    pre, scorer = run(True)
    assert scorer.total_prefetched == len(ps)
    assert set(plain) == set(pre)
    for rid in plain:
        assert plain[rid] == pre[rid], rid


def test_unscored_requests_rank_last():
    from vllm_ltr_tpu.core.policy import _score_asc, _score_desc
    scored, pending = FakeGroup("s", 4), FakeGroup("p", 4)
    scored.aux_model_score = 2.0
    assert _score_desc(scored) < _score_desc(pending)
    assert _score_asc(scored) < _score_asc(pending)


def make_engine(async_scoring: bool) -> LLMEngine:
    args = EngineArgs(model="test-llama-tiny", skip_tokenizer_init=True,
                      max_model_len=128, max_num_seqs=4,
                      num_gpu_blocks_override=64, swap_space=0.01,
                      schedule_type="opt",
                      prefill_predictor_model_config=PRED,
                      async_aux_scoring=async_scoring,
                      disable_log_stats=True)
    return LLMEngine.from_engine_args(args)


def test_async_scoring_engine_parity():
    rng = np.random.RandomState(0)
    ps = [list(map(int, rng.randint(5, 500, size=10))) for _ in range(6)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    def run(async_scoring):
        eng = make_engine(async_scoring)
        assert eng.scheduler.aux_model.async_mode == async_scoring
        for i, p in enumerate(ps):
            eng.add_request(str(i), None, sp, prompt_token_ids=p)
        done = {}
        for _ in range(300):
            if not eng.has_unfinished_requests():
                break
            for out in eng.step():
                if out.finished:
                    done[out.request_id] = out.outputs[0].token_ids
        assert not eng.has_unfinished_requests()
        # Every request scored exactly once.
        assert eng.scheduler.aux_model.total_scored == len(ps)
        return done

    sync_out = run(False)
    async_out = run(True)
    assert set(sync_out) == set(async_out)
    for rid in sync_out:  # greedy tokens identical regardless of order
        assert sync_out[rid] == async_out[rid], rid
