"""Scheduling priority policies.

Two layers, mirroring the reference:

1. The stock queue-sort :class:`Policy`/:class:`PolicyFactory` used by the
   default scheduling path for ordering the running/swapped queues
   (reference ``vllm/core/policy.py``).
2. The LTR fork's *global ordering policies* used by the generalized
   scheduling path: each takes the full request population
   (waiting + running + swapped) and returns one priority-ordered list
   (reference ``vllm/core/scheduler.py:857-1099``). Implemented here as
   pure functions over a :class:`PolicyContext`, replacing the reference's
   method-pair-per-policy pattern with a registry.
"""
from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Callable, Deque, Dict, List, Optional, Protocol, Tuple

from vllm_ltr_tpu.sequence import SequenceGroup

# ---------------------------------------------------------------------------
# Stock queue-sort policies
# ---------------------------------------------------------------------------


class Policy:

    def get_priority(self, now: float, seq_group: SequenceGroup) -> float:
        raise NotImplementedError

    def sort_by_priority(
        self,
        now: float,
        seq_groups: Deque[SequenceGroup],
    ) -> Deque[SequenceGroup]:
        return deque(
            sorted(seq_groups,
                   key=lambda seq_group: self.get_priority(now, seq_group),
                   reverse=True))


class FCFS(Policy):

    def get_priority(self, now: float, seq_group: SequenceGroup) -> float:
        return now - seq_group.metrics.arrival_time


class PolicyFactory:
    _POLICY_REGISTRY: Dict[str, type] = {"fcfs": FCFS}

    @classmethod
    def get_policy(cls, policy_name: str, **kwargs) -> Policy:
        return cls._POLICY_REGISTRY[policy_name](**kwargs)


# ---------------------------------------------------------------------------
# Global ordering policies (generalized path)
# ---------------------------------------------------------------------------


class AuxScorer(Protocol):
    """Anything that can score prompts with the LTR predictor. On TPU this is
    a pjit-compiled classification forward on the serving mesh (the entire
    AUXLLM Ray machinery of the reference collapses into this one call)."""

    def obtain_aux_scores(self,
                          seq_groups: List[SequenceGroup]) -> List[float]:
        ...


@dataclass
class PolicyContext:
    """State the global ordering policies may consult."""
    waiting: List[SequenceGroup]
    running: List[SequenceGroup]
    swapped: List[SequenceGroup]
    aux_scorer: Optional[AuxScorer] = None
    # starvation config (None = disabled)
    starvation_threshold: int = -1
    starvation_period: int = 0
    # xpt: (score_keys_desc, expected_length_values)
    distribution: Optional[Tuple[List[float], List[float]]] = None
    # constraint policy accumulates observed ranking scores
    records: List[float] = field(default_factory=list)
    # xpt: request_id -> expected length (score mapped through the saved
    # distribution once per request; owned by the scheduler so requests
    # carry no hidden attributes across re-scoring)
    expected_lengths: Dict[str, float] = field(default_factory=dict)
    # Lazy scoring (--lazy-aux-scoring): False when the scheduler proved
    # this pass admits the whole population regardless of order, so a
    # predictor round trip cannot change the outcome and is skipped;
    # once contention appears every unscored request (any lane) is
    # scored in one batched dispatch.
    scores_required: bool = True

    def all_requests(self) -> List[SequenceGroup]:
        return list(self.waiting) + list(self.running) + list(self.swapped)

    def ensure_scores(self) -> None:
        """Score any new (unscored) waiting requests with the aux predictor.

        Behavioral contract: every request is scored exactly once, on its
        (truncated) prompt, before it is first considered for scheduling
        (reference scheduler.py:969-979).
        """
        if not self.scores_required:
            return
        # Under lazy scoring a request can reach running/swapped unscored
        # (admitted during a no-contention window); score every lane so
        # eviction ranking stays sound once contention appears.
        unscored = [
            r for r in self.all_requests() if r.need_aux_model_score()
        ]
        if unscored:
            if self.aux_scorer is None:
                raise RuntimeError(
                    "This scheduling policy requires an aux predictor "
                    "(pass prefill_predictor_model_config), but none is "
                    "attached to the scheduler.")
            self.aux_scorer.obtain_aux_scores(unscored)


OrderingFn = Callable[[PolicyContext], List[SequenceGroup]]

_GLOBAL_POLICIES: Dict[str, OrderingFn] = {}


def register_policy(name: str):

    def deco(fn: OrderingFn) -> OrderingFn:
        _GLOBAL_POLICIES[name] = fn
        return fn

    return deco


def get_ordering_fn(name: str) -> OrderingFn:
    return _GLOBAL_POLICIES[name]


def _first_seq_output_len(req: SequenceGroup) -> int:
    return req.get_seqs()[0].data.get_output_len()


# Score accessors tolerant of async scoring: a request whose score is
# still in flight (--async-aux-scoring) ranks LAST for the one pass its
# dispatch takes, never first — so a burst of unscored arrivals cannot
# preempt scored work on a placeholder.
def _score_desc(req: SequenceGroup) -> float:
    """Sort key for 'higher score first' policies (opt/tpt/ltr/...)."""
    s = req.aux_model_score
    return -s if s is not None else float("inf")


def _score_asc(req: SequenceGroup) -> float:
    """Sort key for 'lower score first' policies (ropt/rtpt)."""
    s = req.aux_model_score
    return s if s is not None else float("inf")


@register_policy("fifo")
def _fifo(ctx: PolicyContext) -> List[SequenceGroup]:
    return sorted(ctx.all_requests(),
                  key=lambda req: req.metrics.arrival_time)


@register_policy("srtf")
def _srtf(ctx: PolicyContext) -> List[SequenceGroup]:
    """Shortest remaining (oracle-estimated) time first."""
    return sorted(
        ctx.all_requests(),
        key=lambda req: req.sampling_params.est_tokens - _first_seq_output_len(
            req))


def _po_order(ctx: PolicyContext, reverse: bool) -> List[SequenceGroup]:
    """Per-output-token oracle: requests with <15 generated tokens stay FCFS
    alongside waiting requests; the rest sort by oracle est_tokens."""
    young = []
    others = []
    for req in list(ctx.running) + list(ctx.swapped):
        if _first_seq_output_len(req) < 15:
            young.append(req)
        else:
            others.append(req)
    sign = -1 if reverse else 1
    return (sorted(list(ctx.waiting) + young,
                   key=lambda req: req.metrics.arrival_time) +
            sorted(others, key=lambda req: sign * req.sampling_params.est_tokens))


@register_policy("PO")
def _po(ctx: PolicyContext) -> List[SequenceGroup]:
    return _po_order(ctx, reverse=False)


@register_policy("rPO")
def _rpo(ctx: PolicyContext) -> List[SequenceGroup]:
    return _po_order(ctx, reverse=True)


@register_policy("FAKEPO")
def _fakepo(ctx: PolicyContext) -> List[SequenceGroup]:
    return sorted(ctx.all_requests(),
                  key=lambda req: req.sampling_params.est_tokens)


@register_policy("tpt")
def _tpt(ctx: PolicyContext) -> List[SequenceGroup]:
    """Classification-predictor score, descending (ties by request id)."""
    ctx.ensure_scores()
    return sorted(ctx.all_requests(),
                  key=lambda req: (_score_desc(req), req.request_id))


@register_policy("rtpt")
def _rtpt(ctx: PolicyContext) -> List[SequenceGroup]:
    ctx.ensure_scores()
    return sorted(ctx.all_requests(),
                  key=lambda req: (_score_asc(req), req.request_id))


@register_policy("opt")
def _opt(ctx: PolicyContext) -> List[SequenceGroup]:
    """THE LTR policy: rank by learned score (higher = shorter predicted
    output = run first), with optional starvation promotion."""
    ctx.ensure_scores()
    reqs = ctx.all_requests()
    if ctx.starvation_threshold != -1:
        for r in reqs:
            if r.idle >= ctx.starvation_threshold:
                r.pri = -1
                r.idle = 0
                r.runs = ctx.starvation_period
            elif r.pri == -1 and r.runs <= 0:
                r.pri = 0
        return sorted(reqs, key=lambda req: (req.pri, _score_desc(req)))
    return sorted(reqs, key=_score_desc)


@register_policy("ropt")
def _ropt(ctx: PolicyContext) -> List[SequenceGroup]:
    ctx.ensure_scores()
    return sorted(ctx.all_requests(), key=_score_asc)


@register_policy("xpt")
def _xpt(ctx: PolicyContext) -> List[SequenceGroup]:
    """Map predictor score to an expected length via a saved (keys, values)
    distribution, then SRTF on expected remaining length."""
    ctx.ensure_scores()
    assert ctx.distribution is not None, "xpt policy needs a distribution"
    key, value = ctx.distribution
    reqs = ctx.all_requests()
    exp = ctx.expected_lengths
    for req in reqs:
        if req.request_id not in exp:
            if req.aux_model_score is None:
                continue  # async scoring in flight: rank last this pass
            score = round(-req.aux_model_score, 2)
            exp[req.request_id] = -10000
            for kid in range(len(key) - 1, -1, -1):
                if score >= key[kid]:
                    exp[req.request_id] = value[kid]
                    break
    return sorted(
        reqs,
        key=lambda req: (exp.get(req.request_id, float("inf")) -
                         _first_seq_output_len(req)))


@register_policy("constraint")
def _constraint(ctx: PolicyContext) -> List[SequenceGroup]:
    unscored = [r for r in ctx.waiting if r.need_aux_model_score()]
    if unscored:
        assert ctx.aux_scorer is not None
        scores = ctx.aux_scorer.obtain_aux_scores(unscored)
        ctx.records.extend(-s for s in scores)
        ctx.records.sort()
    return sorted(ctx.all_requests(), key=_score_desc)


@register_policy("ltr")
def _ltr(ctx: PolicyContext) -> List[SequenceGroup]:
    ctx.ensure_scores()
    return sorted(ctx.all_requests(), key=_score_desc)
