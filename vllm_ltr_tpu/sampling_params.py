"""Per-request generation controls.

Covers the OpenAI-style sampling surface plus beam search plus the LTR
fork's ``est_tokens`` oracle hint (estimated output length consumed by the
sjf/srtf/PO scheduler policies; reference vllm/sampling_params.py:124,159).

Design: a plain dataclass whose invariants are expressed as a declarative
rule table (`_RANGE_RULES`) applied in ``__post_init__``, with the handful
of cross-field constraints in small predicate helpers.  Mode-dependent
normalisation (greedy / beam) happens once, up front.
"""
from __future__ import annotations

import copy
import enum
from dataclasses import dataclass, fields
from typing import Any, Callable, Union

EPS = 1e-5

LogitsProcessor = Callable[[list[int], Any], Any]
"""(previously generated token ids, logits row) -> adjusted logits row."""


class SamplingType(enum.IntEnum):
    GREEDY, RANDOM, RANDOM_SEED, BEAM = range(4)


# field name -> (low, high, low_inclusive, high_inclusive); None = unbounded.
_RANGE_RULES: dict[str, tuple[float | None, float | None, bool, bool]] = {
    "presence_penalty": (-2.0, 2.0, True, True),
    "frequency_penalty": (-2.0, 2.0, True, True),
    "repetition_penalty": (0.0, 2.0, False, True),
    "temperature": (0.0, None, True, True),
    "top_p": (0.0, 1.0, False, True),
    "min_p": (0.0, 1.0, True, True),
    "n": (1, None, True, True),
    "min_tokens": (0, None, True, True),
}


def _check_range(name: str, value: float) -> None:
    lo, hi, lo_inc, hi_inc = _RANGE_RULES[name]
    ok = True
    if lo is not None:
        ok = ok and (value >= lo if lo_inc else value > lo)
    if hi is not None:
        ok = ok and (value <= hi if hi_inc else value < hi)
    if not ok:
        lo_b = "[" if lo_inc else "("
        hi_b = "]" if hi_inc else ")"
        raise ValueError(f"{name} must lie in "
                         f"{lo_b}{lo}, {hi}{hi_b}, got {value}.")


@dataclass(eq=False)  # identity semantics: params objects are per-request
class SamplingParams:
    """Generation controls for one request.

    ``est_tokens`` is the LTR fork's oracle output-length estimate (default
    16, matching the reference default).
    """
    n: int = 1
    best_of: int | None = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    seed: int | None = None
    use_beam_search: bool = False; length_penalty: float = 1.0  # noqa: E702
    early_stopping: Union[bool, str] = False
    stop: Union[None, str, list[str]] = None
    stop_token_ids: list[int] | None = None
    include_stop_str_in_output: bool = False
    ignore_eos: bool = False
    max_tokens: int | None = 16
    min_tokens: int = 0
    logprobs: int | None = None
    prompt_logprobs: int | None = None
    detokenize: bool = True
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    logits_processors: list[LogitsProcessor] | None = None
    # Guided decoding (at most one): constrain generation to one of the
    # listed strings, a regular expression, or a JSON schema (dict or
    # JSON string).  Compiled to a token-level FSM by the engine; see
    # vllm_ltr_tpu/guided/.
    guided_choice: list[str] | None = None
    guided_regex: str | None = None
    guided_json: Union[dict, str, None] = None
    # Lark-style context-free grammar (guided/cfg.py pushdown engine).
    guided_grammar: str | None = None
    # Per-request backend override (reference protocol.py): None uses
    # the engine's DecodingConfig default.  "outlines"/"native" compile
    # guided_json to strict compact JSON; "lm-format-enforcer" to the
    # whitespace-tolerant form (guided/json_schema.py).
    guided_decoding_backend: str | None = None
    est_tokens: int = 16

    def __post_init__(self) -> None:
        if self.best_of is None:
            self.best_of = self.n
        # Normalise `stop` to a list of strings.
        stop = self.stop
        self.stop = ([] if stop is None
                     else [stop] if isinstance(stop, str) else list(stop))
        self.stop_token_ids = list(self.stop_token_ids or [])

        for name in _RANGE_RULES:
            _check_range(name, getattr(self, name))
        self._check_counts()

        if self.use_beam_search:
            self._check_beam_mode()
            return
        if self.early_stopping is not False:
            raise ValueError("early_stopping only applies to beam search.")
        if abs(self.length_penalty - 1.0) > EPS:
            raise ValueError("length_penalty only applies to beam search.")
        if self.temperature < EPS:
            # Greedy mode: neutralise the stochastic knobs.
            self.top_p, self.top_k, self.min_p = 1.0, -1, 0.0
            if self.best_of > 1:
                raise ValueError("greedy sampling (temperature 0) requires "
                                 f"best_of=1, got {self.best_of}.")

    def _check_counts(self) -> None:
        if self.best_of < self.n:
            raise ValueError(f"best_of ({self.best_of}) must be >= "
                             f"n ({self.n}).")
        if self.top_k == 0 or self.top_k < -1:
            raise ValueError(f"top_k must be -1 (off) or positive, "
                             f"got {self.top_k}.")
        if self.max_tokens is not None:
            if self.max_tokens < 1:
                raise ValueError(f"max_tokens must be >= 1, "
                                 f"got {self.max_tokens}.")
            if self.min_tokens > self.max_tokens:
                raise ValueError(f"min_tokens ({self.min_tokens}) exceeds "
                                 f"max_tokens ({self.max_tokens}).")
        for name in ("logprobs", "prompt_logprobs"):
            value = getattr(self, name)
            if value is not None and value < 0:
                raise ValueError(f"{name} must be >= 0, got {value}.")
        guided = [
            n for n in ("guided_choice", "guided_regex", "guided_json",
                        "guided_grammar")
            if getattr(self, n) is not None
        ]
        if len(guided) > 1:
            raise ValueError("at most one of guided_choice / guided_regex"
                             f" / guided_json may be set, got {guided}.")
        if guided and self.use_beam_search:
            raise ValueError("guided decoding is incompatible with beam "
                             "search.")

    def _check_beam_mode(self) -> None:
        problems = []
        for broken, msg in ((self.best_of == 1, "best_of must be > 1"),
                            (self.temperature > EPS, "temperature must be 0"),
                            (self.top_p < 1.0 - EPS, "top_p must be 1"),
                            (self.top_k != -1, "top_k must be -1")):
            if broken:
                problems.append(msg)
        if self.early_stopping not in (True, False, "never"):
            problems.append("early_stopping must be True, False or 'never'")
        if problems:
            raise ValueError("beam search: " + "; ".join(problems))

    @property
    def sampling_type(self) -> SamplingType:
        if self.use_beam_search: return SamplingType.BEAM  # noqa: E701
        if self.temperature < EPS: return SamplingType.GREEDY  # noqa: E701
        return (SamplingType.RANDOM_SEED
                if self.seed is not None else SamplingType.RANDOM)

    def update_from_generation_config(
            self, generation_config: dict[str, Any]) -> None:
        """Fold the model's generation_config EOS ids into stop_token_ids."""
        eos_ids = generation_config.get("eos_token_id")
        if eos_ids is not None:
            ids = [eos_ids] if isinstance(eos_ids, int) else eos_ids
            self.stop_token_ids = list(set(self.stop_token_ids) | set(ids))

    def clone(self) -> "SamplingParams":
        """Deep copy; LogitsProcessor callables are shared, not copied."""
        shared = None
        if self.logits_processors:
            shared = {id(p): p for p in self.logits_processors}
        return copy.deepcopy(self, memo=shared)

    def __repr__(self) -> str:
        shown = (f"{f.name}={getattr(self, f.name)!r}" for f in fields(self)
                 if f.name != "logits_processors")
        return "SamplingParams(" + ", ".join(shown) + ")"
