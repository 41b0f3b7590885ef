"""Request / sequence data model.

Behavioral counterpart of reference vllm/sequence.py (v0.4.1 plus the LTR
fork's score/starvation fields, sequence.py:426-465,604-696), redesigned:

* One flat token array per sequence (prompt followed by generated tokens)
  instead of the reference's logical-token-block mirror — block counts are
  pure arithmetic (``ceil(len / block_size)``), so no per-block objects
  exist anywhere in the data model.
* ``Sequence`` is its own "data" view: the computed-token ledger used for
  chunked prefill lives directly on the sequence (``seq.data is seq``).
* Finished-ness is encoded in the status enum's numeric range.
"""
from __future__ import annotations

import copy, enum
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Union

from vllm_ltr_tpu.sampling_params import SamplingParams


@dataclass
class Logprob:
    """Log-probability of one token, with optional rank / decoded text."""
    logprob: float  # natural log of the token's probability
    rank: int | None = None; decoded_token: str | None = None  # noqa: E702


# Per-position token -> Logprob maps.
TokenLogprobs = dict[int, Logprob]
SampleLogprobs = list[TokenLogprobs]
PromptLogprobs = list[TokenLogprobs | None]


class SequenceStatus(enum.IntEnum):
    """Lifecycle of a sequence. Values >= FINISHED_STOPPED are terminal."""
    WAITING = 0
    RUNNING = 1
    SWAPPED = 2
    FINISHED_STOPPED = 16
    FINISHED_LENGTH_CAPPED = 17
    FINISHED_ABORTED = 18
    FINISHED_IGNORED = 19

    @classmethod
    def is_finished(cls, status: "SequenceStatus") -> bool:
        return status >= cls.FINISHED_STOPPED

    @classmethod
    def get_finished_reason(cls, status: "SequenceStatus") -> str | None:
        # FINISHED_IGNORED means the prompt exceeded the model window, which
        # clients see as a length stop.
        return {
            cls.FINISHED_STOPPED: "stop",
            cls.FINISHED_LENGTH_CAPPED: "length",
            cls.FINISHED_IGNORED: "length",
            cls.FINISHED_ABORTED: "abort",
        }.get(status)


SequenceStage = enum.Enum("SequenceStage", ["PREFILL", "DECODE"])


@dataclass
class RequestMetrics:
    """Wall-clock milestones of one request."""
    arrival_time: float; last_token_time: float  # noqa: E702
    first_scheduled_time: float | None = None
    first_token_time: float | None = None
    time_in_queue: float | None = None
    finished_time: float | None = None


class Sequence:
    """One generation stream: a flat token array plus decode state.

    The prompt occupies ``self._ids[:self._prompt_len]``; everything after
    it was generated.  ``self._computed`` counts tokens whose KV is already
    in the cache (chunked-prefill ledger); ``self._decoding`` latches once
    the whole current array has been computed.
    """

    def __init__(self, seq_id: int, prompt: str | None,
                 prompt_token_ids: list[int], block_size: int,
                 eos_token_id: int | None = None,
                 lora_request: Any | None = None) -> None:
        self.seq_id, self.prompt, self.block_size = seq_id, prompt, block_size
        self.eos_token_id, self.lora_request = eos_token_id, lora_request

        self._ids: list[int] = list(prompt_token_ids)
        self._prompt_len = len(prompt_token_ids)
        self._computed = 0
        self._decoding = False

        self.cumulative_logprob, self.output_text = 0.0, ""
        self.output_logprobs = []  # per-step dict[token -> Logprob]
        self.status = SequenceStatus.WAITING  # -> RUNNING/SWAPPED/FINISHED_*
        self.stop_reason: int | str | None = None

        # Incremental detokenizer cursor state.
        self.prefix_offset = self.read_offset = 0
        self.tokens: list[str] | None = None

    # --- the "data" protocol: this object is its own data view ------------

    # Pure delegating accessors, kept for reference-API compatibility.
    # fmt: off
    @property
    def data(self) -> "Sequence": return self
    def get_len(self) -> int: return len(self._ids)
    def get_prompt_len(self) -> int: return self._prompt_len
    def get_output_len(self) -> int: return len(self._ids) - self._prompt_len
    def get_token_ids(self) -> list[int]: return self._ids
    def get_prompt_token_ids(self) -> list[int]: return self._ids[:self._prompt_len]
    def get_output_token_ids(self) -> list[int]: return self._ids[self._prompt_len:]
    def get_last_token_id(self) -> int: return self._ids[-1]
    def get_cumulative_logprob(self) -> float: return self.cumulative_logprob
    @property
    def prompt_token_ids(self) -> list[int]: return self.get_prompt_token_ids()
    @property
    def output_token_ids(self) -> list[int]: return self.get_output_token_ids()
    # fmt: on

    # --- chunked-prefill ledger --------------------------------------------

    def get_num_computed_tokens(self) -> int: return self._computed  # noqa: E704

    def get_num_uncomputed_tokens(self) -> int:
        # During decode the freshly sampled token is itself uncomputed,
        # so: total minus computed (not prompt minus computed).
        return len(self._ids) - self._computed  # >= 0 by construction

    def update_num_computed_tokens(self, n_new: int) -> None:
        self._computed += n_new
        if self._computed > len(self._ids):
            raise ValueError(f"computed {self._computed} > "
                             f"length {len(self._ids)}")
        if self._computed == len(self._ids):
            self._decoding = True

    def reset_state_for_recompute(self) -> None:
        """After recompute-preemption the whole array is a fresh prefill."""
        self._computed, self._decoding = 0, False

    @property
    def stage(self) -> SequenceStage:  # chunked-prefill phase probe
        return (SequenceStage.DECODE
                if self._decoding else SequenceStage.PREFILL)

    def is_prefill(self) -> bool: return not self._decoding  # noqa: E704

    def get_num_new_tokens(self) -> int:  # per-step work for this stream
        """Tokens the next model step must compute for this sequence."""
        return 1 if self._decoding else self.get_num_uncomputed_tokens()

    # --- growth / lifecycle -------------------------------------------------

    def append_token_id(self, token_id: int,
                        logprobs: dict[int, Logprob]) -> None:
        assert token_id in logprobs, "sampled token missing from logprobs"
        self._ids.append(token_id)
        self.output_logprobs.append(logprobs)  # full top-k map for the step
        self.cumulative_logprob += logprobs[token_id].logprob

    # fmt: off
    def is_finished(self) -> bool: return SequenceStatus.is_finished(self.status)
    # fmt: on

    def fork(self, new_seq_id: int) -> "Sequence":  # deep copy, new id
        twin = copy.deepcopy(self)
        twin.seq_id = new_seq_id
        return twin

    # --- paged-cache geometry (pure arithmetic — no block objects) ----------

    def num_blocks(self) -> int:  # ceil-div, no block objects anywhere
        return -(len(self._ids) // -self.block_size)

    def content_key(self, n_blocks: int) -> int:
        """Content hash of the first ``n_blocks`` blocks of tokens (plus the
        LoRA identity), used for prefix-cache lookup."""
        span = n_blocks * self.block_size
        return hash((self.lora_int_id, tuple(self._ids[:span])))

    # Reference-named compatibility shims for the content key.
    def hash_of_block(self, block_idx: int) -> int:
        return self.content_key(block_idx + 1)

    def num_hashed_tokens_of_block(self, block_idx: int) -> int:
        return (block_idx + 1) * self.block_size

    @property
    def lora_int_id(self) -> int:  # 0 = no adapter
        return self.lora_request.lora_int_id if self.lora_request else 0

    def get_beam_search_score(self, length_penalty: float = 1.0,
                              seq_len: int | None = None,
                              eos_token_id: int | None = None) -> float:
        if seq_len is None:  # derive from the stream
            # A trailing EOS does not count toward the normalized length.
            ends_with_eos = (eos_token_id is not None
                             and self._ids[-1] == eos_token_id)
            seq_len = len(self._ids) - int(ends_with_eos)
        return self.cumulative_logprob / (seq_len**length_penalty)

    def __repr__(self) -> str:  # debug view
        return (f"Sequence#{self.seq_id}({self.status.name}, "
                f"len={len(self._ids)}, computed={self._computed})")


# The executor's metadata consumes sequences through the data-view protocol;
# the view IS the sequence here.
SequenceData = Sequence


@dataclass
class RunningInfo:
    """Swap accounting surfaced to RequestOutput (ref sequence.py:432)."""
    swap_out: int = 0
    swap_blocks: int = 0


@dataclass
class SequenceGroupState:
    """Mutable per-group execution state (e.g. seeded-sampling step)."""
    generator_step: int = 0


class SequenceGroup:
    """All streams spawned from one prompt, plus LTR scheduling state."""

    def __init__(self, request_id: str, seqs: list[Sequence],
                 sampling_params: SamplingParams, arrival_time: float,
                 lora_request: Any | None = None,
                 multi_modal_data: Any | None = None) -> None:
        self.request_id, self.sampling_params = request_id, sampling_params
        self._seqs: list[Sequence] = list(seqs)
        self._by_id: dict[int, Sequence] = {s.seq_id: s for s in seqs}
        self.metrics = RequestMetrics(arrival_time=arrival_time,
                                      last_token_time=arrival_time)
        self.lora_request, self.multi_modal_data = (lora_request,
                                                    multi_modal_data)
        self.prompt_logprobs: PromptLogprobs | None = None
        self.state = SequenceGroupState()  # seeded-sampling step counter
        self.guide: Any | None = None  # TokenGuide (guided decoding)

        # LTR scheduling state (reference sequence.py:426-433):
        self.pred_score: float | None = None      # embedded predictor
        self.aux_model_score: float | None = None  # AUX ranking score
        self.pscore: float = 0.0                     # experimental policies
        self.priority: int = 0                       # MLFQ level
        # Starvation control: steps idle / promoted-steps left / class.
        self.idle: int = 0
        self.runs: int = 0
        self.pri: int = 0
        # MLFQ process-time ledger.
        self.lst_process_time: float = 0.0
        self.process_time: float = 0.0
        self.running_info = RunningInfo()

    # --- LTR helpers --------------------------------------------------------

    # fmt: off
    def need_aux_model_score(self) -> bool: return self.aux_model_score is None
    def set_aux_model_score(self, score: float) -> None:
        self.aux_model_score = score
    # fmt: on

    def count_swap_out(self) -> None:  # benchmark swap accounting
        self.running_info.swap_out += 1
        self.running_info.swap_blocks += sum(s.num_blocks()
                                             for s in self._seqs)

    # fmt: off
    def get_priority(self) -> int: return self.priority
    def set_priority(self, priority: int) -> None: self.priority = priority
    # fmt: on

    # --- prompt accessors ---------------------------------------------------

    # fmt: off
    @property
    def prompt(self) -> str | None: return self._seqs[0].prompt
    @property
    def prompt_token_ids(self) -> list[int]: return self._seqs[0].get_prompt_token_ids()
    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0
    @property
    def seqs_dict(self) -> dict[int, Sequence]: return self._by_id
    # fmt: on

    # --- timing -------------------------------------------------------------

    def get_last_latency(self, now: float) -> float:  # and advance the clock
        if self.is_prefill():
            raise ValueError("no inter-token latency during prefill")
        dt, self.metrics.last_token_time = (
            now - self.metrics.last_token_time, now)
        return dt

    def maybe_set_first_token_time(self, t: float) -> None:
        if (self.metrics.first_token_time is None
                and self._seqs[0].get_output_len() == 1):
            self.metrics.first_token_time = t

    def maybe_set_first_scheduled_time(self, t: float) -> None:
        if self.metrics.first_scheduled_time is None:  # first admission only
            self.metrics.first_scheduled_time = t
            self.metrics.time_in_queue = t - self.metrics.arrival_time

    def set_finished_time(self, t: float | None) -> None:
        self.metrics.finished_time = t

    # --- membership ---------------------------------------------------------

    def get_seqs(self,
                 status: SequenceStatus | None = None) -> list[Sequence]:
        if status is None:
            return list(self._seqs)
        return [s for s in self._seqs if s.status == status]

    # fmt: off
    def get_unfinished_seqs(self): return [s for s in self._seqs if not s.is_finished()]
    def get_finished_seqs(self): return [s for s in self._seqs if s.is_finished()]
    def num_seqs(self, status: SequenceStatus | None = None) -> int:
        return len(self._seqs) if status is None else len(self.get_seqs(status))
    def num_unfinished_seqs(self) -> int: return len(self.get_unfinished_seqs())
    def num_finished_seqs(self) -> int: return len(self.get_finished_seqs())
    # fmt: on

    def find(self, seq_id: int) -> Sequence:  # raises ValueError if absent
        if seq_id not in self._by_id:
            raise ValueError(
                f"Sequence {seq_id} not in group {self.request_id}.")
        return self._by_id[seq_id]

    def add(self, seq: Sequence) -> None:  # register a forked stream
        if seq.seq_id in self._by_id:
            raise ValueError(f"Sequence {seq.seq_id} already in group.")
        self._by_id[seq.seq_id] = seq
        self._seqs.append(seq)

    def remove(self, seq_id: int) -> None:  # beam-search drop
        seq = self.find(seq_id)
        del self._by_id[seq_id]
        self._seqs.remove(seq)

    def get_max_num_running_seqs(self) -> int:
        """Peak number of concurrently live streams over the request's
        remaining lifetime (best_of fan-out happens at prefill end)."""
        p = self.sampling_params
        return (p.best_of if p.use_beam_search or p.best_of > len(self._seqs)
                else self.num_unfinished_seqs())

    # --- aggregate state ----------------------------------------------------

    def update_num_computed_tokens(self, n_new: int) -> None:
        for s in self._seqs:
            if not s.is_finished():
                s.update_num_computed_tokens(n_new)

    def get_num_uncomputed_tokens(self) -> int:  # chunked-prefill remainder
        return sum(s.get_num_uncomputed_tokens()
                   for s in self.get_unfinished_seqs())

    # fmt: off
    def is_finished(self) -> bool: return all(s.is_finished() for s in self._seqs)
    # All streams advance through prefill together; probe the first.
    def is_prefill(self) -> bool: return self._seqs[0].is_prefill()
    # fmt: on

    def __repr__(self) -> str:  # debug view
        return (f"SequenceGroup({self.request_id}, "
                f"seqs={len(self._seqs)}, "
                f"aux_score={self.aux_model_score})")


@dataclass(eq=False)
class SequenceGroupMetadata:
    """Per-step hand-off from scheduler to executor (ref sequence.py:570-632
    including the LTR ``need_score`` flag)."""
    request_id: str; is_prompt: bool  # noqa: E702
    seq_data: dict[int, SequenceData]
    sampling_params: SamplingParams
    block_tables: dict[int, list[int]]
    token_chunk_size: int | None = None
    lora_request: Any | None = None
    computed_block_nums: list[int] | None = None
    state: SequenceGroupState | None = None
    multi_modal_data: Any | None = None
    need_score: bool = False
    # Compiled TokenGuide when the request uses guided decoding
    # (vllm_ltr_tpu/guided/); the executor turns it into a per-row
    # allowed-token bitmask each step.
    guide: Any | None = None

    def __post_init__(self) -> None:
        self.state = self.state or SequenceGroupState()
        if self.token_chunk_size is None:
            first = next(iter(self.seq_data.values()))
            self.token_chunk_size = first.get_len() if self.is_prompt else 1

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0


@dataclass
class SequenceOutput:
    """One sampled token for one sequence."""
    parent_seq_id: int; output_token: int  # noqa: E702
    logprobs: dict[int, Logprob]


@dataclass(eq=False)
class SequenceGroupOutput:
    """One step's model output for one group, carrying the LTR scores."""
    samples: list[SequenceOutput]
    prompt_logprobs: PromptLogprobs | None
    pred_score: float | None = None
    aux_model_score: float | None = None

    def __eq__(self, other: object) -> bool:  # scores excluded on purpose
        if not isinstance(other, SequenceGroupOutput):
            return NotImplemented
        return (self.samples, self.prompt_logprobs) == (
            other.samples, other.prompt_logprobs)


@dataclass
class SamplerOutput:
    """Full-batch sampler result: one entry per scheduled group."""
    outputs: list[SequenceGroupOutput]  # scheduler order

    # fmt: off
    def __getitem__(self, idx: int): return self.outputs[idx]
    def __setitem__(self, idx: int, value): self.outputs[idx] = value
    def __len__(self): return len(self.outputs)
    # fmt: on
