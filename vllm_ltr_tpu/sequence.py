"""Sequence and request data model.

Behavioral counterpart of reference ``vllm/sequence.py`` (v0.4.1 + the LTR
fork's score/starvation fields, reference sequence.py:426-465,604-696).
"""
from __future__ import annotations

import copy
import enum
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

from vllm_ltr_tpu.core.block import LogicalTokenBlock
from vllm_ltr_tpu.sampling_params import SamplingParams


@dataclass
class Logprob:
    """Log probability of a token plus optional rank and decoded form."""
    logprob: float
    rank: Optional[int] = None
    decoded_token: Optional[str] = None


PromptLogprobs = List[Optional[Dict[int, Logprob]]]
SampleLogprobs = List[Dict[int, Logprob]]


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    SWAPPED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH_CAPPED = enum.auto()
    FINISHED_ABORTED = enum.auto()
    FINISHED_IGNORED = enum.auto()

    @staticmethod
    def is_finished(status: "SequenceStatus") -> bool:
        return status in (
            SequenceStatus.FINISHED_STOPPED,
            SequenceStatus.FINISHED_LENGTH_CAPPED,
            SequenceStatus.FINISHED_ABORTED,
            SequenceStatus.FINISHED_IGNORED,
        )

    @staticmethod
    def get_finished_reason(status: "SequenceStatus") -> Optional[str]:
        if status == SequenceStatus.FINISHED_STOPPED:
            return "stop"
        if status == SequenceStatus.FINISHED_LENGTH_CAPPED:
            return "length"
        if status == SequenceStatus.FINISHED_ABORTED:
            return "abort"
        if status == SequenceStatus.FINISHED_IGNORED:
            # Ignored sequences are over max-model-len, so report "length".
            return "length"
        return None


class SequenceStage(enum.Enum):
    PREFILL = enum.auto()
    DECODE = enum.auto()


@dataclass
class RequestMetrics:
    """Request-level timing metrics."""
    arrival_time: float
    last_token_time: float
    first_scheduled_time: Optional[float] = None
    first_token_time: Optional[float] = None
    time_in_queue: Optional[float] = None
    finished_time: Optional[float] = None


class SequenceData:
    """Token data plus computed-token tracking for chunked prefill
    (reference sequence.py:112-213)."""

    def __init__(self, prompt_token_ids: List[int],
                 output_token_ids: Optional[List[int]] = None) -> None:
        self.prompt_token_ids = prompt_token_ids
        self.output_token_ids = output_token_ids or []
        self.cumulative_logprob = 0.0
        # Number of tokens whose KV is already computed (chunked prefill).
        self._num_computed_tokens = 0
        self._stage: SequenceStage = SequenceStage.PREFILL

    def append_token_id(self, token_id: int, logprob: float) -> None:
        self.output_token_ids.append(token_id)
        self.cumulative_logprob += logprob

    def get_len(self) -> int:
        return len(self.output_token_ids) + len(self.prompt_token_ids)

    def get_prompt_len(self) -> int:
        return len(self.prompt_token_ids)

    def get_output_len(self) -> int:
        return len(self.output_token_ids)

    def get_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    def get_num_computed_tokens(self) -> int:
        return self._num_computed_tokens

    def update_num_computed_tokens(self, num_new_computed_tokens: int):
        self._num_computed_tokens += num_new_computed_tokens
        assert self._num_computed_tokens <= self.get_len(), (
            self._num_computed_tokens, self.get_len())
        if self.get_num_uncomputed_tokens() == 0:
            self._stage = SequenceStage.DECODE

    def reset_state_for_recompute(self) -> None:
        """On recompute-preemption the whole sequence is a new prefill."""
        self._num_computed_tokens = 0
        self._stage = SequenceStage.PREFILL

    def get_num_uncomputed_tokens(self) -> int:
        # Decode needs the new (sampled, not yet computed) token too, so this
        # is total length minus computed, not prompt minus computed.
        return self.get_len() - self.get_num_computed_tokens()

    def get_last_token_id(self) -> int:
        if not self.output_token_ids:
            return self.prompt_token_ids[-1]
        return self.output_token_ids[-1]

    def get_prompt_token_ids(self) -> List[int]:
        return self.prompt_token_ids

    def get_output_token_ids(self) -> List[int]:
        return self.output_token_ids

    @property
    def stage(self) -> SequenceStage:
        return self._stage

    def __repr__(self) -> str:
        return (f"SequenceData("
                f"prompt_token_ids={self.prompt_token_ids}, "
                f"output_token_ids={self.output_token_ids}, "
                f"cumulative_logprob={self.cumulative_logprob})")


class Sequence:
    """A single generation stream: prompt + generated tokens + logical block
    layout (reference sequence.py:215-392)."""

    def __init__(
        self,
        seq_id: int,
        prompt: Optional[str],
        prompt_token_ids: List[int],
        block_size: int,
        eos_token_id: Optional[int] = None,
        lora_request: Optional[Any] = None,
    ) -> None:
        self.seq_id = seq_id
        self.prompt = prompt
        self.block_size = block_size
        self.eos_token_id = eos_token_id
        self.lora_request = lora_request

        self.data = SequenceData(list(prompt_token_ids))
        self.output_logprobs: SampleLogprobs = []
        self.output_text = ""

        self.logical_token_blocks: List[LogicalTokenBlock] = []
        self._append_tokens_to_blocks(prompt_token_ids)
        self.status = SequenceStatus.WAITING
        self.stop_reason: Union[int, str, None] = None

        # Incremental detokenization state.
        self.prefix_offset = 0
        self.read_offset = 0
        self.tokens: Optional[List[str]] = None

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    def hash_of_block(self, logical_idx: int) -> int:
        """Content hash for prefix caching: all token ids up to and including
        this block."""
        num_tokens = self.num_hashed_tokens_of_block(logical_idx)
        return hash(
            (tuple(self.data.get_token_ids()[0:num_tokens]),
             self.lora_int_id))

    def num_hashed_tokens_of_block(self, logical_idx: int) -> int:
        return logical_idx * self.block_size + self.block_size

    def reset_state_for_recompute(self):
        self.data.reset_state_for_recompute()

    def _append_logical_block(self) -> None:
        block = LogicalTokenBlock(
            block_number=len(self.logical_token_blocks),
            block_size=self.block_size,
        )
        self.logical_token_blocks.append(block)

    def _append_tokens_to_blocks(self, token_ids: List[int]) -> None:
        cursor = 0
        while cursor < len(token_ids):
            if not self.logical_token_blocks:
                self._append_logical_block()
            last_block = self.logical_token_blocks[-1]
            if last_block.is_full():
                self._append_logical_block()
                last_block = self.logical_token_blocks[-1]
            num_empty_slots = last_block.get_num_empty_slots()
            last_block.append_tokens(token_ids[cursor:cursor +
                                               num_empty_slots])
            cursor += num_empty_slots

    def append_token_id(self, token_id: int,
                        logprobs: Dict[int, Logprob]) -> None:
        assert token_id in logprobs
        self._append_tokens_to_blocks([token_id])
        self.output_logprobs.append(logprobs)
        self.data.append_token_id(token_id, logprobs[token_id].logprob)

    def get_len(self) -> int:
        return self.data.get_len()

    def get_prompt_len(self) -> int:
        return self.data.get_prompt_len()

    def get_output_len(self) -> int:
        return self.data.get_output_len()

    def get_token_ids(self) -> List[int]:
        return self.data.get_token_ids()

    def get_prompt_token_ids(self) -> List[int]:
        return self.data.get_prompt_token_ids()

    def get_last_token_id(self) -> int:
        return self.data.get_last_token_id()

    def get_output_token_ids(self) -> List[int]:
        return self.data.output_token_ids

    def get_cumulative_logprob(self) -> float:
        return self.data.cumulative_logprob

    def get_beam_search_score(self,
                              length_penalty: float = 1.0,
                              seq_len: Optional[int] = None,
                              eos_token_id: Optional[int] = None) -> float:
        if seq_len is None:
            seq_len = self.get_len()
            if (eos_token_id is not None
                    and self.get_last_token_id() == eos_token_id):
                seq_len -= 1
        return self.get_cumulative_logprob() / (seq_len**length_penalty)

    def is_finished(self) -> bool:
        return SequenceStatus.is_finished(self.status)

    def fork(self, new_seq_id: int) -> "Sequence":
        new_seq = copy.deepcopy(self)
        new_seq.seq_id = new_seq_id
        return new_seq

    def get_num_new_tokens(self) -> int:
        """Tokens to compute in the next model step: 1 in decode, remaining
        uncomputed tokens during (chunked) prefill."""
        if self.data.stage == SequenceStage.DECODE:
            return 1
        return self.data.get_num_uncomputed_tokens()

    def is_prefill(self) -> bool:
        return self.data.stage == SequenceStage.PREFILL

    def __repr__(self) -> str:
        return (f"Sequence(seq_id={self.seq_id}, "
                f"status={self.status.name}, "
                f"num_blocks={len(self.logical_token_blocks)})")


@dataclass
class RunningInfo:
    """Per-request swap accounting surfaced to RequestOutput
    (reference sequence.py:432,451-453)."""
    swap_out: int = 0
    swap_blocks: int = 0


class SequenceGroup:
    """All sequences generated from the same prompt, plus the LTR fork's
    scheduling state (reference sequence.py:395-465)."""

    def __init__(
        self,
        request_id: str,
        seqs: List[Sequence],
        sampling_params: SamplingParams,
        arrival_time: float,
        lora_request: Optional[Any] = None,
        multi_modal_data: Optional[Any] = None,
    ) -> None:
        self.request_id = request_id
        self.seqs_dict = {seq.seq_id: seq for seq in seqs}
        self.sampling_params = sampling_params
        self.metrics = RequestMetrics(arrival_time=arrival_time,
                                      last_token_time=arrival_time)
        self.lora_request = lora_request
        self.prompt_logprobs: Optional[PromptLogprobs] = None
        self.multi_modal_data = multi_modal_data
        self.state = SequenceGroupState()

        # --- LTR scheduling state (reference sequence.py:426-433) ---
        # Embedded mid-layer predictor score (per prefill, optional).
        self.pred_score: Optional[float] = None
        # AUX (prefill predictor) ranking score; higher => shorter predicted
        # output => scheduled earlier under the `opt` policy.
        self.aux_model_score: Optional[float] = None
        # Scratch priority score used by experimental policies.
        self.pscore: float = 0.0
        self.priority: int = 0
        # Starvation control state: steps idle, promoted-steps remaining,
        # current priority class (-1 = promoted).
        self.idle: int = 0
        self.runs: int = 0
        self.pri: int = 0
        # MLFQ process-time accounting.
        self.lst_process_time: float = 0.0
        self.process_time: float = 0.0
        self.running_info = RunningInfo()

    # -- LTR helpers --------------------------------------------------------

    def need_aux_model_score(self) -> bool:
        return self.aux_model_score is None

    def set_aux_model_score(self, score: float) -> None:
        self.aux_model_score = score

    def count_swap_out(self) -> None:
        self.running_info.swap_out += 1
        self.running_info.swap_blocks += sum(
            len(seq.logical_token_blocks) for seq in self.get_seqs())

    # -- MLFQ helpers -------------------------------------------------------

    def get_priority(self) -> int:
        return self.priority

    def set_priority(self, priority: int) -> None:
        self.priority = priority

    # -----------------------------------------------------------------------

    @property
    def prompt(self) -> Optional[str]:
        return next(iter(self.seqs_dict.values())).prompt

    @property
    def prompt_token_ids(self) -> List[int]:
        return next(iter(self.seqs_dict.values())).data.prompt_token_ids

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    def get_last_latency(self, now: float) -> float:
        if self.is_prefill():
            raise ValueError(
                "seq_group.get_last_latency() should not be called "
                "if the seq_group is in prefill phase.")
        latency = now - self.metrics.last_token_time
        self.metrics.last_token_time = now
        return latency

    def maybe_set_first_token_time(self, time_: float) -> None:
        if (self.metrics.first_token_time is None
                and self.get_seqs()[0].get_output_len() == 1):
            self.metrics.first_token_time = time_

    def maybe_set_first_scheduled_time(self, time_: float) -> None:
        if self.metrics.first_scheduled_time is None:
            self.metrics.first_scheduled_time = time_
            self.metrics.time_in_queue = time_ - self.metrics.arrival_time

    def set_finished_time(self, time_: Optional[float]) -> None:
        self.metrics.finished_time = time_

    def get_max_num_running_seqs(self) -> int:
        """Upper bound of concurrently running sequences over the request's
        lifetime."""
        if self.sampling_params.use_beam_search:
            return self.sampling_params.best_of
        if self.sampling_params.best_of > self.num_seqs():
            return self.sampling_params.best_of
        return self.num_unfinished_seqs()

    def get_seqs(
        self,
        status: Optional[SequenceStatus] = None,
    ) -> List[Sequence]:
        return list(self.seqs_dict.values()) if status is None else [
            seq for seq in self.seqs_dict.values() if seq.status == status
        ]

    def get_unfinished_seqs(self) -> List[Sequence]:
        return [
            seq for seq in self.seqs_dict.values() if not seq.is_finished()
        ]

    def get_finished_seqs(self) -> List[Sequence]:
        return [seq for seq in self.seqs_dict.values() if seq.is_finished()]

    def update_num_computed_tokens(self, num_new_computed_tokens: int):
        for seq in self.seqs_dict.values():
            if not seq.is_finished():
                seq.data.update_num_computed_tokens(num_new_computed_tokens)

    def get_num_uncomputed_tokens(self) -> int:
        return sum(seq.data.get_num_uncomputed_tokens()
                   for seq in self.get_unfinished_seqs())

    def num_seqs(self, status: Optional[SequenceStatus] = None) -> int:
        return len(self.get_seqs(status))

    def num_unfinished_seqs(self) -> int:
        return len(self.get_unfinished_seqs())

    def num_finished_seqs(self) -> int:
        return len(self.get_finished_seqs())

    def find(self, seq_id: int) -> Sequence:
        if seq_id not in self.seqs_dict:
            raise ValueError(f"Sequence {seq_id} not found.")
        return self.seqs_dict[seq_id]

    def add(self, seq: Sequence) -> None:
        if seq.seq_id in self.seqs_dict:
            raise ValueError(f"Sequence {seq.seq_id} already exists.")
        self.seqs_dict[seq.seq_id] = seq

    def remove(self, seq_id: int) -> None:
        if seq_id not in self.seqs_dict:
            raise ValueError(f"Sequence {seq_id} not found.")
        del self.seqs_dict[seq_id]

    def is_finished(self) -> bool:
        return all(seq.is_finished() for seq in self.get_seqs())

    def is_prefill(self) -> bool:
        # Every sequence should be in the same stage.
        return self.get_seqs()[0].is_prefill()

    def __repr__(self) -> str:
        return (f"SequenceGroup(request_id={self.request_id}, "
                f"sampling_params={self.sampling_params}, "
                f"num_seqs={len(self.seqs_dict)})")


@dataclass
class SequenceGroupState:
    """Mutable per-group execution state (e.g. seeded generator step)."""
    generator_step: int = 0


class SequenceGroupMetadata:
    """Per-step metadata handed from the scheduler to the model executor
    (reference sequence.py:570-632, incl. the LTR `need_score` flag)."""

    def __init__(
        self,
        request_id: str,
        is_prompt: bool,
        seq_data: Dict[int, SequenceData],
        sampling_params: SamplingParams,
        block_tables: Dict[int, List[int]],
        token_chunk_size: Optional[int] = None,
        lora_request: Optional[Any] = None,
        computed_block_nums: Optional[List[int]] = None,
        state: Optional[SequenceGroupState] = None,
        multi_modal_data: Optional[Any] = None,
        need_score: bool = False,
    ) -> None:
        self.request_id = request_id
        self.is_prompt = is_prompt
        self.seq_data = seq_data
        self.sampling_params = sampling_params
        self.block_tables = block_tables
        self.lora_request = lora_request
        self.computed_block_nums = computed_block_nums
        self.state = SequenceGroupState() if state is None else state
        self.multi_modal_data = multi_modal_data
        self.need_score = need_score
        self._token_chunk_size = token_chunk_size

        if self._token_chunk_size is None:
            if is_prompt:
                self._token_chunk_size = list(
                    seq_data.values())[0].get_len()
            else:
                self._token_chunk_size = 1

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    @property
    def token_chunk_size(self) -> int:
        assert self._token_chunk_size is not None
        return self._token_chunk_size


class SequenceOutput:
    """Model output for one sequence in a step (reference sequence.py:635-668)."""

    def __init__(self, parent_seq_id: int, output_token: int,
                 logprobs: Dict[int, Logprob]) -> None:
        self.parent_seq_id = parent_seq_id
        self.output_token = output_token
        self.logprobs = logprobs

    def __repr__(self) -> str:
        return (f"SequenceOutput(parent_seq_id={self.parent_seq_id}, "
                f"output_token={self.output_token})")

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, SequenceOutput):
            raise NotImplementedError()
        return (self.parent_seq_id == other.parent_seq_id
                and self.output_token == other.output_token
                and self.logprobs == other.logprobs)


class SequenceGroupOutput:
    """Model output for one sequence group in a step, carrying the LTR scores
    (reference sequence.py:671-696)."""

    def __init__(
        self,
        samples: List[SequenceOutput],
        prompt_logprobs: Optional[PromptLogprobs],
        pred_score: Optional[float] = None,
        aux_model_score: Optional[float] = None,
    ) -> None:
        self.samples = samples
        self.prompt_logprobs = prompt_logprobs
        self.pred_score = pred_score
        self.aux_model_score = aux_model_score

    def __repr__(self) -> str:
        return (f"SequenceGroupOutput(samples={self.samples}, "
                f"prompt_logprobs={self.prompt_logprobs}, "
                f"pred_score={self.pred_score}, "
                f"aux_model_score={self.aux_model_score})")

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, SequenceGroupOutput):
            raise NotImplementedError()
        return (self.samples == other.samples
                and self.prompt_logprobs == other.prompt_logprobs)


@dataclass
class SamplerOutput:
    """Output of the sampler for a full batch: one SequenceGroupOutput per
    scheduled sequence group."""
    outputs: List[SequenceGroupOutput]

    def __getitem__(self, idx: int):
        return self.outputs[idx]

    def __setitem__(self, idx: int, value):
        self.outputs[idx] = value

    def __len__(self):
        return len(self.outputs)

    def __eq__(self, other: object):
        return (isinstance(other, self.__class__)
                and self.outputs == other.outputs)
