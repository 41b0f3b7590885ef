"""Model-output processing: token append, detokenize, stop checks.

Behavioral counterpart of reference ``vllm/engine/output_processor/``
(single_step + stop_checker, 589 LoC) for the n=1/best_of=1 fast path plus
multi-sample groups; beam search handling is a recognized gap for now.
"""
from __future__ import annotations

from typing import List, Optional

from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.sequence import (Sequence, SequenceGroup,
                                   SequenceGroupOutput, SequenceStatus)
from vllm_ltr_tpu.transformers_utils.detokenizer import Detokenizer


class StopChecker:
    """Stop conditions, checked in the reference's order
    (output_processor/stop_checker.py)."""

    def __init__(self, max_model_len: int, eos_token_id: Optional[int]):
        self.max_model_len = max_model_len
        self.eos_token_id = eos_token_id

    def maybe_stop_sequence(self, seq: Sequence,
                            sampling_params: SamplingParams,
                            new_char_count: int) -> None:
        # Min-tokens gate: no stop checks until satisfied.
        if seq.get_output_len() < sampling_params.min_tokens:
            return

        last_token = seq.get_last_token_id()
        if (not sampling_params.ignore_eos and self.eos_token_id is not None
                and last_token == self.eos_token_id):
            seq.status = SequenceStatus.FINISHED_STOPPED
            return

        if last_token in sampling_params.stop_token_ids:
            seq.stop_reason = last_token
            seq.status = SequenceStatus.FINISHED_STOPPED
            return

        if new_char_count and sampling_params.stop:
            stop = self._check_stop_strings(seq, new_char_count,
                                            sampling_params)
            if stop is not None:
                seq.stop_reason = stop
                seq.status = SequenceStatus.FINISHED_STOPPED
                return

        if seq.get_len() >= self.max_model_len:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return

        if (sampling_params.max_tokens is not None
                and seq.get_output_len() >= sampling_params.max_tokens):
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return

    @staticmethod
    def _check_stop_strings(seq: Sequence, new_char_count: int,
                            sampling_params: SamplingParams) -> Optional[str]:
        """Check newly generated text against stop strings; truncate output
        text accordingly. Returns the matched stop string."""
        for stop_str in sampling_params.stop:
            stop_string_len = len(stop_str)
            stop_index = seq.output_text.find(
                stop_str, -new_char_count - stop_string_len)
            if stop_index == -1:
                continue
            if sampling_params.include_stop_str_in_output:
                stop_index += stop_string_len
                if stop_index >= len(seq.output_text):
                    return stop_str
            seq.output_text = seq.output_text[:stop_index]
            return stop_str
        return None


class OutputProcessor:
    """Applies one step's sampler outputs to the scheduled groups."""

    def __init__(self, detokenizer: Detokenizer, stop_checker: StopChecker,
                 free_seq_fn, fork_seq_fn=None, seq_counter=None) -> None:
        self.detokenizer = detokenizer
        self.stop_checker = stop_checker
        self.free_seq_fn = free_seq_fn
        self.fork_seq_fn = fork_seq_fn
        self.seq_counter = seq_counter

    def process_outputs(self, seq_group: SequenceGroup,
                        output: SequenceGroupOutput) -> None:
        # LTR score plumbing (reference llm_engine.py:493-494).
        if output.pred_score is not None:
            seq_group.pred_score = output.pred_score
        if output.aux_model_score is not None:
            seq_group.aux_model_score = output.aux_model_score

        samples_by_parent: dict = {}
        for s in output.samples:
            samples_by_parent.setdefault(s.parent_seq_id, []).append(s)

        # Parallel sampling (n / best_of > 1): at prefill completion the
        # prompt sequence forks into best_of streams, each continuing from
        # one of this step's sampled candidates (reference
        # output_processor/single_step fork behavior).
        sp = seq_group.sampling_params
        if (sp.best_of > 1 and not sp.use_beam_search
                and seq_group.num_seqs() == 1):
            (parent, ) = seq_group.get_seqs()
            samples = samples_by_parent.get(parent.seq_id, [])
            if len(samples) > 1 and parent.get_output_len() == 0:
                assert self.fork_seq_fn is not None
                for extra in samples[1:]:
                    child = parent.fork(next(self.seq_counter))
                    seq_group.add(child)
                    self.fork_seq_fn(parent, child)
                    samples_by_parent[child.seq_id] = [
                        type(extra)(parent_seq_id=child.seq_id,
                                    output_token=extra.output_token,
                                    logprobs=extra.logprobs)
                    ]
                samples_by_parent[parent.seq_id] = samples[:1]

        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            samples = samples_by_parent.get(seq.seq_id)
            if not samples:
                # Chunked prefill still in flight: nothing sampled yet.
                continue
            # Multiple samples per step come from speculative decoding
            # (reference multi_step output processor): append in order,
            # stop-checking after each token.
            for sample in samples:
                seq.append_token_id(sample.output_token, sample.logprobs)
                new_char_count = 0
                if seq_group.sampling_params.detokenize and (
                        self.detokenizer.tokenizer is not None):
                    before = len(seq.output_text)
                    self.detokenizer.decode_sequence_inplace(
                        seq, seq_group.sampling_params.skip_special_tokens,
                        seq_group.sampling_params.
                        spaces_between_special_tokens)
                    new_char_count = len(seq.output_text) - before
                self.stop_checker.maybe_stop_sequence(
                    seq, seq_group.sampling_params, new_char_count)
                if seq.is_finished():
                    break
            if seq.is_finished():
                self.free_seq_fn(seq)
