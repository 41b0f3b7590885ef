"""Model-output processing: token append, detokenize, stop checks.

Behavioral counterpart of reference ``vllm/engine/output_processor/``
(single_step + stop_checker + beam-search handling, 589 LoC): the
n=1/best_of=1 fast path, multi-sample (parallel sampling) groups, and the
full host-side beam-search step (``_process_beam_search``).
"""
from __future__ import annotations

from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.sequence import (Sequence, SequenceGroup,
                                   SequenceGroupOutput, SequenceStatus)
from vllm_ltr_tpu.transformers_utils.detokenizer import Detokenizer

_STOPPED = SequenceStatus.FINISHED_STOPPED
_CAPPED = SequenceStatus.FINISHED_LENGTH_CAPPED
_ABORTED = SequenceStatus.FINISHED_ABORTED


class StopChecker:
    """Stop conditions, checked in the reference's order
    (output_processor/stop_checker.py)."""

    def __init__(self, max_model_len: int, eos_token_id: int | None):
        self.max_model_len, self.eos_token_id = max_model_len, eos_token_id

    def maybe_stop_sequence(self, seq: Sequence, params: SamplingParams,
                            new_char_count: int) -> None:
        # Min-tokens gate: no stop checks until satisfied.
        if seq.get_output_len() < params.min_tokens:
            return

        last_token = seq.get_last_token_id()
        if (not params.ignore_eos and self.eos_token_id is not None
                and last_token == self.eos_token_id):
            seq.status = _STOPPED
            return

        if last_token in params.stop_token_ids:
            seq.stop_reason, seq.status = last_token, _STOPPED
            return

        if new_char_count and params.stop:
            hit = self._match_stop_string(seq, new_char_count, params)
            if hit is not None:
                seq.stop_reason, seq.status = hit, _STOPPED
                return

        if seq.get_len() >= self.max_model_len:
            seq.status = _CAPPED
            return

        if (params.max_tokens is not None
                and seq.get_output_len() >= params.max_tokens):
            seq.status = _CAPPED
            return

    @staticmethod
    def _match_stop_string(seq: Sequence, new_char_count: int,
                           params: SamplingParams) -> str | None:
        """Check newly generated text against stop strings; truncate output
        text accordingly. Returns the matched stop string."""
        for stop_str in params.stop:
            # Only the newly decoded tail (plus one stop-length of overlap)
            # can contain a fresh match.
            at = seq.output_text.find(stop_str,
                                      -new_char_count - len(stop_str))
            if at == -1:
                continue
            if params.include_stop_str_in_output:
                at += len(stop_str)
                if at >= len(seq.output_text):
                    return stop_str
            seq.output_text = seq.output_text[:at]
            return stop_str
        return None


class OutputProcessor:
    """Applies one step's sampler outputs to the scheduled groups."""

    def __init__(self, detokenizer: Detokenizer, stop_checker: StopChecker,
                 free_seq_fn, fork_seq_fn=None, seq_counter=None) -> None:
        self.detokenizer, self.stop_checker = detokenizer, stop_checker
        self.free_seq_fn, self.fork_seq_fn = free_seq_fn, fork_seq_fn
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

        sp = seq_group.sampling_params
        if sp.use_beam_search:
            self._process_beam_search(seq_group, samples_by_parent)
            return

        # Parallel sampling (n / best_of > 1): at prefill completion the
        # prompt sequence forks into best_of streams, each continuing from
        # one of this step's sampled candidates (reference
        # output_processor/single_step fork behavior).
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

        for seq in seq_group.get_seqs(SequenceStatus.RUNNING):
            samples = samples_by_parent.get(seq.seq_id)
            if not samples:
                # Chunked prefill still in flight: nothing sampled yet.
                continue
            # Multiple samples per step come from speculative decoding
            # (reference multi_step output processor): append in order,
            # stop-checking after each token.
            for sample in samples:
                seq.append_token_id(sample.output_token, sample.logprobs)
                grown = 0
                if sp.detokenize and self.detokenizer.tokenizer is not None:
                    before = len(seq.output_text)
                    self.detokenizer.decode_sequence_inplace(
                        seq, sp.skip_special_tokens,
                        sp.spaces_between_special_tokens)
                    grown = len(seq.output_text) - before
                self.stop_checker.maybe_stop_sequence(seq, sp, grown)
                if seq.is_finished():
                    break
            if seq.is_finished():
                self.free_seq_fn(seq)


    def _process_beam_search(self, seq_group: SequenceGroup,
                             samples_by_parent: dict) -> None:
        """Host-side beam step (reference single-step beam handling):
        each running beam emitted its top-2B (token, logprob) candidates;
        keep the best_of highest-cumulative-logprob continuations, retire
        EOS candidates as finished hypotheses, fork/prune parents."""
        sp = seq_group.sampling_params
        beam_width = sp.best_of
        eos = self.stop_checker.eos_token_id

        parents = [s for s in seq_group.get_seqs(SequenceStatus.RUNNING)
                   if s.seq_id in samples_by_parent]
        if not parents:
            return

        # All candidate continuations: (cum_logprob, parent, sample).
        candidates = []
        for parent in parents:
            for sample in samples_by_parent[parent.seq_id]:
                lp = sample.logprobs[sample.output_token].logprob
                candidates.append(
                    (parent.get_cumulative_logprob() + lp, parent, sample))
        candidates.sort(key=lambda c: c[0], reverse=True)

        # EOS candidates among the top beam_width retire a hypothesis.
        continuing = []
        n_finished = seq_group.num_finished_seqs()
        for cum, parent, sample in candidates:
            if len(continuing) >= beam_width:
                break
            is_eos = (not sp.ignore_eos and eos is not None
                      and sample.output_token == eos)
            if is_eos and n_finished < beam_width:
                hyp = parent.fork(next(self.seq_counter))
                seq_group.add(hyp)
                self.fork_seq_fn(parent, hyp)
                hyp.append_token_id(sample.output_token, sample.logprobs)
                hyp.status = _STOPPED
                self.free_seq_fn(hyp)
                n_finished += 1
                continue
            continuing.append((parent, sample))

        # Fork/prune: parents may continue 0, 1 or more times.
        by_parent: dict[int, list] = {}
        for parent, sample in continuing:
            by_parent.setdefault(id(parent), []).append((parent, sample))
        for parent in parents:
            conts = by_parent.get(id(parent), [])
            if not conts:
                parent.status = _ABORTED
                self.free_seq_fn(parent)
                seq_group.remove(parent.seq_id)
                continue
            # First continuation extends the parent in place.
            first_parent, first_sample = conts[0]
            for extra_parent, extra_sample in conts[1:]:
                child = parent.fork(next(self.seq_counter))
                seq_group.add(child)
                self.fork_seq_fn(parent, child)
                child.append_token_id(extra_sample.output_token,
                                      extra_sample.logprobs)
                self._maybe_finish_beam(child, sp)
            parent.append_token_id(first_sample.output_token,
                                   first_sample.logprobs)
            self._maybe_finish_beam(parent, sp)

        # Stop the whole group once beam_width hypotheses exist and no
        # running beam can beat the worst finished score (early_stopping
        # collapses this to "enough hypotheses").
        if seq_group.num_finished_seqs() >= beam_width:
            for seq in seq_group.get_seqs(SequenceStatus.RUNNING):
                seq.status = _ABORTED
                self.free_seq_fn(seq)

    def _maybe_finish_beam(self, seq: Sequence,
                           sp: SamplingParams) -> None:
        if (sp.max_tokens is not None
                and seq.get_output_len() >= sp.max_tokens):
            seq.status = _CAPPED
            self.free_seq_fn(seq)
        elif seq.get_len() >= self.stop_checker.max_model_len:
            seq.status = _CAPPED
            self.free_seq_fn(seq)
