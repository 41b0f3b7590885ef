"""Helpers for scheduler/block-manager unit tests: drive the scheduler with
dummy requests, no model (the reference test suite's approach)."""
import time

from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.sequence import (Logprob, Sequence, SequenceGroup,
                                   SequenceStatus)


def _seq_id_for(request_id: str) -> int:
    return (int(request_id) if request_id.isdigit() else
            abs(hash(request_id)) % (1 << 31))


def create_dummy_prompt(request_id: str, prompt_length: int,
                        block_size: int | None = None, est_tokens: int = 16,
                        best_of: int = 1, arrival_time: float | None = None,
                        ) -> tuple[Sequence, SequenceGroup]:
    """A request whose prompt is 0..prompt_length-1, unbounded decode."""
    tokens = list(range(prompt_length))
    root = Sequence(
        _seq_id_for(request_id),
        " ".join(map(str, tokens)),
        tokens,
        block_size or prompt_length,
    )
    params = SamplingParams(est_tokens=est_tokens, best_of=best_of,
                            ignore_eos=True, max_tokens=8192)
    group = SequenceGroup(
        request_id=request_id, seqs=[root], sampling_params=params,
        arrival_time=time.time() if arrival_time is None else arrival_time)
    return root, group


def append_new_token(group: SequenceGroup, token_id: int) -> None:
    """Simulate the engine appending one decoded token to every running seq."""
    for seq in group.get_seqs(status=SequenceStatus.RUNNING):
        seq.append_token_id(token_id, {token_id: Logprob(logprob=0.0)})


def schedule_and_update_computed_tokens(scheduler):
    """Drive one scheduler step, updating computed-token counts the way the
    engine does after a model step."""
    metas, out = scheduler.schedule()  # one engine-step equivalent
    for item in out.scheduled_seq_groups:
        item.seq_group.update_num_computed_tokens(item.token_chunk_size)
    return (metas, out)


def step_decode(scheduler, out) -> None:
    """Append one token to every scheduled (decode-complete) group."""
    for i, item in enumerate(out.scheduled_seq_groups):
        if not item.seq_group.is_prefill():
            append_new_token(item.seq_group, 100 + i)
