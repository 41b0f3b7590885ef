"""Helpers for scheduler/block-manager unit tests (style follows reference
tests/core/utils.py: drive the scheduler with dummy prompts, no model)."""
import time
from typing import List, Optional, Tuple

from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.sequence import (Logprob, Sequence, SequenceGroup,
                                   SequenceStatus)


def create_dummy_prompt(
    request_id: str,
    prompt_length: int,
    block_size: Optional[int] = None,
    est_tokens: int = 16,
    best_of: int = 1,
    arrival_time: Optional[float] = None,
) -> Tuple[Sequence, SequenceGroup]:
    if not block_size:
        block_size = prompt_length

    # Dummy prompt with monotonically increasing token ids.
    prompt_tokens = list(range(prompt_length))
    prompt_str = " ".join([str(t) for t in prompt_tokens])
    seq_id = (int(request_id)
              if request_id.isdigit() else abs(hash(request_id)) % (1 << 31))
    prompt = Sequence(seq_id, prompt_str, prompt_tokens, block_size)
    seq_group = SequenceGroup(
        request_id=request_id,
        seqs=[prompt],
        sampling_params=SamplingParams(est_tokens=est_tokens,
                                       best_of=best_of,
                                       ignore_eos=True,
                                       max_tokens=8192),
        arrival_time=arrival_time
        if arrival_time is not None else time.time(),
    )
    return prompt, seq_group


def append_new_token(seq_group: SequenceGroup, token_id: int) -> None:
    """Simulate the engine appending one decoded token to every running seq."""
    for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
        seq.append_token_id(token_id, {token_id: Logprob(0.0)})


def schedule_and_update_computed_tokens(scheduler):
    """Drive one scheduler step, updating computed-token counts the way the
    engine does after a model step."""
    metas, out = scheduler.schedule()
    for s in out.scheduled_seq_groups:
        s.seq_group.update_num_computed_tokens(s.token_chunk_size)
    return metas, out


def step_decode(scheduler, out) -> None:
    """Append one token to every scheduled (decode-complete) group."""
    for i, s in enumerate(out.scheduled_seq_groups):
        if not s.seq_group.is_prefill():
            append_new_token(s.seq_group, 100 + i)
