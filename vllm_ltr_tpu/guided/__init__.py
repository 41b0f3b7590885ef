"""Native guided decoding (no outlines / lm-format-enforcer dependency).

Behavioral counterpart of the reference's guided decoding stack
(vllm/model_executor/guided_decoding/outlines_decoding.py:1-128,
outlines_logits_processors.py): constrain generation to a choice list, a
regular expression, or a JSON schema.

TPU-first design: instead of a per-token Python logits processor run on
the device-side logits (the reference's CUDA-side hook), the host
compiles the constraint to a character-level DFA, lifts it to a
token-level FSM over the tokenizer vocab, and feeds the per-row
allowed-token *bitmask* into the jitted sampler as one packed uint8
tensor (`prepare_batch` -> `step_fn` -> `sample`).  The device program
stays static-shaped and fused; the host work per step is one cached
mask lookup per guided row.
"""
from vllm_ltr_tpu.guided.manager import (GuidedDecodingManager, TokenGuide,
                                         guide_from_sampling_params)

__all__ = [
    "GuidedDecodingManager", "TokenGuide", "guide_from_sampling_params"
]
