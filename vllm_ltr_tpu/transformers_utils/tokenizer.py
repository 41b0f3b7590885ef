"""Tokenizer resolution (counterpart of reference
vllm/transformers_utils/tokenizer.py). Fully offline: tokenizers load from
local directories; `None` means token-id-only operation
(skip_tokenizer_init), which all tests and benchmarks use."""
from __future__ import annotations

import os
from typing import Optional


def get_tokenizer(tokenizer_name: Optional[str],
                  tokenizer_mode: str = "auto",
                  trust_remote_code: bool = False,
                  revision: Optional[str] = None):
    if tokenizer_name is None:
        return None
    if os.path.isdir(tokenizer_name):
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(
            tokenizer_name,
            use_fast=(tokenizer_mode != "slow"),
            trust_remote_code=trust_remote_code,
            revision=revision)
    # Built-in test configs have no tokenizer files; token ids only.
    return None
