"""Tokenizer pool: parallel prompt encoding off the engine thread.

Behavioral counterpart of reference
``vllm/transformers_utils/tokenizer_group/`` (TokenizerGroup +
RayTokenizerGroupPool, sized by TokenizerPoolConfig): at high QPS, prompt
tokenization on the engine/event-loop thread becomes a host bottleneck.
The reference solves it with a pool of Ray actors; here a thread pool
suffices — HF fast tokenizers release the GIL in their Rust core, so
encodes genuinely run in parallel, and there is no Ray in this runtime.

``encode`` mirrors TokenizerGroup.encode (inline, with max-length check);
``encode_async`` is the pool path used by the async engine so the event
loop never blocks on tokenization.
"""
from __future__ import annotations

import asyncio
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional


class TokenizerPool:

    def __init__(self, tokenizer, pool_size: int = 0,
                 max_input_length: Optional[int] = None) -> None:
        self.tokenizer = tokenizer
        self.max_input_length = max_input_length
        self._pool = (ThreadPoolExecutor(
            max_workers=pool_size,
            thread_name_prefix="tokenizer") if pool_size > 0 else None)

    def _check(self, ids: List[int]) -> List[int]:
        if (self.max_input_length is not None
                and len(ids) > self.max_input_length):
            raise ValueError(
                f"prompt is {len(ids)} tokens, over the maximum of "
                f"{self.max_input_length}")
        return ids

    def encode(self, prompt: str) -> List[int]:
        return self._check(self.tokenizer.encode(prompt))

    async def encode_async(self, prompt: str) -> List[int]:
        if self._pool is None:
            return self.encode(prompt)
        loop = asyncio.get_event_loop()
        ids = await loop.run_in_executor(self._pool, self.tokenizer.encode,
                                         prompt)
        return self._check(ids)

    def shutdown(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False)
