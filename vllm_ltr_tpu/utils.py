"""Shared helpers: integer math, id generation, KV dtype names, async glue.

Functional counterpart of the grab-bag in reference vllm/utils.py, trimmed
to what this framework actually uses.
"""
from __future__ import annotations

import asyncio, functools, itertools, uuid
from typing import Any, Awaitable, Callable, TypeVar

_R = TypeVar("_R")

# KV-cache storage dtype by config name.  TPU note: fp16 has no MXU path, so
# float16 requests are served in bfloat16; "fp8" means E5M2 bits held in a
# jnp.float8_e5m2 array (the reference stores fp8 KV as uint8,
# vllm/utils.py:30 — here the dtype system carries the format natively).
STR_DTYPE_TO_KV_DTYPE = {
    "auto": None,
    "bfloat16": "bfloat16",
    "float16": "bfloat16",
    "float32": "float32",
    "fp8": "float8_e5m2",
    "fp8_e5m2": "float8_e5m2",
    "fp8_e4m3": "float8_e4m3fn",
}


def cdiv(a: int, b: int) -> int:
    """Ceiling division (negative floor-division trick)."""
    return -(a // -b)


def round_up(x: int, multiple: int) -> int:
    return cdiv(x, multiple) * multiple


def pad_to_bucket(n: int, buckets: list[int]) -> int:
    """Smallest bucket >= n (buckets ascending); clamps to the largest."""
    idx = next((i for i, b in enumerate(buckets) if n <= b),
               len(buckets) - 1)
    return buckets[idx]


def random_uuid() -> str: return uuid.uuid4().hex  # noqa: E704


class Counter:
    """Monotonic integer id source (resettable, unlike itertools.count)."""

    def __init__(self, start: int = 0) -> None:
        self._start, self._it = start, itertools.count(start)

    # fmt: off
    def __next__(self) -> int: return next(self._it)
    def reset(self) -> None: self._it = itertools.count(self._start)
    # fmt: on

    @property
    def counter(self) -> int:
        # Peek without consuming: count() has no peek, so emulate via a copy.
        peeked = next(self._it)
        self._it = itertools.count(peeked)
        return peeked


def make_async(func: Callable[..., _R]) -> Callable[..., Awaitable[_R]]:
    """Lift a blocking callable into the event loop's default executor."""

    @functools.wraps(func)
    def wrapped(*args, **kwargs) -> asyncio.Future:
        call = functools.partial(func, *args, **kwargs)
        return asyncio.get_event_loop().run_in_executor(None, call)

    return wrapped


def merge_dicts(a: dict[Any, list[Any]],
                b: dict[Any, list[Any]]) -> dict[Any, list[Any]]:
    """Union of two list-valued dicts; shared keys concatenate (a first)."""
    out = {k: list(v) for k, v in a.items()}
    for k, v in b.items():
        out.setdefault(k, []).extend(v)
    return out
