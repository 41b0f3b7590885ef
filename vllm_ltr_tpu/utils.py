"""Small shared utilities (counterpart of reference vllm/utils.py)."""
from __future__ import annotations

import asyncio
import socket
import uuid
from collections import OrderedDict
from functools import partial
from typing import (Any, Awaitable, Callable, Dict, Generic, Hashable, List,
                    Optional, TypeVar)

T = TypeVar("T")

# KV-cache storage dtypes by name. "fp8" stores E5M2 bits in uint8-compatible
# jnp.float8_e5m2 arrays (reference vllm/utils.py:30 maps fp8 -> uint8).
STR_DTYPE_TO_KV_DTYPE = {
    "auto": None,
    "bfloat16": "bfloat16",
    "float16": "bfloat16",  # TPU has no fp16 MXU path; bf16 is the native half.
    "float32": "float32",
    "fp8": "float8_e5m2",
    "fp8_e5m2": "float8_e5m2",
    "fp8_e4m3": "float8_e4m3fn",
}


class Counter:

    def __init__(self, start: int = 0) -> None:
        self.counter = start

    def __next__(self) -> int:
        i = self.counter
        self.counter += 1
        return i

    def reset(self) -> None:
        self.counter = 0


class LRUCache(Generic[T]):

    def __init__(self, capacity: int):
        self.cache: OrderedDict[Hashable, T] = OrderedDict()
        self.capacity = capacity

    def __contains__(self, key: Hashable) -> bool:
        return key in self.cache

    def __len__(self) -> int:
        return len(self.cache)

    def __getitem__(self, key: Hashable) -> Optional[T]:
        return self.get(key)

    def __setitem__(self, key: Hashable, value: T) -> None:
        self.put(key, value)

    def __delitem__(self, key: Hashable) -> None:
        self.pop(key)

    def touch(self, key: Hashable) -> None:
        self.cache.move_to_end(key)

    def get(self, key: Hashable, default: Optional[T] = None) -> Optional[T]:
        if key in self.cache:
            self.cache.move_to_end(key)
            return self.cache[key]
        return default

    def put(self, key: Hashable, value: T) -> None:
        self.cache[key] = value
        self.cache.move_to_end(key)
        self._remove_old_if_needed()

    def _on_remove(self, key: Hashable, value: T) -> None:
        pass

    def remove_oldest(self) -> None:
        if not self.cache:
            return
        key, value = self.cache.popitem(last=False)
        self._on_remove(key, value)

    def _remove_old_if_needed(self) -> None:
        while len(self.cache) > self.capacity:
            self.remove_oldest()

    def pop(self, key: Hashable, default: Optional[T] = None) -> Optional[T]:
        run_on_remove = key in self.cache
        value = self.cache.pop(key, default)
        if run_on_remove:
            self._on_remove(key, value)
        return value

    def clear(self) -> None:
        while self.cache:
            self.remove_oldest()


def random_uuid() -> str:
    return str(uuid.uuid4().hex)


def get_open_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def make_async(func: Callable[..., T]) -> Callable[..., Awaitable[T]]:
    """Run a blocking function in the default executor."""

    def _async_wrapper(*args, **kwargs) -> asyncio.Future:
        loop = asyncio.get_event_loop()
        p_func = partial(func, *args, **kwargs)
        return loop.run_in_executor(executor=None, func=p_func)

    return _async_wrapper


def merge_dicts(dict1: Dict[Any, List[Any]],
                dict2: Dict[Any, List[Any]]) -> Dict[Any, List[Any]]:
    """Merge two dicts of lists, concatenating values for shared keys."""
    merged: Dict[Any, List[Any]] = {k: list(v) for k, v in dict1.items()}
    for k, v in dict2.items():
        merged.setdefault(k, []).extend(v)
    return merged


def cdiv(a: int, b: int) -> int:
    return -(a // -b)


def round_up(x: int, multiple: int) -> int:
    return cdiv(x, multiple) * multiple


def pad_to_bucket(n: int, buckets: List[int]) -> int:
    """Smallest bucket >= n; buckets must be sorted ascending."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def in_wsl() -> bool:
    return False
