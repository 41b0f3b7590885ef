"""Eviction policies for cached (prefix-sharing) KV blocks.

Counterpart of reference ``vllm/core/evictor.py``.
"""
from __future__ import annotations

import enum
from abc import ABC, abstractmethod
from typing import Dict

from vllm_ltr_tpu.core.block import PhysicalTokenBlock


class EvictionPolicy(enum.Enum):
    LRU = enum.auto()


class Evictor(ABC):

    @abstractmethod
    def __contains__(self, block_hash: int) -> bool:
        ...

    @abstractmethod
    def evict(self) -> PhysicalTokenBlock:
        """Runs the eviction algorithm and returns the evicted block."""
        ...

    @abstractmethod
    def add(self, block: PhysicalTokenBlock):
        """Adds a block to the evictor (block with ref_count == 0)."""
        ...

    @abstractmethod
    def remove(self, block_hash: int) -> PhysicalTokenBlock:
        """Remove a block by hash (it is being reused)."""
        ...

    @property
    @abstractmethod
    def num_blocks(self) -> int:
        ...


class LRUEvictor(Evictor):
    """Evicts the least-recently-used free block; ties broken by the highest
    num_hashed_tokens (most content, cheapest to recompute elsewhere)."""

    def __init__(self):
        self.free_table: Dict[int, PhysicalTokenBlock] = {}

    def __contains__(self, block_hash: int) -> bool:
        return block_hash in self.free_table

    def evict(self) -> PhysicalTokenBlock:
        if len(self.free_table) == 0:
            raise ValueError("No usable cache memory left")

        evicted_block = next(iter(self.free_table.values()))
        for _, block in self.free_table.items():
            if evicted_block.last_accessed < block.last_accessed:
                continue
            if (evicted_block.last_accessed > block.last_accessed or
                    evicted_block.num_hashed_tokens < block.num_hashed_tokens):
                evicted_block = block

        del self.free_table[evicted_block.block_hash]
        evicted_block.computed = False
        return evicted_block

    def add(self, block: PhysicalTokenBlock):
        self.free_table[block.block_hash] = block

    def remove(self, block_hash: int) -> PhysicalTokenBlock:
        if block_hash not in self.free_table:
            raise ValueError(
                "Attempting to remove block that's not in the evictor")
        block = self.free_table[block_hash]
        del self.free_table[block_hash]
        return block

    @property
    def num_blocks(self) -> int:
        return len(self.free_table)


def make_evictor(eviction_policy: EvictionPolicy) -> Evictor:
    if eviction_policy == EvictionPolicy.LRU:
        return LRUEvictor()
    raise ValueError(f"Unknown cache eviction policy: {eviction_policy}")
