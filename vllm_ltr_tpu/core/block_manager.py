"""Paged KV-cache accounting: block pools + per-sequence tables.

Behavioral counterpart of BOTH reference block managers — the default
vllm/core/block_manager_v1.py (+ the LTR fork's fake allocation,
block_manager_v1.py:268-281,566-570) and the composable v2 stack
(vllm/core/block_manager_v2.py + core/block/prefix_caching_block.py +
core/block/cpu_gpu_block_allocator.py, 1,788 LoC) — built differently:
blocks are plain integers.  All per-block state (refcounts, content
hashes, computed flags, access times) lives in parallel structures inside
a :class:`BlockPool`, one pool per memory tier (device HBM, host swap
mirror — the CpuGpuBlockAllocator split).  v2's content-hash prefix reuse
is :meth:`BlockPool.acquire_hashed` / :meth:`BlockPool.bind_hash`: a full
block's hash chains the previous block's hash with its tokens (exactly
PrefixCachingBlock.content_hash), a hash hit revives the cached block and
bumps its refcount instead of copying.  There are no block objects, no
separate evictor class — prefix-cache eviction is a lazy min-heap over
(last_access, -hashed_tokens) inside the pool (the v1 evictor.py policy).

The executor consumes only integers: per-seq tables ``List[int]`` and the
swap / copy mappings ``Dict[int, int]`` / ``Dict[int, List[int]]``.
"""
from __future__ import annotations

import enum
import heapq
from typing import Dict, List, Optional, Set

from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.sequence import Sequence, SequenceGroup, SequenceStatus
from vllm_ltr_tpu.utils import cdiv

logger = init_logger(__name__)

# Sentinel block id handed out by fake allocation (AUX predictor path).
FAKE_BLOCK = -1


class Tier(str, enum.Enum):
    """Where a sequence's KV pages currently live."""
    DEVICE = "device"
    HOST = "host"
    FAKE = "fake"


class AllocStatus(enum.Enum):
    """Admission verdict for a new prompt.

    OK: fits now.  LATER: will fit once memory frees up.  NEVER: larger
    than the whole cache — abort the request.
    """
    OK = enum.auto()
    LATER = enum.auto()
    NEVER = enum.auto()


class BlockPool:
    """Fixed-size pool of integer block ids for one memory tier.

    Two modes:
    * plain (``caching=False``): a free-stack with refcounts.
    * content-addressed (``caching=True``): blocks may carry a content
      hash; refcount-0 hashed blocks stay resident ("evictable") and can
      be revived by hash until their slot is reclaimed LRU-first.
    """

    def __init__(self, num_blocks: int, caching: bool = False) -> None:
        self.num_blocks = num_blocks
        self.caching = caching
        self._ref = [0] * num_blocks
        # Free stack: never-used or fully-reclaimed ids.
        self._free: List[int] = list(range(num_blocks - 1, -1, -1))
        # Content addressing (caching mode).
        self._hash_of: Dict[int, int] = {}      # block id -> content hash
        self._id_of: Dict[int, int] = {}        # content hash -> block id
        self._hashed_tokens: Dict[int, int] = {}
        self._evictable: Set[int] = set()
        self._lru: List[tuple] = []             # lazy heap of candidates
        # Prefix-caching bookkeeping consumed by the scheduler.
        self.computed: Set[int] = set()
        self.last_access: Dict[int, float] = {}

    # -- capacity -----------------------------------------------------------

    def free_count(self) -> int:
        return len(self._free) + len(self._evictable)

    # -- plain acquisition ---------------------------------------------------

    def acquire(self) -> int:
        """Take one block with refcount 1 (no content identity)."""
        if self._free:
            bid = self._free.pop()
        elif self._evictable:
            bid = self._reclaim_lru()
        else:
            raise ValueError("block pool exhausted")
        self._ref[bid] = 1
        return bid

    def share(self, bid: int) -> None:
        assert self._ref[bid] > 0, f"share of dead block {bid}"
        self._ref[bid] += 1

    def release(self, bid: int) -> None:
        if self._ref[bid] <= 0:
            raise ValueError(f"double free of block {bid}")
        self._ref[bid] -= 1
        if self._ref[bid] > 0:
            return
        if self.caching and bid in self._hash_of:
            # Keep contents resident: revivable by hash until reclaimed.
            self._evictable.add(bid)
            heapq.heappush(self._lru,
                           (self.last_access.get(bid, -1.0),
                            -self._hashed_tokens.get(bid, 0), bid))
        else:
            self._forget(bid)
            self._free.append(bid)

    def _forget(self, bid: int) -> None:
        h = self._hash_of.pop(bid, None)
        if h is not None and self._id_of.get(h) == bid:
            del self._id_of[h]
        self._hashed_tokens.pop(bid, None)
        self.computed.discard(bid)
        self.last_access.pop(bid, None)

    def _reclaim_lru(self) -> int:
        """Pop the least-recently-used evictable block (ties: most hashed
        tokens first), dropping its cached identity."""
        while self._lru:
            access, neg_tokens, bid = heapq.heappop(self._lru)
            if (bid in self._evictable
                    and access == self.last_access.get(bid, -1.0)
                    and -neg_tokens == self._hashed_tokens.get(bid, 0)):
                self._evictable.discard(bid)
                self._forget(bid)
                return bid
        raise ValueError("no evictable block despite nonzero count")

    # -- content addressing --------------------------------------------------

    def find(self, content_hash: int) -> Optional[int]:
        """Block currently holding this content (live or evictable)."""
        return self._id_of.get(content_hash)

    def acquire_hashed(self, content_hash: Optional[int],
                       hashed_tokens: int = 0) -> int:
        """Content-addressed acquisition: share/revive a block with this
        hash if resident, else take a fresh one and bind the hash."""
        if not self.caching or content_hash is None:
            return self.acquire()
        bid = self._id_of.get(content_hash)
        if bid is not None:
            if bid in self._evictable:           # revive
                self._evictable.discard(bid)
                self._ref[bid] = 1
            else:
                self._ref[bid] += 1
            return bid
        bid = self.acquire()
        self.bind_hash(bid, content_hash, hashed_tokens)
        return bid

    def bind_hash(self, bid: int, content_hash: int,
                  hashed_tokens: int) -> None:
        """Give (or replace) a block's content identity."""
        old = self._hash_of.get(bid)
        if old is not None and self._id_of.get(old) == bid:
            del self._id_of[old]
        self._hash_of[bid] = content_hash
        self._hashed_tokens[bid] = hashed_tokens
        # First binder wins; duplicates stay anonymous for lookup purposes.
        self._id_of.setdefault(content_hash, bid)

    def hash_of(self, bid: int) -> Optional[int]:
        return self._hash_of.get(bid)

    def hashed_tokens_of(self, bid: int) -> int:
        return self._hashed_tokens.get(bid, 0)

    def refcount(self, bid: int) -> int:
        return self._ref[bid]

    def touch(self, bid: int, now: float) -> None:
        self.last_access[bid] = now


class BlockSpaceManager:
    """Maps sequences to KV-cache blocks across the device/host tiers.

    Per-seq state is a table of block ids plus the tier the whole table
    lives in (a sequence's pages are always on one tier; swap moves the
    whole table).
    """

    def __init__(
        self,
        block_size: int,
        num_gpu_blocks: int,
        num_cpu_blocks: int,
        watermark: float = 0.01,
        sliding_window: Optional[int] = None,
        enable_caching: bool = False,
    ) -> None:
        if enable_caching and sliding_window is not None:
            raise NotImplementedError(
                "prefix caching and sliding window are mutually exclusive")
        assert watermark >= 0.0

        self.block_size = block_size
        self.enable_caching = enable_caching
        self.watermark_blocks = int(watermark * num_gpu_blocks)
        self.num_total_gpu_blocks = num_gpu_blocks

        self.window_blocks: Optional[int] = None
        if sliding_window is not None:
            assert sliding_window % block_size == 0
            self.window_blocks = sliding_window // block_size

        self.device_pool = BlockPool(num_gpu_blocks, caching=enable_caching)
        self.host_pool = BlockPool(num_cpu_blocks, caching=enable_caching)
        if enable_caching:
            logger.info("prefix caching enabled (%d device blocks)",
                        num_gpu_blocks)

        # seq_id -> table of block ids, and the tier that table lives in.
        self.block_tables: Dict[int, List[int]] = {}
        self._tier: Dict[int, Tier] = {}

    # -- helpers --------------------------------------------------------------

    def _pool(self, tier: Tier) -> BlockPool:
        return self.device_pool if tier is Tier.DEVICE else self.host_pool

    def _blocks_needed(self, seq: Sequence) -> int:
        n = seq.num_blocks()
        if self.window_blocks is not None:
            n = min(n, self.window_blocks)
        return n

    def _group_block_ids(self, group: SequenceGroup) -> List[int]:
        """Unique resident block ids across the group's unfinished seqs."""
        ids: Set[int] = set()
        for seq in group.get_seqs():
            if not seq.is_finished():
                ids.update(self.block_tables[seq.seq_id])
        return list(ids)

    # Reference-named shim used by external callers.
    def _get_physical_blocks(self, group: SequenceGroup) -> List[int]:
        return self._group_block_ids(group)

    # -- admission -------------------------------------------------------------

    def can_allocate(self, group: SequenceGroup) -> AllocStatus:
        seq = group.get_seqs(status=SequenceStatus.WAITING)[0]
        need = self._blocks_needed(seq)
        if self.num_total_gpu_blocks - need < self.watermark_blocks:
            return AllocStatus.NEVER
        if self.device_pool.free_count() - need >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def allocate(self, group: SequenceGroup) -> int:
        """Build the prompt's block table; returns the number of leading
        prompt TOKENS whose KV is already resident and computed (prefix
        cache hits — the reference slices these off the prefill instead of
        recomputing them, vllm/worker/model_runner.py:314-342).  The final
        block is never counted so the executor always has at least one
        fresh token to run (and a position to sample from)."""
        waiting = group.get_seqs(status=SequenceStatus.WAITING)
        lead = waiting[0]  # all streams share the prompt
        fanout = group.num_seqs()

        table: List[int] = []
        cached_blocks = 0
        prefix_intact = True
        last = lead.num_blocks() - 1
        for idx in range(lead.num_blocks()):
            if (self.window_blocks is not None
                    and idx >= self.window_blocks):
                # Ring reuse: positions beyond the window alias earlier ids.
                bid = table[idx % self.window_blocks]
                self.device_pool._ref[bid] = fanout
            elif self.enable_caching:
                bid = self.device_pool.acquire_hashed(
                    lead.content_key(idx + 1), (idx + 1) * self.block_size)
                # A hit only skips compute if the block's KV is actually
                # written (``computed``) — a block shared from a request
                # admitted in this same pass isn't, and gets re-written
                # by this prompt's prefill exactly as before.
                if (prefix_intact and idx < last
                        and bid in self.device_pool.computed):
                    cached_blocks += 1
                else:
                    prefix_intact = False
            else:
                bid = self.device_pool.acquire()
                self.device_pool._ref[bid] = fanout
            table.append(bid)

        for seq in waiting:
            self.block_tables[seq.seq_id] = list(table)
            self._tier[seq.seq_id] = Tier.DEVICE
        return cached_blocks * self.block_size

    def fake_allocate(self, group: SequenceGroup) -> None:
        """AUX predictor path: a table of sentinels, no real blocks, so the
        model runs with KV writes disabled (ref block_manager_v1.py:268)."""
        for seq in group.get_seqs(status=SequenceStatus.WAITING):
            self.block_tables[seq.seq_id] = [FAKE_BLOCK] * seq.num_blocks()
            self._tier[seq.seq_id] = Tier.FAKE

    def get_fake_block_table_and_delete(self, seq: Sequence) -> List[int]:
        table = self.block_tables.pop(seq.seq_id)
        self._tier.pop(seq.seq_id, None)
        return [FAKE_BLOCK] * len(table)

    # -- decode growth -----------------------------------------------------------

    def can_append_slots(self, group: SequenceGroup,
                         num_lookahead_slots: int = 0) -> bool:
        per_seq = 1 + num_lookahead_slots // self.block_size
        running = group.num_seqs(status=SequenceStatus.RUNNING)
        return running * per_seq <= self.device_pool.free_count()

    def append_slots(self, seq: Sequence,
                     num_lookahead_slots: int = 0) -> Dict[int, List[int]]:
        """Ensure the table covers the sequence's next token(s); returns the
        copy-on-write map {src_block: [dst_block, ...]} (empty if none)."""
        table = self.block_tables[seq.seq_id]
        logical = seq.num_blocks()
        target = max(logical,
                     cdiv(seq.get_len() + num_lookahead_slots,
                          self.block_size))

        if len(table) < target:
            while len(table) < target:
                if (self.window_blocks is not None
                        and len(table) >= self.window_blocks):
                    table.append(table[len(table) % self.window_blocks])
                else:
                    table.append(self._acquire_tail_block(seq))
            # The next write lands in a freshly-acquired block; no CoW.
            return {}

        tail = table[-1]
        if self.device_pool.refcount(tail) == 1:
            if self.enable_caching and self._tail_is_full(seq):
                table[-1] = self._publish_tail(seq, tail)
            return {}
        # Shared tail: copy-on-write.
        fresh = self._acquire_tail_block(seq)
        table[-1] = fresh
        self.device_pool.release(tail)
        return {tail: [fresh]}

    def _tail_is_full(self, seq: Sequence) -> bool:
        n = seq.get_len()
        return n > 0 and n % self.block_size == 0

    def _acquire_tail_block(self, seq: Sequence) -> int:
        """New device block for the sequence's tail; content-addressed when
        the tail is already full (caching mode)."""
        if not self.enable_caching:
            return self.device_pool.acquire()
        nb = seq.num_blocks()
        if self._tail_is_full(seq):
            return self.device_pool.acquire_hashed(seq.content_key(nb),
                                                   nb * self.block_size)
        bid = self.device_pool.acquire()
        return bid

    def _publish_tail(self, seq: Sequence, tail: int) -> int:
        """The tail block just filled up: give it a content identity so
        later prompts can share it.  If an identical block already exists,
        adopt that one instead."""
        nb = seq.num_blocks()
        key = seq.content_key(nb)
        existing = self.device_pool.find(key)
        if existing is not None and existing != tail:
            self.device_pool.release(tail)
            return self.device_pool.acquire_hashed(key)
        self.device_pool.bind_hash(tail, key, nb * self.block_size)
        return tail

    def fork(self, parent: Sequence, child: Sequence) -> None:
        if parent.seq_id not in self.block_tables:
            return  # never allocated (or already freed)
        table = self.block_tables[parent.seq_id]
        self.block_tables[child.seq_id] = list(table)
        self._tier[child.seq_id] = self._tier[parent.seq_id]
        pool = self._pool(self._tier[parent.seq_id])
        # Sliding-window tables repeat ids; each unique block gains one ref.
        for bid in set(table):
            pool.share(bid)

    # -- swap -----------------------------------------------------------------------

    def can_swap_in(self, group: SequenceGroup,
                    num_lookahead_slots: int = 0) -> bool:
        resident = len(self._group_block_ids(group))
        growth = group.num_seqs(status=SequenceStatus.SWAPPED)
        return (self.device_pool.free_count() - resident - growth
                >= self.watermark_blocks)

    def can_swap_out(self, group: SequenceGroup) -> bool:
        return (len(self._group_block_ids(group))
                <= self.host_pool.free_count())

    def _migrate(self, group: SequenceGroup, status: SequenceStatus,
                 src: BlockPool, dst: BlockPool,
                 dst_tier: Tier) -> Dict[int, int]:
        """Move every table of the group's ``status`` seqs from ``src`` to
        ``dst``; returns {src_block: dst_block} for the data copy."""
        moved: Dict[int, int] = {}
        for seq in group.get_seqs(status=status):
            old_table = self.block_tables[seq.seq_id]
            new_table: List[int] = []
            for bid in old_table:
                if bid in moved:
                    nid = moved[bid]
                    dst.share(nid)
                else:
                    nid = dst.acquire_hashed(src.hash_of(bid),
                                             src.hashed_tokens_of(bid))
                    moved[bid] = nid
                new_table.append(nid)
                src.release(bid)
            self.block_tables[seq.seq_id] = new_table
            self._tier[seq.seq_id] = dst_tier
        return moved

    def swap_in(self, group: SequenceGroup) -> Dict[int, int]:
        return self._migrate(group, SequenceStatus.SWAPPED,
                             self.host_pool, self.device_pool, Tier.DEVICE)

    def swap_out(self, group: SequenceGroup) -> Dict[int, int]:
        return self._migrate(group, SequenceStatus.RUNNING,
                             self.device_pool, self.host_pool, Tier.HOST)

    # -- release ----------------------------------------------------------------------

    def free(self, seq: Sequence) -> None:
        table = self.block_tables.pop(seq.seq_id, None)
        if table is None:
            return
        tier = self._tier.pop(seq.seq_id)
        if tier is Tier.FAKE:
            return
        pool = self._pool(tier)
        # Ring-reused (sliding window) tables repeat ids: release once each.
        live = (table[-self.window_blocks:]
                if self.window_blocks is not None else table)
        for bid in set(live):
            pool.release(bid)

    def reset(self) -> None:
        for seq_id in list(self.block_tables):
            table = self.block_tables.pop(seq_id)
            tier = self._tier.pop(seq_id)
            if tier is Tier.FAKE:
                continue
            pool = self._pool(tier)
            live = (table[-self.window_blocks:]
                    if self.window_blocks is not None else table)
            for bid in set(live):
                pool.release(bid)

    # -- queries ------------------------------------------------------------------------

    def get_block_table(self, seq: Sequence) -> List[int]:
        return list(self.block_tables[seq.seq_id])

    def get_num_free_gpu_blocks(self) -> int:
        return self.device_pool.free_count()

    def get_num_free_cpu_blocks(self) -> int:
        return self.host_pool.free_count()

    # -- prefix-caching bookkeeping ----------------------------------------------------

    def access_all_blocks_in_seq(self, seq: Sequence, now: float) -> None:
        if not self.enable_caching:
            return
        for bid in self.block_tables[seq.seq_id]:
            self.device_pool.touch(bid, now)

    def mark_blocks_as_computed(self, group: SequenceGroup) -> None:
        if not self.enable_caching:
            return
        for seq in group.get_seqs():
            table = self.block_tables.get(seq.seq_id)
            if not table:
                continue
            # All *strictly interior* full blocks become computed; walk from
            # the back and stop at the first already-computed block.
            last_full = seq.get_len() // self.block_size - 1
            for i in reversed(range(max(last_full, 0))):
                if table[i] in self.device_pool.computed:
                    break
                self.device_pool.computed.add(table[i])

    def _computed_prefix(self, seq: Sequence) -> List[int]:
        table = self.block_tables.get(seq.seq_id)
        if not table:
            return []
        out: List[int] = []
        # Skip the final entry so a fully-cached prompt still computes its
        # last block (the executor needs at least one fresh token).
        for bid in table[:-1]:
            if bid not in self.device_pool.computed:
                break
            out.append(bid)
        return out

    def get_common_computed_block_ids(
            self, seqs: List[Sequence]) -> List[int]:
        if not self.enable_caching:
            return []
        prefixes = [p for p in map(self._computed_prefix, seqs) if p]
        if not prefixes:
            return []
        common: List[int] = []
        for column in zip(*prefixes):
            if any(c != column[0] for c in column):
                break
            common.append(column[0])
        return common
