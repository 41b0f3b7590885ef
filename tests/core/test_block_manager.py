"""Block pool + block-space manager unit tests (no model, no device).

Covers the reference block-manager behaviors (vllm/core/block_manager_v1.py
+ the v2 content-hash allocator): watermark admission, slot appends, CoW
forks, swap round-trips, LRU prefix reuse, fake allocation, reset.
"""
import pytest

from vllm_ltr_tpu.core.block_manager import (AllocStatus, BlockPool,
                                             BlockSpaceManager)
from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.sequence import Logprob, SequenceGroup, SequenceStatus

from .utils import create_dummy_prompt

BS = 4  # block size used throughout


def make_bm(gpu=4, cpu=4, watermark=0.0, **kw) -> BlockSpaceManager:
    return BlockSpaceManager(BS, gpu, cpu, watermark=watermark, **kw)


def grow(seq, n, start=5):
    for t in range(start, start + n):
        seq.append_token_id(t, {t: Logprob(0.0)})


# ---------------------------------------------------------------------------
# BlockPool
# ---------------------------------------------------------------------------


def test_pool_exhaustion_and_uniqueness():
    pool = BlockPool(4)
    handed_out = {pool.acquire() for _ in range(4)}
    assert len(handed_out) == 4
    assert pool.free_count() == 0
    with pytest.raises(ValueError):
        pool.acquire()


def test_pool_release_and_double_free():
    pool = BlockPool(4)
    ids = [pool.acquire() for _ in range(4)]
    for bid in ids:
        pool.release(bid)
    assert pool.free_count() == 4
    with pytest.raises(ValueError):
        pool.release(ids[0])


def test_pool_content_hash_revival_and_lru_eviction():
    """Cached pool: refcount-0 hashed blocks are revivable by hash until
    their slot is reclaimed LRU-first."""
    pool = BlockPool(2, caching=True)
    a = pool.acquire_hashed(111, hashed_tokens=4)
    b = pool.acquire_hashed(222, hashed_tokens=4)
    assert pool.free_count() == 0
    pool.touch(a, 1.0)
    pool.touch(b, 2.0)
    pool.release(a)
    pool.release(b)
    # Both resident + evictable: a hash lookup revives without copying.
    assert pool.free_count() == 2
    assert pool.acquire_hashed(111) == a
    # A fresh (hashless) acquisition reclaims the LRU victim (b).
    assert pool.acquire() == b
    assert pool.find(222) is None


# ---------------------------------------------------------------------------
# Allocation + watermark
# ---------------------------------------------------------------------------


def test_allocate_until_full():
    bm = make_bm(watermark=0)
    group = None
    for i in range(4):  # each 1-block prompt takes one of the 4 gpu blocks
        _, group = create_dummy_prompt(str(i), BS)
        assert bm.can_allocate(group) == AllocStatus.OK
        bm.allocate(group)
    assert bm.can_allocate(group) != AllocStatus.OK


def test_watermark_defers_or_rejects():
    bm = make_bm(gpu=4, cpu=0, watermark=0.5)  # 2 blocks held back
    _, big = create_dummy_prompt("1", BS * 2, block_size=BS)
    assert bm.can_allocate(big) == AllocStatus.OK
    bm.allocate(big)
    # One block left above the watermark -> a 1-block prompt must wait...
    _, waiting = create_dummy_prompt("2", BS, block_size=BS)
    assert bm.can_allocate(waiting) == AllocStatus.LATER
    # ...and a prompt bigger than the whole pool can never run.
    _, huge = create_dummy_prompt("3", BS * 3, block_size=BS)
    assert bm.can_allocate(huge) == AllocStatus.NEVER


# ---------------------------------------------------------------------------
# Decode growth (append_slots) + copy-on-write
# ---------------------------------------------------------------------------


def test_append_within_block_then_new_block():
    bm = make_bm(watermark=0)
    seq, group = create_dummy_prompt("1", BS)
    bm.allocate(group)

    # No new logical block yet: appending costs nothing.
    assert bm.can_append_slots(group)
    free0 = bm.get_num_free_gpu_blocks()
    assert not bm.append_slots(seq)
    assert bm.get_num_free_gpu_blocks() == free0

    # A full block of fresh tokens crosses the boundary: exactly one new
    # physical block is consumed.
    grow(seq, BS)
    assert bm.can_append_slots(group)
    assert not bm.append_slots(seq)
    assert free0 - bm.get_num_free_gpu_blocks() == 1


def test_fork_append_triggers_cow():
    bm = make_bm(watermark=0)
    # Parent leaves one slot open in its last block; the fork shares it.
    parent = create_dummy_prompt("1", BS - 1, block_size=BS)[0]
    child = parent.fork(new_seq_id=2)
    grow(child, 1)
    family = SequenceGroup(request_id="1", seqs=[parent, child],
                           sampling_params=SamplingParams(),
                           arrival_time=0.0)
    bm.allocate(family)

    free0 = bm.get_num_free_gpu_blocks()
    cow_map = bm.append_slots(child)
    assert cow_map, "shared last block must copy-on-write"
    assert all(src != dst[0] for src, dst in cow_map.items())
    assert free0 - bm.get_num_free_gpu_blocks() == 1


# ---------------------------------------------------------------------------
# Swap out / swap in
# ---------------------------------------------------------------------------


def test_swap_round_trip_moves_every_block():
    bm = make_bm(watermark=0)
    seq, group = create_dummy_prompt("1", prompt_length=BS - 1)
    seq.status = SequenceStatus.WAITING
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    grow(seq, 1)  # one generated token, so swap has unprocessed state

    device_table = bm.get_block_table(seq)
    assert bm.can_swap_out(group)
    free_cpu0, free_gpu0 = (bm.get_num_free_cpu_blocks(),
                            bm.get_num_free_gpu_blocks())
    out_map = bm.swap_out(group)
    assert list(out_map) == device_table
    assert free_cpu0 - bm.get_num_free_cpu_blocks() == len(device_table)
    assert bm.get_num_free_gpu_blocks() - free_gpu0 == len(device_table)
    seq.status = SequenceStatus.SWAPPED

    host_table = bm.get_block_table(seq)
    assert bm.can_swap_in(group)
    free_cpu1, free_gpu1 = (bm.get_num_free_cpu_blocks(),
                            bm.get_num_free_gpu_blocks())
    in_map = bm.swap_in(group)
    assert list(in_map) == host_table
    assert bm.get_num_free_cpu_blocks() - free_cpu1 == len(host_table)
    assert free_gpu1 - bm.get_num_free_gpu_blocks() == len(host_table)


# ---------------------------------------------------------------------------
# Free / fake-allocate / reset
# ---------------------------------------------------------------------------


def test_free_returns_blocks_and_forgets_table():
    bm = make_bm(watermark=0)
    seq, group = create_dummy_prompt("1", BS)
    bm.allocate(group)
    owned = len(bm.get_block_table(seq))
    free0 = bm.get_num_free_gpu_blocks()
    bm.free(seq)
    assert bm.get_num_free_gpu_blocks() == free0 + owned
    with pytest.raises(KeyError):
        bm.get_block_table(seq)


def test_fake_allocate_is_blockless():
    """LTR AUX path: fake allocation never touches real blocks."""
    bm = make_bm(gpu=0, cpu=0, watermark=0)
    seq, group = create_dummy_prompt("1", 3 * BS, block_size=BS)
    bm.fake_allocate(group)
    assert bm.get_fake_block_table_and_delete(seq) == [-1, -1, -1]
    assert seq.seq_id not in bm.block_tables


def test_reset_reclaims_everything():
    bm = make_bm(watermark=0)
    capacity = bm.get_num_free_gpu_blocks()
    for i in range(4):
        bm.allocate(create_dummy_prompt(str(i), BS)[1])
    assert bm.get_num_free_gpu_blocks() == 0
    bm.reset()
    assert bm.get_num_free_gpu_blocks() == capacity
