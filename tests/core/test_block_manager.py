"""Block manager unit tests (style follows reference tests/core/test_block_manager.py)."""
import pytest

from vllm_ltr_tpu.core.block_manager import (AllocStatus, BlockPool,
                                             BlockSpaceManager)
from vllm_ltr_tpu.sequence import Logprob, SequenceStatus

from .utils import create_dummy_prompt


def test_block_pool_acquire():
    pool = BlockPool(4)

    num_free = 4
    assert pool.free_count() == num_free
    taken = set()
    for _ in range(4):
        bid = pool.acquire()
        num_free -= 1
        assert bid not in taken
        taken.add(bid)
        assert pool.free_count() == num_free

    with pytest.raises(ValueError):
        pool.acquire()


def test_block_pool_release():
    pool = BlockPool(4)

    blocks = [pool.acquire() for _ in range(4)]
    for bid in blocks:
        pool.release(bid)

    assert pool.free_count() == 4
    # Double free raises.
    with pytest.raises(ValueError):
        pool.release(blocks[0])


def test_block_pool_content_reuse():
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
    a2 = pool.acquire_hashed(111)
    assert a2 == a
    # A fresh (hashless) acquisition reclaims the LRU victim (b).
    c = pool.acquire()
    assert c == b
    assert pool.find(222) is None


def test_allocate():
    block_size = 4
    num_cpu_blocks = 4
    num_gpu_blocks = 4
    block_manager = BlockSpaceManager(block_size,
                                      num_gpu_blocks,
                                      num_cpu_blocks,
                                      watermark=0)

    # Allocate same sequence group to all available gpu blocks.
    for i in range(num_gpu_blocks):
        _, seq_group = create_dummy_prompt(str(i), block_size)
        assert block_manager.can_allocate(seq_group) == AllocStatus.OK
        block_manager.allocate(seq_group)
    assert block_manager.can_allocate(seq_group) != AllocStatus.OK


def test_allocate_watermark():
    block_size = 4
    block_manager = BlockSpaceManager(block_size,
                                      num_gpu_blocks=4,
                                      num_cpu_blocks=0,
                                      watermark=0.5)
    # 2 watermark blocks: a 3-block prompt must wait, NEVER if over capacity.
    _, g1 = create_dummy_prompt("1", block_size * 2, block_size=block_size)
    assert block_manager.can_allocate(g1) == AllocStatus.OK
    block_manager.allocate(g1)
    _, g2 = create_dummy_prompt("2", block_size, block_size=block_size)
    assert block_manager.can_allocate(g2) == AllocStatus.LATER
    _, g3 = create_dummy_prompt("3", block_size * 3, block_size=block_size)
    assert block_manager.can_allocate(g3) == AllocStatus.NEVER


def test_append_slot_single_seq():
    block_size = 4
    num_cpu_blocks = 4
    num_gpu_blocks = 4
    block_manager = BlockSpaceManager(block_size,
                                      num_gpu_blocks,
                                      num_cpu_blocks,
                                      watermark=0)

    # Allocate single seq to gpu block.
    prompt, seq_group = create_dummy_prompt("1", block_size)
    block_manager.allocate(seq_group)

    # Nothing to append. Sequence has no new logical blocks.
    assert block_manager.can_append_slots(seq_group)
    before_blocks = block_manager.get_num_free_gpu_blocks()
    assert not block_manager.append_slots(prompt)
    after_blocks = block_manager.get_num_free_gpu_blocks()
    assert before_blocks == after_blocks

    # Add block_size number of new tokens and append slot.
    for i in range(block_size):
        token_id = i + 5
        prompt.append_token_id(token_id, {token_id: Logprob(0.0)})

    assert block_manager.can_append_slots(seq_group)
    before_blocks = block_manager.get_num_free_gpu_blocks()
    assert not block_manager.append_slots(prompt)
    after_blocks = block_manager.get_num_free_gpu_blocks()
    assert before_blocks - after_blocks == 1


def test_append_slot_cow():
    block_size = 4
    block_manager = BlockSpaceManager(block_size=block_size,
                                      num_cpu_blocks=4,
                                      num_gpu_blocks=4,
                                      watermark=0)

    # Allocate prompt to gpu block. There is one slot left in the block.
    prompt = create_dummy_prompt("1", block_size - 1,
                                 block_size=block_size)[0]

    # Fork the sequence: the child shares the parent's physical block.
    child = prompt.fork(new_seq_id=2)
    token_id = 4
    child.append_token_id(token_id, {token_id: Logprob(0.0)})
    from vllm_ltr_tpu.sampling_params import SamplingParams
    from vllm_ltr_tpu.sequence import SequenceGroup
    seq_group = SequenceGroup(request_id="1",
                              seqs=[prompt, child],
                              sampling_params=SamplingParams(),
                              arrival_time=0.0)
    block_manager.allocate(seq_group)

    # Append a token to the child; the shared block triggers copy-on-write.
    free_blocks_before = block_manager.get_num_free_gpu_blocks()
    cows = block_manager.append_slots(child)
    assert cows
    for src, dsts in cows.items():
        assert src != dsts[0]
    free_blocks_after = block_manager.get_num_free_gpu_blocks()
    assert free_blocks_before - free_blocks_after == 1


def test_swap():
    block_size = 4
    block_manager = BlockSpaceManager(block_size,
                                      num_cpu_blocks=4,
                                      num_gpu_blocks=4,
                                      watermark=0)

    prompt, seq_group = create_dummy_prompt("1", prompt_length=block_size - 1)
    prompt.status = SequenceStatus.WAITING
    block_manager.allocate(seq_group)

    # Emulate a forward pass by appending a single token.
    # The block manager then knows how many unprocessed tokens will be written
    # in the next forward pass.
    token_id = 0
    prompt.status = SequenceStatus.RUNNING
    prompt.append_token_id(token_id, {token_id: Logprob(0.0)})

    # Swap seq group from GPU -> CPU.
    gpu_blocks = block_manager.get_block_table(prompt)
    assert block_manager.can_swap_out(seq_group)
    before_cpu_blocks = block_manager.get_num_free_cpu_blocks()
    before_gpu_blocks = block_manager.get_num_free_gpu_blocks()
    mapping = block_manager.swap_out(seq_group)
    assert list(mapping.keys()) == gpu_blocks
    after_cpu_blocks = block_manager.get_num_free_cpu_blocks()
    after_gpu_blocks = block_manager.get_num_free_gpu_blocks()
    assert before_cpu_blocks == after_cpu_blocks + len(gpu_blocks)
    assert after_gpu_blocks == before_gpu_blocks + len(gpu_blocks)
    prompt.status = SequenceStatus.SWAPPED

    # Swap seq group from CPU -> GPU.
    cpu_blocks = block_manager.get_block_table(prompt)
    assert block_manager.can_swap_in(seq_group)
    before_cpu_blocks = block_manager.get_num_free_cpu_blocks()
    before_gpu_blocks = block_manager.get_num_free_gpu_blocks()
    mapping = block_manager.swap_in(seq_group)
    assert list(mapping.keys()) == cpu_blocks
    after_cpu_blocks = block_manager.get_num_free_cpu_blocks()
    after_gpu_blocks = block_manager.get_num_free_gpu_blocks()
    assert after_cpu_blocks == before_cpu_blocks + len(cpu_blocks)
    assert before_gpu_blocks == after_gpu_blocks + len(cpu_blocks)


def test_free():
    block_size = 4
    block_manager = BlockSpaceManager(block_size,
                                      num_cpu_blocks=4,
                                      num_gpu_blocks=4,
                                      watermark=0)

    prompt, seq_group = create_dummy_prompt("1", block_size)
    block_manager.allocate(seq_group)

    # Free allocated seq.
    prompt_blocks = len(block_manager.get_block_table(prompt))
    before_blocks = block_manager.get_num_free_gpu_blocks()
    block_manager.free(prompt)
    after_blocks = block_manager.get_num_free_gpu_blocks()
    assert after_blocks == before_blocks + prompt_blocks

    # Block table for freed seq is deleted.
    with pytest.raises(KeyError):
        block_manager.get_block_table(prompt)


def test_fake_allocate():
    """LTR AUX path: fake allocation never touches real blocks."""
    block_size = 4
    block_manager = BlockSpaceManager(block_size,
                                      num_cpu_blocks=0,
                                      num_gpu_blocks=0,
                                      watermark=0)
    prompt, seq_group = create_dummy_prompt("1", 3 * block_size,
                                            block_size=block_size)
    block_manager.fake_allocate(seq_group)
    table = block_manager.get_fake_block_table_and_delete(prompt)
    assert table == [-1, -1, -1]
    assert prompt.seq_id not in block_manager.block_tables


def test_reset():
    block_size = 4
    block_manager = BlockSpaceManager(block_size,
                                      num_cpu_blocks=4,
                                      num_gpu_blocks=4,
                                      watermark=0)

    # Allocate same seq group on all available gpu blocks.
    original_blocks = block_manager.get_num_free_gpu_blocks()
    for i in range(4):
        _, seq_group = create_dummy_prompt(str(i), block_size)
        block_manager.allocate(seq_group)
    assert block_manager.get_num_free_gpu_blocks() == 0

    # Resetting block manager frees all allocated blocks.
    block_manager.reset()
    assert block_manager.get_num_free_gpu_blocks() == original_blocks
