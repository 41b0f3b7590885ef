"""Page-granular prefill KV write (ops/kv_cache.py write_kv_pages) must be
bit-identical to the per-token scatter on the slots that matter, and
prepare_batch must derive a valid page map exactly when the layout allows.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from vllm_ltr_tpu.ops.kv_cache import (allocate_kv_cache, write_kv,
                                       write_kv_pages)

L, KH, D, BS = 2, 2, 8, 4  # layers, kv heads, head_dim, block_size
NB = 8  # blocks (+1 trash allocated by helper)


def make_cache():
    return allocate_kv_cache(L, NB, BS, KH, D, jnp.float32)


def page_dst_from_slots(slot_mapping, block_size):
    """Mirror of prepare_batch's host-side derivation."""
    T = len(slot_mapping)
    valid = slot_mapping >= 0
    t_idx = np.arange(T, dtype=np.int32)
    assert np.array_equal(slot_mapping[valid] % block_size,
                          t_idx[valid] % block_size)
    P = T // block_size
    blk = np.where(valid, slot_mapping // block_size, -1).reshape(
        P, block_size)
    mx = blk.max(axis=1)
    assert np.all((blk == mx[:, None]) | (blk < 0))
    return np.where(mx >= 0, mx,
                    (1 << 28) + np.arange(P, dtype=np.int32)).astype(
                        np.int32)


def test_page_write_matches_token_scatter():
    rng = np.random.RandomState(0)
    T = 16  # two seqs: 4-token run at pages 0..., 7-token run
    slot_mapping = np.full(T, -1, np.int32)
    # seq A: 4 tokens -> block 2 (slots 8..11)
    slot_mapping[0:4] = np.arange(4) + 2 * BS
    # seq B at flat offset 4 (page-aligned): 7 tokens -> blocks 5, 6
    slot_mapping[4:11] = np.arange(7) + 5 * BS
    k = jnp.asarray(rng.randn(T, KH, D), jnp.float32)
    v = jnp.asarray(rng.randn(T, KH, D), jnp.float32)

    ref = make_cache()
    got = make_cache()
    for layer in range(L):
        ref = write_kv(ref, layer, k, v, jnp.asarray(slot_mapping))
        got = write_kv_pages(got, layer, k, v,
                             jnp.asarray(page_dst_from_slots(
                                 slot_mapping, BS)))

    ref_np, got_np = np.asarray(ref), np.asarray(got)
    # Every written slot matches exactly.
    for t in range(T):
        s = slot_mapping[t]
        if s < 0:
            continue
        b, off = s // BS, s % BS
        np.testing.assert_array_equal(got_np[:, b, :, :, off],
                                      ref_np[:, b, :, :, off])
    # Untouched blocks stay zero (padding pages dropped, not written).
    for b in (0, 1, 3, 4, 7):
        assert not got_np[:, b].any()
    # Slots past a run inside a written page may hold garbage by design
    # (never read before decode overwrites them) — so no assertion there.


def test_prepare_batch_emits_page_dst_when_aligned():
    from vllm_ltr_tpu import SamplingParams
    from vllm_ltr_tpu.executor.input_batch import prepare_batch
    from vllm_ltr_tpu.sequence import Sequence, SequenceGroupMetadata

    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)

    def prompt_meta(rid, n_tokens, blocks):
        seq = Sequence(rid, None, [1] * n_tokens, BS)
        return SequenceGroupMetadata(
            request_id=str(rid), is_prompt=True, seq_data={rid: seq},
            sampling_params=sp, block_tables={rid: blocks})

    metas = [prompt_meta(0, 6, [2, 3]), prompt_meta(1, 4, [5])]
    batch = prepare_batch(metas, BS, 4, [8, 16, 32], [8], 128,
                          prefill_tile=8)
    assert batch.prefill_aligned and batch.page_dst is not None
    P = len(batch.tokens) // BS
    assert len(batch.page_dst) == P
    # seq 0: pages 0,1 -> blocks 2,3 ; seq 1 at flat 8 -> block 5.
    assert list(batch.page_dst[:3]) == [2, 3, 5]
    assert all(p >= (1 << 28) for p in batch.page_dst[3:])
    assert len(set(batch.page_dst)) == P  # unique_indices promise

    # Decode batches never take the page path.
    for m in metas:
        m2 = m
    seq = Sequence(7, None, [1] * (BS - 1), BS)
    seq.update_num_computed_tokens(BS - 1)
    from vllm_ltr_tpu.sequence import Logprob
    seq.append_token_id(1, {1: Logprob(0.0)})
    dmeta = SequenceGroupMetadata(request_id="d", is_prompt=False,
                                  seq_data={7: seq}, sampling_params=sp,
                                  block_tables={7: [1]})
    dbatch = prepare_batch([dmeta], BS, 4, [8, 16, 32], [8], 128)
    assert dbatch.page_dst is None


def test_prepare_batch_falls_back_when_misaligned():
    """A chunk continuation starting off a page boundary must fall back
    to the token scatter (slot offset != flat offset mod block_size)."""
    from vllm_ltr_tpu import SamplingParams
    from vllm_ltr_tpu.executor.input_batch import prepare_batch
    from vllm_ltr_tpu.sequence import Sequence, SequenceGroupMetadata

    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    seq = Sequence(0, None, [1] * 10, BS)
    seq.update_num_computed_tokens(2)  # resume mid-page: slots 2..9
    meta = SequenceGroupMetadata(
        request_id="0", is_prompt=True, seq_data={0: seq},
        sampling_params=sp, block_tables={0: [2, 3, 4]},
        token_chunk_size=8)
    batch = prepare_batch([meta], BS, 4, [8, 16, 32], [8], 128,
                          prefill_tile=8)
    assert batch.page_dst is None
