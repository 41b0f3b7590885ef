"""Fused Pallas decode kernel (KV write + paged attention in one kernel)
vs the XLA reference (the reference repo's per-kernel CUDA-vs-torch
comparison pattern, tests/kernels/). Runs in interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_ltr_tpu.ops.attention import (alibi_slopes,
                                        paged_attention_decode_reference)
from vllm_ltr_tpu.ops.kv_cache import write_kv
from vllm_ltr_tpu.ops.pallas.fused_decode import fused_decode_attention

BLOCK = 16
LAYERS = 3


def build_case(S, QH, KH, D, max_blocks, seed=0, dtype=jnp.float32,
               seq_lens=None):
    """Returns (q, kv_new, cache, block_tables, seq_lens, slot_mapping).

    seq_lens INCLUDE the new token; slot_mapping points at its slot in the
    last logical page. The cache row at that slot is garbage the kernel
    must overwrite.
    """
    rng = np.random.RandomState(seed)
    N = S * max_blocks
    cache = rng.normal(size=(LAYERS, N + 1, 2, KH, BLOCK, D)).astype(
        np.float32)
    q = rng.normal(size=(S, QH, D)).astype(np.float32)
    kv_new = rng.normal(size=(S, 2, KH, D)).astype(np.float32)
    perm = rng.permutation(N)
    block_tables = perm[:S * max_blocks].reshape(S, max_blocks).astype(
        np.int32)
    if seq_lens is None:
        seq_lens = rng.randint(1, max_blocks * BLOCK + 1,
                               size=(S, )).astype(np.int32)
    else:
        seq_lens = np.asarray(seq_lens, np.int32)
    slot = np.full(S, -1, np.int32)
    for s in range(S):
        if seq_lens[s] > 0:
            pos = seq_lens[s] - 1
            slot[s] = block_tables[s, pos // BLOCK] * BLOCK + pos % BLOCK
    return (jnp.asarray(q, dtype), jnp.asarray(kv_new, dtype),
            jnp.asarray(cache, dtype), jnp.asarray(block_tables),
            jnp.asarray(seq_lens), jnp.asarray(slot))


def run_both(case, scale, layer=1, window=0, alibi=None, tol=2e-4,
             head_packed=None):
    q, kv_new, cache, bt, slens, slot = case
    # Reference: write the new K/V rows with the XLA scatter, then attend.
    ref_cache = write_kv(cache, layer, kv_new[:, 0], kv_new[:, 1], slot)
    ref = paged_attention_decode_reference(
        q, ref_cache, layer, bt, slens, scale,
        sliding_window=window or None, alibi=alibi)
    out, new_cache = fused_decode_attention(
        q, kv_new.astype(cache.dtype), cache, jnp.int32(layer), bt, slens,
        slot, scale=scale, window=window, alibi=alibi, interpret=True,
        head_packed=head_packed)
    live = np.asarray(slot) >= 0
    np.testing.assert_allclose(np.asarray(out)[live],
                               np.asarray(ref)[live], rtol=tol, atol=tol)
    return new_cache, ref_cache


@pytest.mark.parametrize("S,QH,KH,D", [
    (4, 4, 4, 64),
    (4, 8, 2, 64),   # GQA group 4
    (3, 8, 8, 128),
    (2, 16, 2, 128),  # GQA group 8
])
def test_fused_decode_matches_reference(S, QH, KH, D):
    case = build_case(S, QH, KH, D, max_blocks=4)
    run_both(case, D**-0.5)


@pytest.mark.parametrize("S,QH,KH,D", [
    (4, 8, 2, 64),    # GQA group 4
    (2, 16, 2, 128),  # GQA group 8
])
def test_fused_decode_head_packed_matches_reference(S, QH, KH, D):
    """The head-packed GQA kernel (bf16 serving default) — forced
    explicitly since the f32 test caches default to page-major."""
    run_both(build_case(S, QH, KH, D, max_blocks=4), D**-0.5,
             head_packed=True)
    # Cache write-back parity too (the HP kernel stores per head-half);
    # fresh case — fused_decode_attention donates the cache buffer.
    new_cache, ref_cache = run_both(build_case(S, QH, KH, D, max_blocks=4),
                                    D**-0.5, layer=2, head_packed=True)
    np.testing.assert_array_equal(np.asarray(new_cache),
                                  np.asarray(ref_cache))


def test_head_packed_default_is_dtype_aware(monkeypatch):
    """bf16 caches default to the head-packed kernel; fp8 keeps
    page-major (2 KiB strided DMA runs measured 1.45x slower);
    LTR_TPU_DECODE_HP forces either way."""
    from vllm_ltr_tpu.ops.pallas.fused_decode import head_packed_default
    monkeypatch.delenv("LTR_TPU_DECODE_HP", raising=False)
    assert head_packed_default(jnp.bfloat16)
    assert not head_packed_default(jnp.float8_e5m2)
    assert not head_packed_default(jnp.float32)
    monkeypatch.setenv("LTR_TPU_DECODE_HP", "1")
    assert head_packed_default(jnp.float8_e5m2)
    monkeypatch.setenv("LTR_TPU_DECODE_HP", "0")
    assert not head_packed_default(jnp.bfloat16)


def test_fused_decode_writes_cache_in_place():
    """The new token's K/V row must land in the cache exactly where the
    XLA scatter puts it, and no other page may change."""
    case = build_case(3, 4, 4, 64, max_blocks=3, seed=1)
    new_cache, ref_cache = run_both(case, 64**-0.5, layer=2)
    np.testing.assert_array_equal(np.asarray(new_cache),
                                  np.asarray(ref_cache))


def test_fused_decode_contiguous_pages():
    """Sequential physical pages trigger the stream kernel's single-DMA
    fast path (a full ppi-page group with consecutive block numbers —
    what the allocator produces in steady state). Mix one contiguous
    sequence with one scattered one so both fetch paths run in the same
    invocation."""
    S, QH, KH, D, max_blocks = 2, 4, 4, 64, 12
    q, kv_new, cache, bt, slens, slot = build_case(
        S, QH, KH, D, max_blocks=max_blocks, seed=3,
        seq_lens=[12 * BLOCK, 10 * BLOCK - 5])
    bt = np.asarray(bt).copy()
    bt[0] = np.arange(1, max_blocks + 1, dtype=np.int32)  # contiguous
    slot = np.asarray(slot).copy()
    for s in range(S):
        pos = int(np.asarray(slens)[s]) - 1
        slot[s] = bt[s, pos // BLOCK] * BLOCK + pos % BLOCK
    case = (q, kv_new, cache, jnp.asarray(bt), slens, jnp.asarray(slot))
    new_cache, ref_cache = run_both(case, D**-0.5)
    np.testing.assert_array_equal(np.asarray(new_cache),
                                  np.asarray(ref_cache))


def test_fused_decode_partial_last_block():
    case = build_case(3, 4, 4, 64, max_blocks=3, seed=1,
                      seq_lens=[1, 17, 33])
    run_both(case, 64**-0.5)


def test_fused_decode_padded_lanes_are_finite():
    """Padded lanes (slot=-1, seq_len=0) must produce finite output and
    must not write anything into the cache."""
    case = build_case(4, 4, 4, 64, max_blocks=2, seed=2,
                      seq_lens=[16, 0, 8, 0])
    q, kv_new, cache, bt, slens, slot = case
    before = np.asarray(cache).copy()
    out, new_cache = fused_decode_attention(
        q, kv_new, cache, jnp.int32(0), bt, slens, slot,
        scale=0.125, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    # Only the two live rows' slots may differ from the original cache.
    diff = (np.asarray(new_cache) != before).any(axis=(2, 3, 5))  # [L,N+1,Bs]
    changed_pages = sorted(set(zip(*np.nonzero(diff.any(axis=2)))))
    live_pages = {(0, int(np.asarray(slot)[s]) // BLOCK)
                  for s in (0, 2)}
    assert set(changed_pages) <= live_pages


def test_fused_decode_bf16_cache():
    case = build_case(2, 4, 4, 64, max_blocks=2, seed=3, dtype=jnp.bfloat16)
    q, kv_new, cache, bt, slens, slot = case
    case = (q.astype(jnp.float32), kv_new, cache, bt, slens, slot)
    run_both(case, 64**-0.5, tol=2e-2)


def test_fused_decode_sliding_window():
    """Whole pages left of the window are skipped yet the mask semantics
    match the reference (Mistral path, no silent fallback)."""
    case = build_case(3, 8, 2, 64, max_blocks=6, seed=5,
                      seq_lens=[96, 17, 64])
    run_both(case, 64**-0.5, window=48)


def test_fused_decode_alibi():
    QH = 8
    case = build_case(3, QH, QH, 64, max_blocks=3, seed=6)
    run_both(case, 64**-0.5, alibi=alibi_slopes(QH))


def test_fused_decode_single_token_context():
    """seq_len=1: the new token is the entire context (first decode after
    an empty prefill) — attention must equal V of the new token."""
    case = build_case(2, 4, 4, 64, max_blocks=2, seed=7, seq_lens=[1, 1])
    q, kv_new, cache, bt, slens, slot = case
    out, _ = fused_decode_attention(q, kv_new, cache, jnp.int32(1), bt,
                                    slens, slot, scale=0.125,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(kv_new[:, 1]), rtol=1e-5,
                               atol=1e-5)
