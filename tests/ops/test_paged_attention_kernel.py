"""Pallas decode kernel vs the XLA reference implementation (the reference
repo's per-kernel CUDA-vs-torch comparison pattern, tests/kernels/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_ltr_tpu.ops.attention import paged_attention_decode_reference
from vllm_ltr_tpu.ops.pallas.paged_attention import (
    paged_attention_decode_pallas)

BLOCK = 16


def build_case(S, QH, KH, D, max_blocks, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    N = S * max_blocks  # enough distinct physical blocks
    cache = rng.normal(size=(2, KH, N + 1, BLOCK, D)).astype(np.float32)
    q = rng.normal(size=(S, QH, D)).astype(np.float32)
    # Random non-overlapping block tables + random context lengths.
    perm = rng.permutation(N)
    block_tables = perm[:S * max_blocks].reshape(S, max_blocks).astype(
        np.int32)
    seq_lens = rng.randint(1, max_blocks * BLOCK + 1,
                           size=(S, )).astype(np.int32)
    return (jnp.asarray(q, dtype), jnp.asarray(cache, dtype),
            jnp.asarray(block_tables), jnp.asarray(seq_lens))


@pytest.mark.parametrize("S,QH,KH,D", [
    (4, 4, 4, 64),
    (4, 8, 2, 64),   # GQA group 4
    (3, 8, 8, 128),
    (2, 16, 2, 128),  # GQA group 8
])
def test_decode_kernel_matches_reference(S, QH, KH, D):
    q, cache, block_tables, seq_lens = build_case(S, QH, KH, D,
                                                  max_blocks=4)
    scale = D**-0.5
    ref = paged_attention_decode_reference(q, cache, block_tables, seq_lens,
                                           scale)
    out = paged_attention_decode_pallas(q,
                                        cache,
                                        block_tables,
                                        seq_lens,
                                        block_size=BLOCK,
                                        scale=scale,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_decode_kernel_partial_last_block():
    q, cache, block_tables, seq_lens = build_case(3, 4, 4, 64, max_blocks=3,
                                                  seed=1)
    # Force odd context lengths (partial last block masking).
    seq_lens = jnp.asarray([1, 17, 33], jnp.int32)
    scale = 64**-0.5
    ref = paged_attention_decode_reference(q, cache, block_tables, seq_lens,
                                           scale)
    out = paged_attention_decode_pallas(q, cache, block_tables, seq_lens,
                                        block_size=BLOCK, scale=scale,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_decode_kernel_zero_len_rows_are_finite():
    """Padded rows (seq_len=0) must produce finite output, not NaN."""
    q, cache, block_tables, seq_lens = build_case(4, 4, 4, 64, max_blocks=2,
                                                  seed=2)
    seq_lens = jnp.asarray([16, 0, 8, 0], jnp.int32)
    out = paged_attention_decode_pallas(q, cache, block_tables, seq_lens,
                                        block_size=BLOCK, scale=0.125,
                                        interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_decode_kernel_bf16_kv():
    q, cache, block_tables, seq_lens = build_case(2, 4, 4, 64, max_blocks=2,
                                                  seed=3)
    cache_bf16 = cache.astype(jnp.bfloat16)
    scale = 64**-0.5
    ref = paged_attention_decode_reference(q, cache_bf16, block_tables,
                                           seq_lens, scale)
    out = paged_attention_decode_pallas(q, cache_bf16, block_tables,
                                        seq_lens, block_size=BLOCK,
                                        scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)


def test_decode_kernel_sliding_window():
    """Sliding-window decode: the kernel skips blocks left of the window
    and matches the reference mask semantics (Mistral path, no fallback)."""
    q, cache, block_tables, seq_lens = build_case(3, 8, 2, 64, max_blocks=6,
                                                  seed=5)
    seq_lens = jnp.asarray([96, 17, 64], jnp.int32)
    scale = 64**-0.5
    from vllm_ltr_tpu.ops.attention import paged_attention_reference
    S = 3
    token_seq = jnp.arange(S, dtype=jnp.int32)
    token_pos = jnp.maximum(seq_lens - 1, 0)
    ref = paged_attention_reference(q, cache, block_tables, token_seq,
                                    token_pos, seq_lens, scale,
                                    sliding_window=48)
    out = paged_attention_decode_pallas(q, cache, block_tables, seq_lens,
                                        block_size=BLOCK, scale=scale,
                                        window=48, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)
