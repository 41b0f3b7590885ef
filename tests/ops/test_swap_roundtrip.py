"""Swap-space semantics: async overlap commit ordering + bit-exact FP8
round-trip (VERDICT r1 item 5)."""
import jax
import jax.numpy as jnp
import numpy as np

from vllm_ltr_tpu.ops.kv_cache import HostSwapSpace, allocate_kv_cache


def _fill(cache, rng):
    vals = rng.normal(size=cache.shape).astype(np.float32)
    return jnp.asarray(vals, cache.dtype)


def test_swap_roundtrip_bf16():
    rng = np.random.RandomState(0)
    cache = _fill(allocate_kv_cache(2, 8, 4, 2, 16, dtype=jnp.bfloat16), rng)
    swap = HostSwapSpace(2, 8, 4, 2, 16, jnp.bfloat16)
    orig = np.asarray(cache)

    cache = swap.swap_out(cache, {1: 3, 5: 0})
    # Overwrite the device blocks (simulating reuse), then swap back in.
    cache = cache.at[:, [1, 5]].set(0)
    cache = swap.swap_in(cache, {3: 1, 0: 5})
    got = np.asarray(cache)
    np.testing.assert_array_equal(got[:, 1], orig[:, 1])
    np.testing.assert_array_equal(got[:, 5], orig[:, 5])


def test_swap_roundtrip_fp8_bit_exact():
    """FP8 blocks must survive swap bit-for-bit (no dequant/requant)."""
    rng = np.random.RandomState(1)
    dtype = jnp.float8_e5m2
    cache = _fill(allocate_kv_cache(2, 8, 4, 2, 16, dtype=dtype), rng)
    swap = HostSwapSpace(2, 8, 4, 2, 16, dtype)
    orig_bits = np.asarray(cache).view(np.uint8)

    cache = swap.swap_out(cache, {2: 1})
    cache = cache.at[:, 2].set(0)
    cache = swap.swap_in(cache, {1: 2})
    got_bits = np.asarray(cache).view(np.uint8)
    np.testing.assert_array_equal(got_bits[:, 2], orig_bits[:, 2])


def test_swap_out_commit_is_deferred_until_needed():
    """swap_out leaves the transfer in flight; swap_in / flush commit it."""
    rng = np.random.RandomState(2)
    cache = _fill(allocate_kv_cache(1, 4, 4, 1, 16, dtype=jnp.float32), rng)
    swap = HostSwapSpace(1, 4, 4, 1, 16, jnp.float32)
    orig = np.asarray(cache)

    swap.swap_out(cache, {0: 0})
    assert swap._inflight, "transfer should be pending, not committed"
    swap.flush()
    assert not swap._inflight
    np.testing.assert_array_equal(swap.buf[:, 0], orig[:, 0])


def test_swap_out_ordering_same_host_block():
    """Two swap-outs reusing one host slot commit in issue order."""
    rng = np.random.RandomState(3)
    cache = _fill(allocate_kv_cache(1, 4, 4, 1, 16, dtype=jnp.float32), rng)
    swap = HostSwapSpace(1, 4, 4, 1, 16, jnp.float32)
    orig = np.asarray(cache)

    swap.swap_out(cache, {0: 1})
    swap.swap_out(cache, {2: 1})  # commits the first, then queues this one
    swap.flush()
    np.testing.assert_array_equal(swap.buf[:, 1], orig[:, 2])
