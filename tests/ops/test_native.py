"""Native C++ host-runtime tests: the packer/histogram must agree with the
numpy fallback exactly (counterpart of the reference's kernel-vs-reference
tests, but for the host path)."""
import numpy as np
import pytest

from vllm_ltr_tpu.executor import native


def _case(seed=0, R=5, MB=4, bs=16, T=64, align=1):
    rng = np.random.RandomState(seed)
    row_len = rng.randint(1, 10, size=R).astype(np.int32)
    row_start = np.zeros(R, np.int32)
    row_start[1:] = np.cumsum(row_len)[:-1]
    # Destination offsets, optionally tile-aligned (leaving gaps).
    out_start = np.zeros(R, np.int32)
    cursor = 0
    for i in range(R):
        out_start[i] = cursor
        cursor += -(-int(row_len[i]) // align) * align
    total = int(row_len.sum())
    all_tokens = rng.randint(0, 1000, size=total).astype(np.int32)
    row_pos0 = rng.randint(0, 40, size=R).astype(np.int32)
    block_tables = rng.randint(-1, 30, size=(R, MB)).astype(np.int32)
    return (all_tokens, row_start, out_start, row_len, row_pos0,
            block_tables, bs, T)


def test_pack_batch_native_matches_numpy(monkeypatch):
    args = _case()
    native._load()
    if native._lib is None:
        pytest.skip("native lib unavailable")
    got = native.pack_batch(*args)
    # Force the numpy fallback.
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    want = native.pack_batch(*args)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_count_tokens_native_matches_numpy(monkeypatch):
    rng = np.random.RandomState(1)
    R, V = 4, 50
    lens = rng.randint(1, 300, size=R).astype(np.int32)
    starts = np.zeros(R, np.int32)
    starts[1:] = np.cumsum(lens)[:-1]
    ids = rng.randint(0, V, size=int(lens.sum())).astype(np.int32)
    native._load()
    if native._lib is None:
        pytest.skip("native lib unavailable")
    got = native.count_tokens(ids, starts, lens, V)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    want = native.count_tokens(ids, starts, lens, V)
    np.testing.assert_array_equal(got, want)


def test_pack_batch_aligned_gaps(monkeypatch):
    """Tile-aligned destinations: gaps between rows stay padding, native and
    numpy agree."""
    args = _case(seed=2, align=8, T=128)
    native._load()
    if native._lib is None:
        pytest.skip("native lib unavailable")
    got = native.pack_batch(*args)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    want = native.pack_batch(*args)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    # Every row starts at a multiple of the tile and gaps are padding.
    token_seq = got[2]
    out_start, row_len = args[2], args[3]
    for r, (s, ln) in enumerate(zip(out_start, row_len)):
        assert (token_seq[s:s + ln] == r).all()
        assert (token_seq[s + ln:s + -(-int(ln) // 8) * 8] == -1).all()


def test_pack_batch_overflow_raises():
    args = list(_case())
    args[-1] = 4  # T too small
    with pytest.raises(ValueError):
        native.pack_batch(*args)
