"""ctypes bindings for the native host-runtime library (csrc_tpu/).

Counterpart of reference ``vllm/_custom_ops.py`` + ``csrc/pybind.cpp``: the
reference binds its CUDA kernels into ``vllm._C``; here the device kernels
are Pallas/XLA and the native library accelerates the HOST per-step hot
path (batch packing, penalty histograms). Auto-builds with g++ on first
import; every entry point has a numpy fallback so the engine works without
a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from vllm_ltr_tpu.logger import init_logger

logger = init_logger(__name__)

_CSRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "..", "csrc_tpu")
_LIB_PATH = os.path.join(_CSRC_DIR, "libbatch_prep.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("LTR_TPU_DISABLE_NATIVE", "0") == "1":
        return None
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _CSRC_DIR],
                           check=True,
                           capture_output=True,
                           timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pack_batch.restype = ctypes.c_int32
        lib.pack_batch.argtypes = [
            _I32P, _I32P, _I32P, _I32P, _I32P, _I32P, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _I32P, _I32P,
            _I32P, _I32P
        ]
        lib.count_tokens.restype = None
        lib.count_tokens.argtypes = [
            _I32P, _I32P, _I32P, ctypes.c_int32, ctypes.c_int32, _U8P
        ]
        _lib = lib
        logger.info("Native host runtime loaded (%s)", _LIB_PATH)
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.warning("Native host runtime unavailable (%s); "
                       "using numpy fallback", e)
        _lib = None
    return _lib


def pack_batch(
    all_tokens: np.ndarray,  # i32[total]
    row_start: np.ndarray,  # i32[R] source offsets in all_tokens
    out_start: np.ndarray,  # i32[R] destination offsets (may leave gaps)
    row_len: np.ndarray,  # i32[R]
    row_pos0: np.ndarray,  # i32[R]
    block_tables: np.ndarray,  # i32[R, MB]
    block_size: int,
    T: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Flatten rows of new tokens into padded step arrays; gaps between
    rows (tile alignment) stay padding. Returns (tokens, positions,
    token_seq, slots), each i32[T]."""
    R, MB = block_tables.shape
    lib = _load()
    if lib is not None:
        tokens = np.empty(T, np.int32)
        positions = np.empty(T, np.int32)
        token_seq = np.empty(T, np.int32)
        slots = np.empty(T, np.int32)
        n = lib.pack_batch(np.ascontiguousarray(all_tokens, np.int32),
                           np.ascontiguousarray(row_start, np.int32),
                           np.ascontiguousarray(out_start, np.int32),
                           np.ascontiguousarray(row_len, np.int32),
                           np.ascontiguousarray(row_pos0, np.int32),
                           np.ascontiguousarray(block_tables, np.int32), R,
                           MB, block_size, T, tokens, positions, token_seq,
                           slots)
        if n < 0:
            raise ValueError("batch exceeds token bucket")
        return tokens, positions, token_seq, slots

    # numpy fallback
    tokens = np.zeros(T, np.int32)
    positions = np.zeros(T, np.int32)
    token_seq = np.full(T, -1, np.int32)
    slots = np.full(T, -1, np.int32)
    for r in range(R):
        ln = int(row_len[r])
        dst = int(out_start[r])
        if dst + ln > T:
            raise ValueError("batch exceeds token bucket")
        sl = slice(dst, dst + ln)
        pos = int(row_pos0[r]) + np.arange(ln, dtype=np.int32)
        tokens[sl] = all_tokens[int(row_start[r]):int(row_start[r]) + ln]
        positions[sl] = pos
        token_seq[sl] = r
        blk_idx = np.minimum(pos // block_size, MB - 1)
        blk = block_tables[r, blk_idx]
        s = blk * block_size + pos % block_size
        slots[sl] = np.where((pos // block_size < MB) & (blk >= 0), s, -1)
    return tokens, positions, token_seq, slots


def count_tokens(token_ids: np.ndarray, row_start: np.ndarray,
                 row_len: np.ndarray, vocab: int) -> np.ndarray:
    """Per-row saturating uint8 histogram (sampling penalties)."""
    R = row_start.shape[0]
    counts = np.zeros((R, vocab), np.uint8)
    lib = _load()
    if lib is not None:
        lib.count_tokens(np.ascontiguousarray(token_ids, np.int32),
                         np.ascontiguousarray(row_start, np.int32),
                         np.ascontiguousarray(row_len, np.int32), R, vocab,
                         counts)
        return counts
    for r in range(R):
        ids = token_ids[int(row_start[r]):int(row_start[r]) +
                        int(row_len[r])]
        cnt = np.bincount(ids[(ids >= 0) & (ids < vocab)],
                          minlength=vocab)
        counts[r] = np.minimum(cnt, 255).astype(np.uint8)
    return counts
