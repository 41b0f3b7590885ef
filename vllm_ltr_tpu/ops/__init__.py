"""Device ops: attention, paged KV cache, quantized matmuls.

``pallas_mode`` is the single switch deciding whether the hot ops run as
Pallas TPU kernels, Pallas interpret-mode (CPU-mesh TP tests), or the XLA
reference paths.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def pallas_mode() -> Optional[bool]:
    """Pallas dispatch mode: ``None`` = off (XLA reference paths),
    ``False`` = compiled TPU kernels, ``True`` = interpret mode.

    ``LTR_TPU_PALLAS_INTERPRET=1`` forces the kernel code paths (in
    interpret mode) on any backend — the CPU-mesh TP tests use it to
    exercise the shard_map'd kernels without hardware."""
    if os.environ.get("LTR_TPU_PALLAS_INTERPRET", "0") == "1":
        return True
    if (jax.default_backend() == "tpu"
            and os.environ.get("LTR_TPU_DISABLE_PALLAS", "0") != "1"):
        return False
    return None
