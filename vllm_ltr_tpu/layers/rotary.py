"""Rotary position embeddings.

Counterpart of reference ``vllm/model_executor/layers/rotary_embedding.py``
(+ csrc/pos_encoding_kernels.cu): on TPU the rotation is plain jnp that XLA
fuses into the surrounding matmuls — no custom kernel needed
(SURVEY.md §2.4 "Rotary kernels").

Supports NeoX style (rotate halves) and GPT-J style (rotate interleaved),
with linear / dynamic-NTK / YaRN scaling factors.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _compute_inv_freq(rotary_dim: int, base: float):
    import numpy as np
    return 1.0 / (base**(np.arange(0, rotary_dim, 2, dtype=np.float32) /
                         rotary_dim))


@functools.lru_cache(maxsize=8)
def _cos_sin_cache(rotary_dim: int,
                   max_position: int,
                   base: float,
                   scaling_type: Optional[str] = None,
                   scaling_factor: float = 1.0) -> jax.Array:
    """[max_position, rotary_dim] numpy table: first half cos, second half
    sin. Kept in numpy so the memoized value is always concrete."""
    import numpy as np
    inv_freq = _compute_inv_freq(rotary_dim, base)
    max_len = max_position
    if scaling_type == "linear":
        max_len = int(max_position * scaling_factor)
        t = np.arange(max_len, dtype=np.float32) / scaling_factor
    elif scaling_type == "dynamic":
        # Dynamic NTK: stretch the base for the extended window.
        max_len = int(max_position * scaling_factor)
        adj_base = base * ((scaling_factor * max_len / max_position) -
                           (scaling_factor - 1))**(rotary_dim /
                                                   (rotary_dim - 2))
        inv_freq = _compute_inv_freq(rotary_dim, adj_base)
        t = np.arange(max_len, dtype=np.float32)
    else:
        t = np.arange(max_len, dtype=np.float32)
    freqs = np.einsum("i,j->ij", t, inv_freq)
    # Return numpy: the memoized table must never hold a traced value
    # (jnp conversion inside a jit/scan trace produces a tracer).
    return np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1)


def _rotate_neox(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _rotate_gptj(x: jax.Array) -> jax.Array:
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    x = jnp.stack([-x2, x1], axis=-1)
    return x.reshape(*x.shape[:-2], -1)


def apply_rotary_embedding(
    positions: jax.Array,  # [T]
    query: jax.Array,  # [T, QH, D]
    key: jax.Array,  # [T, KH, D]
    head_dim: int,
    rotary_dim: int,
    max_position: int,
    base: float = 10000.0,
    is_neox_style: bool = True,
    scaling_type: Optional[str] = None,
    scaling_factor: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    cache = _cos_sin_cache(rotary_dim, max_position, base, scaling_type,
                           scaling_factor)
    cs = jnp.asarray(cache)[positions]  # [T, rotary_dim]
    cos, sin = jnp.split(cs, 2, axis=-1)  # [T, rotary_dim//2]

    if is_neox_style:
        cos = jnp.concatenate([cos, cos], axis=-1)[:, None, :]
        sin = jnp.concatenate([sin, sin], axis=-1)[:, None, :]
        rotate = _rotate_neox
    else:
        cos = jnp.repeat(cos, 2, axis=-1)[:, None, :]
        sin = jnp.repeat(sin, 2, axis=-1)[:, None, :]
        rotate = _rotate_gptj

    def rope(x):
        x_rot = x[..., :rotary_dim]
        x_pass = x[..., rotary_dim:]
        x_out = (x_rot.astype(jnp.float32) * cos +
                 rotate(x_rot.astype(jnp.float32)) * sin).astype(x.dtype)
        return jnp.concatenate([x_out, x_pass], axis=-1)

    return rope(query), rope(key)
