"""Device-side token sampler.

Counterpart of reference ``vllm/model_executor/layers/sampler.py`` (715 LoC,
per-request Python loops + torch ops): re-designed TPU-first as one fully
vectorized, jit-compiled function over the padded sequence batch. All
per-request sampling parameters arrive as [S]-shaped arrays; one vocab sort
serves top-k, top-p, min-p and top-logprobs; sampling uses the Gumbel-argmax
trick so greedy/random rows share one code path (no host round trips).

Penalties use a device-resident token-count matrix [S, V] (uint8, saturating)
maintained incrementally by the executor — the TPU-idiomatic replacement for
the reference's per-step bincount of Python token lists.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclass
class SamplingTensors:
    """Per-row sampling parameters, padded to the sequence-batch size S."""
    temperature: jax.Array  # f32[S]
    top_p: jax.Array  # f32[S]
    top_k: jax.Array  # i32[S]  (V = disabled)
    min_p: jax.Array  # f32[S]
    greedy: jax.Array  # bool[S]
    presence_penalty: jax.Array  # f32[S]
    frequency_penalty: jax.Array  # f32[S]
    repetition_penalty: jax.Array  # f32[S]


@dataclass
class SampleResult:
    """Device outputs of one sampling step."""
    tokens: jax.Array  # i32[S] sampled token ids
    logprobs: jax.Array  # f32[S] logprob of the sampled token
    topk_ids: jax.Array  # i32[S, L] top-L token ids by logprob
    topk_logprobs: jax.Array  # f32[S, L]
    sampled_ranks: jax.Array  # i32[S] rank of sampled token in the dist


def unpack_token_mask(packed: jax.Array, vocab_size: int) -> jax.Array:
    """bool[S, V] from a bit-packed uint8[S, ceil(V/8)] mask (np.packbits
    layout: MSB first).  8x smaller H2D transfer than a byte mask; the
    unpack is a handful of VPU ops."""
    S = packed.shape[0]
    bytes_rep = jnp.repeat(packed, 8, axis=1)[:, :vocab_size]
    shifts = 7 - (jax.lax.broadcasted_iota(jnp.int32, (S, vocab_size), 1)
                  & 7)
    return ((bytes_rep.astype(jnp.int32) >> shifts) & 1) > 0


def apply_token_mask(logits: jax.Array, packed_mask: jax.Array) -> jax.Array:
    """Guided decoding: disallowed tokens to -inf (reference applies the
    equivalent bias row-by-row in its outlines logits processor,
    vllm/model_executor/guided_decoding/outlines_logits_processors.py)."""
    allowed = unpack_token_mask(packed_mask, logits.shape[-1])
    return jnp.where(allowed, logits, NEG_INF)


def apply_penalties(logits: jax.Array, token_counts: jax.Array,
                    t: SamplingTensors) -> jax.Array:
    """Repetition / frequency / presence penalties from the count matrix."""
    counts = token_counts.astype(jnp.float32)
    seen = counts > 0
    rp = t.repetition_penalty[:, None]
    logits = jnp.where(seen,
                       jnp.where(logits > 0, logits / rp, logits * rp),
                       logits)
    logits = logits - t.frequency_penalty[:, None] * counts
    logits = logits - t.presence_penalty[:, None] * seen.astype(jnp.float32)
    return logits


def sample(
    logits: jax.Array,  # f32[S, V]
    t: SamplingTensors,
    key: jax.Array,  # PRNG key
    token_counts: Optional[jax.Array] = None,  # u8[S, V]
    num_logprobs: int = 8,
    exact: bool = True,
    packed_mask: Optional[jax.Array] = None,  # u8[S, ceil(V/8)] bitmask
) -> SampleResult:
    """``exact=False`` (static, host-chosen) selects the fast path for
    batches with no top-p / top-k / min-p filters: Gumbel-argmax over the
    raw distribution needs only O(V) reductions instead of the full
    descending vocab sort (the sort is the single most expensive sampler
    op at 32k+ vocabs). Identical semantics for such batches."""
    S, V = logits.shape
    logits = logits.astype(jnp.float32)

    if token_counts is not None:
        logits = apply_penalties(logits, token_counts, t)
    if packed_mask is not None:
        # Guided rows: before the softmax so logprobs describe the
        # constrained distribution (all-ones rows are unaffected).
        logits = apply_token_mask(logits, packed_mask)

    raw_logprobs = jax.nn.log_softmax(logits, axis=-1)

    temp = jnp.maximum(t.temperature, 1e-5)[:, None]
    scaled = logits / temp
    L = min(num_logprobs, V)

    if not exact:
        u = jax.random.uniform(key, (S, V), minval=1e-10, maxval=1.0)
        noise = jnp.where(t.greedy[:, None], 0.0, -jnp.log(-jnp.log(u)))
        tokens = jnp.argmax(scaled + noise, axis=-1).astype(jnp.int32)
        sampled_logprobs = jnp.take_along_axis(raw_logprobs, tokens[:, None],
                                               axis=1).squeeze(-1)
        topk_logprobs, topk_ids = jax.lax.top_k(raw_logprobs, L)
        picked = jnp.take_along_axis(scaled, tokens[:, None], axis=1)
        ranks = jnp.sum(scaled > picked, axis=-1).astype(jnp.int32)
        return SampleResult(tokens=tokens,
                            logprobs=sampled_logprobs,
                            topk_ids=topk_ids,
                            topk_logprobs=topk_logprobs,
                            sampled_ranks=ranks)

    # One descending sort serves top-k / top-p / min-p / top-logprobs.
    sorted_logits, sorted_idx = jax.lax.top_k(scaled, V)
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cumprobs = jnp.cumsum(sorted_probs, axis=-1)
    ranks = jax.lax.broadcasted_iota(jnp.int32, (S, V), 1)

    # Keep tokens while the cumulative mass *before* them is < top_p
    # (the first token always survives).
    topp_mask = (cumprobs - sorted_probs) < t.top_p[:, None]
    topk_mask = ranks < t.top_k[:, None]
    minp_mask = sorted_probs >= (t.min_p[:, None] * sorted_probs[:, :1])
    keep = topp_mask & topk_mask & minp_mask
    masked = jnp.where(keep, sorted_logits, NEG_INF)

    # Gumbel-argmax sampling; greedy rows get zero noise => argmax.
    u = jax.random.uniform(key, (S, V), minval=1e-10, maxval=1.0)
    gumbel = -jnp.log(-jnp.log(u))
    noise = jnp.where(t.greedy[:, None], 0.0, gumbel)
    choice = jnp.argmax(masked + noise, axis=-1)  # index into sorted order

    tokens = jnp.take_along_axis(sorted_idx, choice[:, None],
                                 axis=1).squeeze(-1)
    sampled_logprobs = jnp.take_along_axis(raw_logprobs, tokens[:, None],
                                           axis=1).squeeze(-1)

    # Top-L logprobs come from the same sort (of raw logits order; ranks by
    # probability are identical since softmax is monotonic in logits/T).
    topk_ids = sorted_idx[:, :L]
    topk_logprobs = jnp.take_along_axis(raw_logprobs, topk_ids, axis=1)
    return SampleResult(tokens=tokens,
                        logprobs=sampled_logprobs,
                        topk_ids=topk_ids,
                        topk_logprobs=topk_logprobs,
                        sampled_ranks=choice)


def update_token_counts(token_counts: jax.Array, row_ids: jax.Array,
                        token_ids: jax.Array) -> jax.Array:
    """Saturating scatter-add of new tokens into the count matrix.

    row_ids/token_ids: i32[M]; negative row_ids are dropped.
    """
    ones = jnp.ones_like(token_ids, dtype=token_counts.dtype)
    safe_rows = jnp.where(row_ids < 0, token_counts.shape[0], row_ids)
    return token_counts.at[safe_rows, token_ids].add(ones, mode="drop")


def reset_token_count_rows(token_counts: jax.Array,
                           row_ids: jax.Array) -> jax.Array:
    safe = jnp.where(row_ids < 0, token_counts.shape[0], row_ids)
    zeros = jnp.zeros((row_ids.shape[0], token_counts.shape[1]),
                      dtype=token_counts.dtype)
    return token_counts.at[safe].set(zeros, mode="drop")
