"""Rejection sampler for speculative decoding.

Counterpart of reference ``vllm/model_executor/layers/rejection_sampler.py``
(398 LoC): modified rejection sampling (Leviathan et al.) — accept draft
token j with prob min(1, p_target/p_draft); at the first rejection resample
from max(0, p_target - p_draft) normalized; if all k accepted, sample a
bonus token from the target's k-th distribution. Greedy (temperature 0)
reduces to accept-while-argmax-matches, guaranteeing output identical to
non-speculative greedy decoding.

Shapes: S sequences, k proposals, V vocab.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rejection_sample(
    target_probs: jax.Array,  # f32[S, k+1, V] (positions 0..k)
    draft_probs: jax.Array,  # f32[S, k, V]
    draft_tokens: jax.Array,  # i32[S, k]
    key: jax.Array,
    greedy: jax.Array,  # bool[S]
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens i32[S, k+1], num_accepted i32[S]).

    tokens[s, :num_accepted[s]] are the emitted tokens (>=1 per sequence);
    positions beyond are -1.
    """
    S, k1, V = target_probs.shape
    k = k1 - 1
    key_u, key_r, key_b = jax.random.split(key, 3)

    p_t = jnp.take_along_axis(target_probs[:, :k, :],
                              draft_tokens[:, :, None],
                              axis=2).squeeze(-1)  # [S, k]
    p_d = jnp.take_along_axis(draft_probs, draft_tokens[:, :, None],
                              axis=2).squeeze(-1)
    ratio = p_t / jnp.maximum(p_d, 1e-10)
    u = jax.random.uniform(key_u, (S, k), minval=1e-10)
    accept_prob = jnp.minimum(ratio, 1.0)

    target_argmax = jnp.argmax(target_probs, axis=-1)  # [S, k+1]
    greedy_accept = draft_tokens == target_argmax[:, :k]
    stochastic_accept = u < accept_prob
    accept = jnp.where(greedy[:, None], greedy_accept, stochastic_accept)

    # Number of leading accepts.
    accepted_prefix = jnp.cumprod(accept.astype(jnp.int32), axis=1)
    n_accept = jnp.sum(accepted_prefix, axis=1)  # [S] in [0, k]

    # Recovery distribution at the first rejected position.
    first_rej = jnp.minimum(n_accept, k - 1)  # clamp for gathers
    t_at = jnp.take_along_axis(target_probs,
                               first_rej[:, None, None], axis=1).squeeze(1)
    d_at = jnp.take_along_axis(draft_probs,
                               jnp.minimum(first_rej, k - 1)[:, None, None],
                               axis=1).squeeze(1)
    recover = jnp.maximum(t_at - d_at, 0.0)
    recover_sum = jnp.sum(recover, axis=-1, keepdims=True)
    recover = jnp.where(recover_sum > 0, recover / jnp.maximum(
        recover_sum, 1e-10), t_at)
    recover_tok = jax.random.categorical(key_r, jnp.log(recover + 1e-10),
                                         axis=-1)  # [S]
    recover_tok = jnp.where(greedy,
                            jnp.take_along_axis(target_argmax,
                                                first_rej[:, None],
                                                axis=1).squeeze(1),
                            recover_tok)

    # Bonus token when everything accepted: sample target position k.
    bonus = jax.random.categorical(key_b,
                                   jnp.log(target_probs[:, k, :] + 1e-10),
                                   axis=-1)
    bonus = jnp.where(greedy, target_argmax[:, k], bonus)

    # Assemble [S, k+1]: accepted drafts, then recovery-or-bonus, then -1.
    pos = jnp.arange(k1)[None, :]
    out = jnp.full((S, k1), -1, jnp.int32)
    out = jnp.where(pos < n_accept[:, None],
                    jnp.pad(draft_tokens, ((0, 0), (0, 1)),
                            constant_values=0), out)
    all_accepted = n_accept == k
    final_tok = jnp.where(all_accepted, bonus, recover_tok)
    out = jnp.where(pos == n_accept[:, None], final_tok[:, None], out)
    num_emitted = n_accept + 1
    return out.astype(jnp.int32), num_emitted.astype(jnp.int32)
