"""Speculative decoding executor path.

Behavioral counterpart of reference ``vllm/spec_decode/`` (SpecDecodeWorker +
MultiStepWorker + BatchExpansionTop1Scorer + rejection sampling, 1,546 LoC):
re-designed TPU-first as ONE jitted function per decode step:

  1. draft phase: k sequential decode steps of the small draft model chained
     on-device (lax loop; the Pallas decode kernel serves each step) —
     no host round trips between draft steps,
  2. verify phase: the target model scores all k proposals + the bonus
     position in a single mixed-batch forward over the paged cache (the
     "batch expansion" — our flattened-token formulation does it natively),
  3. modified rejection sampling on-device.

KV bookkeeping exploits paged attention: rejected tokens' cache writes land
beyond the accepted context length, are never read (attention masks by
seq_len), and are overwritten as the sequence advances — no rollback.
The draft model keeps its own cache over the SAME block tables; after a
swap-in, draft KV may be stale, which only degrades proposal acceptance
(target verification preserves exactness).

Supported sampling under spec decode: greedy and temperature sampling
(rejection equivalence); top-k/top-p requests fall back to the non-spec
path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.rejection_sampler import rejection_sample
from vllm_ltr_tpu.models.common import AttentionMetadata


def build_spec_step_fn(target_cls, target_cfg, draft_cls, draft_cfg,
                       num_spec_tokens: int):
    """Returns a jitted spec_step(params, draft_params, kv, draft_kv, ...)
    -> (kv, draft_kv, tokens [S, k+1], counts [S], logprobs [S, k+1],
    next_rng). The PRNG key is split on device and threaded back — an
    eager host-side split costs a relay round trip per step."""
    k = num_spec_tokens

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def spec_step(
        params,
        draft_params,
        kv_cache,
        draft_kv_cache,
        last_tokens,  # i32[S] the newest token of each sequence
        base_pos,  # i32[S] its position (= L - 1)
        block_tables,  # i32[S, MB]
        seq_lens,  # i32[S] current length L
        spec_slots,  # i32[S, k+1] cache slots for positions L-1 .. L+k-1
        temperature,  # f32[S]
        greedy,  # bool[S]
        rng,
    ):
        rng, next_rng = jax.random.split(rng)
        S = last_tokens.shape[0]
        temp = jnp.maximum(temperature, 1e-5)[:, None]

        # ---- 1. draft phase: k chained decode steps -----------------------
        def draft_probs_from_logits(logits):
            return jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)

        def draft_step(carry, j):
            draft_kv, tok, key = carry
            pos = base_pos + j
            slots_j = jax.lax.dynamic_slice_in_dim(spec_slots, j, 1,
                                                   axis=1)[:, 0]
            meta = AttentionMetadata(
                token_seq=jnp.arange(S, dtype=jnp.int32),
                token_pos=pos,
                slot_mapping=slots_j,
                block_tables=block_tables,
                seq_lens=pos + 1,
            )
            hidden, draft_kv = draft_cls.forward(draft_params, tok, pos,
                                                 draft_kv, meta, draft_cfg,
                                                 decode_mode=True)
            logits = draft_cls.compute_logits(draft_params, hidden,
                                              draft_cfg)
            probs = draft_probs_from_logits(logits)  # [S, V]
            key, sub = jax.random.split(key)
            sampled = jax.random.categorical(sub,
                                             jnp.log(probs + 1e-10),
                                             axis=-1)
            proposal = jnp.where(greedy, jnp.argmax(logits, axis=-1),
                                 sampled).astype(jnp.int32)
            return (draft_kv, proposal, key), (proposal, probs)

        (draft_kv_cache, _, _), (proposals, draft_probs) = jax.lax.scan(
            draft_step, (draft_kv_cache, last_tokens, rng),
            jnp.arange(k, dtype=jnp.int32))
        proposals = proposals.T  # [S, k]
        draft_probs = jnp.transpose(draft_probs, (1, 0, 2))  # [S, k, V]

        # ---- 2. verify: one target forward over S*(k+1) tokens ------------
        verify_tokens = jnp.concatenate([last_tokens[:, None], proposals],
                                        axis=1)  # [S, k+1]
        pos_grid = base_pos[:, None] + jnp.arange(k + 1)[None, :]
        flat_tokens = verify_tokens.reshape(-1)
        flat_pos = pos_grid.reshape(-1)
        flat_seq = jnp.repeat(jnp.arange(S, dtype=jnp.int32), k + 1)
        flat_slots = spec_slots.reshape(-1)
        meta = AttentionMetadata(
            token_seq=flat_seq,
            token_pos=flat_pos,
            slot_mapping=flat_slots,
            block_tables=block_tables,
            seq_lens=seq_lens + k,
        )
        hidden, kv_cache = target_cls.forward(params, flat_tokens, flat_pos,
                                              kv_cache, meta, target_cfg)
        logits = target_cls.compute_logits(params, hidden, target_cfg)
        logits = logits.reshape(S, k + 1, -1)
        target_probs = jax.nn.softmax(
            logits.astype(jnp.float32) / temp[:, :, None], axis=-1)

        # ---- 3. rejection sampling ---------------------------------------
        rng2 = jax.random.fold_in(rng, 7)
        tokens, counts = rejection_sample(target_probs, draft_probs,
                                          proposals, rng2, greedy)
        safe = jnp.clip(tokens, 0, target_probs.shape[-1] - 1)
        logprobs = jnp.log(
            jnp.take_along_axis(target_probs, safe[:, :, None],
                                axis=2).squeeze(-1) + 1e-10)
        return kv_cache, draft_kv_cache, tokens, counts, logprobs, next_rng

    return spec_step
