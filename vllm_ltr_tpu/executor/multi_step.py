"""Fused multi-step decode: K decode iterations per host dispatch.

Behavioral counterpart of the reference's multi-step scheduling direction
(vLLM's later --num-scheduler-steps; at the pinned commit the reference
dispatches one step per scheduler iteration, worker/model_runner.py
execute_model), re-designed TPU-first: the whole K-step chain is ONE
jitted ``lax.scan`` on device —

  sample(step j) --> embed --> forward(decode) --> sample(step j+1)

with no host round trip in between. On a tunneled/remote TPU the per-
dispatch latency (tens of ms) dwarfs a decode step's compute (~1 ms for a
1B model), so fusing K steps multiplies decode throughput by nearly K.

Host-side contract (mirrors the speculative-decode path,
``executor/spec_decode.py``):
  - the scheduler reserved K-1 lookahead slots, so cache slots for
    positions L-1 .. L+K-2 are valid for every running sequence;
  - stop conditions (EOS / stop strings / max_tokens) are checked on the
    host after the fused step; tokens past a stop point are discarded
    (bounded waste < K tokens per finishing sequence, like rejected
    speculative tokens);
  - penalty state (the uint8 token-count matrix) advances on device so
    step j+1 sees step j's sampled token.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.sampler import (SamplingTensors, sample,
                                         update_token_counts)
from vllm_ltr_tpu.models.common import AttentionMetadata


def build_multi_step_fn(model_cls, cfg, mesh, num_steps: int):
    """Returns a jitted fused decode:

    multi_step(params, kv_cache, last_tokens [S], base_pos [S],
               block_tables [S, MB], step_slots [S, K], i32_s [4, S],
               f32_s [6, S], token_counts, lora_slots, rng,
               use_penalties, has_lora, exact_sampling)
        -> (kv_cache, out_i32 [S, K, 1+L], out_f32 [S, K, 1+L], next_rng)

    out_i32[s, j] = (token, topk ids); out_f32[s, j] = (logprob,
    topk logprobs) for sequence s at fused step j.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    K = num_steps

    @functools.partial(jax.jit,
                       donate_argnums=(1, ),
                       static_argnames=("use_penalties", "has_lora",
                                        "exact_sampling"))
    def multi_step(params, kv_cache, last_tokens, base_pos, block_tables,
                   step_slots, i32_s, f32_s, token_counts, lora_slots, rng,
                   use_penalties: bool, has_lora: bool = False,
                   exact_sampling: bool = True):
        S = last_tokens.shape[0]
        st = SamplingTensors(temperature=f32_s[0],
                             top_p=f32_s[1],
                             top_k=i32_s[2],
                             min_p=f32_s[2],
                             greedy=i32_s[3] > 0,
                             presence_penalty=f32_s[3],
                             frequency_penalty=f32_s[4],
                             repetition_penalty=f32_s[5])
        rows = jnp.arange(S, dtype=jnp.int32)

        def body(carry, j):
            kv, tok, counts, key = carry
            pos = base_pos + j
            slots_j = jax.lax.dynamic_slice_in_dim(step_slots, j, 1,
                                                   axis=1)[:, 0]
            meta = AttentionMetadata(
                token_seq=rows,
                token_pos=pos,
                slot_mapping=slots_j,
                block_tables=block_tables,
                seq_lens=pos + 1,
                lora_slots=lora_slots if has_lora else None,
            )
            hidden, kv = model_cls.forward(params, tok, pos, kv, meta, cfg,
                                           decode_mode=True)
            logits = model_cls.compute_logits(params, hidden, cfg)
            if has_lora:
                from vllm_ltr_tpu.lora.models import apply_lm_head_lora
                logits = apply_lm_head_lora(params, hidden, logits,
                                            lora_slots)
            key, sub = jax.random.split(key)
            res = sample(logits, st, sub,
                         token_counts=counts if use_penalties else None,
                         exact=exact_sampling)
            if use_penalties:
                counts = update_token_counts(counts, rows, res.tokens)
            return (kv, res.tokens, counts, key), (res.tokens, res.logprobs,
                                                   res.topk_ids,
                                                   res.topk_logprobs)

        (kv_cache, _, _, next_rng), ys = jax.lax.scan(
            body, (kv_cache, last_tokens, token_counts, rng),
            jnp.arange(K, dtype=jnp.int32))
        tokens, logprobs, topk_ids, topk_lp = ys  # [K, S], .., [K, S, L]

        # Pack to [S, K, 1+L]; pinned fully-replicated so every host can
        # read its local copy without a collective.
        rep = NamedSharding(mesh, P())
        out_i32 = jax.lax.with_sharding_constraint(
            jnp.concatenate(
                [tokens.T[:, :, None],
                 jnp.transpose(topk_ids, (1, 0, 2))], axis=2), rep)
        out_f32 = jax.lax.with_sharding_constraint(
            jnp.concatenate(
                [logprobs.T[:, :, None],
                 jnp.transpose(topk_lp, (1, 0, 2))], axis=2), rep)
        return kv_cache, out_i32, out_f32, next_rng

    return multi_step
