"""Golden-output tests: our JAX models vs HF transformers (torch CPU), same
random weights — the HfRunner-vs-VllmRunner pattern from the reference's
tests/basic_correctness (SURVEY.md §4), run hermetically with tiny configs."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from vllm_ltr_tpu.models.common import AttentionMetadata
from vllm_ltr_tpu.ops.kv_cache import allocate_kv_cache
from vllm_ltr_tpu.transformers_utils.config import get_hf_config

BLOCK = 8


def make_prefill_meta(num_tokens, max_blocks, num_seqs=1):
    """Single-sequence full-prefill metadata over a fresh cache."""
    T = num_tokens
    slot = np.arange(T, dtype=np.int32)  # blocks 0.. in order
    block_tables = np.full((num_seqs, max_blocks), 0, dtype=np.int32)
    block_tables[0] = np.arange(max_blocks)
    return AttentionMetadata(
        token_seq=jnp.zeros((T, ), jnp.int32),
        token_pos=jnp.arange(T, dtype=jnp.int32),
        slot_mapping=jnp.asarray(slot),
        block_tables=jnp.asarray(block_tables),
        seq_lens=jnp.full((num_seqs, ), T, jnp.int32),
    )


def run_ours(model_cls, cfg, state_dict, token_ids, num_layers, kv_heads,
             head_dim):
    params = model_cls.params_from_torch(cfg, state_dict, jnp.float32)
    T = len(token_ids)
    max_blocks = (T + BLOCK - 1) // BLOCK
    kv = allocate_kv_cache(num_layers, max_blocks, BLOCK, kv_heads, head_dim,
                           dtype=jnp.float32)
    meta = make_prefill_meta(T, max_blocks)
    tokens = jnp.asarray(token_ids, jnp.int32)
    positions = jnp.arange(T, dtype=jnp.int32)
    hidden, kv = model_cls.forward(params, tokens, positions, kv, meta, cfg)
    logits = model_cls.compute_logits(params, hidden, cfg)
    return np.asarray(logits, dtype=np.float32), kv, params, meta


@pytest.mark.parametrize("do_layer_norm_before", [True, False])
def test_opt_matches_hf(do_layer_norm_before):
    from transformers import OPTForCausalLM as HFOPT

    cfg = get_hf_config("test-opt-tiny")
    cfg.do_layer_norm_before = do_layer_norm_before
    if not do_layer_norm_before:
        # Exercise the 350m-style projection path too.
        cfg.word_embed_proj_dim = 32
    torch.manual_seed(0)
    hf = HFOPT(cfg).eval().float()

    token_ids = list(np.random.RandomState(0).randint(0, cfg.vocab_size,
                                                      size=21))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()

    from vllm_ltr_tpu.models.opt import OPTForCausalLM
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    ours, _, _, _ = run_ours(OPTForCausalLM, cfg, hf.state_dict(), token_ids,
                             cfg.num_hidden_layers, cfg.num_attention_heads,
                             head_dim)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


def test_llama_matches_hf():
    from transformers import LlamaForCausalLM as HFLlama

    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()

    token_ids = list(np.random.RandomState(1).randint(0, cfg.vocab_size,
                                                      size=17))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()

    from vllm_ltr_tpu.models.llama import LlamaForCausalLM
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    ours, _, _, _ = run_ours(LlamaForCausalLM, cfg, hf.state_dict(),
                             token_ids, cfg.num_hidden_layers,
                             cfg.num_key_value_heads, head_dim)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


def test_llama_decode_matches_prefill():
    """Chunked prefill + decode through the paged cache must equal one-shot
    full prefill (validates write_kv slot mapping + causal masking)."""
    from transformers import LlamaForCausalLM as HFLlama
    from vllm_ltr_tpu.models.llama import LlamaForCausalLM as Ours

    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    params = Ours.params_from_torch(cfg, hf.state_dict(), jnp.float32)

    token_ids = list(np.random.RandomState(2).randint(0, cfg.vocab_size,
                                                      size=13))
    T = len(token_ids)
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    max_blocks = (T + BLOCK - 1) // BLOCK

    # One-shot prefill.
    full_logits, _, _, _ = run_ours(Ours, cfg, hf.state_dict(), token_ids,
                                    cfg.num_hidden_layers,
                                    cfg.num_key_value_heads, head_dim)

    # Chunked: prefill first 8 tokens, then decode the rest one by one.
    kv = allocate_kv_cache(cfg.num_hidden_layers, max_blocks, BLOCK,
                           cfg.num_key_value_heads, head_dim,
                           dtype=jnp.float32)
    block_tables = jnp.asarray(
        np.arange(max_blocks, dtype=np.int32)[None, :])
    chunk = 8
    meta = AttentionMetadata(
        token_seq=jnp.zeros((chunk, ), jnp.int32),
        token_pos=jnp.arange(chunk, dtype=jnp.int32),
        slot_mapping=jnp.arange(chunk, dtype=jnp.int32),
        block_tables=block_tables,
        seq_lens=jnp.asarray([chunk], jnp.int32),
    )
    hidden, kv = Ours.forward(params, jnp.asarray(token_ids[:chunk]),
                              jnp.arange(chunk, dtype=jnp.int32), kv, meta,
                              cfg)
    last_logits = [np.asarray(Ours.compute_logits(params, hidden, cfg))[-1]]
    for pos in range(chunk, T):
        meta = AttentionMetadata(
            token_seq=jnp.zeros((1, ), jnp.int32),
            token_pos=jnp.asarray([pos], jnp.int32),
            slot_mapping=jnp.asarray([pos], jnp.int32),
            block_tables=block_tables,
            seq_lens=jnp.asarray([pos + 1], jnp.int32),
        )
        hidden, kv = Ours.forward(params, jnp.asarray([token_ids[pos]]),
                                  jnp.asarray([pos], jnp.int32), kv, meta,
                                  cfg)
        last_logits.append(
            np.asarray(Ours.compute_logits(params, hidden, cfg))[-1])

    np.testing.assert_allclose(last_logits[-1], full_logits[-1], rtol=2e-4,
                               atol=2e-4)
    # Intermediate decode steps must match the full-prefill rows as well.
    for i, pos in enumerate(range(chunk - 1, T)):
        np.testing.assert_allclose(last_logits[i], full_logits[pos],
                                   rtol=2e-4, atol=2e-4)


def test_opt_classifier_score_head():
    """OPTForSequenceClassification scores the last token; must match HF."""
    from transformers import OPTForSequenceClassification as HFCls
    from vllm_ltr_tpu.models.opt import OPTForSequenceClassification as Ours

    cfg = get_hf_config("test-opt-tiny")
    cfg.num_labels = 1
    torch.manual_seed(0)
    hf = HFCls(cfg).eval().float()

    token_ids = list(np.random.RandomState(3).randint(1, cfg.vocab_size,
                                                      size=11))
    with torch.no_grad():
        hf_score = hf(torch.tensor([token_ids])).logits[0].numpy()

    head_dim = cfg.hidden_size // cfg.num_attention_heads
    ours, _, _, _ = run_ours(Ours, cfg, hf.state_dict(), token_ids,
                             cfg.num_hidden_layers, cfg.num_attention_heads,
                             head_dim)
    # HF pools the last non-pad token; with no padding that's the last row.
    np.testing.assert_allclose(ours[-1], hf_score[0], rtol=2e-4, atol=2e-4)
