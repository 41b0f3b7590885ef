"""Model-zoo golden tests: each architecture's logits must match HF
transformers with the same weights (per-arch tests/models pattern from the
reference)."""
import numpy as np
import pytest
import jax.numpy as jnp
import torch

from vllm_ltr_tpu.transformers_utils.config import get_hf_config

from .test_vs_hf import BLOCK, run_ours


CASES = [
    ("test-qwen2-tiny", "Qwen2ForCausalLM",
     "vllm_ltr_tpu.models.qwen2", "Qwen2ForCausalLM"),
    ("test-gpt2-tiny", "GPT2LMHeadModel",
     "vllm_ltr_tpu.models.gpt2", "GPT2LMHeadModel"),
    ("test-gemma-tiny", "GemmaForCausalLM",
     "vllm_ltr_tpu.models.gemma", "GemmaForCausalLM"),
    ("test-mixtral-tiny", "MixtralForCausalLM",
     "vllm_ltr_tpu.models.mixtral", "MixtralForCausalLM"),
]


@pytest.mark.parametrize("cfg_name,hf_cls_name,module,our_cls_name", CASES)
def test_arch_matches_hf(cfg_name, hf_cls_name, module, our_cls_name):
    import importlib
    import transformers

    cfg = get_hf_config(cfg_name)
    hf_cls = getattr(transformers, hf_cls_name)
    torch.manual_seed(0)
    hf = hf_cls(cfg).eval().float()

    token_ids = list(
        np.random.RandomState(0).randint(1, cfg.vocab_size, size=19))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()

    our_cls = getattr(importlib.import_module(module), our_cls_name)
    if cfg_name == "test-gemma-tiny":
        kv_heads = cfg.num_key_value_heads
        head_dim = cfg.head_dim
    elif cfg_name == "test-gpt2-tiny":
        kv_heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // cfg.num_attention_heads
    else:
        kv_heads = cfg.num_key_value_heads
        head_dim = cfg.hidden_size // cfg.num_attention_heads

    ours, _, _, _ = run_ours(our_cls, cfg, hf.state_dict(), token_ids,
                             cfg.num_hidden_layers, kv_heads, head_dim)
    # Mixtral's HF implementation routes in f32 with subtle ordering diffs;
    # allow a slightly looser tolerance there.
    tol = 5e-3 if "mixtral" in cfg_name else 5e-4
    np.testing.assert_allclose(ours, hf_logits, rtol=tol, atol=tol)


def test_registry_resolves_all():
    from vllm_ltr_tpu.models import resolve_model_cls
    for _, arch, module, our_cls_name in CASES:
        cls = resolve_model_cls([arch])
        assert cls.__name__ == our_cls_name


def test_moe_capacity_drop_is_bounded():
    """fused_moe with tight capacity still routes most tokens."""
    import jax
    from vllm_ltr_tpu.layers.moe import fused_moe
    rng = np.random.RandomState(0)
    T, H, I, E = 32, 16, 32, 4
    hidden = jnp.asarray(rng.normal(size=(T, H)), jnp.float32)
    router = jnp.asarray(rng.normal(size=(T, E)), jnp.float32)
    gw = jnp.asarray(rng.normal(size=(E, H, I)) * 0.1, jnp.float32)
    uw = jnp.asarray(rng.normal(size=(E, H, I)) * 0.1, jnp.float32)
    dw = jnp.asarray(rng.normal(size=(E, I, H)) * 0.1, jnp.float32)
    out = fused_moe(hidden, router, gw, uw, dw, top_k=2)
    assert np.isfinite(np.asarray(out)).all()
    # Compare against dense per-token expert computation (no capacity).
    w, idx = jax.lax.top_k(jax.nn.softmax(router, axis=-1), 2)
    w = w / w.sum(axis=-1, keepdims=True)
    expected = np.zeros((T, H), np.float32)
    for t in range(T):
        for kk in range(2):
            e = int(idx[t, kk])
            x = np.asarray(hidden[t])
            g = np.asarray(x @ gw[e])
            u = np.asarray(x @ uw[e])
            act = g / (1 + np.exp(-g)) * u
            expected[t] += float(w[t, kk]) * (act @ np.asarray(dw[e]))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-3,
                               atol=2e-3)
