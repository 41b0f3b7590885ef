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
    ("test-falcon-tiny", "FalconForCausalLM",
     "vllm_ltr_tpu.models.falcon", "FalconForCausalLM"),
    ("test-phi-tiny", "PhiForCausalLM",
     "vllm_ltr_tpu.models.phi", "PhiForCausalLM"),
    ("test-mpt-tiny", "MptForCausalLM",
     "vllm_ltr_tpu.models.mpt", "MptForCausalLM"),
    ("test-starcoder2-tiny", "Starcoder2ForCausalLM",
     "vllm_ltr_tpu.models.starcoder2", "Starcoder2ForCausalLM"),
    ("test-qwen2moe-tiny", "Qwen2MoeForCausalLM",
     "vllm_ltr_tpu.models.qwen2_moe", "Qwen2MoeForCausalLM"),
    ("test-glm-tiny", "GlmForCausalLM",
     "vllm_ltr_tpu.models.chatglm", "GlmForCausalLM"),
    ("test-bloom-tiny", "BloomForCausalLM",
     "vllm_ltr_tpu.models.bloom", "BloomForCausalLM"),
    ("test-gptneox-tiny", "GPTNeoXForCausalLM",
     "vllm_ltr_tpu.models.gpt_neox", "GPTNeoXForCausalLM"),
    ("test-gptj-tiny", "GPTJForCausalLM",
     "vllm_ltr_tpu.models.gpt_j", "GPTJForCausalLM"),
    ("test-bigcode-tiny", "GPTBigCodeForCausalLM",
     "vllm_ltr_tpu.models.gpt_bigcode", "GPTBigCodeForCausalLM"),
    ("test-stablelm-tiny", "StableLmForCausalLM",
     "vllm_ltr_tpu.models.stablelm", "StableLmForCausalLM"),
    ("test-olmo-tiny", "OlmoForCausalLM",
     "vllm_ltr_tpu.models.olmo", "OlmoForCausalLM"),
    ("test-cohere-tiny", "CohereForCausalLM",
     "vllm_ltr_tpu.models.commandr", "CohereForCausalLM"),
    ("test-dbrx-tiny", "DbrxForCausalLM",
     "vllm_ltr_tpu.models.dbrx", "DbrxForCausalLM"),
    # InternLM v1 / Aquila / Smaug: llama arch with attention biases.
    ("test-llama-bias-tiny", "LlamaForCausalLM",
     "vllm_ltr_tpu.models.llama", "LlamaForCausalLM"),
]


def _geometry(cfg):
    """(num layers, kv heads, head_dim) for the paged cache."""
    mt = getattr(cfg, "model_type", "")
    if mt == "mpt":
        return cfg.n_layers, cfg.n_heads, cfg.d_model // cfg.n_heads
    if mt == "falcon":
        kv = (cfg.num_kv_heads if cfg.new_decoder_architecture else
              (1 if cfg.multi_query else cfg.num_attention_heads))
        return (cfg.num_hidden_layers, kv,
                cfg.hidden_size // cfg.num_attention_heads)
    if mt in ("gpt2", "bloom", "gpt_neox", "gptj"):
        return (cfg.num_hidden_layers, cfg.num_attention_heads,
                cfg.hidden_size // cfg.num_attention_heads)
    if mt == "gpt_bigcode":
        kv = 1 if cfg.multi_query else cfg.num_attention_heads
        return (cfg.num_hidden_layers, kv,
                cfg.hidden_size // cfg.num_attention_heads)
    if mt == "dbrx":
        return (cfg.n_layers, cfg.attn_config.kv_n_heads,
                cfg.d_model // cfg.n_heads)
    head_dim = (getattr(cfg, "head_dim", None)
                or cfg.hidden_size // cfg.num_attention_heads)
    kv = getattr(cfg, "num_key_value_heads", None) or cfg.num_attention_heads
    return cfg.num_hidden_layers, kv, head_dim


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
    layers, kv_heads, head_dim = _geometry(cfg)
    ours, _, _, _ = run_ours(our_cls, cfg, hf.state_dict(), token_ids,
                             layers, kv_heads, head_dim)
    # MoE models route in f32 with subtle ordering differences; allow a
    # slightly looser tolerance there.
    tol = 5e-3 if ("mixtral" in cfg_name or "moe" in cfg_name) else 5e-4
    np.testing.assert_allclose(ours, hf_logits, rtol=tol, atol=tol)


def test_registry_resolves_all():
    from vllm_ltr_tpu.models import resolve_model_cls
    for _, arch, module, our_cls_name in CASES:
        cls = resolve_model_cls([arch])
        assert cls.__name__ == our_cls_name
    # Llama-compatible aliases (reference models/__init__.py:13-14,31).
    for alias in ("InternLMForCausalLM", "AquilaForCausalLM", "AquilaModel"):
        assert resolve_model_cls([alias]).__name__ == "LlamaForCausalLM"


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


# ---------------------------------------------------------------------------
# Architectures without an in-tree HF class (Baichuan, InternLM2, DeepSeek):
# validated by weight-converting a Llama checkpoint into their naming and
# asserting identical logits with our Llama implementation.
# ---------------------------------------------------------------------------


def _llama_reference(seed=3, n_tokens=15):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(seed)
    hf = HFLlama(cfg).eval().float()
    token_ids = list(
        np.random.RandomState(seed).randint(1, cfg.vocab_size,
                                            size=n_tokens))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    return cfg, hf.state_dict(), token_ids, hf_logits


def test_baichuan_matches_converted_llama():
    cfg, sd, token_ids, hf_logits = _llama_reference(seed=4)
    # Baichuan = llama with MHA + fused W_pack; test-llama-tiny is GQA, so
    # expand k/v to full heads first? No: build an MHA llama instead.
    from transformers import LlamaConfig, LlamaForCausalLM as HFLlama
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, max_position_embeddings=512)
    torch.manual_seed(4)
    hf = HFLlama(cfg).eval().float()
    sd = hf.state_dict()
    token_ids = list(np.random.RandomState(4).randint(1, 512, size=15))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()

    bsd = {}
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        bsd[p + "self_attn.W_pack.weight"] = torch.cat([
            sd[p + "self_attn.q_proj.weight"],
            sd[p + "self_attn.k_proj.weight"],
            sd[p + "self_attn.v_proj.weight"],
        ])
        for name in ("self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj",
                     "mlp.down_proj", "input_layernorm",
                     "post_attention_layernorm"):
            bsd[p + name + ".weight"] = sd[p + name + ".weight"]
    bsd["model.embed_tokens.weight"] = sd["model.embed_tokens.weight"]
    bsd["model.norm.weight"] = sd["model.norm.weight"]
    bsd["lm_head.weight"] = sd.get("lm_head.weight",
                                   sd["model.embed_tokens.weight"])

    from vllm_ltr_tpu.models.baichuan import BaichuanForCausalLM
    bcfg = get_hf_config("test-baichuan-tiny")
    ours, _, _, _ = run_ours(BaichuanForCausalLM, bcfg, bsd, token_ids,
                             cfg.num_hidden_layers, 4, 16)
    np.testing.assert_allclose(ours, hf_logits, rtol=5e-4, atol=5e-4)


def test_internlm2_matches_converted_llama():
    cfg, sd, token_ids, hf_logits = _llama_reference(seed=5)
    QH, KH = cfg.num_attention_heads, cfg.num_key_value_heads
    D = cfg.hidden_size // QH
    G = QH // KH
    isd = {}
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        q = sd[p + "self_attn.q_proj.weight"].view(KH, G, D, -1)
        k = sd[p + "self_attn.k_proj.weight"].view(KH, 1, D, -1)
        v = sd[p + "self_attn.v_proj.weight"].view(KH, 1, D, -1)
        wqkv = torch.cat([q, k, v], dim=1).reshape(-1, cfg.hidden_size)
        isd[p + "attention.wqkv.weight"] = wqkv
        isd[p + "attention.wo.weight"] = sd[p + "self_attn.o_proj.weight"]
        isd[p + "feed_forward.w1.weight"] = sd[p + "mlp.gate_proj.weight"]
        isd[p + "feed_forward.w3.weight"] = sd[p + "mlp.up_proj.weight"]
        isd[p + "feed_forward.w2.weight"] = sd[p + "mlp.down_proj.weight"]
        isd[p + "attention_norm.weight"] = sd[p + "input_layernorm.weight"]
        isd[p + "ffn_norm.weight"] = sd[p + "post_attention_layernorm"
                                        ".weight"]
    isd["model.tok_embeddings.weight"] = sd["model.embed_tokens.weight"]
    isd["model.norm.weight"] = sd["model.norm.weight"]
    isd["output.weight"] = sd.get("lm_head.weight",
                                  sd["model.embed_tokens.weight"])

    from vllm_ltr_tpu.models.internlm2 import InternLM2ForCausalLM
    icfg = get_hf_config("test-internlm2-tiny")
    ours, _, _, _ = run_ours(InternLM2ForCausalLM, icfg, isd, token_ids,
                             cfg.num_hidden_layers, KH, D)
    np.testing.assert_allclose(ours, hf_logits, rtol=5e-4, atol=5e-4)


def test_deepseek_dense_matches_converted_llama():
    """DeepSeek with every layer dense (n_routed_experts unset) must equal
    the Llama body it shares."""
    cfg, sd, token_ids, hf_logits = _llama_reference(seed=6)
    dsd = {k: v for k, v in sd.items()}
    if "lm_head.weight" not in dsd:
        dsd["lm_head.weight"] = dsd["model.embed_tokens.weight"]
    from vllm_ltr_tpu.models.deepseek import DeepseekForCausalLM
    from vllm_ltr_tpu.transformers_utils.config import _shim_config
    dcfg = _shim_config(model_type="deepseek",
                        architectures=["DeepseekForCausalLM"],
                        vocab_size=512, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        rms_norm_eps=1e-6, max_position_embeddings=512)
    ours, _, _, _ = run_ours(DeepseekForCausalLM, dcfg, dsd, token_ids, 2,
                             2, 16)
    np.testing.assert_allclose(ours, hf_logits, rtol=5e-4, atol=5e-4)


def test_deepseek_moe_runs_and_captures():
    """Sparse DeepSeek: finite output + the embedded-predictor capture hook
    (reference deepseek.py:354-359)."""
    import jax
    import jax.numpy as jnp
    from vllm_ltr_tpu.models.deepseek import DeepseekForCausalLM
    from vllm_ltr_tpu.ops.kv_cache import allocate_kv_cache

    cfg = get_hf_config("test-deepseek-tiny")
    params = DeepseekForCausalLM.init_params(cfg, jax.random.PRNGKey(0),
                                             jnp.float32)
    T = 12
    kv = allocate_kv_cache(cfg.num_hidden_layers, 4, BLOCK, 2, 16,
                           dtype=jnp.float32)
    from .test_vs_hf import make_prefill_meta
    meta = make_prefill_meta(T, 4)
    tokens = jnp.arange(1, T + 1, dtype=jnp.int32)
    positions = jnp.arange(T, dtype=jnp.int32)
    h, kv2, cap = DeepseekForCausalLM.forward(params, tokens, positions, kv,
                                              meta, cfg, capture_layer=1)
    assert np.isfinite(np.asarray(h)).all()
    assert cap.shape == h.shape


def test_qwen_matches_converted_llama():
    """Qwen v1 with zero c_attn bias == an MHA Llama (gate=w2, up=w1)."""
    from transformers import LlamaConfig, LlamaForCausalLM as HFLlama
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, max_position_embeddings=512,
                      rms_norm_eps=1e-6)
    torch.manual_seed(7)
    hf = HFLlama(cfg).eval().float()
    sd = hf.state_dict()
    token_ids = list(np.random.RandomState(7).randint(1, 512, size=15))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()

    qsd = {}
    for i in range(2):
        p = f"model.layers.{i}."
        qsd[f"transformer.h.{i}.attn.c_attn.weight"] = torch.cat([
            sd[p + "self_attn.q_proj.weight"],
            sd[p + "self_attn.k_proj.weight"],
            sd[p + "self_attn.v_proj.weight"],
        ])
        qsd[f"transformer.h.{i}.attn.c_attn.bias"] = torch.zeros(3 * 64)
        qsd[f"transformer.h.{i}.attn.c_proj.weight"] = sd[
            p + "self_attn.o_proj.weight"]
        qsd[f"transformer.h.{i}.mlp.w2.weight"] = sd[p + "mlp.gate_proj"
                                                     ".weight"]
        qsd[f"transformer.h.{i}.mlp.w1.weight"] = sd[p + "mlp.up_proj"
                                                     ".weight"]
        qsd[f"transformer.h.{i}.mlp.c_proj.weight"] = sd[p + "mlp.down_proj"
                                                         ".weight"]
        qsd[f"transformer.h.{i}.ln_1.weight"] = sd[p + "input_layernorm"
                                                   ".weight"]
        qsd[f"transformer.h.{i}.ln_2.weight"] = sd[
            p + "post_attention_layernorm.weight"]
    qsd["transformer.wte.weight"] = sd["model.embed_tokens.weight"]
    qsd["transformer.ln_f.weight"] = sd["model.norm.weight"]
    qsd["lm_head.weight"] = sd.get("lm_head.weight",
                                   sd["model.embed_tokens.weight"])

    from vllm_ltr_tpu.models.qwen import QWenLMHeadModel
    qcfg = get_hf_config("test-qwen-tiny")
    ours, _, _, _ = run_ours(QWenLMHeadModel, qcfg, qsd, token_ids, 2, 4, 16)
    np.testing.assert_allclose(ours, hf_logits, rtol=5e-4, atol=5e-4)


def test_orion_matches_layernormed_llama():
    """Orion = Llama with biased LayerNorm: swap the norms on an HF Llama
    instance and compare."""
    from transformers import LlamaConfig, LlamaForCausalLM as HFLlama
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512,
                      rms_norm_eps=1e-5)
    torch.manual_seed(8)
    hf = HFLlama(cfg).eval().float()
    gen = torch.Generator().manual_seed(8)
    for mod in [hf.model.layers[i] for i in range(2)]:
        for name in ("input_layernorm", "post_attention_layernorm"):
            ln = torch.nn.LayerNorm(64, eps=1e-5)
            with torch.no_grad():
                ln.weight.copy_(torch.rand(64, generator=gen) + 0.5)
                ln.bias.copy_(torch.rand(64, generator=gen) - 0.5)
            setattr(mod, name, ln)
    ln_f = torch.nn.LayerNorm(64, eps=1e-5)
    with torch.no_grad():
        ln_f.weight.copy_(torch.rand(64, generator=gen) + 0.5)
        ln_f.bias.copy_(torch.rand(64, generator=gen) - 0.5)
    hf.model.norm = ln_f

    token_ids = list(np.random.RandomState(8).randint(1, 512, size=15))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()

    sd = hf.state_dict()
    if "lm_head.weight" not in sd:
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    from vllm_ltr_tpu.models.orion import OrionForCausalLM
    ocfg = get_hf_config("test-orion-tiny")
    ours, _, _, _ = run_ours(OrionForCausalLM, ocfg, sd, token_ids, 2, 2, 16)
    np.testing.assert_allclose(ours, hf_logits, rtol=5e-4, atol=5e-4)


def test_minicpm_dense_neutral_scales_matches_llama():
    """MiniCPM with scale_emb=1, scale_depth=sqrt(L), dim_model_base=H and
    no experts is exactly Llama."""
    import math
    cfg, sd, token_ids, hf_logits = _llama_reference(seed=9)
    from vllm_ltr_tpu.models.minicpm import MiniCPMForCausalLM
    from vllm_ltr_tpu.transformers_utils.config import _shim_config
    mcfg = _shim_config(model_type="minicpm",
                        architectures=["MiniCPMForCausalLM"],
                        vocab_size=512, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        rms_norm_eps=1e-6, max_position_embeddings=512,
                        scale_emb=1.0, scale_depth=math.sqrt(2),
                        dim_model_base=64, tie_word_embeddings=False)
    msd = dict(sd)
    if "lm_head.weight" not in msd:
        msd["lm_head.weight"] = msd["model.embed_tokens.weight"]
    ours, _, _, _ = run_ours(MiniCPMForCausalLM, mcfg, msd, token_ids, 2, 2,
                             16)
    np.testing.assert_allclose(ours, hf_logits, rtol=5e-4, atol=5e-4)


def test_minicpm_moe_with_scales_is_finite():
    import jax
    import jax.numpy as jnp
    from vllm_ltr_tpu.models.minicpm import MiniCPMForCausalLM
    from vllm_ltr_tpu.ops.kv_cache import allocate_kv_cache
    from .test_vs_hf import make_prefill_meta

    cfg = get_hf_config("test-minicpm-tiny")
    params = MiniCPMForCausalLM.init_params(cfg, jax.random.PRNGKey(0),
                                            jnp.float32)
    T = 12
    kv = allocate_kv_cache(2, 4, BLOCK, 2, 16, dtype=jnp.float32)
    meta = make_prefill_meta(T, 4)
    tokens = jnp.arange(1, T + 1, dtype=jnp.int32)
    h, _ = MiniCPMForCausalLM.forward(params, tokens,
                                      jnp.arange(T, dtype=jnp.int32), kv,
                                      meta, cfg)
    logits = MiniCPMForCausalLM.compute_logits(params, h, cfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_jais_learned_positions_matches_gpt2():
    """Jais with learned positions, gelu activation, and unit scales is
    exactly GPT-2 (same state dict)."""
    from transformers import GPT2LMHeadModel as HFGPT2
    cfg = get_hf_config("test-gpt2-tiny")
    torch.manual_seed(10)
    hf = HFGPT2(cfg).eval().float()
    token_ids = list(np.random.RandomState(10).randint(1, cfg.vocab_size,
                                                       size=15))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()

    cfg.position_embedding_type = "learned"
    cfg.activation_function = "gelu_new"
    from vllm_ltr_tpu.models.jais import JAISLMHeadModel
    NH = cfg.num_attention_heads
    D = cfg.hidden_size // NH
    ours, _, _, _ = run_ours(JAISLMHeadModel, cfg, hf.state_dict(),
                             token_ids, cfg.num_hidden_layers, NH, D)
    np.testing.assert_allclose(ours, hf_logits, rtol=5e-4, atol=5e-4)


def test_jais_alibi_swiglu_mup_is_finite():
    import jax
    import jax.numpy as jnp
    from vllm_ltr_tpu.models.jais import JAISLMHeadModel
    from vllm_ltr_tpu.ops.kv_cache import allocate_kv_cache
    from .test_vs_hf import make_prefill_meta

    cfg = get_hf_config("test-jais-tiny")
    params = JAISLMHeadModel.init_params(cfg, jax.random.PRNGKey(1),
                                         jnp.float32)
    assert "wpe" not in params  # alibi mode has no learned positions
    T = 12
    kv = allocate_kv_cache(2, 4, BLOCK, 4, 16, dtype=jnp.float32)
    meta = make_prefill_meta(T, 4)
    tokens = jnp.arange(1, T + 1, dtype=jnp.int32)
    h, _ = JAISLMHeadModel.forward(params, tokens,
                                   jnp.arange(T, dtype=jnp.int32), kv, meta,
                                   cfg)
    logits = JAISLMHeadModel.compute_logits(params, h, cfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_decilm_variable_gqa_matches_hf():
    """DeciLM's per-layer KV head degrouping is exact: an HF Llama whose
    layer-1 K/V heads come in duplicated pairs equals our DeciLM loaded
    from the deduplicated (variable-GQA) checkpoint."""
    from transformers import LlamaConfig, LlamaForCausalLM as HFLlama
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, max_position_embeddings=512,
                      rms_norm_eps=1e-6)
    torch.manual_seed(11)
    hf = HFLlama(cfg).eval().float()
    # Duplicate layer 1's K/V head pairs: rows become [h0, h0, h2, h2].
    D = 16
    with torch.no_grad():
        for name in ("k_proj", "v_proj"):
            w = getattr(hf.model.layers[1].self_attn, name).weight
            w4 = w.view(4, D, 64)
            w.copy_(torch.stack([w4[0], w4[0], w4[2], w4[2]]).view(64, 64))
    token_ids = list(np.random.RandomState(11).randint(1, 512, size=15))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()

    # DeciLM checkpoint: layer 0 keeps 4 KV heads, layer 1 stores only the
    # two distinct heads.
    sd = dict(hf.state_dict())
    for name in ("k_proj", "v_proj"):
        w = sd[f"model.layers.1.self_attn.{name}.weight"].view(4, D, 64)
        sd[f"model.layers.1.self_attn.{name}.weight"] = torch.cat(
            [w[0], w[2]])
    if "lm_head.weight" not in sd:
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]

    from vllm_ltr_tpu.models.decilm import DeciLMForCausalLM
    dcfg = get_hf_config("test-decilm-tiny")
    ours, _, _, _ = run_ours(DeciLMForCausalLM, dcfg, sd, token_ids, 2, 4,
                             16)
    np.testing.assert_allclose(ours, hf_logits, rtol=5e-4, atol=5e-4)


def test_llava_matches_hf():
    """LLaVA: CLIP tower + projector + Llama with image-token merging must
    match HF LlavaForConditionalGeneration on pixel inputs."""
    import jax
    import jax.numpy as jnp
    from transformers import LlavaForConditionalGeneration as HFLlava
    from vllm_ltr_tpu.models.llava import LlavaForConditionalGeneration
    from vllm_ltr_tpu.ops.kv_cache import allocate_kv_cache
    from .test_vs_hf import make_prefill_meta

    cfg = get_hf_config("test-llava-tiny")
    torch.manual_seed(12)
    hf = HFLlava(cfg).eval().float()

    rng = np.random.RandomState(12)
    n_img_tokens = 16  # (32 / 8)^2
    text = list(rng.randint(1, 120, size=7))
    token_ids = [cfg.image_token_index] * n_img_tokens + text
    pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor([token_ids]),
                       pixel_values=torch.tensor(pixels),
                       attention_mask=torch.ones(1, len(token_ids),
                                                 dtype=torch.long),
                       ).logits[0].numpy()

    params = LlavaForConditionalGeneration.params_from_torch(
        cfg, hf.state_dict(), jnp.float32)
    feats = LlavaForConditionalGeneration.encode_images(
        params, jnp.asarray(pixels), cfg)  # [1, 16, 64]
    T = len(token_ids)
    image_embeds = np.zeros((T, 64), np.float32)
    image_embeds[:n_img_tokens] = np.asarray(feats[0])

    max_blocks = (T + BLOCK - 1) // BLOCK
    kv = allocate_kv_cache(2, max_blocks, BLOCK, 2, 16, dtype=jnp.float32)
    meta = make_prefill_meta(T, max_blocks)
    hidden, _ = LlavaForConditionalGeneration.forward(
        params, jnp.asarray(token_ids, jnp.int32),
        jnp.arange(T, dtype=jnp.int32), kv, meta, cfg,
        image_embeds=jnp.asarray(image_embeds))
    ours = np.asarray(
        LlavaForConditionalGeneration.compute_logits(params, hidden, cfg),
        dtype=np.float32)
    np.testing.assert_allclose(ours, hf_logits, rtol=1e-3, atol=1e-3)
