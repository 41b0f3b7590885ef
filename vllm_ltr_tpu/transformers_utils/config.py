"""HF config resolution (counterpart of reference vllm/transformers_utils/config.py).

Works fully offline: ``model`` may be a local directory containing
``config.json``, or a built-in test-architecture name (``test-opt-125m`` etc.)
for hermetic tests without network access.
"""
from __future__ import annotations

import os
from typing import Any, Optional

from transformers import (AutoConfig, BloomConfig, CohereConfig, DbrxConfig,
                          FalconConfig, GPT2Config, GPTBigCodeConfig,
                          GPTJConfig, GPTNeoXConfig, GemmaConfig, GlmConfig,
                          LlamaConfig, MixtralConfig, MptConfig, OPTConfig,
                          OlmoConfig, PhiConfig, PretrainedConfig,
                          Qwen2Config, Qwen2MoeConfig, StableLmConfig,
                          Starcoder2Config)

def _shim_config(**kwargs) -> PretrainedConfig:
    """Config shim for architectures whose HF class needs remote code
    (Baichuan, InternLM2, DeepSeek v1): a plain PretrainedConfig carrying
    the fields our implementations read."""
    cfg = PretrainedConfig()
    for k, v in kwargs.items():
        setattr(cfg, k, v)
    return cfg


# Built-in tiny configs for hermetic tests / benchmarks (random weights).
_BUILTIN_CONFIGS = {
    "test-opt-tiny": lambda: OPTConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        ffn_dim=128,
        num_attention_heads=4,
        max_position_embeddings=512,
        word_embed_proj_dim=64,
    ),
    "test-opt-125m": lambda: OPTConfig(
        vocab_size=50272,
        hidden_size=768,
        num_hidden_layers=12,
        ffn_dim=3072,
        num_attention_heads=12,
        max_position_embeddings=2048,
        word_embed_proj_dim=768,
    ),
    "test-llama-tiny": lambda: LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
    ),
    "test-qwen2-tiny": lambda: Qwen2Config(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
    ),
    "test-gpt2-tiny": lambda: GPT2Config(
        vocab_size=512,
        n_embd=64,
        n_layer=2,
        n_head=4,
        n_positions=512,
    ),
    "test-gemma-tiny": lambda: GemmaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
    ),
    "test-mixtral-tiny": lambda: MixtralConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=512,
    ),
    "test-falcon-tiny": lambda: FalconConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_kv_heads=2,
        new_decoder_architecture=True,
        bias=False,
        alibi=False,
        max_position_embeddings=512,
    ),
    "test-phi-tiny": lambda: PhiConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        partial_rotary_factor=0.5,
        max_position_embeddings=512,
    ),
    "test-mpt-tiny": lambda: MptConfig(
        vocab_size=512,
        d_model=64,
        n_layers=2,
        n_heads=4,
        expansion_ratio=2,
        max_seq_len=512,
    ),
    "test-starcoder2-tiny": lambda: Starcoder2Config(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        sliding_window=None,
    ),
    "test-qwen2moe-tiny": lambda: Qwen2MoeConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=48,
        shared_expert_intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_experts=4,
        num_experts_per_tok=2,
        decoder_sparse_step=1,
        max_position_embeddings=512,
    ),
    "test-glm-tiny": lambda: GlmConfig(
        vocab_size=512,
        pad_token_id=0,
        eos_token_id=1,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
    ),
    "test-bloom-tiny": lambda: BloomConfig(
        vocab_size=512,
        hidden_size=64,
        n_layer=2,
        n_head=4,
    ),
    "test-gptneox-tiny": lambda: GPTNeoXConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        rotary_pct=0.25,
        max_position_embeddings=512,
    ),
    "test-gptj-tiny": lambda: GPTJConfig(
        vocab_size=512,
        n_embd=64,
        n_layer=2,
        n_head=4,
        rotary_dim=8,
        n_positions=512,
    ),
    "test-bigcode-tiny": lambda: GPTBigCodeConfig(
        vocab_size=512,
        n_embd=64,
        n_layer=2,
        n_head=4,
        multi_query=True,
        n_positions=512,
    ),
    "test-stablelm-tiny": lambda: StableLmConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        partial_rotary_factor=0.25,
        use_qkv_bias=True,
        # qk_layernorm is supported by our implementation but cannot be
        # golden-tested: HF's _init_weights crashes on its bias-less
        # per-head LayerNorms (transformers 4.57, modeling_stablelm.py:643).
        qk_layernorm=False,
        max_position_embeddings=512,
    ),
    "test-olmo-tiny": lambda: OlmoConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        clip_qkv=8.0,
        tie_word_embeddings=False,
        max_position_embeddings=512,
    ),
    "test-cohere-tiny": lambda: CohereConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        use_qk_norm=True,
        logit_scale=0.125,
        max_position_embeddings=512,
    ),
    "test-dbrx-tiny": lambda: DbrxConfig(
        vocab_size=512,
        d_model=64,
        n_layers=2,
        n_heads=4,
        max_seq_len=512,
        attn_config={"kv_n_heads": 2, "clip_qkv": 8.0,
                     "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4,
                    "moe_top_k": 2, "moe_normalize_expert_weights": 1.0},
    ),
    "test-internlm2-tiny": lambda: _shim_config(
        model_type="internlm2",
        architectures=["InternLM2ForCausalLM"],
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        max_position_embeddings=512,
    ),
    "test-baichuan-tiny": lambda: _shim_config(
        model_type="baichuan",
        architectures=["BaichuanForCausalLM"],
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        rms_norm_eps=1e-6,
        max_position_embeddings=512,
    ),
    "test-deepseek-tiny": lambda: _shim_config(
        model_type="deepseek",
        architectures=["DeepseekForCausalLM"],
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=48,
        n_routed_experts=4,
        n_shared_experts=1,
        num_experts_per_tok=2,
        first_k_dense_replace=1,
        moe_layer_freq=1,
        norm_topk_prob=False,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-6,
        max_position_embeddings=512,
    ),
    "pred-opt-bench": lambda: OPTConfig(
        vocab_size=8192,
        hidden_size=128,
        num_hidden_layers=2,
        ffn_dim=256,
        num_attention_heads=4,
        max_position_embeddings=512,
        word_embed_proj_dim=128,
    ),
    "bench-llama-s": lambda: LlamaConfig(
        vocab_size=8192,
        hidden_size=512,
        intermediate_size=1408,
        num_hidden_layers=8,
        num_attention_heads=8,
        num_key_value_heads=8,
        max_position_embeddings=1024,
    ),
    "test-llama-1b": lambda: LlamaConfig(
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=5504,
        num_hidden_layers=22,
        num_attention_heads=16,
        num_key_value_heads=16,
        max_position_embeddings=2048,
    ),
    "test-llama-8b": lambda: LlamaConfig(
        vocab_size=128256,
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        max_position_embeddings=8192,
        rope_theta=500000.0,
    ),
}


def get_hf_config(model: str,
                  trust_remote_code: bool = False,
                  revision: Optional[str] = None) -> PretrainedConfig:
    if model in _BUILTIN_CONFIGS:
        config = _BUILTIN_CONFIGS[model]()
        if not getattr(config, "architectures", None):
            # OPTConfig/LlamaConfig don't set architectures by default.
            arch = {
                "opt": ["OPTForCausalLM"],
                "llama": ["LlamaForCausalLM"],
                "qwen2": ["Qwen2ForCausalLM"],
                "gpt2": ["GPT2LMHeadModel"],
                "gemma": ["GemmaForCausalLM"],
                "mixtral": ["MixtralForCausalLM"],
                "falcon": ["FalconForCausalLM"],
                "phi": ["PhiForCausalLM"],
                "mpt": ["MptForCausalLM"],
                "starcoder2": ["Starcoder2ForCausalLM"],
                "qwen2_moe": ["Qwen2MoeForCausalLM"],
                "glm": ["GlmForCausalLM"],
                "bloom": ["BloomForCausalLM"],
                "gpt_neox": ["GPTNeoXForCausalLM"],
                "gptj": ["GPTJForCausalLM"],
                "gpt_bigcode": ["GPTBigCodeForCausalLM"],
                "stablelm": ["StableLmForCausalLM"],
                "olmo": ["OlmoForCausalLM"],
                "cohere": ["CohereForCausalLM"],
                "dbrx": ["DbrxForCausalLM"],
            }[config.model_type]
            config.architectures = arch
        return config
    if os.path.isdir(model):
        return AutoConfig.from_pretrained(
            model, trust_remote_code=trust_remote_code, revision=revision)
    raise ValueError(
        f"Cannot resolve model config for {model!r}: not a local directory "
        "and not a built-in test architecture. (This build runs offline; "
        "download weights out-of-band.)")


def register_builtin_config(name: str, factory) -> None:
    _BUILTIN_CONFIGS[name] = factory
