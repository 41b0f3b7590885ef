"""HF config resolution (counterpart of reference vllm/transformers_utils/config.py).

Works fully offline: ``model`` may be a local directory containing
``config.json``, or a built-in test-architecture name (``test-opt-125m`` etc.)
for hermetic tests without network access.
"""
from __future__ import annotations

import os
from typing import Any, Optional

from transformers import (AutoConfig, GPT2Config, GemmaConfig,
                          LlamaConfig, MixtralConfig, OPTConfig,
                          PretrainedConfig, Qwen2Config)

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
