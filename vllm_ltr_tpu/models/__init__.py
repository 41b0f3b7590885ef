"""Model registry.

Counterpart of reference ``vllm/model_executor/models/__init__.py``: maps HF
architecture names to model implementations. Implementations are pure
functional JAX (params pytree + forward function), registered lazily.
"""
from __future__ import annotations

import importlib
from typing import Dict, Type

# arch name -> (module, attribute)
_MODEL_REGISTRY: Dict[str, tuple] = {
    "OPTForCausalLM": ("vllm_ltr_tpu.models.opt", "OPTForCausalLM"),
    "OPTForSequenceClassification":
    ("vllm_ltr_tpu.models.opt", "OPTForSequenceClassification"),
    "LlamaForCausalLM": ("vllm_ltr_tpu.models.llama", "LlamaForCausalLM"),
    "LLaMAForCausalLM": ("vllm_ltr_tpu.models.llama", "LlamaForCausalLM"),
    "MistralForCausalLM": ("vllm_ltr_tpu.models.llama", "LlamaForCausalLM"),
    # Llama-compatible archs (reference models/__init__.py:13-14,31):
    # Aquila is plain llama; InternLM v1 is llama with attention biases
    # (bias=True on the config, handled by llama.init_params).
    "AquilaModel": ("vllm_ltr_tpu.models.llama", "LlamaForCausalLM"),
    "AquilaForCausalLM": ("vllm_ltr_tpu.models.llama", "LlamaForCausalLM"),
    "InternLMForCausalLM": ("vllm_ltr_tpu.models.llama",
                            "LlamaForCausalLM"),
    "Qwen2ForCausalLM": ("vllm_ltr_tpu.models.qwen2", "Qwen2ForCausalLM"),
    "GPT2LMHeadModel": ("vllm_ltr_tpu.models.gpt2", "GPT2LMHeadModel"),
    "GemmaForCausalLM": ("vllm_ltr_tpu.models.gemma", "GemmaForCausalLM"),
    "MixtralForCausalLM": ("vllm_ltr_tpu.models.mixtral",
                           "MixtralForCausalLM"),
    "FalconForCausalLM": ("vllm_ltr_tpu.models.falcon",
                          "FalconForCausalLM"),
    "RWForCausalLM": ("vllm_ltr_tpu.models.falcon", "FalconForCausalLM"),
    "PhiForCausalLM": ("vllm_ltr_tpu.models.phi", "PhiForCausalLM"),
    "MptForCausalLM": ("vllm_ltr_tpu.models.mpt", "MptForCausalLM"),
    "MPTForCausalLM": ("vllm_ltr_tpu.models.mpt", "MptForCausalLM"),
    "Starcoder2ForCausalLM": ("vllm_ltr_tpu.models.starcoder2",
                              "Starcoder2ForCausalLM"),
    "Qwen2MoeForCausalLM": ("vllm_ltr_tpu.models.qwen2_moe",
                            "Qwen2MoeForCausalLM"),
    "GlmForCausalLM": ("vllm_ltr_tpu.models.chatglm", "GlmForCausalLM"),
    "ChatGLMModel": ("vllm_ltr_tpu.models.chatglm", "GlmForCausalLM"),
    "ChatGLMForConditionalGeneration": ("vllm_ltr_tpu.models.chatglm",
                                        "GlmForCausalLM"),
    "BaichuanForCausalLM": ("vllm_ltr_tpu.models.baichuan",
                            "BaichuanForCausalLM"),
    "BaiChuanForCausalLM": ("vllm_ltr_tpu.models.baichuan",
                            "BaiChuanForCausalLM"),
    "InternLM2ForCausalLM": ("vllm_ltr_tpu.models.internlm2",
                             "InternLM2ForCausalLM"),
    "DeepseekForCausalLM": ("vllm_ltr_tpu.models.deepseek",
                            "DeepseekForCausalLM"),
    "BloomForCausalLM": ("vllm_ltr_tpu.models.bloom", "BloomForCausalLM"),
    "GPTNeoXForCausalLM": ("vllm_ltr_tpu.models.gpt_neox",
                           "GPTNeoXForCausalLM"),
    "GPTJForCausalLM": ("vllm_ltr_tpu.models.gpt_j", "GPTJForCausalLM"),
    "GPTBigCodeForCausalLM": ("vllm_ltr_tpu.models.gpt_bigcode",
                              "GPTBigCodeForCausalLM"),
    "StableLmForCausalLM": ("vllm_ltr_tpu.models.stablelm",
                            "StableLmForCausalLM"),
    "StableLMEpochForCausalLM": ("vllm_ltr_tpu.models.stablelm",
                                 "StableLmForCausalLM"),
    "OlmoForCausalLM": ("vllm_ltr_tpu.models.olmo", "OlmoForCausalLM"),
    "OLMoForCausalLM": ("vllm_ltr_tpu.models.olmo", "OlmoForCausalLM"),
    "CohereForCausalLM": ("vllm_ltr_tpu.models.commandr",
                          "CohereForCausalLM"),
    "DbrxForCausalLM": ("vllm_ltr_tpu.models.dbrx", "DbrxForCausalLM"),
    "OrionForCausalLM": ("vllm_ltr_tpu.models.orion", "OrionForCausalLM"),
    "QWenLMHeadModel": ("vllm_ltr_tpu.models.qwen", "QWenLMHeadModel"),
    "MiniCPMForCausalLM": ("vllm_ltr_tpu.models.minicpm",
                           "MiniCPMForCausalLM"),
    "JAISLMHeadModel": ("vllm_ltr_tpu.models.jais", "JAISLMHeadModel"),
    "DeciLMForCausalLM": ("vllm_ltr_tpu.models.decilm",
                          "DeciLMForCausalLM"),
    # XVERSE is structurally Llama (same weight names, RMSNorm + SwiGLU +
    # rotary GQA; reference xverse.py differs from llama.py only in class
    # names), so it maps onto the Llama implementation directly.
    "XverseForCausalLM": ("vllm_ltr_tpu.models.llama", "LlamaForCausalLM"),
    "LlavaForConditionalGeneration": ("vllm_ltr_tpu.models.llava",
                                      "LlavaForConditionalGeneration"),
}


class ModelRegistry:

    @staticmethod
    def load_model_cls(arch: str):
        if arch not in _MODEL_REGISTRY:
            return None
        module_name, attr = _MODEL_REGISTRY[arch]
        module = importlib.import_module(module_name)
        return getattr(module, attr)

    @staticmethod
    def get_supported_archs():
        return list(_MODEL_REGISTRY.keys())

    @staticmethod
    def register_model(arch: str, module_name: str, attr: str):
        _MODEL_REGISTRY[arch] = (module_name, attr)


def resolve_model_cls(architectures):
    for arch in architectures:
        cls = ModelRegistry.load_model_cls(arch)
        if cls is not None:
            return cls
    raise ValueError(
        f"Model architectures {architectures} are not supported. "
        f"Supported: {ModelRegistry.get_supported_archs()}")
