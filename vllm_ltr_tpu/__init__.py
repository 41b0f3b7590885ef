"""vllm_ltr_tpu: TPU-native LLM serving with learning-to-rank scheduling.

A ground-up JAX/XLA/Pallas re-design of hao-ai-lab/vllm-ltr
("Efficient LLM Scheduling by Learning to Rank", arXiv 2408.15792).
"""
from vllm_ltr_tpu.engine.arg_utils import AsyncEngineArgs, EngineArgs
from vllm_ltr_tpu.engine.llm_engine import LLMEngine
from vllm_ltr_tpu.entrypoints.llm import LLM
from vllm_ltr_tpu.entrypoints.aux_llm import AUXLLM
from vllm_ltr_tpu.outputs import CompletionOutput, RequestOutput
from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.version import __version__

__all__ = [
    "LLM",
    "AUXLLM",
    "LLMEngine",
    "EngineArgs",
    "AsyncEngineArgs",
    "SamplingParams",
    "RequestOutput",
    "CompletionOutput",
    "__version__",
]
