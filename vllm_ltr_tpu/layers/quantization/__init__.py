"""Weight quantization support.

Counterpart of reference ``vllm/model_executor/layers/quantization/``
(awq.py / gptq.py / marlin.py / squeezellm.py, 893 LoC + the CUDA kernels
they wrap): here every supported source format repacks into ONE canonical
INT4 layout served by the single Pallas kernel (ops/pallas/int4_matmul.py).

Supported ``quantization=`` values:
  "awq"  — load an AutoAWQ checkpoint (qweight/qzeros/scales)
  "gptq" — load an AutoGPTQ checkpoint (incl. act-order g_idx)
  "int4" — quantize a float checkpoint at load time (group 128, asymmetric)
  "squeezellm" — non-uniform 4-bit LUT (k-means centroids per channel);
      quantizes float checkpoints at load time, or converts SqueezeLLM
      state dicts (qweight + lookup_table) — served by its own Pallas
      select-sum kernel (ops/pallas/squeezellm_matmul.py)
"""
from vllm_ltr_tpu.layers.quantization.int4 import (
    QuantizedWeight, maybe_quantize_params as _maybe_int4, quantized_linear)
from vllm_ltr_tpu.layers.quantization.squeezellm import (
    SqueezeLLMWeight, maybe_quantize_params_squeezellm, squeezellm_linear)


def maybe_quantize_params(params, quantization, **kwargs):
    if quantization == "squeezellm":
        return maybe_quantize_params_squeezellm(params)
    return _maybe_int4(params, quantization, **kwargs)


__all__ = ["QuantizedWeight", "SqueezeLLMWeight", "maybe_quantize_params",
           "quantized_linear", "squeezellm_linear"]

SUPPORTED_QUANTIZATION = ("awq", "gptq", "int4", "squeezellm")
