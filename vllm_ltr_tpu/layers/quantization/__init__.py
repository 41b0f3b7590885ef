"""Weight quantization support.

Counterpart of reference ``vllm/model_executor/layers/quantization/``
(awq.py / gptq.py / marlin.py / squeezellm.py, 893 LoC + the CUDA kernels
they wrap): here every supported source format repacks into ONE canonical
INT4 layout served by the single Pallas kernel (ops/pallas/int4_matmul.py).

Supported ``quantization=`` values:
  "awq"  — load an AutoAWQ checkpoint (qweight/qzeros/scales)
  "gptq" — load an AutoGPTQ checkpoint (incl. act-order g_idx)
  "int4" — quantize a float checkpoint at load time (group 128, asymmetric)
"""
from vllm_ltr_tpu.layers.quantization.int4 import (QuantizedWeight,
                                                   maybe_quantize_params,
                                                   quantized_linear)

__all__ = ["QuantizedWeight", "maybe_quantize_params", "quantized_linear"]

SUPPORTED_QUANTIZATION = ("awq", "gptq", "int4")
