from vllm_ltr_tpu.lora.request import LoRARequest

__all__ = ["LoRARequest"]
