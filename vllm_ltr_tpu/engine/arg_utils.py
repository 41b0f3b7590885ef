"""Engine CLI arguments.

Counterpart of reference ``vllm/engine/arg_utils.py`` (583 LoC): a dataclass
of engine flags incl. the LTR fork's ``--schedule-type``,
``--enable-starvation-prevent``, ``--predictor-model-config`` and
``--prefill-predictor-model-config`` (arg_utils.py:75-76,350-357), fanned
out into typed config objects by ``create_engine_config``.
"""
from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional

from vllm_ltr_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                 LoadConfig, LoRAConfig, ModelConfig,
                                 ParallelConfig, SchedulerConfig,
                                 SpeculativeConfig)


@dataclass
class EngineArgs:
    model: str
    tokenizer: Optional[str] = None
    tokenizer_mode: str = "auto"
    skip_tokenizer_init: bool = False
    tokenizer_pool_size: int = 0
    trust_remote_code: bool = False
    download_dir: Optional[str] = None
    load_format: str = "auto"
    dtype: str = "auto"
    kv_cache_dtype: str = "auto"
    quantization_param_path: Optional[str] = None
    seed: int = 0
    max_model_len: Optional[int] = None
    pipeline_parallel_size: int = 1
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    block_size: int = 16
    enable_prefix_caching: bool = False
    swap_space: float = 4.0  # GiB
    gpu_memory_utilization: float = 0.90  # HBM utilization on TPU
    num_gpu_blocks_override: Optional[int] = None
    max_num_batched_tokens: Optional[int] = None
    max_num_seqs: int = 256
    max_logprobs: int = 5
    disable_log_stats: bool = False
    revision: Optional[str] = None
    quantization: Optional[str] = None
    enforce_eager: bool = False
    max_seq_len_to_capture: int = 8192
    disable_custom_all_reduce: bool = False
    enable_lora: bool = False
    max_loras: int = 1
    max_lora_rank: int = 16
    device: str = "auto"
    enable_chunked_prefill: bool = False
    # Multi-host runtime (jax.distributed); omit all three on TPU pods for
    # auto-detection from the metadata server.
    distributed_coordinator: Optional[str] = None
    distributed_num_processes: Optional[int] = None
    distributed_process_id: Optional[int] = None
    num_lookahead_slots: int = 0
    scheduler_delay_factor: float = 0.0
    # --- LTR flags (reference arg_utils.py:75-76,350-357) ---
    schedule_type: str = "fcfs"
    enable_starvation_prevent: bool = False
    predictor_model_config: Optional[str] = None
    prefill_predictor_model_config: Optional[str] = None
    fake_allocate: bool = False
    # Speculative decoding
    speculative_model: Optional[str] = None
    num_speculative_tokens: int = 0
    # Fused multi-step decode: K decode iterations per host dispatch
    # (executor/multi_step.py). 1 = one step per dispatch.
    decode_steps_per_dispatch: int = 1

    def create_engine_config(self) -> EngineConfig:
        model_config = ModelConfig(
            model=self.model,
            tokenizer=self.tokenizer,
            tokenizer_mode=self.tokenizer_mode,
            trust_remote_code=self.trust_remote_code,
            dtype=self.dtype,
            seed=self.seed,
            revision=self.revision,
            max_model_len=self.max_model_len,
            quantization=self.quantization,
            quantization_param_path=self.quantization_param_path,
            enforce_eager=self.enforce_eager,
            max_logprobs=self.max_logprobs,
            skip_tokenizer_init=self.skip_tokenizer_init,
            tokenizer_pool_size=self.tokenizer_pool_size,
            predictor_model_config=self.predictor_model_config,
            prefill_predictor_model_config=(
                self.prefill_predictor_model_config),
        )
        cache_config = CacheConfig(
            block_size=self.block_size,
            hbm_utilization=self.gpu_memory_utilization,
            swap_space=self.swap_space,
            cache_dtype=self.kv_cache_dtype,
            num_device_blocks_override=self.num_gpu_blocks_override,
            sliding_window=model_config.get_sliding_window(),
            enable_prefix_caching=self.enable_prefix_caching,
        )
        parallel_config = ParallelConfig(
            pipeline_parallel_size=self.pipeline_parallel_size,
            tensor_parallel_size=self.tensor_parallel_size,
            data_parallel_size=self.data_parallel_size,
            disable_custom_all_reduce=self.disable_custom_all_reduce,
            distributed_coordinator=self.distributed_coordinator,
            distributed_num_processes=self.distributed_num_processes,
            distributed_process_id=self.distributed_process_id,
        )
        model_config.verify_with_parallel_config(parallel_config)
        cache_config.verify_with_parallel_config(parallel_config)
        num_lookahead_slots = self.num_lookahead_slots
        if self.speculative_model is not None:
            # Speculative decoding reserves k slots ahead per sequence.
            num_lookahead_slots = max(num_lookahead_slots,
                                      self.num_speculative_tokens)
        if self.decode_steps_per_dispatch > 1:
            # Fused decode writes K tokens' KV before the host sees them.
            num_lookahead_slots = max(num_lookahead_slots,
                                      self.decode_steps_per_dispatch - 1)
        scheduler_config = SchedulerConfig(
            max_num_batched_tokens=self.max_num_batched_tokens,
            max_num_seqs=self.max_num_seqs,
            max_model_len=model_config.max_model_len,
            num_lookahead_slots=num_lookahead_slots,
            delay_factor=self.scheduler_delay_factor,
            enable_chunked_prefill=self.enable_chunked_prefill,
            schedule_type=self.schedule_type,
            enable_starvation_prevent=self.enable_starvation_prevent,
            fake_allocate=self.fake_allocate,
            decode_steps_per_dispatch=self.decode_steps_per_dispatch,
        )
        device_config = DeviceConfig(self.device)
        load_config = LoadConfig(load_format=self.load_format,
                                 download_dir=self.download_dir)
        lora_config = LoRAConfig(
            max_lora_rank=self.max_lora_rank,
            max_loras=self.max_loras) if self.enable_lora else None
        speculative_config = None
        if self.speculative_model is not None:
            speculative_config = SpeculativeConfig(
                draft_model=self.speculative_model,
                num_speculative_tokens=self.num_speculative_tokens)
        return EngineConfig(model_config=model_config,
                            cache_config=cache_config,
                            parallel_config=parallel_config,
                            scheduler_config=scheduler_config,
                            device_config=device_config,
                            load_config=load_config,
                            lora_config=lora_config,
                            speculative_config=speculative_config)

    @classmethod
    def add_cli_args(cls, parser: argparse.ArgumentParser
                     ) -> argparse.ArgumentParser:
        for field in dataclasses.fields(cls):
            name = "--" + field.name.replace("_", "-")
            if field.type == "bool" or field.type is bool:
                parser.add_argument(name,
                                    action="store_true",
                                    default=field.default)
            else:
                ftype = {
                    "int": int,
                    "float": float,
                }.get(str(field.type), str)
                if "Optional[int]" in str(field.type):
                    ftype = int
                elif "Optional[float]" in str(field.type):
                    ftype = float
                parser.add_argument(name, type=ftype, default=field.default)
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        attrs = [f.name for f in dataclasses.fields(cls)]
        return cls(**{a: getattr(args, a) for a in attrs if hasattr(args, a)})


@dataclass
class AsyncEngineArgs(EngineArgs):
    """Arguments for the asynchronous (serving) engine."""
    disable_log_requests: bool = False
    max_log_len: Optional[int] = None
