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

from vllm_ltr_tpu.config import (CacheConfig, DecodingConfig, DeviceConfig,
                                 EngineConfig, LoadConfig, LoRAConfig,
                                 ModelConfig, ParallelConfig, SchedulerConfig,
                                 SpeculativeConfig)


def _flag(default, help_: str):
    """A dataclass field carrying CLI --help text for add_cli_args."""
    return dataclasses.field(default=default, metadata={"help": help_})


@dataclass
class EngineArgs:
    model: str
    tokenizer: Optional[str] = _flag(None, "tokenizer path; defaults to model")
    tokenizer_mode: str = _flag("auto", "auto|slow")
    skip_tokenizer_init: bool = _flag(False, "token-id-only mode, no tokenizer")
    tokenizer_pool_size: int = _flag(0, "detokenizer worker threads; 0=inline")
    trust_remote_code: bool = _flag(False, "allow HF remote code")
    download_dir: Optional[str] = _flag(None, "HF download cache dir")
    load_format: str = _flag("auto", "auto|safetensors|pt|npz|npcache|dummy")
    dtype: str = _flag("auto", "compute dtype; fp16 maps to bf16 on TPU")
    kv_cache_dtype: str = _flag("auto", "auto|bf16|fp8|fp8_e5m2|fp8_e4m3")
    quantization_param_path: Optional[str] = _flag(
        None, "kv_cache_scales.json with per-layer FP8-KV scales")
    seed: int = _flag(0, "PRNG seed for the device sampler")
    max_model_len: Optional[int] = _flag(None, "context limit; None=derive")
    pipeline_parallel_size: int = _flag(1, "declared only; must be 1")
    tensor_parallel_size: int = _flag(1, "mesh 'model' axis size")
    data_parallel_size: int = _flag(1, "mesh 'data' axis size (replicas)")
    block_size: int = _flag(16, "KV page size in tokens")
    enable_prefix_caching: bool = _flag(False, "content-hash block reuse")
    swap_space: float = _flag(4.0, "host KV swap mirror, GiB")
    gpu_memory_utilization: float = _flag(0.90, "HBM fraction for weights+KV")
    num_gpu_blocks_override: Optional[int] = _flag(
        None, "skip profiling; force this many device KV blocks")
    max_num_batched_tokens: Optional[int] = _flag(
        None, "per-step token budget (the static prefill buffer shape)")
    max_num_seqs: int = _flag(256, "max sequences per step (decode batch)")
    max_logprobs: int = _flag(5, "max logprobs returnable per token")
    disable_log_stats: bool = _flag(False, "turn off the 5s stat logger")
    revision: Optional[str] = _flag(None, "HF revision")
    quantization: Optional[str] = _flag(None, "awq|gptq|squeezellm")
    enforce_eager: bool = _flag(False, "accepted for reference CLI parity")
    max_seq_len_to_capture: int = _flag(8192, "reference parity; unused")
    disable_custom_all_reduce: bool = _flag(False, "reference parity; unused")
    enable_lora: bool = _flag(False, "serve LoRA adapters")
    max_loras: int = _flag(1, "concurrent adapter slots")
    max_lora_rank: int = _flag(16, "bank rank: 8|16|32|64")
    device: str = _flag("auto", "auto|tpu|cpu")
    enable_chunked_prefill: bool = _flag(
        False, "split long prompts across steps by token budget")
    distributed_coordinator: Optional[str] = _flag(
        None, "jax.distributed coordinator addr; omit on pods to autodetect")
    distributed_num_processes: Optional[int] = _flag(
        None, "multi-host process count")
    distributed_process_id: Optional[int] = _flag(
        None, "this host's process index")
    num_lookahead_slots: int = _flag(0, "KV slots reserved ahead per seq")
    scheduler_delay_factor: float = _flag(
        0.0, "delay prefill admission by factor * previous prompt latency")
    # --- LTR flags (reference arg_utils.py:75-76,350-357) ---
    schedule_type: str = _flag(
        "fcfs", "policy string, e.g. opt-starv200-period10 or mlfq-quant0.03")
    enable_starvation_prevent: bool = _flag(False, "starvation promotion")
    predictor_model_config: Optional[str] = _flag(
        None, "embedded mid-layer predictor JSON config")
    prefill_predictor_model_config: Optional[str] = _flag(
        None, "AUX prompt-scoring predictor JSON config")
    fake_allocate: bool = _flag(False, "no real KV blocks (aux engines)")
    guided_decoding_backend: str = _flag(
        "native", "default guided-decoding engine (reference "
        "--guided-decoding-backend): native/outlines = strict compact "
        "JSON, lm-format-enforcer = whitespace-tolerant JSON; "
        "per-request guided_decoding_backend overrides")
    speculative_model: Optional[str] = _flag(None, "draft model for spec dec")
    num_speculative_tokens: int = _flag(0, "draft tokens proposed per step")
    decode_steps_per_dispatch: int = _flag(
        1, "fused multi-step decode depth K (executor/multi_step.py)")
    precompile_shapes: bool = _flag(
        False, "compile every step-shape bucket at startup so no request "
        "ever waits on a jit compile (recommended for servers)")
    async_aux_scoring: bool = _flag(
        False, "EXPERIMENTAL: overlap aux-predictor scoring with the "
        "in-flight serving wave (scores land a pass later; in-flight "
        "requests rank last).  Measured HARMFUL under burst overload "
        "(opt@32: 592 vs 1720 tok/s sync) — deferring scores floods the "
        "seats with unscored FCFS admissions that the ranked pass then "
        "pays to evict, while the sync scorer amortizes the whole "
        "backlog into one dispatch.  Keep off; see docs/BENCHMARKS.md")
    lazy_aux_scoring: bool = _flag(
        False, "skip the predictor dispatch on scheduling passes that "
        "provably admit the whole population regardless of order (no "
        "seat/token/block contention); the first contended pass scores "
        "every unscored request in one batch.  Cuts schedule() blocking "
        "at trickle arrival rates; exact under no contention")
    disable_pipeline_admission: bool = _flag(
        False, "serve new prompts strictly step-by-step instead of "
        "sneaking their prefills behind the in-flight dispatch (both "
        "engines: the async loop sneaks mid-step; the sync loop enqueues "
        "a cohort's prefill waves back-to-back in one step)")

    def create_engine_config(self) -> EngineConfig:
        mcfg = ModelConfig(
            model=self.model, tokenizer=self.tokenizer,
            tokenizer_mode=self.tokenizer_mode,
            trust_remote_code=self.trust_remote_code, dtype=self.dtype,
            seed=self.seed, revision=self.revision,
            max_model_len=self.max_model_len, quantization=self.quantization,
            quantization_param_path=self.quantization_param_path,
            enforce_eager=self.enforce_eager, max_logprobs=self.max_logprobs,
            skip_tokenizer_init=self.skip_tokenizer_init,
            tokenizer_pool_size=self.tokenizer_pool_size,
            predictor_model_config=self.predictor_model_config,
            prefill_predictor_model_config=(
                self.prefill_predictor_model_config))
        kvcfg = CacheConfig(
            block_size=self.block_size,
            hbm_utilization=self.gpu_memory_utilization,
            swap_space=self.swap_space, cache_dtype=self.kv_cache_dtype,
            num_device_blocks_override=self.num_gpu_blocks_override,
            sliding_window=mcfg.get_sliding_window(),
            enable_prefix_caching=self.enable_prefix_caching)
        meshcfg = ParallelConfig(
            pipeline_parallel_size=self.pipeline_parallel_size,
            tensor_parallel_size=self.tensor_parallel_size,
            data_parallel_size=self.data_parallel_size,
            disable_custom_all_reduce=self.disable_custom_all_reduce,
            distributed_coordinator=self.distributed_coordinator,
            distributed_num_processes=self.distributed_num_processes,
            distributed_process_id=self.distributed_process_id)
        mcfg.verify_with_parallel_config(meshcfg)
        kvcfg.verify_with_parallel_config(meshcfg)

        # Lookahead slots: speculative decoding proposes k tokens ahead, and
        # fused multi-step decode writes K tokens' KV before the host sees
        # them — the block manager must reserve space for whichever is larger.
        lookahead = self.num_lookahead_slots
        if self.speculative_model is not None:
            lookahead = max(lookahead, self.num_speculative_tokens)
        lookahead = max(lookahead, self.decode_steps_per_dispatch - 1)

        schedcfg = SchedulerConfig(
            max_num_batched_tokens=self.max_num_batched_tokens,
            max_num_seqs=self.max_num_seqs,
            max_model_len=mcfg.max_model_len,
            num_lookahead_slots=lookahead,
            delay_factor=self.scheduler_delay_factor,
            enable_chunked_prefill=self.enable_chunked_prefill,
            schedule_type=self.schedule_type,
            enable_starvation_prevent=self.enable_starvation_prevent,
            fake_allocate=self.fake_allocate,
            decode_steps_per_dispatch=self.decode_steps_per_dispatch,
            precompile_shapes=self.precompile_shapes,
            async_aux_scoring=self.async_aux_scoring,
            lazy_aux_scoring=self.lazy_aux_scoring,
            pipeline_admission=not self.disable_pipeline_admission)

        speccfg = None
        if self.speculative_model is not None:
            speccfg = SpeculativeConfig(
                draft_model=self.speculative_model,
                num_speculative_tokens=self.num_speculative_tokens)
        return EngineConfig(
            model_config=mcfg, cache_config=kvcfg, parallel_config=meshcfg,
            scheduler_config=schedcfg, device_config=DeviceConfig(self.device),
            load_config=LoadConfig(load_format=self.load_format,
                                   download_dir=self.download_dir),
            lora_config=(LoRAConfig(max_lora_rank=self.max_lora_rank,
                                    max_loras=self.max_loras)
                         if self.enable_lora else None),
            speculative_config=speccfg,
            decoding_config=DecodingConfig(
                guided_decoding_backend=self.guided_decoding_backend))

    @classmethod
    def add_cli_args(cls, parser: argparse.ArgumentParser
                     ) -> argparse.ArgumentParser:
        for field in dataclasses.fields(cls):
            name = "--" + field.name.replace("_", "-")
            help_ = field.metadata.get("help")
            if field.type == "bool" or field.type is bool:
                parser.add_argument(name,
                                    action="store_true",
                                    default=field.default,
                                    help=help_)
            else:
                ftype = {
                    "int": int,
                    "float": float,
                }.get(str(field.type), str)
                if "Optional[int]" in str(field.type):
                    ftype = int
                elif "Optional[float]" in str(field.type):
                    ftype = float
                parser.add_argument(name, type=ftype, default=field.default,
                                    help=help_)
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
    prefetch_aux_scoring: bool = _flag(
        False, "score-at-arrival: dispatch the ranking predictor for "
        "each inbox drain's new requests immediately (the forward "
        "queues behind the in-flight wave) instead of at the next "
        "scheduling pass.  Exact — the pass still blocks on any "
        "prefetch that has not landed")
