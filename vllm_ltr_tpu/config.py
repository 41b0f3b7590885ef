"""Typed configuration objects.

Counterpart of reference ``vllm/config.py`` and ``vllm/config_predictor.py``.
The reference encodes scheduler policy options in a string micro-DSL parsed out
of ``--schedule-type`` (reference scheduler.py:268-331); here the canonical
representation is the typed :class:`ScheduleSpec`, with
:meth:`ScheduleSpec.parse` providing compatibility with the reference strings
(e.g. ``"opt-starv200-period10"``, ``"fcfs-synthetic((-1,-1,1000),)"``).
"""
from __future__ import annotations

import ast
import json
import os
import re
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any, Dict, List, Optional, Tuple, Union

from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.utils import STR_DTYPE_TO_KV_DTYPE

logger = init_logger(__name__)

_GB = 1 << 30


# ---------------------------------------------------------------------------
# Scheduling policy spec (replaces the reference string DSL with typed config)
# ---------------------------------------------------------------------------

#: Policies that use the generalized (global-reorder) scheduling path.
GENERAL_POLICIES = (
    "fifo", "srtf", "PO", "rPO", "FAKEPO", "tpt", "rtpt", "opt", "ropt",
    "xpt", "constraint", "ltr",
)
#: Policies that use the stock default path (waiting-queue-sort variants).
DEFAULT_PATH_POLICIES = ("fcfs", "sjf", "ljf")
#: Policies that need the aux (LTR) predictor scores.
SCORE_POLICIES = ("tpt", "rtpt", "opt", "ropt", "xpt", "constraint", "ltr")


@dataclass
class StarvationSpec:
    """Starvation control: a request idle for >= ``threshold`` scheduler steps
    is promoted (pri=-1) for ``period`` scheduled steps, then demoted.
    Reference scheduler.py:271-275, 984-996, 1358-1365."""
    threshold: int
    period: int


@dataclass
class SyntheticBound:
    """Synthetic-data-generation termination: stop once ``count`` requests
    with output length in [lo, hi] have finished (-1 = unbounded side).
    Reference scheduler.py:276-288, 1697-1721."""
    lo: int
    hi: int
    count: int


@dataclass
class MLFQSpec:
    """Multi-level feedback queue parameters (reference mlfq_scheduler.py:132-170)."""
    base_quantum: float = 0.01
    threshold: float = 2.0
    starvation_threshold: float = 3.0
    starvation_period: float = 100
    use_async: bool = False


@dataclass
class ScheduleSpec:
    """Typed scheduling policy configuration."""
    policy: str = "fcfs"
    starvation: Optional[StarvationSpec] = None
    synthetic_bounds: List[SyntheticBound] = field(default_factory=list)
    timelimit: Optional[float] = None
    mlfq: Optional[MLFQSpec] = None
    # xpt: path to a saved (score-keys, expected-length-values) distribution.
    distribution_path: Optional[str] = None

    @property
    def uses_general_path(self) -> bool:
        return self.policy in GENERAL_POLICIES

    @property
    def needs_scores(self) -> bool:
        return self.policy in SCORE_POLICIES

    @property
    def is_mlfq(self) -> bool:
        return self.policy == "mlfq"

    @classmethod
    def parse(cls, schedule_type: str,
              enable_starvation_prevent: bool = False) -> "ScheduleSpec":
        """Parse a reference-compatible ``--schedule-type`` string."""
        s = schedule_type
        spec = cls()

        # xpt embeds a distribution path inside {...}.
        if "{" in s:
            spec.distribution_path = s[s.find("{") + 1:s.rfind("}")]
            s = s[:s.find("{")] + s[s.rfind("}") + 1:]

        # Termination bounds.
        if "synthetic" in s:
            raw = s[s.find("synthetic") + len("synthetic"):]
            bounds = ast.literal_eval(raw)
            if bounds and isinstance(bounds[0], int):
                bounds = (bounds, )
            spec.synthetic_bounds = [SyntheticBound(*b) for b in bounds]
            s = s[:s.find("synthetic")].rstrip("-")
        elif "timelimit" in s:
            spec.timelimit = float(s[s.find("timelimit") + len("timelimit"):])
            s = s[:s.find("timelimit")].rstrip("-")

        if s.startswith("mlfq"):
            spec.policy = "mlfq"
            mlfq = MLFQSpec()
            mlfq.use_async = "async" in s

            def find_config(c: str, default: float) -> float:
                if c not in s:
                    return default
                st = s[s.find(c) + len(c):]
                if "-" in st:
                    st = st[:st.find("-")]
                return float(st)

            # "base" is the reference's spelling (bench-70B.sh uses
            # mlfq-base0.03-thres10); "quant" is kept as an alias.
            mlfq.base_quantum = find_config("base", mlfq.base_quantum)
            mlfq.base_quantum = find_config("quant", mlfq.base_quantum)
            mlfq.threshold = find_config("thres", mlfq.threshold)
            mlfq.starvation_threshold = find_config(
                "starv", mlfq.starvation_threshold)
            mlfq.starvation_period = find_config("starp",
                                                 mlfq.starvation_period)
            spec.mlfq = mlfq
            return spec

        # Starvation suffix (general path): starv<N>...period<M>.
        if "starv" in s:
            threshold = int(s[s.find("starv") + len("starv"):s.find("period") -
                              1])
            period = int(s[s.find("period") + len("period"):])
            spec.starvation = StarvationSpec(threshold=threshold,
                                             period=period)
            s = s[:s.find("starv")].rstrip("-")

        # Policy name: longest-prefix match over known policies, mirroring the
        # reference's startswith dispatch order (rPO before PO, rtpt before
        # tpt, ropt before opt...).
        for name in ("fcfs", "sjf", "ljf", "fifo", "srtf", "FAKEPO", "rPO",
                     "PO", "xpt", "rtpt", "tpt", "ropt", "opt", "constraint",
                     "ltr"):
            if s.startswith(name):
                spec.policy = name
                break
        else:
            raise ValueError(f"Unsupported schedule type: {schedule_type!r}")
        return spec

    def to_schedule_type(self) -> str:
        """Render back to a reference-style string (for logs/round-trip)."""
        parts = [self.policy]
        if self.starvation is not None:
            parts.append(
                f"starv{self.starvation.threshold}-period{self.starvation.period}"
            )
        s = "-".join(parts)
        if self.synthetic_bounds:
            tup = tuple(
                (b.lo, b.hi, b.count) for b in self.synthetic_bounds)
            s += f"-synthetic{tup}"
        elif self.timelimit is not None:
            s += f"-timelimit{self.timelimit}"
        return s


# ---------------------------------------------------------------------------
# Predictor configs (counterpart of reference vllm/config_predictor.py)
# ---------------------------------------------------------------------------


@dataclass
class PredictorConfig:
    """Embedded mid-layer predictor config (reference config_predictor.py:8-76):
    an MLP head grafted onto the serving model at ``pred_layer_idx``.
    fc_model: {sizes, input_norm, activation, dropout};
    post_model: {d_output, output_activation};
    weights: optional torch state-dict path (reference LTRModel naming)."""
    fc_model: Optional[Any] = None
    post_model: Optional[Any] = None
    n_features: int = 4096
    pred_layer_idx: int = 31
    weights: Optional[str] = None

    @classmethod
    def from_json(cls, path: str) -> "PredictorConfig":
        with open(path) as f:
            data = json.load(f)
        return cls(**{k: v for k, v in data.items()
                      if k in cls.__dataclass_fields__})

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.__dict__, f, indent=2)


@dataclass
class PrefillPredictorConfig:
    """AUX prefill predictor config (reference config_predictor.py:78-154):
    a small sequence-classification model scoring prompts once per request."""
    pred_model: str = ""
    num_labels: int = 1
    mtype: str = "rank"  # "rank" (num_labels==1) or "class"
    activation: Optional[str] = None
    max_length: int = 1024
    max_batch_size: int = 512

    def __post_init__(self):
        if self.mtype not in ("rank", "class"):
            raise ValueError(f"mtype must be 'rank' or 'class', got "
                             f"{self.mtype!r}")
        if self.mtype == "rank" and self.num_labels != 1:
            raise ValueError("rank predictor requires num_labels == 1")

    @classmethod
    def from_json(cls, path: str) -> "PrefillPredictorConfig":
        with open(path) as f:
            data = json.load(f)
        return cls(**{k: v for k, v in data.items()
                      if k in cls.__dataclass_fields__})

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.__dict__, f, indent=2)


# ---------------------------------------------------------------------------
# Core configs
# ---------------------------------------------------------------------------


class ModelConfig:
    """Configuration of the model to serve.

    ``model`` may be a HF model directory (config.json + safetensors), or one
    of the built-in test architectures. Weights load via
    models/weights.py.
    """

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        trust_remote_code: bool = False,
        dtype: str = "auto",
        seed: int = 0,
        revision: Optional[str] = None,
        max_model_len: Optional[int] = None,
        quantization: Optional[str] = None,
        quantization_param_path: Optional[str] = None,
        enforce_eager: bool = False,
        max_context_len_to_capture: Optional[int] = None,
        max_logprobs: int = 5,
        skip_tokenizer_init: bool = False,
        tokenizer_pool_size: int = 0,
        predictor_model_config: Optional[Union[str, PredictorConfig]] = None,
        prefill_predictor_model_config: Optional[Union[
            str, PrefillPredictorConfig]] = None,
        hf_config: Optional[Any] = None,
    ) -> None:
        self.model = model
        self.tokenizer = tokenizer or model
        # Reference TokenizerPoolConfig: 0 = inline tokenization.
        self.tokenizer_pool_size = tokenizer_pool_size
        self.tokenizer_mode = tokenizer_mode
        self.trust_remote_code = trust_remote_code
        self.seed = seed
        self.revision = revision
        self.quantization = quantization
        self.quantization_param_path = quantization_param_path
        self.enforce_eager = enforce_eager
        self.max_context_len_to_capture = max_context_len_to_capture
        self.max_logprobs = max_logprobs
        self.skip_tokenizer_init = skip_tokenizer_init

        if isinstance(predictor_model_config, str):
            predictor_model_config = PredictorConfig.from_json(
                predictor_model_config)
        self.predictor_model_config = predictor_model_config
        if isinstance(prefill_predictor_model_config, str):
            prefill_predictor_model_config = PrefillPredictorConfig.from_json(
                prefill_predictor_model_config)
        self.prefill_predictor_model_config = prefill_predictor_model_config

        if hf_config is None:
            from vllm_ltr_tpu.transformers_utils.config import get_hf_config
            hf_config = get_hf_config(model, trust_remote_code=trust_remote_code,
                                      revision=revision)
        self.hf_config = hf_config
        self.dtype = _resolve_dtype(getattr(hf_config, "torch_dtype", None),
                                    dtype)
        self.max_model_len = _get_and_verify_max_len(
            getattr(hf_config, "text_config", None) or hf_config,
            max_model_len)

    # -- architecture helpers ------------------------------------------------

    @property
    def architectures(self) -> List[str]:
        return getattr(self.hf_config, "architectures", []) or []

    @property
    def hf_text_config(self):
        """The language-model sub-config for composite (VLM) configs —
        reference vllm/config.py hf_text_config."""
        return getattr(self.hf_config, "text_config", None) or self.hf_config

    def get_hidden_size(self) -> int:
        return self.hf_text_config.hidden_size

    def get_head_size(self) -> int:
        cfg = self.hf_text_config
        if hasattr(cfg, "head_dim") and cfg.head_dim:
            return cfg.head_dim
        return cfg.hidden_size // cfg.num_attention_heads

    def get_total_num_kv_heads(self) -> int:
        cfg = self.hf_text_config
        if getattr(cfg, "model_type", "") == "falcon":
            # Falcon: num_kv_heads only applies to the new decoder
            # architecture; the classic 7B architecture is multi-query.
            if getattr(cfg, "new_decoder_architecture", False):
                return cfg.num_kv_heads
            return 1 if getattr(cfg, "multi_query", False) else (
                cfg.num_attention_heads)
        if getattr(cfg, "num_key_value_heads_per_layer", None):
            # DeciLM variable GQA: weights degroup to the max at load time
            # (models/decilm.py), so the cache uses the max everywhere.
            return max(cfg.num_key_value_heads_per_layer)
        for attr in ("num_key_value_heads", "num_kv_heads", "n_head_kv",
                     "multi_query_group_num"):
            if getattr(cfg, attr, None) is not None:
                return getattr(cfg, attr)
        return cfg.num_attention_heads

    def get_num_kv_heads(self, parallel_config: "ParallelConfig") -> int:
        """KV heads per tensor-parallel shard (>=1 with replication)."""
        total = self.get_total_num_kv_heads()
        return max(1, total // parallel_config.tensor_parallel_size)

    def get_num_attention_heads(self,
                                parallel_config: "ParallelConfig") -> int:
        return (self.hf_text_config.num_attention_heads //
                parallel_config.tensor_parallel_size)

    def get_num_layers(self, parallel_config: "ParallelConfig") -> int:
        total = self.hf_text_config.num_hidden_layers
        return total // parallel_config.pipeline_parallel_size

    def get_sliding_window(self) -> Optional[int]:
        if (hasattr(self.hf_text_config, "use_sliding_window")
                and not self.hf_text_config.use_sliding_window):
            return None
        return getattr(self.hf_text_config, "sliding_window", None)

    def get_vocab_size(self) -> int:
        return self.hf_text_config.vocab_size

    def verify_with_parallel_config(self,
                                    parallel_config: "ParallelConfig") -> None:
        total_kv = self.get_total_num_kv_heads()
        tp = parallel_config.tensor_parallel_size
        if total_kv % tp != 0 and tp % total_kv != 0:
            raise ValueError(
                f"{total_kv} KV heads cannot shard evenly over tp={tp} "
                "(one must divide the other; small-KV models replicate)")
        total_layers = self.hf_text_config.num_hidden_layers
        pp = parallel_config.pipeline_parallel_size
        if total_layers % pp != 0:
            raise ValueError(f"{total_layers} layers do not split evenly "
                             f"into pp={pp} pipeline stages")


def _resolve_dtype(config_dtype: Any, dtype_arg: str) -> str:
    """Resolve the compute dtype name ('bfloat16'/'float32').

    TPU has no fast fp16; float16 requests map to bfloat16 (the MXU-native
    half precision), which is the idiomatic TPU substitute.
    """
    if dtype_arg == "auto":
        name = str(config_dtype) if config_dtype is not None else "bfloat16"
    else:
        name = dtype_arg
    name = name.replace("torch.", "")
    if name in ("float16", "half", "bfloat16", "bf16", "fp16", "None"):
        return "bfloat16"
    if name in ("float32", "float", "fp32"):
        return "float32"
    if name in ("float64", "double"):
        return "float32"
    raise ValueError(f"Unknown dtype: {name}")


_MAX_LEN_KEYS = ("max_position_embeddings", "n_positions", "max_seq_len",
                 "seq_length", "max_sequence_length", "model_max_length")


def _get_and_verify_max_len(hf_config: Any,
                            max_model_len: Optional[int]) -> int:
    derived = float("inf")
    for key in _MAX_LEN_KEYS:
        v = getattr(hf_config, key, None)
        if v is not None:
            derived = min(derived, v)
    rope_scaling = getattr(hf_config, "rope_scaling", None)
    if rope_scaling is not None and derived != float("inf"):
        factor = rope_scaling.get("factor", 1.0)
        if rope_scaling.get("type", rope_scaling.get("rope_type")) != "yarn":
            derived *= factor
    if derived == float("inf"):
        derived = 2048 if max_model_len is None else max_model_len
    if max_model_len is None:
        max_model_len = int(derived)
    elif max_model_len > derived:
        raise ValueError(
            f"requested max_model_len={max_model_len} exceeds the "
            f"{int(derived)}-token limit derived from the checkpoint config")
    return int(max_model_len)


class CacheConfig:
    """Paged KV cache configuration.

    Counterpart of reference CacheConfig (vllm/config.py:299-381):
    ``hbm_utilization`` plays the role of ``gpu_memory_utilization`` and
    ``swap_space`` (GiB) sizes the host-memory mirror used for swap-out.
    """

    def __init__(
        self,
        block_size: int = 16,
        hbm_utilization: float = 0.9,
        swap_space: float = 4.0,
        cache_dtype: str = "auto",
        num_device_blocks_override: Optional[int] = None,
        sliding_window: Optional[int] = None,
        enable_prefix_caching: bool = False,
    ) -> None:
        self.block_size = block_size
        self.hbm_utilization = hbm_utilization
        self.swap_space_bytes = int(swap_space * _GB)
        self.cache_dtype = cache_dtype
        self.num_device_blocks_override = num_device_blocks_override
        self.sliding_window = sliding_window
        self.enable_prefix_caching = enable_prefix_caching
        self._check()

        # Set after memory profiling.
        self.num_gpu_blocks: Optional[int] = None  # device (HBM) blocks
        self.num_cpu_blocks: Optional[int] = None  # host (swap) blocks

    def _check(self) -> None:
        if self.hbm_utilization > 1.0:
            raise ValueError(
                f"hbm_utilization={self.hbm_utilization} — a fraction "
                "of device memory, must be <= 1.0")
        if self.cache_dtype not in STR_DTYPE_TO_KV_DTYPE:
            raise ValueError(
                f"kv cache dtype {self.cache_dtype!r} not in "
                f"{sorted(STR_DTYPE_TO_KV_DTYPE)}")
        if self.cache_dtype.startswith("fp8"):
            logger.info(
                "Using FP8 KV cache (%s). It reduces the HBM footprint and "
                "bandwidth of the KV cache at some accuracy cost.",
                self.cache_dtype)

    def metrics_info(self) -> Dict[str, str]:
        return {k: str(v) for k, v in self.__dict__.items()}

    def verify_with_parallel_config(self,
                                    parallel_config: "ParallelConfig") -> None:
        total_host_memory = _total_host_memory_bytes()
        # One swap mirror per host; all local devices share it.
        num_local = max(1, parallel_config.tensor_parallel_size)
        swap = self.swap_space_bytes * num_local
        msg = (f"swap mirror wants {swap / _GB:.2f} GiB of the host's "
               f"{total_host_memory / _GB:.2f} GiB RAM")
        if swap > 0.7 * total_host_memory:
            raise ValueError(msg + " (>70% — refusing)")
        elif swap > 0.4 * total_host_memory:
            logger.warning("%s (>40%% — may starve the engine)", msg)


def _total_host_memory_bytes() -> int:
    try:
        return os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError):
        return 64 * _GB


class ParallelConfig:
    """Device-mesh parallelism configuration.

    The reference's NCCL/Ray machinery (vllm/config.py:476-540) maps to a
    `jax.sharding.Mesh` with named axes: ``data`` (replica/DP) x ``model``
    (tensor parallel). Pipeline parallelism is declared but, as in the
    reference (config.py:525-527), not yet implemented.
    """

    def __init__(
        self,
        pipeline_parallel_size: int = 1,
        tensor_parallel_size: int = 1,
        data_parallel_size: int = 1,
        max_parallel_loading_workers: Optional[int] = None,
        disable_custom_all_reduce: bool = False,
        distributed_coordinator: Optional[str] = None,
        distributed_num_processes: Optional[int] = None,
        distributed_process_id: Optional[int] = None,
    ) -> None:
        self.pipeline_parallel_size = pipeline_parallel_size
        self.tensor_parallel_size = tensor_parallel_size
        self.data_parallel_size = data_parallel_size
        self.max_parallel_loading_workers = max_parallel_loading_workers
        self.disable_custom_all_reduce = disable_custom_all_reduce
        # Multi-host runtime (jax.distributed over DCN); None = env/auto.
        self.distributed_coordinator = distributed_coordinator
        self.distributed_num_processes = distributed_num_processes
        self.distributed_process_id = distributed_process_id
        self.world_size = (pipeline_parallel_size * tensor_parallel_size *
                           data_parallel_size)
        if pipeline_parallel_size > 1:
            # Matches the reference, which also rejects PP>1 (config.py:525).
            raise NotImplementedError(
                "pipeline parallelism is declared but not implemented; "
                "use tensor_parallel_size / data_parallel_size")


class SchedulerConfig:
    """Scheduler configuration (counterpart of reference SchedulerConfig,
    vllm/config.py:543-616)."""

    def __init__(
        self,
        max_num_batched_tokens: Optional[int] = None,
        max_num_seqs: int = 256,
        max_model_len: int = 2048,
        use_v2_block_manager: bool = False,
        num_lookahead_slots: int = 0,
        delay_factor: float = 0.0,
        enable_chunked_prefill: bool = False,
        schedule_type: Union[str, ScheduleSpec] = "fcfs",
        enable_starvation_prevent: bool = False,
        fake_allocate: bool = False,
        decode_steps_per_dispatch: int = 1,
        precompile_shapes: bool = False,
        async_aux_scoring: bool = False,
        lazy_aux_scoring: bool = False,
        pipeline_admission: bool = True,
    ) -> None:
        if max_num_batched_tokens is None:
            # Chunked prefill decouples the token budget from max_model_len;
            # otherwise the budget must admit a full-length prompt.
            max_num_batched_tokens = (768 if enable_chunked_prefill else
                                      max(max_model_len, 2048))
        self.max_num_batched_tokens = max_num_batched_tokens
        self.max_num_seqs = max_num_seqs
        self.max_model_len = max_model_len
        self.use_v2_block_manager = use_v2_block_manager
        self.num_lookahead_slots = num_lookahead_slots
        self.delay_factor = delay_factor
        self.chunked_prefill_enabled = enable_chunked_prefill
        self.enable_starvation_prevent = enable_starvation_prevent
        self.fake_allocate = fake_allocate
        self.decode_steps_per_dispatch = decode_steps_per_dispatch
        # Walk the jit shape ladder at init (serving: pay all compiles up
        # front; LTR_TPU_PRECOMPILE=1 forces it on).
        self.precompile_shapes = (precompile_shapes or os.environ.get(
            "LTR_TPU_PRECOMPILE", "0") == "1")
        # Overlap aux-predictor scoring with the in-flight serving wave
        # (scores land one pass later; score-once contract preserved).
        self.async_aux_scoring = async_aux_scoring
        # Skip the predictor round trip on passes that provably admit the
        # whole population regardless of order; the first contended pass
        # scores every unscored request (any lane) in one batch.  A
        # deliberate relaxation of the reference's score-before-first-
        # scheduling contract, exact under no contention.
        self.lazy_aux_scoring = lazy_aux_scoring
        # Sneak new prompts' prefills behind the in-flight dispatch (both
        # engines; the sync engine enqueues them back-to-back so an
        # admitted cohort pays ONE device round trip, not one per wave).
        self.pipeline_admission = pipeline_admission
        if isinstance(schedule_type, ScheduleSpec):
            self.schedule_spec = schedule_type
        else:
            self.schedule_spec = ScheduleSpec.parse(schedule_type,
                                                    enable_starvation_prevent)
        self._check()

    @property
    def schedule_type(self) -> str:
        return self.schedule_spec.to_schedule_type()

    def _check(self) -> None:
        budget, mml = self.max_num_batched_tokens, self.max_model_len
        if budget < mml and not self.chunked_prefill_enabled:
            raise ValueError(
                f"token budget {budget} < max_model_len {mml}: without "
                "chunked prefill a full-length prompt could never be "
                "admitted — raise max_num_batched_tokens, lower "
                "max_model_len, or enable chunked prefill")
        if budget < self.max_num_seqs:
            raise ValueError(
                f"token budget {budget} cannot cover one decode token for "
                f"each of max_num_seqs={self.max_num_seqs} sequences")
        if self.num_lookahead_slots < 0:
            raise ValueError("num_lookahead_slots cannot be negative "
                             f"(got {self.num_lookahead_slots})")
        if self.decode_steps_per_dispatch < 1:
            raise ValueError("decode_steps_per_dispatch is a fusion depth; "
                             f"needs >= 1, got {self.decode_steps_per_dispatch}")


class DeviceConfig:

    def __init__(self, device: str = "auto") -> None:
        if device == "auto":
            try:
                import jax
                platform = jax.default_backend()
            except Exception:  # pragma: no cover
                platform = "cpu"
            device = "tpu" if platform not in ("cpu", ) else "cpu"
        self.device_type = device
        self.device = device


@dataclass
class LoadConfig:
    """Weight loading configuration (reference LoadConfig, config.py)."""
    load_format: str = "auto"  # auto|safetensors|pt|npz|dummy
    download_dir: Optional[str] = None
    model_loader_extra_config: Dict[str, Any] = field(default_factory=dict)


@dataclass
class LoRAConfig:
    max_lora_rank: int = 16
    max_loras: int = 1
    max_cpu_loras: Optional[int] = None
    lora_dtype: Optional[str] = None
    lora_extra_vocab_size: int = 256

    def verify_with_model_config(self, model_config: ModelConfig) -> None:
        if self.max_lora_rank not in (8, 16, 32, 64):
            raise ValueError(f"max_lora_rank ({self.max_lora_rank}) must be "
                             "one of (8, 16, 32, 64).")


@dataclass
class SpeculativeConfig:
    """Speculative decoding configuration."""
    draft_model: Optional[str] = None
    num_speculative_tokens: int = 0


@dataclass
class DecodingConfig:
    """Guided-decoding backend selector (reference DecodingConfig,
    vllm/config.py).  Both names run through the built-in token-FSM
    engine (vllm_ltr_tpu/guided/) but with the reference backends'
    semantics: 'native'/'outlines' compile guided_json to strict compact
    JSON (outlines' build_regex_from_schema behavior), while
    'lm-format-enforcer' compiles the whitespace-tolerant form the
    reference's alternative backend accepts
    (lm_format_enforcer_decoding.py).  choice/regex/grammar are
    backend-independent."""
    guided_decoding_backend: str = "native"

    def __post_init__(self) -> None:
        allowed = ("native", "outlines", "lm-format-enforcer", "none")
        if self.guided_decoding_backend not in allowed:
            raise ValueError(
                f"guided_decoding_backend must be one of {allowed}, got "
                f"{self.guided_decoding_backend!r}")


class EngineConfig:
    """Bundle of all engine configs (analogue of the reference's
    ``EngineConfig`` NamedTuple built by arg_utils.py:476-512)."""

    def __init__(
        self,
        model_config: ModelConfig,
        cache_config: CacheConfig,
        parallel_config: ParallelConfig,
        scheduler_config: SchedulerConfig,
        device_config: DeviceConfig,
        load_config: LoadConfig,
        lora_config: Optional[LoRAConfig] = None,
        speculative_config: Optional[SpeculativeConfig] = None,
        decoding_config: Optional[DecodingConfig] = None,
    ) -> None:
        self.model_config = model_config
        self.cache_config = cache_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config
        self.device_config = device_config
        self.load_config = load_config
        self.lora_config = lora_config
        self.speculative_config = speculative_config
        self.decoding_config = decoding_config or DecodingConfig()

    def to_dict(self):
        return dict(
            (field, getattr(self, field)) for field in self.__dict__)
