"""TPU executor: owns the mesh, the model params, the paged KV cache, and
the jitted step function.

Collapses the reference's executor/worker/model-runner/cache-engine stack
(``vllm/executor/gpu_executor.py``, ``ray_gpu_executor.py``,
``vllm/worker/worker.py``, ``model_runner.py``, ``cache_engine.py``) into one
single-controller component: the scheduler's per-step plan is packed into
padded arrays (executor/input_batch.py) and dispatched as ONE jit call over
the device mesh — GSPMD inserts the TP collectives that NCCL/Ray provided in
the reference (SURVEY.md §2.5). Per-bucket jit caches replace CUDA-graph
capture per batch size (model_runner.py:974-1226).

Also hosts the AUX predictor as a second jitted (dense, non-paged) forward on
the same mesh — the entire dual-worker Ray machinery of the reference
(ray_gpu_executor.py:31-218) reduces to `score_prompts`.
"""
from __future__ import annotations

import functools
import os
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vllm_ltr_tpu.config import EngineConfig
from vllm_ltr_tpu.executor.input_batch import (PreparedBatch, make_buckets,
                                               prepare_batch)
from vllm_ltr_tpu.layers.sampler import (SamplingTensors, apply_token_mask,
                                         sample)
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.models import resolve_model_cls
from vllm_ltr_tpu.models.common import AttentionMetadata, dtype_by_name
from vllm_ltr_tpu.models.weights import load_params
from vllm_ltr_tpu.ops.kv_cache import (HostSwapSpace, allocate_kv_cache,
                                       run_copy_blocks)
from vllm_ltr_tpu.parallel import distributed as dist
from vllm_ltr_tpu.parallel.mesh import (MODEL_AXIS, ShardingLayout,
                                        build_mesh, set_global_mesh)
from vllm_ltr_tpu.sequence import (Logprob, SamplerOutput, SequenceGroupOutput,
                                   SequenceGroupMetadata, SequenceOutput)
from vllm_ltr_tpu.utils import STR_DTYPE_TO_KV_DTYPE, cdiv

logger = init_logger(__name__)

_GB = 1 << 30
# Top-K alternatives shipped per prompt position by the prompt_logprobs
# scorer (one compiled shape regardless of the per-request k <= this).
PROMPT_LOGPROB_K = 8


def load_kv_cache_scales(path: str, num_layers: int):
    """Parse per-layer KV scales. Accepts the reference schema
    (kv_cache_scales.json: {"kv_cache": {"scaling_factor": {tp_rank:
    {layer: scale}}}}, layers/quantization/schema.py) or a flat
    {"kv_cache_scales": [per-layer floats]}."""
    import json
    with open(path) as f:
        data = json.load(f)
    if "kv_cache_scales" in data:
        scales = list(map(float, data["kv_cache_scales"]))
    else:
        factors = data["kv_cache"]["scaling_factor"]
        rank0 = factors[sorted(factors.keys())[0]]
        scales = [float(rank0[str(i)]) for i in range(num_layers)]
    assert len(scales) == num_layers, (len(scales), num_layers)
    return scales


def _param_spec(path: Tuple[str, ...], ndim: int) -> P:
    """Name-pattern tensor-parallel sharding for model params.

    Column-parallel (output sharded): q/k/v/gate/up/fc1/qkv weights.
    Row-parallel (input sharded): o/down/fc2/out weights.
    Vocab-parallel: token embeddings. Everything else replicated.
    Layer-stacked params carry a leading layer axis (dim 0).
    """
    name = path[-1]
    stacked = "layers" in path

    def spec(*tail):
        lead = (None, ) if stacked else ()
        full = lead + tail
        return P(*full[:ndim]) if len(full) >= ndim else P(*full)

    # Quantized weights (per-shard plane-major concatenation, see
    # layers/quantization/int4.py): column-parallel shards the lane axis
    # (last for packed/scales/zeros/lut), row-parallel the K axis (first).
    if name in ("packed", "scales", "zeros", "lut") and len(path) >= 2:
        from vllm_ltr_tpu.layers.quantization.int4 import ROW_PARALLEL
        parent = path[-2]
        row = parent in ROW_PARALLEL
        if name == "packed":
            return spec(MODEL_AXIS, None) if row else spec(None, MODEL_AXIS)
        if name == "lut":  # [16, 8, N8p]; row-parallel LUTs replicate
            return P() if row else spec(None, None, MODEL_AXIS)
        # scales / zeros: [Kp//G, 8, N8p]
        return spec(MODEL_AXIS) if row else spec(None, None, MODEL_AXIS)

    if name in ("q_w", "k_w", "v_w", "gate_w", "up_w", "fc1_w", "qkv_w"):
        return spec(None, MODEL_AXIS)
    if name in ("o_w", "down_w", "fc2_w", "out_w"):
        return spec(MODEL_AXIS, None)
    if name in ("qkv_b", "fc1_b"):
        return spec(MODEL_AXIS)
    if name == "embed_tokens":
        return P(MODEL_AXIS, None)
    if name == "lm_head":
        return P(None, MODEL_AXIS)
    return P()


def shard_params(params, mesh) -> Any:
    """Place a params pytree onto the mesh with TP shardings."""

    def place(path, leaf):
        names = tuple(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        sharding = NamedSharding(mesh, _param_spec(names, leaf.ndim))
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map_with_path(place, params)


_COMPILE_CACHE_ENABLED = False


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (counterpart of the reference's
    CUDA-graph capture reuse, model_runner.py:974): serving processes are
    short-lived relative to compile time on a tunneled TPU, so executables
    are cached on disk and reused across processes. Opt out with
    LTR_TPU_COMPILE_CACHE=0 or redirect with LTR_TPU_COMPILE_CACHE=<dir>."""
    global _COMPILE_CACHE_ENABLED
    if _COMPILE_CACHE_ENABLED:
        return
    import os
    setting = os.environ.get("LTR_TPU_COMPILE_CACHE", "1")
    if setting == "0":
        return
    try:
        if jax.default_backend() == "cpu":
            # CPU AOT executables embed host ISA features; a cache shared
            # across heterogeneous hosts risks SIGILL on reload. CPU
            # compiles are cheap — cache only accelerator executables.
            return
    except Exception:
        return
    cache_dir = (setting if setting not in ("", "1") else
                 os.path.expanduser("~/.cache/vllm_ltr_tpu/xla_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # cache is best-effort
        logger.warning("compilation cache disabled: %s", exc)
        return
    _COMPILE_CACHE_ENABLED = True
    logger.info("XLA compilation cache at %s", cache_dir)


class TPUExecutor:
    """Single-controller executor over a (data, model) device mesh."""

    def __init__(self, engine_config: EngineConfig) -> None:
        self.config = engine_config
        model_config = engine_config.model_config
        parallel_config = engine_config.parallel_config
        cache_config = engine_config.cache_config
        scheduler_config = engine_config.scheduler_config

        # Multi-host: join the jax.distributed runtime first so the mesh
        # spans every host's chips (reference worker.py:283-320 equivalent).
        # Must precede anything that initialises the XLA backend — including
        # the compilation-cache probe's jax.default_backend() call.
        dist.init_distributed(parallel_config.distributed_coordinator,
                              parallel_config.distributed_num_processes,
                              parallel_config.distributed_process_id)

        _enable_compilation_cache()
        self.multihost = dist.process_count() > 1
        self.is_leader = dist.is_leader()

        self.mesh = build_mesh(parallel_config.tensor_parallel_size,
                               parallel_config.data_parallel_size)
        set_global_mesh(self.mesh)
        self.layout = ShardingLayout(self.mesh)

        self.hf_config = model_config.hf_config
        self.model_cls = resolve_model_cls(model_config.architectures)
        self.dtype = dtype_by_name(model_config.dtype)
        kv_dtype_name = STR_DTYPE_TO_KV_DTYPE[cache_config.cache_dtype]
        self.kv_dtype = (self.dtype if kv_dtype_name is None else
                         getattr(jnp, kv_dtype_name))

        # Model dims (per full model; sharding splits heads across devices).
        # VLM composite configs (LLaVA) keep the LM dims in text_config.
        text_config = model_config.hf_text_config
        self.is_vlm = hasattr(self.model_cls, "encode_images")
        self._encode_images_fn = None
        self.num_layers = text_config.num_hidden_layers
        self.num_kv_heads = model_config.get_total_num_kv_heads()
        self.head_dim = model_config.get_head_size()
        self.vocab_size = text_config.vocab_size
        self.block_size = cache_config.block_size
        self.max_model_len = model_config.max_model_len
        self.max_blocks_per_seq = cdiv(self.max_model_len, self.block_size)
        # Query-tile size for the Pallas chunked-prefill kernel (the batch
        # packer aligns prefill rows to it).
        from vllm_ltr_tpu.ops.pallas.prefill_attention import (
            prefill_tile_size)
        num_q_heads = text_config.num_attention_heads
        self.prefill_tile = prefill_tile_size(
            max(num_q_heads // self.num_kv_heads, 1))

        # Load + place weights.
        t0 = time.time()
        params = load_params(self.model_cls, model_config.model,
                             self.hf_config, self.dtype,
                             engine_config.load_config.load_format,
                             model_config.seed,
                             quantization=model_config.quantization,
                             download_dir=(
                                 engine_config.load_config.download_dir))
        # FP8 KV-cache scales (reference --quantization-param-path +
        # kv_cache_scales.json schema, model_runner.py:195-208).
        if (cache_config.cache_dtype.startswith("fp8")
                and model_config.quantization_param_path):
            params["kv_scales"] = jnp.asarray(
                load_kv_cache_scales(model_config.quantization_param_path,
                                     self.num_layers), jnp.float32)
            logger.info("Loaded FP8 KV-cache scales from %s",
                        model_config.quantization_param_path)
        self.params = shard_params(params, self.mesh)
        self.param_bytes = sum(
            x.nbytes for x in jax.tree.leaves(self.params))
        logger.info("Loaded model in %.2fs (%.2f GiB params)",
                    time.time() - t0, self.param_bytes / _GB)

        # Step-shape buckets.
        self.token_buckets = make_buckets(
            16, scheduler_config.max_num_batched_tokens)
        self.seq_buckets = make_buckets(8, scheduler_config.max_num_seqs)

        self.kv_cache: Optional[jax.Array] = None
        self.swap_space: Optional[HostSwapSpace] = None
        self._rng = jax.random.PRNGKey(model_config.seed)
        self._last_health_probe = 0.0
        self._seen_shapes: set = set()

        # Embedded mid-layer predictor (reference predictor.py + the
        # --predictor-model-config graft, model_loader/loader.py:234-241).
        self.pred_config = model_config.predictor_model_config
        self.pred_params = None
        if self.pred_config is not None:
            from vllm_ltr_tpu.layers.embedded_predictor import (
                init_predictor_params, load_predictor_params)
            if getattr(self.pred_config, "weights", None):
                self.pred_params = load_predictor_params(
                    self.pred_config, self.pred_config.weights)
            else:
                self.pred_params = init_predictor_params(
                    self.pred_config, jax.random.PRNGKey(0))
            self.pred_params = jax.device_put(self.pred_params)
            logger.info(
                "Embedded predictor grafted at layer %d (n_features=%d)",
                self.pred_config.pred_layer_idx,
                self.pred_config.n_features)

        self._step_fn = self._build_step_fn()
        self._sample_fn = self._build_sample_fn()
        self._plp_fn = None  # prompt_logprobs scorer (built on first use)
        # Independent PRNG stream for the two-phase (host logits_processor)
        # sample dispatch: it runs from the fetch thread, which must not
        # race the dispatch thread's self._rng.  Its own lock serializes
        # concurrent two-phase finishes (a main step and a sneak step can
        # fetch in parallel).
        self._rng2 = None
        self._rng2_lock = threading.Lock()

        # Fused multi-step decode (executor/multi_step.py): K decode
        # iterations chained on-device per host dispatch.
        self.decode_steps = scheduler_config.decode_steps_per_dispatch
        self._multi_step_fn = None
        if self.decode_steps > 1:
            from vllm_ltr_tpu.executor.multi_step import build_multi_step_fn
            self._multi_step_fn = build_multi_step_fn(
                self.model_cls, self.hf_config, self.mesh, self.decode_steps)
            logger.info("Fused multi-step decode: %d steps per dispatch",
                        self.decode_steps)

        # LoRA bank (counterpart of WorkerLoRAManager, reference
        # vllm/lora/worker_manager.py): adapters load on first use, LRU.
        self.lora_bank = None
        if engine_config.lora_config is not None:
            from vllm_ltr_tpu.lora.models import LoRABank
            lc = engine_config.lora_config
            self.lora_bank = LoRABank(lc.max_loras, lc.max_lora_rank,
                                      self.num_layers, self.dtype)
        self._lora_paths: Dict[int, str] = {}

        # Speculative decoding (reference vllm/spec_decode, SURVEY §2.3).
        self.spec_config = engine_config.speculative_config
        self.draft_params = None
        self.draft_cls = None
        self.draft_hf_config = None
        self.draft_kv_cache = None
        self._spec_fn = None
        self._draft_prefill_fn = None
        if self.spec_config is not None and self.spec_config.draft_model:
            from vllm_ltr_tpu.transformers_utils.config import get_hf_config
            self.draft_hf_config = get_hf_config(
                self.spec_config.draft_model)
            self.draft_cls = resolve_model_cls(
                getattr(self.draft_hf_config, "architectures", []) or
                ["LlamaForCausalLM"])
            draft_p = load_params(self.draft_cls,
                                  self.spec_config.draft_model,
                                  self.draft_hf_config, self.dtype,
                                  engine_config.load_config.load_format,
                                  model_config.seed + 1)
            self.draft_params = shard_params(draft_p, self.mesh)
            from vllm_ltr_tpu.executor.spec_decode import build_spec_step_fn
            self._spec_fn = build_spec_step_fn(
                self.model_cls, self.hf_config, self.draft_cls,
                self.draft_hf_config, self.spec_config.num_speculative_tokens)
            self._draft_prefill_fn = self._build_draft_prefill_fn()
            logger.info("Speculative decoding: draft=%s k=%d",
                        self.spec_config.draft_model,
                        self.spec_config.num_speculative_tokens)

        # AUX predictor state (attached later via init_aux_model).
        self.aux_params = None
        self.aux_model_cls = None
        self.aux_hf_config = None
        self.aux_prefill_config = None

        # Dispatch accounting (counterpart of the reference's nsight/
        # OPT_TIME ad-hoc timing, SURVEY §5): how many device dispatches of
        # each kind this executor issued, and how many tokens each kind
        # produced. Read by benchmarks to attribute throughput.
        self.dispatch_stats: Dict[str, float] = {
            "steps": 0,
            "mixed_steps": 0,
            "prefill_dispatches": 0,
            "prefill_tokens": 0,
            "decode_fused_dispatches": 0,
            "decode_single_dispatches": 0,
            "decode_tokens": 0,
            "prefill_s": 0.0,
            "decode_fused_s": 0.0,
            "decode_single_s": 0.0,
            "aux_dispatches": 0,
            "aux_s": 0.0,
        }

    # ------------------------------------------------------------------
    # KV cache sizing (counterpart of Worker.determine_num_available_blocks,
    # reference worker.py:120-164)
    # ------------------------------------------------------------------

    def _block_bytes(self) -> int:
        from vllm_ltr_tpu.ops.kv_cache import padded_head_dim
        kv_itemsize = jnp.zeros((), self.kv_dtype).dtype.itemsize
        return (self.num_layers * 2 * self.block_size * self.num_kv_heads *
                padded_head_dim(self.head_dim) * kv_itemsize)

    def determine_num_available_blocks(self) -> Tuple[int, int]:
        cache_config = self.config.cache_config
        num_cpu_blocks = int(cache_config.swap_space_bytes //
                             self._block_bytes())
        if cache_config.num_device_blocks_override is not None:
            return cache_config.num_device_blocks_override, num_cpu_blocks

        dev = jax.local_devices()[0]
        stats = {}
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            pass
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit is None:
            # CPU backend (tests): small fixed cache.
            logger.warning(
                "Device memory stats unavailable; defaulting to 512 blocks")
            return 512, num_cpu_blocks

        # Reserve activation headroom: the largest step's intermediate
        # tensors. Estimated from the max token bucket; XLA fusion keeps
        # true usage below this.
        hidden = self.hf_config.hidden_size
        act_reserve = (self.token_buckets[-1] * hidden * 4 * 16 +
                       self.seq_buckets[-1] * self.vocab_size * 4 * 4)
        tp = self.config.parallel_config.tensor_parallel_size
        available = (limit * cache_config.hbm_utilization - in_use -
                     act_reserve)
        # The cache array is sharded over kv heads: per-device block bytes
        # shrink by tp, so the device fits tp x more logical blocks.
        num_gpu_blocks = int(available * tp // self._block_bytes())
        num_gpu_blocks = max(num_gpu_blocks, 0)
        if self.multihost:
            # Identical shapes everywhere: adopt the leader's sizing.
            counts = dist.broadcast_header(
                np.asarray([num_gpu_blocks, num_cpu_blocks] + [0] * 14,
                           np.int32) if self.is_leader else None)
            num_gpu_blocks, num_cpu_blocks = int(counts[0]), int(counts[1])
        logger.info(
            "HBM %.2f GiB limit, %.2f GiB in use -> %d device blocks "
            "(%d host swap blocks)", limit / _GB, in_use / _GB,
            num_gpu_blocks, num_cpu_blocks)
        return num_gpu_blocks, num_cpu_blocks

    def initialize_cache(self, num_gpu_blocks: int,
                         num_cpu_blocks: int) -> None:
        cache_config = self.config.cache_config
        cache_config.num_gpu_blocks = num_gpu_blocks
        cache_config.num_cpu_blocks = num_cpu_blocks
        self.kv_cache = allocate_kv_cache(self.num_layers,
                                          num_gpu_blocks,
                                          self.block_size,
                                          self.num_kv_heads,
                                          self.head_dim,
                                          dtype=self.kv_dtype,
                                          sharding=self.layout.kv_cache)
        self.swap_space = HostSwapSpace(self.num_layers, num_cpu_blocks,
                                        self.block_size, self.num_kv_heads,
                                        self.head_dim, self.kv_dtype)
        if self.draft_params is not None:
            dc = self.draft_hf_config
            d_kv_heads = getattr(dc, "num_key_value_heads",
                                 dc.num_attention_heads)
            d_head = dc.hidden_size // dc.num_attention_heads
            self.draft_kv_cache = allocate_kv_cache(
                dc.num_hidden_layers, num_gpu_blocks, self.block_size,
                d_kv_heads, d_head, dtype=self.kv_dtype,
                sharding=self.layout.kv_cache)

    def initialize_cache_empty(self) -> None:
        """AUX-engine path: no real cache (reference
        ray_gpu_executor.py:384-400). The dense scorer needs none."""
        self.config.cache_config.num_gpu_blocks = 0
        self.config.cache_config.num_cpu_blocks = 0

    # ------------------------------------------------------------------
    # Shape warmup
    # ------------------------------------------------------------------

    def precompile_shapes(self) -> None:
        """Walk the step function's jit shape ladder once with dummy
        batches, so serving never compiles in a request's critical path.

        Counterpart of the reference's CUDA-graph capture warmup
        (model_runner.py capture_model :974, one graph per batch size).
        Here a shape is (token bucket) for prefill — the seq dim is pinned
        per bucket by prepare_batch — plus (seq bucket) for decode.  Each
        fresh shape costs 20-140 s through the remote-compile relay, so
        serving without warmup pays that inside the first unlucky request
        (measured: 15 cold prefill shapes = 510 s of a 535 s online run).
        The dummy writes land in low-numbered KV blocks before any request
        exists; real allocations overwrite them.
        """
        from vllm_ltr_tpu.sampling_params import SamplingParams
        from vllm_ltr_tpu.sequence import (Logprob, Sequence,
                                           SequenceGroupMetadata)
        assert self.kv_cache is not None, "initialize_cache first"
        t0 = time.time()
        n_shapes = 0
        greedy = SamplingParams(temperature=0.0, max_tokens=1,
                                ignore_eos=True)
        n_blocks = self.config.cache_config.num_gpu_blocks or 1
        max_len = min(self.config.model_config.max_model_len,
                      self.max_blocks_per_seq * self.block_size)
        tile = max(self.prefill_tile, 1)
        max_seqs = self.seq_buckets[-1]

        def meta_for_prompt(rid: int, length: int, first_block: int):
            seq = Sequence(rid, None, [1] * length, self.block_size)
            blocks = [(first_block + i) % n_blocks
                      for i in range(seq.num_blocks())]
            return SequenceGroupMetadata(
                request_id=f"warmup-{rid}", is_prompt=True,
                seq_data={rid: seq}, sampling_params=greedy,
                block_tables={rid: blocks}), first_block + len(blocks)

        # Prefill: one dummy batch per reachable token bucket (padded
        # batches are always tile-aligned, so buckets below one tile and
        # non-tile-multiples never occur).
        reachable = sorted({
            b for b in self.token_buckets if b >= tile and b % tile == 0})
        for bucket in reachable:
            row_len = min(max_len, bucket)
            row_len -= row_len % tile
            if row_len <= 0:  # tiny max_model_len test configs
                row_len = min(max_len, bucket)
            lens = [row_len] * (bucket // row_len)
            if sum(lens) < bucket:
                lens.append(bucket - sum(lens))
            if len(lens) > max_seqs:
                continue  # bucket unreachable under max_num_seqs
            metas, nb = [], 0
            for i, ln in enumerate(lens):
                m, nb = meta_for_prompt(i, ln, nb)
                metas.append(m)
            n_shapes += self._warm_one(metas)

        # Decode: one dummy batch per seq bucket (takes the fused
        # multi-step path when enabled, the single-step path otherwise).
        for bucket in self.seq_buckets:
            metas = []
            for i in range(bucket):
                seq = Sequence(i, None, [1] * (self.block_size - 1),
                               self.block_size)
                seq.update_num_computed_tokens(self.block_size - 1)
                seq.append_token_id(1, {1: Logprob(0.0)})
                metas.append(
                    SequenceGroupMetadata(
                        request_id=f"warmup-d{i}", is_prompt=False,
                        seq_data={i: seq}, sampling_params=greedy,
                        block_tables={i: [i % n_blocks]}))
            n_shapes += self._warm_one(metas)
        logger.info("Precompiled %d step shapes in %.1fs", n_shapes,
                    time.time() - t0)

    def _warm_one(self, metas) -> int:
        """Best-effort: a failed warmup shape just compiles lazily later
        (remote-compile relays can drop a connection mid-startup)."""
        try:
            self.execute_model(metas, {}, {}, {})
            return 1
        except Exception as e:  # noqa: BLE001 - warmup must never be fatal
            logger.warning("Shape warmup failed (%s rows): %s", len(metas),
                           str(e)[:200])
            return 0

    # ------------------------------------------------------------------
    # The jitted step
    # ------------------------------------------------------------------

    def _build_step_fn(self):
        model_cls = self.model_cls
        cfg = self.hf_config
        mesh = self.mesh
        block_size = self.block_size

        pred_config = self.pred_config

        @functools.partial(
            jax.jit,
            # Donate the KV cache (argnum 2) so every step's page writes
            # alias into the live buffer — without it XLA copies the whole
            # multi-GiB cache per dispatch. (pred_params must NOT be
            # donated: it is reused across calls.)
            donate_argnums=(2, ),
            static_argnames=("use_penalties", "decode_mode",
                             "capture_layer", "has_lora", "prefill_tile",
                             "exact_sampling", "has_logits_mask",
                             "return_logits", "has_page_dst"))
        def step_fn(params, pred_params, kv_cache, i32_t, i32_s, f32_s,
                    block_tables, token_counts, rng,
                    use_penalties: bool, decode_mode: bool,
                    capture_layer=None, has_lora: bool = False,
                    prefill_tile=None, image_embeds=None,
                    exact_sampling: bool = True, logits_mask=None,
                    has_logits_mask: bool = False,
                    return_logits: bool = False,
                    has_page_dst: bool = False):
            # The PRNG key lives on device: split here and thread the next
            # key back through the return value — an eager host-side
            # jax.random.split costs a full relay round trip per step.
            rng, next_rng = jax.random.split(rng)
            # Packed host buffers (4 H2D transfers per step instead of ~17;
            # the per-step dispatch latency is the serving bottleneck).
            tokens, positions, token_seq, slot_mapping = (i32_t[0], i32_t[1],
                                                          i32_t[2], i32_t[3])
            lora_slots = i32_t[4] if has_lora else None
            page_dst = None
            if has_page_dst:
                n_pages = i32_t.shape[1] // block_size
                page_dst = i32_t[4 + int(has_lora), :n_pages]
            seq_lens, sample_idx, top_k = i32_s[0], i32_s[1], i32_s[2]
            greedy = i32_s[3] > 0
            (temperature, top_p, min_p, presence, frequency,
             repetition) = (f32_s[0], f32_s[1], f32_s[2], f32_s[3], f32_s[4],
                            f32_s[5])
            meta = AttentionMetadata(token_seq=token_seq,
                                     token_pos=positions,
                                     slot_mapping=slot_mapping,
                                     block_tables=block_tables,
                                     seq_lens=seq_lens,
                                     lora_slots=lora_slots,
                                     prefill_tile=prefill_tile,
                                     page_dst=page_dst)
            pred_scores = jnp.zeros(sample_idx.shape, jnp.float32)
            vlm_kwargs = ({} if image_embeds is None else
                          {"image_embeds": image_embeds})
            if capture_layer is not None:
                from vllm_ltr_tpu.layers.embedded_predictor import (
                    predictor_score)
                hidden, kv_cache, captured = model_cls.forward(
                    params, tokens, positions, kv_cache, meta, cfg,
                    decode_mode=decode_mode, capture_layer=capture_layer,
                    **vlm_kwargs)
                pred_scores = predictor_score(pred_params,
                                              captured[sample_idx],
                                              pred_config)
            else:
                hidden, kv_cache = model_cls.forward(
                    params, tokens, positions, kv_cache, meta, cfg,
                    decode_mode=decode_mode, **vlm_kwargs)
            sel = hidden[sample_idx]  # [S, H] last-token hidden states
            logits = model_cls.compute_logits(params, sel, cfg)
            if has_lora:
                from vllm_ltr_tpu.lora.models import apply_lm_head_lora
                logits = apply_lm_head_lora(params, sel, logits,
                                            lora_slots[sample_idx])
            if return_logits:
                # Two-phase path (host logits_processors): hand the raw
                # logits to the host; sampling happens in _sample_fn after
                # the processors run.  Guided masks still apply on-device.
                out_logits = logits.astype(jnp.float32)
                if has_logits_mask:
                    out_logits = apply_token_mask(out_logits, logits_mask)
                rep0 = NamedSharding(mesh, P())
                out_logits = jax.lax.with_sharding_constraint(
                    out_logits, rep0)
                pred_out = jax.lax.with_sharding_constraint(
                    pred_scores, rep0)
                return kv_cache, out_logits, pred_out, next_rng
            st = SamplingTensors(temperature=temperature,
                                 top_p=top_p,
                                 top_k=top_k,
                                 min_p=min_p,
                                 greedy=greedy,
                                 presence_penalty=presence,
                                 frequency_penalty=frequency,
                                 repetition_penalty=repetition)
            res = sample(logits,
                         st,
                         rng,
                         token_counts=token_counts if use_penalties else None,
                         exact=exact_sampling,
                         packed_mask=logits_mask if has_logits_mask else
                         None)
            # Pack outputs: 2 D2H transfers per step. Outputs are pinned
            # fully-replicated so every host can read its local copy
            # without a collective (multi-host leader fetch).
            rep = NamedSharding(mesh, P())
            out_i32 = jax.lax.with_sharding_constraint(
                jnp.concatenate([res.tokens[:, None], res.topk_ids],
                                axis=1), rep)
            out_f32 = jax.lax.with_sharding_constraint(
                jnp.concatenate([
                    res.logprobs[:, None], pred_scores[:, None],
                    res.topk_logprobs
                ], axis=1), rep)
            return kv_cache, out_i32, out_f32, next_rng

        return step_fn

    def _build_prompt_lp_fn(self):
        """Teacher-forced prompt scorer for ``prompt_logprobs`` (reference
        computes these inside the sampler, vllm/model_executor/layers/
        sampler.py:38-90).  Here it is a separate jitted dispatch that
        re-runs the prefill forward and emits, per flat token position,
        the log-probability of the host-provided target (the next prompt
        token) plus the top-K alternatives — the hot serving step's
        compiled shapes stay untouched, and requests that never ask for
        prompt logprobs never pay for them.  The lm_head runs in 512-token
        slices so the [T, V] logits never materialize at once."""
        model_cls = self.model_cls
        cfg = self.hf_config
        mesh = self.mesh
        block_size = self.block_size

        @functools.partial(jax.jit,
                           donate_argnums=(1, ),
                           static_argnames=("has_lora", "prefill_tile",
                                            "has_page_dst"))
        def plp_fn(params, kv_cache, i32_t, block_tables, seq_lens, targets,
                   has_lora: bool = False, prefill_tile=None,
                   has_page_dst: bool = False):
            tokens, positions, token_seq, slot_mapping = (i32_t[0], i32_t[1],
                                                          i32_t[2], i32_t[3])
            lora_slots = i32_t[4] if has_lora else None
            page_dst = None
            if has_page_dst:
                n_pages = i32_t.shape[1] // block_size
                page_dst = i32_t[4 + int(has_lora), :n_pages]
            meta = AttentionMetadata(token_seq=token_seq,
                                     token_pos=positions,
                                     slot_mapping=slot_mapping,
                                     block_tables=block_tables,
                                     seq_lens=seq_lens,
                                     lora_slots=lora_slots,
                                     prefill_tile=prefill_tile,
                                     page_dst=page_dst)
            hidden, kv_cache = model_cls.forward(params, tokens, positions,
                                                 kv_cache, meta, cfg,
                                                 decode_mode=False)
            T = hidden.shape[0]
            K = PROMPT_LOGPROB_K
            step = min(T, 512)
            lps, tk_ids, tk_lps = [], [], []
            for s0 in range(0, T, step):
                sl = hidden[s0:s0 + step]
                lg = model_cls.compute_logits(params, sl,
                                              cfg).astype(jnp.float32)
                lg = jax.nn.log_softmax(lg, axis=-1)
                tgt = targets[s0:s0 + step]
                safe = jnp.clip(tgt, 0, lg.shape[1] - 1)
                lps.append(
                    jnp.take_along_axis(lg, safe[:, None], axis=1)[:, 0])
                top_lp, top_id = jax.lax.top_k(lg, K)
                tk_ids.append(top_id)
                tk_lps.append(top_lp)
            rep = NamedSharding(mesh, P())
            out_lp = jax.lax.with_sharding_constraint(
                jnp.concatenate(lps), rep)
            out_ids = jax.lax.with_sharding_constraint(
                jnp.concatenate(tk_ids), rep)
            out_tlp = jax.lax.with_sharding_constraint(
                jnp.concatenate(tk_lps), rep)
            return kv_cache, out_lp, out_ids, out_tlp

        return plp_fn

    def _maybe_dispatch_prompt_logprobs(self, seq_group_metadata_list,
                                        batch, params, i32_t, block_tables,
                                        i32_s, has_lora, step_tile,
                                        has_page_dst):
        """When any scheduled prefill requests ``prompt_logprobs``,
        dispatch the teacher-forced scorer after the main step and return
        a fetch() -> {g_idx: [None|{token: Logprob}]} closure (None when
        no request asks)."""
        if batch.decode_only:
            return None
        want: Dict[int, int] = {}
        for g_idx, meta in enumerate(seq_group_metadata_list):
            sp = meta.sampling_params
            if meta.is_prompt and sp.prompt_logprobs is not None:
                want[g_idx] = sp.prompt_logprobs
        if not want:
            return None
        assert not self.multihost, (
            "prompt_logprobs is single-host only (rejected at add_request)")
        if self._plp_fn is None:
            self._plp_fn = self._build_prompt_lp_fn()

        T = len(batch.tokens)
        targets = np.zeros(T, np.int32)
        row_of: Dict[int, Tuple[int, int]] = {}
        for row, (g_idx, seq_id) in enumerate(batch.row_owners):
            if g_idx in want:
                row_of[g_idx] = (row, seq_id)
        info = {}
        for g_idx, (row, seq_id) in row_of.items():
            meta = seq_group_metadata_list[g_idx]
            data = meta.seq_data[seq_id]
            computed = data.get_num_computed_tokens()
            chunk = meta.token_chunk_size
            idxs = np.nonzero(batch.token_seq == row)[0]
            assert len(idxs) == chunk, (len(idxs), chunk)
            all_ids = data.get_token_ids()
            prompt_len = len(data.get_prompt_token_ids())
            # Flat slot i (global pos p = computed + i) scores the token
            # at p + 1; only positions with a next PROMPT token count.
            n_valid = max(min(computed + chunk, prompt_len - 1) - computed,
                          0)
            tg = np.asarray(all_ids[computed + 1:computed + 1 + n_valid],
                            np.int32)
            targets[idxs[:n_valid]] = tg
            info[g_idx] = (idxs, computed, n_valid, tg, want[g_idx])

        self.kv_cache, lp_dev, ids_dev, tlp_dev = self._plp_fn(
            params, self.kv_cache, i32_t, block_tables, i32_s[0],
            jnp.asarray(targets), has_lora=has_lora,
            prefill_tile=step_tile, has_page_dst=has_page_dst)

        def fetch():
            lp = np.asarray(self._fetch(lp_dev))
            tk_ids = np.asarray(self._fetch(ids_dev))
            tk_lps = np.asarray(self._fetch(tlp_dev))
            out = {}
            for g_idx, (idxs, computed, n_valid, tg, k) in info.items():
                entries: List[Optional[Dict[int, Logprob]]] = []
                if computed == 0:
                    entries.append(None)  # first token has no context
                for i in range(n_valid):
                    t = int(idxs[i])
                    tok = int(tg[i])
                    d = {tok: Logprob(float(lp[t]))}
                    for r in range(min(k, tk_ids.shape[1])):
                        d.setdefault(
                            int(tk_ids[t, r]),
                            Logprob(float(tk_lps[t, r]), rank=r + 1))
                    entries.append(d)
                out[g_idx] = entries
            return out

        return fetch

    def _build_sample_fn(self):
        """Phase 2 of the two-phase (host logits_processor) step: sample
        host-adjusted logits with the same device sampler semantics as
        the fused step (reference applies per-request processors between
        logits and sampling, vllm/model_executor/layers/
        logits_processor.py:82-98 — here that seam is an explicit
        dispatch boundary).

        Multi-host: phase 2 is LEADER-LOCAL.  The forward step writes KV
        and advances the shared PRNG identically on every process (the
        followers mirror ``return_logits=True`` via the OP_STEP header);
        sampling itself touches no model state — its inputs are the
        host-processed logits and its outputs feed only the leader's
        engine, while followers receive the next step's tokens through
        the normal broadcast.  So the program compiles WITHOUT the global
        mesh (a mesh-placed program would have to be launched by every
        process) and runs on the leader's local device."""
        mesh = self.mesh
        local_only = self.multihost

        @functools.partial(jax.jit,
                           static_argnames=("use_penalties",
                                            "exact_sampling"))
        def sample_fn(logits, i32_s, f32_s, token_counts, pred_scores, rng,
                      use_penalties: bool, exact_sampling: bool):
            rng, next_rng = jax.random.split(rng)
            top_k = i32_s[2]
            greedy = i32_s[3] > 0
            (temperature, top_p, min_p, presence, frequency,
             repetition) = (f32_s[0], f32_s[1], f32_s[2], f32_s[3],
                            f32_s[4], f32_s[5])
            st = SamplingTensors(temperature=temperature, top_p=top_p,
                                 top_k=top_k, min_p=min_p, greedy=greedy,
                                 presence_penalty=presence,
                                 frequency_penalty=frequency,
                                 repetition_penalty=repetition)
            res = sample(logits, st, rng,
                         token_counts=token_counts if use_penalties else
                         None, exact=exact_sampling)
            out_i32 = jnp.concatenate([res.tokens[:, None], res.topk_ids],
                                      axis=1)
            out_f32 = jnp.concatenate([
                res.logprobs[:, None], pred_scores[:, None],
                res.topk_logprobs
            ], axis=1)
            if not local_only:
                rep = NamedSharding(mesh, P())
                out_i32 = jax.lax.with_sharding_constraint(out_i32, rep)
                out_f32 = jax.lax.with_sharding_constraint(out_f32, rep)
            return out_i32, out_f32, next_rng

        return sample_fn

    # ------------------------------------------------------------------
    # Engine-facing API (counterpart of ExecutorBase.execute_model,
    # reference executor_base.py:78-86)
    # ------------------------------------------------------------------

    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        num_lookahead_slots: int = 0,
        defer: bool = False,
    ) -> List[SamplerOutput]:
        """Run one engine step's device work.

        With ``defer=True`` the device programs are dispatched and a
        zero-argument finish closure is returned instead of results; the
        async engine uses this to overlap host work (and sneak prefill
        dispatches) with the in-flight step.  All dispatches (and any
        multi-host broadcasts) happen on the calling thread before this
        returns; the closure only fetches.
        """
        assert self.kv_cache is not None, "initialize_cache first"

        # KV maintenance in dependency order: read swap-outs before their
        # blocks can be reused by swap-ins / new allocations.
        if blocks_to_swap_out:
            if self.multihost:
                self._mh_broadcast_mapping(dist.OP_SWAP_OUT,
                                           blocks_to_swap_out)
            self.kv_cache = self.swap_space.swap_out(self.kv_cache,
                                                     blocks_to_swap_out)
        if blocks_to_swap_in:
            if self.multihost:
                self._mh_broadcast_mapping(dist.OP_SWAP_IN, blocks_to_swap_in)
            self.kv_cache = self.swap_space.swap_in(self.kv_cache,
                                                    blocks_to_swap_in)
        if blocks_to_copy:
            if self.multihost:
                pairs = {s_: list(d) for s_, d in blocks_to_copy.items()}
                flat = [(s_, d) for s_, ds in pairs.items() for d in ds]
                self._mh_broadcast_pairs(dist.OP_COPY, flat)
            self.kv_cache = run_copy_blocks(self.kv_cache, blocks_to_copy)

        if not seq_group_metadata_list:
            return (lambda: []) if defer else []

        # Load any new adapters before packing (on-demand, like the
        # reference's apply_loras path).
        if self.lora_bank is not None:
            for m in seq_group_metadata_list:
                if m.lora_request is not None:
                    self.add_lora(m.lora_request)

        # Mixed steps split into a prefill sub-batch (XLA mixed attention)
        # and a decode sub-batch (Pallas streaming kernel) — the reference
        # likewise routes prefill through flash attention and decode through
        # the paged kernel within one step (model_runner BatchType.MIXED).
        has_prefill = any(m.is_prompt for m in seq_group_metadata_list)
        has_decode = any(not m.is_prompt for m in seq_group_metadata_list)
        self.dispatch_stats["steps"] += 1
        if has_prefill and has_decode:
            self.dispatch_stats["mixed_steps"] += 1
            prefill_idx = [
                i for i, m in enumerate(seq_group_metadata_list)
                if m.is_prompt
            ]
            decode_idx = [
                i for i, m in enumerate(seq_group_metadata_list)
                if not m.is_prompt
            ]
            # Dispatch both programs before fetching either: they queue
            # back-to-back on device (disjoint KV pages), so the prefill's
            # D2H readback overlaps the decode's execution — one host
            # round trip per mixed step instead of two.
            fin_p = self._execute_batch(
                [seq_group_metadata_list[i] for i in prefill_idx],
                defer=True)
            fin_d = self._execute_batch(
                [seq_group_metadata_list[i] for i in decode_idx],
                defer=True)

            def finish_mixed() -> List[SamplerOutput]:
                out_p = fin_p()
                out_d = fin_d()
                merged = [None] * len(seq_group_metadata_list)
                for j, i in enumerate(prefill_idx):
                    merged[i] = out_p[0].outputs[j]
                for j, i in enumerate(decode_idx):
                    merged[i] = out_d[0].outputs[j]
                return [SamplerOutput(outputs=merged)]

            return finish_mixed if defer else finish_mixed()
        return self._execute_batch(seq_group_metadata_list, defer=defer)

    def _execute_batch(self,
                       seq_group_metadata_list: List[SequenceGroupMetadata],
                       defer: bool = False):
        """Run one uniform (all-prefill or all-decode) sub-batch.

        With ``defer=True`` the device program is dispatched and a
        zero-argument ``finish()`` closure is returned; calling it fetches
        the results and assembles the SamplerOutputs.  Mixed steps use
        this to enqueue both sub-batch programs before blocking on either.
        """
        batch = prepare_batch(
            seq_group_metadata_list, self.block_size,
            self.max_blocks_per_seq, self.token_buckets, self.seq_buckets,
            self.vocab_size,
            lora_slot_of=(self.lora_bank.slot_for
                          if self.lora_bank is not None else None),
            prefill_tile=self.prefill_tile)

        # Fused multi-step decode: K chained decode iterations in one
        # dispatch (spec decode takes precedence when configured).
        stats = self.dispatch_stats
        if (self._multi_step_fn is not None and batch.decode_only
                and self.draft_params is None
                and self._multi_step_eligible(seq_group_metadata_list)):
            kind = "decode_fused"
            stats["decode_tokens"] += (len(batch.row_owners) *
                                       self.decode_steps)
            dispatch = self._execute_multi_step
        else:
            if batch.decode_only:
                kind = "decode_single"
                stats["decode_tokens"] += len(batch.row_owners)
            else:
                kind = "prefill"
                stats["prefill_tokens"] += batch.num_real_tokens
            dispatch = self._execute_single_dispatch
        stats[kind + "_dispatches"] += 1

        shape = (kind, len(batch.tokens), batch.block_tables.shape[0])
        if shape not in self._seen_shapes:
            # First dispatch of a shape compiles (20-140 s through a
            # remote-compile relay) — make every occurrence visible.
            self._seen_shapes.add(shape)
            logger.info("New step shape %s: T=%d S=%d (compiling)", *shape)

        t0 = time.perf_counter()
        finish = dispatch(seq_group_metadata_list, batch)
        stats[kind + "_s"] += time.perf_counter() - t0

        def timed_finish():
            t1 = time.perf_counter()
            out = finish()
            stats[kind + "_s"] += time.perf_counter() - t1
            return out

        return timed_finish if defer else timed_finish()

    def _execute_single_dispatch(
            self, seq_group_metadata_list: List[SequenceGroupMetadata],
            batch: PreparedBatch):
        """Dispatch one uniform batch; returns a finish() closure that
        fetches device results and assembles SamplerOutputs."""

        # Pack host buffers once: [Kt, T] ints, [4, S] ints, [6, S] floats.
        has_lora = batch.lora_slots is not None
        has_page_dst = batch.page_dst is not None
        i32_t_rows = [batch.tokens, batch.positions, batch.token_seq,
                      batch.slot_mapping]
        if has_lora:
            i32_t_rows.append(batch.lora_slots)
        if has_page_dst:
            # Page-write map rides the packed buffer (padded to T) — one
            # H2D transfer per step is ~7 ms through the relay, so no new
            # transfers for the fast prefill KV write.
            padded = np.full(len(batch.tokens), 1 << 28, np.int32)
            padded[:len(batch.page_dst)] = batch.page_dst
            i32_t_rows.append(padded)
        i32_t = jnp.asarray(np.stack(i32_t_rows))
        i32_s = jnp.asarray(
            np.stack([
                batch.seq_lens, batch.sample_idx, batch.top_k,
                batch.greedy.astype(np.int32)
            ]))
        f32_s = jnp.asarray(
            np.stack([
                batch.temperature, batch.top_p, batch.min_p,
                batch.presence_penalty, batch.frequency_penalty,
                batch.repetition_penalty
            ]))
        block_tables = jnp.asarray(batch.block_tables)

        needs_draft_mirror = False
        if self.spec_config is not None and self.draft_params is not None:
            if (batch.decode_only
                    and self._spec_eligible(seq_group_metadata_list)):
                out = self._execute_spec_decode(seq_group_metadata_list,
                                                batch)
                return lambda: out
            # Keep the draft cache in sync: mirror this (prefill/mixed or
            # ineligible-decode) step through the draft model — dispatched
            # AFTER the multihost broadcast below so leader and follower
            # device queues see collectives in the same order.
            needs_draft_mirror = True
        use_penalties = batch.token_counts is not None
        token_counts = (jnp.asarray(batch.token_counts) if use_penalties else
                        jnp.zeros((1, 1), jnp.uint8))
        params = self._params_with_lora(batch)
        capture_layer = (self.pred_config.pred_layer_idx
                         if (self.pred_params is not None
                             and not batch.decode_only) else None)

        step_tile = (self.prefill_tile
                     if batch.prefill_aligned and not batch.decode_only
                     else None)
        image_embeds = None
        if self.is_vlm and not batch.decode_only:
            image_embeds = self._build_image_embeds(seq_group_metadata_list,
                                                    batch)
        exact_sampling = self._needs_exact_sampling(batch)
        has_mask = batch.logits_mask is not None
        logits_mask = (jnp.asarray(batch.logits_mask) if has_mask else
                       jnp.zeros((1, 1), jnp.uint8))
        two_phase = batch.has_host_processors
        if self.multihost:
            # Followers keep their own device-resident PRNG key in sync by
            # replaying the identical split sequence — no key broadcast.
            # Image embeddings (VLM prefill) are mirrored as the projected
            # [T, H] feature buffer: followers never see raw pixels, the
            # leader's vision tower runs once (the reference instead ships
            # the image to every Ray worker and runs CLIP per worker).
            self._mh_broadcast_step(i32_t, i32_s, f32_s, block_tables,
                                    token_counts, use_penalties,
                                    batch.decode_only, capture_layer,
                                    step_tile, exact_sampling,
                                    logits_mask if has_mask else None,
                                    has_lora=has_lora,
                                    has_page_dst=has_page_dst,
                                    image_embeds=image_embeds,
                                    return_logits=two_phase)
        if needs_draft_mirror:
            self.draft_kv_cache = self._draft_prefill_fn(
                self.draft_params, self.draft_kv_cache, i32_t[0], i32_t[1],
                i32_t[2], i32_t[3], block_tables, i32_s[0])

        if two_phase:
            # Host logits_processors: forward-only dispatch, host applies
            # the per-request processors to the fetched logits, then a
            # second (tiny) dispatch samples with identical semantics.
            self.kv_cache, logits_dev, pred_dev, self._rng = self._step_fn(
                params, self.pred_params, self.kv_cache, i32_t, i32_s,
                f32_s, block_tables, token_counts, self._rng,
                use_penalties, batch.decode_only, capture_layer, has_lora,
                step_tile, image_embeds, exact_sampling=exact_sampling,
                logits_mask=logits_mask, has_logits_mask=has_mask,
                return_logits=True, has_page_dst=has_page_dst)
            if self._rng2 is None:
                self._rng2 = jax.device_put(jax.random.PRNGKey(4242))
            plp_fetch = self._maybe_dispatch_prompt_logprobs(
                seq_group_metadata_list, batch, params, i32_t, block_tables,
                i32_s, has_lora, step_tile, has_page_dst)

            def finish_two_phase():
                logits = np.array(self._fetch(logits_dev))
                for row, (g_idx, seq_id) in enumerate(batch.row_owners):
                    meta = seq_group_metadata_list[g_idx]
                    procs = meta.sampling_params.logits_processors
                    if not procs:
                        continue
                    out_ids = meta.seq_data[seq_id].get_output_token_ids()
                    row_logits = logits[row]
                    for proc in procs:
                        row_logits = proc(out_ids, row_logits)
                    logits[row] = np.asarray(row_logits)
                # Multi-host: the sample program is leader-local (see
                # _build_sample_fn), so its inputs must be local arrays —
                # pred_dev is a global replicated step output, re-home its
                # local copy.
                pred_in = (jnp.asarray(self._fetch(pred_dev))
                           if self.multihost else pred_dev)
                with self._rng2_lock:
                    out_i32p, out_f32p, self._rng2 = self._sample_fn(
                        jnp.asarray(logits), i32_s, f32_s, token_counts,
                        pred_in, self._rng2, use_penalties=use_penalties,
                        exact_sampling=exact_sampling)
                h_i32 = self._fetch(out_i32p)
                h_f32 = self._fetch(out_f32p)
                return self._assemble_outputs(
                    seq_group_metadata_list, batch, h_i32[:, 0],
                    h_f32[:, 0], h_i32[:, 1:], h_f32[:, 2:],
                    h_f32[:, 1] if capture_layer is not None else None,
                    prompt_lps=plp_fetch() if plp_fetch else None)

            return finish_two_phase

        self.kv_cache, out_i32, out_f32, self._rng = self._step_fn(
            params, self.pred_params, self.kv_cache, i32_t, i32_s, f32_s,
            block_tables, token_counts, self._rng, use_penalties,
            batch.decode_only, capture_layer, has_lora, step_tile,
            image_embeds, exact_sampling=exact_sampling,
            logits_mask=logits_mask, has_logits_mask=has_mask,
            has_page_dst=has_page_dst)
        plp_fetch = self._maybe_dispatch_prompt_logprobs(
            seq_group_metadata_list, batch, params, i32_t, block_tables,
            i32_s, has_lora, step_tile, has_page_dst)

        def finish():
            h_i32 = self._fetch(out_i32)
            h_f32 = self._fetch(out_f32)
            return self._assemble_outputs(
                seq_group_metadata_list, batch, h_i32[:, 0], h_f32[:, 0],
                h_i32[:, 1:], h_f32[:, 2:],
                h_f32[:, 1] if capture_layer is not None else None,
                prompt_lps=plp_fetch() if plp_fetch else None)

        return finish

    def _build_image_embeds(self, seq_group_metadata_list,
                            batch: "PreparedBatch"):
        """VLM prefill: run the vision tower over each group's images and
        scatter the projected features into a [T, H] buffer aligned with
        the flat token layout — rows where the token is image_token_index
        get features in order of appearance (reference llava.py
        _merge_vision_embeddings). Returns None when no group carries
        image data (keeps the text-only jit signature)."""
        has_images = any(
            getattr(m, "multi_modal_data", None) is not None
            and m.is_prompt for m in seq_group_metadata_list)
        if not has_images:
            return None
        if self._encode_images_fn is None:
            cfg = self.hf_config
            self._encode_images_fn = jax.jit(
                lambda p, px: self.model_cls.encode_images(p, px, cfg))
        image_token = self.hf_config.image_token_index
        T = len(batch.tokens)
        H = self.config.model_config.get_hidden_size()
        buf = np.zeros((T, H), np.float32)
        # Map each group index to its seq row(s) in the flat layout.
        group_rows: Dict[int, List[int]] = {}
        for row, (g_idx, _) in enumerate(batch.row_owners):
            group_rows.setdefault(g_idx, []).append(row)
        for g_idx, meta in enumerate(seq_group_metadata_list):
            data = getattr(meta, "multi_modal_data", None)
            if data is None or not meta.is_prompt:
                continue
            if isinstance(data, dict) and "image_features" in data:
                feats = np.asarray(data["image_features"], np.float32)
            else:
                pixels = (data["pixel_values"]
                          if isinstance(data, dict) else data)
                pixels = np.asarray(pixels, np.float32)
                if pixels.ndim == 3:
                    pixels = pixels[None]
                feats = np.asarray(
                    self._encode_images_fn(self.params, jnp.asarray(pixels)),
                    np.float32)
            feats = feats.reshape(-1, feats.shape[-1])  # [n_img*patches, H]
            rows = set(group_rows.get(g_idx, ()))
            positions = [
                t for t in range(T)
                if batch.token_seq[t] in rows and batch.tokens[t] ==
                image_token
            ]
            if len(positions) > len(feats):
                raise ValueError(
                    f"request has {len(positions)} image tokens but only "
                    f"{len(feats)} image feature rows (chunked-prefill "
                    "image splitting is not supported)")
            for j, t in enumerate(positions):
                buf[t] = feats[j]
        return jnp.asarray(buf, self.dtype)

    def _assemble_outputs(self, seq_group_metadata_list, batch: PreparedBatch,
                          tokens, logprobs, topk_ids, topk_logprobs,
                          pred_scores=None,
                          prompt_lps=None) -> List[SamplerOutput]:
        """Build per-group SequenceGroupOutput structures from device results."""
        sample_rows = set(batch.rows_to_sample)
        group_samples: Dict[int, List[SequenceOutput]] = {
            i: []
            for i in range(len(seq_group_metadata_list))
        }
        for row, (g_idx, seq_id) in enumerate(batch.row_owners):
            if row not in sample_rows:
                continue
            meta = seq_group_metadata_list[g_idx]
            sp = meta.sampling_params
            token = int(tokens[row])
            lp = float(logprobs[row])
            num_lp = sp.logprobs
            logprob_dict = {token: Logprob(lp)}
            if num_lp:
                for k in range(min(num_lp, topk_ids.shape[1])):
                    tid = int(topk_ids[row, k])
                    logprob_dict.setdefault(
                        tid, Logprob(float(topk_logprobs[row, k]), rank=k + 1))
            group_samples[g_idx].append(
                SequenceOutput(parent_seq_id=seq_id,
                               output_token=token,
                               logprobs=logprob_dict))
            # Beam search: every row of a beam group emits its top-2B
            # candidates (token + logprob); the output processor runs the
            # host-side beam selection over them.
            if sp.use_beam_search:
                group_samples[g_idx].pop()  # replace the sampled entry
                width = min(2 * sp.best_of, topk_ids.shape[1])
                for k in range(width):
                    tid = int(topk_ids[row, k])
                    group_samples[g_idx].append(
                        SequenceOutput(parent_seq_id=seq_id,
                                       output_token=tid,
                                       logprobs={
                                           tid:
                                           Logprob(
                                               float(topk_logprobs[row, k]),
                                               rank=k + 1)
                                       }))
                continue
            # Parallel sampling: a completing prefill of a best_of>1 group
            # emits best_of candidate continuations (distinct top-k tokens;
            # the output processor forks one stream per candidate).
            if meta.is_prompt and sp.best_of > 1:
                n_extra = min(sp.best_of, topk_ids.shape[1]) - 1
                rank = 0
                emitted = {token}
                while n_extra > 0 and rank < topk_ids.shape[1]:
                    tid = int(topk_ids[row, rank])
                    rank += 1
                    if tid in emitted:
                        continue
                    emitted.add(tid)
                    group_samples[g_idx].append(
                        SequenceOutput(parent_seq_id=seq_id,
                                       output_token=tid,
                                       logprobs={
                                           tid:
                                           Logprob(
                                               float(topk_logprobs[
                                                   row, rank - 1]))
                                       }))
                    n_extra -= 1

        # Embedded-predictor scores: attach to groups whose prefill
        # completed this step (the rows that sampled).
        group_pred: Dict[int, float] = {}
        if pred_scores is not None:
            for row, (g_idx, _) in enumerate(batch.row_owners):
                if (row in sample_rows
                        and seq_group_metadata_list[g_idx].is_prompt):
                    group_pred[g_idx] = float(pred_scores[row])

        outputs = []
        for g_idx, meta in enumerate(seq_group_metadata_list):
            outputs.append(
                SequenceGroupOutput(samples=group_samples[g_idx],
                                    prompt_logprobs=(prompt_lps or
                                                     {}).get(g_idx),
                                    pred_score=group_pred.get(g_idx)))
        return [SamplerOutput(outputs=outputs)]

    # ------------------------------------------------------------------
    # AUX predictor (the LTR scorer) — reference AUXLLMEngine collapsed to
    # one dense jitted forward on the same mesh (SURVEY.md §7).
    # ------------------------------------------------------------------

    def init_aux_model(self, prefill_predictor_config) -> None:
        from vllm_ltr_tpu.transformers_utils.config import get_hf_config
        self.aux_prefill_config = prefill_predictor_config
        model_src = prefill_predictor_config.pred_model
        hf_cfg = get_hf_config(model_src) if not hasattr(
            prefill_predictor_config, "hf_config") else None
        if hf_cfg is None:
            hf_cfg = prefill_predictor_config.hf_config
        hf_cfg.num_labels = prefill_predictor_config.num_labels
        self.aux_hf_config = hf_cfg
        arch = "OPTForSequenceClassification"
        self.aux_model_cls = resolve_model_cls([arch])
        params = load_params(self.aux_model_cls, model_src, hf_cfg,
                             self.dtype)
        self.aux_params = shard_params(params, self.mesh)
        aux_cls, aux_cfg = self.aux_model_cls, hf_cfg

        @jax.jit
        def score_fn(params, tokens, positions, mask):
            # Dense (non-paged) prefill over the padded prompt batch: the
            # TPU-idiomatic replacement for the reference's fake-allocate
            # AUXLLM engine. Causal attention; score read at last real token.
            hidden = aux_cls.dense_forward(params, tokens, positions, mask,
                                           aux_cfg)
            last_idx = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)
            last_hidden = jnp.take_along_axis(
                hidden, last_idx[:, None, None], axis=1).squeeze(1)
            scores = aux_cls.compute_logits(params, last_hidden, aux_cfg)
            return scores

        self._aux_score_fn = score_fn

        # Warm by default on real devices: a cold aux-score shape costs a
        # 20-140 s relay compile inside schedule() — the round-3 online
        # A/B's opt server streamed zero bytes for 300 s (every client
        # timed out) for exactly this reason.  CPU (tests) compiles in
        # milliseconds, so live compilation there is fine.
        if (getattr(self.config.scheduler_config, "precompile_shapes",
                    False)
                or (jax.default_backend() != "cpu" and not int(
                    os.environ.get("VLLM_LTR_TPU_SKIP_AUX_WARMUP", "0")))):
            self._warm_aux_shapes()

    def _warm_aux_shapes(self) -> None:
        """Pre-trace the scorer's (batch, length) bucket ladder so the first
        scored request never pays a compile inside schedule() — the aux
        scoring latency sits in the scheduling critical path (reference
        SURVEY §3.2 boundary note)."""
        cfg = self.aux_prefill_config
        t0 = time.time()
        # Full cross product of (batch, length) buckets is ~50 compiles;
        # warm only the shapes serving actually hits: the smallest batch
        # bucket across the length ladder (steady-state arrivals land a
        # few requests per step) plus the max-batch/max-length shape
        # (burst start scores the whole backlog at once).
        shapes: List[Tuple[int, int]] = []
        L = 16
        while True:
            shapes.append((8, min(L, max(cfg.max_length, 16))))
            if L >= cfg.max_length:
                break
            L *= 2
        # Every batch bucket at max length: arrival bursts score 9..max
        # waiting prompts at once, and any unwarmed (B, L) bucket costs a
        # 20-140 s relay compile inside schedule() mid-serving (the
        # round-4 overload A/B's opt@32 pass hit exactly the (16, 32) and
        # (32, 32) holes of the old 8-then-max ladder).
        B = 16
        while B < cfg.max_batch_size:
            shapes.append((B, cfg.max_length))
            B *= 2
        if cfg.max_batch_size > 8:
            shapes.append((cfg.max_batch_size, cfg.max_length))
        n = 0
        for B, L in shapes:
            try:
                self.score_prompts([[1] * L] * B)
                n += 1
            except Exception as e:  # noqa: BLE001 - warmup best-effort
                logger.warning("aux warmup (%d, %d) failed: %s", B, L,
                               str(e)[:120])
        logger.info("Warmed %d aux scorer shapes in %.1fs", n,
                    time.time() - t0)

    def score_prompts_begin(self, prompts_token_ids: List[List[int]]):
        """Dispatch the predictor forward(s); returns a ``fetch()``
        closure producing the scores.  The dispatch is async (the device
        queues the program behind whatever is executing), so a caller can
        overlap scoring with an in-flight serving step and fetch one wave
        later (``--async-aux-scoring``)."""
        assert self.aux_params is not None, "init_aux_model first"
        cfg = self.aux_prefill_config
        max_len = cfg.max_length
        bs = cfg.max_batch_size
        t_start = time.perf_counter()
        outs: List[Tuple[Any, int]] = []
        for i in range(0, len(prompts_token_ids), bs):
            chunk = prompts_token_ids[i:i + bs]
            trunc = [t[:max_len] for t in chunk]
            L = max(max(len(t) for t in trunc), 1)
            # Bucket the padded length to bound recompiles.
            Lp = 16
            while Lp < L:
                Lp *= 2
            B = len(trunc)
            Bp = 8
            while Bp < B:
                Bp *= 2
            tokens = np.zeros((Bp, Lp), np.int32)
            mask = np.zeros((Bp, Lp), np.int32)
            for j, t in enumerate(trunc):
                tokens[j, :len(t)] = t
                mask[j, :len(t)] = 1
            positions = np.broadcast_to(np.arange(Lp, dtype=np.int32),
                                        (Bp, Lp))
            if self.multihost:
                self._mh_broadcast_aux(tokens, positions, mask)
            out = self._aux_score_fn(self.aux_params, jnp.asarray(tokens),
                                     jnp.asarray(positions),
                                     jnp.asarray(mask))
            outs.append((out, B))
            self.dispatch_stats["aux_dispatches"] += 1
        self.dispatch_stats["aux_s"] += time.perf_counter() - t_start

        def fetch() -> List[float]:
            t0 = time.perf_counter()
            scores: List[float] = []
            for out, B in outs:
                h = self._fetch(out)
                if cfg.num_labels == 1:
                    scores.extend(float(s) for s in h[:B, 0])
                else:
                    scores.extend(-float(s)
                                  for s in np.argmax(h[:B], axis=1))
            self.dispatch_stats["aux_s"] += time.perf_counter() - t0
            return scores

        def ready() -> bool:
            """True once every dispatched score program has finished —
            fetch() will not block.  Lets the async scorer poll from the
            scheduling critical path without ever waiting on a program
            queued behind the in-flight serving wave."""
            try:
                return all(o.is_ready() for o, _ in outs)
            except AttributeError:  # older jax / non-array outputs
                return True

        fetch.ready = ready
        return fetch

    def score_prompts(self, prompts_token_ids: List[List[int]]) -> List[float]:
        """Score prompts with the predictor; returns one ranking score each
        (higher = shorter predicted output). Classification predictors
        (num_labels > 1) return the negative argmax bucket so that sorting by
        -score still approximates SJF (reference opt.py:394-408)."""
        return self.score_prompts_begin(prompts_token_ids)()

    # ------------------------------------------------------------------
    # Fused multi-step decode (executor/multi_step.py)
    # ------------------------------------------------------------------

    def _needs_exact_sampling(self, batch: PreparedBatch) -> bool:
        """True when any row uses a top-p / top-k / min-p filter; such
        batches take the sampler's full-vocab-sort path, everything else
        takes the sort-free Gumbel-argmax fast path (layers/sampler.py)."""
        return bool((batch.top_p < 1.0).any() or (batch.min_p > 0.0).any()
                    or (batch.top_k < self.vocab_size).any())

    @staticmethod
    def _multi_step_eligible(seq_group_metadata_list) -> bool:
        """Beam search needs a host-side selection step after every token;
        guided decoding needs a fresh host-built token mask per token and
        per-request logits_processors run host-side — all three fall back
        to one-step dispatch."""
        return not any(m.sampling_params.use_beam_search
                       or m.sampling_params.logits_processors
                       or getattr(m, "guide", None) is not None
                       for m in seq_group_metadata_list)

    def _execute_multi_step(self, seq_group_metadata_list,
                            batch: PreparedBatch) -> List[SamplerOutput]:
        """K decode steps per dispatch. The scheduler reserved K-1
        lookahead slots, so cache slots for positions L-1 .. L+K-2 exist
        for every running row (same contract as _execute_spec_decode)."""
        K = self.decode_steps
        S = batch.seq_lens.shape[0]
        bs, MB = self.block_size, self.max_blocks_per_seq

        last_tokens = batch.tokens[:S].copy()
        seq_lens = batch.seq_lens
        base_pos = np.maximum(seq_lens - 1, 0)
        pos = base_pos[:, None] + np.arange(K)[None, :]
        blk = np.minimum(pos // bs, MB - 1)
        slots = (np.take_along_axis(batch.block_tables, blk, axis=1) * bs +
                 pos % bs).astype(np.int32)
        slots[seq_lens == 0] = -1  # padded rows write to the trash slot

        i32_s = np.stack([
            batch.seq_lens, batch.sample_idx, batch.top_k,
            batch.greedy.astype(np.int32)
        ])
        f32_s = np.stack([
            batch.temperature, batch.top_p, batch.min_p,
            batch.presence_penalty, batch.frequency_penalty,
            batch.repetition_penalty
        ])
        use_penalties = batch.token_counts is not None
        token_counts = (jnp.asarray(batch.token_counts)
                        if use_penalties else jnp.zeros((1, 1), jnp.uint8))
        has_lora = batch.lora_slots is not None
        lora_slots = jnp.asarray(batch.lora_slots[:S] if has_lora else np.
                                 zeros((S, ), np.int32))
        params = self._params_with_lora(batch)

        exact_sampling = self._needs_exact_sampling(batch)
        if self.multihost:
            self._mh_broadcast_multi_step(last_tokens, base_pos,
                                          batch.block_tables, slots, i32_s,
                                          f32_s, token_counts, lora_slots,
                                          use_penalties, has_lora,
                                          exact_sampling)
        self.kv_cache, out_i32, out_f32, self._rng = self._multi_step_fn(
            params, self.kv_cache, jnp.asarray(last_tokens),
            jnp.asarray(base_pos), jnp.asarray(batch.block_tables),
            jnp.asarray(slots), jnp.asarray(i32_s), jnp.asarray(f32_s),
            token_counts, lora_slots, self._rng, use_penalties, has_lora,
            exact_sampling=exact_sampling)

        def finish():
            h_i32 = self._fetch(out_i32)  # [S, K, 1+L]
            h_f32 = self._fetch(out_f32)
            group_samples: Dict[int, List[SequenceOutput]] = {
                i: []
                for i in range(len(seq_group_metadata_list))
            }
            for row, (g_idx, seq_id) in enumerate(batch.row_owners):
                sp = seq_group_metadata_list[g_idx].sampling_params
                num_lp = sp.logprobs or 0
                for j in range(K):
                    token = int(h_i32[row, j, 0])
                    lp_dict = {token: Logprob(float(h_f32[row, j, 0]))}
                    for k in range(min(num_lp, h_i32.shape[2] - 1)):
                        tid = int(h_i32[row, j, 1 + k])
                        lp_dict.setdefault(
                            tid, Logprob(float(h_f32[row, j, 1 + k]),
                                         rank=k + 1))
                    group_samples[g_idx].append(
                        SequenceOutput(parent_seq_id=seq_id,
                                       output_token=token,
                                       logprobs=lp_dict))
            outputs = [
                SequenceGroupOutput(samples=group_samples[i],
                                    prompt_logprobs=None)
                for i in range(len(seq_group_metadata_list))
            ]
            return [SamplerOutput(outputs=outputs)]

        return finish

    def _mh_broadcast_spec(self, last_tokens, base_pos, block_tables,
                           seq_lens, slots, temperature, greedy) -> None:
        header = np.zeros(dist.HEADER_LEN, np.int32)
        header[0] = dist.OP_SPEC_STEP
        header[1], header[2] = block_tables.shape  # S, MB
        header[3] = slots.shape[1]  # k + 1
        dist.broadcast_header(header)
        for arr, dt in ((last_tokens, np.int32), (base_pos, np.int32),
                        (block_tables, np.int32), (seq_lens, np.int32),
                        (slots, np.int32), (temperature, np.float32),
                        (greedy.astype(np.int32), np.int32)):
            dist.broadcast_array(np.asarray(arr, dt), arr.shape, dt)

    def _mh_broadcast_multi_step(self, last_tokens, base_pos, block_tables,
                                 slots, i32_s, f32_s, token_counts,
                                 lora_slots, use_penalties,
                                 has_lora, exact_sampling) -> None:
        header = np.zeros(dist.HEADER_LEN, np.int32)
        header[0] = dist.OP_MULTI_STEP
        header[1] = int(use_penalties)
        header[2] = int(has_lora)
        header[3], header[4] = block_tables.shape  # S, MB
        header[5] = slots.shape[1]  # K
        header[6] = token_counts.shape[1]  # vocab (or 1)
        header[7] = int(exact_sampling)
        dist.broadcast_header(header)
        for arr, dt in ((last_tokens, np.int32), (base_pos, np.int32),
                        (block_tables, np.int32), (slots, np.int32),
                        (i32_s, np.int32), (f32_s, np.float32),
                        (token_counts, np.uint8), (lora_slots, np.int32)):
            dist.broadcast_array(np.asarray(arr), arr.shape, dt)

    # ------------------------------------------------------------------
    # Speculative decoding helpers
    # ------------------------------------------------------------------

    def _build_draft_prefill_fn(self):
        draft_cls, draft_cfg = self.draft_cls, self.draft_hf_config

        @functools.partial(jax.jit, donate_argnums=(1, ))
        def draft_prefill(draft_params, draft_kv, tokens, positions,
                          token_seq, slot_mapping, block_tables, seq_lens):
            meta = AttentionMetadata(token_seq=token_seq,
                                     token_pos=positions,
                                     slot_mapping=slot_mapping,
                                     block_tables=block_tables,
                                     seq_lens=seq_lens)
            _, draft_kv = draft_cls.forward(draft_params, tokens, positions,
                                            draft_kv, meta, draft_cfg)
            return draft_kv

        return draft_prefill

    @staticmethod
    def _spec_eligible(seq_group_metadata_list) -> bool:
        """Spec decode supports greedy / pure-temperature sampling."""
        for m in seq_group_metadata_list:
            sp = m.sampling_params
            if (sp.top_p < 1.0 or sp.top_k > 0 or sp.min_p > 0.0
                    or sp.presence_penalty != 0.0
                    or sp.frequency_penalty != 0.0
                    or sp.repetition_penalty != 1.0 or sp.logprobs
                    or sp.best_of > 1 or m.lora_request is not None
                    or sp.logits_processors
                    or getattr(m, "guide", None) is not None):
                return False
        return True

    def _execute_spec_decode(self, seq_group_metadata_list,
                             batch: PreparedBatch) -> List[SamplerOutput]:
        """One speculative decode step for a decode-only batch."""
        k = self.spec_config.num_speculative_tokens
        S = batch.seq_lens.shape[0]
        bs = self.block_size
        MB = self.max_blocks_per_seq

        last_tokens = batch.tokens[:S].copy()
        seq_lens = batch.seq_lens.copy()
        base_pos = np.maximum(seq_lens - 1, 0)
        # Slots for positions L-1 .. L+k-1 (lookahead-reserved).
        pos = base_pos[:, None] + np.arange(k + 1)[None, :]
        blk = np.minimum(pos // bs, MB - 1)
        slots = (np.take_along_axis(batch.block_tables, blk, axis=1) * bs +
                 pos % bs).astype(np.int32)
        # Padded rows write to the trash slot.
        slots[seq_lens == 0] = -1

        if self.multihost:
            self._mh_broadcast_spec(last_tokens, base_pos,
                                    batch.block_tables, seq_lens, slots,
                                    batch.temperature, batch.greedy)
        (self.kv_cache, self.draft_kv_cache, tokens, counts,
         logprobs, self._rng) = self._spec_fn(
             self.params, self.draft_params, self.kv_cache,
             self.draft_kv_cache, jnp.asarray(last_tokens),
             jnp.asarray(base_pos), jnp.asarray(batch.block_tables),
             jnp.asarray(seq_lens), jnp.asarray(slots),
             jnp.asarray(batch.temperature), jnp.asarray(batch.greedy),
             self._rng)
        tokens = np.asarray(tokens)
        counts = np.asarray(counts)
        logprobs = np.asarray(logprobs)

        group_samples: Dict[int, List[SequenceOutput]] = {
            i: []
            for i in range(len(seq_group_metadata_list))
        }
        for row, (g_idx, seq_id) in enumerate(batch.row_owners):
            for j in range(int(counts[row])):
                tok = int(tokens[row, j])
                group_samples[g_idx].append(
                    SequenceOutput(parent_seq_id=seq_id,
                                   output_token=tok,
                                   logprobs={
                                       tok:
                                       Logprob(float(logprobs[row, j]))
                                   }))
        outputs = [
            SequenceGroupOutput(samples=group_samples[i],
                                prompt_logprobs=None)
            for i in range(len(seq_group_metadata_list))
        ]
        return [SamplerOutput(outputs=outputs)]

    # ------------------------------------------------------------------
    # LoRA (counterpart of ExecutorBase.add_lora / WorkerLoRAManager)
    # ------------------------------------------------------------------

    def add_lora(self, lora_request) -> int:
        """Load the adapter (once) into the device bank; returns its slot."""
        assert self.lora_bank is not None, "enable_lora is off"
        int_id = lora_request.lora_int_id
        if int_id in self.lora_bank.slot_of:
            return self.lora_bank.slot_of[int_id]
        if self.multihost and self.is_leader:
            # Mirror the load on every follower (adapter paths live on a
            # shared filesystem in multi-host pods, like the reference's
            # per-worker WorkerLoRAManager loads, lora/worker_manager.py).
            self._mh_broadcast_add_lora(int_id, lora_request.lora_local_path)
        return self._load_lora_local(int_id, lora_request.lora_local_path,
                                     getattr(lora_request, "lora_name", ""))

    def _load_lora_local(self, int_id: int, path: str, name: str = "") -> int:
        from vllm_ltr_tpu.lora.models import load_lora_adapter
        adapter = load_lora_adapter(path, self.num_layers, np.float32)
        slot = self.lora_bank.add_adapter(int_id, adapter)
        self._lora_params_cache = None  # bank changed
        logger.info("Loaded LoRA %r (rank %d) into slot %d", name,
                    adapter.rank, slot)
        return slot

    def _mh_broadcast_add_lora(self, int_id: int, path: str) -> None:
        data = np.frombuffer(path.encode("utf-8"), np.uint8)
        header = np.zeros(dist.HEADER_LEN, np.int32)
        header[0] = dist.OP_ADD_LORA
        header[1] = int_id
        header[2] = len(data)
        dist.broadcast_header(header)
        dist.broadcast_array(data, data.shape, np.uint8)

    _lora_params_cache = None

    def _params_with_lora(self, batch):
        """Merge the LoRA banks into the params pytree (cached per bank
        version); returns plain params when the batch has no adapters."""
        if batch.lora_slots is None:
            return self.params
        return self._merged_lora_params()

    def _merged_lora_params(self):
        """Batch-independent LoRA merge (followers mirror the leader's
        has_lora flag without a PreparedBatch)."""
        if self.lora_bank is None or self.lora_bank.banks is None:
            return self.params
        if self._lora_params_cache is None:
            layers = dict(self.params["layers"])
            for target, (A, B) in self.lora_bank.banks.items():
                # Banks are [S, L, ...]; lax.scan wants layer-leading.
                layers[f"lora_{target}_a"] = jnp.swapaxes(A, 0, 1)
                layers[f"lora_{target}_b"] = jnp.swapaxes(B, 0, 1)
            merged = {
                **self.params, "layers": layers,
                "lora_scalings": self.lora_bank.scalings
            }
            if self.lora_bank.embed_bank is not None:
                merged["lora_embed_a"] = self.lora_bank.embed_bank[0]
                merged["lora_embed_b"] = self.lora_bank.embed_bank[1]
            if self.lora_bank.head_bank is not None:
                merged["lora_lm_head_a"] = self.lora_bank.head_bank[0]
                merged["lora_lm_head_b"] = self.lora_bank.head_bank[1]
            self._lora_params_cache = merged
        return self._lora_params_cache

    def list_loras(self):
        return (set(self.lora_bank.slot_of)
                if self.lora_bank is not None else set())

    def _fetch(self, arr) -> np.ndarray:
        """Device -> host for step outputs; multihost arrays span
        non-addressable devices and need the replicated local shard (or an
        allgather when sharded)."""
        if not self.multihost:
            return np.asarray(arr)
        if arr.is_fully_replicated:
            return np.asarray(arr.addressable_shards[0].data)
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))

    # ------------------------------------------------------------------
    # Multi-host protocol: the leader's scheduler decides; every process
    # issues identical jit calls. The plan mirror below is the analogue of
    # the reference's broadcast_tensor_dict (worker.py:228-240), carried by
    # device collectives over ICI/DCN instead of gloo.
    # ------------------------------------------------------------------

    def _mh_broadcast_mapping(self, op: int, mapping: Dict[int, int]) -> None:
        pairs = list(mapping.items())
        header = np.zeros(dist.HEADER_LEN, np.int32)
        header[0], header[1] = op, len(pairs)
        dist.broadcast_header(header)
        arr = np.asarray(pairs, np.int32).reshape(len(pairs), 2)
        dist.broadcast_array(arr, arr.shape, np.int32)

    def _mh_broadcast_pairs(self, op: int, pairs) -> None:
        header = np.zeros(dist.HEADER_LEN, np.int32)
        header[0], header[1] = op, len(pairs)
        dist.broadcast_header(header)
        arr = np.asarray(pairs, np.int32).reshape(len(pairs), 2)
        dist.broadcast_array(arr, arr.shape, np.int32)

    def _mh_broadcast_step(self, i32_t, i32_s, f32_s, block_tables,
                           token_counts, use_penalties,
                           decode_mode, capture_layer, step_tile,
                           exact_sampling, logits_mask=None,
                           has_lora: bool = False,
                           has_page_dst: bool = False,
                           image_embeds=None,
                           return_logits: bool = False) -> None:
        header = np.zeros(dist.HEADER_LEN, np.int32)
        header[0] = dist.OP_STEP
        header[1] = int(use_penalties)
        header[2] = int(decode_mode)
        header[3] = 0 if capture_layer is None else capture_layer + 1
        header[4] = 0 if step_tile is None else step_tile
        header[5], header[6] = i32_t.shape  # Kt, T
        header[7], header[8] = i32_s.shape[1], block_tables.shape[1]  # S, MB
        header[9] = token_counts.shape[1]  # vocab (or 1)
        header[10] = int(exact_sampling)
        # Guided decoding mask (packed): width, or 0 when absent.
        header[11] = 0 if logits_mask is None else logits_mask.shape[1]
        header[12] = int(has_lora)
        header[13] = int(has_page_dst)
        # VLM prefill: hidden width of the mirrored [T, H] image-feature
        # buffer (0 = text-only step).
        header[14] = 0 if image_embeds is None else image_embeds.shape[1]
        # Two-phase (host logits_processors) step: followers run the same
        # forward-only program variant (KV write + PRNG advance, logits
        # returned and discarded); phase 2 samples leader-locally.
        header[15] = int(return_logits)
        dist.broadcast_header(header)
        for arr, dt in ((i32_t, np.int32), (i32_s, np.int32),
                        (f32_s, np.float32), (block_tables, np.int32),
                        (token_counts, np.uint8)):
            dist.broadcast_array(np.asarray(arr), arr.shape, dt)
        if logits_mask is not None:
            dist.broadcast_array(np.asarray(logits_mask),
                                 logits_mask.shape, np.uint8)
        if image_embeds is not None:
            dist.broadcast_array(
                np.asarray(image_embeds, np.float32),
                image_embeds.shape, np.float32)

    def _mh_broadcast_aux(self, tokens, positions, mask) -> None:
        header = np.zeros(dist.HEADER_LEN, np.int32)
        header[0] = dist.OP_AUX_SCORE
        header[1], header[2] = tokens.shape
        dist.broadcast_header(header)
        for arr in (tokens, positions, mask):
            dist.broadcast_array(np.asarray(arr), arr.shape, np.int32)

    def shutdown_followers(self) -> None:
        if self.multihost and self.is_leader:
            header = np.zeros(dist.HEADER_LEN, np.int32)
            header[0] = dist.OP_STOP
            dist.broadcast_header(header)

    def serve_follower(self) -> None:
        """Follower main loop: mirror the leader's device dispatches until
        an OP_STOP arrives. Runs on every non-leader process instead of the
        engine's scheduler loop."""
        assert self.multihost and not self.is_leader
        logger.info("follower %d serving", dist.process_index())
        while True:
            header = dist.broadcast_header(None)
            op = int(header[0])
            if op == dist.OP_STOP:
                logger.info("follower %d stopping", dist.process_index())
                return
            if op in (dist.OP_SWAP_OUT, dist.OP_SWAP_IN, dist.OP_COPY):
                n = int(header[1])
                pairs = dist.broadcast_array(None, (n, 2), np.int32)
                if op == dist.OP_SWAP_OUT:
                    self.kv_cache = self.swap_space.swap_out(
                        self.kv_cache, dict(map(tuple, pairs)))
                elif op == dist.OP_SWAP_IN:
                    self.kv_cache = self.swap_space.swap_in(
                        self.kv_cache, dict(map(tuple, pairs)))
                else:
                    copy_map: Dict[int, List[int]] = {}
                    for src, dst in pairs:
                        copy_map.setdefault(int(src), []).append(int(dst))
                    self.kv_cache = run_copy_blocks(self.kv_cache, copy_map)
            elif op == dist.OP_STEP:
                use_penalties = bool(header[1])
                decode_mode = bool(header[2])
                capture_layer = int(header[3]) - 1
                capture_layer = None if capture_layer < 0 else capture_layer
                step_tile = int(header[4]) or None
                Kt, T = int(header[5]), int(header[6])
                S, MB = int(header[7]), int(header[8])
                V = int(header[9])
                i32_t = jnp.asarray(
                    dist.broadcast_array(None, (Kt, T), np.int32))
                i32_s = jnp.asarray(
                    dist.broadcast_array(None, (4, S), np.int32))
                f32_s = jnp.asarray(
                    dist.broadcast_array(None, (6, S), np.float32))
                block_tables = jnp.asarray(
                    dist.broadcast_array(None, (S, MB), np.int32))
                tc_shape = (S, V) if use_penalties else (1, V)
                token_counts = jnp.asarray(
                    dist.broadcast_array(None, tc_shape, np.uint8))
                mask_w = int(header[11])
                has_mask = mask_w > 0
                logits_mask = (jnp.asarray(
                    dist.broadcast_array(None, (S, mask_w), np.uint8))
                               if has_mask else jnp.zeros((1, 1), np.uint8))
                has_lora = bool(header[12])
                has_page_dst = bool(header[13])
                img_h = int(header[14])
                image_embeds = None
                if img_h > 0:
                    image_embeds = jnp.asarray(
                        dist.broadcast_array(None, (T, img_h), np.float32),
                        self.dtype)
                if self.draft_params is not None:
                    # Mirror the leader's draft-cache sync for prefill /
                    # spec-ineligible steps (_execute_single_dispatch).
                    self.draft_kv_cache = self._draft_prefill_fn(
                        self.draft_params, self.draft_kv_cache, i32_t[0],
                        i32_t[1], i32_t[2], i32_t[3], block_tables, i32_s[0])
                params = (self._merged_lora_params()
                          if has_lora else self.params)
                self.kv_cache, _, _, self._rng = self._step_fn(
                    params, self.pred_params, self.kv_cache, i32_t,
                    i32_s, f32_s, block_tables, token_counts, self._rng,
                    use_penalties, decode_mode, capture_layer, has_lora,
                    step_tile, image_embeds,
                    exact_sampling=bool(header[10]),
                    logits_mask=logits_mask, has_logits_mask=has_mask,
                    return_logits=bool(header[15]),
                    has_page_dst=has_page_dst)
            elif op == dist.OP_MULTI_STEP:
                use_penalties = bool(header[1])
                has_lora = bool(header[2])
                S, MB = int(header[3]), int(header[4])
                K = int(header[5])
                V = int(header[6])
                last_tokens = jnp.asarray(
                    dist.broadcast_array(None, (S, ), np.int32))
                base_pos = jnp.asarray(
                    dist.broadcast_array(None, (S, ), np.int32))
                block_tables = jnp.asarray(
                    dist.broadcast_array(None, (S, MB), np.int32))
                slots = jnp.asarray(
                    dist.broadcast_array(None, (S, K), np.int32))
                i32_s = jnp.asarray(
                    dist.broadcast_array(None, (4, S), np.int32))
                f32_s = jnp.asarray(
                    dist.broadcast_array(None, (6, S), np.float32))
                tc_shape = (S, V) if use_penalties else (1, V)
                token_counts = jnp.asarray(
                    dist.broadcast_array(None, tc_shape, np.uint8))
                lora_slots = jnp.asarray(
                    dist.broadcast_array(None, (S, ), np.int32))
                params = (self._merged_lora_params()
                          if has_lora else self.params)
                self.kv_cache, _, _, self._rng = self._multi_step_fn(
                    params, self.kv_cache, last_tokens, base_pos,
                    block_tables, slots, i32_s, f32_s, token_counts,
                    lora_slots, self._rng, use_penalties, has_lora,
                    exact_sampling=bool(header[7]))
            elif op == dist.OP_ADD_LORA:
                int_id, n = int(header[1]), int(header[2])
                data = dist.broadcast_array(None, (n, ), np.uint8)
                path = bytes(data).decode("utf-8")
                self._load_lora_local(int_id, path)
            elif op == dist.OP_SPEC_STEP:
                S, MB = int(header[1]), int(header[2])
                k1 = int(header[3])
                last_tokens = jnp.asarray(
                    dist.broadcast_array(None, (S, ), np.int32))
                base_pos = jnp.asarray(
                    dist.broadcast_array(None, (S, ), np.int32))
                block_tables = jnp.asarray(
                    dist.broadcast_array(None, (S, MB), np.int32))
                seq_lens = jnp.asarray(
                    dist.broadcast_array(None, (S, ), np.int32))
                slots = jnp.asarray(
                    dist.broadcast_array(None, (S, k1), np.int32))
                temperature = jnp.asarray(
                    dist.broadcast_array(None, (S, ), np.float32))
                greedy = jnp.asarray(
                    dist.broadcast_array(None, (S, ), np.int32)) > 0
                (self.kv_cache, self.draft_kv_cache, _, _, _,
                 self._rng) = self._spec_fn(
                     self.params, self.draft_params, self.kv_cache,
                     self.draft_kv_cache, last_tokens, base_pos,
                     block_tables, seq_lens, slots, temperature, greedy,
                     self._rng)
            elif op == dist.OP_AUX_SCORE:
                B, L = int(header[1]), int(header[2])
                tokens = jnp.asarray(
                    dist.broadcast_array(None, (B, L), np.int32))
                positions = jnp.asarray(
                    dist.broadcast_array(None, (B, L), np.int32))
                mask = jnp.asarray(
                    dist.broadcast_array(None, (B, L), np.int32))
                self._aux_score_fn(self.aux_params, tokens, positions, mask)
            else:
                raise RuntimeError(f"unknown multihost opcode {op}")

    # ------------------------------------------------------------------

    def check_health(self) -> None:
        """Liveness: the device must still be attached AND able to run a
        program (a wedged runtime enumerates fine but never completes).
        Counterpart of the reference's Ray actor liveness poll
        (ray_gpu_executor.py:628-643), strengthened with an execution
        probe; throttled so per-request /health polls stay cheap."""
        if not jax.devices():
            raise RuntimeError("No devices available")
        # The execution probe can be disabled (LTR_TPU_HEALTH_PROBE=0):
        # on a relayed/experimental backend a stuck device call may hold
        # the GIL and freeze the whole serving process — worse than the
        # wedged-runtime condition it detects. Device enumeration above
        # still catches detachment (the reference's own health check is
        # a liveness poll with no device program, ray_gpu_executor
        # :628-643).
        if os.environ.get("LTR_TPU_HEALTH_PROBE", "1") == "0":
            return
        now = time.time()
        if now - self._last_health_probe < 10.0:
            return
        self._last_health_probe = now
        try:
            probe = jax.jit(lambda v: v + 1)(
                jnp.zeros((8, ), jnp.int32))
            if int(np.asarray(probe)[0]) != 1:
                raise RuntimeError("device probe returned wrong result")
        except Exception as e:
            raise RuntimeError(f"device execution probe failed: {e}") from e
