"""LLMEngine: the synchronous serving driver.

Behavioral counterpart of reference ``vllm/engine/llm_engine.py`` (679 LoC):
add_request tokenizes into Sequence/SequenceGroup; step() = schedule ->
execute_model -> process outputs -> free finished. Scheduler choice (MLFQ vs
generalized/stock) follows schedule_type (reference :197-201); the aux
predictor attaches directly to the scheduler (reference :224-242 — minus all
the Ray placement-group machinery, which a second jitted function replaces).
"""
from __future__ import annotations

import time
from typing import Dict, Iterable, List, Optional, Union

from vllm_ltr_tpu.config import EngineConfig
from vllm_ltr_tpu.core.scheduler import Scheduler, SchedulerOutputs
from vllm_ltr_tpu.engine.aux_scorer import AuxScorer
from vllm_ltr_tpu.engine.metrics import StatLogger, Stats
from vllm_ltr_tpu.engine.output_processor import (OutputProcessor,
                                                  StopChecker)
from vllm_ltr_tpu.executor.tpu_executor import TPUExecutor
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.outputs import RequestOutput
from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.sequence import (SamplerOutput, Sequence, SequenceGroup,
                                   SequenceStatus)
from vllm_ltr_tpu.transformers_utils.detokenizer import Detokenizer
from vllm_ltr_tpu.transformers_utils.tokenizer import get_tokenizer
from vllm_ltr_tpu.utils import Counter
from vllm_ltr_tpu.version import __version__

logger = init_logger(__name__)

_LOCAL_LOGGING_INTERVAL_SEC = 5.0


class LLMEngine:

    def __init__(self,
                 engine_config: EngineConfig,
                 log_stats: bool = False,
                 executor: Optional[TPUExecutor] = None) -> None:
        cfg = engine_config
        self.config = cfg
        self.model_config = cfg.model_config
        self.cache_config = cfg.cache_config
        self.parallel_config = cfg.parallel_config
        self.scheduler_config = cfg.scheduler_config
        self.log_stats = log_stats

        logger.info(
            "Initializing TPU LLM engine (v%s): model=%r, dtype=%s, "
            "schedule_type=%s, tp=%d", __version__, self.model_config.model,
            self.model_config.dtype, self.scheduler_config.schedule_type,
            self.parallel_config.tensor_parallel_size)

        self.seq_ids = Counter()  # monotonically allocates Sequence ids
        # Cumulative wall time per step phase (host scheduling vs device
        # execution vs output processing) — benchmark attribution.
        self.step_times: Dict[str, float] = {
            "schedule_s": 0.0, "execute_s": 0.0, "process_s": 0.0,
            "steps": 0}
        if self.model_config.skip_tokenizer_init:
            self.tokenizer = None
        else:
            self.tokenizer = get_tokenizer(
                self.model_config.tokenizer,
                self.model_config.tokenizer_mode,
                self.model_config.trust_remote_code,
                self.model_config.revision)

        self.model_executor = executor or TPUExecutor(cfg)
        self._provision_kv_cache()

        from vllm_ltr_tpu.usage.usage_lib import report_usage
        report_usage(
            (self.model_config.architectures or ["unknown"])[0],
            usage_context="LLM_ENGINE",
            extra_kvs={
                "dtype": self.model_config.dtype,
                "kv_cache_dtype": self.cache_config.cache_dtype,
                "tensor_parallel_size":
                    self.parallel_config.tensor_parallel_size,
                "block_size": self.cache_config.block_size,
                "quantization": self.model_config.quantization,
                "schedule_type": self.scheduler_config.schedule_type,
                "max_num_seqs": self.scheduler_config.max_num_seqs,
                "enable_chunked_prefill":
                    self.scheduler_config.chunked_prefill_enabled,
            })

        # The executor tile-aligns prefill rows; teach the scheduler's
        # token budget the same alignment so padded steps never overflow
        # the largest compiled bucket (a fresh jit shape mid-request).
        self.scheduler_config.prefill_token_align = getattr(
            self.model_executor, "prefill_tile", 1)

        # Scheduler: MLFQ or the generalized/stock Scheduler.
        spec = self.scheduler_config.schedule_spec
        if spec.is_mlfq:
            from vllm_ltr_tpu.core.mlfq import MLFQScheduler
            self.scheduler = MLFQScheduler(self.scheduler_config,
                                           self.cache_config,
                                           cfg.lora_config)
        else:
            self.scheduler = Scheduler(self.scheduler_config,
                                       self.cache_config, cfg.lora_config)

        # Attach the AUX predictor when configured (or required by policy).
        ppc = self.model_config.prefill_predictor_model_config
        if ppc is not None:
            self.model_executor.init_aux_model(ppc)
            # Async scoring only for pure score-rank policies: the
            # constraint policy consumes obtain_aux_scores' return value
            # (records), which the async path defers.
            async_ok = (self.scheduler_config.async_aux_scoring
                        and self.scheduler_config.schedule_spec.policy in
                        ("opt", "ropt", "tpt", "rtpt", "ltr", "xpt"))
            self.scheduler.aux_model = AuxScorer(self.model_executor, ppc,
                                                 async_mode=async_ok)

        eos_token_id = None
        if self.tokenizer is not None:
            eos_token_id = self.tokenizer.eos_token_id
        elif getattr(self.model_config.hf_config, "eos_token_id",
                     None) is not None:
            eos_token_id = self.model_config.hf_config.eos_token_id
        self.eos_token_id = eos_token_id

        self.detokenizer = Detokenizer(self.tokenizer)
        self.output_processor = OutputProcessor(
            self.detokenizer,
            StopChecker(self.model_config.max_model_len, eos_token_id),
            free_seq_fn=self.scheduler.free_seq,
            fork_seq_fn=self.scheduler.fork_seq,
            seq_counter=self.seq_ids)

        self.stat_logger = None
        if log_stats:
            self.stat_logger = StatLogger(
                local_interval=_LOCAL_LOGGING_INTERVAL_SEC,
                labels=dict(model_name=self.model_config.model))

    # ------------------------------------------------------------------

    def _provision_kv_cache(self) -> None:
        if self.scheduler_config.fake_allocate:
            self.model_executor.initialize_cache_empty()
            return
        n_device, n_host = (
            self.model_executor.determine_num_available_blocks())
        self.model_executor.initialize_cache(n_device, n_host)
        logger.info("# device blocks: %d, # host swap blocks: %d",
                    n_device, n_host)
        if self.scheduler_config.precompile_shapes:
            self.model_executor.precompile_shapes()

    @classmethod
    def from_engine_args(cls, engine_args, **kwargs) -> "LLMEngine":
        return cls(engine_args.create_engine_config(),
                   log_stats=not engine_args.disable_log_stats,
                   **kwargs)

    # ------------------------------------------------------------------
    # Requests
    # ------------------------------------------------------------------

    def encode_request(self, prompt: Optional[str],
                       prompt_token_ids: Optional[List[int]]) -> List[int]:
        if prompt_token_ids is not None:
            return prompt_token_ids
        assert prompt is not None
        assert self.tokenizer is not None, (
            "No tokenizer available: pass prompt_token_ids "
            "(skip_tokenizer_init mode)")
        return self.tokenizer.encode(prompt)

    def add_request(
        self,
        request_id: str,
        prompt: Optional[str] = None,
        sampling_params: Optional[SamplingParams] = None,
        prompt_token_ids: Optional[List[int]] = None,
        arrival_time: Optional[float] = None,
        lora_request=None,
        multi_modal_data=None,
    ) -> None:
        born = time.time() if arrival_time is None else arrival_time
        params = (sampling_params or SamplingParams()).clone()
        token_ids = self.encode_request(prompt, prompt_token_ids)
        # Leave ignoring/aborting decisions to the scheduler path.
        token_ids = token_ids[:self.model_config.max_model_len]

        if (params.prompt_logprobs is not None
                and getattr(self.model_executor, "multihost", False)):
            raise ValueError(
                "prompt_logprobs is not supported on multi-host "
                "deployments (the teacher-forced scorer dispatch is not "
                "mirrored to followers)")

        # Per-request logits_processors are multi-host safe: followers
        # mirror the forward-only (return_logits) program variant through
        # the OP_STEP header and the leader samples the host-processed
        # logits locally (tpu_executor._build_sample_fn).

        guide = None
        if (params.guided_choice is not None
                or params.guided_regex is not None
                or params.guided_json is not None
                or params.guided_grammar is not None):
            # `is not None`, not truthiness: guided_json={} ("any value")
            # and guided_choice=[] must reach the compiler (which accepts
            # or rejects them explicitly), never silently decode
            # unconstrained.
            from vllm_ltr_tpu.guided import guide_from_sampling_params
            # Compile (or fetch from cache) before admitting: a bad
            # pattern/schema must fail the request here, not a later step.
            guide = guide_from_sampling_params(
                self._guided_manager(), params,
                self.config.decoding_config.guided_decoding_backend)

        # NOTE: EOS handling stays on the ignore_eos-gated path in the stop
        # checker; adding EOS to stop_token_ids here would defeat ignore_eos.
        root = Sequence(next(self.seq_ids), prompt, token_ids,
                        self.cache_config.block_size, self.eos_token_id,
                        lora_request)
        # best_of > 1 (parallel sampling): children fork at prefill
        # completion (reference single-step output processor behavior);
        # the scheduler reserves capacity via get_max_num_running_seqs.
        group = SequenceGroup(request_id, [root], params, born, lora_request,
                              multi_modal_data)
        group.guide = guide
        self.scheduler.add_seq_group(group)

    def _guided_manager(self):
        """Lazily built per-tokenizer guide compiler (guided decoding)."""
        mgr = getattr(self, "_guided_mgr", None)
        if mgr is None:
            if self.tokenizer is None:
                raise ValueError(
                    "guided decoding requires a tokenizer; the engine was "
                    "started with skip_tokenizer_init")
            from vllm_ltr_tpu.guided import GuidedDecodingManager
            mgr = GuidedDecodingManager(self.tokenizer, self.eos_token_id)
            self._guided_mgr = mgr
        return mgr

    def prefetch_aux_scores(self) -> None:
        """Dispatch predictor scoring for unscored waiting requests NOW
        (score-at-arrival): the forward queues behind the in-flight
        serving wave, so the next scheduling pass usually finds the
        scores landed instead of paying a blocking dispatch round trip.
        Exact — the pass still blocks on any prefetch that has not
        landed.  The async engine calls this once per inbox drain
        (arrivals batch into one dispatch)."""
        scorer = getattr(self.scheduler, "aux_model", None)
        spec = getattr(self.scheduler, "spec", None)
        if scorer is None or spec is None or not spec.needs_scores:
            return
        if not hasattr(scorer, "prefetch"):
            return
        scorer.prefetch(list(self.scheduler.waiting))

    def abort_request(self, request_id: Union[str, Iterable[str]]) -> None:
        self.scheduler.abort_seq_group(request_id)

    def get_num_unfinished_requests(self) -> int:
        return self.scheduler.get_num_unfinished_seq_groups()

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_seqs()

    # ------------------------------------------------------------------
    # Step
    # ------------------------------------------------------------------

    def step(self) -> List[RequestOutput]:
        fin, plan = self.step_begin()
        sneaks = []
        if (fin is not None
                and self.scheduler_config.pipeline_admission
                and self.scheduler.waiting and not self.scheduler.swapped):
            # Batch the admission cohort into THIS step: every waiting
            # wave that fits the seat budget dispatches behind the main
            # plan before anything is fetched, so the whole cohort pays
            # one device round trip instead of one per wave (offline
            # counterpart of the async loop's sneak admissions; VERDICT
            # r4 "admission cadence" bottleneck).
            for _ in range(8):  # bounds device-queue growth
                fin2, plan2 = self.admission_step_begin()
                if fin2 is None:
                    if plan2.ignored_seq_groups or not plan2.is_empty():
                        sneaks.append((None, plan2))
                    break
                sneaks.append((fin2, plan2))
                if not self.scheduler.waiting:
                    break
        raw = fin() if fin is not None else []
        out = self.step_finish(raw, plan)
        for fin2, plan2 in sneaks:
            out.extend(self.step_finish(fin2() if fin2 else [], plan2))
        return out

    def step_begin(self):
        """Schedule one step and dispatch its device work.

        Returns ``(finish, plan)``: call ``finish()`` (safe from another
        thread — it only fetches device results) and pass the result to
        :meth:`step_finish` on the engine's thread.  ``finish`` is None
        for an empty plan.  Splitting the step this way lets the async
        engine overlap host work — including sneak prefill dispatches
        for newly arrived requests (:meth:`admission_step_begin`) — with
        the in-flight device step.
        """
        t0 = time.perf_counter()
        metadata_list, plan = self.scheduler.schedule()
        t1 = time.perf_counter()
        fin = None
        if not plan.is_empty():
            fin = self.model_executor.execute_model(
                metadata_list, plan.blocks_to_swap_in,
                plan.blocks_to_swap_out, plan.blocks_to_copy,
                plan.num_lookahead_slots, defer=True)
        t2 = time.perf_counter()
        st = self.step_times
        st["schedule_s"] += t1 - t0
        st["execute_s"] += t2 - t1
        return fin, plan

    def admission_step_begin(self):
        """Admission-only step (new prefills only; never preempts) —
        dispatched behind whatever is already in the device queue.  Same
        contract as :meth:`step_begin`."""
        t0 = time.perf_counter()
        metadata_list, plan = self.scheduler.schedule_admissions()
        t1 = time.perf_counter()
        fin = None
        if metadata_list:
            fin = self.model_executor.execute_model(
                metadata_list, plan.blocks_to_swap_in,
                plan.blocks_to_swap_out, plan.blocks_to_copy,
                plan.num_lookahead_slots, defer=True)
        t2 = time.perf_counter()
        st = self.step_times
        st["schedule_s"] += t1 - t0
        st["execute_s"] += t2 - t1
        return fin, plan

    def step_finish(self, sampler_outputs: List[SamplerOutput],
                    plan: SchedulerOutputs) -> List[RequestOutput]:
        """Process fetched device results on the engine's thread."""
        t2 = time.perf_counter()
        outputs = self._process_model_outputs(sampler_outputs, plan)
        t3 = time.perf_counter()
        st = self.step_times
        st["process_s"] += t3 - t2
        st["steps"] += 1
        return outputs

    def _process_model_outputs(
            self, sampler_outputs: List[SamplerOutput],
            plan: SchedulerOutputs) -> List[RequestOutput]:
        now = time.time()
        scheduled = plan.scheduled_seq_groups

        if sampler_outputs:
            step_out = sampler_outputs[0]
            assert len(step_out.outputs) == len(scheduled)
            for sg, group_out in zip(scheduled, step_out.outputs):
                group = sg.seq_group
                group.update_num_computed_tokens(sg.token_chunk_size)
                if group_out.prompt_logprobs is not None:
                    # Chunked prefill emits per-chunk slices in order.
                    if group.prompt_logprobs is None:
                        group.prompt_logprobs = []
                    group.prompt_logprobs.extend(group_out.prompt_logprobs)
                self.output_processor.process_outputs(group, group_out)
                if not group.is_prefill():
                    group.maybe_set_first_token_time(now)

        self.scheduler.free_finished_seq_groups()

        results = [RequestOutput.from_seq_group(sg.seq_group)
                   for sg in scheduled]
        results.extend(RequestOutput.from_seq_group(g)
                       for g in plan.ignored_seq_groups)

        if self.stat_logger is not None:
            self.stat_logger.log(self._get_stats(plan))
        return results

    # ------------------------------------------------------------------
    # Stats (counterpart of llm_engine._get_stats :596-668)
    # ------------------------------------------------------------------

    @staticmethod
    def _pool_usage(total: Optional[int], free_fn) -> float:
        """Fraction of a block pool in use (0.0 for an unconfigured pool)."""
        if not total:
            return 0.0
        return 1.0 - free_fn() / total

    def _get_stats(self, scheduler_outputs: Optional[SchedulerOutputs]
                   ) -> Stats:
        now = time.time()
        bm = self.scheduler.block_manager
        prompt_toks = 0
        decode_toks = 0
        ttft_samples: List[float] = []
        tpot_samples: List[float] = []
        e2e_samples: List[float] = []
        for sg in (scheduler_outputs.scheduled_seq_groups
                   if scheduler_outputs is not None else ()):
            group = sg.seq_group
            if group.is_prefill():
                # Mid-prefill (chunked): count the chunk, no token yet.
                prompt_toks += sg.token_chunk_size
                continue
            decode_toks += (group.num_seqs(status=SequenceStatus.RUNNING)
                            or group.num_seqs())
            born = group.metrics.arrival_time
            first = group.metrics.first_token_time
            # Advance the inter-token clock every decode step; a request's
            # first token reports TTFT instead of TPOT (chunked prefill
            # makes this a per-group, not per-step, distinction).
            gap = group.get_last_latency(now)
            if group.get_seqs()[0].get_output_len() <= 1:
                if sg.token_chunk_size > 1:  # prefill finished this step
                    prompt_toks += sg.token_chunk_size
                if first is not None:
                    ttft_samples.append(first - born)
            else:
                tpot_samples.append(gap)
            if group.is_finished():
                e2e_samples.append(now - born)

        aux = getattr(self.scheduler, "aux_model", None)
        return Stats(
            now=now,
            num_running=len(self.scheduler.running),
            num_swapped=len(self.scheduler.swapped),
            num_waiting=len(self.scheduler.waiting),
            gpu_cache_usage=self._pool_usage(
                self.cache_config.num_gpu_blocks,
                bm.get_num_free_gpu_blocks),
            cpu_cache_usage=self._pool_usage(
                self.cache_config.num_cpu_blocks,
                bm.get_num_free_cpu_blocks),
            num_prompt_tokens=prompt_toks,
            num_generation_tokens=decode_toks,
            time_to_first_tokens=ttft_samples,
            time_per_output_tokens=tpot_samples,
            time_e2e_requests=e2e_samples,
            aux_score_times=(aux.drain_recent_times()
                             if hasattr(aux, "drain_recent_times") else []),
        )

    def do_log_stats(self) -> None:
        if self.stat_logger is not None:
            self.stat_logger.log(self._get_stats(scheduler_outputs=None))

    def check_health(self) -> None:
        self.model_executor.check_health()
