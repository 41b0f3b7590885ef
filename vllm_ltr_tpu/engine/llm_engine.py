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

        self.seq_counter = Counter()
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
        self._initialize_kv_caches()

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
            self.scheduler.aux_model = AuxScorer(self.model_executor, ppc)

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
            seq_counter=self.seq_counter)

        self.stat_logger = StatLogger(
            local_interval=_LOCAL_LOGGING_INTERVAL_SEC,
            labels=dict(model_name=self.model_config.model)) \
            if log_stats else None

    # ------------------------------------------------------------------

    def _initialize_kv_caches(self) -> None:
        if self.scheduler_config.fake_allocate:
            self.model_executor.initialize_cache_empty()
            return
        num_gpu_blocks, num_cpu_blocks = (
            self.model_executor.determine_num_available_blocks())
        self.model_executor.initialize_cache(num_gpu_blocks, num_cpu_blocks)
        logger.info("# device blocks: %d, # host swap blocks: %d",
                    num_gpu_blocks, num_cpu_blocks)

    @classmethod
    def from_engine_args(cls, engine_args, **kwargs) -> "LLMEngine":
        engine_config = engine_args.create_engine_config()
        return cls(engine_config,
                   log_stats=not engine_args.disable_log_stats,
                   **kwargs)

    # ------------------------------------------------------------------
    # Requests
    # ------------------------------------------------------------------

    def encode_request(self, prompt: Optional[str],
                       prompt_token_ids: Optional[List[int]]) -> List[int]:
        if prompt_token_ids is None:
            assert prompt is not None
            assert self.tokenizer is not None, (
                "No tokenizer available: pass prompt_token_ids "
                "(skip_tokenizer_init mode)")
            prompt_token_ids = self.tokenizer.encode(prompt)
        return prompt_token_ids

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
        if arrival_time is None:
            arrival_time = time.time()
        if sampling_params is None:
            sampling_params = SamplingParams()
        prompt_token_ids = self.encode_request(prompt, prompt_token_ids)
        max_len = self.model_config.max_model_len
        if len(prompt_token_ids) > max_len:
            # Leave ignoring/aborting decisions to the scheduler path.
            prompt_token_ids = prompt_token_ids[:max_len]

        block_size = self.cache_config.block_size
        seq_id = next(self.seq_counter)
        seq = Sequence(seq_id, prompt, prompt_token_ids, block_size,
                       self.eos_token_id, lora_request)
        # NOTE: EOS handling stays on the ignore_eos-gated path in the stop
        # checker; adding EOS to stop_token_ids here would defeat ignore_eos.
        sampling_params = sampling_params.clone()

        # best_of > 1 (parallel sampling): children fork at prefill
        # completion (reference single-step output processor behavior);
        # the scheduler reserves capacity via get_max_num_running_seqs.
        seq_group = SequenceGroup(request_id, [seq], sampling_params,
                                  arrival_time, lora_request,
                                  multi_modal_data)
        self.scheduler.add_seq_group(seq_group)

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
        t0 = time.perf_counter()
        seq_group_metadata_list, scheduler_outputs = self.scheduler.schedule()
        t1 = time.perf_counter()

        if not scheduler_outputs.is_empty():
            sampler_outputs = self.model_executor.execute_model(
                seq_group_metadata_list,
                scheduler_outputs.blocks_to_swap_in,
                scheduler_outputs.blocks_to_swap_out,
                scheduler_outputs.blocks_to_copy,
                scheduler_outputs.num_lookahead_slots)
        else:
            sampler_outputs = []
        t2 = time.perf_counter()

        outputs = self._process_model_outputs(sampler_outputs,
                                              scheduler_outputs)
        t3 = time.perf_counter()
        st = self.step_times
        st["schedule_s"] += t1 - t0
        st["execute_s"] += t2 - t1
        st["process_s"] += t3 - t2
        st["steps"] += 1
        return outputs

    def _process_model_outputs(
            self, sampler_outputs: List[SamplerOutput],
            scheduler_outputs: SchedulerOutputs) -> List[RequestOutput]:
        now = time.time()
        request_outputs: List[RequestOutput] = []

        if sampler_outputs:
            output = sampler_outputs[0]
            scheduled = scheduler_outputs.scheduled_seq_groups
            assert len(output.outputs) == len(scheduled)
            for scheduled_group, group_output in zip(scheduled,
                                                     output.outputs):
                seq_group = scheduled_group.seq_group
                seq_group.update_num_computed_tokens(
                    scheduled_group.token_chunk_size)
                self.output_processor.process_outputs(seq_group,
                                                      group_output)
                if not seq_group.is_prefill():
                    seq_group.maybe_set_first_token_time(now)
        else:
            scheduled = scheduler_outputs.scheduled_seq_groups

        self.scheduler.free_finished_seq_groups()

        for scheduled_group in scheduler_outputs.scheduled_seq_groups:
            seq_group = scheduled_group.seq_group
            request_outputs.append(RequestOutput.from_seq_group(seq_group))
        for seq_group in scheduler_outputs.ignored_seq_groups:
            request_outputs.append(RequestOutput.from_seq_group(seq_group))

        if self.stat_logger is not None:
            self.stat_logger.log(self._get_stats(scheduler_outputs))
        return request_outputs

    # ------------------------------------------------------------------
    # Stats (counterpart of llm_engine._get_stats :596-668)
    # ------------------------------------------------------------------

    def _get_stats(self, scheduler_outputs: Optional[SchedulerOutputs]
                   ) -> Stats:
        now = time.time()
        num_total_gpu = self.cache_config.num_gpu_blocks or 0
        num_free_gpu = (self.scheduler.block_manager.get_num_free_gpu_blocks()
                        if num_total_gpu else 0)
        gpu_cache_usage = (1.0 - num_free_gpu / num_total_gpu
                           if num_total_gpu > 0 else 0.0)
        num_total_cpu = self.cache_config.num_cpu_blocks or 0
        num_free_cpu = (self.scheduler.block_manager.get_num_free_cpu_blocks()
                        if num_total_cpu else 0)
        cpu_cache_usage = (1.0 - num_free_cpu / num_total_cpu
                           if num_total_cpu > 0 else 0.0)

        num_prompt_tokens = 0
        num_generation_tokens = 0
        time_to_first_tokens = []
        time_per_output_tokens = []
        time_e2e_requests = []
        if scheduler_outputs is not None:
            for sg in scheduler_outputs.scheduled_seq_groups:
                group = sg.seq_group
                if group.is_prefill():
                    # Mid-prefill (chunked): count the chunk, no token yet.
                    num_prompt_tokens += sg.token_chunk_size
                    continue
                num_generation_tokens += group.num_seqs(
                    status=SequenceStatus.RUNNING) or group.num_seqs()
                first = group.metrics.first_token_time
                produced = group.get_seqs()[0].get_output_len()
                # Advance the inter-token clock every decode step; the
                # first token of a request reports TTFT instead of TPOT
                # (chunked prefill makes this a per-group, not per-step,
                # distinction).
                gap = group.get_last_latency(now)
                if produced <= 1:
                    if sg.token_chunk_size > 1:
                        # Prefill completed this step.
                        num_prompt_tokens += sg.token_chunk_size
                    if first is not None:
                        time_to_first_tokens.append(
                            first - group.metrics.arrival_time)
                else:
                    time_per_output_tokens.append(gap)
                if group.is_finished():
                    time_e2e_requests.append(now -
                                             group.metrics.arrival_time)

        aux = getattr(self.scheduler, "aux_model", None)
        aux_times = (aux.drain_recent_times()
                     if hasattr(aux, "drain_recent_times") else [])
        return Stats(
            now=now,
            num_running=len(self.scheduler.running),
            num_swapped=len(self.scheduler.swapped),
            num_waiting=len(self.scheduler.waiting),
            gpu_cache_usage=gpu_cache_usage,
            cpu_cache_usage=cpu_cache_usage,
            num_prompt_tokens=num_prompt_tokens,
            num_generation_tokens=num_generation_tokens,
            time_to_first_tokens=time_to_first_tokens,
            time_per_output_tokens=time_per_output_tokens,
            time_e2e_requests=time_e2e_requests,
            aux_score_times=aux_times,
        )

    def do_log_stats(self) -> None:
        if self.stat_logger is not None:
            self.stat_logger.log(self._get_stats(scheduler_outputs=None))

    def check_health(self) -> None:
        self.model_executor.check_health()
