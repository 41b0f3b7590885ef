"""AUXLLM: standalone predictor-scoring entrypoint.

Behavioral counterpart of reference ``vllm/entrypoints/aux_llm.py`` (249
LoC): an offline-LLM-style wrapper around the output-length predictor that
scores prompts. The reference builds a whole nested vLLM engine with
``gpu_memory_utilization=0.0, swap_space=0, enforce_eager=True,
max_tokens=1`` and fake block allocation; on TPU it's one dense jitted
forward (executor.score_prompts).
"""
from __future__ import annotations

from vllm_ltr_tpu.config import (EngineConfig, PrefillPredictorConfig)
from vllm_ltr_tpu.engine.arg_utils import EngineArgs
from vllm_ltr_tpu.executor.tpu_executor import TPUExecutor
from vllm_ltr_tpu.sequence import SequenceGroup
from vllm_ltr_tpu.transformers_utils.tokenizer import get_tokenizer


class AUXLLM:
    """Score prompts with the learning-to-rank output-length predictor."""

    def __init__(self,
                 prefill_predictor_model_config: (
                     str | PrefillPredictorConfig),
                 tokenizer: str | None = None,
                 executor: TPUExecutor | None = None, **kwargs) -> None:
        if isinstance(prefill_predictor_model_config, str):
            prefill_predictor_model_config = PrefillPredictorConfig.from_json(
                prefill_predictor_model_config)
        self.config = prefill_predictor_model_config

        if executor is not None:
            # Share the serving model's executor/mesh (the reference's
            # GPU-sharing path, ray_gpu_executor.py:31-51).
            self.executor = executor
        else:
            # Standalone: build an executor around the predictor model with
            # an empty KV cache (fake allocation analogue).
            engine_args = EngineArgs(
                model=self.config.pred_model, tokenizer=tokenizer,
                gpu_memory_utilization=0.0, swap_space=0,
                enforce_eager=True, fake_allocate=True, **kwargs)
            engine_config = engine_args.create_engine_config()
            # The predictor executor hosts only the aux model; reuse the
            # TPUExecutor but skip the main-model cache.
            self.executor = TPUExecutor(engine_config)
            self.executor.initialize_cache_empty()
        if self.executor.aux_params is None:
            self.executor.init_aux_model(self.config)
        self.tokenizer = get_tokenizer(tokenizer)

    def score(self, prompts: list[str] | None = None,
              prompt_token_ids: list[list[int]] | None = None
              ) -> list[float]:
        if prompt_token_ids is None:
            assert prompts is not None and self.tokenizer is not None
            prompt_token_ids = [self.tokenizer.encode(p) for p in prompts]
        return self.executor.score_prompts(prompt_token_ids)

    def obtain_aux_scores(self,
                          seq_groups: list[SequenceGroup]) -> list[float]:
        """Scheduler-facing API (reference aux_llm.py:125)."""
        scores = self.score(
            prompt_token_ids=[g.prompt_token_ids for g in seq_groups])
        for g, s in zip(seq_groups, scores):
            g.set_aux_model_score(float(s))
        return scores
