"""Standalone prompt-length predictor (HF-side PredModel).

Behavioral counterpart of reference
``vllm/model_executor/prefill_predictor.py`` (96 LoC): a self-contained
scorer around the sequence-classification predictor for OFFLINE use —
dataset labeling (benchmarks/append_dataset_po.py-style pipelines),
predictor evaluation, and ad-hoc scoring outside the serving engine.
``mtype`` ∈ {"rank" (num_labels==1, scalar score), "class" (argmax
bucket)}; prompts truncate to ``max_length`` and batch in chunks of
``max_batch_size``, exactly like the reference's ``PredModel.score``.

The serving engine does NOT use this class — there the predictor runs as
a jitted dense forward on the serving mesh (executor ``score_prompts`` +
engine/aux_scorer.py). This module is the API-parity entry for users who
scored prompts with the reference's ``prefill_predictor_model()``.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from vllm_ltr_tpu.config import PrefillPredictorConfig


def prefill_predictor_model(config: PrefillPredictorConfig) -> "PredModel":
    """Reference factory name (prefill_predictor.py:84)."""
    return PredModel(config)


class PredModel:

    def __init__(self, config: PrefillPredictorConfig,
                 tokenizer=None) -> None:
        from vllm_ltr_tpu.models.opt import OPTForSequenceClassification
        from vllm_ltr_tpu.models.weights import load_params
        from vllm_ltr_tpu.transformers_utils.config import get_hf_config

        self.config = config
        self.mtype = config.mtype
        self.max_length = config.max_length
        self.max_batch_size = config.max_batch_size
        self.tokenizer = tokenizer
        self.hf_config = get_hf_config(config.pred_model)
        self.hf_config.num_labels = config.num_labels
        self.params = load_params(OPTForSequenceClassification,
                                  config.pred_model, self.hf_config,
                                  jnp.float32)
        self._cls = OPTForSequenceClassification

        cls, hf_cfg = self._cls, self.hf_config

        def score_fn(params, tokens, mask):
            positions = jnp.broadcast_to(
                jnp.arange(tokens.shape[1], dtype=jnp.int32), tokens.shape)
            hidden = cls.dense_forward(params, tokens, positions, mask,
                                       hf_cfg)
            last_idx = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)
            last_hidden = jnp.take_along_axis(
                hidden, last_idx.astype(jnp.int32)[:, None, None],
                axis=1).squeeze(1)
            logits = cls.compute_logits(params, last_hidden, hf_cfg)
            if config.num_labels > 1:
                return jnp.argmax(logits, axis=-1).astype(jnp.float32)
            return logits[:, 0]

        self._score_fn = jax.jit(score_fn)

    def _encode(self, prompt: Union[str, Sequence[int]]) -> List[int]:
        if isinstance(prompt, str):
            assert self.tokenizer is not None, (
                "string prompts need a tokenizer")
            ids = self.tokenizer.encode(prompt)
        else:
            ids = list(prompt)
        return ids[:self.max_length]

    def score(self, prompts: Sequence[Union[str, Sequence[int]]]
              ) -> List[float]:
        """Batched scores, reference PredModel.score semantics: truncate to
        max_length, run in max_batch_size chunks, return one float per
        prompt (scalar rank score or class bucket)."""
        out: List[float] = []
        for start in range(0, len(prompts), self.max_batch_size):
            chunk = [self._encode(p) for p in
                     prompts[start:start + self.max_batch_size]]
            width = max(1, max((len(c) for c in chunk), default=1))
            tokens = np.zeros((len(chunk), width), np.int32)
            mask = np.zeros((len(chunk), width), np.float32)
            for i, ids in enumerate(chunk):
                tokens[i, :len(ids)] = ids
                mask[i, :len(ids)] = 1.0
            scores = self._score_fn(self.params, jnp.asarray(tokens),
                                    jnp.asarray(mask))
            out.extend(float(s) for s in np.asarray(scores))
        return out
