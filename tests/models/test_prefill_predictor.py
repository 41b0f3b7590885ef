"""Standalone PredModel scorer (reference prefill_predictor.py parity):
same scores as the serving executor's score_prompts path."""
import numpy as np
import jax.numpy as jnp

from vllm_ltr_tpu.config import PrefillPredictorConfig
from vllm_ltr_tpu.models.prefill_predictor import (PredModel,
                                                   prefill_predictor_model)


def test_predmodel_scores_rank_mode():
    cfg = PrefillPredictorConfig(pred_model="test-opt-tiny", num_labels=1,
                                 mtype="rank", max_length=16,
                                 max_batch_size=4)
    model = prefill_predictor_model(cfg)
    assert isinstance(model, PredModel)
    rng = np.random.RandomState(0)
    prompts = [list(map(int, rng.randint(1, 400, size=n)))
               for n in (3, 9, 30, 5, 7)]  # one over max_length
    scores = model.score(prompts)
    assert len(scores) == 5
    assert all(np.isfinite(s) for s in scores)
    # Truncation: scoring the pre-truncated prompt gives the same value.
    same = model.score([prompts[2][:16]])
    np.testing.assert_allclose(same[0], scores[2], rtol=1e-5, atol=1e-5)
    # Batching (max_batch_size=4 forces two chunks) is value-invariant.
    rescored = model.score(prompts[:2])
    np.testing.assert_allclose(rescored, scores[:2], rtol=1e-5, atol=1e-5)


def test_predmodel_class_mode_buckets():
    cfg = PrefillPredictorConfig(pred_model="test-opt-tiny", num_labels=8,
                                 mtype="class", max_length=16,
                                 max_batch_size=8)
    model = PredModel(cfg)
    scores = model.score([[1, 2, 3], [400, 401]])
    assert all(0 <= s < 8 and float(s).is_integer() for s in scores)
