"""Trainer tests: fine-tune the tiny OPT predictor on synthetic
length-labeled data, check ranking quality (Kendall tau), checkpoint
round-trip, and the full LTR loop through the serving engine."""
import json

import numpy as np
import pytest

from vllm_ltr_tpu.config import PrefillPredictorConfig
from vllm_ltr_tpu.train.trainer import (Example, PredictorTrainer,
                                        len_to_label)
from vllm_ltr_tpu.transformers_utils.config import get_hf_config

VOCAB = 512


SHORT_MARKER = 7
LONG_MARKER = 8


def synthetic_examples(n=256, seed=0):
    """Output length is determined by a marker token at position 0 (like a
    task-type prefix in real traces): marker 7 -> short job, 8 -> long."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        short = bool(rng.randint(0, 2))
        first = SHORT_MARKER if short else LONG_MARKER
        length = 10 if short else 500
        ids = [first] + list(map(int, rng.randint(9, VOCAB, size=7)))
        out.append(Example(ids, length))
    return out


def make_trainer(loss="listMLE", group=1, num_labels=1):
    cfg = PrefillPredictorConfig(pred_model="test-opt-tiny",
                                 num_labels=num_labels,
                                 mtype="rank" if num_labels == 1 else
                                 "class",
                                 max_length=16,
                                 max_batch_size=64)
    hf = get_hf_config("test-opt-tiny")
    return PredictorTrainer(cfg,
                            loss=loss,
                            lr=1e-3,
                            label_max_length=1024,
                            label_group_size=group,
                            hf_config=hf)


def test_len_to_label_inversion():
    # Shorter outputs -> higher labels (run-first under descending sort).
    assert len_to_label(10, 8192, 1) > len_to_label(500, 8192, 1)
    assert len_to_label(9000, 8192, 1) == 0
    assert len_to_label(0, 8192, 10) == 819


def test_listmle_training_learns_ranking():
    trainer = make_trainer("listMLE")
    examples = synthetic_examples(256)
    tau0, _ = trainer.evaluate(examples[-32:])
    history = trainer.train(examples, epochs=8, batch_size=32)
    # Binary ground-truth lengths cap Kendall tau-b at ~0.707 (tie
    # correction); > 0.55 means the ranking is essentially learned.
    assert history["tau"][-1] > 0.55, history
    assert history["tau"][-1] > tau0


def test_crossentropy_training_learns_buckets():
    trainer = make_trainer("crossentropy", group=500, num_labels=-1)
    # num_labels = ceil(1024 / 500) = 3 buckets (labels 1 and 2 used).
    assert trainer.num_labels == 3
    examples = synthetic_examples(256, seed=1)
    history = trainer.train(examples, epochs=4, batch_size=32)
    assert history["acc"][-1] > 0.9, history


def test_save_and_reload_checkpoint(tmp_path):
    trainer = make_trainer("listMLE")
    examples = synthetic_examples(128)
    trainer.train(examples, epochs=2, batch_size=32)
    usage_path = trainer.save(str(tmp_path / "job"))

    cfg = PrefillPredictorConfig.from_json(usage_path)
    assert cfg.num_labels == 1
    # Reload through the HF checkpoint and check scoring parity.
    import jax.numpy as jnp
    from vllm_ltr_tpu.models.opt import OPTForSequenceClassification
    from vllm_ltr_tpu.models.weights import load_params
    from transformers import AutoConfig
    hf_cfg = AutoConfig.from_pretrained(cfg.pred_model)
    params = load_params(OPTForSequenceClassification, cfg.pred_model,
                         hf_cfg, jnp.float32)
    # Score a batch with both the live trainer params and the reloaded ones.
    from vllm_ltr_tpu.train.trainer import _pad_batch
    tokens, mask = _pad_batch(examples[:8], 16)
    live = np.asarray(
        trainer._score_fn(trainer.params, jnp.asarray(tokens),
                          jnp.asarray(mask)))
    reload_trainer = trainer  # reuse jitted fn with reloaded params
    reloaded = np.asarray(
        reload_trainer._score_fn(params, jnp.asarray(tokens),
                                 jnp.asarray(mask)))
    # fp16 save round-trip: loose tolerance.
    np.testing.assert_allclose(live, reloaded, rtol=0.05, atol=0.05)


def test_trained_predictor_drives_engine_scheduling(tmp_path):
    """The complete LTR loop: train -> save -> serve with schedule_type=opt
    -> short-predicted jobs are scheduled first."""
    import torch
    from transformers import LlamaForCausalLM as HFLlama
    from vllm_ltr_tpu import LLM, SamplingParams

    trainer = make_trainer("listMLE")
    trainer.train(synthetic_examples(256), epochs=4, batch_size=32)
    usage_path = trainer.save(str(tmp_path / "job"))

    llama_cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(llama_cfg).eval().float()
    model_dir = tmp_path / "model"
    hf.save_pretrained(model_dir)

    llm = LLM(model=str(model_dir),
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=256,
              max_num_seqs=2,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01,
              schedule_type="opt",
              prefill_predictor_model_config=usage_path)

    rng = np.random.RandomState(3)
    # Interleave long-predicted and short-predicted jobs (marker at pos 0).
    prompts = []
    kinds = []
    for i in range(6):
        short = i % 2 == 0
        first = SHORT_MARKER if short else LONG_MARKER
        prompts.append([first] + list(map(int, rng.randint(9, 500, size=5))))
        kinds.append("short" if short else "long")
    params = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    outputs = llm.generate(prompt_token_ids=prompts,
                           sampling_params=params,
                           use_tqdm=False)
    scores = {
        out.request_id: out.outputs[0].aux_model_score
        for out in outputs
    }
    short_scores = [
        s for rid, s in scores.items() if kinds[int(rid)] == "short"
    ]
    long_scores = [
        s for rid, s in scores.items() if kinds[int(rid)] == "long"
    ]
    # The trained predictor must rank every short job above every long job.
    assert min(short_scores) > max(long_scores), scores
