"""Predictor training harness (JAX/optax).

Behavioral counterpart of reference ``train/trainer.py`` (223 LoC):
fine-tune an OPT sequence-classification predictor on
(prompt -> generation length) pairs with the inverted-bucket label
``label = label_max_length // group - min(label_max_length, len) // group``
(trainer.py:50-52), using ListMLE / neuralNDCG (ranking) or MSE /
CrossEntropy (classification buckets) losses (:125-157). Eval = Kendall's
Tau on a 10% holdout (:195-196); saves an HF checkpoint + usage_config.json
consumed by ``--prefill-predictor-model-config`` (:201-216).

Data format (jsonl), either of:
  {"prompt": "...", "generated": "..."}                   (needs tokenizer)
  {"prompt_token_ids": [...], "generation_len": N}        (hermetic)
"""
from __future__ import annotations

import json
import math
import os
from argparse import ArgumentParser
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vllm_ltr_tpu.config import PrefillPredictorConfig
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.models.opt import OPTForSequenceClassification
from vllm_ltr_tpu.models.weights import load_params
from vllm_ltr_tpu.train.losses import listMLE, neuralNDCG, pointwise_rmse
from vllm_ltr_tpu.train.metrics import bucket_accuracy, kendall_tau

logger = init_logger(__name__)


def len_to_label(length: int, label_max_length: int,
                 label_group_size: int) -> int:
    """Inverted bucketed length: shorter outputs get HIGHER labels, so a
    higher predicted score means run-first (reference trainer.py:50-52)."""
    return (label_max_length // label_group_size -
            min(label_max_length, length) // label_group_size)


@dataclass
class Example:
    token_ids: List[int]
    generation_len: int


def load_dataset(path: str, tokenizer=None) -> List[Example]:
    out: List[Example] = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            obj = json.loads(line)
            if "prompt_token_ids" in obj:
                ids = obj["prompt_token_ids"]
                glen = obj["generation_len"]
            else:
                assert tokenizer is not None, (
                    "text dataset needs a tokenizer")
                ids = tokenizer(obj["prompt"])["input_ids"]
                glen = len(tokenizer(obj["generated"])["input_ids"])
            out.append(Example(ids, glen))
    return out


def _pad_batch(examples: List[Example], max_length: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    B = len(examples)
    L = min(max(len(e.token_ids) for e in examples), max_length)
    # Bucket the padded length (powers of two) to bound recompiles.
    Lp = 16
    while Lp < L:
        Lp *= 2
    L = min(Lp, max_length)
    tokens = np.zeros((B, L), np.int32)
    mask = np.zeros((B, L), np.int32)
    for i, e in enumerate(examples):
        ids = e.token_ids[:max_length]
        tokens[i, :len(ids)] = ids
        mask[i, :len(ids)] = 1
    return tokens, mask


class PredictorTrainer:

    def __init__(
        self,
        config: PrefillPredictorConfig,
        loss: str = "listMLE",
        lr: float = 2e-5,
        weight_decay: float = 0.01,
        label_max_length: int = 8192,
        label_group_size: int = 1,
        seed: int = 42,
        hf_config=None,
        dtype=jnp.float32,
    ) -> None:
        from vllm_ltr_tpu.transformers_utils.config import get_hf_config
        self.config = config
        self.loss_name = loss
        self.label_max_length = label_max_length
        self.label_group_size = label_group_size
        if config.num_labels == -1:
            config.num_labels = math.ceil(label_max_length /
                                          label_group_size)
        self.hf_config = hf_config or get_hf_config(config.pred_model)
        self.hf_config.num_labels = config.num_labels
        self.num_labels = config.num_labels

        self.params = load_params(OPTForSequenceClassification,
                                  config.pred_model, self.hf_config, dtype)
        self.opt = optax.adamw(lr, weight_decay=weight_decay)
        self.opt_state = self.opt.init(self.params)
        self.rng = jax.random.PRNGKey(seed)
        self._train_step = self._build_train_step()
        self._score_fn = self._build_score_fn()

    # -- jitted pieces --------------------------------------------------

    def _forward_scores(self, params, tokens, mask):
        positions = jnp.broadcast_to(
            jnp.arange(tokens.shape[1], dtype=jnp.int32), tokens.shape)
        hidden = OPTForSequenceClassification.dense_forward(
            params, tokens, positions, mask, self.hf_config)
        last = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)
        last_hidden = jnp.take_along_axis(hidden, last[:, None, None],
                                          axis=1).squeeze(1)
        return OPTForSequenceClassification.compute_logits(
            params, last_hidden, self.hf_config)

    def _build_train_step(self):
        loss_name = self.loss_name
        num_labels = self.num_labels

        def loss_fn(params, tokens, mask, labels, key):
            out = self._forward_scores(params, tokens, mask)  # [B, labels]
            if loss_name == "crossentropy":
                logits = out
                onehot = jax.nn.one_hot(labels, num_labels)
                return -jnp.mean(
                    jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))
            scores = out[:, 0][None, :]  # in-batch slate [1, B]
            y_true = labels[None, :].astype(jnp.float32)
            if loss_name == "listMLE":
                return listMLE(scores, y_true, key=key)
            if loss_name == "neuralNDCG":
                return neuralNDCG(scores, y_true)
            if loss_name == "mse":
                return jnp.mean((scores[0] - y_true[0])**2)
            raise ValueError(f"Unknown loss {loss_name!r}")

        @jax.jit
        def train_step(params, opt_state, tokens, mask, labels, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, tokens, mask,
                                                      labels, key)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train_step

    def _build_score_fn(self):

        @jax.jit
        def score_fn(params, tokens, mask):
            return self._forward_scores(params, tokens, mask)

        return score_fn

    # -- API ------------------------------------------------------------

    def train(self,
              examples: List[Example],
              epochs: int = 5,
              batch_size: int = 64,
              eval_frac: float = 0.1,
              log_every: int = 0) -> dict:
        split = int((1.0 - eval_frac) * len(examples))
        train_set, eval_set = examples[:split], examples[split:]
        history = {"loss": [], "tau": [], "acc": []}
        idx_rng = np.random.RandomState(0)

        for epoch in range(epochs):
            order = idx_rng.permutation(len(train_set))
            total_loss, steps = 0.0, 0
            for start in range(0, len(train_set), batch_size):
                batch = [train_set[i] for i in order[start:start +
                                                     batch_size]]
                if len(batch) < 2:
                    continue
                tokens, mask = _pad_batch(batch, self.config.max_length)
                labels = np.asarray([
                    len_to_label(e.generation_len, self.label_max_length,
                                 self.label_group_size) for e in batch
                ], np.int32)
                self.rng, key = jax.random.split(self.rng)
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, jnp.asarray(tokens),
                    jnp.asarray(mask), jnp.asarray(labels), key)
                total_loss += float(loss)
                steps += 1
                if log_every and steps % log_every == 0:
                    logger.info("epoch %d step %d loss %.4f", epoch + 1,
                                steps, float(loss))
            avg = total_loss / max(steps, 1)
            history["loss"].append(avg)
            tau, acc = self.evaluate(eval_set) if eval_set else (0.0, 0.0)
            history["tau"].append(tau)
            history["acc"].append(acc)
            logger.info("Epoch %d, Loss: %.4f, Kendall's Tau: %.4f, "
                        "acc: %.4f", epoch + 1, avg, tau, acc)
        return history

    def evaluate(self, examples: List[Example],
                 batch_size: int = 64) -> Tuple[float, float]:
        """Kendall's tau (and bucket accuracy for classification) on eval
        labels computed at group size 1 (reference RankingTestDataset)."""
        preds: List[float] = []
        true: List[int] = []
        buckets_pred: List[int] = []
        buckets_true: List[int] = []
        for start in range(0, len(examples), batch_size):
            batch = examples[start:start + batch_size]
            tokens, mask = _pad_batch(batch, self.config.max_length)
            out = np.asarray(
                self._score_fn(self.params, jnp.asarray(tokens),
                               jnp.asarray(mask)))
            if self.loss_name == "crossentropy":
                preds.extend(np.argmax(out, axis=1).tolist())
                buckets_pred.extend(np.argmax(out, axis=1).tolist())
            else:
                preds.extend(out[:, 0].tolist())
            true.extend(
                len_to_label(e.generation_len, self.label_max_length, 1)
                for e in batch)
            buckets_true.extend(
                len_to_label(e.generation_len, self.label_max_length,
                             self.label_group_size) for e in batch)
        tau = kendall_tau(preds, true)
        acc = (bucket_accuracy(buckets_pred, buckets_true)
               if buckets_pred else 0.0)
        return tau, acc

    def save(self, output_dir: str) -> str:
        """Save an HF checkpoint + usage_config.json (reference
        trainer.py:201-216). Returns the usage config path."""
        os.makedirs(output_dir, exist_ok=True)
        finetuned = os.path.join(output_dir, "finetuned")
        os.makedirs(finetuned, exist_ok=True)

        import torch
        from transformers import OPTForSequenceClassification as HFCls
        sd = OPTForSequenceClassification.params_to_torch(
            self.hf_config, self.params)
        hf_model = HFCls(self.hf_config)
        missing, unexpected = hf_model.load_state_dict(sd, strict=False)
        assert not unexpected, f"unexpected keys: {unexpected}"
        hf_model.half().save_pretrained(finetuned)

        usage = PrefillPredictorConfig(
            pred_model=finetuned,
            num_labels=self.num_labels,
            mtype=self.config.mtype,
            activation=self.config.activation,
            max_length=self.config.max_length,
            max_batch_size=self.config.max_batch_size)
        usage_path = os.path.join(output_dir, "usage_config.json")
        usage.to_json(usage_path)
        return usage_path


def main():
    parser = ArgumentParser("ltr-tpu predictor trainer")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--file", type=str, required=True)
    parser.add_argument("--job-dir", type=str, required=True)
    parser.add_argument("--run-id", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--epoch", type=int, default=5)
    parser.add_argument("--lr", type=float, default=2e-5)
    parser.add_argument("--wc", type=float, default=0.01)
    parser.add_argument("--loss", type=str, default="crossentropy")
    parser.add_argument("--label-max-length", type=int, default=8192)
    parser.add_argument("--label-group-size", type=int, default=1)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    config = PrefillPredictorConfig.from_json(args.config)
    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    examples = load_dataset(args.file, tokenizer)
    trainer = PredictorTrainer(config,
                               loss=args.loss,
                               lr=args.lr,
                               weight_decay=args.wc,
                               label_max_length=args.label_max_length,
                               label_group_size=args.label_group_size)
    trainer.train(examples,
                  epochs=args.epoch,
                  batch_size=args.batch_size)
    out_dir = os.path.join(args.job_dir, args.run_id)
    usage_path = trainer.save(out_dir)
    print("usage config:", usage_path)


if __name__ == "__main__":
    main()
