"""Ranking metrics: NDCG, DCG, MRR, Kendall's tau, bucket accuracy.

Counterpart of reference ``train/allrank/models/metrics.py`` (+ the
trainer's scipy.stats.kendalltau eval, trainer.py:195-196).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

PADDED_Y_VALUE = -1


def _pow2_gain(x):
    return np.power(2.0, x) - 1.0


def dcg(y_pred, y_true, ats: Optional[Sequence[int]] = None,
        gain_function: Callable = _pow2_gain,
        padding_indicator: int = PADDED_Y_VALUE) -> np.ndarray:
    """DCG at ranks `ats`; inputs [batch, slate]."""
    y_pred = np.asarray(y_pred, dtype=np.float64)
    y_true = np.asarray(y_true, dtype=np.float64)
    B, N = y_pred.shape
    if ats is None:
        ats = [N]
    mask = y_true == padding_indicator
    y_pred = np.where(mask, -np.inf, y_pred)
    yt = np.where(mask, 0.0, y_true)

    order = np.argsort(-y_pred, axis=1, kind="stable")
    true_sorted = np.take_along_axis(yt, order, axis=1)
    gains = gain_function(true_sorted)
    discounts = 1.0 / np.log2(np.arange(N, dtype=np.float64) + 2.0)
    discounted = gains * discounts[None, :]
    out = np.zeros((B, len(ats)))
    for i, at in enumerate(ats):
        out[:, i] = discounted[:, :min(at, N)].sum(axis=1)
    return out


def ndcg(y_pred, y_true, ats: Optional[Sequence[int]] = None,
         gain_function: Callable = _pow2_gain,
         padding_indicator: int = PADDED_Y_VALUE,
         filler_value: float = 1.0) -> np.ndarray:
    actual = dcg(y_pred, y_true, ats, gain_function, padding_indicator)
    ideal = dcg(y_true, y_true, ats, gain_function, padding_indicator)
    out = np.where(ideal == 0.0, filler_value, actual /
                   np.where(ideal == 0.0, 1.0, ideal))
    return out


def mrr(y_pred, y_true, ats: Optional[Sequence[int]] = None,
        padding_indicator: int = PADDED_Y_VALUE) -> np.ndarray:
    """Mean reciprocal rank of the first relevant (>0) item."""
    y_pred = np.asarray(y_pred, dtype=np.float64)
    y_true = np.asarray(y_true, dtype=np.float64)
    B, N = y_pred.shape
    if ats is None:
        ats = [N]
    mask = y_true == padding_indicator
    y_pred = np.where(mask, -np.inf, y_pred)
    order = np.argsort(-y_pred, axis=1, kind="stable")
    true_sorted = np.take_along_axis(np.where(mask, 0.0, y_true), order,
                                     axis=1)
    out = np.zeros((B, len(ats)))
    for i, at in enumerate(ats):
        window = true_sorted[:, :min(at, N)] > 0
        first = np.argmax(window, axis=1)
        has = window.any(axis=1)
        out[:, i] = np.where(has, 1.0 / (first + 1.0), 0.0)
    return out


def kendall_tau(y_pred, y_true) -> float:
    """Kendall's tau-b between predicted scores and labels (the trainer's
    eval metric, reference trainer.py:195-196)."""
    from scipy.stats import kendalltau as _kt
    tau, _ = _kt(np.asarray(y_pred), np.asarray(y_true))
    return float(tau) if tau == tau else 0.0


def bucket_accuracy(y_pred_buckets, y_true_buckets) -> float:
    a = np.asarray(y_pred_buckets)
    b = np.asarray(y_true_buckets)
    return float((a == b).sum() / max(len(a), 1))
