"""Click simulators for counterfactual LTR experiments.

Behavioral counterpart of the reference's vendored allRank click models
(train/allrank/click_models/base.py:25-162, cascade_models.py:28-106,
duplicate_aware.py, click_utils.py): given a ranked slate of documents
(feature matrix X and relevance vector y), each model returns a 0/1 click
mask; padded slots (y == PADDED_Y_VALUE) are reported as -1 by
``simulate_clicks``.  These run on the host (numpy) — they model user
behavior between serving runs, not device compute.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from vllm_ltr_tpu.train.ranker import PADDED_Y_VALUE

Slate = Tuple[np.ndarray, np.ndarray]  # (X [n, d], y [n])


class ClickModel:
    """Contract: ``click((X, y)) -> 0/1 mask over the slate items``."""

    def click(self, documents: Slate) -> np.ndarray:
        raise NotImplementedError

    def __call__(self, documents: Slate) -> np.ndarray:
        return self.click(documents)


class RandomClickModel(ClickModel):
    """Clicks ``n_clicks`` uniformly random distinct positions."""

    def __init__(self, n_clicks: int, seed: Optional[int] = None):
        self.n_clicks = n_clicks
        self._rng = np.random.RandomState(seed)

    def click(self, documents: Slate) -> np.ndarray:
        _, y = documents
        n = len(y)
        picked = self._rng.choice(n, size=min(self.n_clicks, n),
                                  replace=False)
        out = np.zeros(n, dtype=np.int64)
        out[picked] = 1
        return out


class FixedClickModel(ClickModel):
    """Clicks a fixed set of positions."""

    def __init__(self, click_positions: Sequence[int]):
        self.click_positions = list(click_positions)

    def click(self, documents: Slate) -> np.ndarray:
        _, y = documents
        out = np.zeros(len(y), dtype=np.int64)
        out[self.click_positions] = 1
        return out


class OnlyRelevantClickModel(ClickModel):
    """Clicks every item whose relevance >= threshold."""

    def __init__(self, relevancy_threshold: float):
        self.relevancy_threshold = relevancy_threshold

    def click(self, documents: Slate) -> np.ndarray:
        _, y = documents
        return (np.asarray(y) >= self.relevancy_threshold).astype(np.int64)


class MultipleClickModel(ClickModel):
    """Delegates each slate to one of several models, drawn by probability."""

    def __init__(self, inner: Sequence[ClickModel],
                 probabilities: Sequence[float],
                 seed: Optional[int] = None):
        if not np.isclose(np.sum(probabilities), 1.0, atol=1e-5):
            raise ValueError(
                f"probabilities must sum to 1, got {list(probabilities)}")
        self.inner = list(inner)
        self._cum = np.cumsum(probabilities)
        self._rng = np.random.RandomState(seed)

    def click(self, documents: Slate) -> np.ndarray:
        pick = int(np.argmax(self._rng.rand() < self._cum))
        return self.inner[pick].click(documents)


class ConditionedClickModel(ClickModel):
    """Combines several models' click masks with a reducer (np.all/np.any)."""

    def __init__(self, inner: Sequence[ClickModel], combiner: Callable):
        self.inner = list(inner)
        self.combiner = combiner

    def click(self, documents: Slate) -> np.ndarray:
        stacked = [m.click(documents) for m in self.inner]
        return np.asarray(self.combiner(stacked, 0)).astype(np.int64)


class MaxClicksModel(ClickModel):
    """Keeps only the first ``max_clicks`` clicks of a delegate model."""

    def __init__(self, inner: ClickModel, max_clicks: Optional[int]):
        self.inner = inner
        self.max_clicks = max_clicks

    def click(self, documents: Slate) -> np.ndarray:
        clicks = self.inner.click(documents)
        if self.max_clicks is None:
            return clicks
        return clicks * (clicks.cumsum() <= self.max_clicks)


class CascadeClickModel(ClickModel):
    """Position-decayed observation followed by a relevance gate: item at
    rank r (1-based) is observed with probability (1/r)**eta, and an
    observed item is clicked iff relevance >= threshold (reference
    cascade_models.py BaseCascadeModel)."""

    def __init__(self, eta: float, threshold: float,
                 seed: Optional[int] = None):
        self.eta = eta
        self.threshold = threshold
        self._rng = np.random.RandomState(seed)

    def click(self, documents: Slate) -> np.ndarray:
        _, y = documents
        y = np.asarray(y, dtype=np.float64)
        ranks = np.arange(1, len(y) + 1, dtype=np.float64)
        observed = (1.0 / ranks**self.eta) >= self._rng.rand(len(y))
        return ((y * observed) >= self.threshold).astype(np.int64)


class NoDuplicateClickModel(ClickModel):
    """Clicks everything except near-duplicates of an earlier item:
    an item is skipped when its euclidean distance to any previously kept
    item is <= margin (reference duplicate_aware.py)."""

    def __init__(self, duplicate_margin: float):
        self.duplicate_margin = duplicate_margin

    def click(self, documents: Slate) -> np.ndarray:
        X, y = documents
        X = np.asarray(X, dtype=np.float64)
        kept: List[np.ndarray] = []
        out = np.zeros(len(y), dtype=np.int64)
        for i in range(len(y)):
            d = min((float(np.linalg.norm(X[i] - k)) for k in kept),
                    default=np.inf)
            if d > self.duplicate_margin:
                kept.append(X[i])
                out[i] = 1
        return out


class DiverseClicksModel(ClickModel):
    """The Seq2Slate 'diverse clicks' model (arXiv 1810.02019, reference
    cascade_models.py DiverseClicksModel): accept a delegate's click only
    if the item is farther than the q-th percentile of pairwise distances
    from every previously accepted click."""

    def __init__(self, inner: ClickModel, q_percentile: float = 0.5):
        self.inner = inner
        self.q_percentile = q_percentile

    def click(self, documents: Slate) -> np.ndarray:
        X, y = documents
        X = np.asarray(X, dtype=np.float64)
        real = np.asarray(y) != PADDED_Y_VALUE
        rX = X[real]
        if len(rX) >= 2:
            diff = rX[:, None, :] - rX[None, :, :]
            dist = np.sqrt((diff**2).sum(-1))
            margin = float(np.quantile(dist[np.triu_indices(len(rX), 1)],
                                       self.q_percentile))
        else:
            margin = 0.0
        clicks = self.inner.click(documents).copy()
        kept: List[np.ndarray] = []
        for i in np.flatnonzero(clicks == 1):
            d = min((float(np.linalg.norm(X[i] - k)) for k in kept),
                    default=np.inf)
            if d > margin:
                kept.append(X[i])
            else:
                clicks[i] = 0
        return clicks


def simulate_clicks(X: np.ndarray, y: np.ndarray, scores: np.ndarray,
                    click_model: ClickModel) -> np.ndarray:
    """Rank each slate by descending score, apply the click model, and
    return click labels in the ORIGINAL item order (-1 for padded slots) —
    the rank-and-click loop of reference click_utils.py/rank_and_click.py.

    X: [B, slate, d]; y, scores: [B, slate].
    """
    B, S = y.shape
    out = np.full((B, S), -1, dtype=np.int64)
    for b in range(B):
        real = np.flatnonzero(y[b] != PADDED_Y_VALUE)
        order = real[np.argsort(-scores[b, real], kind="stable")]
        clicks = click_model.click((X[b, order], y[b, order]))
        out[b, order] = clicks
    return out
