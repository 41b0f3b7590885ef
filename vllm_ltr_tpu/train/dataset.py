"""LibSVM-style ranking datasets.

Behavioral counterpart of the reference's vendored allRank data layer
(train/allrank/data/dataset_loading.py:31-321): parse ``label qid:Q
idx:val ...`` rows, group rows by query id into slates, and fix every
slate to a common length — long slates are subsampled (keeping every
relevant item, reference FixLength._sample), short ones padded with zero
features, relevance PADDED_Y_VALUE and index PADDED_INDEX_VALUE.  Output
is plain numpy arrays shaped for ranker_forward (train/ranker.py), not a
torch Dataset/DataLoader.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from vllm_ltr_tpu.train.ranker import PADDED_Y_VALUE

PADDED_INDEX_VALUE = -1


def parse_svm_rank_file(path: str) -> Tuple[np.ndarray, np.ndarray,
                                            np.ndarray]:
    """Parse a ranking libsvm file into (X [n, d], y [n], qid [n]).

    Feature indices are 1-based in the file (sklearn convention); comments
    after ``#`` are ignored.
    """
    rows: List[dict] = []
    labels: List[float] = []
    qids: List[int] = []
    max_idx = 0
    with open(path) as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split()
            labels.append(float(parts[0]))
            feats = {}
            qid = 0
            for tok in parts[1:]:
                key, val = tok.split(":", 1)
                if key == "qid":
                    qid = int(val)
                else:
                    idx = int(key)
                    feats[idx] = float(val)
                    max_idx = max(max_idx, idx)
            qids.append(qid)
            rows.append(feats)
    X = np.zeros((len(rows), max_idx), dtype=np.float32)
    for i, feats in enumerate(rows):
        for idx, val in feats.items():
            X[i, idx - 1] = val
    return X, np.asarray(labels, np.float32), np.asarray(qids, np.int64)


@dataclass
class RankingDataset:
    """Per-query slates, fixed to a common length.

    X: [n_queries, slate, d]; y: [n_queries, slate] (PADDED_Y_VALUE marks
    padding); indices: [n_queries, slate] original in-slate positions
    (PADDED_INDEX_VALUE for padding) — the positional-encoding input of
    the ranker.
    """
    X: np.ndarray
    y: np.ndarray
    indices: np.ndarray

    @property
    def shape(self) -> Tuple[int, int, int]:
        return self.X.shape

    def __len__(self) -> int:
        return self.X.shape[0]

    def mask(self) -> np.ndarray:
        return (self.y != PADDED_Y_VALUE).astype(np.float32)

    def batches(self, batch_size: int, shuffle: bool = False,
                seed: Optional[int] = None
                ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (X, y, indices) minibatches over the query axis."""
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for lo in range(0, len(order), batch_size):
            pick = order[lo:lo + batch_size]
            yield self.X[pick], self.y[pick], self.indices[pick]


def _fit_slate(X: np.ndarray, y: np.ndarray, slate_length: int,
               rng: np.random.RandomState
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = len(y)
    if n > slate_length:
        # Keep every relevant document, fill the remainder with a random
        # sample of the irrelevant ones (reference FixLength._sample).
        relevant = np.flatnonzero(y > 0)
        rest = np.flatnonzero(y <= 0)
        if len(relevant) >= slate_length:
            keep = relevant[:slate_length]
        else:
            extra = rng.choice(rest, size=slate_length - len(relevant),
                               replace=False)
            keep = np.concatenate([relevant, extra])
        keep.sort()
        return X[keep], y[keep], keep.astype(np.int64)
    pad = slate_length - n
    Xp = np.pad(X, ((0, pad), (0, 0)))
    yp = np.pad(y, (0, pad), constant_values=PADDED_Y_VALUE)
    idx = np.pad(np.arange(n, dtype=np.int64), (0, pad),
                 constant_values=PADDED_INDEX_VALUE)
    return Xp, yp, idx


def group_into_slates(X: np.ndarray, y: np.ndarray, qids: np.ndarray,
                      slate_length: Optional[int] = None,
                      seed: int = 0) -> RankingDataset:
    """Group flat rows by query id into a fixed-length slate tensor.

    slate_length=None fits to the longest slate (reference
    fix_length_to_longest_slate).
    """
    rng = np.random.RandomState(seed)
    order = np.argsort(qids, kind="stable")
    X, y, qids = X[order], y[order], qids[order]
    bounds = np.flatnonzero(np.diff(qids)) + 1
    groups = np.split(np.arange(len(qids)), bounds)
    if slate_length is None:
        slate_length = max(len(g) for g in groups)
    slates = [_fit_slate(X[g], y[g], slate_length, rng) for g in groups]
    return RankingDataset(
        X=np.stack([s[0] for s in slates]),
        y=np.stack([s[1] for s in slates]),
        indices=np.stack([s[2] for s in slates]))


def load_libsvm_dataset(train_path: str,
                        val_path: str,
                        slate_length: int,
                        seed: int = 0
                        ) -> Tuple[RankingDataset, RankingDataset]:
    """Load train+validation ranking datasets from libsvm files
    (reference load_libsvm_dataset / load_libsvm_dataset_role)."""
    train = group_into_slates(*parse_svm_rank_file(train_path),
                              slate_length=slate_length, seed=seed)
    val = group_into_slates(*parse_svm_rank_file(val_path),
                            slate_length=slate_length, seed=seed)
    return train, val
