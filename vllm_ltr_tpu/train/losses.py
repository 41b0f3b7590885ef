"""Learning-to-rank losses in JAX.

Behavioral counterpart of the vendored allRank loss library
(reference ``train/allrank/models/losses/``: listMLE, neuralNDCG,
lambdaLoss, approxNDCG, listNet, rankNet, ordinal, pointwise, bce,
binary_listNet). All functions take ``y_pred``/``y_true`` of shape
[batch, slate] with padded entries marked by ``PADDED_Y_VALUE`` and are
jit/grad-compatible.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

PADDED_Y_VALUE = -1
DEFAULT_EPS = 1e-10
NEG_INF = -1e30


def _pad_mask(y_true):
    return y_true == PADDED_Y_VALUE


def listMLE(y_pred, y_true, key: Optional[jax.Array] = None,
            eps: float = DEFAULT_EPS):
    """ListMLE ("Listwise Approach to Learning to Rank", reference
    listMLE.py:23): negative log-likelihood of the true permutation under
    the Plackett-Luce model. ``key`` randomizes tie resolution (the
    reference shuffles the slate)."""
    B, N = y_pred.shape
    if key is not None:
        perm = jax.random.permutation(key, N)
        y_pred = y_pred[:, perm]
        y_true = y_true[:, perm]

    order = jnp.argsort(-y_true, axis=1, stable=True)
    y_true_sorted = jnp.take_along_axis(y_true, order, axis=1)
    mask = y_true_sorted == PADDED_Y_VALUE
    preds = jnp.take_along_axis(y_pred, order, axis=1)
    preds = jnp.where(mask, NEG_INF, preds)

    preds_max = jnp.max(preds, axis=1, keepdims=True)
    preds_shift = preds - preds_max
    # cumsum of exp from the end (suffix sums).
    suffix = jnp.cumsum(jnp.exp(preds_shift)[:, ::-1], axis=1)[:, ::-1]
    obs_loss = jnp.log(suffix + eps) - preds_shift
    obs_loss = jnp.where(mask, 0.0, obs_loss)
    return jnp.mean(jnp.sum(obs_loss, axis=1))


def listNet(y_pred, y_true, eps: float = DEFAULT_EPS):
    """ListNet (top-1 distribution cross-entropy, reference listNet.py)."""
    mask = _pad_mask(y_true)
    y_pred = jnp.where(mask, NEG_INF, y_pred)
    y_true = jnp.where(mask, NEG_INF, y_true.astype(jnp.float32))
    preds_smax = jax.nn.softmax(y_pred, axis=1)
    true_smax = jax.nn.softmax(y_true, axis=1)
    preds_log = jnp.log(preds_smax + eps)
    return jnp.mean(-jnp.sum(true_smax * preds_log, axis=1))


def binary_listNet(y_pred, y_true, eps: float = DEFAULT_EPS):
    """Binary ListNet variant (reference binary_listNet.py): the target
    distribution is the normalized binary relevance vector."""
    mask = _pad_mask(y_true)
    y_pred = jnp.where(mask, NEG_INF, y_pred)
    y_true = jnp.where(mask, 0.0, y_true.astype(jnp.float32))
    normalizer = jnp.sum(y_true, axis=-1, keepdims=True)
    normalizer = jnp.where(normalizer == 0.0, 1.0, normalizer)
    true_smax = y_true / normalizer
    preds_smax = jax.nn.softmax(y_pred, axis=1)
    preds_log = jnp.log(preds_smax + eps)
    return jnp.mean(-jnp.sum(true_smax * preds_log, axis=1))


def rankNet(y_pred, y_true, weight_by_diff: bool = False,
            weight_by_diff_powed: bool = False):
    """RankNet pairwise loss (reference rankNet.py): BCE on score
    differences over all pairs with different relevance."""
    mask = _pad_mask(y_true)
    y_pred = jnp.where(mask, NEG_INF, y_pred)
    y_true = jnp.where(mask, NEG_INF, y_true.astype(jnp.float32))

    diff_true = y_true[:, :, None] - y_true[:, None, :]
    diff_pred = y_pred[:, :, None] - y_pred[:, None, :]
    valid = (y_true[:, :, None] > NEG_INF / 2) & (y_true[:, None, :] >
                                                  NEG_INF / 2)
    pairs = (diff_true > 0) & valid

    weight = jnp.ones_like(diff_pred)
    if weight_by_diff:
        weight = jnp.abs(diff_true)
    elif weight_by_diff_powed:
        weight = jnp.abs(y_true[:, :, None]**2 - y_true[:, None, :]**2)

    # BCE with target 1 on pred differences.
    losses = jax.nn.softplus(-diff_pred) * weight
    losses = jnp.where(pairs, losses, 0.0)
    num_pairs = jnp.maximum(jnp.sum(pairs), 1)
    return jnp.sum(losses) / num_pairs


def _dcg_gains(y_true):
    return jnp.power(2.0, y_true) - 1.0


def _ideal_dcg(y_true, mask, k=None):
    gains = jnp.where(mask, 0.0, _dcg_gains(y_true))
    sorted_gains = -jnp.sort(-gains, axis=1)
    N = y_true.shape[1]
    discounts = 1.0 / jnp.log2(jnp.arange(N, dtype=jnp.float32) + 2.0)
    if k is not None:
        discounts = jnp.where(jnp.arange(N) < k, discounts, 0.0)
    return jnp.sum(sorted_gains * discounts, axis=1)


def approxNDCG(y_pred, y_true, eps: float = DEFAULT_EPS,
               alpha: float = 1.0):
    """ApproxNDCG ("A General Approximation Framework...", reference
    approxNDCG.py): smooth ranks via sigmoids of pairwise differences."""
    mask = _pad_mask(y_true)
    y_pred = jnp.where(mask, NEG_INF, y_pred)
    yt = jnp.where(mask, 0.0, y_true.astype(jnp.float32))

    # diff[b, i, j] = s_j - s_i; approx rank_i = 1 + sum_{j != i}
    # sigmoid(alpha * (s_j - s_i)); the j == i term contributes
    # sigmoid(0) = 0.5, subtracted below.
    diff = y_pred[:, None, :] - y_pred[:, :, None]
    approx_rank = 0.5 + jnp.sum(
        jnp.where((~mask)[:, None, :] & (~mask)[:, :, None],
                  jax.nn.sigmoid(alpha * diff), 0.0),
        axis=-1)

    gains = jnp.where(mask, 0.0, _dcg_gains(yt))
    dcg = jnp.sum(gains / jnp.log2(approx_rank + 1.0), axis=1)
    idcg = jnp.maximum(_ideal_dcg(yt, mask), eps)
    return -jnp.mean(dcg / idcg)


def lambdaLoss(y_pred, y_true, weighing_scheme: str = "ndcgLoss2_scheme",
               k: Optional[int] = None, sigma: float = 1.0,
               mu: float = 10.0, eps: float = DEFAULT_EPS,
               reduction: str = "sum"):
    """LambdaLoss framework ("The LambdaLoss Framework for Ranking Metric
    Optimization", reference lambdaLoss.py). Schemes: ndcgLoss1_scheme,
    ndcgLoss2_scheme, lambdaRank_scheme, rankNet_scheme,
    ndcgLoss2PP_scheme."""
    mask = _pad_mask(y_true)
    y_pred = jnp.where(mask, NEG_INF, y_pred)
    yt = jnp.where(mask, 0.0, y_true.astype(jnp.float32))
    B, N = y_pred.shape

    order = jnp.argsort(-y_pred, axis=1)
    yt_sorted = jnp.take_along_axis(yt, order, axis=1)
    pred_sorted = jnp.take_along_axis(y_pred, order, axis=1)
    mask_sorted = jnp.take_along_axis(mask, order, axis=1)

    pos = jnp.arange(N, dtype=jnp.float32) + 1.0
    D = 1.0 / jnp.log2(pos + 1.0)
    maxdcg = jnp.maximum(_ideal_dcg(yt, mask, k), eps)
    G = _dcg_gains(yt_sorted) / maxdcg[:, None]

    true_diffs = yt_sorted[:, :, None] - yt_sorted[:, None, :]
    pred_diffs = pred_sorted[:, :, None] - pred_sorted[:, None, :]
    pair_valid = (~mask_sorted[:, :, None]) & (~mask_sorted[:, None, :])
    padded_pairs = (true_diffs > 0) & pair_valid

    if k is None:
        k = N
    ndcg_at_k_mask = (jnp.arange(N)[:, None] < k) | (jnp.arange(N)[None, :] <
                                                     k)

    if weighing_scheme == "ndcgLoss1_scheme":
        weights = jnp.abs(G[:, :, None] * D[None, :, None])
    elif weighing_scheme == "ndcgLoss2_scheme":
        idx = jnp.arange(N, dtype=jnp.float32) + 1.0
        delta_idxs = jnp.abs(idx[:, None] - idx[None, :])
        deltas = jnp.abs(
            jnp.power(jnp.abs(D[None, :, None] - D[None, None, :]), 1.0) *
            jnp.abs(G[:, :, None] - G[:, None, :]))
        weights = deltas
    elif weighing_scheme == "lambdaRank_scheme":
        weights = jnp.abs(
            (D[None, :, None] - D[None, None, :]) *
            (G[:, :, None] - G[:, None, :]))
    elif weighing_scheme == "ndcgLoss2PP_scheme":
        idx = jnp.arange(N, dtype=jnp.float32) + 1.0
        deltas2 = jnp.abs(
            jnp.abs(D[None, :, None] - D[None, None, :]) *
            jnp.abs(G[:, :, None] - G[:, None, :]))
        lamb = jnp.abs((D[None, :, None] - D[None, None, :]) *
                       (G[:, :, None] - G[:, None, :]))
        weights = mu * deltas2 + lamb
    elif weighing_scheme == "rankNet_scheme":
        weights = 1.0
    else:
        raise ValueError(f"Unknown weighing scheme {weighing_scheme!r}")

    scores_diffs = jnp.clip(sigma * pred_diffs, -50.0, 50.0)
    losses = jax.nn.softplus(-scores_diffs) * weights
    losses = jnp.where(padded_pairs & ndcg_at_k_mask[None], losses, 0.0)
    if reduction == "sum":
        return jnp.sum(losses) / B
    return jnp.mean(losses)


def pointwise_rmse(y_pred, y_true, no_of_levels: Optional[float] = None):
    """Pointwise RMSE (reference pointwise.py); y_pred optionally scaled by
    the number of relevance levels."""
    mask = _pad_mask(y_true)
    yt = jnp.where(mask, 0.0, y_true.astype(jnp.float32))
    yp = y_pred
    if no_of_levels is not None:
        yp = yp * no_of_levels
    errors = jnp.where(mask, 0.0, (yt - yp)**2)
    valid = jnp.maximum(jnp.sum(~mask, axis=1), 1)
    return jnp.mean(jnp.sqrt(jnp.sum(errors, axis=1) / valid))


def bce(y_pred, y_true):
    """Elementwise binary cross-entropy (reference bce.py)."""
    mask = _pad_mask(y_true)
    yt = jnp.where(mask, 0.0, y_true.astype(jnp.float32))
    ls = jax.nn.softplus(y_pred) - yt * y_pred  # BCE-with-logits
    ls = jnp.where(mask, 0.0, ls)
    valid = jnp.maximum(jnp.sum(~mask, axis=1), 1)
    return jnp.mean(jnp.sum(ls, axis=1) / valid)


def ordinal(y_pred, y_true, n_ordinals: int):
    """Ordinal regression with cumulative targets (reference ordinal.py):
    y_pred [B, N, n_ordinals] threshold logits; y_true [B, N] levels."""
    mask = _pad_mask(y_true)
    yt = jnp.where(mask, 0, y_true).astype(jnp.int32)
    levels = jnp.arange(n_ordinals)[None, None, :] < yt[:, :, None]
    levels = levels.astype(jnp.float32)
    ls = jax.nn.softplus(y_pred) - levels * y_pred
    ls = jnp.where(mask[:, :, None], 0.0, ls)
    valid = jnp.maximum(jnp.sum(~mask), 1)
    return jnp.sum(ls) / valid / n_ordinals


# ---------------------------------------------------------------------------
# NeuralNDCG (reference neuralNDCG.py + loss_utils.py)
# ---------------------------------------------------------------------------


def sinkhorn_scaling(mat, mask=None, tol: float = 1e-6, max_iter: int = 50):
    """Iterative row/column normalization to a doubly stochastic matrix."""
    if mask is not None:
        pad_rc = mask[:, None, :] | mask[:, :, None]
        both = mask[:, None, :] & mask[:, :, None]
        mat = jnp.where(pad_rc, 0.0, mat)
        mat = jnp.where(both, 1.0, mat)

    def body(_, m):
        m = m / jnp.clip(jnp.sum(m, axis=1, keepdims=True), DEFAULT_EPS)
        m = m / jnp.clip(jnp.sum(m, axis=2, keepdims=True), DEFAULT_EPS)
        return m

    mat = jax.lax.fori_loop(0, max_iter, body, mat)
    if mask is not None:
        mat = jnp.where(mask[:, None, :] | mask[:, :, None], 0.0, mat)
    return mat


def deterministic_neural_sort(s, tau: float, mask):
    """NeuralSort relaxation ("Stochastic Optimization of Sorting Networks
    via Continuous Relaxations", ICLR 2019), with padding handling as in the
    reference loss_utils.py:51-83. s: [B, N, 1]."""
    B, N, _ = s.shape
    s = jnp.where(mask[:, :, None], -1e8, s)
    A_s = jnp.abs(s - jnp.transpose(s, (0, 2, 1)))
    A_s = jnp.where(mask[:, :, None] | mask[:, None, :], 0.0, A_s)
    B_mat = jnp.sum(A_s, axis=2, keepdims=True) * jnp.ones((1, 1, N))

    # Per-row scaling over the real (unpadded) slate length n_real:
    # scaling[j] = n_real + 1 - 2*(j+1) for j < n_real else 0.
    n_real = jnp.sum(~mask, axis=1)  # [B]
    j = jnp.arange(N, dtype=jnp.float32)[None, :]
    scaling = n_real[:, None].astype(jnp.float32) + 1.0 - 2.0 * (j + 1.0)
    scaling = jnp.where(j < n_real[:, None], scaling, 0.0)

    s0 = jnp.where(mask[:, :, None], 0.0, s)
    C = s0 * scaling[:, None, :]  # [B, N, 1] * [B, 1, N] -> [B, N, N]

    P_max = jnp.transpose(C - B_mat, (0, 2, 1))
    pad_rc = mask[:, :, None] | mask[:, None, :]
    both = mask[:, :, None] & mask[:, None, :]
    P_max = jnp.where(pad_rc, -jnp.inf, P_max)
    P_max = jnp.where(both, 1.0, P_max)
    return jax.nn.softmax(P_max / tau, axis=-1)


def neuralNDCG(y_pred, y_true, temperature: float = 1.0,
               powered_relevancies: bool = True, k: Optional[int] = None,
               stochastic: bool = False, n_samples: int = 32,
               beta: float = 0.1, log_scores: bool = True,
               key: Optional[jax.Array] = None):
    """NeuralNDCG (arXiv 2102.07831; reference neuralNDCG.py:28-79)."""
    B, N = y_pred.shape
    if k is None:
        k = N
    mask = _pad_mask(y_true)

    if stochastic:
        assert key is not None, "stochastic neuralNDCG needs a PRNG key"
        s = y_pred[:, :, None]
        s_positive = s + jnp.abs(jnp.min(s))
        u = jax.random.uniform(key, (n_samples, B, N, 1), minval=1e-10,
                               maxval=1.0)
        gumbel = beta * (-jnp.log(-jnp.log(u)))
        if log_scores:
            s_pert = jnp.log(s_positive + 1e-10) + gumbel
        else:
            s_pert = s_positive + gumbel
        P_hat = jax.vmap(lambda sp: deterministic_neural_sort(
            sp, temperature, mask))(s_pert)
    else:
        P_hat = deterministic_neural_sort(y_pred[:, :, None], temperature,
                                          mask)[None]

    S = P_hat.shape[0]
    P_flat = P_hat.reshape(S * B, N, N)
    mask_rep = jnp.repeat(mask, S, axis=0) if S > 1 else mask
    mask_flat = jnp.tile(mask, (S, 1))
    P_flat = sinkhorn_scaling(P_flat, mask_flat)
    P_hat = P_flat.reshape(S, B, N, N)

    pad_rc = mask[None, :, :, None] | mask[None, :, None, :]
    P_hat = jnp.where(pad_rc, 0.0, P_hat)
    yt = jnp.where(mask, 0.0, y_true.astype(jnp.float32))
    if powered_relevancies:
        yt = jnp.power(2.0, yt) - 1.0
    ground_truth = jnp.einsum("sbij,bj->sbi", P_hat, yt)

    discounts = 1.0 / jnp.log2(jnp.arange(N, dtype=jnp.float32) + 2.0)
    discounted = ground_truth * discounts[None, None, :]
    dcg = jnp.sum(discounted[:, :, :k], axis=-1)

    idcg_gains = -jnp.sort(-yt, axis=1)
    idcg = jnp.sum(idcg_gains[:, :k] * discounts[:k][None, :], axis=1)
    ndcg = dcg / jnp.where(idcg == 0.0, 1.0, idcg)[None, :]
    ndcg = jnp.where(idcg[None, :] == 0.0, 0.0, ndcg)
    return -jnp.mean(ndcg)


LOSS_REGISTRY = {
    "listMLE": listMLE,
    "listNet": listNet,
    "binary_listNet": binary_listNet,
    "rankNet": rankNet,
    "approxNDCG": approxNDCG,
    "lambdaLoss": lambdaLoss,
    "neuralNDCG": neuralNDCG,
    "pointwise_rmse": pointwise_rmse,
    "bce": bce,
    "ordinal": ordinal,
}
