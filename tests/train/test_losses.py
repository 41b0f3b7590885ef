"""LTR loss tests: sanity properties + parity with the reference math where
it can be recomputed independently."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_ltr_tpu.train.losses import (PADDED_Y_VALUE, approxNDCG, bce,
                                       binary_listNet, lambdaLoss, listMLE,
                                       listNet, neuralNDCG, ordinal,
                                       pointwise_rmse, rankNet)


def test_listmle_perfect_vs_wrong_order():
    y_true = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    good = jnp.asarray([[5.0, 3.0, 1.0, -1.0]])
    bad = jnp.asarray([[-1.0, 1.0, 3.0, 5.0]])
    assert float(listMLE(good, y_true)) < float(listMLE(bad, y_true))


def test_listmle_matches_reference_formula():
    """Hand-computed Plackett-Luce NLL for a 3-item slate."""
    y_true = jnp.asarray([[2.0, 1.0, 0.0]])
    y_pred = jnp.asarray([[0.5, 0.2, -0.1]])
    s = np.array([0.5, 0.2, -0.1])
    expected = 0.0
    for i in range(3):
        expected += np.log(np.sum(np.exp(s[i:]))) - s[i]
    got = float(listMLE(y_pred, y_true))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_listmle_padding_ignored():
    y_true = jnp.asarray([[2.0, 1.0, PADDED_Y_VALUE]])
    y_pred = jnp.asarray([[0.5, 0.2, 99.0]])
    y_true2 = jnp.asarray([[2.0, 1.0]])
    y_pred2 = jnp.asarray([[0.5, 0.2]])
    np.testing.assert_allclose(float(listMLE(y_pred, y_true)),
                               float(listMLE(y_pred2, y_true2)), rtol=1e-5)


def test_listnet_and_binary_listnet():
    y_true = jnp.asarray([[2.0, 1.0, 0.0]])
    good = jnp.asarray([[5.0, 2.0, -3.0]])
    bad = jnp.asarray([[-3.0, 2.0, 5.0]])
    assert float(listNet(good, y_true)) < float(listNet(bad, y_true))
    yb = jnp.asarray([[1.0, 0.0, 1.0]])
    assert float(binary_listNet(jnp.asarray([[4.0, -4.0, 4.0]]), yb)) < \
        float(binary_listNet(jnp.asarray([[-4.0, 4.0, -4.0]]), yb))


def test_ranknet_ordering():
    y_true = jnp.asarray([[2.0, 1.0, 0.0]])
    good = jnp.asarray([[3.0, 1.0, -1.0]])
    bad = jnp.asarray([[-1.0, 1.0, 3.0]])
    assert float(rankNet(good, y_true)) < float(rankNet(bad, y_true))


@pytest.mark.parametrize("scheme", [
    "ndcgLoss1_scheme", "ndcgLoss2_scheme", "lambdaRank_scheme",
    "rankNet_scheme", "ndcgLoss2PP_scheme"
])
def test_lambda_loss_schemes(scheme):
    y_true = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    good = jnp.asarray([[4.0, 2.0, 0.5, -2.0]])
    bad = jnp.asarray([[-2.0, 0.5, 2.0, 4.0]])
    lg = float(lambdaLoss(good, y_true, weighing_scheme=scheme))
    lb = float(lambdaLoss(bad, y_true, weighing_scheme=scheme))
    assert lg < lb
    assert np.isfinite(lg) and np.isfinite(lb)


def test_approx_ndcg():
    y_true = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    good = jnp.asarray([[4.0, 2.0, 0.5, -2.0]])
    bad = jnp.asarray([[-2.0, 0.5, 2.0, 4.0]])
    assert float(approxNDCG(good, y_true)) < float(approxNDCG(bad, y_true))
    # Perfect order approaches -1.
    assert float(approxNDCG(good * 10, y_true)) == pytest.approx(-1.0,
                                                                 abs=0.05)


def test_neural_ndcg_deterministic():
    y_true = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    good = jnp.asarray([[4.0, 2.0, 0.5, -2.0]])
    bad = jnp.asarray([[-2.0, 0.5, 2.0, 4.0]])
    lg = float(neuralNDCG(good, y_true))
    lb = float(neuralNDCG(bad, y_true))
    assert lg < lb
    # With a sharp temperature, a perfect ranking approaches NDCG=1.
    sharp = float(neuralNDCG(good * 20, y_true, temperature=0.01))
    assert sharp == pytest.approx(-1.0, abs=0.05)


def test_neural_ndcg_padding():
    y_true = jnp.asarray([[3.0, 2.0, PADDED_Y_VALUE, PADDED_Y_VALUE]])
    y_pred = jnp.asarray([[2.0, 1.0, 50.0, -50.0]])
    out = float(neuralNDCG(y_pred, y_true))
    assert np.isfinite(out)


def test_neural_ndcg_stochastic():
    y_true = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    y_pred = jnp.asarray([[4.0, 2.0, 0.5, 0.1]])
    out = float(
        neuralNDCG(y_pred, y_true, stochastic=True, n_samples=8,
                   key=jax.random.PRNGKey(0)))
    assert np.isfinite(out)


def test_pointwise_bce_ordinal():
    y_true = jnp.asarray([[1.0, 0.0, PADDED_Y_VALUE]])
    y_pred = jnp.asarray([[0.9, 0.1, 0.5]])
    assert float(pointwise_rmse(y_pred, y_true)) < 0.2
    assert np.isfinite(float(bce(jnp.asarray([[2.0, -2.0, 0.0]]), y_true)))
    yo_pred = jnp.zeros((1, 2, 4))
    yo_true = jnp.asarray([[3, 1]])
    assert np.isfinite(float(ordinal(yo_pred, yo_true, n_ordinals=4)))


def test_losses_are_differentiable():
    y_true = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    y_pred = jnp.asarray([[0.4, 0.2, 0.1, -0.3]])
    for fn in (listMLE, listNet, rankNet, approxNDCG, lambdaLoss,
               neuralNDCG):
        g = jax.grad(lambda p: fn(p, y_true))(y_pred)
        assert np.isfinite(np.asarray(g)).all(), fn.__name__
        assert float(jnp.abs(g).sum()) > 0, fn.__name__
