"""Slate ranker + click models + libsvm loading (the allRank-equivalent
feature-vector LTR stack: train/ranker.py, click_models.py, dataset.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vllm_ltr_tpu.train import losses
from vllm_ltr_tpu.train.click_models import (CascadeClickModel,
                                             ConditionedClickModel,
                                             DiverseClicksModel,
                                             FixedClickModel, MaxClicksModel,
                                             MultipleClickModel,
                                             NoDuplicateClickModel,
                                             OnlyRelevantClickModel,
                                             RandomClickModel,
                                             simulate_clicks)
from vllm_ltr_tpu.train.dataset import (PADDED_INDEX_VALUE, RankingDataset,
                                        group_into_slates,
                                        load_libsvm_dataset,
                                        parse_svm_rank_file)
from vllm_ltr_tpu.train.metrics import ndcg
from vllm_ltr_tpu.train.ranker import (PADDED_Y_VALUE, init_ranker,
                                       ranker_forward, ranker_score)


def synthetic_slates(B=16, S=12, D=8, seed=0):
    """Relevance is a linear function of the features -> learnable."""
    rng = np.random.RandomState(seed)
    w = rng.normal(size=(D,))
    X = rng.normal(size=(B, S, D)).astype(np.float32)
    y = (X @ w > 0.5).astype(np.float32) + (X @ w > 1.5)
    mask = np.ones((B, S), np.float32)
    # Pad a ragged tail.
    for b in range(B):
        n = rng.randint(S // 2, S + 1)
        y[b, n:] = PADDED_Y_VALUE
        mask[b, n:] = 0.0
    return X, y.astype(np.float32), mask


def test_ranker_shapes_and_padding_invariance():
    params, cfg = init_ranker(jax.random.PRNGKey(0), n_features=8,
                              fc_sizes=(16,), n_encoder_layers=1, n_heads=2,
                              d_ff=32)
    X, y, mask = synthetic_slates()
    scores = ranker_score(params, cfg, jnp.asarray(X), jnp.asarray(mask))
    assert scores.shape == (16, 12)
    # Changing a padded item's features must not change real items' scores
    # (the attention mask isolates them).
    X2 = X.copy()
    X2[mask == 0] = 99.0
    scores2 = ranker_score(params, cfg, jnp.asarray(X2), jnp.asarray(mask))
    np.testing.assert_allclose(np.where(mask > 0, scores, 0),
                               np.where(mask > 0, scores2, 0),
                               rtol=1e-4, atol=1e-5)


def test_ranker_d_output_sum_scoring():
    params, cfg = init_ranker(jax.random.PRNGKey(1), n_features=4,
                              fc_sizes=(8,), n_encoder_layers=0, d_output=3)
    X = jnp.ones((2, 5, 4))
    mask = jnp.ones((2, 5))
    out = ranker_forward(params, cfg, X, mask)
    assert out.shape == (2, 5, 3)
    np.testing.assert_allclose(ranker_score(params, cfg, X, mask),
                               out.sum(-1), rtol=1e-6)


def test_ranker_trains_with_listmle():
    X, y, mask = synthetic_slates(B=32, S=10, D=6, seed=3)
    params, cfg = init_ranker(jax.random.PRNGKey(2), n_features=6,
                              fc_sizes=(32,), n_encoder_layers=1, n_heads=2,
                              d_ff=64)
    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        def loss_fn(p):
            s = ranker_score(p, cfg, X, mask)
            return losses.listMLE(s, jnp.asarray(y), key=key)
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, state2 = opt.update(g, state)
        return optax.apply_updates(params, updates), state2, loss

    def mean_ndcg(p):
        s = ranker_score(p, cfg, X, mask)
        return float(ndcg(s, jnp.asarray(y), ats=(5,)).mean())

    before = mean_ndcg(params)
    key = jax.random.PRNGKey(0)
    for i in range(60):
        params, state, loss = step(params, state, jax.random.fold_in(key, i))
    after = mean_ndcg(params)
    assert after > before + 0.05, (before, after)


# ---------------------------------------------------------------------------
# Click models
# ---------------------------------------------------------------------------


def docs(y, d=3, seed=0):
    y = np.asarray(y, np.float32)
    X = np.random.RandomState(seed).normal(size=(len(y), d))
    return X, y


def test_basic_click_models():
    X, y = docs([0, 2, 1, 0, 3])
    assert RandomClickModel(2, seed=0).click((X, y)).sum() == 2
    np.testing.assert_array_equal(
        FixedClickModel([0, 3]).click((X, y)), [1, 0, 0, 1, 0])
    np.testing.assert_array_equal(
        OnlyRelevantClickModel(2).click((X, y)), [0, 1, 0, 0, 1])


def test_combinator_click_models():
    X, y = docs([3, 3, 0, 3])
    relevant = OnlyRelevantClickModel(2)
    first_two = FixedClickModel([0, 1])
    both = ConditionedClickModel([relevant, first_two], np.all)
    np.testing.assert_array_equal(both.click((X, y)), [1, 1, 0, 0])
    either = ConditionedClickModel([relevant, first_two], np.any)
    np.testing.assert_array_equal(either.click((X, y)), [1, 1, 0, 1])
    capped = MaxClicksModel(relevant, 2)
    np.testing.assert_array_equal(capped.click((X, y)), [1, 1, 0, 0])
    mixed = MultipleClickModel([relevant, first_two], [1.0, 0.0], seed=1)
    np.testing.assert_array_equal(mixed.click((X, y)), [1, 1, 0, 1])


def test_cascade_observation_decay():
    X, y = docs(np.ones(200) * 3)
    cm = CascadeClickModel(eta=2.0, threshold=1.0, seed=0)
    clicks = cm.click((X, y))
    # Observation probability decays as 1/r^2: the top ranks are clicked
    # far more often than the tail.
    assert clicks[0] == 1
    assert clicks[:20].sum() > clicks[100:].sum()


def test_duplicate_aware_click_models():
    X = np.zeros((4, 2))
    X[1] = [10, 0]
    X[2] = [0.001, 0]  # near-duplicate of item 0
    X[3] = [0, 10]
    y = np.array([3.0, 3, 3, 3])
    np.testing.assert_array_equal(
        NoDuplicateClickModel(0.01).click((X, y)), [1, 1, 0, 1])
    diverse = DiverseClicksModel(OnlyRelevantClickModel(1), q_percentile=0.1)
    clicks = diverse.click((X, y))
    assert clicks[0] == 1 and clicks[2] == 0  # duplicate rejected


def test_simulate_clicks_returns_original_order():
    X = np.random.RandomState(0).normal(size=(2, 4, 3))
    y = np.array([[1.0, 3, 0, PADDED_Y_VALUE], [0, 0, 2, 1]])
    scores = np.array([[0.1, 0.9, 0.5, 0.0], [0.2, 0.1, 0.9, 0.8]])
    out = simulate_clicks(X, y, scores, OnlyRelevantClickModel(1))
    np.testing.assert_array_equal(out[0], [1, 1, 0, -1])  # padded slot = -1
    np.testing.assert_array_equal(out[1], [0, 0, 1, 1])


# ---------------------------------------------------------------------------
# LibSVM ranking dataset
# ---------------------------------------------------------------------------

SVM_FILE = """\
2 qid:1 1:0.5 3:1.0  # relevant
0 qid:1 2:0.25
1 qid:2 1:1.0
0 qid:2 3:0.5
0 qid:2 2:0.125
"""


def test_libsvm_parse_and_group(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text(SVM_FILE)
    X, y, qids = parse_svm_rank_file(str(p))
    assert X.shape == (5, 3)
    assert X[0, 0] == 0.5 and X[0, 2] == 1.0 and X[1, 1] == 0.25
    np.testing.assert_array_equal(qids, [1, 1, 2, 2, 2])

    ds = group_into_slates(X, y, qids, slate_length=4)
    assert ds.shape == (2, 4, 3)
    # Slate 1 has 2 real rows + 2 padded.
    np.testing.assert_array_equal(ds.y[0], [2, 0, -1, -1])
    np.testing.assert_array_equal(ds.indices[0],
                                  [0, 1, PADDED_INDEX_VALUE,
                                   PADDED_INDEX_VALUE])
    np.testing.assert_array_equal(ds.mask()[0], [1, 1, 0, 0])


def test_libsvm_subsampling_keeps_relevant(tmp_path):
    rows = ["1 qid:7 1:%.2f" % i for i in range(3)]
    rows += ["0 qid:7 1:%.2f" % (10 + i) for i in range(10)]
    p = tmp_path / "t.txt"
    p.write_text("\n".join(rows) + "\n")
    ds = group_into_slates(*parse_svm_rank_file(str(p)), slate_length=5)
    assert ds.shape[:2] == (1, 5)
    assert (ds.y[0] == 1).sum() == 3  # every relevant row survives


def test_load_libsvm_dataset_roles(tmp_path):
    (tmp_path / "train.txt").write_text(SVM_FILE)
    (tmp_path / "vali.txt").write_text(SVM_FILE)
    train, val = load_libsvm_dataset(str(tmp_path / "train.txt"),
                                     str(tmp_path / "vali.txt"),
                                     slate_length=3)
    assert len(train) == 2 and len(val) == 2
    batches = list(train.batches(batch_size=1))
    assert len(batches) == 2
    assert batches[0][0].shape == (1, 3, 3)


def test_ranker_on_libsvm_slates(tmp_path):
    (tmp_path / "train.txt").write_text(SVM_FILE)
    ds = group_into_slates(*parse_svm_rank_file(str(tmp_path / "train.txt")),
                           slate_length=4)
    params, cfg = init_ranker(jax.random.PRNGKey(0), n_features=3,
                              fc_sizes=(8,), n_encoder_layers=1, n_heads=1,
                              d_ff=16)
    idx = np.maximum(ds.indices, 0)
    s = ranker_score(params, cfg, jnp.asarray(ds.X), jnp.asarray(ds.mask()),
                     indices=jnp.asarray(idx))
    assert s.shape == (2, 4)
    assert np.isfinite(np.asarray(s)[ds.mask() > 0]).all()
