"""Sampler unit tests: the sort-free fast path must agree with the exact
full-sort path on every deterministic output (greedy tokens, logprobs,
top-L report), and its random sampling must follow the distribution.

Counterpart of reference tests/samplers/test_sampler.py (which checks the
torch sampler's filters per request)."""
import jax
import jax.numpy as jnp
import numpy as np

from vllm_ltr_tpu.layers.sampler import SamplingTensors, sample

S, V = 8, 1000


def make_tensors(temperature, greedy, top_p=1.0, top_k=None, min_p=0.0):
    return SamplingTensors(
        temperature=jnp.full((S, ), temperature, jnp.float32),
        top_p=jnp.full((S, ), top_p, jnp.float32),
        top_k=jnp.full((S, ), V if top_k is None else top_k, jnp.int32),
        min_p=jnp.full((S, ), min_p, jnp.float32),
        greedy=jnp.full((S, ), greedy, bool),
        presence_penalty=jnp.zeros((S, ), jnp.float32),
        frequency_penalty=jnp.zeros((S, ), jnp.float32),
        repetition_penalty=jnp.ones((S, ), jnp.float32),
    )


def test_fast_path_matches_exact_greedy():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(S, V).astype(np.float32))
    t = make_tensors(1.0, greedy=True)
    key = jax.random.PRNGKey(0)
    exact = sample(logits, t, key, exact=True)
    fast = sample(logits, t, key, exact=False)
    np.testing.assert_array_equal(np.asarray(exact.tokens),
                                  np.asarray(fast.tokens))
    np.testing.assert_allclose(np.asarray(exact.logprobs),
                               np.asarray(fast.logprobs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(exact.topk_ids),
                                  np.asarray(fast.topk_ids))
    np.testing.assert_allclose(np.asarray(exact.topk_logprobs),
                               np.asarray(fast.topk_logprobs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(exact.tokens),
                                  np.argmax(np.asarray(logits), axis=-1))


def test_fast_path_random_follows_distribution():
    # A dominant token (margin >> any realizable Gumbel gap) must always
    # win random sampling.
    rng = np.random.RandomState(1)
    base = rng.randn(S, V).astype(np.float32)
    winners = rng.randint(0, V, size=S)
    base[np.arange(S), winners] += 50.0
    logits = jnp.asarray(base)
    t = make_tensors(1.0, greedy=False)
    for seed in range(3):
        fast = sample(logits, t, jax.random.PRNGKey(seed), exact=False)
        np.testing.assert_array_equal(np.asarray(fast.tokens), winners)


def test_fast_path_random_varies_by_key():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(np.zeros((S, V), np.float32))  # uniform dist
    t = make_tensors(1.0, greedy=False)
    a = np.asarray(sample(logits, t, jax.random.PRNGKey(0),
                          exact=False).tokens)
    b = np.asarray(sample(logits, t, jax.random.PRNGKey(1),
                          exact=False).tokens)
    assert (a != b).any()
    assert ((a >= 0) & (a < V)).all()


def test_exact_path_filters_still_apply():
    # top_k=1 forces the argmax token even for random rows.
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(S, V).astype(np.float32))
    t = make_tensors(1.0, greedy=False, top_k=1)
    out = sample(logits, t, jax.random.PRNGKey(0), exact=True)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.argmax(np.asarray(logits), axis=-1))


def test_sampled_rank_consistent():
    rng = np.random.RandomState(4)
    logits = jnp.asarray(rng.randn(S, V).astype(np.float32))
    t = make_tensors(1.0, greedy=True)
    fast = sample(logits, t, jax.random.PRNGKey(0), exact=False)
    assert (np.asarray(fast.sampled_ranks) == 0).all()  # greedy = rank 0
