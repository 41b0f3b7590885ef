"""Feature-based slate ranking model (JAX).

Behavioral counterpart of the reference's vendored allRank model stack
(train/allrank/models/model.py:27-167 — FCModel / LTRModel / OutputLayer —
and models/transformer.py make_transformer): items of a slate are embedded
by a fully-connected stack, contextualized against each other by a
transformer encoder over the *slate* axis (attention over co-ranked items,
not tokens), and reduced to one score per item.  Used for ranking problems
whose inputs are pre-extracted feature vectors (libsvm-style datasets,
train/dataset.py) rather than token ids — token-id prompts are scored by
the OPT sequence-classification predictor instead (train/trainer.py).

Everything is a pure function over a param pytree, jit/grad-friendly;
dropout takes an explicit PRNG key (pass None to disable, e.g. at eval).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

#: Relevance value marking padded slate slots (reference
#: allrank/data/dataset_loading.py PADDED_Y_VALUE).
PADDED_Y_VALUE = -1


def _glorot(key, shape):
    fan_in, fan_out = shape[-2], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _dense_init(key, d_in, d_out):
    return {"w": _glorot(key, (d_in, d_out)),
            "b": jnp.zeros((d_out,), jnp.float32)}


def _dense(p, x):
    return x @ p["w"] + p["b"]


def _ln_init(d):
    return {"g": jnp.ones((d,), jnp.float32),
            "b": jnp.zeros((d,), jnp.float32)}


def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


_ACTIVATIONS = {
    None: lambda x: x,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,
}


def init_ranker(key,
                n_features: int,
                fc_sizes: Sequence[int] = (64,),
                fc_activation: Optional[str] = "relu",
                fc_input_norm: bool = True,
                n_encoder_layers: int = 2,
                n_heads: int = 2,
                d_ff: int = 128,
                d_output: int = 1,
                positional: bool = True,
                max_slate: int = 512,
                dropout: float = 0.0):
    """Build the param pytree + static config for a slate ranker."""
    if fc_activation not in _ACTIVATIONS:
        raise ValueError(f"unknown activation {fc_activation!r}")
    keys = iter(jax.random.split(key, 64))
    d_model = fc_sizes[-1] if fc_sizes else n_features
    if n_encoder_layers > 0 and d_model % n_heads:
        raise ValueError(f"d_model {d_model} must divide n_heads {n_heads}")

    fc = []
    d_prev = n_features
    for d in fc_sizes:
        fc.append(_dense_init(next(keys), d_prev, d))
        d_prev = d
    layers = []
    for _ in range(n_encoder_layers):
        layers.append({
            "qkv": _dense_init(next(keys), d_model, 3 * d_model),
            "proj": _dense_init(next(keys), d_model, d_model),
            "ln1": _ln_init(d_model),
            "ff1": _dense_init(next(keys), d_model, d_ff),
            "ff2": _dense_init(next(keys), d_ff, d_model),
            "ln2": _ln_init(d_model),
        })
    params = {
        "input_norm": _ln_init(n_features) if fc_input_norm else None,
        "fc": fc,
        "encoder": layers,
        # Learned positional embedding over the item's ORIGINAL rank
        # (reference transformer.py positional encoding by `indices`).
        "pos": (0.02 * jax.random.normal(next(keys), (max_slate, d_model))
                if (positional and n_encoder_layers) else None),
        "out": _dense_init(next(keys), d_model, d_output),
    }
    config = dict(n_features=n_features, fc_activation=fc_activation,
                  n_heads=n_heads, d_output=d_output, dropout=dropout)
    return params, config


def _encoder_layer(p, x, pad_bias, n_heads, drop, key):
    B, S, D = x.shape
    h = D // n_heads
    qkv = _dense(p["qkv"], x).reshape(B, S, 3, n_heads, h)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, S, H, h]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(h)
    att = jax.nn.softmax(logits + pad_bias[:, None, None, :], axis=-1)
    mix = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, S, D)
    x = _ln(p["ln1"], x + drop(_dense(p["proj"], mix), key, 0))
    ff = _dense(p["ff2"], jax.nn.relu(_dense(p["ff1"], x)))
    return _ln(p["ln2"], x + drop(ff, key, 1))


def ranker_forward(params, config, x, mask, indices=None, key=None):
    """Per-item outputs for a padded slate.

    x: [B, slate, n_features] float features; mask: [B, slate] (1 = real
    item); indices: [B, slate] original ranks for positional encoding
    (defaults to 0..slate-1); key: dropout PRNG (None = eval mode).
    Returns [B, slate, d_output].
    """
    rate = config["dropout"]

    def drop(t, k, salt):
        if key is None or rate <= 0.0:
            return t
        kk = jax.random.fold_in(k, salt)
        keep = jax.random.bernoulli(kk, 1.0 - rate, t.shape)
        return jnp.where(keep, t / (1.0 - rate), 0.0)

    act = _ACTIVATIONS[config["fc_activation"]]
    h = x.astype(jnp.float32)
    if params["input_norm"] is not None:
        h = _ln(params["input_norm"], h)
    for i, fp in enumerate(params["fc"]):
        h = drop(act(_dense(fp, h)), key, 100 + i)

    if params["encoder"]:
        if params["pos"] is not None:
            if indices is None:
                indices = jnp.broadcast_to(
                    jnp.arange(x.shape[1], dtype=jnp.int32), x.shape[:2])
            h = h + jnp.take(params["pos"], indices, axis=0)
        pad_bias = jnp.where(mask > 0, 0.0, -1e30).astype(jnp.float32)
        for j, lp in enumerate(params["encoder"]):
            lk = None if key is None else jax.random.fold_in(key, j)
            h = _encoder_layer(lp, h, pad_bias, config["n_heads"], drop, lk)

    return _dense(params["out"], h)


def ranker_score(params, config, x, mask, indices=None, key=None):
    """One score per slate item: the d_output outputs summed when
    d_output > 1 (reference OutputLayer.score), padded slots -inf-safe
    via the caller's mask."""
    out = ranker_forward(params, config, x, mask, indices, key)
    return out.sum(-1) if config["d_output"] > 1 else out[..., 0]
