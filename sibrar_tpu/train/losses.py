"""Recommendation and regularization losses as pure jnp functions.

Parity targets: `/root/reference/train/rec_losses.py` (bce / bpr /
sampled_softmax with the uniform-sampling log-correction) and
`/root/reference/train/regularization_losses.py` (symmetric CLIP-style InfoNCE).

All losses take ``logits[B, 1+n_neg]`` whose first column is the positive.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _aggregate(x: jax.Array, aggregator: str) -> jax.Array:
    if aggregator == "mean":
        return x.mean()
    if aggregator == "sum":
        return x.sum()
    raise ValueError(f"unknown aggregator {aggregator!r}")


def _bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically-stable elementwise BCEWithLogits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def rec_bce(logits: jax.Array, labels: jax.Array, *, aggregator: str = "mean",
            **_) -> jax.Array:
    """BCE over all logits; labels are 1 in the first column, 0 elsewhere."""
    return _aggregate(_bce_with_logits(logits, labels), aggregator)


def rec_bpr(logits: jax.Array, labels: jax.Array, *, aggregator: str = "mean",
            **_) -> jax.Array:
    """Bayesian Personalized Ranking: BCE on (pos − neg) score differences."""
    del labels
    pos = logits[:, :1]
    neg = logits[:, 1:]
    diff = pos - neg
    ones = jnp.ones_like(diff)
    return _aggregate(_bce_with_logits(diff, ones), aggregator)


def rec_sampled_softmax(
    logits: jax.Array, labels: jax.Array, *, aggregator: str = "mean",
    n_items: int, n_neg: int, train_neg_strategy: str = "uniform", **_,
) -> jax.Array:
    """Sampled softmax with the uniform-proposal log-correction
    ``log(n_items / n_neg)`` on negative logits (arXiv:2101.08769)."""
    del labels
    pos = logits[:, 0]
    if train_neg_strategy == "uniform":
        correction = math.log(n_items / n_neg)
        logits = logits.at[:, 1:].add(correction)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    return _aggregate(-pos + lse, aggregator)


REC_LOSSES: dict[str, Callable] = {
    "bce": rec_bce,
    "bpr": rec_bpr,
    "sampled_softmax": rec_sampled_softmax,
}


def build_rec_loss(name: str, *, n_items: int, n_neg: int,
                   aggregator: str = "mean",
                   train_neg_strategy: str = "uniform") -> Callable:
    fn = REC_LOSSES[name]
    return partial(fn, aggregator=aggregator, n_items=n_items, n_neg=n_neg,
                   train_neg_strategy=train_neg_strategy)


def _cross_entropy_int_labels(logits: jax.Array, labels: jax.Array,
                              aggregator: str) -> jax.Array:
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    # one-hot select instead of take_along_axis: the row gather scalarizes on
    # TPU (~8 ns/row profiled); the where-sum selects the same single element
    # bit-exactly on the VPU
    m = log_probs.shape[-1]
    hit = labels[..., None] == jnp.arange(m, dtype=labels.dtype)
    nll = -jnp.where(hit, log_probs, 0.0).sum(axis=-1)
    return _aggregate(nll, aggregator)


def info_nce(first_emb: jax.Array, second_emb: jax.Array, *,
             temperature: float = 1.0, aggregator: str = "mean") -> jax.Array:
    """Symmetric CLIP-style InfoNCE between two aligned embedding sets.

    Shapes ``[..., m, d]``; the contrast set is the last-but-one axis (the
    reference calls it with `[B, 1+n_neg, d]` item towers and `[B, 1, d]` user
    towers). Diagonal entries are the positives.
    """
    logits = jnp.einsum("...md,...nd->...mn", first_emb, second_emb) / temperature
    m = logits.shape[-1]
    labels = jnp.broadcast_to(jnp.arange(m), logits.shape[:-1])
    flat_ab = logits.reshape(-1, m)
    flat_ba = jnp.swapaxes(logits, -1, -2).reshape(-1, m)
    flat_labels = labels.reshape(-1)
    loss_ab = _cross_entropy_int_labels(flat_ab, flat_labels, aggregator)
    loss_ba = _cross_entropy_int_labels(flat_ba, flat_labels, aggregator)
    return loss_ab + loss_ba
