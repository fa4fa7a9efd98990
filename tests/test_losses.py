"""Loss parity tests vs torch implementations of the reference formulas
(`/root/reference/train/rec_losses.py`, `train/regularization_losses.py`)."""
import math

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from sibrar_tpu.train.losses import info_nce, rec_bce, rec_bpr, rec_sampled_softmax


def _logits_labels(rng, b=16, n_neg=4):
    logits = rng.normal(size=(b, 1 + n_neg)).astype(np.float32)
    labels = np.zeros_like(logits)
    labels[:, 0] = 1.0
    return logits, labels


def test_bce_matches_torch(rng):
    logits, labels = _logits_labels(rng)
    for aggr in ("mean", "sum"):
        got = float(rec_bce(jnp.asarray(logits), jnp.asarray(labels), aggregator=aggr))
        exp = torch.nn.BCEWithLogitsLoss(reduction=aggr)(
            torch.tensor(logits).flatten(), torch.tensor(labels).flatten())
        assert abs(got - float(exp)) < 1e-5 * max(1.0, abs(float(exp)))


def test_bpr_matches_torch(rng):
    logits, labels = _logits_labels(rng)
    got = float(rec_bpr(jnp.asarray(logits), jnp.asarray(labels)))
    lt = torch.tensor(logits)
    diff = lt[:, :1] - lt[:, 1:]
    exp = torch.nn.BCEWithLogitsLoss(reduction="mean")(
        diff.flatten(), torch.ones_like(diff).flatten())
    assert abs(got - float(exp)) < 1e-5


def test_sampled_softmax_matches_torch(rng):
    logits, labels = _logits_labels(rng)
    n_items, n_neg = 1000, 4
    got = float(rec_sampled_softmax(
        jnp.asarray(logits), jnp.asarray(labels),
        n_items=n_items, n_neg=n_neg, train_neg_strategy="uniform"))
    lt = torch.tensor(logits).clone()
    lt[:, 1:] += math.log(n_items / n_neg)
    exp = (-torch.tensor(logits)[:, 0] + torch.logsumexp(lt, dim=-1)).mean()
    assert abs(got - float(exp)) < 1e-5


def test_info_nce_matches_torch(rng):
    """Symmetric CLIP-style InfoNCE (reference regularization_losses.py:8-43)."""
    b, m, d = 8, 5, 16
    x = rng.normal(size=(b, m, d)).astype(np.float32)
    y = rng.normal(size=(b, m, d)).astype(np.float32)
    temp = 0.3
    got = float(info_nce(jnp.asarray(x), jnp.asarray(y), temperature=temp))

    xt, yt = torch.tensor(x), torch.tensor(y)
    logits = xt @ yt.transpose(-2, -1) / temp
    lbl = torch.arange(m).repeat(b, 1).reshape(-1)
    l1 = F.cross_entropy(logits.reshape(-1, m), lbl)
    l2 = F.cross_entropy(logits.transpose(-2, -1).reshape(-1, m), lbl)
    # f32 matmul accumulation-order differences amplified by the temperature
    assert abs(got - float(l1 + l2)) < 2e-3 * abs(float(l1 + l2))


def test_info_nce_pulls_aligned_pairs():
    x = jnp.eye(4)[None, :, :]  # [1, 4, 4] perfectly aligned
    aligned = float(info_nce(x, x, temperature=0.1))
    shuffled = float(info_nce(x, x[:, ::-1, :], temperature=0.1))
    assert aligned < shuffled
