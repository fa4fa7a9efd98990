"""Bias baseline, matrix factorization, and anchor CF (ACF).

Parity targets: SGDBaseline (`/root/reference/algorithms/sgd_alg.py:88-123`),
SGDMatrixFactorization (`:126-200`), ACF (`:203-329`).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from sibrar_tpu.models.base import RecModel
from sibrar_tpu.models.layers import Embedding


class SGDBaseline(RecModel):
    """Global + user + item bias model (Koren's baseline predictor)."""

    n_users: int
    n_items: int

    table_index_map = {"user_bias": "user", "item_bias": "item"}

    def setup(self):
        self.user_bias = Embedding(self.n_users, 1)
        self.item_bias = Embedding(self.n_items, 1)
        self.global_bias = self.param("global_bias", nn.initializers.zeros, (1,))

    def user_repr(self, u_idxs, train: bool = False):
        return self.user_bias(u_idxs)  # [B, 1]

    def item_repr(self, i_idxs, train: bool = False):
        return self.item_bias(i_idxs)[..., 0]  # [B, 1+n] or [C]

    def combine(self, u_repr, i_repr):
        if i_repr.ndim == 1:  # catalog layout [C]
            return u_repr + i_repr[None, :] + self.global_bias
        return u_repr + i_repr + self.global_bias


class SGDMatrixFactorization(RecModel):
    """Embedding dot-product MF with optional user/item/global biases."""

    n_users: int
    n_items: int
    embedding_dim: int = 100
    use_user_bias: bool = False
    use_item_bias: bool = False
    use_global_bias: bool = False

    # row-sparse optimizer eligibility (LearningConfig.sparse_tables):
    # each named Embedding is applied once per training forward with
    # exactly these index batches (see train/row_adam.find_sparse_tables)
    table_index_map = {"user_embeddings": "user", "item_embeddings": "item",
                       "user_bias": "user", "item_bias": "item"}

    def setup(self):
        self.user_embeddings = Embedding(self.n_users, self.embedding_dim)
        self.item_embeddings = Embedding(self.n_items, self.embedding_dim)
        if self.use_user_bias:
            self.user_bias = Embedding(self.n_users, 1)
        if self.use_item_bias:
            self.item_bias = Embedding(self.n_items, 1)
        if self.use_global_bias:
            self.global_bias = self.param("global_bias", nn.initializers.zeros, (1,))

    def user_repr(self, u_idxs, train: bool = False):
        if self.use_user_bias:
            return self.user_embeddings(u_idxs), self.user_bias(u_idxs)
        return self.user_embeddings(u_idxs)

    def item_repr(self, i_idxs, train: bool = False):
        if self.use_item_bias:
            return self.item_embeddings(i_idxs), self.item_bias(i_idxs)[..., 0]
        return self.item_embeddings(i_idxs)

    @property
    def combine_is_dot(self) -> bool:
        return not (self.use_user_bias or self.use_item_bias
                    or self.use_global_bias)

    def eval_rank_dot_parts(self, user_repr_fn, i_repr):
        """User/global biases shift every item of a user equally — rank
        invariant — and the item bias joins the dot as an appended column
        against a constant 1, so every bias combination rides the fused
        eval fast path."""
        i_embed, i_bias = (i_repr if isinstance(i_repr, tuple)
                           else (i_repr, None))

        def u_fn(u_idxs):
            r = user_repr_fn(u_idxs)
            u_embed = r[0] if isinstance(r, tuple) else r
            if i_bias is None:
                return u_embed
            return jnp.concatenate(
                [u_embed, jnp.ones((u_embed.shape[0], 1), u_embed.dtype)], 1)

        items = (i_embed if i_bias is None
                 else jnp.concatenate([i_embed, i_bias[:, None]], axis=1))
        return u_fn, items

    def combine(self, u_repr, i_repr):
        u_embed, u_bias = u_repr if isinstance(u_repr, tuple) else (u_repr, None)
        i_embed, i_bias = i_repr if isinstance(i_repr, tuple) else (i_repr, None)
        if i_embed.ndim == 2:  # catalog layout
            out = jnp.einsum("be,ce->bc", u_embed, i_embed)
            if i_bias is not None:
                out = out + i_bias[None, :]
        else:
            out = jnp.einsum("be,bce->bc", u_embed, i_embed)
            if i_bias is not None:
                out = out + i_bias
        if u_bias is not None:
            out = out + u_bias
        if self.use_global_bias:
            out = out + self.global_bias
        return out

    @staticmethod
    def build_from_conf(conf: dict, dataset) -> "SGDMatrixFactorization":
        return SGDMatrixFactorization(
            n_users=dataset.n_users, n_items=dataset.n_items,
            embedding_dim=conf.get("embedding_dim", 100),
            use_user_bias=conf.get("use_user_bias", False),
            use_item_bias=conf.get("use_item_bias", False),
            use_global_bias=conf.get("use_global_bias", False),
        )


class ACF(RecModel):
    """Anchor-based CF: softmax attention over shared anchors, with
    exclusiveness (entropy) and inclusiveness regularizers sown as losses."""

    n_users: int
    n_items: int
    embedding_dim: int = 100
    n_anchors: int = 20
    delta_exc: float = 1e-1
    delta_inc: float = 1e-2

    # row-sparse optimizer eligibility (LearningConfig.sparse_tables): the
    # train forward applies each Embedding exactly once with exactly the
    # user / global-item index batch (see train/row_adam.find_sparse_tables)
    table_index_map = {"user_embed": "user", "item_embed": "item"}

    def setup(self):
        # ACF's anchors need non-small init for stability (reference notes)
        self.anchors = self.param(
            "anchors", nn.initializers.normal(stddev=1.0),
            (self.n_anchors, self.embedding_dim))
        self.user_embed = Embedding(self.n_users, self.embedding_dim)
        self.item_embed = Embedding(self.n_items, self.embedding_dim)

    def user_repr(self, u_idxs, train: bool = False):
        u_embed = self.user_embed(u_idxs)
        c_u = nn.softmax(u_embed @ self.anchors.T, axis=-1)
        return c_u @ self.anchors

    def item_repr(self, i_idxs, train: bool = False):
        i_embed = self.item_embed(i_idxs)
        c_i_unnorm = i_embed @ self.anchors.T
        c_i = nn.softmax(c_i_unnorm, axis=-1)
        return c_i @ self.anchors, c_i, c_i_unnorm

    def combine(self, u_repr, i_repr):
        i_anc = i_repr[0]
        if i_anc.ndim == 2:
            return jnp.einsum("be,ce->bc", u_repr, i_anc)
        return jnp.einsum("be,bce->bc", u_repr, i_anc)

    def __call__(self, u_idxs, i_idxs, train: bool = False):
        u_repr = self.user_repr(u_idxs, train=train)
        i_repr = self.item_repr(i_idxs, train=train)
        dots = self.combine(u_repr, i_repr)
        if train:
            _, c_i, c_i_unnorm = i_repr
            # exclusiveness: mean entropy of the anchor assignment, computed from
            # the un-normalized logits for stability (reference sgd_alg.py:76-85)
            lse = jax.scipy.special.logsumexp(c_i_unnorm, axis=-1, keepdims=True)
            exc = (-(c_i * (c_i_unnorm - lse)).sum(-1)).mean()
            # inclusiveness: maximize entropy of overall anchor usage
            q_k = c_i.reshape(-1, self.n_anchors).sum(0) / c_i.sum()
            inc_entropy = (-q_k * jnp.log(q_k)).sum()
            inc = math.log(self.n_anchors) - inc_entropy
            self.sow("losses", "exc_loss", self.delta_exc * exc)
            self.sow("losses", "inc_loss", self.delta_inc * inc)
        return dots
