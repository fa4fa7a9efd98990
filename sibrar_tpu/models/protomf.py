"""ProtoMF family: prototype-based collaborative filtering (RecSys'22).

Parity targets in the reference:
- UProtoMF / IProtoMF / UIProtoMF — `/root/reference/algorithms/sgd_alg.py:332-640`:
  entity embeddings scored by *shifted* cosine similarity (1 + cos, clamped to
  [0, 2]) against learned prototypes; the other entity learns per-prototype
  weights directly; two regularizers on the similarity matrix
  ``dis = 2 - sim``: `proto_loss` = mean over prototypes of the min over the
  batch, `batch_loss` = mean over the batch of the min over prototypes.
- UProtoMFs / IProtoMFs / UIProtoMFs (`:643-888`) — simplified variants: plain
  cosine (can be negative), NO regularization losses, and the other entity's
  weights constrained positive via ReLU (init truncated-normal around 0.5).
- UIProtoMFsCombine (`:866-888`) — score-sum of two separately fitted models.

TPU-first notes: the stateful loss accumulators (`_acc_r_proto`) become sown
`losses` collection entries inside the jitted step; prototype similarity is one
[B, d] @ [d, P] matmul that XLA fuses with the normalization.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sibrar_tpu.models.base import RecModel
from sibrar_tpu.models.layers import Embedding, embedding_init

# ----------------------------------------------------------------- cosine helpers


def _l2normalize(x, eps: float = 1e-12):
    # zero-safe backward (see layers.l2_normalize)
    from sibrar_tpu.models.layers import l2_normalize

    return l2_normalize(x, eps=eps)


def cosine_sim(x, y):
    """Pairwise cosine similarity, clamped to [-1, 1]
    (reference `compute_cosine_sim`, sgd_alg.py:57-68)."""
    return jnp.clip(_l2normalize(x) @ _l2normalize(y).T, -1.0, 1.0)


def shifted_cosine_sim(x, y):
    """1 + cosine, clamped to [0, 2] (reference sgd_alg.py:48-56)."""
    return jnp.clip(1.0 + _l2normalize(x) @ _l2normalize(y).T, 0.0, 2.0)


def norm_cosine_sim(x, y):
    """(1 + cosine) / 2, clamped to [0, 1] (reference sgd_alg.py:34-45)."""
    return jnp.clip((1.0 + _l2normalize(x) @ _l2normalize(y).T) / 2.0, 0.0, 1.0)


def entropy_from_softmax(p, p_unnorm):
    """Entropy of a softmax distribution computed from its unnormalized logits
    for numerical stability (reference sgd_alg.py:76-85)."""
    return -(p * (p_unnorm - jax.nn.logsumexp(p_unnorm, axis=-1, keepdims=True))).sum(-1)


def _proto_init(key, shape, dtype=jnp.float32):
    # N(0, .1/dim) like the reference's prototype init (sgd_alg.py:351-352)
    return jax.random.normal(key, shape, dtype) * (0.1 / shape[-1])


def _pos_weight_init(key, shape, dtype=jnp.float32):
    # truncated normal around 0.5 in [0, 1] (reference UProtoMFs init :666)
    return jnp.clip(
        0.5 + jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
        * (0.1 / shape[-1]), 0.0, 1.0)


def _proto_reg(sim_mtx, n_prototypes: int):
    """(proto_loss, batch_loss) from a [..., P] similarity tensor."""
    dis = (2.0 - sim_mtx).reshape(-1, n_prototypes)
    return dis.min(axis=0).mean(), dis.min(axis=1).mean()


# ------------------------------------------------------------------ full variants
class UProtoMF(RecModel):
    """User prototypes (reference sgd_alg.py:332-429)."""

    n_users: int
    n_items: int
    embedding_dim: int = 100
    n_prototypes: int = 20
    sim_proto_weight: float = 1.0
    sim_batch_weight: float = 1.0

    # row-sparse optimizer eligibility (LearningConfig.sparse_tables)
    table_index_map = {"user_embed": "user", "item_embed": "item"}

    def setup(self):
        self.user_embed = Embedding(self.n_users, self.embedding_dim)
        self.item_embed = Embedding(self.n_items, self.n_prototypes)
        self.prototypes = self.param(
            "prototypes", _proto_init, (self.n_prototypes, self.embedding_dim))

    def user_repr(self, u_idxs, train: bool = False):
        sim = shifted_cosine_sim(self.user_embed(u_idxs), self.prototypes)
        if train:
            proto, batch = _proto_reg(sim, self.n_prototypes)
            self.sow("losses", "proto_loss", self.sim_proto_weight * proto)
            self.sow("losses", "batch_loss", self.sim_batch_weight * batch)
        return sim

    def item_repr(self, i_idxs, train: bool = False):
        return self.item_embed(i_idxs)

    @staticmethod
    def build_from_conf(conf: dict, dataset, device_data=None) -> "UProtoMF":
        return UProtoMF(
            n_users=dataset.n_users, n_items=dataset.n_items,
            embedding_dim=conf.get("embedding_dim", 100),
            n_prototypes=conf.get("n_prototypes", 20),
            sim_proto_weight=conf.get("sim_proto_weight", 1.0),
            sim_batch_weight=conf.get("sim_batch_weight", 1.0))


class IProtoMF(RecModel):
    """Item prototypes (reference sgd_alg.py:432-537)."""

    n_users: int
    n_items: int
    embedding_dim: int = 100
    n_prototypes: int = 20
    sim_proto_weight: float = 1.0
    sim_batch_weight: float = 1.0

    table_index_map = {"user_embed": "user", "item_embed": "item"}

    def setup(self):
        self.user_embed = Embedding(self.n_users, self.n_prototypes)
        self.item_embed = Embedding(self.n_items, self.embedding_dim)
        self.prototypes = self.param(
            "prototypes", _proto_init, (self.n_prototypes, self.embedding_dim))

    def user_repr(self, u_idxs, train: bool = False):
        return self.user_embed(u_idxs)

    def item_repr(self, i_idxs, train: bool = False):
        emb = self.item_embed(i_idxs)
        sim = shifted_cosine_sim(
            emb.reshape(-1, self.embedding_dim), self.prototypes
        ).reshape(*emb.shape[:-1], self.n_prototypes)
        if train:
            proto, batch = _proto_reg(sim, self.n_prototypes)
            self.sow("losses", "proto_loss", self.sim_proto_weight * proto)
            self.sow("losses", "batch_loss", self.sim_batch_weight * batch)
        return sim

    @staticmethod
    def build_from_conf(conf: dict, dataset, device_data=None) -> "IProtoMF":
        return IProtoMF(
            n_users=dataset.n_users, n_items=dataset.n_items,
            embedding_dim=conf.get("embedding_dim", 100),
            n_prototypes=conf.get("n_prototypes", 20),
            sim_proto_weight=conf.get("sim_proto_weight", 1.0),
            sim_batch_weight=conf.get("sim_batch_weight", 1.0))


class UIProtoMF(RecModel):
    """User + item prototypes with cross projections (reference sgd_alg.py:539-640).

    score = <u_sim, i_proj> + <u_proj, i_sim> where u_proj/i_proj are bias-free
    linear projections of the entity embeddings into the other entity's
    prototype space.
    """

    n_users: int
    n_items: int
    embedding_dim: int = 100
    u_n_prototypes: int = 20
    i_n_prototypes: int = 20
    u_sim_proto_weight: float = 1.0
    u_sim_batch_weight: float = 1.0
    i_sim_proto_weight: float = 1.0
    i_sim_batch_weight: float = 1.0

    table_index_map = {"user_embed": "user", "item_embed": "item"}

    def setup(self):
        self.user_embed = Embedding(self.n_users, self.embedding_dim)
        self.item_embed = Embedding(self.n_items, self.embedding_dim)
        self.u_prototypes = self.param(
            "u_prototypes", _proto_init, (self.u_n_prototypes, self.embedding_dim))
        self.i_prototypes = self.param(
            "i_prototypes", _proto_init, (self.i_n_prototypes, self.embedding_dim))
        self.u_to_i = nn.Dense(self.i_n_prototypes, use_bias=False,
                               kernel_init=embedding_init)
        self.i_to_u = nn.Dense(self.u_n_prototypes, use_bias=False,
                               kernel_init=embedding_init)

    def user_repr(self, u_idxs, train: bool = False):
        emb = self.user_embed(u_idxs)
        u_sim = shifted_cosine_sim(emb, self.u_prototypes)
        if train:
            proto, batch = _proto_reg(u_sim, self.u_n_prototypes)
            self.sow("losses", "user_proto_loss", self.u_sim_proto_weight * proto)
            self.sow("losses", "user_batch_loss", self.u_sim_batch_weight * batch)
        return u_sim, self.u_to_i(emb)

    def item_repr(self, i_idxs, train: bool = False):
        emb = self.item_embed(i_idxs)
        i_sim = shifted_cosine_sim(
            emb.reshape(-1, self.embedding_dim), self.i_prototypes
        ).reshape(*emb.shape[:-1], self.i_n_prototypes)
        if train:
            proto, batch = _proto_reg(i_sim, self.i_n_prototypes)
            self.sow("losses", "item_proto_loss", self.i_sim_proto_weight * proto)
            self.sow("losses", "item_batch_loss", self.i_sim_batch_weight * batch)
        return i_sim, self.i_to_u(emb)

    def eval_rank_dot_parts(self, user_repr_fn, i_repr):
        """u_sim·i_proj + u_proj·i_sim is exactly the dot of the concatenated
        parts — the fused eval fast path applies verbatim."""
        i_sim, i_proj = i_repr

        def u_fn(u_idxs):
            u_sim, u_proj = user_repr_fn(u_idxs)
            return jnp.concatenate([u_sim, u_proj], axis=1)

        return u_fn, jnp.concatenate([i_proj, i_sim], axis=1)

    def combine(self, u_repr, i_repr):
        u_sim, u_proj = u_repr
        i_sim, i_proj = i_repr
        if i_sim.ndim == 2:  # full-catalog eval layout [C, P]
            return jnp.einsum("bp,cp->bc", u_sim, i_proj) + \
                jnp.einsum("bp,cp->bc", u_proj, i_sim)
        return jnp.einsum("bp,bcp->bc", u_sim, i_proj) + \
            jnp.einsum("bp,bcp->bc", u_proj, i_sim)

    @staticmethod
    def build_from_conf(conf: dict, dataset, device_data=None) -> "UIProtoMF":
        return UIProtoMF(
            n_users=dataset.n_users, n_items=dataset.n_items,
            embedding_dim=conf.get("embedding_dim", 100),
            u_n_prototypes=conf.get("u_n_prototypes", 20),
            i_n_prototypes=conf.get("i_n_prototypes", 20),
            u_sim_proto_weight=conf.get("u_sim_proto_weight", 1.0),
            u_sim_batch_weight=conf.get("u_sim_batch_weight", 1.0),
            i_sim_proto_weight=conf.get("i_sim_proto_weight", 1.0),
            i_sim_batch_weight=conf.get("i_sim_batch_weight", 1.0))


# ------------------------------------------------------------- simplified variants
class UProtoMFs(RecModel):
    """Simplified user-prototype model: plain cosine, no reg losses, ReLU on the
    item weights (reference sgd_alg.py:643-703)."""

    n_users: int
    n_items: int
    embedding_dim: int = 100
    n_prototypes: int = 20

    # item_embed is nn.Embed (no row-injection hook) — user side only
    table_index_map = {"user_embed": "user"}

    def setup(self):
        self.user_embed = Embedding(self.n_users, self.embedding_dim)
        self.item_embed = nn.Embed(self.n_items, self.n_prototypes,
                                   embedding_init=_pos_weight_init)
        self.prototypes = self.param(
            "prototypes", _proto_init, (self.n_prototypes, self.embedding_dim))

    def user_repr(self, u_idxs, train: bool = False):
        return cosine_sim(self.user_embed(u_idxs), self.prototypes)

    def item_repr(self, i_idxs, train: bool = False):
        return nn.relu(self.item_embed(i_idxs))

    @staticmethod
    def build_from_conf(conf: dict, dataset, device_data=None) -> "UProtoMFs":
        return UProtoMFs(
            n_users=dataset.n_users, n_items=dataset.n_items,
            embedding_dim=conf.get("embedding_dim", 100),
            n_prototypes=conf.get("n_prototypes", 20))


class IProtoMFs(RecModel):
    """Simplified item-prototype model (reference sgd_alg.py:706-765)."""

    n_users: int
    n_items: int
    embedding_dim: int = 100
    n_prototypes: int = 20

    # user_embed is nn.Embed (no row-injection hook) — item side only
    table_index_map = {"item_embed": "item"}

    def setup(self):
        self.user_embed = nn.Embed(self.n_users, self.n_prototypes,
                                   embedding_init=_pos_weight_init)
        self.item_embed = Embedding(self.n_items, self.embedding_dim)
        self.prototypes = self.param(
            "prototypes", _proto_init, (self.n_prototypes, self.embedding_dim))

    def user_repr(self, u_idxs, train: bool = False):
        return nn.relu(self.user_embed(u_idxs))

    def item_repr(self, i_idxs, train: bool = False):
        emb = self.item_embed(i_idxs)
        return cosine_sim(
            emb.reshape(-1, self.embedding_dim), self.prototypes
        ).reshape(*emb.shape[:-1], self.n_prototypes)

    @staticmethod
    def build_from_conf(conf: dict, dataset, device_data=None) -> "IProtoMFs":
        return IProtoMFs(
            n_users=dataset.n_users, n_items=dataset.n_items,
            embedding_dim=conf.get("embedding_dim", 100),
            n_prototypes=conf.get("n_prototypes", 20))


class UIProtoMFs(RecModel):
    """Simplified user+item prototype model with positive cross projections
    (reference sgd_alg.py:768-863)."""

    n_users: int
    n_items: int
    embedding_dim: int = 100
    u_n_prototypes: int = 20
    i_n_prototypes: int = 20

    table_index_map = {"user_embed": "user", "item_embed": "item"}

    def setup(self):
        self.user_embed = Embedding(self.n_users, self.embedding_dim)
        self.item_embed = Embedding(self.n_items, self.embedding_dim)
        self.u_prototypes = self.param(
            "u_prototypes", _proto_init, (self.u_n_prototypes, self.embedding_dim))
        self.i_prototypes = self.param(
            "i_prototypes", _proto_init, (self.i_n_prototypes, self.embedding_dim))
        self.u_to_i = nn.Dense(self.i_n_prototypes, use_bias=False,
                               kernel_init=embedding_init)
        self.i_to_u = nn.Dense(self.u_n_prototypes, use_bias=False,
                               kernel_init=embedding_init)

    def user_repr(self, u_idxs, train: bool = False):
        emb = self.user_embed(u_idxs)
        return (cosine_sim(emb, self.u_prototypes), nn.relu(self.u_to_i(emb)))

    def item_repr(self, i_idxs, train: bool = False):
        emb = self.item_embed(i_idxs)
        i_sim = cosine_sim(
            emb.reshape(-1, self.embedding_dim), self.i_prototypes
        ).reshape(*emb.shape[:-1], self.i_n_prototypes)
        return i_sim, nn.relu(self.i_to_u(emb))

    combine = UIProtoMF.combine

    @staticmethod
    def build_from_conf(conf: dict, dataset, device_data=None) -> "UIProtoMFs":
        return UIProtoMFs(
            n_users=dataset.n_users, n_items=dataset.n_items,
            embedding_dim=conf.get("embedding_dim", 100),
            u_n_prototypes=conf.get("u_n_prototypes", 20),
            i_n_prototypes=conf.get("i_n_prototypes", 20))


class UIProtoMFsCombine:
    """Score-sum of two separately fitted UProtoMFs/IProtoMFs models
    (reference sgd_alg.py:866-888): no training, predict-time only."""

    def __init__(self, u_score_fn, i_score_fn):
        self.u_score_fn = u_score_fn
        self.i_score_fn = i_score_fn

    def __call__(self, u_idxs):
        return self.u_score_fn(u_idxs) + self.i_score_fn(u_idxs)
