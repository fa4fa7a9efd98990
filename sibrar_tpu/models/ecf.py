"""ECF — cluster-anchored collaborative filtering with tag supervision (WWW'23).

Parity target: `/root/reference/algorithms/sgd_alg.py:891-1138` plus the
log-IDF-weighted item×tag matrix from `ECFTrainRecDataset`
(`/root/reference/data/dataset.py:456-483`):

- learned cluster anchors; item affiliations ``x_i = sigmoid(cos(item, clusters))
  * straight-through-top-m mask``; user affiliations from interaction rows:
  ``a_u = sigmoid(y_u @ x_tilde) * straight-through-top-n mask``;
- score = <a_u, x_i>;
- three auxiliary losses sown per batch: tag loss (−sum of top-p log-softmax of
  cluster-tag affinities), independence loss (−log-softmax diagonal of
  cluster-cluster cosine), and an internal BPR on the raw embeddings.

TPU-first: the reference caches ``_x_tildes``/``_xs`` as module state between
``get_item_representations`` and ``get_user_representations``; here both sides
recompute the all-item affiliation matrix inside one jitted step and XLA CSE
dedupes it — no Python-side state. The [n_items, d] @ [d, K] anchor matmul and
the [B, n_items] @ [n_items, K] user-affiliation matmul are MXU-shaped.

Cluster init: the reference copies random item-embedding rows; item embeddings
are N(0, .1/dim) there, so initializing clusters from the same distribution is
statistically identical (and jit-clean).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sibrar_tpu.models.base import RecModel
from sibrar_tpu.models.layers import InteractionVectorModule, embedding_init
from sibrar_tpu.models.protomf import cosine_sim


def ecf_tag_matrix_from_feature(tag_feature, n_items: int) -> np.ndarray:
    """Dense [n_items, n_tags] multi-hot weighted by log-IDF
    (reference `ECFTrainRecDataset._prepare_tag_data`, dataset.py:469-483)."""
    table = np.asarray(tag_feature.table)  # [n_items, max_tags] padded tag ids
    pad = tag_feature.padding_idx
    n_tags = tag_feature.n_unique_categories
    mat = np.zeros((n_items, n_tags), dtype=np.float32)
    rows = np.repeat(np.arange(n_items), table.shape[1])
    cols = table.ravel()
    valid = cols != pad
    mat[rows[valid], cols[valid]] = 1.0
    tag_frequency = mat.sum(axis=0)
    tag_weight = np.log(n_items / (tag_frequency + 1e-6))
    return mat * tag_weight[None, :]


def _straight_through_topk_mask(scores: jax.Array, k: int) -> jax.Array:
    """m_hat = softmax-mask + stop_grad(hard-top-k − softmax-mask) is assembled
    by the caller; this returns the hard 0/1 top-k mask."""
    _, top = jax.lax.top_k(scores, k)
    hard = jnp.zeros_like(scores)
    return jax.vmap(lambda h, t: h.at[t].set(1.0))(
        hard.reshape(-1, scores.shape[-1]), top.reshape(-1, k)
    ).reshape(scores.shape)


class ECF(RecModel):
    n_users: int
    n_items: int
    n_tags: int
    inter_spec: InteractionVectorModule  # user → dense train interaction rows
    embedding_dim: int = 100
    n_clusters: int = 64
    top_n: int = 20
    top_m: int = 20
    temp_masking: float = 2.0
    temp_tags: float = 2.0
    top_p: int = 4
    lam_cf: float = 0.6
    lam_ind: float = 1.0
    lam_ts: float = 1.0
    tag_matrix_init: Any = None  # () -> np.ndarray [n_items, n_tags]

    def setup(self):
        # raw tables (ECF needs the full item table every step for the anchors)
        self.user_table = self.param(
            "user_embedding", embedding_init, (self.n_users, self.embedding_dim))
        self.item_table = self.param(
            "item_embedding", embedding_init, (self.n_items, self.embedding_dim))
        self.clusters = self.param(
            "clusters",
            lambda key, shape: embedding_init(key, shape),
            (self.n_clusters, self.embedding_dim))
        init = self.tag_matrix_init or (
            lambda: jnp.zeros((self.n_items, self.n_tags), jnp.float32))
        self.tag_table = self.variable(
            "tables", "tag_matrix", lambda: jnp.asarray(init(), jnp.float32))
        self.interactions = self.inter_spec.clone(name="interactions")

    # ------------------------------------------------------------------ internals
    def _masked_affiliation(self, tilde: jax.Array, k: int) -> jax.Array:
        """sigmoid(tilde) * straight-through top-k mask (reference :1040-1056)."""
        m_tilde = jax.nn.softmax(tilde / self.temp_masking, axis=-1)
        m_hard = _straight_through_topk_mask(tilde, min(k, tilde.shape[-1]))
        m_hat = m_tilde + jax.lax.stop_gradient(m_hard - m_tilde)
        return jax.nn.sigmoid(tilde) * m_hat

    def _x_tildes(self) -> jax.Array:
        """[n_items, n_clusters] cosine of every item embedding to the anchors."""
        return cosine_sim(self.item_table, self.clusters)

    def _xs(self) -> jax.Array:
        return self._masked_affiliation(self._x_tildes(), self.top_m)

    # -------------------------------------------------------------------- reprs
    def user_repr(self, u_idxs, train: bool = False):
        y_u = self.interactions(u_idxs)  # [B, n_items]
        a_tilde = y_u @ self._x_tildes()  # [B, n_clusters]
        a_u = self._masked_affiliation(a_tilde, self.top_n)
        return a_u, self.user_table[u_idxs]

    def item_repr(self, i_idxs, train: bool = False):
        return self._xs()[i_idxs], self.item_table[i_idxs]

    def eval_rank_dot_parts(self, user_repr_fn, i_repr):
        """The affiliation·interest product is a plain dot of the first
        tuple elements — the embedding tables ride along only for the
        training losses."""
        x_i, _ = i_repr
        return (lambda u_idxs: user_repr_fn(u_idxs)[0]), x_i

    def combine(self, u_repr, i_repr):
        a_u, _ = u_repr
        x_i, _ = i_repr
        if x_i.ndim == 2:
            return jnp.einsum("bk,ck->bc", a_u, x_i)
        return jnp.einsum("bk,bck->bc", a_u, x_i)

    def __call__(self, u_idxs, i_idxs, train: bool = False):
        u_repr = self.user_repr(u_idxs, train=train)
        i_repr = self.item_repr(i_idxs, train=train)
        dots = self.combine(u_repr, i_repr)
        if train:
            xs = self._xs()
            # tag loss: clusters should concentrate on few tags (reference :1009-1017)
            d_c = xs.T @ self.tag_table.value  # [n_clusters, n_tags]
            log_b_c = jax.nn.log_softmax(d_c / self.temp_tags, axis=-1)
            top_log, _ = jax.lax.top_k(log_b_c, min(self.top_p, self.n_tags))
            self.sow("losses", "ts_loss", self.lam_ts * (-top_log).sum())
            # independence loss (reference :1019-1023)
            sim = cosine_sim(self.clusters, self.clusters)
            diag = jnp.diagonal(-jax.nn.log_softmax(sim, axis=-1))
            self.sow("losses", "ind_loss", self.lam_ind * diag.sum())
            # internal BPR on the raw embeddings (reference :1025-1039)
            logits = (jnp.einsum("be,bce->bc", u_repr[1], i_repr[1])
                      if i_repr[1].ndim == 3 else
                      jnp.einsum("be,ce->bc", u_repr[1], i_repr[1]))
            diff = logits[:, :1] - logits[:, 1:]
            bpr = jnp.mean(jax.nn.softplus(-diff))
            self.sow("losses", "cf_loss", self.lam_cf * bpr)
        return dots

    @staticmethod
    def build_from_conf(conf: dict, dataset, device_data) -> "ECF":
        from sibrar_tpu.models.layers import interaction_module_from

        tag_feature_name = conf.get("tag_feature", "tags")
        tag_feature = dataset.item_features[tag_feature_name]
        tag_np = ecf_tag_matrix_from_feature(tag_feature, dataset.n_items)
        return ECF(
            n_users=dataset.n_users,
            n_items=dataset.n_items,
            n_tags=tag_np.shape[1],
            inter_spec=interaction_module_from(device_data, "user"),
            embedding_dim=conf.get("embedding_dim", 100),
            n_clusters=conf.get("n_clusters", 64),
            top_n=conf.get("top_n", 20),
            top_m=conf.get("top_m", 20),
            temp_masking=conf.get("temp_masking", 2.0),
            temp_tags=conf.get("temp_tags", 2.0),
            top_p=conf.get("top_p", 4),
            lam_cf=conf.get("lam_cf", 0.6),
            lam_ind=conf.get("lam_ind", 1.0),
            lam_ts=conf.get("lam_ts", 1.0),
            tag_matrix_init=lambda: tag_np,
        )
