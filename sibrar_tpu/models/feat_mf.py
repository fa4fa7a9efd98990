"""CLCRec-style feature matrix factorization (IFMF / UFMF).

Parity target: `/root/reference/algorithms/sgd_alg.py:1399-1614` — MF plus a
content tower on one entity-side feature, an InfoNCE contrastive loss pulling
profile and content embeddings together, and an optional mean fusion of profile
and content representations for recommendation (`aggregate_for_rec`).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sibrar_tpu.models.base import RecModel
from sibrar_tpu.models.layers import Embedding, FeatureEmbeddingModule
from sibrar_tpu.train.losses import info_nce


class _FeatureMF(RecModel):
    """Shared implementation; `entity` selects which side carries content."""

    n_users: int
    n_items: int
    entity: str  # 'item' (IFMF) or 'user' (UFMF)
    embedding_net: FeatureEmbeddingModule
    embedding_dim: int = 100
    aggregate_for_rec: bool = False
    lambda_content: float = 1e-4
    temperature: float = 0.1
    embedding_loss_aggregator: str = "mean"
    use_user_bias: bool = False
    use_item_bias: bool = False
    use_global_bias: bool = False

    # row-sparse optimizer eligibility (LearningConfig.sparse_tables)
    table_index_map = {"user_embeddings": "user", "item_embeddings": "item",
                       "user_bias": "user", "item_bias": "item"}

    def setup(self):
        self.user_embeddings = Embedding(self.n_users, self.embedding_dim)
        self.item_embeddings = Embedding(self.n_items, self.embedding_dim)
        self.content_net = self.embedding_net.clone(name="content_net")
        if self.use_user_bias:
            self.user_bias = Embedding(self.n_users, 1)
        if self.use_item_bias:
            self.item_bias = Embedding(self.n_items, 1)
        if self.use_global_bias:
            self.global_bias = self.param("global_bias", nn.initializers.zeros, (1,))

    # -------------------------------------------------------------- representations
    def user_repr(self, u_idxs, train: bool = False):
        profile = self.user_embeddings(u_idxs)
        parts = [profile]
        if self.entity == "user":
            parts.append(self.content_net(u_idxs, train=train))
        if self.use_user_bias:
            parts.append(self.user_bias(u_idxs)[..., 0])
        return tuple(parts) if len(parts) > 1 else parts[0]

    def item_repr(self, i_idxs, train: bool = False):
        profile = self.item_embeddings(i_idxs)
        parts = [profile]
        if self.entity == "item":
            parts.append(self.content_net(i_idxs, train=train))
        if self.use_item_bias:
            parts.append(self.item_bias(i_idxs)[..., 0])
        return tuple(parts) if len(parts) > 1 else parts[0]

    # ------------------------------------------------------------------- combining
    def _fuse(self, repr_parts, has_content: bool):
        if not isinstance(repr_parts, tuple):
            return repr_parts, None
        parts = list(repr_parts)
        bias = parts.pop() if (len(parts) == 3 or (len(parts) == 2 and not has_content)) else None
        if has_content and self.aggregate_for_rec:
            embed = (parts[0] + parts[1]) / 2.0
        else:
            embed = parts[0]
        return embed, bias

    def eval_rank_dot_parts(self, user_repr_fn, i_repr):
        """Fused embedding dot + biases decomposes like MF: user/global
        biases are per-user rank-invariant, the item bias joins as an
        appended column."""
        i_embed, i_bias = self._fuse(i_repr, self.entity == "item")

        def u_fn(u_idxs):
            u_embed, _ = self._fuse(user_repr_fn(u_idxs),
                                    self.entity == "user")
            if i_bias is None:
                return u_embed
            return jnp.concatenate(
                [u_embed, jnp.ones((u_embed.shape[0], 1), u_embed.dtype)], 1)

        items = (i_embed if i_bias is None
                 else jnp.concatenate([i_embed, i_bias[:, None]], axis=1))
        return u_fn, items

    def combine(self, u_repr, i_repr):
        u_embed, u_bias = self._fuse(u_repr, self.entity == "user")
        i_embed, i_bias = self._fuse(i_repr, self.entity == "item")
        if i_embed.ndim == 2:
            out = jnp.einsum("be,ce->bc", u_embed, i_embed)
            if i_bias is not None:
                out = out + i_bias[None, :]
        else:
            out = jnp.einsum("be,bce->bc", u_embed, i_embed)
            if i_bias is not None:
                out = out + i_bias
        if u_bias is not None:
            out = out + u_bias[:, None] if u_bias.ndim == 1 else out + u_bias
        if self.use_global_bias:
            out = out + self.global_bias
        return out

    def __call__(self, u_idxs, i_idxs, train: bool = False):
        u_repr = self.user_repr(u_idxs, train=train)
        i_repr = self.item_repr(i_idxs, train=train)
        dots = self.combine(u_repr, i_repr)
        if train:
            if self.entity == "item":
                profile, content = i_repr[0], i_repr[1]
            else:
                # blow up contrast axis for the user side (reference :1564)
                profile, content = u_repr[0][:, None, :], u_repr[1][:, None, :]
            emb_loss = info_nce(
                profile, content, temperature=self.temperature,
                aggregator=self.embedding_loss_aggregator)
            self.sow("losses", "emb_loss", self.lambda_content * emb_loss)
        return dots


class ItemFeatureMatrixFactorization:
    """Factory facade: `build_from_conf` returns a `_FeatureMF` with entity='item'."""

    @staticmethod
    def build_from_conf(conf: dict, dataset) -> "_FeatureMF":
        return _build("item", conf, dataset)


class UserFeatureMatrixFactorization:
    """Factory facade: `build_from_conf` returns a `_FeatureMF` with entity='user'."""

    @staticmethod
    def build_from_conf(conf: dict, dataset) -> "_FeatureMF":
        return _build("user", conf, dataset)


def _build(entity: str, conf: dict, dataset):
    from sibrar_tpu.models.layers import feature_module_from

    feats = dataset.item_features if entity == "item" else dataset.user_features
    fname = conf["feature_name"]
    embedding_dim = conf.get("embedding_dim", 100)
    net = feature_module_from(
        feats[fname], f"{entity}__{fname}",
        pre_embedding_layers=tuple(conf.get("intermediate_layers") or []) or None,
        embedding_dim=embedding_dim,
    )
    return _FeatureMF(
        n_users=dataset.n_users, n_items=dataset.n_items, entity=entity,
        embedding_net=net,
        embedding_dim=embedding_dim,
        aggregate_for_rec=conf.get("aggregate_for_rec", False),
        lambda_content=conf.get("lambda_content", 1e-4),
        temperature=conf.get("temperature", 0.1),
        embedding_loss_aggregator=conf.get("embedding_loss_aggregator", "mean"),
        use_user_bias=conf.get("use_user_bias", False),
        use_item_bias=conf.get("use_item_bias", False),
        use_global_bias=conf.get("use_global_bias", False),
    )
