"""DropoutNet (Volkovs et al., NeurIPS'17) — cold-start via preference dropout.

Parity target: `/root/reference/algorithms/sgd_alg.py:1617-1761` — per-entity
tower over [content features ‖ preference-MLP(interaction vector)], where during
training each sample's preference vector is randomly replaced by zeros
(simulating a cold entity); evaluation always uses full information.

TPU-first difference: the reference samples the dropout strategy on host with a
numpy RNG and slices scipy rows for the kept entities
(`sample_training_strategy` :1680-1685, `get_user_representations` :1687-1706).
Here the whole thing is one on-device masked computation: dense interaction rows
via the CSR scatter, a Bernoulli(0.5) mask from the `sample` RNG stream, and a
multiply — no host round-trip, no ragged batches.
"""
from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from sibrar_tpu.models.base import RecModel
from sibrar_tpu.models.layers import (
    FeatureEmbeddingModule,
    InteractionTower,
    PolyLinear,
    feature_module_from,
    interaction_tower_from,
)


@dataclass
class DropoutNetFeature:
    feature_name: str
    embedding_dim: int
    pre_embedding_layers: Optional[list[int]] = None
    post_embedding_layers: Optional[list[int]] = None
    activation_fn: str = "relu"


@dataclass
class DropoutNetEntityConfig:
    features: list[DropoutNetFeature] = dc_field(default_factory=list)
    preference_layers: list[int] = dc_field(default_factory=lambda: [64])
    common_hidden_layers: list[int] = dc_field(default_factory=lambda: [64])
    activation_fn: str = "relu"


class DropoutNetEntity(RecModel):
    """One entity tower: pref_net(interactions) ‖ content embeddings → MLP."""

    entity: str
    pref_tower: InteractionTower  # sparse-first-layer preference MLP
    preference_dim: int
    cont_modules: Sequence[FeatureEmbeddingModule]
    preference_layers: Sequence[int]
    common_hidden_layers: Sequence[int]
    shared_common_dim: int
    activation_fn: str = "relu"

    def setup(self):
        self.pref_net = self.pref_tower.clone(name="pref_net")
        self.content = [m.clone(name=f"cont_{m.feature_name}")
                        for m in self.cont_modules]
        cont_dim = sum(m.output_dim for m in self.cont_modules)
        # torch-default init: the reference's DropoutNetEntity never applies
        # general_weight_init to its pref/common nets (sgd_alg.py:1618-1655);
        # only its FeatureEmbedding content modules re-init (kaiming). The
        # r4 trained-parity harness measured the kaiming-everywhere variant
        # at 0.147 vs the reference's 0.263 ndcg@10 (init 30x hotter,
        # slower convergence) before this matched.
        self.net = PolyLinear(
            [self.preference_layers[-1] + cont_dim, *self.common_hidden_layers,
             self.shared_common_dim],
            activation_fn=self.activation_fn, output_fn=self.activation_fn,
            torch_default_init=True)

    def __call__(self, idxs, train: bool = False):
        scale = None
        if train:
            # randomly zero the preference vector (cold simulation): Normal
            # vs NoPreference with equal probability, sampled PER BATCH ROW
            # (reference sample_training_strategy draws len(i_idxs) = B
            # strategies, sgd_alg.py:1681-1727 — all 1+n_neg candidates of
            # a row share one strategy, which keeps the BPR pos-neg diffs
            # within one regime; per-instance sampling measured ~-0.03
            # converged ndcg in the r4 trained-parity harness). Zeroing the
            # input equals scaling the pre-bias sum of the first layer.
            key = self.make_rng("sample")
            keep = jax.random.bernoulli(key, 0.5, shape=idxs.shape[:1])
            keep = keep.reshape(idxs.shape[:1] + (1,) * (idxs.ndim - 1))
            scale = jnp.broadcast_to(keep, idxs.shape)[..., None].astype(
                jnp.float32)
        pref = self.pref_net(idxs, train=train, scale=scale)
        cont = [m(idxs, train=train) for m in self.content]
        x = jnp.concatenate([*cont, pref], axis=-1)
        return self.net(x, train=train)


class DropoutNet(RecModel):
    user_net: DropoutNetEntity
    item_net: DropoutNetEntity

    def user_repr(self, u_idxs, train: bool = False):
        return self.user_net(u_idxs, train=train)

    def item_repr(self, i_idxs, train: bool = False):
        return self.item_net(i_idxs, train=train)

    @staticmethod
    def build_from_conf(conf: dict, dataset, device_data) -> "DropoutNet":
        from sibrar_tpu.config.schema import from_dict

        shared = conf["shared_common_dim"]

        def entity_net(entity: str) -> DropoutNetEntity:
            ec = from_dict(DropoutNetEntityConfig, conf[entity])
            feats = (dataset.user_features if entity == "user"
                     else dataset.item_features)
            cont = tuple(
                feature_module_from(
                    feats[f.feature_name], f"{entity}__{f.feature_name}",
                    embedding_dim=f.embedding_dim,
                    pre_embedding_layers=tuple(f.pre_embedding_layers or []) or None,
                    post_embedding_layers=tuple(f.post_embedding_layers or []) or None,
                    activation_fn=f.activation_fn,
                )
                for f in ec.features
            )
            pref_dim = dataset.n_items if entity == "user" else dataset.n_users
            return DropoutNetEntity(
                entity=entity,
                pref_tower=interaction_tower_from(
                    device_data, entity, list(ec.preference_layers),
                    activation_fn=ec.activation_fn,
                    output_fn=ec.activation_fn,
                    torch_default_init=True),
                preference_dim=pref_dim,
                cont_modules=cont,
                preference_layers=tuple(ec.preference_layers),
                common_hidden_layers=tuple(ec.common_hidden_layers),
                shared_common_dim=shared,
                activation_fn=ec.activation_fn,
            )

        return DropoutNet(user_net=entity_net("user"), item_net=entity_net("item"))
