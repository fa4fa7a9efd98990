"""Deep Matrix Factorization (Xue et al., IJCAI'17).

Parity target: `/root/reference/algorithms/sgd_alg.py:1141-1276` — two MLP towers
over raw train-interaction vectors (user row / item column of the train matrix),
cosine similarity clamped below at `mu`, optional interaction/representation
normalization, optional output activation.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from sibrar_tpu.data.dataset import DeviceData
from sibrar_tpu.models.base import RecModel
from sibrar_tpu.models.layers import InteractionTower, interaction_tower_from


def _l2norm(x, eps=1e-8):
    # zero-safe backward (layers.l2_normalize): zero-interaction entities
    # reach the cosine as exact-zero tower outputs
    from sibrar_tpu.models.layers import l2_normalize

    return l2_normalize(x, eps=eps)


class DeepMatrixFactorization(RecModel):
    n_users: int
    n_items: int
    u_tower: InteractionTower  # sparse-first-layer MLP over interaction rows
    i_tower: InteractionTower
    u_mid_layers: Sequence[int] = ()
    i_mid_layers: Sequence[int] = ()
    final_dimension: int = 64
    mu: float = 1e-6
    normalize_interactions: bool = False
    normalize_representations: bool = False
    use_output_activation_fn: bool = False

    def setup(self):
        self.user_nn = self.u_tower.clone(name="user_nn")
        self.item_nn = self.i_tower.clone(name="item_nn")

    def user_repr(self, u_idxs, train: bool = False):
        u = self.user_nn(u_idxs, train=train)
        return _l2norm(u) if self.normalize_representations else u

    def item_repr(self, i_idxs, train: bool = False):
        i = self.item_nn(i_idxs, train=train)
        return _l2norm(i) if self.normalize_representations else i

    def eval_rank_dot_parts(self, user_repr_fn, i_repr):
        """max(cos, mu) ranks identically to the raw cosine (the clamp only
        creates rank-arbitrary ties below mu, which torch.topk also breaks
        arbitrarily) — normalize both sides and ride the fused dot path."""
        return (lambda u: _l2norm(user_repr_fn(u))), _l2norm(i_repr)

    def combine(self, u_repr, i_repr):
        u = _l2norm(u_repr)
        i = _l2norm(i_repr)
        if i.ndim == 2:
            sim = jnp.einsum("be,ce->bc", u, i)
        else:
            sim = jnp.einsum("be,bce->bc", u, i)
        return jnp.maximum(sim, self.mu)

    @staticmethod
    def build_from_conf(conf: dict, dataset, device_data: DeviceData
                        ) -> "DeepMatrixFactorization":
        out_fn = "relu" if conf.get("use_output_activation_fn", False) else None
        normalize = conf.get("normalize_interactions", False)
        u_mid = tuple(conf.get("u_mid_layers", []) or [])
        i_mid = tuple(conf.get("i_mid_layers", []) or [])
        final = conf["final_dimension"]
        return DeepMatrixFactorization(
            n_users=dataset.n_users,
            n_items=dataset.n_items,
            u_tower=interaction_tower_from(
                device_data, "user", [*u_mid, final], output_fn=out_fn,
                normalize=normalize),
            i_tower=interaction_tower_from(
                device_data, "item", [*i_mid, final], output_fn=out_fn,
                normalize=normalize),
            u_mid_layers=u_mid,
            i_mid_layers=i_mid,
            final_dimension=final,
            mu=conf.get("mu", 1e-6),
            normalize_interactions=normalize,
            normalize_representations=conf.get("normalize_representations", False),
            use_output_activation_fn=conf.get("use_output_activation_fn", False),
        )
