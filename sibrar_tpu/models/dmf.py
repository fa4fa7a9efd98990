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
from sibrar_tpu.models.layers import InteractionVectorModule, PolyLinear, interaction_module_from


def _l2norm(x, eps=1e-8):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class DeepMatrixFactorization(RecModel):
    n_users: int
    n_items: int
    u_spec: InteractionVectorModule  # template holding CSR shape metadata
    i_spec: InteractionVectorModule
    u_mid_layers: Sequence[int] = ()
    i_mid_layers: Sequence[int] = ()
    final_dimension: int = 64
    mu: float = 1e-6
    normalize_interactions: bool = False
    normalize_representations: bool = False
    use_output_activation_fn: bool = False

    def setup(self):
        out_fn = "relu" if self.use_output_activation_fn else None
        self.user_vectors = self.u_spec.clone(
            normalize=self.normalize_interactions, name="user_vectors")
        self.item_vectors = self.i_spec.clone(
            normalize=self.normalize_interactions, name="item_vectors")
        self.user_nn = PolyLinear(
            [self.n_items, *self.u_mid_layers, self.final_dimension],
            activation_fn="relu", output_fn=out_fn)
        self.item_nn = PolyLinear(
            [self.n_users, *self.i_mid_layers, self.final_dimension],
            activation_fn="relu", output_fn=out_fn)

    def user_repr(self, u_idxs, train: bool = False):
        u_vec = self.user_vectors(u_idxs)
        u = self.user_nn(u_vec, train=train)
        return _l2norm(u) if self.normalize_representations else u

    def item_repr(self, i_idxs, train: bool = False):
        i_vec = self.item_vectors(i_idxs)
        i = self.item_nn(i_vec, train=train)
        return _l2norm(i) if self.normalize_representations else i

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
        return DeepMatrixFactorization(
            n_users=dataset.n_users,
            n_items=dataset.n_items,
            u_spec=interaction_module_from(device_data, "user"),
            i_spec=interaction_module_from(device_data, "item"),
            u_mid_layers=tuple(conf.get("u_mid_layers", []) or []),
            i_mid_layers=tuple(conf.get("i_mid_layers", []) or []),
            final_dimension=conf["final_dimension"],
            mu=conf.get("mu", 1e-6),
            normalize_interactions=conf.get("normalize_interactions", False),
            normalize_representations=conf.get("normalize_representations", False),
            use_output_activation_fn=conf.get("use_output_activation_fn", False),
        )
