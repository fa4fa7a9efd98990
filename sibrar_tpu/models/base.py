"""Model base contract and variable plumbing.

The reference's core interface is the 3-way representation split
(`/root/reference/algorithms/base_classes.py:87-145`):
`get_user_representations` / `get_item_representations` /
`combine_user_item_representations`, which exists so full-catalog evaluation can
compute item representations once and reuse them across user batches
(`/root/reference/eval/eval.py:208-217`). Here the same contract is expressed as
pure flax.linen methods over a params pytree:

- ``user_repr(u_idxs, train)``  → representation (array or tuple of arrays)
- ``item_repr(i_idxs, train)``  → representation; `i_idxs` may be `[B, 1+n]`
  (training) or `[C]` (full catalog at eval)
- ``combine(u_repr, i_repr)``   → logits `[B, 1+n]` or `[B, C]`
- ``__call__(u_idxs, i_idxs, train)`` → logits; regularization losses are sown
  into the `losses` collection (replacing the reference's stateful
  `get_and_reset_other_loss`, `/root/reference/algorithms/base_classes.py:137-145`).

Variable collections: `params` (trained), `tables` (frozen feature tables fed
from `DeviceData`), `batch_stats` (BatchNorm), `losses` (sown aux losses).
RNG streams: `sample` (negative/modality/dropout-strategy sampling), `dropout`.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from sibrar_tpu.data.dataset import DeviceData


class RecModel(nn.Module):
    """Base for SGD-trained recommenders (the reference's SGDBasedRecommenderAlgorithm)."""

    def user_repr(self, u_idxs, train: bool = False):
        raise NotImplementedError

    def item_repr(self, i_idxs, train: bool = False):
        raise NotImplementedError

    @property
    def combine_is_dot(self) -> bool:
        """True when `combine` is exactly the base dot product — lets the
        evaluator run the fused matmul→top-k fast path
        (`eval/evaluator.make_dot_eval_batch`). Models whose combine reduces
        to a dot under some configs (e.g. bias-free MF) override this."""
        return type(self).combine is RecModel.combine

    def eval_rank_dot_parts(self, user_repr_fn, i_repr):
        """``(user_fn, item_matrix)`` whose per-user dot-product ranking equals
        `combine`'s ranking, or None. Enables the evaluator's fused
        matmul→top-k fast path (`eval/evaluator.make_dot_eval_batch`) for
        models whose combine is a rank-preserving transform of a dot —
        the fast path uses only the returned top-k INDICES, so monotone (or
        per-user-constant-shift) transforms of the score are fair game."""
        if self.combine_is_dot:
            return user_repr_fn, i_repr
        return None

    def combine(self, u_repr, i_repr):
        """Default: dot product; supports [B,1+n,d] batch and [C,d] catalog layouts
        (reference `/root/reference/algorithms/sgd_alg.py:2101-2114`)."""
        u = u_repr[0] if isinstance(u_repr, tuple) else u_repr
        i = i_repr[0] if isinstance(i_repr, tuple) else i_repr
        if i.ndim == 2:
            return jnp.einsum("be,ce->bc", u, i)
        return jnp.einsum("be,bce->bc", u, i)

    def __call__(self, u_idxs, i_idxs, train: bool = False):
        u_repr = self.user_repr(u_idxs, train=train)
        i_repr = self.item_repr(i_idxs, train=train)
        return self.combine(u_repr, i_repr)


def init_model(model: nn.Module, rng: jax.Array, device_data: DeviceData,
               batch_size: int = 2, n_neg: int = 2) -> Dict[str, Any]:
    """Initialize variables and splice real feature tables into `tables`."""
    u = jnp.zeros((batch_size,), dtype=jnp.int32)
    i = jnp.zeros((batch_size, 1 + n_neg), dtype=jnp.int32)
    rngs = {"params": rng, "sample": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2)}
    variables = model.init(rngs, u, i, train=True)
    return populate_tables(variables, device_data)


def init_model_abstract(model: nn.Module, rng: jax.Array, device_data: DeviceData,
                        batch_size: int = 2, n_neg: int = 2) -> Dict[str, Any]:
    """Structure-only init for checkpoint-restore paths: `jax.eval_shape` traces
    `model.init` without compiling or executing it, leaves are materialized as
    zeros, and the real feature tables are spliced in. Used by run_test /
    run_gather, where params/batch_stats are immediately overwritten by the
    restored checkpoint — saves one full XLA compile per test phase (minutes
    through the TPU tunnel)."""
    u = jnp.zeros((batch_size,), dtype=jnp.int32)
    i = jnp.zeros((batch_size, 1 + n_neg), dtype=jnp.int32)
    rngs = {"params": rng, "sample": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2)}
    abstract = jax.eval_shape(lambda r: model.init(r, u, i, train=True), rngs)
    concrete = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), abstract)
    return populate_tables(dict(concrete), device_data)


def populate_tables(variables: Dict[str, Any], device_data: DeviceData) -> Dict[str, Any]:
    """Replace zero-initialized `tables` leaves with the real device tables.

    Table variables are named ``{entity}__{feature}`` (see
    `sibrar_tpu.models.layers.feature_module_from`); special names
    ``user__interactions`` / ``item__interactions`` densify lazily and are
    instead read through `DeviceCSR` by the modules that need them.
    """
    if "tables" not in variables:
        return variables
    lookup = {}
    for name, table in device_data.user_features.items():
        lookup[f"user__{name}"] = table
    for name, table in device_data.item_features.items():
        lookup[f"item__{name}"] = table
    # interaction-vector access (DMF, DropoutNet, SBNet 'interactions' modality)
    lookup["user__inter_indptr"] = device_data.user_inter_csr.indptr
    lookup["user__inter_indices"] = device_data.user_inter_csr.indices
    lookup["item__inter_indptr"] = device_data.item_inter_csr.indptr
    lookup["item__inter_indices"] = device_data.item_inter_csr.indices
    # padded-row materializations (declared by the towers exactly when
    # `ops.sparse.padded_cols_viable`; `to_device` applies the same gate)
    if device_data.user_inter_csr.cols_pad is not None:
        lookup["user__inter_cols_pad"] = device_data.user_inter_csr.cols_pad
    if device_data.item_inter_csr.cols_pad is not None:
        lookup["item__inter_cols_pad"] = device_data.item_inter_csr.cols_pad

    unmatched: list = []

    def replace(tree, path=""):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k in lookup and not isinstance(v, dict):
                    out[k] = lookup[k]
                elif isinstance(v, dict):
                    out[k] = replace(v, f"{path}{k}/")
                else:
                    # only the '{entity}__{feature}' naming convention is
                    # zero-initialized awaiting a splice; other table
                    # variables (e.g. ECF's tag_matrix) self-initialize
                    if k.startswith(("user__", "item__")):
                        unmatched.append(f"{path}{k}")
                    out[k] = v
            return out
        return tree

    variables = dict(variables)
    variables["tables"] = replace(dict(variables["tables"]))
    if unmatched:
        # a declared table leaf no device table matches would silently stay
        # ZERO — exactly the bug class the r4 trained-parity harness caught
        # (a synthetic id feature routed through the table machinery read
        # row 0 for every entity). Fail loudly instead.
        raise ValueError(
            "model declares feature table(s) with no matching device table: "
            f"{sorted(unmatched)} — available: {sorted(lookup)}. Synthetic "
            "features (entity ids) must embed directly, not via the device "
            "table collection.")
    return variables


def collect_reg_loss(aux_collections: Dict[str, Any]) -> jax.Array:
    """Sum every loss sown into the `losses` collection (reg_loss equivalent)."""
    losses = aux_collections.get("losses", {})
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(losses):
        total = total + jnp.sum(leaf)
    return jnp.asarray(total, dtype=jnp.float32)
