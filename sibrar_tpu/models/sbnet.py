"""SingleBranchNet (SiBraR) — the RecSys'24 single-branch multi-modal recommender.

Parity target: `/root/reference/algorithms/sgd_alg.py:1764-2144`:
- each entity has per-modality projection modules to a `common_modality_dim`,
  then ONE shared single-branch MLP encodes whichever modality was sampled;
- training samples 1–2 modalities per example (1 for no_regularization, 2 for
  pairwise_single / central_modality), with an optional InfoNCE loss between the
  two sampled modalities' single-branch embeddings;
- evaluation runs ALL eval modalities through the branch and aggregates
  (mean/max); 'interactions' and '{entity}_embedding' are synthetic modalities;
- cold-start entities drop the 'interactions' modality at eval (:1896-1897).

TPU-first design (SURVEY.md §7.3): modality selection inside jit is a dense
compute-all-then-gather: every train modality's projection is computed for the
batch ([n_mod, ..., d_common] stack) and the sampled k are gathered with
`take_along_axis`. This costs n_mod× projection FLOPs (tiny vs the catalog
matmul) but keeps the step fully fused, static-shaped, and MXU-friendly —
replacing the reference's per-modality host loop + semi-batched gathers
(`_get_modality_embeddings` :1934-1978).
"""
from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from sibrar_tpu.config.schema import EmbeddingRegularizationType
from sibrar_tpu.data.sampling import balanced_routing, sample_k_modalities
from sibrar_tpu.models.base import RecModel
from sibrar_tpu.models.layers import (
    Embedding,
    FeatureEmbeddingModule,
    InteractionTower,
    PolyLinear,
    feature_module_from,
    interaction_tower_from,
)
from sibrar_tpu.train.losses import info_nce


# Balanced modality routing for the train forward (see
# SingleBranchNetEntity._routed_projections). False restores the legacy
# compute-all-then-gather path (probes/ablation).
ROUTED_TRAIN_MODALITIES = True


# ------------------------------------------------------------------------ configs
@dataclass
class SingleBranchFeatureConfig:
    feature_name: str
    feature_hidden_layers: Optional[list[int]] = None


@dataclass
class SingleBranchNetEntityConfig:
    features: list[SingleBranchFeatureConfig] = dc_field(default_factory=list)
    single_branch_hidden_layers: list[int] = dc_field(default_factory=list)
    preference_hidden_layers: list[int] = dc_field(default_factory=list)
    common_modality_dim: int = 128
    activation_fn: str = "relu"
    train_modalities: Optional[list[str]] = None
    eval_modalities: Optional[list[str]] = None
    sampling_seed: int = 42
    single_branch_input_dropout: Optional[float] = None
    aggregation_fn: str = "mean"  # 'mean' | 'max'
    normalize_single_branch_input: bool = False
    embedding_regularization_type: EmbeddingRegularizationType = (
        EmbeddingRegularizationType.NO_REGULARIZATION)
    central_modality: Optional[str] = None
    regularization_temperature: float = 1.0
    regularization_weight: float = 1.0
    apply_output_activation: bool = False
    apply_batch_normalization: bool = True
    apply_batch_norm_every: int = 0
    # None -> module default (ROUTED_TRAIN_MODALITIES). False restores the
    # reference's iid compute-all modality sampling for ablation.
    routed_modality_sampling: Optional[bool] = None


@dataclass
class SBFeatureModuleConfig:
    """Plain (non-single-branch) entity tower: one embedded feature."""

    feature_name: str
    embedding_dim: int
    pre_embedding_layers: Optional[list[int]] = None
    post_embedding_layers: Optional[list[int]] = None
    activation_fn: str = "relu"


class SingleBranchNetEntity(RecModel):
    """Per-modality projections + one shared single-branch MLP for one entity."""

    entity: str
    modality_names: Sequence[str]  # train modalities, fixed order
    eval_modality_ids: Sequence[int]  # indices into modality_names used at eval
    modality_modules: Sequence[Union[FeatureEmbeddingModule, InteractionTower, None]]
    # entry None for '{entity}_embedding' (an id-embedding); features use a
    # FeatureEmbeddingModule, 'interactions' a sparse-first-layer InteractionTower
    inter_hidden_layers: Sequence[int]  # interactions-tower hidden sizes (metadata)
    n_entities: int
    common_modality_dim: int
    output_dim: int
    single_branch_hidden_layers: Sequence[int]
    activation_fn: str = "relu"
    single_branch_input_dropout: Optional[float] = None
    aggregation_fn: str = "mean"
    normalize_single_branch_input: bool = False
    embedding_regularization_type: EmbeddingRegularizationType = (
        EmbeddingRegularizationType.NO_REGULARIZATION)
    central_modality_id: int = 0
    regularization_temperature: float = 1.0
    regularization_weight: float = 1.0
    apply_output_activation: bool = False
    apply_batch_normalization: bool = True
    apply_batch_norm_every: int = 0
    routed_modality_sampling: Optional[bool] = None

    def setup(self):
        mods = []
        for name, tmpl in zip(self.modality_names, self.modality_modules):
            if tmpl is None:  # '{entity}_embedding' synthetic modality
                mods.append(Embedding(self.n_entities, self.common_modality_dim,
                                      name=f"mod_{name}"))
            else:  # feature module or interaction tower (sparse first layer)
                mods.append(tmpl.clone(name=f"mod_{name}"))
        self._mods = mods

        bn_every = (self.apply_batch_norm_every if self.apply_batch_normalization
                    else 0)
        if self.apply_batch_normalization and self.apply_batch_norm_every == 0:
            # legacy mode: batch-norm only after the last layer (reference :1832-1837)
            bn_every = -1
        # torch-default init: the reference never applies
        # general_weight_init to the shared branch (sgd_alg.py:1764-2008 has
        # no self.apply) — only the FeatureEmbedding modality modules re-init
        self.sb_net = PolyLinear(
            [self.common_modality_dim, *self.single_branch_hidden_layers,
             self.output_dim],
            activation_fn=self.activation_fn,
            output_fn=self.activation_fn if self.apply_output_activation else None,
            input_dropout=self.single_branch_input_dropout,
            apply_batch_norm_every=bn_every,
            torch_default_init=True)

    # ------------------------------------------------------------------ internals
    def _modality_projection(self, mod, idxs, train: bool):
        if isinstance(mod, (FeatureEmbeddingModule, InteractionTower)):
            return mod(idxs, train=train)
        return mod(idxs)

    def _branch(self, x, train: bool):
        if self.normalize_single_branch_input:
            # zero-safe backward (layers.l2_normalize) — a zero-interaction
            # entity routed to the interactions modality projects to an
            # exact-zero row when tower biases are zero-initialized
            from sibrar_tpu.models.layers import l2_normalize

            x = l2_normalize(x, eps=1e-12)
        return self.sb_net(x, train=train)

    def _aggregate(self, x):
        if self.aggregation_fn == "mean":
            return x.mean(axis=-2)
        if self.aggregation_fn == "max":
            return x.max(axis=-2)
        raise ValueError(f"aggregation {self.aggregation_fn!r} not supported")

    # -------------------------------------------------------------------- forward
    def __call__(self, idxs, train: bool = False):
        if train:
            return self._forward_train(idxs)
        return self._forward_eval(idxs)

    def _forward_train(self, idxs):
        reg_type = self.embedding_regularization_type
        k = 1 if reg_type == EmbeddingRegularizationType.NO_REGULARIZATION else 2
        central = (self.central_modality_id
                   if reg_type == EmbeddingRegularizationType.CENTRAL_MODALITY
                   else None)
        key = self.make_rng("sample")
        routed = (self.routed_modality_sampling
                  if self.routed_modality_sampling is not None
                  else ROUTED_TRAIN_MODALITIES)
        if routed and len(self._mods) > 1:
            picked = self._routed_projections(idxs, key, k, central)
        else:
            # legacy compute-all: stack every modality's projection
            # [..., n_mod, d] and gather the k sampled (n/k of the
            # projection FLOPs wasted; kept for probes/ablation)
            sampled = sample_k_modalities(
                key, idxs.shape, len(self.modality_names), k, central=central)
            all_proj = jnp.stack(
                [self._modality_projection(m, idxs, True) for m in self._mods],
                axis=-2)
            picked = jnp.take_along_axis(
                all_proj, sampled[..., None], axis=-2)  # [..., k, d]
        # NOTE (measured negative, r3): running the branch MLP on a flat
        # [N, d] view of picked (to dodge the [..., 2, d] second-to-minor
        # axis and its {3,0,2,1} relayout copies) does NOT help — XLA
        # re-fans the reshapes out, the op count grows (966 → 1091 names)
        # and the step time is unchanged (2.89 → 2.93 ms), while reduction
        # re-fusion drifts the seeded loss by ~2e-4.
        encoded = self._branch(picked, train=True)  # [..., k, output_dim]

        if k == 2:
            # contrast semantics follow the reference (:1989): for item batches
            # [B, 1+n, d] the candidates of a row contrast each other; for user
            # batches [B, d] users contrast across the batch
            reg = info_nce(
                encoded[..., 0, :], encoded[..., 1, :],
                temperature=self.regularization_temperature)
            self.sow("losses", f"{self.entity}_reg_loss",
                     self.regularization_weight * reg)
        return self._aggregate(encoded)

    def _routed_projections(self, idxs, key, k: int, central):
        """Balanced modality routing: each modality projects only the rows
        assigned to it (static residue classes of a randomly rolled batch),
        so projection work is k× the batch instead of n×.

        Assignment is by flat row position mod P (tables from
        `balanced_routing`); a uniform cyclic shift `delta` per step makes
        every row's marginal modality distribution exactly uniform. All
        row-subset selection is static column slicing of a [G, P] view and
        the assembly is pure stack/reshape — no gathers or scatters, so
        nothing scalarizes on TPU. This mirrors the reference's semi-batched
        per-modality loop (`/root/reference/algorithms/sgd_alg.py:1934-1978`),
        which also runs each modality only on the rows that sampled it.
        Measured (v5e, SBNet bench shapes, 5 modalities incl. interactions):
        9.27 → ~6 ms/step vs compute-all."""
        n = len(self._mods)
        slots_tbl = balanced_routing(n, k, central)  # [P][k] modality ids
        P = len(slots_tbl)
        flat = idxs.reshape(-1)
        T = flat.shape[0]
        G = -(-T // P)
        pad = G * P - T
        if pad:
            # pad rows route through the modules but their outputs are
            # dropped below (< P rows; only BN stats inside modality MLPs
            # could notice, and those are off in reference configs)
            flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
        delta = jax.random.randint(key, (), 0, P)
        rolled = jnp.roll(flat, -delta)
        blocks = rolled.reshape(G, P)

        # modality -> ordered [(residue, slot)] it serves
        assign: dict[int, list[tuple[int, int]]] = {}
        for rho, slots in enumerate(slots_tbl):
            for j, m in enumerate(slots):
                assign.setdefault(m, []).append((rho, j))

        out_cols: list[list] = [[None] * k for _ in range(P)]
        for m in sorted(assign):
            pairs = assign[m]
            sub = jnp.stack([blocks[:, rho] for rho, _ in pairs], axis=1)
            proj = self._modality_projection(self._mods[m], sub, True)
            for pos, (rho, j) in enumerate(pairs):
                out_cols[rho][j] = proj[:, pos]
        picked = jnp.stack(
            [jnp.stack(col, axis=1) for col in out_cols], axis=1)  # [G, P, k, d]
        picked = picked.reshape(G * P, k, picked.shape[-1])
        picked = jnp.roll(picked, delta, axis=0)
        if pad:
            picked = picked[:T]
        return picked.reshape(*idxs.shape, k, picked.shape[-1])

    def _forward_eval(self, idxs):
        projections = [
            self._modality_projection(self._mods[i], idxs, False)
            for i in self.eval_modality_ids
        ]
        stacked = jnp.stack(projections, axis=-2)  # [..., n_eval_mod, d]
        encoded = self._branch(stacked, train=False)
        return self._aggregate(encoded)


class PlainEntityModule(RecModel):
    """Non-single-branch entity tower: one embedded feature (the reference's
    FeatureEmbedding fallback when an entity config is a FeatureModuleConfig)."""

    module: FeatureEmbeddingModule

    def setup(self):
        self.net = self.module.clone(name="net")

    def __call__(self, idxs, train: bool = False):
        return self.net(idxs, train=train)


class PlainIdEmbeddingModule(RecModel):
    """Plain id-embedding entity tower for the synthetic '{entity}_embedding'
    feature (reference sgd_alg.py:2028-2032 treats the entity id as a
    categorical feature). Embeds the batch ids DIRECTLY — routing ids through
    a FeatureEmbeddingModule's device table would read the zero-initialized
    'tables' variable (`populate_tables` only splices real dataset features),
    collapsing every entity onto embedding row 0 (caught by the r4
    trained-quality parity harness: SBNet val ndcg@10 0.12 vs the executed
    reference's 0.19 on identical artifacts/hyperparameters)."""

    n_entities: int
    dim: int

    def setup(self):
        self.embedding = Embedding(self.n_entities, self.dim,
                                   name="embedding")

    def __call__(self, idxs, train: bool = False):
        return self.embedding(idxs)


class SingleBranchNet(RecModel):
    user_module: RecModel
    item_module: RecModel

    def user_repr(self, u_idxs, train: bool = False):
        return self.user_module(u_idxs, train=train)

    def item_repr(self, i_idxs, train: bool = False):
        return self.item_module(i_idxs, train=train)

    # ---------------------------------------------------------------- construction
    @staticmethod
    def build_from_conf(conf: dict, dataset, device_data) -> "SingleBranchNet":
        from sibrar_tpu.config.schema import from_dict

        shared_common_dim = conf["shared_common_dim"]

        def build_entity(entity: str):
            econf = conf[entity]
            is_sb = "features" in econf and not econf.get("embedding_dim")
            n_entities = dataset.n_users if entity == "user" else dataset.n_items
            feats = (dataset.user_features if entity == "user"
                     else dataset.item_features)
            if not is_sb:
                fc = from_dict(SBFeatureModuleConfig, econf)
                emb_dim = fc.embedding_dim if fc.embedding_dim != -1 else shared_common_dim
                if fc.feature_name == f"{entity}_embedding":
                    return PlainIdEmbeddingModule(n_entities=n_entities,
                                                  dim=emb_dim)
                elif fc.feature_name == "interactions":
                    # reference no-user/no-item family (e.g.
                    # sbnet_ml1m_huge_no-item_conf.yml): the plain tower
                    # embeds the entity's interaction row
                    module = interaction_tower_from(
                        device_data, entity,
                        [*(fc.pre_embedding_layers or []), emb_dim],
                        activation_fn=fc.activation_fn, output_fn=None)
                else:
                    module = feature_module_from(
                        feats[fc.feature_name], f"{entity}__{fc.feature_name}",
                        embedding_dim=emb_dim,
                        pre_embedding_layers=tuple(fc.pre_embedding_layers or []) or None,
                        post_embedding_layers=tuple(fc.post_embedding_layers or []) or None,
                        activation_fn=fc.activation_fn)
                return PlainEntityModule(module=module)

            ec = from_dict(SingleBranchNetEntityConfig, econf)
            available = [f.feature_name for f in ec.features]
            train_mods = list(ec.train_modalities or available)
            for m in train_mods:
                if m not in available:
                    raise ValueError(
                        f"Network definitions for modalities {{{m!r}}} are not available!")
            eval_mods = list(ec.eval_modalities or train_mods)
            for m in eval_mods:
                if m not in train_mods:
                    raise ValueError(
                        f'Cannot use modality "{m}" during evaluation, '
                        f"if it is not used during training.")
            # cold-start entities have no eval-time interactions (:1896-1897)
            is_cold = (dataset.is_cold_start_user if entity == "user"
                       else dataset.is_cold_start_item)
            if is_cold:
                eval_mods = [m for m in eval_mods if m != "interactions"]
            if len(eval_mods) == 0 or len(train_mods) == 0:
                raise ValueError(
                    "No single modality is available "
                    f"during {'training' if not train_mods else 'evaluation'}")

            hidden_by_name = {f.feature_name: f.feature_hidden_layers or []
                              for f in ec.features}
            modules: list = []
            inter_hidden: tuple = ()
            for name in train_mods:
                if name == "interactions":
                    # sparse-first-layer tower (embedding-bag over the CSR row)
                    modules.append(interaction_tower_from(
                        device_data, entity,
                        [*hidden_by_name[name], ec.common_modality_dim],
                        activation_fn=ec.activation_fn,
                        output_fn=ec.activation_fn))
                    inter_hidden = tuple(hidden_by_name[name])
                elif name == f"{entity}_embedding":
                    modules.append(None)
                else:
                    modules.append(feature_module_from(
                        feats[name], f"{entity}__{name}",
                        embedding_dim=ec.common_modality_dim,
                        pre_embedding_layers=tuple(hidden_by_name[name]) or None,
                        activation_fn=ec.activation_fn))

            central_id = 0
            if (ec.embedding_regularization_type
                    == EmbeddingRegularizationType.CENTRAL_MODALITY):
                if ec.central_modality not in train_mods:
                    raise ValueError(
                        f"central modality {ec.central_modality!r} not in train modalities")
                central_id = train_mods.index(ec.central_modality)

            return SingleBranchNetEntity(
                entity=entity,
                modality_names=tuple(train_mods),
                eval_modality_ids=tuple(train_mods.index(m) for m in eval_mods),
                modality_modules=tuple(modules),
                inter_hidden_layers=inter_hidden,
                n_entities=n_entities,
                common_modality_dim=ec.common_modality_dim,
                output_dim=shared_common_dim,
                single_branch_hidden_layers=tuple(ec.single_branch_hidden_layers),
                activation_fn=ec.activation_fn,
                single_branch_input_dropout=ec.single_branch_input_dropout,
                aggregation_fn=ec.aggregation_fn,
                normalize_single_branch_input=ec.normalize_single_branch_input,
                embedding_regularization_type=ec.embedding_regularization_type,
                central_modality_id=central_id,
                regularization_temperature=ec.regularization_temperature,
                regularization_weight=ec.regularization_weight,
                apply_output_activation=ec.apply_output_activation,
                apply_batch_normalization=ec.apply_batch_normalization,
                apply_batch_norm_every=ec.apply_batch_norm_every,
                routed_modality_sampling=ec.routed_modality_sampling,
            )

        return SingleBranchNet(
            user_module=build_entity("user"), item_module=build_entity("item"))

