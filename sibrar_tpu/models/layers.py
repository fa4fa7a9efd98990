"""Shared neural building blocks (flax.linen).

Parity targets:
- `PolyLinear` — the reference's configurable MLP builder
  (`/root/reference/modules/polylinear.py:17-77`): layer sizes, activation map
  {relu, tanh, sigmoid, selu}, optional output activation, input dropout,
  batch-norm every N layers / only-last (-1), optional L1 penalty on weights
  (reference wraps layers in torchlayers L1; here the penalty is sown as an aux
  loss the trainer adds to the objective).
- `FeatureEmbeddingModule` — the reference's per-feature embedding
  (`/root/reference/algorithms/sgd_alg.py:1279-1396`): nn.Embedding for
  categoricals, masked-mean EmbeddingBag-with-padding for tags, PolyLinear
  pre/post projections for vector/continuous features.
- weight init — Kaiming-uniform(relu) Linear with zero bias, N(0, 0.1/dim)
  embeddings (`/root/reference/train/utils.py:5-13`).

TPU-first notes: feature tables live in a non-trainable `tables` variable
collection so they ride along in the jitted step without being baked into the
program as constants; tag reduction is a masked matmul-free segment mean on the
VPU; all shapes are static.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ACTIVATION_FN_MAP: dict[str, Callable] = {
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "selu": nn.selu,
}


def l2_normalize(x: jax.Array, axis: int = -1,
                 eps: float = 1e-8) -> jax.Array:
    """l2-normalize with a zero-safe BACKWARD.

    ``x / max(||x||, eps)`` has a NaN gradient at ``x == 0``: the max guard
    protects the value, but ``d||x||/dx`` at zero is 0·inf = NaN and the
    max's zero subgradient multiplies INTO it, not over it. torch defines
    the norm subgradient at 0 as 0 (so the reference trains through
    zero-interaction entities); JAX does not. Clamping the SQUARED norm
    before the rsqrt puts the zero-input case on the constant branch of the
    max, so the cotangent through the norm is exactly 0 there. Caught by
    the mid-scale trained-parity harness: DMF's zero-bias towers emit exact
    zeros for tail items with no train interactions, and every step NaN'd
    (ndcg 0.0072 vs the reference's 0.0952)."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * lax.rsqrt(jnp.maximum(sq, eps * eps))


def get_activation_fn(activation_fn):
    if activation_fn is None:
        return None
    if isinstance(activation_fn, str):
        return ACTIVATION_FN_MAP[activation_fn]
    return activation_fn


def kaiming_uniform_relu(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(nonlinearity='relu'): U(-b, b), b = sqrt(6/fan_in)."""
    fan_in = shape[0]
    bound = np.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def embedding_init(key, shape, dtype=jnp.float32):
    """N(0, 0.1/dim) per the reference's embedding init."""
    return 0.1 / shape[-1] * jax.random.normal(key, shape, dtype)


class Embedding(nn.Module):
    """nn.Embed with the reference's N(0, .1/dim) initialization.

    Row injection (sparse-table training): when the caller supplies a
    ``rows`` variable collection (`Trainer`'s sparse train step gathers
    ``table[idxs]`` OUTSIDE autodiff and differentiates w.r.t. the rows),
    the module returns the injected rows instead of gathering — so the
    backward never materializes a dense ``[n, d]`` scatter-add grad for the
    table. The injected rows MUST be the gather of exactly the ``idxs`` this
    call receives; the shape assert catches index-contract violations
    (see `train/row_adam.py` and `LearningConfig.sparse_tables`)."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, idxs):
        table = self.param(
            "embedding", embedding_init, (self.num_embeddings, self.features))
        if self.has_variable("rows", "rows"):
            rows = self.get_variable("rows", "rows")
            expect = tuple(idxs.shape) + (self.features,)
            if tuple(rows.shape) != expect:
                raise ValueError(
                    f"injected rows {rows.shape} do not match the gather "
                    f"{expect} for table {self.name!r} — table_index_map "
                    "source mismatch")
            return rows
        return jnp.take(table, idxs, axis=0)


def torch_default_uniform(key, shape, dtype=jnp.float32):
    """torch nn.Linear DEFAULT init: ``kaiming_uniform_(a=sqrt(5))`` =
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)). The reference only re-initializes
    modules that explicitly ``apply(general_weight_init)`` (FeatureEmbedding,
    MF/ProtoMF embeddings, DMF towers); DropoutNet's preference/common nets
    and SBNet's shared branch keep THIS default — 2.45x smaller per layer
    than kaiming-relu, which compounds across depth (the r4 trained-parity
    harness measured DropoutNet at 0.147 vs the reference's 0.263 ndcg@10
    before matching it)."""
    fan_in = shape[0]
    b = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-b, maxval=b)


class Dense(nn.Module):
    """Linear layer with the reference's init: kaiming-uniform W + zero bias
    (general_weight_init) by default, or torch's default Linear init
    (U(±1/sqrt(fan_in)) for W AND bias) with ``torch_default_init``."""

    features: int
    use_bias: bool = True
    torch_default_init: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kinit = (torch_default_uniform if self.torch_default_init
                 else kaiming_uniform_relu)
        kernel = self.param("kernel", kinit, (in_dim, self.features))
        y = x @ kernel
        if self.use_bias:
            if self.torch_default_init:
                bnd = 1.0 / np.sqrt(in_dim)
                binit = (lambda key, shape, dtype=jnp.float32:
                         jax.random.uniform(key, shape, dtype, -bnd, bnd))
            else:
                binit = nn.initializers.zeros
            bias = self.param("bias", binit, (self.features,))
            y = y + bias
        return y


class PolyLinear(nn.Module):
    """Configurable MLP; mirrors reference PolyLinear semantics.

    `layer_config=[100, 50, 2]` → Dense(100→50), act, Dense(50→2); activation
    only between layers; `output_fn` applied at the end if set; batch-norm
    (before the activation) every `apply_batch_norm_every` layers, or after the
    last layer when -1.
    """

    layer_config: Sequence[int]
    activation_fn: str | Callable = "relu"
    output_fn: str | Callable | None = "relu"
    input_dropout: Optional[float] = None
    apply_batch_norm_every: int = 0
    l1_weight_decay: Optional[float] = None
    torch_default_init: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.layer_config) > 1, "need at least in and out dims"
        act = get_activation_fn(self.activation_fn)
        out_fn = get_activation_fn(self.output_fn)
        n_layers = len(self.layer_config) - 1

        if self.input_dropout is not None:
            x = nn.Dropout(rate=self.input_dropout, deterministic=not train)(x)

        l1_penalty = 0.0
        for i, d2 in enumerate(self.layer_config[1:]):
            layer = Dense(features=d2, name=f"linear_{i}",
                          torch_default_init=self.torch_default_init)
            x = layer(x)
            if self.l1_weight_decay and self.l1_weight_decay > 0.0:
                kernel = layer.variables["params"]["kernel"]
                l1_penalty = l1_penalty + self.l1_weight_decay * jnp.abs(kernel).sum()
            if self.apply_batch_norm_every > 0 and (i + 1) % self.apply_batch_norm_every == 0:
                x = nn.BatchNorm(
                    use_running_average=not train, name=f"batch_norm_{i}",
                    momentum=0.9, epsilon=1e-5,
                )(x)
            if i < n_layers - 1:
                x = act(x)

        if self.apply_batch_norm_every == -1:
            x = nn.BatchNorm(
                use_running_average=not train, name="batch_norm",
                momentum=0.9, epsilon=1e-5,
            )(x)
        if out_fn is not None:
            x = out_fn(x)
        if self.l1_weight_decay and self.l1_weight_decay > 0.0:
            self.sow("losses", "l1_penalty", l1_penalty)
        return x


# One-hot-contraction cutoff for TagEmbeddingBag: below this tag-vocabulary
# size the bag rides two MXU matmuls (fwd AND bwd); above it the multiplicity
# matrix outgrows the gather it replaces. XLA lowers the take+sum backward to
# a row scatter-add, which costs ~20 ns/row on TPU even for a [24, 512] table
# (profiled 0.12 ms/step of the SBNet epoch for the genres modality).
_ONEHOT_BAG_MAX_TAGS = 2048


class TagEmbeddingBag(nn.Module):
    """Masked-mean embedding of padded tag id rows.

    Equivalent of torch ``nn.EmbeddingBag(n_tags + 1, d, padding_idx=-1)`` with
    the default 'mean' mode: padded slots are excluded from both sum and count.

    For small tag vocabularies the sum is computed as a multiplicity-matrix
    matmul (``Σ_w onehot(tag_w)``, small exact ints, contracted against the
    table on the MXU) so the backward is a matmul too — no scatter-add.
    """

    n_tags: int
    features: int

    @nn.compact
    def __call__(self, padded_tags):  # [..., width] int ids; pad id == n_tags
        table = self.param("embedding", embedding_init, (self.n_tags, self.features))
        mask = (padded_tags < self.n_tags)[..., None]  # [..., width, 1]
        if self.n_tags <= _ONEHOT_BAG_MAX_TAGS:
            iota = jnp.arange(self.n_tags, dtype=jnp.int32)
            oh = (padded_tags[..., None] == iota) & mask  # [..., width, n_tags]
            mult = oh.astype(jnp.float32).sum(axis=-2)  # [..., n_tags]
            summed = jnp.einsum("...t,td->...d", mult, table,
                                preferred_element_type=jnp.float32)
        else:
            safe = jnp.minimum(padded_tags, self.n_tags - 1)
            emb = jnp.take(table, safe, axis=0)  # [..., width, d]
            summed = jnp.where(mask, emb, 0.0).sum(axis=-2)
        count = jnp.maximum(mask.sum(axis=-2), 1)
        return summed / count


class FeatureEmbeddingModule(nn.Module):
    """Embed one feature, reading its dense table from the `tables` collection.

    Static spec fields describe the feature; the table itself is a non-trainable
    variable initialized from the host-side `Feature.table`.
    """

    feature_name: str
    feature_kind: str  # 'categorical' | 'tag' | 'numeric' (vector/continuous/...)
    table_shape: tuple  # shape of the dense table
    table_dtype: str
    n_categories: int = 0  # for categorical/tag
    embedding_dim: Optional[int] = None
    pre_embedding_layers: Optional[Sequence[int]] = None
    post_embedding_layers: Optional[Sequence[int]] = None
    activation_fn: str = "relu"

    @property
    def output_dim(self) -> int:
        if self.feature_kind in ("categorical", "tag"):
            out = self.embedding_dim
            if self.post_embedding_layers:
                out = self.post_embedding_layers[-1]
            return out
        width = int(np.prod(self.table_shape[1:])) if len(self.table_shape) > 1 else 1
        out = width
        if self.pre_embedding_layers:
            out = self.pre_embedding_layers[-1]
        if self.embedding_dim is not None:
            out = self.embedding_dim
        if self.post_embedding_layers:
            out = self.post_embedding_layers[-1]
        return out

    @nn.compact
    def __call__(self, idxs, train: bool = False):
        table_var = self.variable(
            "tables", self.feature_name,
            lambda: jnp.zeros(self.table_shape, dtype=self.table_dtype))
        raw = jnp.take(table_var.value, idxs, axis=0)  # [..., feature dims]

        if self.feature_kind == "categorical":
            if self.embedding_dim is None:
                raise ValueError(
                    f"categorical feature {self.feature_name!r} needs embedding_dim")
            x = Embedding(self.n_categories, self.embedding_dim, name="embedding")(raw)
        elif self.feature_kind == "tag":
            if self.embedding_dim is None:
                raise ValueError(f"tag feature {self.feature_name!r} needs embedding_dim")
            x = TagEmbeddingBag(self.n_categories, self.embedding_dim, name="embedding")(raw)
        else:
            x = raw.astype(jnp.float32)
            if x.shape == idxs.shape:  # scalar features -> width-1 vectors
                x = x[..., None]
            if len(self.table_shape) > 2:  # matrix features -> flattened rows
                x = x.reshape(x.shape[: idxs.ndim] + (-1,))
            width = x.shape[-1]
            cfg = [width]
            if self.pre_embedding_layers:
                cfg.extend(self.pre_embedding_layers)
            if self.embedding_dim is not None:
                cfg.append(self.embedding_dim)
            if len(cfg) > 1:
                x = PolyLinear(
                    cfg, activation_fn=self.activation_fn,
                    output_fn=self.activation_fn, name="pre_embedding",
                )(x, train=train)

        if self.post_embedding_layers:
            x = PolyLinear(
                [x.shape[-1], *self.post_embedding_layers],
                activation_fn=self.activation_fn, output_fn=self.activation_fn,
                name="post_embedding",
            )(x, train=train)
        return x


class InteractionVectorModule(nn.Module):
    """Materialize dense train-interaction rows for a batch of entity ids.

    The on-device equivalent of the reference's
    `InteractionRecDataset.get_{user,item}_interaction_vectors`
    (`/root/reference/data/dataset.py:306-319`): reads the train CSR from the
    `tables` collection and scatters each row's column ids into a dense 0/1
    vector — touching only the batch's nnz instead of slicing scipy on host.
    Gradients do not flow into the interaction data (it is a constant table).
    """

    entity: str  # 'user' | 'item'
    n_rows: int
    n_cols: int
    max_row_len: int
    nnz: int
    normalize: bool = False

    @nn.compact
    def __call__(self, idxs):
        from sibrar_tpu.ops.sparse import csr_rows_to_dense

        csr = _csr_from_tables(self)
        vec = csr_rows_to_dense(csr, idxs, dtype=jnp.float32)
        if self.normalize:
            norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
            vec = vec / jnp.maximum(norm, 1e-8)
        return vec


def _csr_from_tables(module) -> "DeviceCSR":  # noqa: F821
    """Rebuild the entity's train-interaction `DeviceCSR` from the `tables`
    collection (real arrays spliced in by `models.base.populate_tables`).
    Declares the optional padded-cols table exactly when
    `ops.sparse.padded_cols_viable` holds — `DeviceData.to_device` applies
    the same gate, so the populate lookup always has the matching array."""
    from sibrar_tpu.ops.sparse import DeviceCSR, padded_cols_viable

    entity, n_rows, nnz = module.entity, module.n_rows, module.nnz
    indptr = module.variable(
        "tables", f"{entity}__inter_indptr",
        lambda: jnp.zeros((n_rows + 1,), jnp.int32)).value
    indices = module.variable(
        "tables", f"{entity}__inter_indices",
        lambda: jnp.zeros((max(nnz, 1),), jnp.int32)).value
    cols_pad = None
    if padded_cols_viable(n_rows, module.max_row_len, nnz):
        l_pad = -(-module.max_row_len // 128) * 128
        cols_pad = module.variable(
            "tables", f"{entity}__inter_cols_pad",
            lambda: jnp.zeros((n_rows, l_pad), jnp.int32)).value
    return DeviceCSR(indptr=indptr, indices=indices, n_rows=n_rows,
                     n_cols=module.n_cols, max_row_len=module.max_row_len,
                     cols_pad=cols_pad)


# Bag-vs-densify break-even: use the gather path when
# BAG_BREAK_EVEN_FACTOR · max_row_len ≤ n_cols. Module-level so probes can
# sweep it (tools/probe_train.py; 0 forces bag).
#
# Calibrated r3 on v5e from full fwd+bwd first-layer chains
# (tools/probe_bag_vs_dense.py): the bag chain is OCCURRENCE-bound at
# ~50 ns per (row, l) — XLA materializes the [rows, L, h] gather three
# times (gather out, a retiling reshape copy, the backward broadcast) and
# pays a row scatter-add backward — while the MXU one-hot densify chain is
# ~25 ps per (row, col) element, nearly h-independent (the GEMMs hide
# behind the dense-matrix passes). Measured: rows=3756/n_cols=50k/L=41/
# h=512 → bag 8.56 ms vs dense 4.43; rows=512/n_cols=100352/L=69/h=128 →
# 1.51 vs 1.38 (near the break-even). 50 ns / 25 ps ≈ 2048.
BAG_BREAK_EVEN_FACTOR = 2048

# Densify materializes a [rows, n_cols] f32 matrix; past this budget the
# bag path wins by default regardless of the break-even (HBM residency, not
# speed: v5e has 16 GB and the scores chain needs headroom).
_DENSIFY_MAX_BYTES = 2 << 30

# Fused sparse-input matmul (ops/pallas_spmm) instead of densify+matmul on
# the non-bag path: "auto" = TPU only, True = force (tests/probes use the
# interpret-capable kernels), False = off.
INTERACTION_SPMM = False

# Backward-pass dW kernel for the dense path (ops/pallas_dw): computes
# dW = dense^T @ g without XLA's full-matrix transposed copy of the
# densified rows. "auto" = pallas on TPU when viable, True = force,
# "interpret" = interpret-mode pallas (CPU tests), False = plain XLA.
DW_KERNEL = "auto"


@jax.custom_vjp
def _dense_first_matmul(vec, kernel):
    """``vec @ kernel`` whose backward treats ``vec`` as a CONSTANT (zero
    cotangent — the densified interaction rows never depend on params) and
    computes dW through the transpose-free pallas GEMM when available."""
    return vec @ kernel


def _dfm_fwd(vec, kernel):
    return vec @ kernel, (vec,)


def _dfm_bwd(res, g):
    (vec,) = res
    from sibrar_tpu.ops.pallas_dw import dw_matmul, dw_viable

    use = DW_KERNEL
    forced = use is True
    if use == "auto":
        # single-device, single-process TPU only: under a mesh, GSPMD can't
        # partition the pallas_call (DP row-sharded vec/g would gather) —
        # the XLA matmul partial-sums per shard instead. process_count
        # guards the one-device-per-process multi-host case.
        use = (jax.default_backend() == "tpu" and jax.device_count() == 1
               and jax.process_count() == 1)
    if use is True:
        use = dw_viable(vec.shape[0], vec.shape[1], g.shape[1],
                        vec.dtype.itemsize)
        if forced and not use:
            # DW_KERNEL=True is still viability-gated: an unviable shape
            # would compile-fail in Mosaic, so demote loudly rather than die
            import warnings
            warnings.warn(
                "DW_KERNEL=True demoted to the XLA matmul: no in-budget "
                f"block decomposition for shape {vec.shape} x {g.shape}",
                stacklevel=2)
    if use == "interpret":
        dw = dw_matmul(vec, g, interpret=True)
    elif use:
        dw = dw_matmul(vec, g)
    else:
        dw = vec.T.astype(jnp.float32) @ g
    return jnp.zeros_like(vec), dw


_dense_first_matmul.defvjp(_dfm_fwd, _dfm_bwd)


class InteractionTower(nn.Module):
    """MLP tower over an entity's train-interaction vector, with a sparse
    first layer.

    The reference (and our dense path) feeds a densified 0/1 row of the train
    matrix into an ``[n_cols, h]`` linear layer
    (`/root/reference/algorithms/sgd_alg.py:1175-1181` for DMF; same pattern in
    DropoutNet's preference net and SBNet's 'interactions' modality). Because
    the row is 0/1, ``row @ W + b == Σ_{j ∈ row} W[j] + b`` — an embedding-bag.
    The bag path gathers only ``L = max_row_len`` kernel rows per example
    instead of an ``n_cols``-wide matmul: at Onion scale (100k items, histories
    ~100) that is ~1000× less FLOPs and no ``[B, n_cols]`` densified tensor.

    Statically picks bag vs densify. Measured break-even on v5e (full
    fwd+bwd chains, tools/probe_bag_vs_dense.py): the bag chain costs
    ~50 ns per (row, l) occurrence (triple [rows, L, h] materialization +
    scatter-add backward) while the MXU one-hot densify chain costs ~25 ps
    per (row, col) element — bag only wins at extreme sparsity,
    ``max_row_len ≲ n_cols / 2048`` (e.g. million-item catalogs with
    ≤500-item histories), or when the dense matrix would not fit the
    `_DENSIFY_MAX_BYTES` HBM budget. Both paths share parameter structure
    (first kernel/bias + PolyLinear rest); the dense path's scores ride the
    MXU's bf16-pass f32 matmul (~5e-3 relative, the framework-wide norm).
    """

    entity: str
    n_rows: int
    n_cols: int
    max_row_len: int
    nnz: int
    layer_sizes: Sequence[int]  # hidden sizes + output (excludes n_cols input)
    activation_fn: str = "relu"
    output_fn: Optional[str] = "relu"
    normalize: bool = False  # divide the interaction row by its L2 norm
    torch_default_init: bool = False  # see torch_default_uniform

    @nn.compact
    def __call__(self, idxs, train: bool = False, scale=None):
        """`scale` multiplies the interaction row (pre-bias) — used for
        DropoutNet's preference dropout mask."""
        from sibrar_tpu.ops.sparse import csr_row_gather

        assert len(self.layer_sizes) >= 1
        h = self.layer_sizes[0]
        act = get_activation_fn(self.activation_fn)
        if self.torch_default_init:
            kinit = torch_default_uniform
            bnd = 1.0 / np.sqrt(self.n_cols)
            binit = (lambda key, shape, dtype=jnp.float32:
                     jax.random.uniform(key, shape, dtype, -bnd, bnd))
        else:
            kinit, binit = kaiming_uniform_relu, nn.initializers.zeros
        kernel = self.param("kernel", kinit, (self.n_cols, h))
        bias = self.param("bias", binit, (h,))

        csr = _csr_from_tables(self)

        import numpy as _np

        rows_total = int(_np.prod(idxs.shape))
        dense_bytes = rows_total * self.n_cols * 4
        use_bag = (BAG_BREAK_EVEN_FACTOR * max(self.max_row_len, 1)
                   <= self.n_cols)
        if not use_bag and dense_bytes > _DENSIFY_MAX_BYTES:
            # dense over the HBM budget: redirect to bag only when the bag
            # chain's own [rows, L, h] intermediates are actually smaller
            # (XLA materializes them ~3x — see the calibration note above);
            # otherwise the dense matrix IS the smaller footprint
            use_bag = rows_total * max(self.max_row_len, 1) * h * 4 < dense_bytes
        use_spmm = (not use_bag and INTERACTION_SPMM
                    and (INTERACTION_SPMM in (True, "interpret")
                         or jax.default_backend() == "tpu"))
        if use_bag:
            cols, mask = csr_row_gather(csr, idxs)  # [..., L]
            gathered = jnp.take(kernel, cols, axis=0)  # [..., L, h]
            pre = (gathered * mask[..., None]).sum(axis=-2)
            if self.normalize:
                nnz_row = mask.sum(axis=-1, keepdims=True)
                pre = pre / jnp.maximum(jnp.sqrt(nnz_row), 1e-8)
        elif use_spmm:
            # fused 0/1-row × kernel matmul: the dense [B', n_cols] matrix
            # never materializes (ops/pallas_spmm); rows flattened so the
            # segment gather's 1-D fast path applies
            from sibrar_tpu.ops.pallas_spmm import spmm_onehot

            flat = idxs.reshape(-1)
            interp = INTERACTION_SPMM == "interpret"
            cols, mask = csr_row_gather(csr, flat, interpret=interp)
            pre = spmm_onehot(cols, mask, kernel, interp)
            if self.normalize:  # ‖0/1 row‖₂ = sqrt(nnz)
                nnz_row = mask.sum(axis=-1, keepdims=True)
                pre = pre / jnp.maximum(jnp.sqrt(nnz_row), 1e-8)
            pre = pre.reshape(*idxs.shape, kernel.shape[1])
        else:
            from sibrar_tpu.ops.sparse import csr_rows_to_dense

            # flatten the row batch through the densify + matmul: a
            # [..., n_cols] dense tensor with a multi-dim batch retiles on
            # every reshape (XLA tiles the LAST TWO dims — measured 1.7
            # ms/step of pure copy at [939, 4, 50048] bf16, r3 Onion
            # profile); flat [R, n_cols] keeps einsum → view → GEMM
            # layout-stable and the [R, h] output reshape is trivial
            flat = idxs.reshape(-1)
            vec = csr_rows_to_dense(csr, flat, dtype=jnp.float32)
            if self.normalize:
                norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
                vec = vec / jnp.maximum(norm, 1e-8)
            # stop_gradient enforces structurally what _dense_first_matmul's
            # custom VJP assumes: vec (CSR-derived 0/1 rows) never depends
            # on params, so its zero cotangent is exact
            vec = lax.stop_gradient(vec)
            pre = _dense_first_matmul(vec, kernel).reshape(*idxs.shape, h)
        if scale is not None:
            pre = pre * scale
        x = pre + bias
        if len(self.layer_sizes) == 1:
            out_fn = get_activation_fn(self.output_fn)
            return out_fn(x) if out_fn is not None else x
        x = act(x)
        return PolyLinear(
            list(self.layer_sizes), activation_fn=self.activation_fn,
            output_fn=self.output_fn, name="rest",
            torch_default_init=self.torch_default_init)(x, train=train)


def interaction_tower_from(device_data, entity: str, layer_sizes,
                           activation_fn: str = "relu",
                           output_fn: Optional[str] = "relu",
                           normalize: bool = False,
                           torch_default_init: bool = False) -> InteractionTower:
    csr = (device_data.user_inter_csr if entity == "user"
           else device_data.item_inter_csr)
    return InteractionTower(
        entity=entity, n_rows=csr.n_rows, n_cols=csr.n_cols,
        max_row_len=csr.max_row_len, nnz=int(csr.indices.shape[0]),
        layer_sizes=tuple(layer_sizes), activation_fn=activation_fn,
        output_fn=output_fn, normalize=normalize,
        torch_default_init=torch_default_init)


def interaction_module_from(device_data, entity: str, normalize: bool = False
                            ) -> InteractionVectorModule:
    csr = (device_data.user_inter_csr if entity == "user"
           else device_data.item_inter_csr)
    return InteractionVectorModule(
        entity=entity, n_rows=csr.n_rows, n_cols=csr.n_cols,
        max_row_len=csr.max_row_len, nnz=int(csr.indices.shape[0]),
        normalize=normalize)


def feature_module_from(feature, name: str, **kwargs) -> FeatureEmbeddingModule:
    """Build a FeatureEmbeddingModule spec from a host-side `Feature`."""
    from sibrar_tpu.config.schema import FeatureType

    if feature.type == FeatureType.CATEGORICAL and not feature.one_hot:
        kind, n_cat = "categorical", feature.n_unique_categories
    elif feature.type == FeatureType.TAG and not feature.multi_hot:
        kind, n_cat = "tag", feature.n_unique_categories
    else:
        kind, n_cat = "numeric", 0
    return FeatureEmbeddingModule(
        feature_name=name,
        feature_kind=kind,
        table_shape=tuple(feature.table.shape),
        table_dtype=str(feature.table.dtype),
        n_categories=n_cat,
        **kwargs,
    )
