"""On-device negative sampling and modality sampling.

Replaces the reference's host-side numpy samplers
(`/root/reference/data/sampling.py`) with `jax.random` ops that run inside the
jitted train step (SURVEY.md §3.2 hot-loop bottleneck #1). Semantics parity:

- `uniform`: negatives are drawn uniformly from the catalog, excluding the
  user's positives, distinct within a row (reference `negative_sample_uniform`,
  which uses `np.random.choice(replace=False)` over non-positives). Here this is
  sampling + a fixed number of resample-rounds rejecting positives/duplicates;
  collision probability after R rounds decays geometrically, so the training
  distribution matches statistically (exact seeds can't match across frameworks).
- `uniform_recbole`: with replacement, rejecting positives only
  (reference `negative_sample_uniform_recbole`).
- `popular`: popularity^alpha-weighted sampling with positives excluded
  (reference `negative_sample_popular`).

All samplers work in **catalog space** (positions within `items_in_split`), as
the reference samples from `items_in_split` (`/root/reference/data/dataset.py:361-375`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sibrar_tpu.ops.sparse import (
    DeviceCSR,
    contains_pregathered,
    contains_rows_pregather,
    csr_contains_rows,
)


def _bad_mask(csr: DeviceCSR, users: jax.Array, cand: jax.Array,
              distinct: bool, pre=None) -> jax.Array:
    """True where a candidate collides with a positive (or an earlier duplicate).

    ``pre`` is the hoisted `contains_rows_pregather` result: the row fetch is
    loop-invariant across rejection rounds, but XLA re-runs it inside every
    `fori_loop` round (8 re-gathers ≈ 1.6 ms/step at Onion scale, 2M-nnz
    CSR — r3 profile), so the samplers gather once outside the loop.
    """
    # compare path vs bisection: with the Pallas segment gather the row
    # fetch is nearly free and the compare beats the bisection's element
    # gathers — 11.0 vs 14.1 ms/step on the v5e SBNet bench
    # (pre-segment-gather the opposite held; both measured)
    if pre is not None:
        bad = contains_pregathered(*pre, cand)  # [B, n_neg]
    else:
        bad = csr_contains_rows(csr, users, cand)  # [B, n_neg]
    if distinct:
        # mark duplicates of any *earlier* sample in the row
        eq = cand[:, :, None] == cand[:, None, :]  # [B, n, n]
        earlier = jnp.tril(jnp.ones(eq.shape[-2:], dtype=bool), k=-1)
        bad = bad | (eq & earlier).any(-1)
    return bad


@partial(jax.jit, static_argnames=("n_catalog", "n_neg", "distinct", "n_rounds"))
def sample_negatives_uniform(
    rng: jax.Array,
    users: jax.Array,  # [B] global user ids
    pos_csr: DeviceCSR,  # user -> positive catalog positions
    *,
    n_catalog: int,
    n_neg: int,
    distinct: bool = True,
    n_rounds: int = 8,
) -> jax.Array:
    """Uniform negatives in catalog space, shape [B, n_neg] int32."""
    b = users.shape[0]
    k0, kloop = jax.random.split(rng)
    cand = jax.random.randint(k0, (b, n_neg), 0, n_catalog, dtype=jnp.int32)
    pre = contains_rows_pregather(pos_csr, users)  # hoisted row fetch

    def body(i, cand):
        key = jax.random.fold_in(kloop, i)
        bad = _bad_mask(pos_csr, users, cand, distinct, pre=pre)
        fresh = jax.random.randint(key, (b, n_neg), 0, n_catalog, dtype=jnp.int32)
        return jnp.where(bad, fresh, cand)

    return jax.lax.fori_loop(0, n_rounds, body, cand)


@partial(jax.jit, static_argnames=("n_neg", "n_rounds", "exclude_positives"))
def sample_negatives_popular(
    rng: jax.Array,
    users: jax.Array,
    pos_csr: DeviceCSR,
    popularity: jax.Array,  # [n_catalog] float, sums to 1
    *,
    n_neg: int,
    squashing_factor: float = 1.0,
    n_rounds: int = 4,
    exclude_positives: bool = True,
) -> jax.Array:
    """Popularity^alpha-weighted negatives [B, n_neg] in catalog space."""
    b = users.shape[0]
    logits = squashing_factor * jnp.log(jnp.maximum(popularity, 1e-12))
    k0, kloop = jax.random.split(rng)
    cand = jax.random.categorical(k0, logits, shape=(b, n_neg)).astype(jnp.int32)
    if not exclude_positives:
        return cand
    pre = contains_rows_pregather(pos_csr, users)  # hoisted row fetch

    def body(i, cand):
        key = jax.random.fold_in(kloop, i)
        bad = _bad_mask(pos_csr, users, cand, distinct=False, pre=pre)
        fresh = jax.random.categorical(key, logits, shape=(b, n_neg)).astype(jnp.int32)
        return jnp.where(bad, fresh, cand)

    return jax.lax.fori_loop(0, n_rounds, body, cand)


def sample_negatives(
    rng: jax.Array,
    users: jax.Array,
    pos_csr: DeviceCSR,
    popularity: jax.Array,
    *,
    strategy: str,
    n_catalog: int,
    n_neg: int,
    squashing_factor: float = 1.0,
) -> jax.Array:
    """Dispatch over the three reference sampling strategies."""
    if strategy == "uniform":
        return sample_negatives_uniform(
            rng, users, pos_csr, n_catalog=n_catalog, n_neg=n_neg, distinct=True)
    if strategy == "uniform_recbole":
        return sample_negatives_uniform(
            rng, users, pos_csr, n_catalog=n_catalog, n_neg=n_neg, distinct=False)
    if strategy == "popular":
        return sample_negatives_popular(
            rng, users, pos_csr, popularity, n_neg=n_neg,
            squashing_factor=squashing_factor)
    raise ValueError(f"unknown negative sampling strategy {strategy!r}")


def sample_user_positives(
    rng: jax.Array,
    users: jax.Array,  # [B] user ids
    pos_csr: DeviceCSR,  # user -> positive catalog positions
    n_pos: int,
) -> jax.Array:
    """Per-user sampling of `n_pos` positive items — the on-device equivalent
    of the reference's user-iterating `TrainUserRecDataset.__getitem__`
    (`/root/reference/data/dataset.py:486-507`).

    Semantics differ from the reference in one documented way: offsets are
    always drawn independently (i.e. WITH replacement), even when the user's
    history has >= `n_pos` items — distinct sampling would need a per-row
    permutation over ragged lengths, which doesn't vectorize on TPU; the
    marginal distribution per drawn item is identical. Users with empty
    histories get the sentinel -1 in every slot (instead of silently reading a
    neighbouring row). Returns catalog positions [B, n_pos] int32."""
    starts = pos_csr.indptr[users]
    lens = pos_csr.indptr[users + 1] - starts
    # uniform offsets within each row; rows shorter than n_pos resample
    offs = jax.random.randint(rng, (users.shape[0], n_pos), 0, 1 << 30)
    offs = offs % jnp.maximum(lens, 1)[:, None]
    pos = jnp.minimum(starts[:, None] + offs, max(pos_csr.nnz - 1, 0))
    out = pos_csr.indices[pos]
    return jnp.where((lens > 0)[:, None], out, jnp.int32(-1))


def sample_k_modalities(
    rng: jax.Array,
    shape: tuple[int, ...],
    n_modalities: int,
    k: int,
    central: int | None = None,
) -> jax.Array:
    """Per-element sampling of k distinct modality ids out of `n_modalities`.

    On-device equivalent of the reference's `row_wise_sample`
    (`/root/reference/utilities/utils.py:60-90`) used by SBNet's modality
    sampler (`/root/reference/algorithms/sgd_alg.py:1904-1932`):

    - k=1: one uniform modality per element → shape `shape + (1,)`.
    - k=2, central=None: two *distinct* uniform modalities (pairwise_single).
    - k=2, central=c: the central modality plus one uniform other (central_modality);
      order is randomized like the reference's shuffled sample.
    """
    if k not in (1, 2):
        raise ValueError("only k in (1, 2) occur in SBNet configurations")
    if k == 1:
        return jax.random.randint(rng, shape + (1,), 0, n_modalities, dtype=jnp.int32)
    k1, k2, k3 = jax.random.split(rng, 3)
    if central is None:
        first = jax.random.randint(k1, shape, 0, n_modalities, dtype=jnp.int32)
        # second drawn from the remaining n-1 via shift-past trick
        second = jax.random.randint(k2, shape, 0, n_modalities - 1, dtype=jnp.int32)
        second = jnp.where(second >= first, second + 1, second)
    else:
        first = jnp.full(shape, central, dtype=jnp.int32)
        second = jax.random.randint(k2, shape, 0, n_modalities - 1, dtype=jnp.int32)
        second = jnp.where(second >= central, second + 1, second)
    pair = jnp.stack([first, second], axis=-1)
    # randomize order (the reference shuffles its sampled set)
    flip = jax.random.bernoulli(k3, shape=shape)
    return jnp.where(flip[..., None], pair[..., ::-1], pair)


def balanced_routing(
    n_modalities: int,
    k: int,
    central: int | None = None,
) -> list[list[int]]:
    """Static residue→modality tables for balanced modality routing.

    TPU-first replacement for per-example iid modality sampling
    (`sample_k_modalities`): instead of sampling modalities then computing
    EVERY modality's projection for the whole batch and gathering k
    (compute-all, k/n of the FLOPs useful), assign modalities to batch rows
    by their position modulo a period ``P`` so that each modality receives a
    *static, identical* number of rows — every projection becomes a dense
    [rows_per_modality, ...] block with no gather/scatter, and total
    projection work drops from n× to k× the batch.

    Returns ``slots``: ``slots[rho][j]`` is the modality id of sampling slot
    ``j`` for rows at position ≡ rho (mod P), with P = len(slots):

    - k=1: P = n, row rho trains modality rho. Each modality gets exactly
      1/n of the rows.
    - k=2, central=None (pairwise_single): P = n(n-1); first slot cycles
      modalities (rho % n), second cycles the n-1 others per first-class
      ((rho // n) % (n-1) shift). Each modality appears exactly n-1 times
      as slot 0 and n-1 times as slot 1 → exactly 2/n of the rows, and the
      two slots of a row are always distinct.
    - k=2, central=c (central_modality): P = n-1; slot 0 is always c,
      slot 1 cycles the others (reference semantics: central + one other).

    Distributional contract vs the reference's iid `row_wise_sample`
    (`/root/reference/utilities/utils.py:60-90`): combined with a uniform
    random cyclic shift of the batch per step (see
    `SingleBranchNetEntity._forward_train`) and the epoch-level permutation
    of rows, each row's marginal modality distribution is uniform exactly as
    in the reference; per-batch modality *counts* are exactly balanced
    instead of multinomial (a variance reduction — every modality tower
    trains on every step). This matches the reference's own execution shape:
    its semi-batched loop also runs each modality only on the subset of rows
    that sampled it (`sgd_alg.py:1934-1978`).
    """
    if k == 1:
        return [[m] for m in range(n_modalities)]
    if k != 2:
        raise ValueError("only k in (1, 2) occur in SBNet configurations")
    if central is not None:
        others = [m for m in range(n_modalities) if m != central]
        return [[central, m] for m in others]
    slots = []
    for rho in range(n_modalities * (n_modalities - 1)):
        m1 = rho % n_modalities
        off = (rho // n_modalities) % (n_modalities - 1)
        m2 = (m1 + 1 + off) % n_modalities
        slots.append([m1, m2])
    return slots
