"""Entity feature containers with device-resident dense tables.

Capability-parity with the reference `Feature` class
(`/root/reference/data/Feature.py:27-295`): CATEGORICAL / TAG / DISCRETE /
CONTINUOUS / SEQUENCE / VECTOR / MATRIX features, label↔int maps built over
union-with-reference values (sorted for reproducibility), padded tag arrays with
a dedicated padding index, and optional one-hot / multi-hot densification.

TPU-first difference: instead of a per-batch host-side fancy-index + H2D copy
(the reference's `Feature.__getitem__`, a hot-loop bottleneck per SURVEY.md §3.2),
every feature is materialized **once** as a dense table aligned to entity index
0..n_entities-1 and moved to device; batch access is a pure `jnp.take` that fuses
into the jitted train step.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import numpy as np

from sibrar_tpu.config.schema import FeatureDefinition, FeatureType

# host-side budget for dense_table() TAG/CATEGORICAL densification, mirroring
# the 2 GB device densify gate in models/layers.py — a 100k x 50k multi-hot
# would silently try to allocate 20 GB otherwise
DENSE_TABLE_MAX_BYTES = 2 * 2**30


def create_padded_array(lists: Sequence[Sequence[int]], padding_idx: int,
                        width: Optional[int] = None) -> np.ndarray:
    """Pad a ragged list-of-lists into a rectangular int array."""
    max_length = max((len(li) for li in lists), default=0)
    if width is None:
        width = max(max_length, 1)
    elif max_length > width:
        raise ValueError(
            f"Specified width is smaller than the longest sublist ({width} < {max_length})"
        )
    out = np.full((len(lists), width), padding_idx, dtype=np.int32)
    for i, li in enumerate(lists):
        out[i, : len(li)] = list(li)
    return out


@dataclass
class Feature:
    """One feature over all entities of one type (users or items).

    `table` is dense, row-aligned to entity index. Entities for which the raw
    data had no row are filled with zeros (numeric/vector) or padding (tag/seq);
    `present` records which rows carried real data.
    """

    definition: FeatureDefinition
    table: np.ndarray  # [n_entities, ...]
    present: np.ndarray  # [n_entities] bool
    n_entities: int
    # categorical/tag metadata
    unique_values: Optional[list] = None
    value_map: Optional[dict] = None
    padding_idx: Optional[int] = None
    one_hot: bool = False
    multi_hot: bool = False
    _value_indices_groups: Optional[dict] = field(default=None, repr=False)

    # ------------------------------------------------------------------ properties
    @property
    def name(self) -> str:
        return self.definition.name

    @property
    def type(self) -> FeatureType:
        return self.definition.type

    @property
    def n_unique_categories(self) -> int:
        if self.type not in (FeatureType.CATEGORICAL, FeatureType.TAG):
            raise TypeError(f"n_unique_categories unsupported for {self.type}")
        return len(self.unique_values)

    @property
    def dim(self):
        """Matches the reference's dim semantics: 0 for categorical codes,
        n_tags for tag features, feature width otherwise."""
        if self.type == FeatureType.CATEGORICAL and not self.one_hot:
            return 0
        if self.type == FeatureType.TAG and not self.multi_hot:
            return len(self.unique_values)
        if self.table.ndim == 1:
            return 1
        if self.table.ndim == 2:
            return self.table.shape[1]
        return self.table.shape[1:]

    @property
    def input_dim(self) -> int:
        """Width of the dense per-entity row actually fed to a network."""
        if self.table.ndim == 1:
            return 1
        return int(np.prod(self.table.shape[1:]))

    @property
    def value_indices_groups(self) -> dict:
        if self.type not in (FeatureType.CATEGORICAL, FeatureType.TAG):
            raise TypeError(f"value_indices_groups unsupported for {self.type}")
        return self._value_indices_groups

    def dense_table(self) -> np.ndarray:
        """Float [n_entities, d] matrix suitable for similarity math
        (ItemFeatureKNN; reference algorithms/knn_algs.py:129-140 consumes
        the feature as a float matrix).

        TAG features stored as padded integer tag codes are densified to
        multi-hot 0/1, CATEGORICAL codes to one-hot — cosine over raw code
        values would be meaningless. Already-dense tables pass through as
        float32; 1-D numerics become a column; MATRIX flattens per entity.
        """
        t = self.type
        if t in (FeatureType.TAG, FeatureType.CATEGORICAL):
            n_vals = len(self.unique_values)
            dense_bytes = 4 * self.n_entities * n_vals
            if dense_bytes > DENSE_TABLE_MAX_BYTES:
                raise ValueError(
                    f"dense_table of {self.name!r} would materialize "
                    f"{self.n_entities}x{n_vals} float32 "
                    f"({dense_bytes / 2**30:.1f} GiB > "
                    f"{DENSE_TABLE_MAX_BYTES / 2**30:.1f} GiB budget); "
                    "use value_indices_groups / a sparse representation "
                    "for this feature instead")
        if t == FeatureType.TAG and not self.multi_hot:
            n_tags = len(self.unique_values)
            out = np.zeros((self.n_entities, n_tags), dtype=np.float32)
            codes = self.table  # [n, width] with padding_idx fill
            valid = codes != self.padding_idx
            rows = np.repeat(np.arange(self.n_entities), valid.sum(axis=1))
            out[rows, codes[valid]] = 1.0
            return out
        if t == FeatureType.CATEGORICAL and not self.one_hot:
            n_cat = len(self.unique_values)
            out = np.zeros((self.n_entities, n_cat), dtype=np.float32)
            out[self.present, self.table[self.present]] = 1.0
            return out
        table = np.asarray(self.table, dtype=np.float32)
        if table.ndim == 1:
            return table[:, None]
        if table.ndim > 2:
            return table.reshape(self.n_entities, -1)
        return table

    def __getitem__(self, idx):
        return self.table[idx]

    def __len__(self) -> int:
        return self.n_entities

    # ---------------------------------------------------------------- constructors
    @staticmethod
    def build(
        definition: FeatureDefinition,
        raw_values: Any,
        n_entities: int,
        indices: Optional[np.ndarray] = None,
        reference_values: Any = None,
        tag_split_sep: str = "|",
        one_hot: bool = False,
        multi_hot: bool = False,
    ) -> "Feature":
        n_raw = raw_values.shape[0] if hasattr(raw_values, "shape") else len(raw_values)
        if indices is None:
            indices = np.arange(n_raw)
        indices = np.asarray(indices)
        if n_raw != len(indices):
            raise ValueError(
                f"Provided indices must match size of supplied values ({n_raw} != {len(indices)})"
            )
        present = np.zeros(n_entities, dtype=bool)
        present[indices] = True

        ft = definition.type
        if ft == FeatureType.CATEGORICAL:
            return Feature._build_categorical(
                definition, raw_values, indices, n_entities, present,
                reference_values, one_hot,
            )
        if ft == FeatureType.TAG:
            return Feature._build_tag(
                definition, raw_values, indices, n_entities, present,
                reference_values, tag_split_sep, multi_hot,
            )
        if ft == FeatureType.SEQUENCE:
            from ast import literal_eval

            rows = np.stack(
                [np.asarray(literal_eval(v)) if isinstance(v, str) else np.asarray(v)
                 for v in raw_values],
                axis=0,
            )
            table = np.zeros((n_entities, rows.shape[1]), dtype=rows.dtype)
            table[indices] = rows
            return Feature(definition, table, present, n_entities)
        if ft in (FeatureType.DISCRETE, FeatureType.CONTINUOUS):
            vals = np.asarray(raw_values, dtype=np.float32)
            table = np.zeros(n_entities, dtype=np.float32)
            table[indices] = vals
            return Feature(definition, table, present, n_entities)
        if ft in (FeatureType.VECTOR, FeatureType.MATRIX):
            if isinstance(raw_values, list):
                vals = np.stack([np.asarray(v) for v in raw_values], axis=0)
            elif hasattr(raw_values, "toarray"):  # scipy sparse
                vals = raw_values.toarray()
            else:
                vals = np.asarray(raw_values)
            vals = vals.astype(np.float32)
            table = np.zeros((n_entities,) + vals.shape[1:], dtype=np.float32)
            table[indices] = vals
            return Feature(definition, table, present, n_entities)
        raise ValueError(f"FeatureType {ft!r} is not supported")

    @staticmethod
    def _build_categorical(definition, raw_values, indices, n_entities, present,
                           reference_values, one_hot) -> "Feature":
        unique = set(raw_values)
        if reference_values is not None:
            unique |= set(reference_values)
        # sorted for reproducibility (reference data/Feature.py:210-211)
        unique_values = sorted(unique)
        value_map = {lbl: i for i, lbl in enumerate(unique_values)}
        codes = np.array([value_map[v] for v in raw_values], dtype=np.int32)
        if one_hot:
            table = np.zeros((n_entities, len(unique_values)), dtype=np.float32)
            table[indices, codes] = 1.0
        else:
            table = np.zeros(n_entities, dtype=np.int32)
            table[indices] = codes
        groups = {
            lbl: indices[np.flatnonzero(codes == value_map[lbl])]
            for lbl in unique_values
        }
        return Feature(
            definition, table, present, n_entities,
            unique_values=unique_values, value_map=value_map, one_hot=one_hot,
            _value_indices_groups=groups,
        )

    @staticmethod
    def _build_tag(definition, raw_values, indices, n_entities, present,
                   reference_values, sep, multi_hot) -> "Feature":
        def to_tags(v):
            if isinstance(v, str):
                return set(v.split(sep))
            return set(v)

        raw_tags = [to_tags(v) for v in raw_values]
        unique = set().union(*raw_tags) if raw_tags else set()
        if reference_values is not None:
            ref_tags = [to_tags(v) for v in reference_values]
            unique |= set().union(*ref_tags) if ref_tags else set()
        unique_values = sorted(unique)
        value_map = {lbl: i for i, lbl in enumerate(unique_values)}
        padding_idx = len(unique_values)
        value_lists = [sorted(value_map[t] for t in tags) for tags in raw_tags]
        if multi_hot:
            table = np.zeros((n_entities, len(unique_values)), dtype=np.float32)
            for ei, tags in zip(indices, value_lists):
                table[ei, tags] = 1.0
            pad = None
        else:
            width = max((len(li) for li in value_lists), default=1)
            table = np.full((n_entities, max(width, 1)), padding_idx, dtype=np.int32)
            rows = create_padded_array(value_lists, padding_idx)
            table[indices] = rows
            pad = padding_idx
        groups = {
            lbl: np.array(
                [indices[i] for i, tgs in enumerate(value_lists) if value_map[lbl] in tgs]
            )
            for lbl in unique_values
        }
        return Feature(
            definition, table, present, n_entities,
            unique_values=unique_values, value_map=value_map, padding_idx=pad,
            multi_hot=multi_hot, _value_indices_groups=groups,
        )
