"""Typed experiment configuration dataclasses.

Mirrors the capability surface of the reference config schema
(`/root/reference/data/config_classes.py`) with a lightweight, dependency-free
``from_dict`` that recursively instantiates nested dataclasses, coerces enums,
drops unknown keys (the reference's `SoftBaseConfig` behaviour,
`/root/reference/data/base_config_classes.py:66-81`), and validates bounds
(the reference uses the `param` library for this,
`/root/reference/data/config_classes.py:154-183`).
"""
from __future__ import annotations

import dataclasses
import enum
import typing
from dataclasses import dataclass, field
from typing import Any, Optional


# --------------------------------------------------------------------------- enums
class FeatureType(str, enum.Enum):
    CATEGORICAL = "categorical"
    TAG = "tag"
    DISCRETE = "discrete"
    CONTINUOUS = "continuous"
    SEQUENCE = "sequence"
    VECTOR = "vector"
    MATRIX = "matrix"


class DatasetSplitType(str, enum.Enum):
    RANDOM = "random"
    TEMPORAL = "temporal"
    COLD_START_USER = "cold_start_user"
    COLD_START_ITEM = "cold_start_item"
    COLD_START_BOTH = "cold_start_both"

    @property
    def is_cold_start(self) -> bool:
        return self in (
            DatasetSplitType.COLD_START_USER,
            DatasetSplitType.COLD_START_ITEM,
            DatasetSplitType.COLD_START_BOTH,
        )

    @property
    def dir_name(self) -> str:
        # artifact sub-directory naming, compatible with the reference layout
        # (/root/reference/data_paths.py:30-45)
        return {
            DatasetSplitType.RANDOM: "random_split",
            DatasetSplitType.TEMPORAL: "temporal_split",
            DatasetSplitType.COLD_START_USER: "cold_start_user",
            DatasetSplitType.COLD_START_ITEM: "cold_start_item",
            DatasetSplitType.COLD_START_BOTH: "cold_start_both",
        }[self]


class EmbeddingRegularizationType(str, enum.Enum):
    NO_REGULARIZATION = "no_regularization"
    PAIRWISE_SINGLE = "pairwise_single"
    CENTRAL_MODALITY = "central_modality"


# ------------------------------------------------------------------- from_dict core
_T = typing.TypeVar("_T")


def _coerce(value: Any, tp: Any) -> Any:
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if value is None:
            return None
        last_err: Exception | None = None
        for a in args:
            try:
                return _coerce(value, a)
            except (TypeError, ValueError, KeyError) as e:  # try next union member
                last_err = e
        raise last_err if last_err else TypeError(f"cannot coerce {value!r} to {tp}")
    if origin in (list, tuple):
        (elem,) = typing.get_args(tp)[:1] or (Any,)
        seq = [_coerce(v, elem) for v in value]
        return tuple(seq) if origin is tuple else seq
    if origin is dict:
        return dict(value)
    if isinstance(tp, type) and issubclass(tp, enum.Enum):
        if isinstance(value, tp):
            return value
        return tp(value)
    if dataclasses.is_dataclass(tp):
        return from_dict(tp, value)
    if tp in (int, float, str, bool) and value is not None:
        return tp(value)
    return value


def from_dict(cls: type[_T], data: dict | None, **overrides: Any) -> _T:
    """Instantiate dataclass `cls` from a (possibly nested) dict.

    Unknown keys are ignored; `overrides` always win (mirrors
    `from_dict_ext(dict_has_precedence=False)` in the reference,
    `/root/reference/data/base_config_classes.py:45-63`).
    """
    data = dict(data or {})
    data.update(overrides)
    fields = {f.name: f for f in dataclasses.fields(cls)}
    hints = typing.get_type_hints(cls)
    kwargs = {}
    for name, f in fields.items():
        if name in data:
            kwargs[name] = _coerce(data[name], hints.get(name, Any))
    obj = cls(**kwargs)
    if hasattr(obj, "validate"):
        obj.validate()
    return obj


def as_dict(obj: Any) -> Any:
    """Dataclass → plain dict (enums become their string values)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: as_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, enum.Enum):
        return obj.value
    if isinstance(obj, (list, tuple)):
        return [as_dict(v) for v in obj]
    if isinstance(obj, dict):
        return {k: as_dict(v) for k, v in obj.items()}
    return obj


# ---------------------------------------------------------------------- sub-configs
@dataclass
class RunSettings:
    seed: int = 64
    device: str = "tpu"  # 'tpu' | 'cpu' (reference: 'cpu'|'cuda')
    in_tune: bool = False
    use_wandb: bool = False
    # debug mode: trap NaNs at the op that produced them (the functional
    # equivalent of sanitizers the reference lacks, SURVEY.md §5.2)
    debug_nans: bool = False

    def validate(self) -> None:
        if self.device not in ("tpu", "cpu", "gpu"):
            raise ValueError(f"unsupported device {self.device!r}")


@dataclass
class DataLoaderConfig:
    batch_size: int = 64
    eval_batch_size: int = 256
    # kept for config compatibility with the reference; host→device feeding is
    # asynchronous by construction in JAX so worker processes are not needed.
    num_workers: int = 0
    shuffle: bool = True
    prefetch_factor: int = 2

    def validate(self) -> None:
        if self.batch_size <= 0 or self.eval_batch_size <= 0:
            raise ValueError("batch sizes must be positive")


@dataclass
class LearningConfig:
    n_epochs: int = 50
    lr: float = 1e-3
    wd: float = 0.0
    optimizer: str = "adam"  # adam | adagrad | adamw (reference train/trainer.py:62-66)
    rec_loss: str = "bce"  # bce | bpr | sampled_softmax
    loss_aggregator: str = "mean"  # mean | sum
    max_patience: int = 10
    optimizing_metric: str = "ndcg@10"
    max_batches_per_epoch: Optional[int] = None
    # store the adam first moment in this dtype (optax mu_dtype). bfloat16
    # cuts optimizer HBM traffic on big embedding/interaction tables (adam
    # updates on the three largest bench tables are bandwidth-floor-bound:
    # 0.60 ms of the 2.9 ms SBNet step) at a documented precision cost —
    # OFF by default to keep the reference's f32 torch-Adam semantics.
    moment_dtype: Optional[str] = None  # None/float32 | bfloat16
    # row-wise sparse optimizer updates for large id-embedding tables
    # (torch.optim.SparseAdam semantics): each step touches ONLY the rows the
    # batch gathered, so step cost scales with the batch instead of paying
    # full-table HBM passes for dense grads + adam moments. Opt-in — it is a
    # different (standard) optimizer from dense adam: untouched rows keep
    # their momentum frozen instead of coasting. Applies to models that
    # declare `table_index_map` (MF/bias/ProtoMF/CLCRec id tables) and only
    # to tables with >= sparse_table_min_rows rows; requires optimizer=adam.
    sparse_tables: bool = False
    sparse_table_min_rows: int = 16384
    # max scanned train steps per jitted program call. Long epochs run as a
    # sequence of bounded scan programs — remote-execution tunnels and
    # preemptible runtimes handle many short executions far better than one
    # multi-thousand-step program (an unchunked 2383-step epoch crashed the
    # remote TPU worker; chunked runs are clean). None disables chunking.
    epoch_scan_chunk: Optional[int] = 512

    def validate(self) -> None:
        if self.epoch_scan_chunk is not None and self.epoch_scan_chunk < 1:
            raise ValueError("epoch_scan_chunk must be >= 1 or null")
        if self.optimizer not in ("adam", "adagrad", "adamw"):
            raise ValueError(f"unsupported optimizer {self.optimizer!r}")
        if self.sparse_tables and self.optimizer != "adam":
            raise ValueError(
                "sparse_tables requires optimizer='adam' (SparseAdam "
                f"semantics); got {self.optimizer!r}")
        if self.sparse_table_min_rows < 1:
            raise ValueError("sparse_table_min_rows must be >= 1")
        if self.moment_dtype not in (None, "float32", "bfloat16"):
            raise ValueError(
                f"unsupported moment_dtype {self.moment_dtype!r}")
        if self.rec_loss not in ("bce", "bpr", "sampled_softmax"):
            raise ValueError(f"unsupported rec_loss {self.rec_loss!r}")
        if self.loss_aggregator not in ("mean", "sum"):
            raise ValueError(f"unsupported loss aggregator {self.loss_aggregator!r}")
        if not (0 < self.lr):
            raise ValueError("lr must be > 0")
        if self.wd < 0:
            raise ValueError("wd must be >= 0")


@dataclass
class EvalConfig:
    # default metric surface of the reference (data/config_classes.py:187-189)
    top_k: list[int] = field(default_factory=lambda: [1, 3, 5, 10, 20, 50, 100])
    metrics: list[str] = field(
        default_factory=lambda: [
            "ndcg", "recall", "precision", "f_score", "hitrate", "ap", "coverage",
        ]
    )
    # categorical user-feature names for per-group metric breakdowns
    group_metrics: list[str] = field(default_factory=list)
    compute_std: bool = True
    # exact top-k strategy: auto | full | scatter | noscatter (ops/topk.py)
    topk_method: str = "auto"
    # opt-in low-precision scoring for dot-product models: "bfloat16" casts
    # the score-GEMM inputs (user representations + the item table) once per
    # evaluation, so the MXU runs one bf16 pass instead of XLA's three-pass
    # f32 spelling, with f32 accumulation. Selection stays EXACT for the
    # scores it is given; the scores themselves become bf16-input
    # approximations (~3e-3 relative) — the same trade `serve.Recommender`'s
    # dtype mode makes. Ignored (with a warning) for non-dot models.
    # Default None = full f32, bit-identical to the reference semantics.
    score_dtype: Optional[str] = None  # None/float32 | bfloat16

    def validate(self) -> None:
        if any(k <= 0 for k in self.top_k):
            raise ValueError("top_k cut-offs must be positive")
        if self.topk_method not in ("auto", "full", "scatter", "noscatter",
                                    "peel", "pallas"):
            raise ValueError(f"unsupported topk_method {self.topk_method!r}")
        if self.score_dtype not in (None, "float32", "bfloat16"):
            raise ValueError(
                f"unsupported score_dtype {self.score_dtype!r} "
                "(use 'float32' or 'bfloat16')")


@dataclass
class FeatureDefinition:
    name: str
    type: FeatureType = FeatureType.VECTOR


@dataclass
class DatasetConfig:
    dataset_path: str = ""
    is_cold_start_dataset: bool = False
    n_negative_samples: int = 4
    negative_sampling_strategy: str = "uniform"  # uniform | uniform_recbole | popular
    popularity_squashing_factor: float = 1.0
    user_features: list[FeatureDefinition] = field(default_factory=list)
    item_features: list[FeatureDefinition] = field(default_factory=list)

    def validate(self) -> None:
        if self.negative_sampling_strategy not in ("uniform", "uniform_recbole", "popular"):
            raise ValueError(
                f"unsupported sampling strategy {self.negative_sampling_strategy!r}"
            )


@dataclass
class ParallelConfig:
    """TPU-native parallel mapping (SURVEY.md §2.9): one (data, item) mesh.

    The reference is single-device by construction
    (`/root/reference/data/config_classes.py:159`); here multi-chip execution
    is a first-class config block. ``enabled=None`` (the default) means auto:
    use the mesh whenever more than one TPU device is visible — so a stock
    config on a v5e-8 trains data-parallel and evaluates catalog-sharded
    without any extra flags — and stay single-device on CPU hosts (where the
    virtual multi-device platform exists for tests, which opt in explicitly).
    """

    enabled: Optional[bool] = None  # None → auto (multi-device TPU only)
    n_devices: Optional[int] = None  # None → all visible devices
    item_parallelism: Optional[int] = None  # None → auto (pow2 ≤ sqrt(n))
    # round batch sizes up to the mesh's data-axis multiple instead of failing
    adjust_batch_sizes: bool = True
    # tensor-parallel interaction-tower first layers over the item axis (the
    # [n_items, h]/[n_users, h] kernels — the zoo's only large weights)
    shard_towers: bool = True
    tower_min_rows: int = 8192  # shard only kernels at least this tall

    def validate(self) -> None:
        if self.n_devices is not None and self.n_devices <= 0:
            raise ValueError("n_devices must be positive")
        if self.item_parallelism is not None and self.item_parallelism <= 0:
            raise ValueError("item_parallelism must be positive")
        if self.tower_min_rows < 0:
            raise ValueError("tower_min_rows must be non-negative")


@dataclass
class WandbConfig:
    use_wandb: bool = False
    project: str = "sibrar_tpu"
    entity: Optional[str] = None
    sweep_id: Optional[str] = None
    wandb_path: Optional[str] = None
    tags: list[str] = field(default_factory=list)


@dataclass
class ExperimentConfig:
    run_id: str = ""
    algorithm: str = "mf"
    dataset_name: str = "synthetic"
    split_type: DatasetSplitType = DatasetSplitType.RANDOM
    results_path: str = ""
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    model: dict = field(default_factory=dict)
    learn: LearningConfig = field(default_factory=LearningConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    loader: DataLoaderConfig = field(default_factory=DataLoaderConfig)
    run_settings: RunSettings = field(default_factory=RunSettings)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    wandb: WandbConfig = field(default_factory=WandbConfig)
    train_eval: bool = False
    profile_training: bool = False
