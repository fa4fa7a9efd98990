"""Import shims that let the REFERENCE code at /root/reference execute in this
image for parity testing.

The reference depends on `mashumaro` (dataclass (de)serialization), `param`
(bounded config fields), and `natsort` — none of which are installed here
(zero-egress image). The shims below provide just the API surface the
reference actually touches, so `algorithms/sgd_alg.py`, `data/dataset.py`,
and `eval/metrics.py` import and RUN unmodified; the parity tests then compare
their outputs against sibrar_tpu's.

Used by: tests/test_reference_parity.py.
"""
from __future__ import annotations

import dataclasses
import enum
import sys
import types
import typing

REFERENCE_PATH = "/root/reference"


# --------------------------------------------------------------- mashumaro shim
class MissingField(Exception):
    def __init__(self, field_name: str, *a):
        super().__init__(f"missing field {field_name!r}")
        self.field_name = field_name


def _convert(tp, value):
    """Recursive dict→dataclass conversion covering the type shapes the
    reference's config classes use: dataclasses, enums, List[...], tuples,
    Optional/unions, and passthrough scalars."""
    if value is None or tp is None or tp is typing.Any:
        return value
    origin = typing.get_origin(tp)
    if origin in (list, typing.List):
        (sub,) = typing.get_args(tp) or (None,)
        return [_convert(sub, v) for v in value]
    if origin is tuple:
        return tuple(value)
    if origin is typing.Union or str(origin) == "types.UnionType":
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        for a in args:
            try:
                return _convert(a, value)
            except Exception:
                continue
        return value
    if isinstance(tp, type):
        if issubclass(tp, enum.Enum):
            return value if isinstance(value, tp) else tp(value)
        if dataclasses.is_dataclass(tp):
            return tp.from_dict(value) if hasattr(tp, "from_dict") else tp(**value)
        if tp is tuple:
            return tuple(value)
    return value


class DataClassDictMixin:
    @classmethod
    def from_dict(cls, d: dict, **_kwargs):
        hints = typing.get_type_hints(cls)
        kwargs = {}
        for f in dataclasses.fields(cls):
            if not f.init:
                continue
            if f.name in d:
                kwargs[f.name] = _convert(hints.get(f.name), d[f.name])
            elif (f.default is dataclasses.MISSING
                  and f.default_factory is dataclasses.MISSING):
                raise MissingField(f.name)
        return cls(**kwargs)

    def to_dict(self, **_kwargs):
        return dataclasses.asdict(self)


# ------------------------------------------------------------------- param shim
class _Parameterized:
    """Stand-in for param.Parameterized: the reference only uses it as a mixin
    whose field descriptors (Integer/Number/Selector) carry defaults + bounds;
    with plain defaults the dataclass machinery does the rest."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)


def _param_field(default=None, *args, **kwargs):
    return default


def install_reference_shims() -> None:
    """Install stub modules + put /root/reference on sys.path (idempotent)."""
    if "mashumaro" not in sys.modules:
        mash = types.ModuleType("mashumaro")
        mash.DataClassDictMixin = DataClassDictMixin
        exc = types.ModuleType("mashumaro.exceptions")
        exc.MissingField = MissingField
        mash.exceptions = exc
        mixins = types.ModuleType("mashumaro.mixins")
        mixins_yaml = types.ModuleType("mashumaro.mixins.yaml")

        class DataClassYAMLMixin(DataClassDictMixin):
            pass

        mixins_yaml.DataClassYAMLMixin = DataClassYAMLMixin
        mixins.yaml = mixins_yaml
        sys.modules["mashumaro"] = mash
        sys.modules["mashumaro.exceptions"] = exc
        sys.modules["mashumaro.mixins"] = mixins
        sys.modules["mashumaro.mixins.yaml"] = mixins_yaml

    if "param" not in sys.modules:
        par = types.ModuleType("param")
        par.Parameterized = _Parameterized
        par.Integer = _param_field
        par.Number = _param_field
        par.Boolean = _param_field
        par.String = _param_field

        def _selector(default=None, objects=(), **kwargs):
            return default

        par.Selector = _selector
        sys.modules["param"] = par

    if "wandb" not in sys.modules:
        # imported (transitively) by algorithms/sgd_alg.py via explanations;
        # the parity tests never log anything
        wb = types.ModuleType("wandb")
        wb.Image = object
        wb.log = lambda *a, **k: None
        wb.init = lambda *a, **k: None
        sys.modules["wandb"] = wb

    if "natsort" not in sys.modules:
        nat = types.ModuleType("natsort")

        def natsorted(seq, key=None):
            import re

            def natkey(s):
                s = key(s) if key else s
                return [int(t) if t.isdigit() else t
                        for t in re.split(r"(\d+)", str(s))]

            return sorted(seq, key=natkey)

        nat.natsorted = natsorted
        sys.modules["natsort"] = nat

    if REFERENCE_PATH not in sys.path:
        sys.path.append(REFERENCE_PATH)
