"""Local Bayesian hyperparameter optimization (Tree-structured Parzen
Estimator, Bergstra et al. 2011).

Parity target: the reference's paper grid is overwhelmingly Bayesian —
120 of its 140 sweep YAMLs declare ``method: bayes``
(`/root/reference/conf/sweeps/`), optimized server-side by W&B. This module
supplies the zero-egress equivalent driving `sweep.run_sweep(method:
"bayes")`: a self-contained numpy TPE over the same parameter-spec language
(``values`` categoricals, ``min``/``max`` continuous and ``int_uniform``
ranges, ``log_uniform`` distributions).

TPE in one paragraph: after ``n_startup`` random trials, split the history
at the ``gamma`` quantile of the objective into *good* and *bad* sets, fit a
1-D Parzen (Gaussian-mixture) density per parameter to each set — ``l(x)``
over good values, ``g(x)`` over bad — then draw candidates from ``l`` and
keep the one maximizing ``l(x)/g(x)`` (the expected-improvement surrogate).
Parameters are modeled independently (the standard TPE factorization — also
what W&B's implementation does); log-uniform parameters are modeled in log
space; categoricals use Laplace-smoothed reweighted counts. Each density
mixes in the uniform prior over the search range as one extra component, so
no region is ever assigned zero mass and exploration never collapses.

Determinism: a fixed seed gives a fixed trial sequence (given identical
observed objectives) — matching the sweep engine's resumability story.
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np


def _is_int_range(spec: dict) -> bool:
    return (isinstance(spec.get("min"), int) and isinstance(spec.get("max"), int)
            and spec.get("distribution", "int_uniform") == "int_uniform")


class TPESampler:
    """Suggest-observe sampler over a ``parameters`` dict (sweep-YAML specs).

    Parameters
    ----------
    parameters:
        ``{key: spec}`` where spec is a constant, ``{"values": [...]}``, or
        ``{"min": lo, "max": hi[, "distribution": "log_uniform"]}``.
    seed:
        Seeds both the startup phase and candidate draws.
    n_startup:
        Random trials before the Parzen split kicks in (classic TPE warmup).
    gamma:
        Fraction of the history labeled *good* (top quantile by objective).
    n_candidates:
        Candidates drawn from ``l`` per suggestion; the argmax of ``l/g`` wins.
    """

    def __init__(self, parameters: dict[str, Any], seed: int = 0, *,
                 n_startup: int = 8, gamma: float = 0.25,
                 n_candidates: int = 24):
        self.parameters = parameters
        self.rng = np.random.default_rng(seed)
        self.n_startup = n_startup
        self.gamma = gamma
        self.n_candidates = n_candidates
        # history: list of (params_dict, objective float | None); objective
        # is HIGHER-IS-BETTER (the sweep engine sign-flips minimize goals)
        self.history: list[tuple[dict[str, Any], Optional[float]]] = []

    # ------------------------------------------------------------------ api
    def observe(self, params: dict[str, Any], objective: Optional[float]):
        """Record a finished trial. ``None`` marks a failed/metric-less
        trial; it is kept out of the good set but still repels the search
        as a member of the bad set."""
        self.history.append((params, objective))

    def suggest(self) -> dict[str, Any]:
        from sibrar_tpu.sweep import _sample_value  # random-phase sampling

        scored = [(p, o) for p, o in self.history if o is not None
                  and np.isfinite(o)]
        if len(scored) < self.n_startup:
            return {k: _sample_value(self.rng, spec)
                    for k, spec in self.parameters.items()}
        scored.sort(key=lambda t: t[1], reverse=True)
        n_good = max(1, int(np.ceil(self.gamma * len(scored))))
        good = [p for p, _ in scored[:n_good]]
        # failed trials join the bad set: the search moves away from them
        bad = ([p for p, _ in scored[n_good:]]
               + [p for p, o in self.history
                  if o is None or not np.isfinite(o)])
        if not bad:  # degenerate tiny history: fall back to the prior
            return {k: _sample_value(self.rng, spec)
                    for k, spec in self.parameters.items()}
        return {k: self._suggest_one(k, spec, good, bad)
                for k, spec in self.parameters.items()}

    # ------------------------------------------------------------ per-param
    def _suggest_one(self, key: str, spec: Any, good: list, bad: list):
        if not isinstance(spec, dict):
            return spec
        if "values" in spec:
            return self._suggest_categorical(key, spec["values"], good, bad)
        if "min" in spec and "max" in spec:
            return self._suggest_numeric(key, spec, good, bad)
        raise ValueError(f"cannot sample from parameter spec {spec!r}")

    def _suggest_categorical(self, key: str, values: list, good, bad):
        def counts(group):
            c = np.ones(len(values))  # Laplace prior: never zero mass
            for p in group:
                if key not in p:
                    continue
                for j, v in enumerate(values):  # == compare: values may be
                    if p[key] == v:             # dicts/lists (unhashable)
                        c[j] += 1.0
                        break
            return c / c.sum()

        p_good, p_bad = counts(good), counts(bad)
        cand = self.rng.choice(len(values), size=self.n_candidates,
                               p=p_good)
        ratio = p_good[cand] / p_bad[cand]
        return values[int(cand[int(np.argmax(ratio))])]

    def _suggest_numeric(self, key: str, spec: dict, good, bad):
        lo, hi = float(spec["min"]), float(spec["max"])
        log = spec.get("distribution") == "log_uniform"
        to_z = (lambda x: np.log(x)) if log else (lambda x: x)
        from_z = (lambda z: float(np.exp(z))) if log else float
        lo_z, hi_z = to_z(lo), to_z(hi)
        span = hi_z - lo_z

        def obs(group):
            return np.asarray([to_z(float(p[key])) for p in group
                               if key in p], dtype=np.float64)

        g_z, b_z = obs(good), obs(bad)
        if g_z.size == 0 or b_z.size == 0 or span <= 0:
            z = self.rng.uniform(lo_z, hi_z)
            return self._finalize(from_z(z), spec)

        def bandwidth(zs):
            # Scott's rule with a floor: a collapsed good set must keep a
            # usable kernel width or the mixture degenerates to spikes
            s = float(np.std(zs)) if zs.size > 1 else 0.0
            return max(1.06 * s * zs.size ** -0.2, span / 50.0)

        h_g, h_b = bandwidth(g_z), bandwidth(b_z)

        def mix_logpdf(x, centers, h):
            # Parzen mixture + one uniform-prior component (weight 1/(n+1))
            # so no region of the range ever has zero density
            n = centers.size
            d = (x[:, None] - centers[None, :]) / h
            k = np.exp(-0.5 * d * d) / (h * np.sqrt(2 * np.pi))
            dens = (k.sum(axis=1) + 1.0 / span) / (n + 1)
            return np.log(np.maximum(dens, 1e-300))

        # draw candidates from l: pick a good center (or the prior), jitter
        pick = self.rng.integers(-1, g_z.size, size=self.n_candidates)
        z = np.where(pick < 0,
                     self.rng.uniform(lo_z, hi_z, size=self.n_candidates),
                     g_z[np.maximum(pick, 0)]
                     + self.rng.normal(0.0, h_g, size=self.n_candidates))
        z = np.clip(z, lo_z, hi_z)
        score = mix_logpdf(z, g_z, h_g) - mix_logpdf(z, b_z, h_b)
        return self._finalize(from_z(float(z[int(np.argmax(score))])), spec)

    @staticmethod
    def _finalize(x: float, spec: dict):
        if _is_int_range(spec):
            return int(np.clip(round(x), spec["min"], spec["max"]))
        return float(x)


__all__ = ["TPESampler"]
