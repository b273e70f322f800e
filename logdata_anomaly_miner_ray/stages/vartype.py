"""Variable-type inference (VariableTypeDetector recast).

Reference semantics (aminer/analysis/VariableTypeDetector.py:887-968
``detect_var_type``): from an initial sample of a variable, classify
it among

- ``stat``  — a single constant value
- ``asc`` / ``desc`` — monotonically non-decreasing / non-increasing
  numerics (int/float flavor)
- ``continuous`` — diverse numerics fitting a tested continuous
  shape: the FULL reference battery (uniform, normal, the five beta
  families — detect_continuous_shape:969-1165) via scipy-free KS
  p-values or the CM statistic, with closed-form beta CDFs; sliding
  re-tests with binomial backtracking in ``s_gof_retest`` /
  ``GofBacktracker`` (reference :1605-1700)
- ``range`` — diverse numerics fitting no tested shape but bounded
- ``d``     — discrete: few distinct values with stable frequencies
- ``unq``   — all values distinct (identifier-like)
- ``others`` — too many distinct values without numeric structure

Batch recast: classification runs on per-column per-group samples
collected by the column-stat partial pass (or any reservoir); the
inference itself is a small-numpy driver/actor computation —
matching the reference, which also classifies on an in-memory
``num_init`` sample (EventTypeDetector ring buffers,
EventTypeDetector.py:31-32). Drift re-tests are in stages/drift.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np


DIV_THRES = 0.3  # reference default div_thres (VariableTypeDetector.py:52)
SIM_THRES = 0.1  # reference default sim_thres
KS_ALPHA = 0.05


@dataclass
class VarType:
    kind: str  # stat | asc | desc | continuous | range | d | unq | others
    detail: dict[str, Any] = field(default_factory=dict)


def _ks_stat_against_cdf(sorted_vals: np.ndarray, cdf: np.ndarray) -> float:
    n = len(sorted_vals)
    ecdf_hi = np.arange(1, n + 1) / n
    ecdf_lo = np.arange(0, n) / n
    return float(np.maximum(np.abs(ecdf_hi - cdf), np.abs(cdf - ecdf_lo)).max())


def ks_pvalue(d: float, n: int) -> float:
    """Asymptotic one-sample KS p-value (Kolmogorov distribution
    survival function with the standard small-n correction
    λ = (√n + 0.12 + 0.11/√n)·D; |err| small for n ≥ 40). No scipy
    in this environment."""
    if d <= 0:
        return 1.0
    lam = (np.sqrt(n) + 0.12 + 0.11 / np.sqrt(n)) * d
    k = np.arange(1, 101)
    terms = 2 * (-1.0) ** (k - 1) * np.exp(-2.0 * (k * lam) ** 2)
    return float(np.clip(terms.sum(), 0.0, 1.0))


def _norm_cdf(x: np.ndarray) -> np.ndarray:
    return 0.5 * (1.0 + _erf_vec(np.asarray(x, dtype=np.float64) / np.sqrt(2.0)))


def _beta_cdf(x: np.ndarray, a, b) -> np.ndarray:
    """CDF of Beta(a, b) for the families the reference tests —
    (0.5, 0.5) is the arcsine law; integer (a, b) have the binomial
    closed form I_x(a,b) = Σ_{j=a}^{n} C(n,j)·x^j·(1−x)^{n−j} with
    n = a+b−1. No scipy needed."""
    x = np.clip(np.asarray(x, dtype=np.float64), 0.0, 1.0)
    if (a, b) == (0.5, 0.5):
        return 2.0 / np.pi * np.arcsin(np.sqrt(x))
    a, b = int(a), int(b)
    n = a + b - 1
    out = np.zeros_like(x)
    from math import comb

    for j in range(a, n + 1):
        out += comb(n, j) * x**j * (1.0 - x) ** (n - j)
    return out


# the five beta families of the reference's continuous-GoF battery
# (detect_continuous_shape: beta1=(0.5,0.5), beta2=(5,2), beta3=(2,5),
# beta4=(1,5), beta5=(5,1)) with their standardized (mu, sigma)
_BETA_FAMILIES = {
    1: (0.5, 0.5, 0.5, 1 / 2.82842712),
    2: (5, 2, 5 / 7, np.sqrt(10.0 / 8.0) / 7),
    3: (2, 5, 2 / 7, np.sqrt(10.0 / 8.0) / 7),
    4: (1, 5, 1 / 6, np.sqrt(5.0 / 7.0) / 6),
    5: (5, 1, 5 / 6, np.sqrt(5.0 / 7.0) / 6),
}

# asymptotic Cramér-von-Mises critical values (one-sample W²)
_CM_CRIT = {0.10: 0.347, 0.05: 0.461, 0.025: 0.581, 0.01: 0.743}


def cm_statistic(sorted_vals: np.ndarray, cdf: np.ndarray) -> float:
    """One-sample Cramér-von-Mises W² against the given CDF values
    (reference's own cramervonmises helper,
    VariableTypeDetector.py:2367-2386)."""
    n = len(sorted_vals)
    i = np.arange(n)
    return float(1.0 / (12 * n) + (((2 * i + 1) / (2 * n) - cdf) ** 2).sum())


def detect_continuous_shape(
    values: np.ndarray, gof_alpha: float = KS_ALPHA, used_gof_test: str = "KS"
) -> VarType | None:
    """The reference's continuous-GoF battery
    (VariableTypeDetector.py:969-1165): uniform, normal and the five
    beta families, tested via one-sample KS p-values (or the CM
    statistic against asymptotic critical values); the best-fitting
    accepted family wins, runner-ups recorded. The 'betam'/'spec'
    entries (reference-shipped empirical quantile files) are out of
    scope — a documented deviation. Returns None when nothing fits."""
    f = np.sort(np.asarray(values, dtype=np.float64))
    n = len(f)
    lo, hi = float(f[0]), float(f[-1])
    mu, sd = float(f.mean()), float(f.std())
    if hi <= lo or sd <= 0 or n < 3:
        return None
    cands: list[tuple[str, dict, np.ndarray]] = [
        ("uniform", {"min": lo, "max": hi}, np.clip((f - lo) / (hi - lo), 0, 1)),
        ("normal", {"mean": mu, "std": sd, "min": lo, "max": hi},
         _norm_cdf((f - mu) / sd)),
    ]
    for fam, (a, b, bmu, bsd) in _BETA_FAMILIES.items():
        if fam == 1:
            t = (f - lo) / (hi - lo)
        else:
            t = (f - mu) / sd * bsd + bmu
        cands.append(
            (f"beta{fam}",
             {"a": a, "b": b, "mean": mu, "std": sd, "min": lo, "max": hi},
             _beta_cdf(t, a, b))
        )
    sigs: list[float] = []
    for _, _, cdf in cands:
        d = _ks_stat_against_cdf(f, cdf)
        if used_gof_test == "KS":
            sigs.append(ks_pvalue(d, n))
        else:  # CM: ratio statistic/crit — accepted below 1
            crit = _CM_CRIT.get(gof_alpha, 0.461)
            sigs.append(cm_statistic(f, cdf) / crit)
    if used_gof_test == "KS":
        order = np.argsort(sigs)[::-1]
        if sigs[order[0]] < gof_alpha:
            return None
        runner_ups = [cands[i][0] for i in order[1:] if sigs[i] >= gof_alpha]
    else:
        order = np.argsort(sigs)
        if sigs[order[0]] > 1.0:
            return None
        runner_ups = [cands[i][0] for i in order[1:] if sigs[i] <= 1.0]
    name, detail, _ = cands[order[0]]
    detail = dict(detail)
    detail["dist"] = name
    detail["sig"] = float(sigs[order[0]])
    detail["runner_ups"] = runner_ups
    return VarType("continuous", detail)


def s_gof_retest(
    values: np.ndarray,
    vt: VarType,
    s_gof_alpha: float = 0.05,
    num_s_gof_values: int | None = None,
    used_gof_test: str = "KS",
) -> tuple[bool, float]:
    """Sliding re-test of a new sample against the LEARNED continuous
    shape (reference s_gof_test, VariableTypeDetector.py:1605-1700):
    KS statistic of the update window vs the fitted CDF, accepted
    under the two-sample-style critical value
    √((N+m)·ln(2/α)/(2·N·m)) with N = 2m (the reference's fallback
    when no simulated table matches). Returns (passed, statistic)."""
    f = np.sort(np.asarray(values, dtype=np.float64))
    m = num_s_gof_values or len(f)
    d = vt.detail
    name = d.get("dist")
    if name == "uniform":
        cdf = np.clip((f - d["min"]) / max(d["max"] - d["min"], 1e-300), 0, 1)
    elif name == "normal":
        cdf = _norm_cdf((f - d["mean"]) / max(d["std"], 1e-300))
    elif name and name.startswith("beta"):
        fam = int(name[4:])
        a, b, bmu, bsd = _BETA_FAMILIES[fam]
        if fam == 1:
            t = (f - d["min"]) / max(d["max"] - d["min"], 1e-300)
        else:
            t = (f - d["mean"]) / max(d["std"], 1e-300) * bsd + bmu
        cdf = _beta_cdf(t, a, b)
    else:
        raise ValueError(f"not a continuous VarType: {vt.kind}/{name}")
    stat = _ks_stat_against_cdf(f, cdf)
    nd = 2 * m
    crit = np.sqrt((nd + m) * np.log(2.0 / s_gof_alpha) / (2.0 * nd * m))
    return bool(stat < crit), float(stat)


class GofBacktracker:
    """Binomial backtracking over sliding re-test outcomes
    (reference: num_s_gof_bt trailing results; the learned type is
    rejected only when trailing successes drop under
    bt_min_successes(num_bt, 1−α_bt, α_bt) — one failed window never
    discards a learned distribution)."""

    def __init__(self, num_bt: int = 30, alpha_bt: float = 0.1):
        from .correlation_rules import bt_min_successes

        self.num_bt = num_bt
        self.min_successes = bt_min_successes(num_bt, 1 - alpha_bt, alpha_bt)
        self.results: dict[Any, list[int]] = {}

    def record(self, key, passed: bool) -> bool:
        """Record one re-test outcome; returns True when the learned
        type must be DISCARDED (and resets its window)."""
        hist = self.results.setdefault(key, [1] * self.num_bt)
        hist.append(1 if passed else 0)
        del hist[0]
        if not passed and sum(hist) < self.min_successes:
            self.results[key] = [1] * self.num_bt
            return True
        return False


def infer_var_type(values: "np.ndarray | list", num_init: int | None = None) -> VarType:
    """Classify one variable's sample, mirroring detect_var_type's
    decision order: stat → asc/desc → continuous/range → d/unq/others."""
    vals = list(values if num_init is None else values[-num_init:])
    n = len(vals)
    if n == 0:
        return VarType("others")
    uniq = set(str(v) for v in vals)
    if len(uniq) == 1:
        return VarType("stat", {"value": vals[0]})

    # numeric conversion (reference convert_to_floats)
    try:
        f = np.asarray([float(v) for v in vals], dtype=np.float64)
        numeric = np.isfinite(f).all()
    except (TypeError, ValueError):
        numeric = False
    if numeric:
        is_int = bool(np.all(f == np.floor(f)))
        d = np.diff(f)
        if np.all(d >= 0):
            return VarType("asc", {"int": is_int})
        if np.all(d <= 0):
            return VarType("desc", {"int": is_int})
        num_diff = len(np.unique(f))
        if num_diff > DIV_THRES * n:
            # diverse numerics → the full continuous-GoF battery
            # (uniform/normal/beta1..beta5, KS p-values)
            vt = detect_continuous_shape(f, gof_alpha=KS_ALPHA, used_gof_test="KS")
            if vt is not None:
                return vt
            return VarType(
                "range", {"min": float(f.min()), "max": float(f.max())}
            )

    # non-numeric or low-diversity → d / unq / others
    num_diff = len(uniq)
    if num_diff == n:
        return VarType("unq")
    if num_diff >= n * (1 - SIM_THRES):
        return VarType("others")
    keys, counts = np.unique(np.asarray([str(v) for v in vals]), return_counts=True)
    return VarType(
        "d", {"values": keys.tolist(), "probs": (counts / n).tolist(), "n": n}
    )


def _erf_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized erf (Abramowitz-Stegun 7.1.26, |err| < 1.5e-7) —
    no scipy in this environment."""
    sign = np.sign(x)
    ax = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * np.exp(-ax * ax))


def infer_types_by_group(
    ds, group_col: str, value_col: str, sample_per_group: int = 1000,
    with_sizes: bool = False,
):
    """Per-group variable-type classification over a Dataset column:
    per-block reservoir-ish head samples merged per group (bounded,
    mirroring the reference's ring buffers), classified driver-side.
    Returns {group: VarType}, or {group: (VarType, sample_size)} with
    ``with_sizes=True`` (sample_size == group size whenever the group
    fits under ``sample_per_group``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        groups = np.asarray(
            pc.cast(batch[group_col], pa.string()).to_numpy(zero_copy_only=False),
            dtype=object,
        ).astype(str)
        vals = np.asarray(batch[value_col].to_numpy(zero_copy_only=False))
        gs, blobs = [], []
        for g in np.unique(groups):
            sel = vals[groups == g][:sample_per_group]
            gs.append(str(g))
            import pickle

            blobs.append(pickle.dumps(sel, protocol=5))
        return pa.table({"g": pa.array(gs, pa.string()), "s": pa.array(blobs, pa.binary())})

    import pickle

    samples: dict[str, list] = {}
    for b in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for g, blob in zip(b["g"].to_pylist(), b["s"].to_pylist()):
            cur = samples.setdefault(g, [])
            if len(cur) < sample_per_group:
                cur.extend(pickle.loads(blob).tolist())
    if with_sizes:
        return {
            g: (infer_var_type(np.asarray(v[:sample_per_group])),
                min(len(v), sample_per_group))
            for g, v in samples.items()
        }
    return {g: infer_var_type(np.asarray(v[:sample_per_group])) for g, v in samples.items()}
