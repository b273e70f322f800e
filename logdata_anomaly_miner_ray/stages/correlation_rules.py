"""Per-event-type variable-correlation rules — the FULL
VariableCorrelationDetector recast (reference:
aminer/analysis/VariableCorrelationDetector.py:15-1642), clean-room:

1. discrete-variable selection: a column is discrete when its init
   sample has >1 and ≤ disc_div_thres·num_init distinct values
   (reference init_cor:330-336);
2. candidate-pair PRESELECTION: matchDiscDistr (sorted probability
   lists pairwise close, :1235), excludeDueDistr (no value dominates
   past ε = lim + (1−lim)/k, :1248), matchDiscVals (value-set overlap
   > sim·min(len), :1262), random (seeded percentage of all pairs,
   :1269); union or intersection across methods (:419-434);
3. "Rel" rules: deterministic value implications i=a → j=b in BOTH
   directions, a rule surviving only when its left value co-occurred
   with exactly one right value (init_cor_rel:438-499; batch
   semantics: consistency over the WHOLE fitted sample — the
   reference's streaming pass can resurrect a violated rule from a
   trailing consistent run, a replay artifact we deliberately drop);
4. "WRel" rules: per left value the conditional count distribution
   of right values, pruned by check_cor_w_rel (:1304-1310);
5. UPDATE/TEST lifecycle: new-sample distributions are tested for
   homogeneity against the learned WRel rules ("Chi": two-sample
   chi-square against the chi²(1−α, k−1) quantile, :1200-1222, no
   scipy — quantile via bisected regularized incomplete gamma;
   "MaxDist": max probability distance, :1223-1232), with BINOMIAL
   BACKTRACKING — a rule fails only when its trailing num_bt test
   results drop below bt_min_successes(num_bt, 1−α_bt, α_bt)
   (:161, :1628-1642);
6. VALIDATION: coverVals prunes rule sets covering < thres of the
   event type's lines (:1320-1354); distinctDistr prunes WRel pairs
   whose per-left-value conditional distributions have pooled
   variance < thres (:1356-1420).

Execution shape: ONE ``map_batches`` computes per-block (pair, a, b)
co-occurrence count partials for every candidate pair at once; one
small groupby merges them; all rule math runs on the tiny aggregate
(values² per pair) — the wide table never shuffles.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum


@dataclass
class VarCorConfig:
    """Reference defaults (VariableCorrelationDetector.__init__)."""

    num_init: int = 100
    disc_div_thres: float = 0.3
    check_cor_thres: float = 0.5
    check_cor_prob_thres: float = 1.0
    check_cor_num_thres: int = 10
    min_values_cors_thres: int = 5
    num_bt: int = 30
    alpha_bt: float = 0.1
    used_homogeneity_test: str = "Chi"
    alpha_chisquare_test: float = 0.05
    max_dist_rule_distr: float = 0.1
    used_presel_meth: list = field(default_factory=list)
    intersect_presel_meth: bool = False
    percentage_random_cors: float = 0.20
    match_disc_vals_sim_tresh: float = 0.7
    exclude_due_distr_lower_limit: float = 0.4
    match_disc_distr_threshold: float = 0.5
    validate_cor_cover_vals_thres: float = 0.7
    validate_cor_distinct_thres: float = 0.05
    seed: int = 42


# ---------------------------------------------------------------------------
# scipy-free chi-square quantile
# ---------------------------------------------------------------------------


def _gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) — series for
    x < a+1, continued fraction otherwise (standard public
    formulations; |err| ~ 1e-12)."""
    if x <= 0:
        return 0.0
    gln = math.lgamma(a)
    if x < a + 1.0:
        ap, s, d = a, 1.0 / a, 1.0 / a
        for _ in range(500):
            ap += 1.0
            d *= x / ap
            s += d
            if abs(d) < abs(s) * 1e-15:
                break
        return s * math.exp(-x + a * math.log(x) - gln)
    # continued fraction for Q, P = 1 - Q
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    q = math.exp(-x + a * math.log(x) - gln) * h
    return 1.0 - q


def chi2_ppf(p: float, k: int) -> float:
    """Inverse chi-square CDF by bisection on P(k/2, x/2)."""
    if k <= 0:
        return 0.0
    lo, hi = 0.0, max(10.0, 4.0 * k)
    while _gammainc_p(k / 2.0, hi / 2.0) < p:
        hi *= 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if _gammainc_p(k / 2.0, mid / 2.0) < p:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def bt_min_successes(num_bt: int, p: float, alpha: float) -> int:
    """Smallest trailing-success count that keeps the binomial test
    alive (reference :1628-1642): largest m with
    P[Binom(num_bt, p) ≤ num_bt − m] > alpha crossing."""
    tmp = 0.0
    for i in range(num_bt + 1):
        tmp += math.comb(num_bt, i) * ((1 - p) ** i) * (p ** (num_bt - i))
        if tmp > alpha:
            return num_bt - i
    return 0


# ---------------------------------------------------------------------------
# discrete selection + preselection
# ---------------------------------------------------------------------------


def select_discrete_columns(
    sample: pd.DataFrame, columns: list[str], cfg: VarCorConfig
) -> dict[str, tuple[list, list]]:
    """{column: (values, probs)} for columns whose sample is
    discrete: >1 and ≤ disc_div_thres·num_init distinct values."""
    out: dict[str, tuple[list, list]] = {}
    for c in columns:
        vals = sample[c].dropna().astype(str).to_numpy()[-cfg.num_init :]
        uniq, cnt = np.unique(vals, return_counts=True)
        if 1 < len(uniq) <= cfg.disc_div_thres * cfg.num_init:
            out[c] = (uniq.tolist(), (cnt / cnt.sum()).tolist())
    return out


def match_disc_distr(p1: list, p2: list, threshold: float) -> bool:
    a = sorted(p1, reverse=True)
    b = sorted(p2, reverse=True)
    for x, y in zip(a, b):
        if abs(x - y) > threshold / max(len(a), len(b)):
            return False
    return True


def exclude_due_distr(probs: list, lower_limit: float) -> bool:
    eps = lower_limit + (1 - lower_limit) / len(probs)
    return all(v <= eps for v in probs)


def match_disc_vals(v1: list, v2: list, sim_thresh: float) -> bool:
    overlap = len([v for v in v1 if v in v2])
    return overlap > sim_thresh * min(len(v1), len(v2))


def preselect_pairs(
    col_stats: dict[str, tuple[list, list]], cfg: VarCorConfig
) -> list[tuple[str, str]]:
    """Candidate (col_a, col_b) pairs by the configured preselection
    methods (all pairs when none configured); union by default,
    intersection with ``intersect_presel_meth``."""
    cols = sorted(col_stats)
    all_pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    if not cfg.used_presel_meth:
        return all_pairs
    result: list[tuple[str, str]] | None = None
    rng = np.random.default_rng(cfg.seed)
    for meth in cfg.used_presel_meth:
        if meth == "excludeDueDistr":
            ok = [
                c for c in cols
                if exclude_due_distr(col_stats[c][1], cfg.exclude_due_distr_lower_limit)
            ]
            tmp = [(a, b) for i, a in enumerate(ok) for b in ok[i + 1 :]]
        elif meth == "matchDiscDistr":
            tmp = [
                (a, b) for (a, b) in all_pairs
                if match_disc_distr(col_stats[a][1], col_stats[b][1], cfg.match_disc_distr_threshold)
            ]
        elif meth == "matchDiscVals":
            tmp = [
                (a, b) for (a, b) in all_pairs
                if match_disc_vals(col_stats[a][0], col_stats[b][0], cfg.match_disc_vals_sim_tresh)
            ]
        elif meth == "random":
            n_total = round(cfg.percentage_random_cors * len(all_pairs))
            idx = rng.choice(len(all_pairs), size=min(n_total, len(all_pairs)), replace=False)
            tmp = [all_pairs[i] for i in sorted(idx)]
        else:
            raise ValueError(f"unknown preselection method {meth!r}")
        if result is None:
            result = list(tmp)
        elif cfg.intersect_presel_meth:
            result = [p for p in result if p in tmp]
        else:
            result += [p for p in tmp if p not in result]
    return result or []


# ---------------------------------------------------------------------------
# distributed pair co-occurrence counts (the only wide pass)
# ---------------------------------------------------------------------------


def pair_cooccurrence_counts(
    ds: "ray.data.Dataset", pairs: list[tuple[str, str]]
) -> dict[tuple[str, str], pd.DataFrame]:
    """{pair: (a, b, n) counts} — ONE block pass emits every pair's
    block-local counts, one groupby merges (shuffle = distinct
    (pair, a, b) triples only)."""
    if not pairs:
        return {}
    pair_idx = {p: i for i, p in enumerate(pairs)}

    def partial(batch: pa.Table) -> pa.Table:
        outs = []
        for (ca, cb), pi in pair_idx.items():
            t = pa.table(
                {
                    "a": pc.cast(batch[ca], pa.string()),
                    "b": pc.cast(batch[cb], pa.string()),
                }
            )
            g = t.group_by(["a", "b"]).aggregate([([], "count_all")])
            g = g.rename_columns(["a", "b", "__pn"])
            outs.append(
                g.append_column("pair", pa.array(np.full(g.num_rows, pi), pa.int64()))
            )
        return pa.concat_tables(outs)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["pair", "a", "b"])
        .aggregate(Sum("__pn", alias_name="n"))
        .to_pandas()
    )
    out: dict[tuple[str, str], pd.DataFrame] = {}
    for p, pi in pair_idx.items():
        out[p] = merged[merged["pair"] == pi][["a", "b", "n"]].reset_index(drop=True)
    return out


# ---------------------------------------------------------------------------
# Rel / WRel rule fitting
# ---------------------------------------------------------------------------


def fit_rel_rules(cooc: pd.DataFrame) -> dict[str, dict]:
    """Deterministic 1:1 implications, both directions: a left value
    maps iff exactly one right value ever co-occurred with it."""
    fwd, rev = {}, {}
    for a, g in cooc.groupby("a"):
        if g["b"].nunique() == 1:
            fwd[a] = (g["b"].iloc[0], int(g["n"].sum()))
    for b, g in cooc.groupby("b"):
        if g["a"].nunique() == 1:
            rev[b] = (g["a"].iloc[0], int(g["n"].sum()))
    return {"fwd": fwd, "rev": rev}


def check_cor_w_rel(counts, total_pos_val: int, cfg: VarCorConfig) -> bool:
    """Reference check_cor_w_rel (:1304-1310): keep the left value's
    distribution as a possible correlation."""
    counts = list(counts)
    if (cfg.check_cor_thres * total_pos_val < len(counts)) and (
        total_pos_val > cfg.check_cor_num_thres
        or max(counts) - min(counts) < cfg.check_cor_prob_thres * sum(counts) / len(counts)
    ):
        return False
    return True


def fit_w_rel_rules(
    cooc: pd.DataFrame, n_a_vals: int, n_b_vals: int, cfg: VarCorConfig
) -> dict[str, dict]:
    """Weighted conditional distributions, both directions, pruned
    by check_cor_w_rel."""
    fwd, rev = {}, {}
    for a, g in cooc.groupby("a"):
        d = dict(zip(g["b"], g["n"].astype(int)))
        if check_cor_w_rel(d.values(), n_b_vals, cfg):
            fwd[a] = d
    for b, g in cooc.groupby("b"):
        d = dict(zip(g["a"], g["n"].astype(int)))
        if check_cor_w_rel(d.values(), n_a_vals, cfg):
            rev[b] = d
    return {"fwd": fwd, "rev": rev}


# ---------------------------------------------------------------------------
# update/test lifecycle
# ---------------------------------------------------------------------------


def homogeneity_test(
    learned: dict, observed: dict, cfg: VarCorConfig
) -> bool:
    """Two-sample homogeneity of the learned rule distribution vs a
    new sample's counts over the learned value set. True = passed."""
    if cfg.used_homogeneity_test == "Chi":
        stat = 0.0
        tot1 = sum(learned.values())
        tot2 = sum(observed.get(v, 0) for v in learned)
        if tot1 == 0 or len(learned) < 2:
            return True
        for v, o1 in learned.items():
            if o1 <= 0:
                continue
            o2 = observed.get(v, 0)
            e1 = tot1 * (o1 + o2) / (tot1 + tot2)
            stat += (o1 - e1) ** 2 / e1
            e2 = tot2 * (o1 + o2) / (tot1 + tot2)
            stat += (o2 - e2) ** 2 / e2
        return stat < chi2_ppf(1 - cfg.alpha_chisquare_test, len(learned) - 1)
    if cfg.used_homogeneity_test == "MaxDist":
        tot1 = sum(learned.values())
        tot2 = max(1, sum(observed.get(v, 0) for v in learned))
        for v, o1 in learned.items():
            if abs(o1 / tot1 - observed.get(v, 0) / tot2) > cfg.max_dist_rule_distr:
                return False
        return True
    raise ValueError(f"unknown homogeneity test {cfg.used_homogeneity_test!r}")


class WRelTester:
    """Binomial-backtracked rule testing: each rule keeps its
    trailing num_bt homogeneity results; it FAILS (is reported and
    reset) only when the trailing success count drops below
    bt_min_successes(num_bt, 1−α_bt, α_bt) — one flaky update batch
    never kills a rule (reference :1185-1197)."""

    def __init__(self, w_rel: dict[tuple, dict], cfg: VarCorConfig):
        self.cfg = cfg
        self.w_rel = w_rel  # {(pair, direction): {left: {right: n}}}
        self.min_successes = bt_min_successes(cfg.num_bt, 1 - cfg.alpha_bt, cfg.alpha_bt)
        self.results: dict[tuple, dict[str, list[int]]] = {
            k: {lv: [1] * cfg.num_bt for lv in rules} for k, rules in w_rel.items()
        }

    def test_batch(self, observed: dict[tuple, pd.DataFrame]) -> list[tuple]:
        """Run one update batch of co-occurrence counts through the
        homogeneity tests; returns the rules that FAILED the binomial
        backtracking as (pair, direction, left_value)."""
        failed = []
        for key, rules in self.w_rel.items():
            (pair, direction) = key
            obs = observed.get(pair)
            for left, dist in rules.items():
                if obs is None:
                    continue
                side, other = ("a", "b") if direction == 0 else ("b", "a")
                sel = obs[obs[side].astype(str) == str(left)]
                counts = dict(zip(sel[other].astype(str), sel["n"].astype(int)))
                if not counts:
                    continue  # left value absent from this batch
                ok = homogeneity_test(dist, counts, self.cfg)
                hist = self.results[key][left]
                hist.append(1 if ok else 0)
                del hist[0]
                if not ok and sum(hist) < self.min_successes:
                    failed.append((pair, direction, left))
                    self.results[key][left] = [1] * self.cfg.num_bt
        return failed


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------


def validate_cover_vals(
    rules: dict, n_lines: int, thres: float, weighted: bool
) -> dict:
    """Drop a direction's rule set when its rules cover fewer than
    ``thres`` of the event type's lines."""
    out = {}
    for direction, rd_ in rules.items():
        if weighted:
            cover = sum(sum(d.values()) for d in rd_.values())
        else:
            cover = sum(n for (_, n) in rd_.values())
        out[direction] = rd_ if cover >= n_lines * thres else {}
    return out


def validate_distinct_distr(
    w_rules: dict, right_vals: dict, cfg: VarCorConfig
) -> dict:
    """Drop a direction when the conditional distributions across
    left values are too similar (pooled variance < thres) — i.e. the
    'correlation' is indistinguishable from the marginal."""
    out = {}
    for direction, rd_ in w_rules.items():
        rvals = right_vals[direction]
        dists, freqs = [], []
        for _, d in rd_.items():
            tot = sum(d.values())
            if tot > cfg.min_values_cors_thres:
                freqs.append(tot)
                dists.append([d.get(v, 0) / tot for v in rvals])
        if not freqs:
            out[direction] = rd_
            continue
        total = max(1, sum(freqs))
        arr = np.asarray(dists, dtype=np.float64)
        w = np.asarray(freqs, dtype=np.float64) / total
        mean = (arr * w[:, None]).sum(axis=0)
        var = ((arr - mean) ** 2 * w[:, None]).sum(axis=0)
        out[direction] = rd_ if var.sum() >= cfg.validate_cor_distinct_thres else {}
    return out


# ---------------------------------------------------------------------------
# end-to-end convenience
# ---------------------------------------------------------------------------


def correlation_rules(
    ds: "ray.data.Dataset",
    columns: list[str],
    cfg: VarCorConfig | None = None,
    sample: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Fit surviving Rel rules over the full dataset: discrete
    selection + preselection on a driver-side sample, distributed
    pair co-occurrence, deterministic-implication fit. Output rows
    (col_a, val_a, col_b, val_b, n) for BOTH directions (direction
    encoded by column order)."""
    cfg = cfg or VarCorConfig()
    if sample is None:
        sample = ds.limit(cfg.num_init).to_pandas()
    col_stats = select_discrete_columns(sample, columns, cfg)
    pairs = preselect_pairs(col_stats, cfg)
    cooc = pair_cooccurrence_counts(ds, pairs)
    rows = []
    for (ca, cb) in pairs:
        rules = fit_rel_rules(cooc[(ca, cb)])
        for a, (b, n) in rules["fwd"].items():
            rows.append((ca, a, cb, b, n))
        for b, (a, n) in rules["rev"].items():
            rows.append((cb, b, ca, a, n))
    return pd.DataFrame(
        rows, columns=["col_a", "val_a", "col_b", "val_b", "n"]
    ).sort_values(["col_a", "val_a", "col_b"]).reset_index(drop=True)
