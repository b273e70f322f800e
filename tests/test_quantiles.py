"""exact_quantiles: DuckDB quantile_disc parity without global sort."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from logdata_anomaly_miner_ray.stages.quantiles import exact_quantiles

QS = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]


def _oracle(vals, qs):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    return [
        con.execute(f"SELECT quantile_disc(x, {q}) FROM t WHERE x IS NOT NULL").fetchone()[0]
        for q in qs
    ]


def _check(ds, vals, qs, **kw):
    got = exact_quantiles(ds, "x", qs, **kw)
    want = _oracle(vals, qs)
    assert list(got["q"]) == [float(q) for q in qs]
    for g, w in zip(got["value"], want):
        assert g == w, (g, w)


def test_continuous_uniform(ray_session):
    rng = np.random.default_rng(3)
    vals = rng.normal(100.0, 15.0, size=20_000)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(16)
    _check(ds, vals, QS)


def test_duplicate_heavy_forces_bisection(ray_session):
    # one value carries 90% of the mass — the digest window around
    # the median is huge; a tiny max_gather forces bisection rounds
    rng = np.random.default_rng(5)
    vals = np.concatenate([np.full(18_000, 42.0), rng.uniform(0, 100, 2_000)])
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(8)
    # block_card_cap=0 disables the low-cardinality fast path so the
    # bisection/window loop stays under test
    _check(ds, vals, [0.1, 0.5, 0.95], max_gather=500, block_card_cap=0)


def test_nulls_ignored_and_small_n(ray_session):
    vals = [None, 3.0, 1.0, None, 2.0]
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    got = exact_quantiles(ds, "x", [0.0, 0.5, 1.0])
    assert list(got["value"]) == [1.0, 2.0, 3.0]


def test_empty(ray_session):
    ds = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    got = exact_quantiles(ds, "x", [0.5])
    assert len(got) == 0


def test_quantiles_property_random(ray_session):
    """Randomized cross-check: mixed continuous + duplicated mass,
    many qs, small max_gather — exact selection must equal numpy's
    k-th order statistic with the quantile_disc rank rule."""
    import math

    rng = np.random.default_rng(17)
    for trial in range(3):
        parts = [
            rng.normal(rng.uniform(-50, 50), rng.uniform(0.1, 20), size=rng.integers(100, 3000)),
            np.full(rng.integers(1, 4000), rng.uniform(-10, 10)),
            rng.integers(-5, 5, size=rng.integers(0, 2000)).astype(np.float64),
        ]
        vals = np.concatenate(parts)
        rng.shuffle(vals)
        qs = sorted(rng.uniform(0, 1, size=5).round(4).tolist())
        ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(6)
        got = exact_quantiles(ds, "x", qs, max_gather=200, block_card_cap=0)
        sv = np.sort(vals)
        n = len(sv)
        for q, g in zip(qs, got["value"]):
            k = max(0, math.ceil(q * n) - 1)
            assert g == sv[min(k, n - 1)], (trial, q, g, sv[min(k, n - 1)])


def test_int64_beyond_float53_exact(ray_session):
    # snowflake-style ids: distinct values that collide in float64
    base = 2**53
    vals = np.array([base + 1, base + 3, base + 5, base + 7, base + 9] * 100, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})).repartition(4)
    # both the low-cardinality path (default) and the window loop
    # (block_card_cap=0) must keep int64 exact beyond 2^53
    for kw in ({}, {"block_card_cap": 0}):
        got = exact_quantiles(ds, "x", [0.0, 0.5, 1.0], max_gather=50, **kw)
        assert got["value"].dtype == np.int64
        assert list(got["value"]) == [base + 1, base + 5, base + 9]


def test_fast_paths_agree_with_window_loop(ray_session):
    """The three execution tiers — low-cardinality one-pass, small-n
    two-pass, and the digest window loop — are the same function of
    the data; force each on the SAME input and compare."""
    rng = np.random.default_rng(23)
    vals = np.concatenate([
        rng.normal(0, 10, 4_000),
        np.full(3_000, 7.25),
        rng.integers(-3, 3, 3_000).astype(np.float64),
    ])
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(8)
    low_card = exact_quantiles(ds, "x", QS)  # per-block card < cap → 1 pass
    small_n = exact_quantiles(ds, "x", QS, block_card_cap=0)  # n<=max_gather → 2 passes
    window = exact_quantiles(ds, "x", QS, block_card_cap=0, max_gather=300)
    pd.testing.assert_frame_equal(low_card, small_n)
    pd.testing.assert_frame_equal(low_card, window)


# ---- grouped_quantiles ----


def test_grouped_quantiles_matches_numpy_brute():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.quantiles import grouped_quantiles

    rng = np.random.default_rng(5)
    n = 500
    src = rng.choice(["a", "b", "c"], n)
    lang = rng.choice(["en", "de"], n)
    vals = rng.integers(0, 40, n).astype(np.int64)  # heavy duplicates
    ds = rd.from_arrow(pa.table({
        "source": pa.array(src), "lang": pa.array(lang),
        "v": pa.array(vals)})).repartition(6)
    out = grouped_quantiles(ds, ["source", "lang"], "v").to_pandas()

    import math
    from fractions import Fraction

    df = pd.DataFrame({"source": src, "lang": lang, "v": vals})
    for (s, lg), g in df.groupby(["source", "lang"]):
        sv = np.sort(g["v"].to_numpy())
        for q, e2 in ((Fraction(1, 4), 25), (Fraction(1, 2), 50),
                      (Fraction(3, 4), 75)):
            k = max(0, math.ceil(q * len(sv)) - 1)
            row = out[(out.source == s) & (out.lang == lg)
                      & (out.qe2 == e2)]
            assert len(row) == 1
            assert int(row["value"].iloc[0]) == int(sv[k]), (s, lg, e2)
            assert int(row["n_vals"].iloc[0]) == len(sv)


def test_grouped_quantiles_block_cap_is_hard_error():
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.quantiles import grouped_quantiles

    ds = rd.from_arrow(pa.table({
        "source": pa.array(["a"] * 50),
        "v": pa.array(np.arange(50, dtype=np.int64))}))
    with pytest.raises(Exception, match="block_card_cap"):
        grouped_quantiles(ds, ["source"], "v", block_card_cap=10).to_pandas()
