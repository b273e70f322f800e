"""Keyed stages vs DuckDB oracles on the driver-provided testdata."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ["events", "documents", "orders", "customer", "lineitem"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return c


def test_grouped_counts_matches_sql(sf_dir, con):
    from logdata_anomaly_miner_ray.stages._agg import grouped_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    got = grouped_counts(ds, ["event_type"]).to_pandas().sort_values("event_type").reset_index(drop=True)
    want = con.sql(
        "SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_duplicate_keys_none_on_pk(sf_dir):
    from logdata_anomaly_miner_ray.stages.uniqueness import duplicate_keys

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet")
    assert duplicate_keys(ds, ["o_orderkey"]).count() == 0


def test_duplicate_keys_finds_planted():
    from logdata_anomaly_miner_ray.stages.uniqueness import duplicate_keys

    t = pa.table({"k": ["a", "b", "a", "c", "b", "a"]})
    ds = rd.from_arrow(t).repartition(3)
    got = duplicate_keys(ds, ["k"]).to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == ["a", "b"]
    assert got["n"].tolist() == [3, 2]


def test_anti_join_matches_sql(sf_dir, con):
    from logdata_anomaly_miner_ray.stages.referential import anti_join_keys

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet")
    got = sorted(
        r["c_custkey"]
        for r in anti_join_keys(cust, "c_custkey", orders, "o_custkey").take_all()
    )
    want = [
        r[0]
        for r in con.sql(
            "SELECT DISTINCT c_custkey FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders) ORDER BY 1"
        ).fetchall()
    ]
    assert got == want


def test_anti_join_planted():
    from logdata_anomaly_miner_ray.stages.referential import anti_join_keys

    left = rd.from_arrow(pa.table({"k": ["a", "b", "c", "c", "d"]}))
    right = rd.from_arrow(pa.table({"j": ["b", "d", "e"]}))
    got = sorted(r["k"] for r in anti_join_keys(left, "k", right, "j").take_all())
    assert got == ["a", "c"]


def test_grouped_min_max_matches_sql(sf_dir, con):
    from logdata_anomaly_miner_ray.stages._agg import grouped_min_max

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    got = (
        grouped_min_max(ds, ["event_type"], "value")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = con.sql(
        "SELECT event_type, min(value) AS min_value, max(value) AS max_value "
        "FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_combo_spans_match_sql(sf_dir, con):
    from logdata_anomaly_miner_ray.stages.domain import combo_span_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    got = (
        combo_span_counts(ds, ["event_type"], "ts")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = con.sql(
        "SELECT event_type, min(ts) AS first_ts, max(ts) AS last_ts, "
        "count(*)::BIGINT AS n FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_range_violations_planted(ray_session):
    import ray

    from logdata_anomaly_miner_ray.stages.value_range import (
        fit_ranges,
        range_violations,
        ranges_to_dict,
    )

    # FIXTURES.md vr_ranges scenario: learn on the 6-atom sequence,
    # then probe values outside the learned per-id ranges
    fit_tbl = pa.table(
        {
            "id": ["a", "b", "a", "b", "a", "b"],
            "value": [2.5, 5.0, 4.75, 6.3, 4.25, 3.1],
        }
    )
    fit_ds = rd.from_arrow(fit_tbl)
    rt = pa.Table.from_pandas(fit_ranges(fit_ds, ["id"], "value").to_pandas())
    rdict = ranges_to_dict(rt, ["id"])
    assert rdict[("a",)] == (2.5, 4.75) and rdict[("b",)] == (3.1, 6.3)
    probe = pa.table({"id": ["a", "a", "b", "b"], "value": [2.5, 5.0, 3.0, 6.3]})
    viol = range_violations(
        rd.from_arrow(probe), ["id"], "value", ray.put(rdict)
    ).to_pandas()
    assert len(viol) == 2  # a:5.0 above, b:3.0 below
    assert sorted(v[0] for v in viol["affected_values"]) == ["3.0", "5.0"]


def test_column_stats_matches_sql(sf_dir, con):
    from logdata_anomaly_miner_ray.stages.column_stats import column_stats

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet")
    got = column_stats(ds, ["l_quantity", "l_extendedprice"]).to_pandas()
    want = con.sql(
        "SELECT count(l_quantity) n, min(l_quantity) mn, max(l_quantity) mx, "
        "avg(l_quantity) mean FROM lineitem"
    ).df().iloc[0]
    row = got[got["column"] == "l_quantity"].iloc[0]
    assert row["n"] == want["n"]
    assert row["min"] == want["mn"] and row["max"] == want["mx"]
    assert row["mean"] == pytest.approx(want["mean"], rel=1e-9)
    # distinct estimate within HLL error of the truth
    true_distinct = con.sql("SELECT count(DISTINCT l_quantity) FROM lineitem").fetchone()[0]
    assert abs(row["approx_distinct"] - true_distinct) / true_distinct < 0.1
