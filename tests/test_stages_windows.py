"""Windowed / ordered stages vs pandas+DuckDB oracles, including
the FIXTURES.md F3 scenarios."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _events_from(ts_keys):
    keys, tss = zip(*ts_keys)
    return rd.from_arrow(
        pa.table(
            {
                "key": pa.array(list(keys), pa.string()),
                "ts": pa.array(list(tss), pa.int64()).cast(pa.timestamp("us")),
            }
        )
    )


def test_window_counts_match_sql(sf_dir):
    from logdata_anomaly_miner_ray.stages.frequency import window_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    got = (
        window_counts(ds, ["event_type"], "ts", 3600)
        .to_pandas()
        .sort_values(["event_type", "window"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')")
    want = con.sql(
        "SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) AS window, "
        "count(*)::BIGINT AS n FROM events GROUP BY 1,2 ORDER BY 1,2"
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_frequency_anomaly_burst():
    # FIXTURES.md freq_windows: steady rate then a 10x burst window
    from logdata_anomaly_miner_ray.stages.frequency import (
        frequency_anomalies,
        window_counts,
    )

    rows = []
    W = 600 * 1_000_000
    for w in range(20):
        n = 100 if w != 15 else 1000
        for i in range(n):
            rows.append(("k", w * W + i * 1000))
    ds = _events_from(rows)
    wc = window_counts(ds, ["key"], "ts", 600)
    fa = frequency_anomalies(wc, ["key"], confidence_factor=0.33).to_pandas()
    assert fa["window"].tolist() == [15]
    assert fa["n"].tolist() == [1000]


def test_empty_windows_gap():
    from logdata_anomaly_miner_ray.stages.frequency import empty_windows, window_counts

    W = 600 * 1_000_000
    rows = [("k", w * W) for w in [0, 1, 2, 5, 6]]  # 3,4 missing
    wc = window_counts(_events_from(rows), ["key"], "ts", 600)
    ew = empty_windows(wc, ["key"]).to_pandas()
    assert sorted(ew["window"]) == [3, 4]


def test_sliding_count_exceed():
    from logdata_anomaly_miner_ray.stages.frequency import sliding_count_exceed

    # 6 events within 10s, limit 4 → exceeded at the 5th event, once
    rows = [("k", i * 1_000_000) for i in range(6)] + [("q", 0)]
    out = sliding_count_exceed(_events_from(rows), ["key"], "ts", 10.0, 4).to_pandas()
    assert out["key"].tolist() == ["k"]
    assert out["n_in_window"].tolist() == [5]


def test_sliding_count_ties_and_boundary():
    """Equal timestamps count ALL peers; the window is closed at
    t - w (SQL RANGE frame semantics, ADVICE r1)."""
    from logdata_anomaly_miner_ray.stages.frequency import sliding_count_exceed

    # 3 events at t=0, 2 at exactly t=10s (window edge) → each of the
    # t=10s events sees all 5 in [0s, 10s]
    rows = [("k", 0)] * 3 + [("k", 10_000_000)] * 2
    out = sliding_count_exceed(_events_from(rows), ["key"], "ts", 10.0, 4).to_pandas()
    assert out["n_in_window"].tolist() == [5]
    # shrink the window below the boundary → only the 2 peers remain
    out2 = sliding_count_exceed(_events_from(rows), ["key"], "ts", 9.0, 4).to_pandas()
    assert len(out2) == 0


def test_missing_gap_violations():
    # FIXTURES.md missing: heartbeat every 60s then silence
    from logdata_anomaly_miner_ray.stages.missing import gap_violations

    rows = [("hb", i * 60_000_000) for i in range(10)]  # 0..540s
    ds = _events_from(rows)
    out = gap_violations(
        ds, ["key"], "ts", 90.0, end_ts=pd.Timestamp(900 * 1_000_000_000)
    ).to_pandas()
    # no gap between beats; tail gap 900-540=360s > 90s → 1 violation
    assert len(out) == 1
    assert out["gap_seconds"].iloc[0] == pytest.approx(360.0)


def test_inversions_and_monotonic():
    from logdata_anomaly_miner_ray.stages.ordering import (
        inversion_counts,
        monotonic_adjust,
    )

    t = pa.table(
        {
            "k": ["a"] * 5 + ["b"] * 3,
            "seq": list(range(5)) + list(range(3)),
            "ts": pa.array([10, 20, 15, 30, 25, 1, 2, 3], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    ds = rd.from_arrow(t)
    inv = inversion_counts(ds, ["k"], "seq", "ts").to_pandas()
    assert inv["k"].tolist() == ["a"] and inv["n_inversions"].tolist() == [2]
    adj = monotonic_adjust(ds, ["k"], "seq", "ts").to_pandas()
    a = adj[adj["k"] == "a"].sort_values("seq")["ts_adjusted"]
    assert a.is_monotonic_increasing


def test_ngram_counts_match_pandas(sf_dir):
    from logdata_anomaly_miner_ray.stages.sequence import ngram_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    got = (
        ngram_counts(ds, ["user_id"], "event_type", ["ts", "event_id"], n=2)
        .to_pandas()
        .sort_values(["g0", "g1"])
        .reset_index(drop=True)
    )
    df = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    pairs = []
    for _, g in df.groupby("user_id"):
        ev = g["event_type"].to_numpy()
        pairs += list(zip(ev[:-1], ev[1:]))
    want = (
        pd.DataFrame(pairs, columns=["g0", "g1"])
        .value_counts()
        .rename("n")
        .reset_index()
        .sort_values(["g0", "g1"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype({"n": "int64"}))


def test_new_ngrams_flags_novel():
    from logdata_anomaly_miner_ray.stages.sequence import new_ngrams, ngram_counts

    # FIXTURES.md sequences: one novel gram vs a learned set
    t = pa.table(
        {
            "id": ["u"] * 6,
            "ev": ["a", "b", "a", "b", "c", "d"],
            "ts": pa.array(range(6), pa.int64()).cast(pa.timestamp("us")),
        }
    )
    ng = ngram_counts(rd.from_arrow(t), ["id"], "ev", ["ts"], n=2)
    known = {("a", "b"), ("b", "a"), ("b", "c")}
    novel = new_ngrams(ng, known, n=2).to_pandas()
    assert set(zip(novel["g0"], novel["g1"])) == {("c", "d")}


def test_min_transition_times():
    from logdata_anomaly_miner_ray.stages.sequence import min_transition_times

    t = pa.table(
        {
            "id": ["u", "u", "u", "v", "v"],
            "ev": ["a", "b", "a", "a", "b"],
            "ts": pa.array(
                [0, 5_000_000, 7_000_000, 0, 2_000_000], pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )
    got = (
        min_transition_times(rd.from_arrow(t), ["id"], "ev", "ts")
        .to_pandas()
        .set_index(["from_event", "to_event"])["min_seconds"]
    )
    assert got[("a", "b")] == pytest.approx(2.0)  # v faster than u
    assert got[("b", "a")] == pytest.approx(2.0)


def test_histogram_bin_anomalies():
    """Binomial per-bin significance over a skewed histogram: the
    loaded bin is significant, uniform bins are not; outlier bins
    carry no p-value."""
    import pandas as pd

    from logdata_anomaly_miner_ray.stages.drift import histogram_bin_anomalies

    hist = pd.DataFrame(
        {"g": ["a"] * 5, "bin": [1, 2, 3, 4, 5], "n": [20, 20, 20, 20, 45]}
    )
    out = histogram_bin_anomalies(hist, "g", bin_count=5, significance=0.01)
    sig = out.set_index("bin")["significant"]
    assert bool(sig[5]) is True
    assert bool(sig[2]) is False
    # outlier bins (0 and bin_count+1) are skipped when flagged
    hist2 = pd.DataFrame({"g": ["a"] * 3, "bin": [0, 3, 6], "n": [50, 100, 7]})
    out2 = histogram_bin_anomalies(hist2, "g", bin_count=5, outlier_bins=True)
    assert out2["bin"].tolist() == [3]
