"""asof_join: backward as-of semantics vs a pandas reference."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.stages.join import asof_join


def _mk(df):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)


def test_asof_backward_matches_pandas(ray_session):
    rng = np.random.default_rng(2)
    left = pd.DataFrame(
        {
            "lid": np.arange(500, dtype=np.int64),
            "k": rng.integers(0, 20, 500).astype(np.int64),
            "t": rng.integers(0, 10_000, 500).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.arange(300, dtype=np.int64) + 1000,
            "k": rng.integers(0, 25, 300).astype(np.int64),  # some keys absent left/right
            "t": rng.integers(0, 10_000, 300).astype(np.int64),
            "payload": rng.normal(size=300),
        }
    )
    got = (
        asof_join(_mk(left), _mk(right), on="t", by="k", right_cols=["rid", "payload"])
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort"),
        on="t", by="k", direction="backward", suffixes=("", "_r"),
    ).sort_values("lid").reset_index(drop=True)
    assert len(got) == len(want) == 500
    assert (got["lid"].values == want["lid"].values).all()
    gm, wm = got["rid_r"], want["rid"]
    assert ((gm.isna() & wm.isna()) | (gm == wm)).all()
    gp, wp = got["payload_r"], want["payload"]
    assert ((gp.isna() & wp.isna()) | (gp == wp)).all()


def test_asof_null_keys_dropped_and_empty_right(ray_session):
    left = pd.DataFrame(
        {"lid": [1, 2, 3], "k": pd.array([1, None, 2], dtype="Int64"),
         "t": pd.array([10, 20, 30], dtype="Int64")}
    )
    right = pd.DataFrame(
        {"rid": pd.array([], dtype="Int64"), "k": pd.array([], dtype="Int64"),
         "t": pd.array([], dtype="Int64")}
    )
    got = asof_join(_mk(left), _mk(right), on="t", by="k", right_cols=["rid"]).to_pandas()
    assert sorted(got["lid"]) == [1, 3]  # null-key row dropped (documented)
    assert got["rid_r"].isna().all()


def test_asof_string_keys(ray_session):
    left = pd.DataFrame(
        {"lid": [1, 2, 3, 4], "k": ["a", "b", "a", "zz"],
         "t": np.array([10, 10, 30, 5], dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"rid": [7, 8, 9], "k": ["a", "a", "b"],
         "t": np.array([5, 20, 10], dtype=np.int64)}
    )
    got = (
        asof_join(_mk(left), _mk(right), on="t", by="k", right_cols=["rid"])
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    assert list(got["rid_r"].fillna(-1).astype(int)) == [7, 9, 8, -1]


def test_asof_int64_payload_beyond_float53(ray_session):
    big = 2**53
    left = pd.DataFrame(
        {"lid": np.array([big + 1, big + 3], dtype=np.int64),
         "k": np.array([1, 1], dtype=np.int64),
         "t": np.array([10, 20], dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"rid": np.array([big + 5, big + 7], dtype=np.int64),
         "k": np.array([1, 1], dtype=np.int64),
         "t": np.array([5, 15], dtype=np.int64)}
    )
    got = (
        asof_join(_mk(left), _mk(right), on="t", by="k", right_cols=["rid"])
        .to_pandas().sort_values("t").reset_index(drop=True)
    )
    # bit-exact: +1/+3/+5/+7 offsets are distinguishable only in int64
    assert list(got["lid"]) == [big + 1, big + 3]
    assert list(got["rid_r"]) == [big + 5, big + 7]


def test_asof_float_on_column(ray_session):
    left = pd.DataFrame(
        {"lid": [1, 2], "k": np.array([1, 1], dtype=np.int64),
         "t": np.array([1.5, 3.25], dtype=np.float64)}
    )
    right = pd.DataFrame(
        {"rid": [7, 8], "k": np.array([1, 1], dtype=np.int64),
         "t": np.array([1.0, 3.25], dtype=np.float64)}
    )
    got = (
        asof_join(_mk(left), _mk(right), on="t", by="k", right_cols=["rid"])
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    assert list(got["rid_r"]) == [7, 8]  # exact-match allowed at 3.25
    assert list(got["t"]) == [1.5, 3.25]


def test_asof_fuzz_vs_duckdb(ray_session):
    """Randomized cross-engine check: asof_join == DuckDB ASOF LEFT
    JOIN on data with absent keys, duplicate left timestamps and
    exact-match boundaries (right side deduped per (k,t) so the tie
    rule cannot differ)."""
    import duckdb

    rng = np.random.default_rng(23)
    for trial in range(3):
        nl, nr = rng.integers(50, 400), rng.integers(50, 400)
        left = pd.DataFrame(
            {
                "lid": np.arange(nl, dtype=np.int64),
                "k": rng.integers(0, 15, nl).astype(np.int64),
                "t": rng.integers(0, 500, nl).astype(np.int64),
            }
        )
        right = (
            pd.DataFrame(
                {
                    "rid": np.arange(nr, dtype=np.int64) + 10_000,
                    "k": rng.integers(0, 18, nr).astype(np.int64),
                    "t": rng.integers(0, 500, nr).astype(np.int64),
                }
            )
            .sort_values("rid")
            .drop_duplicates(["k", "t"], keep="last")
        )
        got = (
            asof_join(_mk(left), _mk(right), on="t", by="k", right_cols=["rid"])
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        want = con.execute(
            "SELECT l.lid, r.rid AS rid_r FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t ORDER BY l.lid"
        ).df()
        assert len(got) == len(want) == nl, trial
        gm, wm = got["rid_r"], want["rid_r"]
        assert ((gm.isna() & wm.isna()) | (gm == wm)).all(), trial
