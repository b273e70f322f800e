"""Multi-source timestamp merge (SimpleMultisourceAtomSync recast):
merged order, position prefix scan, watermark, per-source unsorted
flags — verified against a single-process pandas replay and across
partitionings."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.stages.multisource import multisource_merge


def _src(rows, nparts):
    seq = pa.array([r[0] for r in rows], pa.int64())
    ts = pa.array([r[1] for r in rows], pa.int64())
    return rd.from_arrow(pa.table({"seq": seq, "ts": ts})).repartition(nparts)


def _replay(rows_by_src):
    recs = []
    for src, rows in rows_by_src.items():
        run = None
        for seq, ts in sorted(rows):  # seq order
            uns = ts is not None and run is not None and ts < run
            if ts is not None:
                run = ts if run is None else max(run, ts)
            recs.append({"src": src, "seq": seq, "ts_us": ts,
                         "src_unsorted": bool(uns)})
    df = pd.DataFrame(recs)
    key = df["ts_us"].fillna(-(2**62))
    df = df.assign(_k=key).sort_values(["_k", "src", "seq"]).reset_index(drop=True)
    df["merge_pos"] = np.arange(len(df), dtype=np.int64)
    df["watermark_us"] = np.where(df["ts_us"].isna(), 0, df["ts_us"]).astype(np.int64)
    return df.drop(columns=["_k"])


ROWS = {
    "a": [(0, 100), (1, 250), (2, 240), (3, 400), (4, None)],   # 240 unsorted
    "b": [(0, 50), (1, 300), (2, 300), (3, 299)],               # 299 unsorted
    "c": [(0, None), (1, 10_000)],
}


def test_merge_matches_replay():
    out = multisource_merge(
        {k: _src(v, 2) for k, v in ROWS.items()}, ts_col="ts", seq_col="seq"
    ).to_pandas().sort_values("merge_pos").reset_index(drop=True)
    exp = _replay(ROWS)
    assert list(out["src"]) == list(exp["src"])
    assert list(out["seq"]) == list(exp["seq"])
    assert list(out["merge_pos"]) == list(exp["merge_pos"])
    assert list(out["watermark_us"]) == list(exp["watermark_us"])
    assert list(out["src_unsorted"]) == list(exp["src_unsorted"])
    # null-ts rows sort first with watermark 0 (forwarded immediately)
    assert out.loc[0, "watermark_us"] == 0


def test_merge_partition_invariant():
    a = multisource_merge(
        {k: _src(v, 1) for k, v in ROWS.items()}, ts_col="ts", seq_col="seq"
    ).to_pandas().sort_values("merge_pos").reset_index(drop=True)
    b = multisource_merge(
        {k: _src(v, 4) for k, v in ROWS.items()}, ts_col="ts", seq_col="seq"
    ).to_pandas().sort_values("merge_pos").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_merge_timestamp_column_accepted():
    rows = {"x": [(0, 5_000_000), (1, 1_000_000)]}
    t = pa.table({
        "seq": pa.array([0, 1], pa.int64()),
        "ts": pa.array([5_000_000, 1_000_000], pa.int64()).cast(
            pa.timestamp("us")),
    })
    out = multisource_merge({"x": rd.from_arrow(t)}, "ts", "seq").to_pandas()
    out = out.sort_values("merge_pos").reset_index(drop=True)
    assert list(out["seq"]) == [1, 0]
    assert bool(out.loc[0, "src_unsorted"]) is True  # seq-order regression
