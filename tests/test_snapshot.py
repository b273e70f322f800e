"""Crawl-snapshot delta (stages/snapshot.snapshot_diff): both merge
tiers agree, all four statuses classify correctly, duplicate captures
are a hard error."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from logdata_anomaly_miner_ray.stages.snapshot import snapshot_diff


def _narrow(rows, nblocks=3):
    df = pd.DataFrame(rows, columns=["key", "snap", "h", "lang"])
    df["key"] = df["key"].astype(np.int64)
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(nblocks)


ROWS = [
    # unchanged
    (1, "a", "h1", "en"), (1, "b", "h1", "en"),
    # changed (carry = B side's lang)
    (2, "a", "h2", "en"), (2, "b", "h2x", "de"),
    # removed (A only)
    (3, "a", "h3", "fr"),
    # added (B only)
    (4, "b", "h4", "en"),
    # second unchanged, different lang
    (5, "a", "h5", "de"), (5, "b", "h5", "de"),
]

EXPECT = pd.DataFrame(
    {"status": ["added", "changed", "removed", "unchanged", "unchanged"],
     "lang": ["en", "de", "fr", "de", "en"],
     "n": np.array([1, 1, 1, 1, 1], dtype=np.int64)})


def test_driver_tier_classification():
    out = snapshot_diff(_narrow(ROWS), carry_col="lang")
    pd.testing.assert_frame_equal(out, EXPECT)


def test_scale_tier_matches_driver_tier():
    out = snapshot_diff(_narrow(ROWS), carry_col="lang",
                        driver_fold_limit=0, n_buckets=5)
    pd.testing.assert_frame_equal(out, EXPECT)


def test_no_carry_counts():
    out = snapshot_diff(_narrow(ROWS))
    assert list(out["status"]) == ["added", "changed", "removed", "unchanged"]
    assert list(out["n"]) == [1, 1, 1, 2]


def test_duplicate_capture_is_hard_error():
    rows = ROWS + [(1, "a", "h1dup", "en")]
    with pytest.raises(Exception, match="duplicate"):
        snapshot_diff(_narrow(rows), carry_col="lang")


def test_single_snapshot_all_removed():
    rows = [(i, "a", f"h{i}", "en") for i in range(4)]
    out = snapshot_diff(_narrow(rows), carry_col="lang")
    assert list(out["status"]) == ["removed"]
    assert int(out["n"].iloc[0]) == 4


def test_null_digest_presence_and_change():
    # a captured page with a NULL digest is still captured; two null
    # digests are 'changed' (SQL: NULL = NULL is NULL), not unchanged
    rows = [
        (1, "a", None, "en"), (1, "b", None, "en"),   # changed
        (2, "a", None, "en"), (2, "b", "h2", "en"),   # changed
        (3, "a", None, "en"),                         # removed (present!)
    ]
    out = snapshot_diff(_narrow(rows), carry_col="lang")
    assert dict(zip(out["status"], out["n"])) == {"changed": 2, "removed": 1}


def test_null_carry_coalesces_to_a_side():
    # carry is coalesce(b, a) ELEMENT-WISE: a b-capture with a null
    # carry value falls back to a's non-null value (SQL mirror:
    # coalesce(b.lang, a.lang)), never a blanket prefer-b
    rows = [
        (1, "a", "h1", "en"), (1, "b", "h1x", None),   # changed, lang=en
        (2, "a", "h2", "de"), (2, "b", "h2", "de"),    # unchanged, de
    ]
    out = snapshot_diff(_narrow(rows), carry_col="lang")
    got = {(s, l): n for s, l, n in zip(out["status"], out["lang"], out["n"])}
    assert got == {("changed", "en"): 1, ("unchanged", "de"): 1}


def test_scale_tier_string_keys():
    rows = [(k, s, h, lg) for (k, s, h, lg) in [
        ("http://a.com/x", "a", "h1", "en"),
        ("http://a.com/x", "b", "h1", "en"),
        ("http://b.org/y", "b", "h2", "de"),
    ]]
    df = pd.DataFrame(rows, columns=["key", "snap", "h", "lang"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(2)
    out = snapshot_diff(ds, carry_col="lang", driver_fold_limit=0,
                        n_buckets=3)
    assert dict(zip(out["status"], out["n"])) == {"added": 1, "unchanged": 1}
