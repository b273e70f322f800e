"""Hot-key skew behavior and the learn->detect phase split."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def test_hot_key_skew_grouped_counts():
    """One key holding 50% of rows must not break or mis-count: the
    per-block combiner bounds each key's shuffle fan-in to #blocks
    (the skew-handling argument of stages/_agg.py)."""
    from logdata_anomaly_miner_ray.stages._agg import grouped_counts

    n = 200_000
    rng = np.random.default_rng(0)
    hot = rng.random(n) < 0.5
    keys = np.where(hot, "hot.example.org", np.char.add("d", (rng.integers(0, 5000, n)).astype(str)))
    ds = rd.from_arrow(pa.table({"k": keys.tolist()})).repartition(16)
    out = grouped_counts(ds, ["k"]).to_pandas().set_index("k")["n"]
    assert out["hot.example.org"] == int(hot.sum())
    assert out.sum() == n


def test_hot_key_skew_duplicate_detection():
    from logdata_anomaly_miner_ray.stages.uniqueness import duplicate_keys_hashed

    n = 100_000
    keys = ["dup.example.org/x"] * (n // 2) + [f"u{i}" for i in range(n - n // 2)]
    ds = rd.from_arrow(pa.table({"url": keys})).repartition(16)
    out = duplicate_keys_hashed(ds, "url").to_pandas()
    assert len(out) == 1
    assert out["n"].iloc[0] == n // 2


def test_duplicate_heavy_input_stays_exact():
    """Every key duplicated: the dup-group result is as large as half
    the input — interior groups must stay in the Dataset (only block
    EDGES cross the driver), and counts must still be exact."""
    from logdata_anomaly_miner_ray.stages.uniqueness import duplicate_keys_hashed

    n = 60_000
    keys = [f"k{i % (n // 2)}" for i in range(n)]  # each key exactly twice
    ds = rd.from_arrow(pa.table({"url": keys})).repartition(16)
    out = duplicate_keys_hashed(ds, "url").to_pandas()
    assert len(out) == n // 2
    assert (out["n"] == 2).all()
    assert set(out["url"]) == {f"k{i}" for i in range(n // 2)}


def test_fit_on_day1_validate_on_day2():
    """AMiner learn_mode -> detect split across DIFFERENT datasets:
    constraints fitted on clean data flag drifted new data."""
    from logdata_anomaly_miner_ray.pipelines.validate import fit_and_narrow, validate
    from logdata_anomaly_miner_ray.sources.pages import make_pages_block

    day1 = rd.from_arrow(make_pages_block(0, 4000)).repartition(2)
    state, _ = fit_and_narrow(day1)

    # day2: copy of later rows with injected junk — new charset chars
    # and random gibberish (entropy), oversized docs (range)
    t = make_pages_block(4000, 2000)
    texts = t["text"].to_pylist()
    texts[0] = texts[0] + " ☃☄★"          # chars never seen
    texts[1] = "XQZWVJ KPFQXZ VJQWXZ KQPFXZ"  # uppercase pairs unseen in corpus
    texts[2] = " ".join(["word"] * 500)                    # above learned n_tokens max
    t = t.set_column(t.schema.get_field_index("text"), "text", pa.array(texts, pa.string()))
    day2 = rd.from_arrow(t).repartition(2)
    out = validate(day2, state)
    vd = out["verdicts"].to_pandas().set_index("check")
    assert vd.loc["charset"]["n_violations"] >= 1
    assert vd.loc["entropy"]["n_violations"] >= 1
    assert vd.loc["token_range"]["n_violations"] >= 1
    # byte identity intentionally fails: day2 text != day1 text
    assert not vd.loc["text_byte_identity"]["pass"]


def test_salted_grouped_counts_equal_plain():
    from logdata_anomaly_miner_ray.stages._agg import (
        grouped_counts,
        salted_grouped_counts,
    )

    n = 50_000
    rng = np.random.default_rng(3)
    keys = np.where(rng.random(n) < 0.6, "hot", np.char.add("k", rng.integers(0, 200, n).astype(str)))
    ds = rd.from_arrow(pa.table({"k": keys.tolist()})).repartition(8)
    a = grouped_counts(ds, ["k"]).to_pandas().sort_values("k").reset_index(drop=True)
    b = salted_grouped_counts(ds, ["k"], salt_buckets=8).to_pandas().sort_values("k").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert a.set_index("k")["n"]["hot"] > 0.5 * n
