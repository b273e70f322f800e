"""Sinks, scoring, implication rules."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_write_csv_projection(tmp_path):
    from logdata_anomaly_miner_ray.stages.sinks import write_csv_projection

    ds = rd.from_arrow(pa.table({"a": [1, 2], "b": ["x", "y"], "c": [0.1, 0.2]}))
    out = write_csv_projection(ds, ["a", "b"], str(tmp_path / "csv"))
    import glob

    files = glob.glob(out + "/*")
    assert files
    df = pd.concat([pd.read_csv(f) for f in files])
    assert sorted(df.columns) == ["a", "b"] and len(df) == 2


def test_score_violations():
    from logdata_anomaly_miner_ray.schema import violations_table
    from logdata_anomaly_miner_ray.stages.sinks import score_violations

    common = violations_table("Common", "m", [str(i) for i in range(99)], [], [[] for _ in range(99)], "")
    rare = violations_table("Rare", "m", ["r"], [], [[]], "")
    ds = rd.from_arrow(pa.concat_tables([common, rare]))
    scored = score_violations(ds).to_pandas()
    s_rare = scored[scored["event_type"] == "Analysis.Rare"]["confidence"].iloc[0]
    s_common = scored[scored["event_type"] == "Analysis.Common"]["confidence"].iloc[0]
    assert s_rare > s_common
    assert s_rare == pytest.approx(1.0)


def test_score_violations_weighted_fixed_and_auto():
    """ScoringEventHandler parity shapes: fixed weights (0.5 default)
    and auto-weights 10/(10+appearances), absolut + mean fields."""
    from logdata_anomaly_miner_ray.schema import violations_table
    from logdata_anomaly_miner_ray.stages.sinks import score_violations_weighted

    t = violations_table(
        "C", "m", ["k1", "k2"], ["p"], [["common", "rare"], ["common"]], ""
    )
    common_rows = violations_table(
        "C", "m", [str(i) for i in range(20)], ["p"], [["common"]] * 20, ""
    )
    ds = rd.from_arrow(pa.concat_tables([t, common_rows]))
    # fixed weights
    fixed = score_violations_weighted(ds, weights={"rare": 0.9}).to_pandas()
    two = fixed[fixed["key"] == "k1"].iloc[0]
    assert two["confidence_absolut"] == pytest.approx(0.5 + 0.9)
    assert two["confidence"] == pytest.approx((0.5 + 0.9) / 2)
    # auto weights: 'common' appears 22x → 10/32; 'rare' once → 10/11
    auto = score_violations_weighted(ds, auto_weights=True).to_pandas()
    two = auto[auto["key"] == "k1"].iloc[0]
    assert two["confidence_absolut"] == pytest.approx(10 / 32 + 10 / 11)
    one = auto[auto["key"] == "k2"].iloc[0]
    assert one["confidence"] == pytest.approx(10 / 32)


def test_render_event_text():
    from logdata_anomaly_miner_ray.stages.sinks import render_event_text

    txt = render_event_text(
        {
            "event_type": "Analysis.ValueRangeDetector",
            "message": "Value range anomaly detected",
            "key": "a",
            "affected_paths": ["id", "value"],
            "affected_values": ["a", "5.0"],
            "expected": '{"min": 2.5, "max": 4.75}',
        }
    )
    assert "Value range anomaly detected" in txt and "id: a" in txt


def test_implication_rules_binomial():
    from logdata_anomaly_miner_ray.stages.correlation import implication_rules

    support = pd.DataFrame(
        {
            "a_event": ["login", "login", "noise"],
            "b_event": ["session", "logout", "other"],
            "n_a": [100, 100, 5],
            "n_hit": [97, 60, 5],
        }
    )
    rules = implication_rules(support, p0=0.9, alpha=0.05)
    got = set(zip(rules["a_event"], rules["b_event"]))
    assert ("login", "session") in got       # 97/100 credibly >= 0.9
    assert ("login", "logout") not in got    # 60/100 fails
    assert ("noise", "other") not in got     # below min_support
