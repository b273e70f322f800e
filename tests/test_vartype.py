"""Variable-type inference (VariableTypeDetector recast)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from logdata_anomaly_miner_ray.stages.vartype import infer_types_by_group, infer_var_type


def test_stat():
    assert infer_var_type(["x"] * 50).kind == "stat"


def test_asc_desc():
    t = infer_var_type(np.arange(100))
    assert t.kind == "asc" and t.detail["int"]
    t = infer_var_type(np.arange(100, 0, -1) + 0.5)
    assert t.kind == "desc" and not t.detail["int"]


def test_continuous_uniform_and_normal():
    rng = np.random.default_rng(0)
    u = infer_var_type(rng.uniform(0, 10, 800))
    assert u.kind == "continuous" and u.detail["dist"] == "uniform"
    n = infer_var_type(rng.normal(5, 2, 800))
    assert n.kind == "continuous" and n.detail["dist"] == "normal"


def test_range_for_unshaped_numerics():
    rng = np.random.default_rng(1)
    # bimodal far-apart clusters: fits neither uniform nor normal
    v = np.concatenate([rng.normal(0, 0.1, 400), rng.normal(100, 0.1, 400)])
    rng.shuffle(v)
    t = infer_var_type(v)
    assert t.kind == "range"
    assert t.detail["min"] < 1 and t.detail["max"] > 99


def test_discrete_and_unique_and_others():
    d = infer_var_type(["a", "b", "a", "a", "c"] * 40)
    assert d.kind == "d"
    assert sorted(d.detail["values"]) == ["a", "b", "c"]
    assert sum(d.detail["probs"]) == pytest.approx(1.0)
    assert infer_var_type([f"id{i}" for i in range(100)]).kind == "unq"
    vals = [f"v{i}" for i in range(95)] + ["v0"] * 5  # 95% distinct
    assert infer_var_type(vals).kind == "others"


def test_infer_by_group_dataset():
    rng = np.random.default_rng(2)
    rows_g = ["norm"] * 600 + ["disc"] * 600 + ["mono"] * 600
    rows_v = (
        list(rng.normal(0, 1, 600))
        + list(rng.choice([1.0, 2.0, 3.0], 600))
        + list(np.arange(600, dtype=np.float64))
    )
    ds = rd.from_arrow(pa.table({"g": rows_g, "v": rows_v})).repartition(4)
    out = infer_types_by_group(ds, "g", "v")
    assert out["mono"].kind in ("asc", "continuous")  # blockwise samples stay sorted
    assert out["disc"].kind == "d"
    assert out["norm"].kind == "continuous" and out["norm"].detail["dist"] == "normal"
