import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from logdata_anomaly_miner_ray.stages.sampling import reservoir_per_group, sample_fraction


def _ds(n=5000, groups=("a", "b", "c")):
    rng = np.random.default_rng(0)
    g = rng.choice(groups, n)
    return rd.from_arrow(
        pa.table(
            {
                "g": g.tolist(),
                "id": pa.array(np.arange(n), pa.int64()),
                "v": rng.random(n),
            }
        )
    ).repartition(8)


def test_sample_fraction():
    out = sample_fraction(_ds(), 0.1, seed=1).count()
    assert 300 < out < 700


def test_reservoir_sizes_and_determinism():
    ds = _ds()
    a = reservoir_per_group(ds, ["g"], "id", k=50).to_pandas()
    assert (a.groupby("g").size() == 50).all()
    # determinism: same input (different partitioning) → same sample
    b = reservoir_per_group(_ds().repartition(3), ["g"], "id", k=50).to_pandas()
    ka = {(r.g, r.id) for r in a.itertuples()}
    kb = {(r.g, r.id) for r in b.itertuples()}
    assert ka == kb


def test_reservoir_small_group_keeps_all():
    t = pa.table({"g": ["x"] * 7 + ["y"] * 3, "id": pa.array(range(10), pa.int64())})
    out = reservoir_per_group(rd.from_arrow(t), ["g"], "id", k=50).to_pandas()
    assert len(out) == 10
