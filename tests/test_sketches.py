import numpy as np
import pytest

from logdata_anomaly_miner_ray.state.sketches import (
    HyperLogLog,
    Moments,
    TDigest,
    hash_int64,
    hash_strings,
)


def test_hll_estimate_and_merge():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**62, size=50_000, dtype=np.int64)
    h = hash_int64(vals)
    full = HyperLogLog().add_hashes(h)
    true = len(np.unique(vals))
    assert abs(full.estimate() - true) / true < 0.05
    a, b = HyperLogLog(), HyperLogLog()
    a.add_hashes(h[:20_000])
    b.add_hashes(h[20_000:])
    a.merge(b)
    assert a.estimate() == pytest.approx(full.estimate())


def test_hll_small_range_linear_counting():
    h = HyperLogLog().add_hashes(hash_int64(np.arange(200)))
    assert abs(h.estimate() - 200) / 200 < 0.1


def test_hll_serialization_roundtrip():
    h = HyperLogLog().add_hashes(hash_int64(np.arange(1000)))
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert h2.estimate() == pytest.approx(h.estimate())


def test_hash_strings_deterministic():
    a = hash_strings(["x", "y", "x", None])
    assert a[0] == a[2] and a[0] != a[1]
    assert a[3] == hash_strings([None])[0]  # nulls hash consistently


def test_moments_merge_exact():
    rng = np.random.default_rng(1)
    a = rng.normal(3, 5, 10_000)
    m = Moments.from_array(a[:1234])
    m.merge(Moments.from_array(a[1234:]))
    assert m.n == len(a)
    assert m.mean == pytest.approx(a.mean(), rel=1e-12)
    assert m.std == pytest.approx(a.std(), rel=1e-9)
    assert m.min == a.min() and m.max == a.max()


def test_tdigest_quantiles():
    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, 20_000)
    d = TDigest.from_array(a[:7000])
    d.merge(TDigest.from_array(a[7000:]))
    for q in (0.05, 0.5, 0.95):
        assert d.quantile(q)[0] == pytest.approx(np.quantile(a, q), abs=0.05)
    assert len(d.means) < 500  # bounded state
