import pandas as pd
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


def test_reservoir_matches_global_uint64_order():
    """Regression: the partial keep uses uint64 priority order and the
    final merge sorts __pr as int64 — the sign-bit flip must make both
    agree, else hashes ≥ 2^63 (half of all ids) sort first in the
    merge but may have been dropped by the partials."""
    from logdata_anomaly_miner_ray.state.sketches import hash_int64

    n, k = 4000, 25
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"g": ["x"] * n, "id": pa.array(ids, pa.int64())})
    ).repartition(16)
    got = set(reservoir_per_group(ds, ["g"], "id", k=k, seed=42).to_pandas()["id"])
    pr = hash_int64(ids, seed=42)  # uint64
    want = set(ids[np.argsort(pr, kind="mergesort")[:k]].tolist())
    assert got == want


def test_reservoir_md5_priority_matches_duckdb():
    """md5 priority mode reproduces DuckDB's
    row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR))) <= k."""
    import duckdb

    n, k = 3000, 40
    tbl = pa.table(
        {"g": (["a", "b"] * (n // 2)), "id": pa.array(range(n), pa.int64())}
    )
    got = (
        reservoir_per_group(rd.from_arrow(tbl).repartition(8), ["g"], "id", k=k, priority="md5")
        .to_pandas()
    )
    want = duckdb.sql(
        """
        SELECT g, id FROM (
          SELECT g, id, row_number() OVER (
            PARTITION BY g ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
          FROM tbl) WHERE rn <= 40
        """
    ).df()
    assert {(r.g, r.id) for r in got.itertuples()} == {
        (r.g, r.id) for r in want.itertuples()
    }


def test_tail_values_matches_reference_reduction():
    """Closed-form tail window equals the append/reduce replay for
    many (n, max, min) combinations."""
    from logdata_anomaly_miner_ray.stages.sampling import tail_values_per_group

    for n, mx, mn in [(12, 8, 5), (8, 8, 5), (9, 8, 5), (100, 20, 7), (21, 20, 7), (47, 20, 7)]:
        vals = [f"v{i}" for i in range(n)]
        tail = []
        for v in vals:
            tail.append(v)
            if len(tail) > mx:
                tail = tail[-mn:]
        t = pa.table(
            {"g": ["k"] * n, "v": vals, "i": pa.array(range(n), pa.int64())}
        )
        out = (
            tail_values_per_group(
                rd.from_arrow(t).repartition(3), ["g"], "v", "i",
                max_num_vals=mx, min_num_vals=mn,
            )
            .to_pandas()
            .sort_values("i")
        )
        assert out["v"].tolist() == tail, (n, mx, mn)


def test_split_assign_stable_and_exhaustive():
    """The split is keyed on content (md5 of the id), so it is
    invariant to block layout AND to corpus growth: the assignment of
    ids 0..999 inside a 2000-row corpus equals their assignment in a
    1000-row corpus."""
    import hashlib

    from logdata_anomaly_miner_ray.stages.sampling import split_assign

    def run(n, blocks):
        t = pa.table({"doc_id": pa.array(list(range(n)), pa.int64())})
        out = split_assign(
            rd.from_arrow(t).repartition(blocks), "doc_id").to_pandas()
        return dict(zip(out["doc_id"].astype(int), out["split"]))

    a = run(1000, 3)
    b = run(1000, 7)
    assert a == b
    big = run(2000, 5)
    assert all(big[i] == a[i] for i in range(1000))
    # brute-force boundary check
    for i in range(1000):
        h = hashlib.md5(str(i).encode()).hexdigest()
        want = "train" if h < "e666" else ("val" if h < "f333" else "test")
        assert a[i] == want
    # ~90/5/5 at n=1000
    from collections import Counter
    c = Counter(a.values())
    assert 850 < c["train"] < 950 and c["val"] > 20 and c["test"] > 20


def test_mixture_repeat_exact_semantics():
    """Brute-force the rational-epoch rule: n = p//q + (h16*q < (p%q)*65536)."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.sampling import mixture_repeat

    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "source": [f"s{i % 4}" for i in range(200)],
    })
    ep = {"s0": (3, 1), "s1": (5, 2), "s2": (1, 2), "s3": (0, 1)}
    out = mixture_repeat(
        rd.from_pandas(df).repartition(3), "source", ep, "doc_id"
    ).to_pandas()

    exp_rows = []
    for _, r in df.iterrows():
        p, q = ep[r["source"]]
        h16 = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16)
        n = p // q + (1 if h16 * q < (p % q) * 65536 else 0)
        exp_rows += [(r["doc_id"], r["source"], c) for c in range(n)]
    got = sorted(map(tuple, out[["doc_id", "source", "copy"]].itertuples(index=False)))
    assert got == sorted(exp_rows)
    assert not (out["source"] == "s3").any()          # dropped source
    s0 = out[out["source"] == "s0"].groupby("doc_id").size()
    assert (s0 == 3).all()                            # exact 3 epochs


def test_mixture_repeat_stability_and_fast_tier():
    """Re-sharding never changes an existing doc's copies; the
    hash64 tier shares the plumbing (same integer-epoch counts)."""
    import pandas as pd
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.sampling import mixture_repeat

    df = pd.DataFrame({
        "doc_id": np.arange(120, dtype=np.int64),
        "source": [f"s{i % 3}" for i in range(120)],
    })
    ep = {"s0": (5, 2), "s1": (1, 3)}
    a = mixture_repeat(rd.from_pandas(df).repartition(2), "source", ep).to_pandas()
    b = mixture_repeat(rd.from_pandas(df.iloc[::-1]).repartition(5), "source", ep).to_pandas()
    key = lambda d: sorted(map(tuple, d[["doc_id", "copy"]].itertuples(index=False)))
    assert key(a) == key(b)
    f = mixture_repeat(
        rd.from_pandas(df).repartition(2), "source", ep, priority="hash64"
    ).to_pandas()
    # integral parts are hash-independent: every s0 doc appears >= 2x
    s0 = f[f["source"] == "s0"].groupby("doc_id").size()
    assert (s0 >= 2).all() and (s0 <= 3).all()
    assert len(s0) == 40


def test_shuffle_shard_manifest_matches_brute_force():
    import hashlib

    import pandas as pd
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.sampling import shuffle_shard_manifest

    ids = np.arange(137, dtype=np.int64)
    out = shuffle_shard_manifest(
        rd.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(5),
        "doc_id", shard_size=10,
    ).to_pandas().set_index("doc_id")
    ranks = {d: r for r, d in enumerate(
        sorted(ids, key=lambda d: hashlib.md5(str(d).encode()).hexdigest()))}
    for d in ids:
        assert out.loc[d, "shard"] == ranks[d] // 10
        assert out.loc[d, "pos"] == ranks[d] % 10
    # partitioning invariance
    out2 = shuffle_shard_manifest(
        rd.from_pandas(pd.DataFrame({"doc_id": ids[::-1]})).repartition(2),
        "doc_id", shard_size=10,
    ).to_pandas().set_index("doc_id")
    assert out2.sort_index().equals(out.sort_index())


# ---- length_bucket_manifest ----


def test_length_buckets_exact_ntile_semantics():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.sampling import length_bucket_manifest

    # 23 rows, 4 buckets: ntile gives sizes 6,6,6,5; heavy ties in len
    rng = np.random.default_rng(11)
    lens = rng.integers(0, 4, size=23).astype(np.int64)
    ids = np.arange(23, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "n_chars": pa.array(lens)})).repartition(5)
    out = length_bucket_manifest(ds, n_buckets=4).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)

    order = np.lexsort((ids, lens))
    rank = np.empty(23, np.int64)
    rank[order] = np.arange(23)
    sizes = [6, 6, 6, 5]
    bounds = np.cumsum(sizes)
    want = np.searchsorted(bounds, rank, side="right") + 1
    assert out["bucket"].to_numpy().tolist() == want.tolist()
    assert out["n_chars"].to_numpy().tolist() == lens.tolist()


def test_length_buckets_fewer_rows_than_buckets():
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.sampling import length_bucket_manifest

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 3, 5], pa.int64()),
        "n_chars": pa.array([10, 10, 2], pa.int64())}))
    out = length_bucket_manifest(ds, n_buckets=10).to_pandas()
    out = out.sort_values("bucket")
    # each row its own bucket, ordered by (len, id): 5, 3, 7
    assert out["doc_id"].tolist() == [5, 3, 7]
    assert out["bucket"].tolist() == [1, 2, 3]


def test_token_budget_allocation_hamilton_exact():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.sampling import token_budget_allocation

    # token masses 7 / 2 / 1 over budget 10:
    # base = [7, 2, 1], remainders 0 -> quotas exactly proportional
    rows = [("a", "w " * 7), ("b", "w w"), ("c", "w")]
    ds = rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1].strip() for r in rows])}))
    out = token_budget_allocation(ds, "text", "source", budget=10)
    assert out["quota"].tolist() == [7, 2, 1]
    assert out["n_tok"].tolist() == [7, 2, 1]

    # masses 1/1/1 over budget 10: base 3 each, remainder seat to the
    # lexicographically-first source
    ds2 = rd.from_arrow(pa.table({
        "source": pa.array(["x", "y", "z"]),
        "text": pa.array(["w", "w", "w"])}))
    out2 = token_budget_allocation(ds2, "text", "source", budget=10)
    assert out2["quota"].tolist() == [4, 3, 3]
    assert int(out2["quota"].sum()) == 10


def test_temperature_mixture_upsamples_small_sources_exactly():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.sampling import (
        temperature_mixture, token_budget_allocation)

    # big: 900 tokens, small: 100 tokens
    df = pd.DataFrame({
        "source": ["big"] * 90 + ["small"] * 10,
        "text": ["w " * 9 + "w"] * 100,   # 10 tokens per doc
    })
    ds = rd.from_pandas(df).repartition(4)
    out = temperature_mixture(ds, budget=1000, alpha_halves=1)
    assert out["quota"].sum() == 1000
    assert out["weight"].tolist() == [30, 10]  # isqrt(900), isqrt(100)
    small = out[out["source"] == "small"].iloc[0]
    assert small["quota"] == 250          # 10/40 of the budget (was 100 prop.)
    # alpha = 1 (alpha_halves=2) degenerates to proportional quotas
    t2 = temperature_mixture(ds, budget=1000, alpha_halves=2)
    prop = token_budget_allocation(ds, budget=1000)
    assert t2["quota"].tolist() == prop["quota"].tolist()


def test_sql_isqrt_fixup_matches_math_isqrt_on_boundaries():
    import math

    import duckdb

    # perfect squares and their neighbours — where a float sqrt can
    # round up across the boundary — plus large near-2^52 values
    vals = []
    for n in [0, 1, 2, 3, 4, 99, 100, 101, 10**6, 4503599627370496]:
        vals.append(n)
    for r in [10**7 - 1, 10**7, 67108864]:
        vals += [r * r - 1, r * r, r * r + 1]
    rel = duckdb.query(
        "SELECT n, (s1 + (CASE WHEN (s1+1)*(s1+1) <= n THEN 1 ELSE 0 END)) AS s"
        " FROM (SELECT n, s0 - (CASE WHEN s0*s0 > n THEN 1 ELSE 0 END) AS s1"
        "       FROM (SELECT unnest(?::HUGEINT[]) AS n,"
        "                    CAST(floor(sqrt(CAST(unnest(?::HUGEINT[]) AS DOUBLE)))"
        "                         AS HUGEINT) AS s0))",
        params=[vals, vals]).fetchall()
    for n, s in rel:
        assert int(s) == math.isqrt(int(n)), (n, s)


def test_stratified_sample_brute_force_and_quota():
    import pyarrow as pa

    from logdata_anomaly_miner_ray.functions.hashing import md5_hex
    from logdata_anomaly_miner_ray.stages.sampling import stratified_sample

    n = 300
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids,
                       "source": ["s%d" % (i % 3) for i in ids],
                       "lang": ["l%d" % (i % 2) for i in ids]})
    out = stratified_sample(
        rd.from_pandas(df).repartition(5), ("source", "lang"),
        "doc_id", (1, 7)).to_pandas()
    b = df.copy()
    b["pr"] = np.array(md5_hex(pa.array(b["doc_id"].astype(str))),
                       dtype=object)
    b = b.sort_values(["source", "lang", "pr"], kind="mergesort")
    exp_ids = []
    for _, g in b.groupby(["source", "lang"], sort=True):
        kg = (len(g) + 6) // 7
        exp_ids.extend(g["doc_id"].head(kg).tolist())
    assert sorted(out["doc_id"]) == sorted(exp_ids)
    # exact quota per stratum
    sizes = out.groupby(["source", "lang"]).size()
    for (s, l), kg in sizes.items():
        n_g = len(df[(df["source"] == s) & (df["lang"] == l)])
        assert kg == (n_g + 6) // 7


def test_stratified_sample_partition_invariance():
    from logdata_anomaly_miner_ray.stages.sampling import stratified_sample

    ids = np.arange(150, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids,
                       "source": ["s%d" % (i % 2) for i in ids],
                       "lang": ["x"] * len(ids)})
    outs = []
    for nb in (1, 8):
        o = stratified_sample(
            rd.from_pandas(df).repartition(nb), ("source", "lang"),
            "doc_id", (2, 5)).to_pandas()
        outs.append(sorted(o["doc_id"].tolist()))
    assert outs[0] == outs[1]
    # exact ceil(2n/5) per stratum
    assert len(outs[0]) == 2 * ((2 * 75 + 4) // 5)


def test_group_split_assign_leakage_safe_and_stable():
    from logdata_anomaly_miner_ray.stages.sampling import (
        group_split_assign,
        split_assign,
    )

    ids = np.arange(400, dtype=np.int64)
    hosts = ["h%d.org" % (i % 23) for i in ids]
    df = pd.DataFrame({"doc_id": ids, "host": hosts})
    out = (group_split_assign(rd.from_pandas(df).repartition(5),
                              "host", "doc_id")
           .to_pandas().sort_values("doc_id", ignore_index=True))
    # leakage-safe: exactly one split per host
    assert (out.groupby("host")["split"].nunique() == 1).all()
    # consistent with hashing the host through split_assign directly
    ref = (split_assign(
        rd.from_pandas(pd.DataFrame({"host": sorted(set(hosts))})), "host")
        .to_pandas())
    m = dict(zip(ref["host"], ref["split"]))
    assert all(m[h] == s for h, s in zip(out["host"], out["split"]))
    # stability under growth: adding rows never moves existing groups
    df2 = pd.DataFrame({
        "doc_id": np.arange(800, dtype=np.int64),
        "host": ["h%d.org" % (i % 29) for i in range(800)]})
    out2 = (group_split_assign(rd.from_pandas(df2), "host", "doc_id")
            .to_pandas())
    m2 = dict(zip(out2["host"], out2["split"]))
    assert all(m2[h] == s for h, s in m.items())
