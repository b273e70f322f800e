"""Misra-Gries sketch guarantees + exact two-pass heavy hitters."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from logdata_anomaly_miner_ray.stages.heavy_hitters import heavy_hitter_tokens
from logdata_anomaly_miner_ray.state.sketches import MisraGries


def _zipf_stream(rng, n, vocab):
    ranks = np.arange(1, vocab + 1)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    return rng.choice(vocab, size=n, p=p)


@pytest.mark.parametrize("capacity", [4, 16, 64])
def test_mg_guarantees(capacity):
    rng = np.random.default_rng(7)
    stream = _zipf_stream(rng, 20_000, 500)
    true = pd.Series(stream).value_counts()
    n = len(stream)
    # fold in chunks through add() and merge() to exercise both paths
    mg = MisraGries(capacity)
    for chunk in np.array_split(stream, 13):
        vals, counts = np.unique(chunk, return_counts=True)
        other = MisraGries(capacity).add(vals.tolist(), counts)
        mg.merge(other)
    bound = n / (capacity + 1)
    for v, c in true.items():
        if c > bound:  # every heavy value retained
            assert v in mg.counts, (v, c, bound)
        if v in mg.counts:  # undercount bounded, never overcount
            assert mg.counts[v] <= c
            assert c - mg.counts[v] <= bound + 1e-9
    assert len(mg.counts) <= capacity


def test_mg_small_domain_is_exact():
    mg = MisraGries(10)
    mg.add(["a", "b", "c"], [5, 3, 2])
    mg.add(["a", "c"], [1, 1])
    assert mg.counts == {"a": 6, "b": 3, "c": 3}


def test_heavy_hitter_tokens_exact_vs_pandas(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    docs = []
    for _ in range(400):
        ids = _zipf_stream(rng, 40, len(vocab))
        docs.append(" ".join(vocab[i] for i in ids))
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())})).repartition(8)

    got = heavy_hitter_tokens(ds, "text", phi_den=32, capacity=128)

    toks = pd.Series(" ".join(docs).split())
    counts = toks.value_counts()
    total = len(toks)
    want = counts[counts * 32 > total].reset_index()
    want.columns = ["token", "n"]
    want = want.sort_values(["n", "token"], ascending=[False, True]).reset_index(drop=True)
    assert list(got["token"]) == list(want["token"])
    assert list(got["n"]) == list(want["n"])
    assert len(got) > 0  # zipf head must fire


def test_heavy_hitter_tokens_many_small_blocks(ray_session):
    """The candidate rule is applied dataset-side: with many tiny
    blocks the merged MG table is #blocks×(capacity+1) rows, but the
    result must stay exact and the driver only sees candidates."""
    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(150)]
    docs = []
    for _ in range(256):
        ids = _zipf_stream(rng, 12, len(vocab))
        docs.append(" ".join(vocab[i] for i in ids))
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())})).repartition(64)

    got = heavy_hitter_tokens(ds, "text", phi_den=16, capacity=64)

    toks = pd.Series(" ".join(docs).split())
    counts = toks.value_counts()
    total = len(toks)
    want = counts[counts * 16 > total].reset_index()
    want.columns = ["token", "n"]
    want = want.sort_values(["n", "token"], ascending=[False, True]).reset_index(drop=True)
    assert list(got["token"]) == list(want["token"])
    assert list(got["n"]) == list(want["n"])


def test_heavy_hitter_tokens_empty_and_whitespace(ray_session):
    ds = rd.from_arrow(
        pa.table({"text": pa.array(["   ", "", "\t\n"], pa.string())})
    )
    got = heavy_hitter_tokens(ds, "text", phi_den=8)
    assert len(got) == 0
    assert list(got.columns) == ["token", "n"]


def test_topk_per_group_matches_pandas(ray_session):
    import ray.data as rdd

    from logdata_anomaly_miner_ray.stages._agg import topk_per_group

    rng = np.random.default_rng(9)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 120, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 50, n).astype(np.int64),  # many ties
        }
    )
    ds = rdd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)
    got = (
        topk_per_group(ds, ["g"], "v", k=3, tiebreak_cols=("id",))
        .to_pandas()
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False)
        .head(3)
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "id", "v"]], want[["g", "id", "v"]])


# ---- count-min sketch ----


def test_cms_overestimates_and_exact_small_vocab():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.heavy_hitters import cms_token_counts

    texts = ["a b c a", "b b c", "d", ""] * 5
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(3)
    out = cms_token_counts(ds, "text", ["a", "b", "c", "d", "nope"],
                           depth=4, width=512)
    want_true = {"a": 10, "b": 15, "c": 10, "d": 5, "nope": 0}
    got = dict(zip(out["term"], out["true_cnt"]))
    assert got == want_true
    # one-sided CMS guarantee, and with 4 distinct tokens in 512
    # buckets collisions are impossible -> estimates are exact
    assert (out["cms_est"].to_numpy() >= out["true_cnt"].to_numpy()).all()
    est = dict(zip(out["term"], out["cms_est"]))
    for t in ("a", "b", "c", "d"):
        assert est[t] == want_true[t], t


def test_cms_partition_invariant():
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.heavy_hitters import cms_token_counts

    texts = [f"tok{i % 17} tok{i % 5} shared" for i in range(120)]
    t = pa.table({"text": pa.array(texts)})
    outs = []
    for parts in (1, 8):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(cms_token_counts(
            ds, "text", ["tok0", "tok4", "shared", "tok16"],
            depth=3, width=64))
    assert outs[0].equals(outs[1])
