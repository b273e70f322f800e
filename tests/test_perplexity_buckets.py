"""CCNet head/middle/tail split (stages/lm.perplexity_buckets):
exact tertile thresholds per group, carry-column plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.stages.lm import perplexity_buckets


def _scores(langs, scores, nblocks=3):
    df = pd.DataFrame({
        "doc_id": np.arange(len(scores), dtype=np.int64),
        "lang": langs,
        "lm_score": np.array(scores, dtype=np.int64),
    })
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(nblocks)


def test_tertile_assignment_exact():
    # en: 9 docs, sorted scores 10..90 → t1 = value at rank ceil(9/3)=3
    # (=30), t2 = rank ceil(18/3)=6 (=60)
    scores = [50, 10, 90, 30, 70, 20, 80, 40, 60]
    out = perplexity_buckets(_scores(["en"] * 9, scores)).to_pandas()
    by = dict(zip(out["doc_id"], out["bucket"]))
    want = {1: "tail", 5: "tail", 3: "tail",          # 10 20 30
            7: "middle", 0: "middle", 8: "middle",    # 40 50 60
            4: "head", 6: "head", 2: "head"}          # 70 80 90
    assert by == {k: want[k] for k in by}


def test_per_group_independent_thresholds():
    langs = ["en"] * 3 + ["de"] * 3
    scores = [1, 2, 3, 100, 200, 300]
    out = perplexity_buckets(_scores(langs, scores)).to_pandas()
    en = out[out["lang"] == "en"].sort_values("lm_score")["bucket"].tolist()
    de = out[out["lang"] == "de"].sort_values("lm_score")["bucket"].tolist()
    assert en == ["tail", "middle", "head"]
    assert de == ["tail", "middle", "head"]


def test_singleton_group_all_tail():
    out = perplexity_buckets(_scores(["zh"], [42])).to_pandas()
    assert out["bucket"].tolist() == ["tail"]


def test_ties_share_bucket():
    # all-equal scores: t1 = t2 = v → every doc 'tail' (consistent
    # with the SQL CASE on <=)
    out = perplexity_buckets(_scores(["en"] * 6, [7] * 6)).to_pandas()
    assert set(out["bucket"]) == {"tail"}


def test_integer_group_column_buckets():
    # non-string group columns must work (keys are str-normalized on
    # both sides of the broadcast threshold table)
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "lang": np.array([0, 0, 0, 1, 1, 1], dtype=np.int64),
        "lm_score": np.array([1, 2, 3, 10, 20, 30], dtype=np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(2)
    out = perplexity_buckets(ds).to_pandas()
    g0 = out[out["lang"] == 0].sort_values("lm_score")["bucket"].tolist()
    assert g0 == ["tail", "middle", "head"]
