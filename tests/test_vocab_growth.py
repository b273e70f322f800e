"""Heaps'-law vocab growth (stages/vocab.vocab_growth): cutoff
arithmetic, first-occurrence semantics, many-small-block histogram
accumulation (the np.add.at regression guard)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.stages.vocab import vocab_growth


def _docs(rows, nblocks):
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(nblocks)


def test_growth_curve_exact():
    rows = [(0, "a b"), (1, "b c"), (2, "c d e"), (3, "a"), (4, "f")]
    # n=5 ids, 5 checkpoints → cutoffs 0,1,2,3,4; firsts: a:0 b:0 c:1
    # d:2 e:2 f:4 → vocab 2,3,5,5,6
    out = vocab_growth(_docs(rows, 2), n_checkpoints=5).to_pandas()
    assert out["cutoff"].tolist() == [0, 1, 2, 3, 4]
    assert out["vocab"].tolist() == [2, 3, 5, 5, 6]


def test_many_tiny_blocks_accumulate():
    # one unique word per doc, one doc per block → every post-groupby
    # block is tiny; repeated histogram indices must accumulate
    rows = [(i, f"w{i}") for i in range(40)]
    out = vocab_growth(_docs(rows, 40), n_checkpoints=4).to_pandas()
    assert out["vocab"].tolist() == [10, 20, 30, 40]


def test_empty_and_whitespace_rows():
    rows = [(0, "  "), (1, "x"), (2, "")]
    out = vocab_growth(_docs(rows, 2), n_checkpoints=3).to_pandas()
    assert out["vocab"].tolist() == [0, 1, 1]


def test_tiny_id_range_duplicate_cutoffs_merge():
    # 3 ids, 10 checkpoints → duplicate cutoff values must merge (the
    # SQL oracle GROUP BYs cutoff)
    rows = [(0, "a"), (1, "b"), (2, "c")]
    out = vocab_growth(_docs(rows, 2), n_checkpoints=10).to_pandas()
    assert out["cutoff"].is_unique
    assert out["cutoff"].tolist() == sorted(set(out["cutoff"]))
    assert out.iloc[-1]["vocab"] == 3


def test_empty_dataset_typed_empty():
    import pyarrow as _pa

    ds = rd.from_arrow(_pa.table({
        "doc_id": _pa.array([], _pa.int64()),
        "text": _pa.array([], _pa.string())}))
    out = vocab_growth(ds, n_checkpoints=4)
    assert out.num_rows == 0
    assert [f.name for f in out.schema] == ["cutoff", "vocab"]
