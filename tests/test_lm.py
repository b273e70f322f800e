"""Stupid-backoff LM scoring vs a string-space brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from logdata_anomaly_miner_ray.stages.lm import stupid_backoff_scores

SCALE = 10**6

REF = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log",
    "the dog and the cat",
]
CORPUS = [
    "the cat sat on the mat",        # all trigrams known
    "the cat sat quietly today",     # backoff mid-doc
    "zebra quark flux",              # all unknown -> 0
    "cat",                           # single token
    "the cat",                       # two tokens
    "",                              # empty
    "on the mat the cat ate",        # mixed
]


def _brute(doc: str) -> tuple[int, int]:
    toks = doc.split()
    c1: dict = {}
    c2: dict = {}
    c3: dict = {}
    t1 = 0
    for r in REF:
        w = r.split()
        t1 += len(w)
        for j, t in enumerate(w):
            c1[t] = c1.get(t, 0) + 1
            if j >= 1:
                c2[(w[j - 1], t)] = c2.get((w[j - 1], t), 0) + 1
            if j >= 2:
                c3[(w[j - 2], w[j - 1], t)] = c3.get(
                    (w[j - 2], w[j - 1], t), 0) + 1
    total = 0
    for i, t in enumerate(toks):
        if i == 0:
            s = c1.get(t, 0) * SCALE // t1 if c1.get(t, 0) else 0
        elif i == 1:
            b = c2.get((toks[0], t), 0)
            if b:
                s = b * SCALE // c1[toks[0]]
            elif c1.get(t, 0):
                s = 2 * c1[t] * SCALE // (5 * t1)
            else:
                s = 0
        else:
            tr = c3.get((toks[i - 2], toks[i - 1], t), 0)
            if tr:
                s = tr * SCALE // c2[(toks[i - 2], toks[i - 1])]
            else:
                b = c2.get((toks[i - 1], t), 0)
                if b:
                    s = 2 * b * SCALE // (5 * c1[toks[i - 1]])
                elif c1.get(t, 0):
                    s = 4 * c1[t] * SCALE // (25 * t1)
                else:
                    s = 0
        total += s
    return len(toks), total


def test_stupid_backoff_matches_brute_force():
    ref = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(REF)), "text": REF})).repartition(2)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(CORPUS)), "text": CORPUS})).repartition(3)
    out = stupid_backoff_scores(ds, ref).to_pandas().set_index("doc_id")
    for i, doc in enumerate(CORPUS):
        n, sc = _brute(doc)
        assert out.loc[i, "n_tok"] == n, (i, doc)
        assert out.loc[i, "lm_score"] == sc, (i, doc)


def test_stupid_backoff_empty_reference_scores_zero():
    ref = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": [""]}))
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["the cat", "dog"]}))
    out = stupid_backoff_scores(ds, ref).to_pandas()
    assert (out["lm_score"] == 0).all()


def test_stupid_backoff_partition_invariance():
    ref = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(REF)), "text": REF}))
    big = CORPUS * 10
    df = pd.DataFrame({"doc_id": range(len(big)), "text": big})
    a = stupid_backoff_scores(
        rd.from_pandas(df).repartition(1), ref).to_pandas()
    b = stupid_backoff_scores(
        rd.from_pandas(df).repartition(7), ref).to_pandas()
    k = lambda d: sorted(map(tuple, d.itertuples(index=False)))
    assert k(a) == k(b)
