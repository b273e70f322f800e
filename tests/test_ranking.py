"""stages/ranking.py vs a readable brute force, both join tiers.

The brute force recomputes tf/df/top-k with plain Python dicts and
sorted(); the broadcast and Dataset.join tiers must agree with it and
with each other (same rows, same ranks) regardless of block layout.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from logdata_anomaly_miner_ray.stages.ranking import (
    term_doc_table,
    doc_frequency,
    tfidf_top_terms,
    term_search_topk,
)

DOCS = [
    (0, "a b a c the a"),
    (1, "b b c"),
    (2, "the the zz a"),
    (3, "solo"),
    (4, ""),              # empty doc: no terms at all
    (5, "c c c b the a zz q q q"),
    (6, "tie1 tie2"),     # tf ties → df then term break them
]


def _ds(n_blocks: int = 3) -> "rd.Dataset":
    t = pa.table(
        {"doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
         "text": pa.array([t for _, t in DOCS], pa.string())})
    return rd.from_arrow(t).repartition(n_blocks)


def _brute_tf_df():
    tf = {}
    df = Counter()
    for d, text in DOCS:
        c = Counter(w for w in text.split() if w)
        for w, n in c.items():
            tf[(d, w)] = n
            df[w] += 1
    return tf, df


def _brute_topk(k: int = 3):
    tf, df = _brute_tf_df()
    rows = []
    for d in sorted({i for i, _ in tf}):
        terms = [(w, tf[(d, w)], df[w]) for (i, w) in tf if i == d]
        terms.sort(key=lambda x: (-x[1], x[2], x[0]))
        for r, (w, f, dfx) in enumerate(terms[:k], 1):
            rows.append((d, w, f, dfx, r))
    return rows


def _sorted_tuples(pdf: pd.DataFrame, cols):
    return sorted(map(tuple, pdf[cols].itertuples(index=False)))


def test_term_doc_table_and_df():
    tf, df = _brute_tf_df()
    td = term_doc_table(_ds()).to_pandas()
    got = {(int(r.doc_id), r.term): int(r.tf)
           for r in td.itertuples(index=False)}
    assert got == tf
    got_df = {r.term: int(r.df)
              for r in doc_frequency(term_doc_table(_ds()))
              .to_pandas().itertuples(index=False)}
    assert got_df == dict(df)


@pytest.mark.parametrize("max_bcast", [2_000_000, 0])
def test_tfidf_top_terms_both_tiers(max_bcast):
    out = tfidf_top_terms(
        _ds(), k=3, max_broadcast_terms=max_bcast).to_pandas()
    got = _sorted_tuples(out, ["doc_id", "term", "tf", "df", "rnk"])
    want = sorted(_brute_topk(3))
    assert got == want


def test_tfidf_block_layout_invariance():
    a = tfidf_top_terms(_ds(1), k=2).to_pandas()
    b = tfidf_top_terms(_ds(7), k=2).to_pandas()
    cols = ["doc_id", "term", "tf", "df", "rnk"]
    assert _sorted_tuples(a, cols) == _sorted_tuples(b, cols)


def test_term_search_topk():
    out = term_search_topk(_ds(), ["a", "the", "zz", "missing"],
                           k=2).to_pandas()
    tf, _ = _brute_tf_df()
    dl = {d: len(t.split()) for d, t in DOCS}
    want = []
    for q in ["a", "the", "zz", "missing"]:
        hits = [(d, tf[(d, q)], dl[d]) for (d, w) in tf if w == q]
        hits.sort(key=lambda x: (-x[1], x[2], x[0]))
        for r, (d, f, L) in enumerate(hits[:2], 1):
            want.append((q, d, f, L, r))
    got = _sorted_tuples(out, ["term", "doc_id", "tf", "doc_len", "rnk"])
    assert got == sorted(want)
    assert "missing" not in set(out["term"])


def _brute_bm25(terms, k=2, scale=10**9):
    tf, _ = _brute_tf_df()
    dl = {d: len(t.split()) for d, t in DOCS}
    n_docs = len(DOCS)
    n_tok = sum(dl.values())
    want = []
    for q in terms:
        hits = []
        for (d, w), f in tf.items():
            if w != q:
                continue
            key = (3 * n_tok + 9 * n_docs * dl[d]) * scale // f
            hits.append((key, d, f, dl[d]))
        hits.sort()
        for r, (key, d, f, L) in enumerate(hits[:k], 1):
            want.append((q, d, f, L, key, r))
    return sorted(want)


def test_bm25_topk_matches_brute_force():
    from logdata_anomaly_miner_ray.stages.ranking import bm25_topk

    terms = ["a", "the", "c", "missing"]
    out = bm25_topk(_ds(), terms, k=2).to_pandas()
    got = _sorted_tuples(
        out, ["term", "doc_id", "tf", "doc_len", "sat_key", "rnk"])
    assert got == _brute_bm25(terms, k=2)


def test_bm25_saturation_beats_lexicographic():
    """BM25 must rank a shorter doc with LOWER tf above a much longer
    doc with higher tf when the length penalty dominates — the case
    (tf DESC, dl ASC) lexicographic search gets wrong by design."""
    from logdata_anomaly_miner_ray.stages.ranking import bm25_topk

    long_doc = "q q " + "pad " * 400
    docs = [(0, "q x"), (1, long_doc.strip())]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([s for _, s in docs], pa.string())})
    out = bm25_topk(rd.from_arrow(t).repartition(2), ["q"], k=2).to_pandas()
    out = out.sort_values("rnk")
    # doc 0: tf=1, dl=2; doc 1: tf=2, dl=402 — BM25 puts doc 0 first
    assert out["doc_id"].tolist() == [0, 1]
    # the lexicographic order (tf DESC) would put doc 1 first
    lex = term_search_topk(
        rd.from_arrow(t).repartition(2), ["q"], k=2).to_pandas()
    assert lex.sort_values("rnk")["doc_id"].tolist() == [1, 0]


def test_bm25_block_layout_invariance_and_overflow_guard():
    from logdata_anomaly_miner_ray.stages.ranking import bm25_topk

    cols = ["term", "doc_id", "tf", "doc_len", "sat_key", "rnk"]
    a = bm25_topk(_ds(1), ["a", "c"], k=3).to_pandas()
    b = bm25_topk(_ds(7), ["a", "c"], k=3).to_pandas()
    assert _sorted_tuples(a, cols) == _sorted_tuples(b, cols)
    # Ray wraps the worker's ValueError in RayTaskError — match text
    with pytest.raises(Exception, match="envelope exceeded"):
        bm25_topk(_ds(2), ["a"], k=1, scale=2**62).to_pandas()
