"""Eval-set decontamination + duplicate-span coverage vs brute force.

Brute-force oracles recompute gram membership on the STRING grams
(the engine keys on 128-bit hash pairs), so any hashing bug shows as
a count mismatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from logdata_anomaly_miner_ray.stages.decontam import (
    decontaminate,
    dup_span_coverage,
    eval_gram_set,
)


def _grams(text: str, k: int) -> list[str]:
    toks = text.split()
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _brute_decontam(corpus: list[tuple[int, str]], eval_texts: list[str], k: int):
    ev = set()
    for t in eval_texts:
        ev.update(_grams(t, k))
    out = {}
    for i, t in corpus:
        n = len(set(_grams(t, k)) & ev)
        if n:
            out[i] = n
    return out


def _brute_spans(corpus: list[tuple[int, str]], w: int):
    from collections import Counter

    docs_per_gram: dict[str, set] = {}
    for i, t in corpus:
        for g in set(_grams(t, w)):
            docs_per_gram.setdefault(g, set()).add(i)
    out = {}
    for i, t in corpus:
        gs = _grams(t, w)
        if not gs:
            continue
        n_dup = sum(1 for g in gs if len(docs_per_gram[g]) >= 2)
        out[i] = (len(gs), n_dup)
    return out


CORPUS = [
    (1, "a b c d e f g h i j"),
    (2, "x b c d e f y z w q"),          # shares "b c d e f"-ish spans with 1
    (3, "a b c d e f g h i j"),           # exact dup of 1
    (4, "solo unique tokens only here none shared at all ok"),
    (5, "rep rep rep rep rep rep rep rep"),   # internal repetition, no cross-doc
    (6, "short one"),                      # shorter than any gram width
    (7, ""),                               # empty text
]
EVAL = ["c d e f g h", "nothing matching anything"]


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string())}
        )
    )


@pytest.mark.parametrize("k", [2, 3, 4])
def test_decontaminate_matches_brute_force(k):
    eval_rows = [(100 + i, t) for i, t in enumerate(EVAL)]
    out = decontaminate(_ds(CORPUS), _ds(eval_rows), "text", "doc_id", k=k).to_pandas()
    got = dict(zip(out["doc_id"], out["n_hits"])) if len(out) else {}
    assert got == _brute_decontam(CORPUS, EVAL, k)


@pytest.mark.parametrize("w", [2, 3, 5])
@pytest.mark.parametrize("dup_limit", [10_000_000, 0])
def test_dup_span_coverage_matches_brute_force(w, dup_limit):
    # dup_limit=0 forces the scale tier (keyed doc-gram shuffle);
    # the default takes the broadcast dup-gram tier — identical output
    out = dup_span_coverage(_ds(CORPUS), "text", "doc_id", w=w,
                            broadcast_dup_limit=dup_limit).to_pandas()
    got = {
        int(r.doc_id): (int(r.n_pos), int(r.n_dup_pos)) for r in out.itertuples()
    }
    assert got == _brute_spans(CORPUS, w)


def test_internal_repetition_is_not_cross_doc():
    # doc 5's repeated gram occurs in one doc only: counted in n_pos,
    # never in n_dup_pos
    out = dup_span_coverage(_ds(CORPUS), "text", "doc_id", w=3).to_pandas()
    row = out[out["doc_id"] == 5].iloc[0]
    assert row["n_pos"] == 6 and row["n_dup_pos"] == 0


def test_exact_dup_docs_fully_covered():
    out = dup_span_coverage(_ds(CORPUS), "text", "doc_id", w=4).to_pandas()
    for i in (1, 3):  # byte-identical pair → every position duplicated
        row = out[out["doc_id"] == i].iloc[0]
        assert row["n_pos"] == row["n_dup_pos"] == 7


def test_short_and_empty_docs_emit_nothing():
    out = dup_span_coverage(_ds(CORPUS), "text", "doc_id", w=3).to_pandas()
    assert not set(out["doc_id"]) & {6, 7}


def test_empty_eval_set_flags_nothing():
    out = decontaminate(
        _ds(CORPUS), _ds([(100, "")]), "text", "doc_id", k=3
    ).to_pandas()
    assert len(out) == 0


def test_eval_gram_cap_is_a_hard_error():
    with pytest.raises(ValueError, match="max_eval_grams"):
        eval_gram_set(_ds([(1, "a b c d e f g h")]), "text", k=2, max_eval_grams=3)


def test_eval_gram_set_distinct():
    g = eval_gram_set(_ds([(1, "a b a b a b"), (2, "a b a b")]), "text", k=2)
    # distinct grams: "a b", "b a"
    assert len(g) == 2


# ---------------------------------------------------------------------------
# hypothesis fuzz of the gram kernel (no Ray in the loop)
# ---------------------------------------------------------------------------

import re

from hypothesis import given, settings, strategies as st

from logdata_anomaly_miner_ray.functions.text import shingle_hashes, shingle_hashes2
from logdata_anomaly_miner_ray.stages.decontam import _distinct_grams_per_row

_ASCII_WS = re.compile(r"[\t\n\x0b\x0c\r ]+")

FUZZ_TEXTS = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=40,
    ),
    min_size=0,
    max_size=20,
)


def _tok(s: str) -> list[str]:
    return [t for t in _ASCII_WS.split(s) if t]


@settings(max_examples=80, deadline=None)
@given(FUZZ_TEXTS, st.integers(min_value=1, max_value=4))
def test_shingle_hashes2_h1_matches_shingle_hashes(rows, k):
    arr = pa.array(rows, pa.string())
    h1a, rida = shingle_hashes(arr, k=k)
    h1b, h2b, ridb = shingle_hashes2(arr, k=k)
    assert np.array_equal(h1a, h1b) and np.array_equal(rida, ridb)
    # h2 is genuinely independent: per-row window counts still agree
    assert len(h2b) == len(h1b)


@settings(max_examples=80, deadline=None)
@given(FUZZ_TEXTS, st.integers(min_value=1, max_value=4))
def test_distinct_gram_counts_match_string_brute_force(rows, k):
    arr = pa.array(rows, pa.string())
    h1, h2, rid = _distinct_grams_per_row(arr, k)
    got = {int(r): int(c) for r, c in zip(*np.unique(rid, return_counts=True))}
    want = {}
    for i, s in enumerate(rows):
        toks = _tok(s)
        gs = {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}
        if gs:
            want[i] = len(gs)
    assert got == want


@pytest.mark.parametrize("k", [2, 3])
def test_oov_gram_rate_matches_brute_force(k):
    from logdata_anomaly_miner_ray.stages.decontam import oov_gram_rate

    ref_rows = [(100 + i, t) for i, t in enumerate(EVAL)]
    out = oov_gram_rate(_ds(CORPUS), _ds(ref_rows), "text", "doc_id",
                        k=k).to_pandas()
    got = {int(r.doc_id): (int(r.n_grams), int(r.n_oov))
           for r in out.itertuples()}
    ref = set()
    for t in EVAL:
        ref.update(_grams(t, k))
    want = {}
    for i, t in CORPUS:
        g = set(_grams(t, k))
        if g:
            want[i] = (len(g), len(g - ref))
    assert got == want


def test_oov_gram_rate_empty_reference_marks_everything_oov():
    from logdata_anomaly_miner_ray.stages.decontam import oov_gram_rate

    out = oov_gram_rate(_ds(CORPUS), _ds([]), "text", "doc_id", k=2).to_pandas()
    assert (out["n_oov"] == out["n_grams"]).all()
