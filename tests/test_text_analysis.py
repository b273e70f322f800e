"""lexicon_classify: keyword-topic routing edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

def test_lexicon_classify_brute_force_and_edges():
    from logdata_anomaly_miner_ray.stages.text_analysis import lexicon_classify

    lex = {"b_topic": ["x", "y"], "a_topic": ["y2", "z"]}
    docs = [
        "x y x",          # b_topic 3 hits
        "z z y2",         # a_topic 3
        "x z",            # tie 1-1 -> a_topic (name asc)
        "nothing here",   # (none)
        "",               # empty -> (none)
        "X  Y\tz",        # case + multi-space: b 2, a 1
    ]
    ids = np.arange(len(docs), dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": docs})).repartition(3)
    out = (lexicon_classify(ds, lex).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert list(out["topic"]) == [
        "b_topic", "a_topic", "a_topic", "(none)", "(none)", "b_topic"]
    assert list(out["n_hits"]) == [3, 3, 1, 0, 0, 2]


def test_lexicon_classify_duplicate_keyword_rejected():
    import pytest

    from logdata_anomaly_miner_ray.stages.text_analysis import lexicon_classify

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["x"]}))
    with pytest.raises(ValueError):
        lexicon_classify(ds, {"a": ["x"], "b": ["x"]})


def test_fix_mojibake_repairs_and_preserves():
    from logdata_anomaly_miner_ray.stages.text_analysis import fix_mojibake

    docs = [
        "plain ascii",
        "double cafÃ© here",       # latin-1 class
        "quote itâ€™s fine",       # cp1252 class
        "truncated Ã end",         # invalid UTF-8 after unwind
        "real café stays",         # correctly-encoded text preserved
        "naÃ¯ve rÃ©sumÃ©",          # multiple fixes in one row
    ]
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )).repartition(3)
    out = (fix_mojibake(ds).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert list(out["fixed_text"]) == [
        "plain ascii",
        "double café here",
        "quote it’s fine",
        "truncated Ã end",
        "real café stays",
        "naïve résumé",
    ]
    assert list(out["was_fixed"]) == [False, True, True, False, False, True]
