"""paragraph_dedup vs a string brute force.

The brute force recomputes the CCNet-style keep-first paragraph
dedup on raw strings (the engine keys on 128-bit md5 of the
normalized paragraph), so a hash, normalization, or rebuild bug
shows as text/count mismatches. Both tiers are forced and must
agree; blanks never dedup; spacing variants collapse to one key;
within-doc repeats drop; keep-first follows (doc_id, line index)
regardless of partitioning.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.stages.decontam import paragraph_dedup

_NORM = re.compile(r"[ \t\r]+")


def _norm(p: str) -> str:
    return _NORM.sub(" ", p).strip(" ")


def _brute(rows: list[tuple[int, str]]) -> dict[int, tuple[str, int, int]]:
    seen: set[str] = set()
    out = {}
    for i, t in sorted(rows):
        paras = t.split("\n")
        kept = []
        for p in paras:
            key = _norm(p)
            if key == "" or key not in seen:
                kept.append(p)
                if key != "":
                    seen.add(key)
        out[i] = ("\n".join(kept), len(paras), len(paras) - len(kept))
    return out


def _run(rows, n_partitions=3, **kw) -> dict[int, tuple[str, int, int]]:
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string())}
        )
    ).repartition(n_partitions)
    out = paragraph_dedup(ds, "text", "doc_id", **kw)
    res = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for i, t, np_, nd in zip(
            b["doc_id"].to_pylist(), b["clean_text"].to_pylist(),
            b["n_paras"].to_pylist(), b["n_dropped"].to_pylist(),
        ):
            res[int(i)] = (t, int(np_), int(nd))
    return res


def _fixture():
    return [
        (0, "welcome home\nalpha beta gamma\nthanks for reading"),
        (1, "welcome home\ndelta epsilon\nthanks  for\treading"),  # spacing variant
        (2, "zeta eta\n\ntheta iota\n"),        # blanks survive everywhere
        (3, "repeat me\nrepeat me\nunique tail"),  # within-doc repeat
        (4, "welcome home"),                     # entire doc is a dup line
        (5, ""),                                 # one empty paragraph
        (6, "zeta eta\nfresh line"),             # first line seen in doc 2
    ]


def test_matches_brute_force_broadcast_tier():
    rows = _fixture()
    assert _run(rows) == _brute(rows)


def test_matches_brute_force_shuffle_tier():
    rows = _fixture()
    assert _run(rows, broadcast_dup_limit=0) == _brute(rows)


def test_keep_first_is_global_and_partition_invariant():
    # the same normalized line in many docs: only the smallest doc_id
    # keeps it, however the input is partitioned
    rows = [(i, f"shared banner line\nbody {i}") for i in range(20)]
    for parts in (1, 7):
        res = _run(rows, n_partitions=parts)
        assert res[0] == ("shared banner line\nbody 0", 2, 0)
        for i in range(1, 20):
            assert res[i] == (f"body {i}", 2, 1), i


def test_blank_paragraphs_never_dedup():
    rows = [(0, "a\n\n\nb"), (1, "\n\nc")]
    res = _run(rows)
    assert res[0] == ("a\n\n\nb", 4, 0)
    assert res[1] == ("\n\nc", 3, 0)


def test_random_corpus_both_tiers_agree():
    rng = np.random.default_rng(7)
    pool = [f"line {i}" for i in range(15)] + ["", "  ", "x  y", "x y"]
    rows = []
    for i in range(60):
        n = int(rng.integers(1, 6))
        rows.append((i, "\n".join(
            pool[int(j)] for j in rng.integers(0, len(pool), n))))
    want = _brute(rows)
    assert _run(rows) == want
    assert _run(rows, broadcast_dup_limit=0) == want
