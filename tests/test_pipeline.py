"""Flagship suite end-to-end: expected verdicts on the seeded pages
fixture, checkpoint resume, byte-identity invariant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from logdata_anomaly_miner_ray.pipelines.validate import run_suite
from logdata_anomaly_miner_ray.sources.pages import make_pages_block, ts_index_block

N = 8000


@pytest.fixture(scope="module")
def suite_out(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("suite"))
    pages = rd.from_arrow(make_pages_block(0, N)).repartition(4)
    tsx = rd.from_arrow(ts_index_block(0, N)).repartition(2)
    return run_suite(pages, ts_index=tsx, out_dir=out_dir), out_dir


def _verdict(out, check):
    df = out["verdicts"].to_pandas().set_index("check")
    return df.loc[check]


def test_uniqueness_matches_generator(suite_out):
    out, _ = suite_out
    t = make_pages_block(0, N)
    urls = t["url"].to_pylist()
    n_dups = len(urls) - len(set(urls))
    v = _verdict(out, "uniqueness_url")
    assert not v["pass"]
    assert v["n_violations"] == n_dups


def test_referential_flags_seeded_missing(suite_out):
    out, _ = suite_out
    v = _verdict(out, "referential_url_ts")
    assert not v["pass"]
    # seeded ~0.2% missing
    assert 0.0005 * N < v["n_violations"] < 0.005 * N


def test_lang_domain_flags_xx(suite_out):
    out, _ = suite_out
    t = make_pages_block(0, N)
    n_xx = sum(1 for l in t["lang"].to_pylist() if l == "xx")
    v = _verdict(out, "lang_domain")
    assert v["n_violations"] == n_xx


def test_self_learned_checks_pass(suite_out):
    out, _ = suite_out
    for check in ["charset", "token_range", "frequency"]:
        assert _verdict(out, check)["pass"], check


def test_ordering_flags_swaps(suite_out):
    out, _ = suite_out
    assert not _verdict(out, "ordering")["pass"]


def test_byte_identity(suite_out):
    out, _ = suite_out
    assert _verdict(out, "text_byte_identity")["pass"]


def test_resume_skips_completed(suite_out):
    out, out_dir = suite_out
    import json
    import time

    pages = rd.from_arrow(make_pages_block(0, N)).repartition(4)
    tsx = rd.from_arrow(ts_index_block(0, N)).repartition(2)
    t0 = time.time()
    out2 = run_suite(pages, ts_index=tsx, out_dir=out_dir)
    # identical verdict counts on resume
    a = out["verdicts"].to_pandas().set_index("check")["n_violations"]
    b = out2["verdicts"].to_pandas().set_index("check")["n_violations"]
    assert (a == b).all()


def test_rerun_does_not_inflate_check_dirs(suite_out):
    """Re-running into the same out_dir must REPLACE each
    check=<name> dir, not append new UUID parquet files next to
    stale ones (ADVICE r1: inflated counts flip verdicts)."""
    out, out_dir = suite_out
    import pyarrow.dataset as pads

    n1 = pads.dataset(f"{out_dir}/check=broadcast_checks").count_rows()
    pages = rd.from_arrow(make_pages_block(0, N)).repartition(4)
    tsx = rd.from_arrow(ts_index_block(0, N)).repartition(2)
    run_suite(pages, ts_index=tsx, out_dir=out_dir)
    n2 = pads.dataset(f"{out_dir}/check=broadcast_checks").count_rows()
    assert n1 == n2


def test_violation_rows_schema(suite_out):
    out, out_dir = suite_out
    import pyarrow.dataset as pads

    t = pads.dataset(f"{out_dir}/check=uniqueness_url").to_table()
    assert t.num_rows > 0
    assert t["event_type"].to_pylist()[0] == "Analysis.UniqueKeyDetector"
    assert set(t.column_names) >= {
        "event_type",
        "message",
        "affected_paths",
        "affected_values",
        "expected",
        "key",
    }


def test_clean_corpus_gates_and_flags():
    """Composed cleaning pass: each gate drops its target doc; flag
    mode accounts for every row."""
    import ray.data as rd

    from logdata_anomaly_miner_ray.pipelines.clean import clean_corpus

    good = " ".join(f"w{i}" for i in range(60)) + " "
    docs = [
        (0, good + "unique tail zero"),
        (1, "short"),                              # fails len+tok
        (2, ("dup line\n" * 10) + good),           # fails dup-line gate
        (3, "spam ham " * 80),                     # fails top-2gram gate
        (4, good + "unique tail zero"),            # exact dup of 0 → dropped
        (5, good + "another unique tail"),
    ]
    t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "text": [d[1] for d in docs]})
    ds = rd.from_arrow(t).repartition(2)
    kept = sorted(clean_corpus(
        ds, min_chars=50, max_chars=10_000, min_tokens=10,
        max_dup_line_frac=(1, 4), max_top_2gram_frac=(1, 5),
    ).to_pandas()["doc_id"])
    assert kept == [0, 5]
    flags = clean_corpus(
        ds, min_chars=50, max_chars=10_000, min_tokens=10,
        max_dup_line_frac=(1, 4), max_top_2gram_frac=(1, 5), keep_only=False,
    ).to_pandas().set_index("doc_id")
    assert len(flags) == 6
    assert not flags.loc[1, "ok_len"]
    assert not flags.loc[2, "ok_rep"]
    assert not flags.loc[3, "ok_rep"]
    assert not flags.loc[4, "ok_dedup"] and flags.loc[0, "ok_dedup"]

    # scale tier (anti-join recast, forced): identical keep set and
    # identical per-row flags — no driver keep-set materialization
    kept_scale = sorted(clean_corpus(
        ds, min_chars=50, max_chars=10_000, min_tokens=10,
        max_dup_line_frac=(1, 4), max_top_2gram_frac=(1, 5),
        driver_keep_limit=0, n_buckets=3,
    ).to_pandas()["doc_id"])
    assert kept_scale == [0, 5]
    flags_scale = clean_corpus(
        ds, min_chars=50, max_chars=10_000, min_tokens=10,
        max_dup_line_frac=(1, 4), max_top_2gram_frac=(1, 5),
        keep_only=False, driver_keep_limit=0, n_buckets=3,
    ).to_pandas().set_index("doc_id").sort_index()
    pd.testing.assert_frame_equal(flags_scale, flags.sort_index())
