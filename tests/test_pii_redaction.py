"""PII redaction vs a Python-re brute force (re and RE2 are both
leftmost-first here, so non-overlapping match sets agree), plus a
DuckDB regexp_* parity probe — the SQL oracle relies on Arrow and
DuckDB sharing RE2 semantics exactly."""

from __future__ import annotations

import re

import duckdb
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.stages.text_analysis import (
    DEFAULT_PII_PATTERNS,
    with_pii_redaction,
)

FIXTURE = [
    "reach me at jane.doe+spam@mail-host.co.uk or at work",
    "server 10.0.255.1 and 192.168.1.77 rebooted",
    "ssn 123-45-6789 phone 555-123-4567 mixed 999-99-9999",
    "no pii at all in this row",
    "edge a@b.io, ip-ish 999.999.999.999 still masks, 1.2.3.4.com",
    "email with ip domain user@10.0.0.com and bare 8.8.8.8",
    "",
    "double jane@x.org bob@y.net same row 555-000-1111 555-000-1111",
]


def _brute(text: str):
    red = text
    counts = {}
    for name, pat, tok in DEFAULT_PII_PATTERNS:
        counts[f"n_{name}"] = len(re.findall(pat, text))
        red = re.sub(pat, tok, red)
    return red, counts


def test_redaction_matches_python_re():
    ds = rd.from_arrow(pa.table({"text": pa.array(FIXTURE, pa.string())}))
    out = with_pii_redaction(ds, "text", out_col="red").to_pandas()
    assert len(out) == len(FIXTURE)
    got = {r for r in out.itertuples(index=False)}
    for row in out.itertuples(index=False):
        want_red, want_counts = _brute(row.text)
        assert row.red == want_red, row.text
        for k, v in want_counts.items():
            assert getattr(row, k) == v, (row.text, k)
    assert got  # non-degenerate


def test_redaction_counts_on_original_text():
    # an email whose domain is NOT ipv4-like vs one that embeds
    # digits+dots: counts are measured pre-redaction by contract
    ds = rd.from_arrow(
        pa.table({"text": pa.array(["x 1.2.3.4 a@b.co", "a@b.co"], pa.string())})
    )
    out = with_pii_redaction(ds, "text").to_pandas().sort_values("n_ipv4")
    assert out["n_email"].tolist() == [1, 1]
    assert out["n_ipv4"].tolist() == [0, 1]
    assert out["text"].tolist()[-1] == "x <IP> <EMAIL>"


def test_redaction_duckdb_parity():
    # the oracle's exact construction: counts via regexp_extract_all
    # on the original, nested global regexp_replace for the text
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ",".join("(?)" for _ in FIXTURE) + ") v(text)", FIXTURE)
    expr = "text"
    for _, pat, tok in DEFAULT_PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{tok}', 'g')"
    sel = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in DEFAULT_PII_PATTERNS
    )
    want = con.sql(f"SELECT text, {expr} AS red, {sel} FROM t").df()
    ds = rd.from_arrow(pa.table({"text": pa.array(FIXTURE, pa.string())}))
    got = with_pii_redaction(ds, "text", out_col="red").to_pandas()
    g = got.sort_values("text").reset_index(drop=True)
    w = want.sort_values("text").reset_index(drop=True)
    for c in ["red", "n_email", "n_ipv4", "n_ssn", "n_phone"]:
        assert g[c].tolist() == w[c].tolist(), c
