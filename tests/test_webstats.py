"""Domain-level curation: host key, per-host stats, blocklist filter."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.functions.url import host_of_array
from logdata_anomaly_miner_ray.stages.webstats import blocklist_filter, host_stats

URLS = [
    "http://WWW.Example.COM/a",      # www + case
    "https://example.com:443/b",     # port stripped by host key
    "http://example.com:8080/c",     # any port stripped
    "https://Other.ORG/",            # case
    "not a url at all",              # null host
    "ftp://Files.example.com/x",     # non-http scheme still parses
    "http://other.org/page?q=1",
]
HOSTS = ["example.com", "example.com", "example.com", "other.org",
         None, "files.example.com", "other.org"]


def _ds(nblocks=3):
    df = pd.DataFrame(
        {"url": URLS, "n_chars": np.arange(len(URLS), dtype=np.int64) + 10}
    )
    return rd.from_pandas(df).repartition(nblocks)


def test_host_of_array():
    got = host_of_array(pa.array(URLS, pa.string())).to_pylist()
    assert got == HOSTS


def test_host_stats_driver_tier():
    out = host_stats(_ds(), "url", ("n_chars",))
    exp = (
        pd.DataFrame({"host": HOSTS,
                      "n_chars": np.arange(len(URLS), dtype=np.int64) + 10})
        .groupby("host", dropna=False)
        .agg(n_docs=("n_chars", "size"), sum_n_chars=("n_chars", "sum"))
        .reset_index()
    )
    for _, r in exp.iterrows():
        k = r["host"]
        row = (out[out["host"] == k] if isinstance(k, str)
               else out[out["host"].isna()]).iloc[0]
        assert int(row["n_docs"]) == int(r["n_docs"])
        assert int(row["sum_n_chars"]) == int(r["sum_n_chars"])


def test_host_stats_scale_tier_matches_driver_tier():
    a = host_stats(_ds(2), "url", ("n_chars",), driver_fold_limit=200_000)
    b = host_stats(_ds(4), "url", ("n_chars",), driver_fold_limit=0)
    ka = sorted(map(tuple, a.fillna("∅").itertuples(index=False)))
    kb = sorted(map(tuple, b.fillna("∅").itertuples(index=False)))
    assert ka == kb


def test_blocklist_filter():
    out = blocklist_filter(
        _ds(), "url", ["example.com"], host_out_col="host"
    ).to_pandas()
    # the 3 example.com rows drop; null-host and other hosts survive
    assert len(out) == 4
    assert set(out["url"]) == {URLS[3], URLS[4], URLS[5], URLS[6]}
    assert "example.com" not in set(out["host"].dropna())


def test_blocklist_filter_empty_list_keeps_all():
    out = blocklist_filter(_ds(), "url", []).to_pandas()
    assert len(out) == len(URLS)


def test_path_of_array():
    from logdata_anomaly_miner_ray.functions.url import path_of_array

    got = path_of_array([
        "http://a.com/x/y?q=1", "https://B.org", "http://c.net/",
        "not a url", "http://d.io?q=2",
    ]).to_pylist()
    assert got == ["/x/y?q=1", "/", "/", None, "?q=2"]


def test_robots_filter_prefix_semantics():
    from logdata_anomaly_miner_ray.stages.webstats import robots_filter

    urls = [
        "http://ex.com/search?q=1",   # blocked: /search prefix
        "http://ex.com/searching",    # blocked: prefix match, robots-style
        "http://ex.com/about",        # kept
        "http://WWW.EX.com:80/search",  # blocked: host normalizes
        "http://other.com/search",    # kept: host differs
        "garbage url",                # kept: unparseable
        "https://ex.com",             # kept: path '/', not under /search
    ]
    df = pd.DataFrame({"url": urls,
                       "n_chars": np.arange(len(urls), dtype=np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(2)
    out = robots_filter(ds, "url", [("ex.com", "/search")]).to_pandas()
    assert sorted(out["url"]) == sorted([
        "http://ex.com/about", "http://other.com/search",
        "garbage url", "https://ex.com"])


def test_politeness_manifest_round_robin():
    from logdata_anomaly_miner_ray.stages.sampling import politeness_manifest

    urls = ([f"http://a.com/{i}" for i in range(3)]
            + [f"http://b.org/{i}" for i in range(2)]
            + ["bad url"])
    df = pd.DataFrame({"doc_id": np.arange(len(urls), dtype=np.int64),
                       "url": urls})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(2)
    out = politeness_manifest(ds, "url", "doc_id").to_pandas() \
        .sort_values("slot", ignore_index=True)
    # slots are a permutation 0..n-1
    assert out["slot"].tolist() == list(range(len(urls)))
    # round-robin: all seq-0 rows precede every seq-1 row, etc.
    assert out["seq"].is_monotonic_increasing
    # within one (seq) wave, hosts are in lexicographic order
    w0 = out[out["seq"] == 0]["host_key"].tolist()
    assert w0 == sorted(w0)
    # every host's seqs are 0..count-1
    for h, g in out.groupby("host_key"):
        assert sorted(g["seq"]) == list(range(len(g)))


def _host_cap_brute(df: pd.DataFrame, k: int) -> pd.DataFrame:
    hosts = host_of_array(pa.array(df["url"], pa.string())).to_pandas()
    t = pd.DataFrame({"host_key": hosts.fillna("(none)"),
                      "doc_id": df["doc_id"], "n_chars": df["n_chars"]})
    t = t.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                      kind="mergesort")
    t["host_rank"] = t.groupby("host_key", sort=False).cumcount() + 1
    return (t[t["host_rank"] <= k]
            .sort_values(["host_key", "host_rank"], ignore_index=True))


def test_host_cap_brute_force_and_layout_invariance():
    from logdata_anomaly_miner_ray.stages.webstats import host_cap

    rng = np.random.RandomState(7)
    n = 200
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "url": [f"http://site{i % 9}.org/p/{i}" if i % 11 else f"bad-{i}"
                for i in range(n)],
        # heavy ties to exercise the doc_id tiebreak
        "n_chars": rng.randint(0, 4, n).astype(np.int64),
    })
    want = _host_cap_brute(df, 3)
    for nblocks in (1, 7):
        ds = rd.from_pandas(df).repartition(nblocks)
        got = (host_cap(ds, "url", "doc_id", "n_chars", k=3).to_pandas()
               .sort_values(["host_key", "host_rank"], ignore_index=True))
        got["host_rank"] = got["host_rank"].astype(np.int64)
        pd.testing.assert_frame_equal(
            got[["host_key", "doc_id", "n_chars", "host_rank"]], want)


def test_host_cap_null_hosts_capped_as_one_family():
    from logdata_anomaly_miner_ray.stages.webstats import host_cap

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "url": ["junk"] * 5 + ["http://a.org/x"],
        "n_chars": np.array([5, 9, 9, 1, 3, 2], dtype=np.int64),
    })
    out = host_cap(rd.from_pandas(df).repartition(2), "url", "doc_id",
                   "n_chars", k=2).to_pandas()
    none = out[out["host_key"] == "(none)"]
    # ties on n_chars=9 break by doc_id asc: keep 1 then 2
    assert sorted(none["doc_id"].tolist()) == [1, 2]
    assert out[out["host_key"] == "a.org"]["doc_id"].tolist() == [5]


def _dedup_brute(df):
    from logdata_anomaly_miner_ray.functions.url import normalize_url_array

    df = df.copy()
    df["url_norm"] = np.asarray(normalize_url_array(df["url"].tolist()))
    df = df.sort_values(["ts_s", "doc_id"], ascending=[False, True],
                        kind="mergesort")
    g = df.groupby("url_norm", sort=True)
    out = g.first().reset_index()
    out["n_captures"] = g.size().to_numpy().astype(np.int64)
    return out[["url_norm", "doc_id", "ts_s", "n_captures"]]


def test_url_dedup_latest_brute_force():
    from logdata_anomaly_miner_ray.stages.webstats import url_dedup_latest

    rng = np.random.RandomState(7)
    n = 400
    ids = np.arange(n, dtype=np.int64)
    urls = [
        ["http://WWW.Example.COM:80/a", "https://example.com:443/a",
         "http://example.com/a", "HTTPS://Other.ORG/p",
         "not a url %d" % (i % 3), "http://example.com:8080/a"][i % 6]
        for i in range(n)
    ]
    ts = (ids * 37) % 50  # heavy ties -> doc_id tiebreak exercised
    df = pd.DataFrame({"doc_id": ids, "url": urls, "ts_s": ts})
    got = (url_dedup_latest(rd.from_pandas(df).repartition(5))
           .to_pandas()
           .sort_values("url_norm", ignore_index=True))
    exp = _dedup_brute(df).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["url_norm", "doc_id", "ts_s", "n_captures"]].astype(
            {"doc_id": np.int64, "ts_s": np.int64, "n_captures": np.int64}),
        exp.astype({"doc_id": np.int64, "ts_s": np.int64,
                    "n_captures": np.int64}))


def test_url_dedup_latest_partition_invariance():
    from logdata_anomaly_miner_ray.stages.webstats import url_dedup_latest

    ids = np.arange(120, dtype=np.int64)
    df = pd.DataFrame({
        "doc_id": ids,
        "url": ["http://site%d.org/p/%d" % (i % 4, i % 3) for i in ids],
        "ts_s": (ids * 13) % 40,
    })
    outs = []
    for nb in (1, 7):
        o = (url_dedup_latest(rd.from_pandas(df).repartition(nb))
             .to_pandas().sort_values("url_norm", ignore_index=True))
        outs.append(o[["url_norm", "doc_id", "ts_s", "n_captures"]])
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_robots_parse_group_semantics():
    from logdata_anomaly_miner_ray.stages.webstats import robots_parse

    body_a = (
        "Disallow: /early\n"          # before any group -> ignored
        "# full comment\n"
        "User-agent: googlebot\n"
        "Disallow: /gb\n"             # named group -> ignored
        "\n"
        "User-agent: bingbot\n"       # consecutive UAs = ONE group
        "User-agent: *\r\n"
        "Allow: /open\n"              # Allow -> no rule
        "Disallow: /p/1  # trailing\n"
        "Disallow:\n"                 # empty -> allow-all, no rule
        "Disallow: /q\n"
        "User-agent: other\n"         # new group after rules
        "Disallow: /hidden\n"
    )
    body_b = "User-agent: *\nDisallow: /x\nDisallow: /x\n"  # dup rule
    body_c = "User-agent: none\nDisallow: /y\n"             # no star
    df = pd.DataFrame({
        "host": ["a.org", "b.org", "c.org", "a.org"],
        "robots_txt": [body_a, body_b, body_c, body_b],  # a.org dup set
    })
    out = (robots_parse(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values(["host", "prefix"], ignore_index=True))
    got = list(map(tuple, out.itertuples(index=False)))
    assert got == [("a.org", "/p/1"), ("a.org", "/q"), ("a.org", "/x"),
                   ("b.org", "/x")]


def test_robots_parse_feeds_robots_filter():
    from logdata_anomaly_miner_ray.stages.webstats import (
        robots_filter,
        robots_parse,
    )

    robots = pd.DataFrame({
        "host": ["site.org"],
        "robots_txt": ["User-agent: *\nDisallow: /private\n"],
    })
    rules = [tuple(r) for r in robots_parse(rd.from_pandas(robots))
             .to_pandas().itertuples(index=False)]
    pages = pd.DataFrame({"url": [
        "http://site.org/private/x", "http://site.org/public",
        "http://other.org/private/x"]})
    kept = robots_filter(rd.from_pandas(pages), "url", rules).to_pandas()
    assert sorted(kept["url"]) == [
        "http://other.org/private/x", "http://site.org/public"]


def test_robots_parse_no_cross_document_group_leak():
    """A doc whose predecessor (in the same block) ended in a star
    group must still ignore its own pre-group rules."""
    from logdata_anomaly_miner_ray.stages.webstats import robots_parse

    df = pd.DataFrame({
        "host": ["a.org", "b.org"],
        "robots_txt": [
            "User-agent: *\nDisallow: /a\n",       # ends in star group
            "Disallow: /leak\nUser-agent: *\nDisallow: /b\n",
        ],
    })
    out = (robots_parse(rd.from_pandas(df).repartition(1))
           .to_pandas().sort_values(["host", "prefix"], ignore_index=True))
    got = list(map(tuple, out.itertuples(index=False)))
    assert got == [("a.org", "/a"), ("b.org", "/b")]


def test_registrable_domain_of_array():
    from logdata_anomaly_miner_ray.functions.url import (
        registrable_domain_of_array,
    )

    hosts = ["a.b.site.co.uk", "site.co.uk", "co.uk", "www.x.org",
             "org", None, "x.y.z.com"]
    got = registrable_domain_of_array(hosts, {"co.uk"}).to_pylist()
    assert got == ["site.co.uk", "site.co.uk", "co.uk", "x.org",
                   "org", None, "z.com"]


def test_domain_stats_counts():
    from logdata_anomaly_miner_ray.stages.webstats import domain_stats

    urls = ["http://a.site.co.uk/x", "http://b.site.co.uk/y",
            "https://site.co.uk/z", "http://other.org/", "garbage",
            "http://sub.other.org/q"]
    out = domain_stats(
        rd.from_pandas(pd.DataFrame({"url": urls})).repartition(3),
        "url", suffixes=("co.uk",))
    got = dict(zip(out["domain"], out["n_docs"]))
    assert got == {"site.co.uk": 3, "other.org": 2, "(none)": 1}
