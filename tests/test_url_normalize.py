"""normalize_url_array vs a readable per-case brute force.

Pure-Arrow kernel, no Ray needed. Covers every rule in the module
docstring plus pass-through of unparseable strings and nulls."""

from __future__ import annotations

import pyarrow as pa

from logdata_anomaly_miner_ray.functions.url import normalize_url_array


CASES = [
    # (raw, canonical)
    ("http://example.com/path", "http://example.com/path"),
    ("HTTP://WWW.Example.COM:80/Path?b=2&utm_source=x&a=1#frag",
     "http://example.com/Path?b=2&a=1"),
    ("https://Site.ORG:443/", "https://site.org"),
    ("https://site.org:8443/x", "https://site.org:8443/x"),
    ("http://a.com:443/x", "http://a.com:443/x"),  # 443 not http default
    ("http://a.com/?utm_a=1", "http://a.com"),     # query AND slash drop
    ("http://a.com?utm_a=1&b=2", "http://a.com?b=2"),
    ("http://a.com?utm_a=1&utm_b=2", "http://a.com"),
    ("http://a.com?a=1&utm_x=2&b=3#f", "http://a.com?a=1&b=3"),
    ("ftp://X.com/", "ftp://x.com"),               # scheme-agnostic rules
    ("http://wwwx.com/", "http://wwwx.com"),       # 'www.' only, not 'www'
    ("nonsense string #frag", "nonsense string "),  # steps 1-2 only
    ("", ""),
]


def test_url_normalize_cases():
    got = normalize_url_array([c[0] for c in CASES]).to_pylist()
    for (raw, want), g in zip(CASES, got):
        assert g == want, (raw, g, want)


def test_url_normalize_idempotent_and_null_safe():
    raws = [c[0] for c in CASES]
    once = normalize_url_array(raws)
    twice = normalize_url_array(once)
    assert once.to_pylist() == twice.to_pylist()
    arr = pa.array(["http://A.com/", None], pa.string())
    assert normalize_url_array(arr).to_pylist() == ["http://a.com", None]
