"""Allowlist/blocklist mutation of a persisted constraint state —
the batch analogue of the reference's remote-control
allowlist_event/blocklist_event (aminer/analysis/ValueRangeDetector.py:
184-222: allowlist extends the learned constraints, blocklist adds to
the ignore list so those records are OMITTED from analysis)."""

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from logdata_anomaly_miner_ray.pipelines.validate import fit, validate
from logdata_anomaly_miner_ray.state.checkpoint import (
    load_state,
    patch_state,
    save_state,
)

T0 = 1_700_000_000_000_000


def _pages(urls, langs, texts):
    n = len(urls)
    return rd.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([T0 + i * 1_000_000 for i in range(n)],
                            pa.timestamp("us")),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }))


def _en_rows(n):
    urls = [f"https://en.example.com/p/{i}" for i in range(n)]
    texts = [f"the quick brown fox number {i} jumps over the lazy dog" for i in range(n)]
    return urls, ["en"] * n, texts


@pytest.fixture(scope="module")
def en_state(ray_session):
    urls, langs, texts = _en_rows(40)
    return fit(_pages(urls, langs, texts))


def test_patch_state_mutations(en_state):
    st = {k: (v.copy() if isinstance(v, (dict, list, np.ndarray)) else v)
          for k, v in en_state.items()}
    st["charsets"] = {k: v.copy() for k, v in en_state["charsets"].items()}

    assert st["lang_domain"] == ["en"]
    msgs = patch_state(st, allow=["lang:de", "token_range:en:1:500",
                                  "charset:en:äöü"])
    assert st["lang_domain"] == ["de", "en"]
    lo, hi = st["ranges"][("en",)]
    assert lo == 1 and hi >= 500
    for c in "äöü":
        assert st["charsets"]["en"][ord(c)]
    assert len(msgs) == 3

    patch_state(st, block=["lang:de"])
    assert "de" not in st["lang_domain"]
    assert st["ignore_langs"] == ["de"]
    # allowlisting again removes it from the ignore list (reference
    # semantics: allowlist removes from ignore_list, ValueRangeDetector.py:193)
    patch_state(st, allow=["lang:de"])
    assert st["ignore_langs"] == [] and "de" in st["lang_domain"]

    with pytest.raises(ValueError):
        patch_state(st, allow=["bogus:en"])
    with pytest.raises(ValueError):
        patch_state(st, block=["token_range:en:1:2"])  # only lang blockable
    with pytest.raises(ValueError):
        patch_state(st, allow=["charset:nosuchlang:abc"])


def _verdict_map(out):
    t = out["verdicts"].to_pylist()
    return {r["check"]: r["n_violations"] for r in t if r["partition_id"] == "all"}


def test_blocklist_omits_allowlist_analyzes(ray_session, en_state):
    """block lang:de → de rows OMITTED from every check (a duplicated
    de url no longer trips uniqueness); allow lang:de → de rows stay
    IN analysis (uniqueness still flags the dup) but the domain check
    accepts the lang."""
    import pickle

    urls, langs, texts = _en_rows(40)
    # 4 de rows, two sharing a url (uniqueness canary)
    urls += ["https://de.example.com/p/0", "https://de.example.com/p/1",
             "https://de.example.com/p/2", "https://de.example.com/p/2"]
    langs += ["de"] * 4
    texts += ["hallo welt nummer %d und so weiter" % i for i in range(4)]
    data = _pages(urls, langs, texts)

    def clone():
        return pickle.loads(pickle.dumps(en_state))

    base = _verdict_map(validate(data, clone()))
    assert base["lang_domain"] == 4
    assert base["uniqueness_url"] == 1

    st_allow = clone()
    patch_state(st_allow, allow=["lang:de"])
    va = _verdict_map(validate(data, st_allow))
    assert va["lang_domain"] == 0
    assert va["uniqueness_url"] == 1  # de rows still analyzed

    st_block = clone()
    patch_state(st_block, block=["lang:de"])
    vb = _verdict_map(validate(data, st_block))
    assert vb["lang_domain"] == 0
    assert vb["uniqueness_url"] == 0  # de rows omitted entirely


def test_cli_patch_and_show_state(tmp_path, en_state):
    """--patch-state / --show-state round trip through the CLI (these
    subcommands never touch Ray — they mutate the persisted file)."""
    path = str(tmp_path / "state.pkl")
    save_state(en_state, path)

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "logdata_anomaly_miner_ray", *extra],
            capture_output=True, text=True, timeout=120, cwd="/root/repo",
        )

    p = run("--patch-state", path, "--allow-value", "lang:fr",
            "--block-value", "lang:zh")
    assert p.returncode == 0, p.stderr[-2000:]
    rep = json.loads(p.stdout.strip().splitlines()[-1])
    assert any("fr" in m for m in rep["messages"])

    st = load_state(path)
    assert "fr" in st["lang_domain"] and st["ignore_langs"] == ["zh"]

    p = run("--show-state", path)
    assert p.returncode == 0, p.stderr[-2000:]
    summary = json.loads(p.stdout.strip().splitlines()[-1])
    assert summary["ignore_langs"] == ["zh"]
    assert "fr" in summary["lang_domain"]
    assert summary["n_rows"] == 40

    # bad spec → exit 2, error on stderr
    p = run("--patch-state", path, "--block-value", "charset:en:abc")
    assert p.returncode == 2
    assert "patch_error" in p.stderr
