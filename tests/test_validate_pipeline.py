

def test_fit_stop_no_novelty_cutoff(ray_session):
    """Windowed-novelty replay: novelty in the first 12 seconds, then
    pure repetition — learning must stop one horizon after the last
    novel window, and the state must cover exactly the windows before
    the deadline (stop_learning_no_anomaly_time recast)."""
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.pipelines.validate import fit_stop_no_novelty

    n = 60
    t0 = 1_700_000_000_000_000
    rows = {
        "url": [f"https://d{i % 7}.example.com/p/{i}" for i in range(n)],
        "warc_ts": pa.array([t0 + i * 1_000_000 for i in range(n)],
                            pa.timestamp("us")),
        "text": [(f"fresh word{i} token{i * 3}" if i < 12 else
                  "same same same") for i in range(n)],
        "lang": ["en" if i < 12 else "en" for i in range(n)],
    }
    pages = rd.from_arrow(pa.table(rows))
    state, cutoff = fit_stop_no_novelty(pages, None, 20.0, t0)
    # last novel window is [10s,15s) (rows 10,11) -> deadline 15+20=35
    assert cutoff == t0 + 35_000_000
    assert state["n_rows"] == 35  # rows with ts in [0s, 35s)
    assert state["lang_domain"] == ["en"]

    # all-novel data never stops early: deadline chases the tail
    rows2 = dict(rows)
    rows2["text"] = [f"unique word{i} tok{i * 7}" for i in range(n)]
    _, cutoff2 = fit_stop_no_novelty(rd.from_arrow(pa.table(rows2)), None, 20.0, t0)
    assert cutoff2 >= t0 + n * 1_000_000


def test_materialize_narrow_off_same_verdicts(ray_session):
    """SuiteConfig(materialize_narrow=False) trades the tens-of-TB
    narrow materialization for a re-derive read; verdicts must be
    identical either way."""
    import ray.data as rd

    from logdata_anomaly_miner_ray.pipelines.validate import run_suite
    from logdata_anomaly_miner_ray.schema import SuiteConfig
    from logdata_anomaly_miner_ray.sources.pages import make_pages_block

    pages = rd.from_arrow(make_pages_block(0, 1500))

    def verdict_map(out):
        t = out["verdicts"].to_pylist()
        return {r["check"]: (r["pass"], r["n_violations"]) for r in t}

    a = verdict_map(run_suite(pages, config=SuiteConfig()))
    b = verdict_map(run_suite(
        rd.from_arrow(make_pages_block(0, 1500)),
        config=SuiteConfig(materialize_narrow=False)))
    assert a == b
    assert "uniqueness_url" in a  # keyed check ran on BOTH paths


def test_meta_reduction_tiers_agree(ray_session, monkeypatch):
    """The meta reduction's driver-fold tier (partial rows under the
    bound) and the bounded composite-key groupby tier (the cluster-
    scale path) must yield identical verdicts on the same input."""
    import ray.data as rd

    import logdata_anomaly_miner_ray.pipelines.validate as V
    from logdata_anomaly_miner_ray.schema import SuiteConfig
    from logdata_anomaly_miner_ray.sources.pages import make_pages_block

    def verdict_map(out):
        t = out["verdicts"].to_pylist()
        return {(r["partition_id"], r["check"]): (r["pass"], r["n_violations"])
                for r in t}

    pages = rd.from_arrow(make_pages_block(0, 1500)).repartition(6)
    a = verdict_map(V.run_suite(pages, config=SuiteConfig()))
    monkeypatch.setattr(V, "META_DRIVER_FOLD_MAX", 0)  # force groupby tier
    b = verdict_map(V.run_suite(
        rd.from_arrow(make_pages_block(0, 1500)).repartition(6),
        config=SuiteConfig()))
    assert a == b
    assert any(k[1] == "frequency" for k in a)  # meta-derived checks present
    assert any(k[1] == "ordering" for k in a)
