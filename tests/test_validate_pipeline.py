

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


def test_resume_after_midrun_crash_byte_identical(ray_session, tmp_path, monkeypatch):
    """Checkpoint/resume drill, CI scale (SURVEY §7.2 M8): a run that
    dies AFTER a check's violation parquet is written but BEFORE its
    manifest entry lands (the documented crash window,
    pipelines/validate.py run_check) must, on resume, redo exactly
    the unmarked checks and produce outputs identical to an
    uninterrupted run — same violation rows per check, same verdicts,
    same per-run text_sha256_xor byte-identity proof."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data as rd

    from logdata_anomaly_miner_ray.pipelines import validate as V
    from logdata_anomaly_miner_ray.sources.pages import make_pages_block, ts_index_block

    pages_tab = make_pages_block(0, 4000)
    ts_tab = ts_index_block(0, 4000)

    def clean_outputs(out_dir):
        checks = sorted(d for d in os.listdir(out_dir) if d.startswith("check="))
        rows = {}
        for c in checks:
            try:
                t = pads.dataset(os.path.join(out_dir, c)).to_table()
                rows[c] = sorted(json.dumps(r, default=str, sort_keys=True)
                                 for r in t.to_pylist())
            except FileNotFoundError:
                rows[c] = []
        return rows

    def verdict_map(out):
        return {
            r["check"]: (r["pass"], r["n_violations"], r["text_sha256_xor"])
            for r in out["verdicts"].to_pylist()
        }

    # uninterrupted reference run
    out_a = str(tmp_path / "a")
    a = V.run_suite(rd.from_arrow(pages_tab), ts_index=rd.from_arrow(ts_tab),
                    out_dir=out_a)

    # crashed run: die inside mark_done('frequency') — parquet
    # written, manifest not updated (frequency runs after the keyed
    # thread is joined, so the crash is deterministic)
    out_b = str(tmp_path / "b")
    orig_mark = V.CheckpointManifest.mark_done

    def exploding_mark(self, name, **kw):
        if name == "frequency":
            raise RuntimeError("simulated mid-run kill")
        return orig_mark(self, name, **kw)

    monkeypatch.setattr(V.CheckpointManifest, "mark_done", exploding_mark)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated mid-run kill"):
        V.run_suite(rd.from_arrow(pages_tab), ts_index=rd.from_arrow(ts_tab),
                    out_dir=out_b)
    monkeypatch.setattr(V.CheckpointManifest, "mark_done", orig_mark)

    # some checks must already be checkpointed, frequency must not
    mani = V.CheckpointManifest(out_b)
    assert mani.is_done("broadcast_checks") or mani.is_done("uniqueness_url")
    assert not mani.is_done("frequency")

    # resume: completed checks are skipped (their maker never runs),
    # the unmarked tail is redone
    ran: list[str] = []
    orig_mark2 = V.CheckpointManifest.mark_done

    def recording_mark(self, name, **kw):
        ran.append(name)
        return orig_mark2(self, name, **kw)

    monkeypatch.setattr(V.CheckpointManifest, "mark_done", recording_mark)
    b = V.run_suite(rd.from_arrow(pages_tab), ts_index=rd.from_arrow(ts_tab),
                    out_dir=out_b)
    assert "frequency" in ran
    assert "broadcast_checks" not in ran and "uniqueness_url" not in ran

    # byte-identical outputs: violation rows per check, verdict
    # pass/fail + counts, and the xor-of-sha256 text identity proof
    assert clean_outputs(out_a) == clean_outputs(out_b)
    assert verdict_map(a) == verdict_map(b)


def test_extraction_faithfulness_check(ray_session):
    """Opt-in north-star check: text must equal extract(html)
    byte-identically per row. One corrupted row -> exactly one
    violation naming its url; clean corpus -> pass with 0; the check
    never runs unless enabled (it re-reads the pruned html column)."""
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.pipelines.validate import run_suite
    from logdata_anomaly_miner_ray.schema import SuiteConfig
    from logdata_anomaly_miner_ray.sources.pages import make_pages_block

    def verdicts(out):
        return {r["check"]: (r["pass"], r["n_violations"])
                for r in out["verdicts"].to_pylist()}

    t = make_pages_block(0, 800)
    cfg = SuiteConfig(checks={"extraction": {"enabled": True}})
    clean = verdicts(run_suite(rd.from_arrow(t), config=cfg))
    assert clean["extraction_faithful"] == (True, 0)

    # corrupt row 5's text (html untouched)
    texts = t["text"].to_pylist()
    texts[5] = texts[5] + " TAMPERED"
    bad_t = t.set_column(
        t.schema.get_field_index("text"), "text",
        pa.array(texts, pa.string()))
    out = run_suite(rd.from_arrow(bad_t), config=cfg)
    v = verdicts(out)
    assert v["extraction_faithful"] == (False, 1)
    viol = out["violations"]["extraction_faithful"].to_pandas()
    assert list(viol["url"]) == [t["url"][5].as_py()]

    # disabled by default: the check row must be absent entirely
    off = verdicts(run_suite(rd.from_arrow(bad_t), config=SuiteConfig()))
    assert "extraction_faithful" not in off
