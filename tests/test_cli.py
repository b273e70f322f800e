"""CLI end-to-end (subprocess: the CLI owns its own Ray session)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    from logdata_anomaly_miner_ray.sources.pages import make_pages_block

    inp = tmp_path / "pages"
    inp.mkdir()
    pq.write_table(make_pages_block(0, 2000), str(inp / "p0.parquet"))
    pq.write_table(make_pages_block(2000, 2000), str(inp / "p1.parquet"))
    out_dir = tmp_path / "out"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    p = subprocess.run(
        [
            sys.executable,
            "-m",
            "logdata_anomaly_miner_ray",
            "--input",
            str(inp),
            "--out",
            str(out_dir),
            "--num-cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=280,
        cwd="/root/repo",
        env=env,
    )
    assert p.returncode in (0, 1), p.stderr[-2000:]
    report = json.loads(p.stdout.strip().splitlines()[-1])
    assert report["n_rows"] == 4000
    assert "uniqueness_url" in report["checks"]
    assert (out_dir / "manifest.json").exists()
    assert (out_dir / "verdicts.parquet").exists()
    v = pq.read_table(str(out_dir / "verdicts.parquet")).to_pandas()
    assert (v[v.partition_id == "all"]["check"] == "text_byte_identity").any()
    # per-partition verdicts present (one per input file)
    assert set(v[v.partition_id != "all"]["partition_id"]) == {"p0.parquet", "p1.parquet"}


@pytest.mark.slow
def test_cli_learn_then_detect(tmp_path):
    """AMiner learn-mode lifecycle: fit-only persists the constraint
    state; detect-mode validates against the FROZEN state — same
    verdicts as a combined run on the same input, and the persisted
    byte-identity evidence flags when the data changes."""
    from logdata_anomaly_miner_ray.sources.pages import make_pages_block

    inp = tmp_path / "pages"
    inp.mkdir()
    pq.write_table(make_pages_block(0, 1500), str(inp / "p0.parquet"))
    state_file = tmp_path / "state.pkl"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    def run(*extra):
        p = subprocess.run(
            [sys.executable, "-m", "logdata_anomaly_miner_ray",
             "--input", str(inp), "--num-cpus", "4", *extra],
            capture_output=True, text=True, timeout=280, cwd="/root/repo", env=env,
        )
        assert p.returncode in (0, 1), p.stderr[-2000:]
        return json.loads(p.stdout.strip().splitlines()[-1])

    rep_fit = run("--fit-only", "--save-state", str(state_file))
    assert rep_fit["fit_only"] and state_file.exists()

    out_combined = tmp_path / "out_combined"
    rep_c = run("--out", str(out_combined))
    out_frozen = tmp_path / "out_frozen"
    rep_f = run("--out", str(out_frozen), "--state", str(state_file))
    assert rep_f["checks"] == rep_c["checks"]  # frozen == refit on same data

    # changed data under the frozen state → byte-identity flags
    pq.write_table(make_pages_block(9000, 1500), str(inp / "p0.parquet"))
    out_changed = tmp_path / "out_changed"
    rep_x = run("--out", str(out_changed), "--state", str(state_file))
    assert rep_x["checks"]["text_byte_identity"]["pass"] is False


def test_cli_stop_learning_rows_equivalence(tmp_path):
    """--stop-learning-rows N must equal the explicit two-phase run:
    fit-only on the N-row prefix, then detect-mode on the full input
    with the frozen state (reference stop_learning_time semantics:
    learning freezes, validation continues)."""
    from logdata_anomaly_miner_ray.sources.pages import make_pages_block

    full = make_pages_block(0, 1200)
    inp = tmp_path / "pages"
    inp.mkdir()
    pq.write_table(full, str(inp / "p0.parquet"))
    prefix_dir = tmp_path / "prefix"
    prefix_dir.mkdir()
    pq.write_table(full.slice(0, 800), str(prefix_dir / "p0.parquet"))
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    def run(*extra):
        p = subprocess.run(
            [sys.executable, "-m", "logdata_anomaly_miner_ray",
             "--num-cpus", "4", *extra],
            capture_output=True, text=True, timeout=280, cwd="/root/repo", env=env,
        )
        assert p.returncode in (0, 1), p.stderr[-2000:]
        return json.loads(p.stdout.strip().splitlines()[-1])

    out_a = tmp_path / "out_a"
    rep_a = run("--input", str(inp), "--out", str(out_a),
                "--stop-learning-rows", "800")
    assert rep_a["stop_learning"] == {"mode": "rows", "limit": 800}

    state_file = tmp_path / "state.pkl"
    rep_fit = run("--input", str(prefix_dir), "--fit-only",
                  "--save-state", str(state_file))
    assert rep_fit["fit_only"] and rep_fit["n_rows"] == 800
    out_b = tmp_path / "out_b"
    rep_b = run("--input", str(inp), "--out", str(out_b),
                "--state", str(state_file))
    # identical verdicts except byte-identity (the frozen state pins
    # the PREFIX sha; the one-shot run never froze a sha to compare)
    ka = {k: v for k, v in rep_a["checks"].items() if k != "text_byte_identity"}
    kb = {k: v for k, v in rep_b["checks"].items() if k != "text_byte_identity"}
    assert ka == kb
    # the suffix adds rows beyond the frozen constraints: at least one
    # check must actually flag violations, or the test proves nothing
    assert any(v["n_violations"] > 0 for v in ka.values())
