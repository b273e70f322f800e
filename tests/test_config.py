"""Declarative YAML suite config: ConfigValidator-style validation +
CLI end-to-end from a config file."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from logdata_anomaly_miner_ray.config import (
    ConfigError,
    load_suite_yaml,
    to_suite_config,
    validate_suite_config,
)


def test_valid_config_normalizes():
    cfg = validate_suite_config(
        {
            "input": "/x",
            "out": "/y",
            "window_seconds": 300,
            "allowed_langs": ["en", "de"],
            "checks": {"entropy": {"prob_thresh": 0.02}, "ordering": {"enabled": False}},
        }
    )
    assert cfg["resume"] is True and cfg["ts_index"] is None
    sc = to_suite_config(cfg)
    assert sc.window_seconds == 300
    assert sc.checks["entropy"]["prob_thresh"] == 0.02


@pytest.mark.parametrize(
    "raw,needle",
    [
        ({"out": "/y"}, "config key 'input': required"),
        ({"input": "/x", "out": "/y", "window_seconds": "ten"}, "'window_seconds': expected int"),
        ({"input": "/x", "out": "/y", "window_seconds": -5}, "must be positive"),
        ({"input": "/x", "out": "/y", "bogus": 1}, "'bogus': unknown"),
        ({"input": "/x", "out": "/y", "checks": {"nosuch": {}}}, "'checks.nosuch': unknown check"),
        ({"input": "/x", "out": "/y", "checks": {"entropy": {"thresh": 1}}}, "'checks.entropy.thresh': unknown parameter"),
        ({"input": "/x", "out": "/y", "checks": {"entropy": {"prob_thresh": "hi"}}}, "'checks.entropy.prob_thresh': expected"),
        ({"input": "/x", "out": "/y", "allowed_langs": ["en", 3]}, "'allowed_langs[1]': expected str"),
        ([1, 2], "expected a mapping"),
    ],
)
def test_invalid_configs_rejected_with_key_path(raw, needle):
    with pytest.raises(ConfigError, match=".*"):
        try:
            validate_suite_config(raw)
        except ConfigError as ex:
            assert needle in str(ex), str(ex)
            raise


def test_yaml_parse_error_reported(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("input: [unclosed\n")
    with pytest.raises(ConfigError, match="YAML parse error"):
        load_suite_yaml(str(p))


@pytest.mark.slow
def test_cli_runs_full_suite_from_config(tmp_path):
    from logdata_anomaly_miner_ray.sources.pages import make_pages_block

    inp = tmp_path / "pages"
    inp.mkdir()
    pq.write_table(make_pages_block(0, 1500), str(inp / "p0.parquet"))
    out_dir = tmp_path / "out"
    cfg = tmp_path / "suite.yaml"
    cfg.write_text(
        f"""
input: {inp}
out: {out_dir}
window_seconds: 600
checks:
  entropy: {{prob_thresh: 0.05}}
  ordering: {{enabled: false}}
  referential: {{enabled: true}}
"""
    )
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    p = subprocess.run(
        [sys.executable, "-m", "logdata_anomaly_miner_ray",
         "--config", str(cfg), "--num-cpus", "4"],
        capture_output=True, text=True, timeout=280, cwd="/root/repo", env=env,
    )
    assert p.returncode in (0, 1), p.stderr[-2000:]
    report = json.loads(p.stdout.strip().splitlines()[-1])
    assert report["n_rows"] == 1500
    assert "uniqueness_url" in report["checks"]
    assert "ordering" not in report["checks"]  # disabled by config


def test_cli_rejects_invalid_config(tmp_path):
    cfg = tmp_path / "suite.yaml"
    cfg.write_text("input: /x\nout: /y\nchecks:\n  nosuch: {}\n")
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    p = subprocess.run(
        [sys.executable, "-m", "logdata_anomaly_miner_ray", "--config", str(cfg)],
        capture_output=True, text=True, timeout=120, cwd="/root/repo", env=env,
    )
    assert p.returncode == 2
    assert "checks.nosuch" in p.stderr
