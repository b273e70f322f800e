"""Sinks, scoring, implication rules."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_write_csv_projection(tmp_path):
    from logdata_anomaly_miner_ray.stages.sinks import write_csv_projection

    ds = rd.from_arrow(pa.table({"a": [1, 2], "b": ["x", "y"], "c": [0.1, 0.2]}))
    out = write_csv_projection(ds, ["a", "b"], str(tmp_path / "csv"))
    import glob

    files = glob.glob(out + "/*")
    assert files
    df = pd.concat([pd.read_csv(f) for f in files])
    assert sorted(df.columns) == ["a", "b"] and len(df) == 2


def test_score_violations():
    from logdata_anomaly_miner_ray.schema import violations_table
    from logdata_anomaly_miner_ray.stages.sinks import score_violations

    common = violations_table("Common", "m", [str(i) for i in range(99)], [], [[] for _ in range(99)], "")
    rare = violations_table("Rare", "m", ["r"], [], [[]], "")
    ds = rd.from_arrow(pa.concat_tables([common, rare]))
    scored = score_violations(ds).to_pandas()
    s_rare = scored[scored["event_type"] == "Analysis.Rare"]["confidence"].iloc[0]
    s_common = scored[scored["event_type"] == "Analysis.Common"]["confidence"].iloc[0]
    assert s_rare > s_common
    assert s_rare == pytest.approx(1.0)


def test_score_violations_weighted_fixed_and_auto():
    """ScoringEventHandler parity shapes: fixed weights (0.5 default)
    and auto-weights 10/(10+appearances), absolut + mean fields."""
    from logdata_anomaly_miner_ray.schema import violations_table
    from logdata_anomaly_miner_ray.stages.sinks import score_violations_weighted

    t = violations_table(
        "C", "m", ["k1", "k2"], ["p"], [["common", "rare"], ["common"]], ""
    )
    common_rows = violations_table(
        "C", "m", [str(i) for i in range(20)], ["p"], [["common"]] * 20, ""
    )
    ds = rd.from_arrow(pa.concat_tables([t, common_rows]))
    # fixed weights
    fixed = score_violations_weighted(ds, weights={"rare": 0.9}).to_pandas()
    two = fixed[fixed["key"] == "k1"].iloc[0]
    assert two["confidence_absolut"] == pytest.approx(0.5 + 0.9)
    assert two["confidence"] == pytest.approx((0.5 + 0.9) / 2)
    # auto weights: 'common' appears 22x → 10/32; 'rare' once → 10/11
    auto = score_violations_weighted(ds, auto_weights=True).to_pandas()
    two = auto[auto["key"] == "k1"].iloc[0]
    assert two["confidence_absolut"] == pytest.approx(10 / 32 + 10 / 11)
    one = auto[auto["key"] == "k2"].iloc[0]
    assert one["confidence"] == pytest.approx(10 / 32)


def test_render_event_text():
    from logdata_anomaly_miner_ray.stages.sinks import render_event_text

    txt = render_event_text(
        {
            "event_type": "Analysis.ValueRangeDetector",
            "message": "Value range anomaly detected",
            "key": "a",
            "affected_paths": ["id", "value"],
            "affected_values": ["a", "5.0"],
            "expected": '{"min": 2.5, "max": 4.75}',
        }
    )
    assert "Value range anomaly detected" in txt and "id: a" in txt


def test_implication_rules_binomial():
    from logdata_anomaly_miner_ray.stages.correlation import implication_rules

    support = pd.DataFrame(
        {
            "a_event": ["login", "login", "noise"],
            "b_event": ["session", "logout", "other"],
            "n_a": [100, 100, 5],
            "n_hit": [97, 60, 5],
        }
    )
    rules = implication_rules(support, p0=0.9, alpha=0.05)
    got = set(zip(rules["a_event"], rules["b_event"]))
    assert ("login", "session") in got       # 97/100 credibly >= 0.9
    assert ("login", "logout") not in got    # 60/100 fails
    assert ("noise", "other") not in got     # below min_support


def test_unix_socket_line_source(tmp_path):
    """UnixSocketLogDataResource + ByteStreamLineAtomizer recast:
    newline atomizing, overlong-line truncation + resync, EOF tail."""
    import socket
    import threading

    from logdata_anomaly_miner_ray.sources.streams import read_unix_socket_lines

    path = str(tmp_path / "ingest.sock")
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(path)
    srv.listen(1)
    big = b"X" * 150

    def feed():
        conn, _ = srv.accept()
        conn.sendall(b"alpha\nbeta\n" + big + b"\ngamma\ntail-no-newline")
        conn.close()

    t = threading.Thread(target=feed)
    t.start()
    ds = read_unix_socket_lines(path, batch_rows=3, max_line_bytes=100)
    t.join()
    srv.close()
    df = ds.to_pandas()
    assert [bytes(x) for x in df["line"]] == [
        b"alpha", b"beta", big[:100], b"gamma", b"tail-no-newline"
    ]
    assert df["truncated"].tolist() == [False, False, True, False, False]


def test_syslog_chunking_protocol():
    from logdata_anomaly_miner_ray.stages.sinks import syslog_chunk_lines

    text = "line-one\n" + "A" * 1700 + "\nlast"
    lines = syslog_chunk_lines(7, text, max_len=800)
    assert lines[0] == "[7] line-one"
    assert lines[1] == "[7-1] " + "A" * 800
    assert lines[2] == "[7-2] " + "A" * 800
    assert lines[3] == "[7-3] " + "A" * 100
    assert lines[4] == "[7-4] last"


def test_write_syslog_sink_file_and_socket(tmp_path):
    import socket

    from logdata_anomaly_miner_ray.schema import violations_table
    from logdata_anomaly_miner_ray.stages.sinks import write_syslog_sink

    t = violations_table("C", "m", ["k1", "k2"], ["p"], [["v1"], ["v2"]], "")
    ds = rd.from_arrow(t)
    # file transport
    log = str(tmp_path / "out.log")
    n = write_syslog_sink(ds, log, instance_name="test")
    lines = open(log).read().strip().split("\n")
    assert len(lines) == n and n >= 2
    assert lines[0].startswith("test: [0] ")
    # datagram-socket transport (what /dev/log is)
    spath = str(tmp_path / "dev-log")
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
    srv.bind(spath)
    srv.settimeout(5)
    n2 = write_syslog_sink(ds, spath, instance_name="test")
    got = [srv.recv(4096).decode() for _ in range(n2)]
    srv.close()
    assert sorted(got) == sorted(lines)


def test_render_event_json_shape(tmp_path):
    import json

    from logdata_anomaly_miner_ray.schema import violations_table
    from logdata_anomaly_miner_ray.stages.sinks import (
        render_event_json,
        write_json_events,
    )

    t = violations_table(
        "CharsetDetector", "bad char", ["k1"], ["/m/v"], [["#"]], '{"set": "abc"}'
    )
    row = t.to_pylist()[0]
    doc = json.loads(render_event_json(row, component_id=3, component_name="cs1"))
    ac = doc["AnalysisComponent"]
    assert ac["AnalysisComponentIdentifier"] == 3
    assert ac["AnalysisComponentType"] == "CharsetDetector"
    assert ac["AnalysisComponentName"] == "cs1"
    assert ac["AffectedLogAtomValues"] == [["#"]] or ac["AffectedLogAtomValues"] == ["#"]
    assert doc["LogData"]["RawLogData"] == ["k1"]
    # ndjson sink round-trips
    out = str(tmp_path / "json_events")
    n = write_json_events(rd.from_arrow(t), out)
    assert n == 1
