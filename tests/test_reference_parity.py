"""Parity oracles: drive the REFERENCE AMiner detector classes
(importable pure Python, driven exactly as its unit tests do —
aecid-testsuite/unit/analysis/*Test.py pattern) on the same inputs
as our Ray stages and assert identical learned state and verdicts.

No reference code is copied — the classes are imported read-only at
test time to act as behavioral oracles (SURVEY.md §5 strategy;
north rule: matching the reference's pass/fail and violation rows).
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

REF = "/root/reference/source/root/usr/lib/logdata-anomaly-miner"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)


@pytest.fixture(scope="module")
def aminer_env(tmp_path_factory):
    from aminer.AminerConfig import KEY_PERSISTENCE_DIR
    from aminer.events.EventInterfaces import EventHandlerInterface

    pdir = str(tmp_path_factory.mktemp("aminer_persist"))

    class FakeConfig:
        config_properties = {KEY_PERSISTENCE_DIR: pdir}

    class Recorder(EventHandlerInterface):
        def __init__(self):
            self.events = []

        def receive_event(self, event_type, event_message, sorted_loglines, event_data, log_atom, event_source):
            self.events.append((event_type, event_message, event_data))

    return FakeConfig, Recorder


def _atom(path_values: dict, t: float):
    """Build a LogAtom with one MatchElement per (path, value) —
    the reference unit-test fixture pattern
    (ValueRangeDetectorTest.py:35-60)."""
    from aminer.input.LogAtom import LogAtom
    from aminer.parsing.MatchElement import MatchElement
    from aminer.parsing.ParserMatch import ParserMatch

    children = [
        MatchElement(p, str(v).encode(), v, None) for p, v in path_values.items()
    ]
    raw = "".join(str(v) for v in path_values.values()).encode()
    root = MatchElement("/model", raw, raw, children)
    return LogAtom(raw, ParserMatch(root), t, None)


def test_value_range_parity(aminer_env):
    """FIXTURES.md vr_ranges: same learn sequence → same ranges and
    same per-probe verdicts as the reference ValueRangeDetector."""
    FakeConfig, Recorder = aminer_env
    from aminer.analysis.ValueRangeDetector import ValueRangeDetector

    rec = Recorder()
    vrd = ValueRangeDetector(
        FakeConfig(), [rec], id_path_list=["/m/id"], target_path_list=["/m/value"],
        learn_mode=True, persistence_id="vr_parity",
    )
    learn_seq = [("a", 2.5), ("b", 5.0), ("a", 4.75), ("b", 6.3), ("a", 4.25), ("b", 3.1)]
    t0 = 1700000000.0
    for i, (k, v) in enumerate(learn_seq):
        vrd.receive_atom(_atom({"/m/id": k, "/m/value": v}, t0 + i))
    vrd.learn_mode = False
    probes = [("a", 5.0), ("a", 3.0), ("b", 3.0), ("b", 6.3)]
    n_before = len(rec.events)
    ref_flags = []
    for k, v in probes:
        vrd.receive_atom(_atom({"/m/id": k, "/m/value": v}, t0 + 100))
        ref_flags.append(len(rec.events) > n_before)
        n_before = len(rec.events)

    # ours: fit on the same rows, validate the same probes
    from logdata_anomaly_miner_ray.stages.value_range import (
        fit_ranges,
        range_violations,
        ranges_to_dict,
    )

    fit_t = pa.table(
        {"id": [k for k, _ in learn_seq], "value": [v for _, v in learn_seq]}
    )
    rdict = ranges_to_dict(
        pa.Table.from_pandas(fit_ranges(rd.from_arrow(fit_t), ["id"], "value").to_pandas()),
        ["id"],
    )
    assert rdict == {("a",): (2.5, 4.75), ("b",): (3.1, 6.3)}
    assert rdict[("a",)] == (vrd.ranges["min"][("a",)], vrd.ranges["max"][("a",)])
    assert rdict[("b",)] == (vrd.ranges["min"][("b",)], vrd.ranges["max"][("b",)])

    probe_t = pa.table({"id": [k for k, _ in probes], "value": [v for _, v in probes]})
    viol = range_violations(rd.from_arrow(probe_t), ["id"], "value", ray.put(rdict)).to_pandas()
    our_flagged = {(r["key"], float(r["affected_values"][0])) for _, r in viol.iterrows()}
    ref_flagged = {(k, v) for (k, v), f in zip(probes, ref_flags) if f}
    assert our_flagged == ref_flagged == {("a", 5.0), ("b", 3.0)}


def test_charset_parity(aminer_env):
    """FIXTURES.md charset: learned charsets equal; '#' probe flags
    identically."""
    FakeConfig, Recorder = aminer_env
    from aminer.analysis.CharsetDetector import CharsetDetector

    rec = Recorder()
    cd = CharsetDetector(
        FakeConfig(), [rec], id_path_list=["/m/id"], target_path_list=["/m/value"],
        learn_mode=True, persistence_id="cs_parity",
    )
    learn = [("g", "abc"), ("g", "abd"), ("g", "xyz")]
    t0 = 1700000000.0
    for i, (k, v) in enumerate(learn):
        cd.receive_atom(_atom({"/m/id": k, "/m/value": v}, t0 + i))
    cd.learn_mode = False
    probes = [("g", "abz"), ("g", "ab#")]
    flags = []
    n = len(rec.events)
    for k, v in probes:
        cd.receive_atom(_atom({"/m/id": k, "/m/value": v}, t0 + 50))
        flags.append(len(rec.events) > n)
        n = len(rec.events)

    from logdata_anomaly_miner_ray.stages.charset import charset_violations, fit_charsets

    fit_t = pa.table({"id": [k for k, _ in learn], "value": [v for _, v in learn]})
    cs = fit_charsets(rd.from_arrow(fit_t), "id", "value")
    ref_charset = {bytes([b]).decode() for b in cd.charsets[("g",)]}
    our_charset = {chr(c) for c in np.flatnonzero(cs["g"])}
    assert our_charset == ref_charset == set("abcdxyz")
    probe_t = pa.table({"id": [k for k, _ in probes], "value": [v for _, v in probes]})
    viol = charset_violations(rd.from_arrow(probe_t), "id", "value", ray.put(cs)).to_pandas()
    assert len(viol) == sum(flags) == 1
    assert viol["affected_values"].iloc[0] == ["#"]


def test_new_value_parity(aminer_env):
    """NewMatchPathValueDetector: learned value set equals our
    distinct set; unseen-value probes flag identically."""
    FakeConfig, Recorder = aminer_env
    from aminer.analysis.NewMatchPathValueDetector import NewMatchPathValueDetector

    rec = Recorder()
    nmv = NewMatchPathValueDetector(
        FakeConfig(), ["/m/lang"], [rec], learn_mode=True, persistence_id="nv_parity"
    )
    learn_vals = ["en", "de", "fr", "en", "de"]
    t0 = 1700000000.0
    for i, v in enumerate(learn_vals):
        nmv.receive_atom(_atom({"/m/lang": v}, t0 + i))
    nmv.learn_mode = False
    probes = ["en", "xx", "es"]
    flags = []
    n = len(rec.events)
    for v in probes:
        nmv.receive_atom(_atom({"/m/lang": v}, t0 + 50))
        flags.append(len(rec.events) > n)
        n = len(rec.events)

    import ray as _ray

    from logdata_anomaly_miner_ray.stages.domain import distinct_values, domain_violations

    fit_ds = rd.from_arrow(pa.table({"lang": learn_vals}))
    ours = sorted(r["lang"] for r in distinct_values(fit_ds, ["lang"]).take_all())
    refs = sorted(v.decode() if isinstance(v, bytes) else str(v) for v in nmv.known_values_set)
    assert ours == refs == ["de", "en", "fr"]
    probe_ds = rd.from_arrow(pa.table({"lang": probes}))
    viol = domain_violations(probe_ds, "lang", _ray.put(ours)).to_pandas()
    our_flagged = sorted(v[0] for v in viol["affected_values"])
    ref_flagged = sorted(v for v, f in zip(probes, flags) if f)
    assert our_flagged == ref_flagged == ["es", "xx"]


def test_unsorted_timestamps_parity(aminer_env):
    """TimestampsUnsortedDetector: same per-row anomaly flags as our
    inversion counting over the same sequence."""
    FakeConfig, Recorder = aminer_env
    from aminer.analysis.TimestampsUnsortedDetector import TimestampsUnsortedDetector

    rec = Recorder()
    tud = TimestampsUnsortedDetector(FakeConfig(), [rec])
    ts_seq = [10.0, 20.0, 15.0, 30.0, 25.0, 40.0]
    for i, t in enumerate(ts_seq):
        tud.receive_atom(_atom({"/m/x": i}, t))
    ref_n = len(rec.events)

    from logdata_anomaly_miner_ray.stages.ordering import inversion_counts

    t = pa.table(
        {
            "k": ["s"] * len(ts_seq),
            "seq": list(range(len(ts_seq))),
            "ts": pa.array([int(x * 1e6) for x in ts_seq], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    inv = inversion_counts(rd.from_arrow(t), ["k"], "seq", "ts").to_pandas()
    assert int(inv["n_inversions"].iloc[0]) == ref_n == 2
