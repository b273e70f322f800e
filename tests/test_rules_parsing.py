"""Rule engine and parsing-model kernels."""

import numpy as np
import pyarrow as pa
import pytest

from logdata_anomaly_miner_ray.functions import parsing as P
from logdata_anomaly_miner_ray.functions.rules import (
    AndRule,
    IPv4InRFC1918Rule,
    ModuloTimeRule,
    NotRule,
    OrRule,
    PathExistsRule,
    StringRegexRule,
    ValueListRule,
    ValueMatchRule,
    ValueRangeRule,
    allowlist_violations_mask,
)

BATCH = pa.table(
    {
        "ev": ["click", "error", "view", "click", None],
        "v": [10.0, 200.0, 50.0, -5.0, 30.0],
        "msg": ["ok fine", "fatal crash", "ok again", "warn", "x"],
        "ts": pa.array(
            [0, 7_200_000_000, 43_200_000_000, 86_400_000_000, 90_000_000_000],
            pa.int64(),
        ).cast(pa.timestamp("us")),
        "ip": pa.array(
            [0x0A000001, 0x08080808, 0xC0A80101, 0x01020304, 0xAC100001], pa.int64()
        ),
    }
)


def test_value_and_range_rules():
    assert ValueMatchRule("ev", "click").evaluate(BATCH).to_pylist() == [
        True, False, False, True, False,
    ]
    assert ValueRangeRule("v", 0, 100).evaluate(BATCH).to_pylist() == [
        True, False, True, False, True,
    ]
    assert ValueListRule("ev", ["click", "view"]).evaluate(BATCH).to_pylist() == [
        True, False, True, True, False,
    ]


def test_boolean_combinators():
    r = AndRule([ValueListRule("ev", ["click"]), ValueRangeRule("v", 0, 100)])
    assert r.evaluate(BATCH).to_pylist() == [True, False, False, False, False]
    r2 = OrRule([ValueMatchRule("ev", "error"), ValueRangeRule("v", -10, 0)])
    assert r2.evaluate(BATCH).to_pylist() == [False, True, False, True, False]
    assert NotRule(r2).evaluate(BATCH).to_pylist() == [True, False, True, False, True]
    # operator sugar
    assert (ValueMatchRule("ev", "click") & ValueRangeRule("v", 0, 100)).evaluate(
        BATCH
    ).to_pylist() == [True, False, False, False, False]


def test_regex_modulo_ip_rules():
    assert StringRegexRule("msg", r"^ok").evaluate(BATCH).to_pylist() == [
        True, False, True, False, False,
    ]
    # hour-of-day bucket: 01:00-03:00
    m = ModuloTimeRule("ts", 86400, 3600, 10800).evaluate(BATCH).to_pylist()
    assert m == [False, True, False, False, True]
    assert IPv4InRFC1918Rule("ip").evaluate(BATCH).to_pylist() == [
        True, False, True, False, True,
    ]
    assert PathExistsRule("ev").evaluate(BATCH).to_pylist() == [
        True, True, True, True, False,
    ]
    assert PathExistsRule("missing").evaluate(BATCH).to_pylist() == [False] * 5


def test_allowlist_mask():
    allow = [ValueListRule("ev", ["click", "view"]), ValueRangeRule("v", 0, 100)]
    mask = allowlist_violations_mask(BATCH, allow)
    # violating rows: error/200 (no rule matches)
    assert mask.to_pylist() == [False, True, False, False, False]


def test_modulo_time_inclusive_bounds_and_fraction():
    from logdata_anomaly_miner_ray.functions.rules import ModuloTimeRule

    # v = secs-in-day with fractions kept; BOTH bounds inclusive
    # (reference Rules.py:668: lower <= v <= upper on the float epoch)
    b = pa.table({"ts": pa.array(
        [3_600_000_000, 10_800_000_000, 10_800_000_001, 3_599_999_999, None],
        pa.int64()).cast(pa.timestamp("us"))})
    m = ModuloTimeRule("ts", 86400, 3600, 10800).evaluate(b).to_pylist()
    assert m == [True, True, False, False, False]
    # tz offset shifts the epoch before the modulo
    m2 = ModuloTimeRule("ts", 86400, 3600, 10800, tz_offset_s=7200) \
        .evaluate(b).to_pylist()
    assert m2 == [True, False, False, True, False]


def test_value_dependent_delegated_rule():
    from logdata_anomaly_miner_ray.functions.rules import (
        ValueDependentDelegatedRule,
    )

    b = pa.table({
        "k1": ["x", "x", None, "y", None, "z"],
        "k2": ["p", None, "p", "q", None, "q"],
        "v": [1.0, 50.0, 5.0, 200.0, 3.0, 7.0],
    })
    r = ValueDependentDelegatedRule(
        ["k1", "k2"],
        {
            ("x", "p"): ValueRangeRule("v", 0, 10),    # row0 T
            ("x",): ValueRangeRule("v", 40, 60),       # row1 (k2 null) T
            ("p",): ValueRangeRule("v", 0, 1),         # row2 (k1 null) F
            ("y", "q"): ValueRangeRule("v", 0, 100),   # row3 F
        },
        default_rule=ValueRangeRule("v", 0, 4),        # row4 T, row5 F
    )
    assert r.evaluate(b).to_pylist() == [True, True, False, False, True, False]
    # no default: unmatched keys are False
    r2 = ValueDependentDelegatedRule(
        ["k1"], {("z",): ValueRangeRule("v", 0, 10)})
    assert r2.evaluate(b).to_pylist() == [False] * 5 + [True]
    with pytest.raises(TypeError):
        ValueDependentDelegatedRule(["k1"], {"notuple": r2})


def test_value_dependent_modulo_time_rule():
    from logdata_anomaly_miner_ray.functions.rules import (
        ValueDependentModuloTimeRule,
    )

    day = 86_400_000_000
    b = pa.table({
        "ts": pa.array(
            [5_000_000_000, 5_000_000_000, day + 5_000_000_000,
             50_000_000_000, None],
            pa.int64()).cast(pa.timestamp("us")),
        "host": ["a", "b", "zz", None, "a"],
    })
    r = ValueDependentModuloTimeRule(
        "ts", 86400, ["host"],
        {"a": (1000, 6000), "b": (6000, 7000)},
        default_limit=(40000, 86400),
    )
    # a@5000s T; b@5000s F; unknown host zz → default (5000 not in
    # [40000,86400]) F; null host → default, 50000s in window T; null ts F
    assert r.evaluate(b).to_pylist() == [True, False, False, True, False]
    # no default: lookup miss → no match
    r2 = ValueDependentModuloTimeRule(
        "ts", 86400, ["host"], {"a": (1000, 6000)})
    assert r2.evaluate(b).to_pylist() == [True, False, False, False, False]
    with pytest.raises(ValueError):
        ValueDependentModuloTimeRule("ts", 86400, ["host"],
                                     {"a": (5, 90000)})  # hi > modulo


def test_parallel_rule_and_match_actions():
    from logdata_anomaly_miner_ray.functions.rules import (
        ActionRule,
        CollectingMatchAction,
        ParallelRule,
    )

    a1 = CollectingMatchAction("E1", "first")
    a2 = CollectingMatchAction("E2", "second")
    both = CollectingMatchAction("E", "union")
    r = ParallelRule(
        [ActionRule(ValueMatchRule("ev", "click"), a1),
         ActionRule(ValueRangeRule("v", 100, 300), a2)],
        action=both,
    )
    m = r.evaluate(BATCH).to_pylist()
    assert m == [True, True, False, True, False]
    # ALL children evaluated → every child action fired on its rows
    assert len(a1.collected) == 1 and len(a2.collected) == 1
    assert a1.collected[0][2]["ev"].to_pylist() == ["click", "click"]
    assert a2.collected[0][0] == "E2"
    assert a2.collected[0][2]["v"].to_pylist() == [200.0]
    assert both.collected[0][2].num_rows == 3
    with pytest.raises(ValueError):
        ParallelRule([ValueMatchRule("ev", "x")])


def test_atom_filter_match_action_stop_when_handled():
    from logdata_anomaly_miner_ray.functions.rules import (
        ActionRule,
        AtomFilterMatchAction,
    )

    seen = []
    act = AtomFilterMatchAction(
        [lambda t: seen.append(("h1", t.num_rows)) or True,
         lambda t: seen.append(("h2", t.num_rows))],
        stop_when_handled=True,
    )
    ActionRule(ValueMatchRule("ev", "click"), act).evaluate(BATCH)
    assert seen == [("h1", 2)]  # second handler never ran


def test_json_extract():
    col = pa.array(['{"a": {"b": 3}, "k": 7}', '{"k": "x"}', "not json", None])
    out = P.json_extract(col, {"k": pa.int64(), "a.b": pa.int64()})
    assert out["k"].to_pylist() == [7, None, None, None]
    assert out["a_b"].to_pylist() == [3, None, None, None]
    assert out["parse_ok"].to_pylist() == [True, True, False, False]


def test_parse_datetime_int_float():
    dt = P.parse_datetime(pa.array(["2024-01-02 03:04:05", "garbage"]))
    assert dt[0].as_py().isoformat() == "2024-01-02T03:04:05"
    assert dt[1].as_py() is None
    assert P.parse_int(pa.array(["42", "-7", "x", "3.5"])).to_pylist() == [42, -7, None, None]
    f = P.parse_float(pa.array(["3.5", "-2e3", "abc"]))
    assert f.to_pylist()[:2] == [3.5, -2000.0] and f[2].as_py() is None


def test_parse_hex_and_base64():
    hx = P.parse_hex(pa.array(["deadbeef", "abc", "xyz", None, "0A"]))
    assert hx.to_pylist() == [b"\xde\xad\xbe\xef", b"\x0a\xbc", None, None, None]
    hxu = P.parse_hex(pa.array(["0A", "0a"]), upper_case=True)
    assert hxu.to_pylist() == [b"\x0a", None]
    import base64

    good = base64.b64encode(b"hello world!").decode()
    b6 = P.parse_base64(pa.array([good, "not-base64!", "QQ==", None, ""]))
    assert b6.to_pylist() == [b"hello world!", None, b"A", None, None]


def test_parse_ipv4_and_wordlist():
    ip = P.parse_ipv4(pa.array(["10.0.0.1", "256.1.1.1", "1.2.3.4", "nope"]))
    assert ip.to_pylist() == [0x0A000001, None, 0x01020304, None]
    idx = P.fixed_wordlist_index(pa.array(["b", "a", "z"]), ["a", "b"])
    assert idx.to_pylist() == [1, 0, None]


def test_xml_extract():
    col = pa.array(
        [
            '<doc id="7"><title>hello</title><meta><lang>en</lang></meta></doc>',
            "<doc><title>t2</title></doc>",
            "not xml <",
            None,
        ]
    )
    out = P.xml_extract(
        col, {"title": pa.string(), "meta/lang": pa.string(), "@id": pa.int64()}
    )
    assert out["title"].to_pylist() == ["hello", "t2", None, None]
    assert out["meta_lang"].to_pylist() == ["en", None, None, None]
    assert out["id"].to_pylist() == [7, None, None, None]
    assert out["parse_ok"].to_pylist() == [True, True, False, False]


def test_parse_datetime_multi():
    col = pa.array(["2024-01-02 03:04:05", "02/01/2024 03:04", "garbage"])
    out = P.parse_datetime_multi(col, ["%Y-%m-%d %H:%M:%S", "%d/%m/%Y %H:%M"])
    assert out[0].as_py().isoformat() == "2024-01-02T03:04:05"
    assert out[1].as_py().isoformat() == "2024-01-02T03:04:00"
    assert out[2].as_py() is None


def test_line_model_parse_and_first_match(tmp_path):
    """Declarative line model (Sequence of leaves → one RE2 pattern)
    and FirstMatch over two models; unparsed rows keep parse_ok /
    model null semantics. End-to-end from the unix-socket source."""
    import socket
    import threading

    import ray.data as rdata

    from logdata_anomaly_miner_ray.functions.parsing import (
        parse_lines,
        parse_lines_first_match,
    )
    from logdata_anomaly_miner_ray.sources.streams import read_unix_socket_lines

    spec_auth = [
        ("ts", "datetime", "%Y-%m-%d %H:%M:%S"),
        ("s1", "fixed", " login user="),
        ("user", "alnum"),
        ("s2", "fixed", " from "),
        ("ip", "ipv4"),
    ]
    spec_metric = [
        ("name", "word"),
        ("s1", "fixed", "="),
        ("value", "float"),
    ]
    lines = [
        b"2024-03-04 10:00:01 login user=alice from 10.0.0.5",
        b"cpu_load=1.25",
        b"2024-03-04 10:00:02 login user=bob from 192.168.1.9",
        b"not a known format",
    ]
    path = str(tmp_path / "lines.sock")
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(path)
    srv.listen(1)

    def feed():
        conn, _ = srv.accept()
        conn.sendall(b"\n".join(lines) + b"\n")
        conn.close()

    th = threading.Thread(target=feed)
    th.start()
    ds = read_unix_socket_lines(path)
    th.join()
    srv.close()

    one = parse_lines(ds, spec_auth).to_pandas()
    assert one["parse_ok"].tolist() == [True, False, True, False]
    assert one.loc[0, "user"] == "alice"
    assert int(one.loc[2, "ip"]) == (192 << 24) + (168 << 16) + (1 << 8) + 9

    fm = parse_lines_first_match(
        ds, {"auth": spec_auth, "metric": spec_metric}
    ).to_pandas()
    assert fm["model"].tolist() == ["auth", "metric", "auth", None]
    assert fm.loc[1, "metric.value"] == 1.25
    assert fm.loc[0, "auth.user"] == "alice" and fm["auth.user"].isna().tolist() == [False, True, False, True]


def test_line_model_debug_tap(capfd):
    """DebugModelElement recast (reference: aminer/parsing/
    DebugModelElement.py:22-50): zero-width tap that never alters the
    parse, reports reach count + unmatched remainder per block to
    stderr, and emits the remainder as a column for inspection."""
    import ray.data as rdata

    from logdata_anomaly_miner_ray.functions.parsing import parse_lines

    spec = [
        ("tag", "word"),
        ("s", "fixed", " v="),
        ("here", "debug"),
        ("value", "int"),
    ]
    lines = ["m v=42", "m v=notanint", "nomatch"]
    out = pa.concat_tables(
        parse_lines(rdata.from_arrow(pa.table({"line": lines})), spec).iter_batches(
            batch_format="pyarrow"
        )
    )
    # the tap does not alter parse flow: same parse_ok as without it
    assert out["parse_ok"].to_pylist() == [True, False, False]
    assert out["value"].to_pylist() == [42, None, None]
    # remainder column: what was unmatched at the tap position
    assert out["here"].to_pylist() == ["42", "notanint", None]
    err = capfd.readouterr().err
    assert "DebugModelElement here added" in err
    # the per-block reach report prints on the WORKER's stderr and
    # only reaches the driver via Ray's async log forwarding (flaky
    # to capture) — assert it deterministically by running the batch
    # fn in-process instead
    from logdata_anomaly_miner_ray.functions.parsing import line_model_parse_fn

    out2 = line_model_parse_fn(spec)(pa.table({"line": pa.array(lines, pa.string())}))
    assert out2["here"].to_pylist() == ["42", "notanint", None]
    err = capfd.readouterr().err
    assert 'path = "here", reached = 2/3' in err


def test_line_model_repeated_lists():
    """Repeated leaf element → typed list column with min/max rep
    bounds enforced by the pattern."""
    import ray.data as rdata

    from logdata_anomaly_miner_ray.functions.parsing import parse_lines

    spec = [
        ("tag", "word"),
        ("s", "fixed", " vals="),
        ("xs", "repeated", ("int", ",", 2, 5)),
    ]
    lines = ["m vals=1,2,3", "m vals=9,8", "m vals=5", "m vals=1,2,3,4,5,6"]
    parts = list(
        parse_lines(rdata.from_arrow(pa.table({"line": lines})), spec).iter_batches(
            batch_format="pyarrow"
        )
    )
    out = pa.concat_tables(parts)
    assert out["parse_ok"].to_pylist() == [True, True, False, False]
    assert out["xs"].to_pylist()[:2] == [[1, 2, 3], [9, 8]]


def test_json_schema_reject_reasons_canonical_order():
    """Marker semantics + the canonical reason order (missing →
    value checks → unexpected, each sorted) that makes the verdicts
    SQL-reproducible."""
    from logdata_anomaly_miner_ray.functions.parsing import JsonSchema

    js = JsonSchema(
        {"k": int, "+note": str, "optional_key_tag": str, "optional_key_arr": "EMPTY_ARRAY"}
    )
    cases = [
        ('{"k": 1, "note": "n"}', None),
        ('{"k": 1, "note": null}', None),              # nullable
        ('{"k": 1, "note": "x", "tag": "t"}', None),   # optional present
        ('{"k": "bad", "note": "x"}', "type:k"),
        ('{"note": "x"}', "missing:k"),
        ('{"note": "x", "extra": 1}', "missing:k"),    # missing beats unexpected
        ('{"k": 1, "note": "x", "extra": 1}', "unexpected:extra"),
        ('{"k": 1, "note": "x", "zz": 1, "aa": 2}', "unexpected:aa"),  # sorted
        ('{"k": 1, "note": "x", "arr": []}', None),
        ('{"k": 1, "note": "x", "arr": [1]}', "not_empty_array:arr"),
        ('{"k": null, "note": "x"}', "null:k"),
        ('{"k": "a", "note": 5}', "type:k"),           # sorted value checks: k before note
        ("nope", "bad_json:"),
        ("[1, 2]", "not_object:"),
        (None, "bad_json:"),
    ]
    for doc, want in cases:
        assert js.check_document(doc) == want, doc


def test_json_schema_nested_and_lists():
    from logdata_anomaly_miner_ray.functions.parsing import JsonSchema

    js = JsonSchema(
        {
            "outer": {"inner": int, "+maybe": str},
            "xs": [int],
            "mix": [int, str],
            "anyk": {"ALLOW_ALL_KEYS": int},
            "free": "ALLOW_ALL",
            "nul": "NULL_OBJECT",
        }
    )
    ok = ('{"outer": {"inner": 1, "maybe": null}, "xs": [1, 2], '
          '"mix": [1, "a"], "anyk": {"p": 1, "q": 2}, "free": "x", "nul": null}')
    assert js.check_document(ok) is None
    bad_inner = ok.replace('"inner": 1', '"inner": "s"')
    assert js.check_document(bad_inner) == "type:outer.inner"
    bad_elem = ok.replace('"xs": [1, 2]', '"xs": [1, "s"]')
    assert js.check_document(bad_elem) == "elem:xs"
    bad_anyk = ok.replace('"q": 2', '"q": "s"')
    assert js.check_document(bad_anyk) == "type:anyk.q"
    arr_free = ok.replace('"free": "x"', '"free": [1]')
    assert js.check_document(arr_free) == "type:free"  # ref ALLOW_ALL array quirk
    notnull = ok.replace('"nul": null', '"nul": 3')
    assert js.check_document(notnull) == "not_null:nul"


def test_json_schema_validate_batch_and_spec_validation():
    import pytest as _pytest

    from logdata_anomaly_miner_ray.functions.parsing import (
        JsonSchema,
        json_schema_validate,
        validate_json_schema_spec,
    )

    col = pa.array(['{"k": 1}', '{"k": "x"}', None], pa.string())
    out = json_schema_validate(col, {"k": int})
    assert out["valid"].to_pylist() == [True, False, False]
    assert out["reject_reason"].to_pylist() == [None, "type:k", "bad_json:"]

    with _pytest.raises(TypeError):
        validate_json_schema_spec({"k": "NOT_A_MARKER"})
    with _pytest.raises(ValueError):
        validate_json_schema_spec({"k": []})
    # both prefixes in either order parse
    js = JsonSchema({"optional_key_+a": int, "+optional_key_b": int})
    assert js.check_document("{}") is None
    assert js.check_document('{"a": null, "b": null}') is None


def test_element_value_branch_dispatch():
    """ElementValueBranchModelElement recast: the parsed value picks
    the branch; a failed selected branch NEVER falls back (possessive
    value parse), lookup miss uses the default spec."""
    import ray.data as rd

    from logdata_anomaly_miner_ray.functions.parsing import (
        line_model_regex,
        parse_lines,
    )

    spec = [
        ("f0", "fixed", "op="),
        ("op", "branch", (
            ("opv", "word"),
            {
                "add": [("f1", "fixed", " a="), ("a", "int"),
                        ("f2", "fixed", " b="), ("b", "int")],
                "del": [("f3", "fixed", " id="), ("i", "int")],
            },
            [("f4", "fixed", " x="), ("x", "int")],   # default branch
        )),
    ]
    lines = [
        "op=add a=1 b=2",     # add branch
        "op=del id=9",        # del branch
        "op=zzz x=4",         # lookup miss → default
        "op=add x=4",         # selected 'add' FAILS → no default fallback
        "op=del a=1 b=2",     # selected 'del' FAILS
        "garbage",            # value probe fails
        "op=add a=0 b=10",    # leading-zero-free ints still parse
    ]
    ds = rd.from_arrow(pa.table({"line": pa.array(lines)})).repartition(2)
    out = parse_lines(ds, spec).to_pandas().sort_values("line").reset_index(drop=True)
    by = {r["line"]: r for _, r in out.iterrows()}
    r = by["op=add a=1 b=2"]
    assert r["parse_ok"] and r["op_branch"] == "add"
    assert r["opv"] == "add" and r["a"] == 1 and r["b"] == 2
    r = by["op=del id=9"]
    assert r["parse_ok"] and r["op_branch"] == "del" and r["i"] == 9
    r = by["op=zzz x=4"]
    assert r["parse_ok"] and r["op_branch"] == "<default>"
    assert r["opv"] == "zzz" and r["x"] == 4
    for bad in ("op=add x=4", "op=del a=1 b=2", "garbage"):
        assert not by[bad]["parse_ok"] and by[bad]["op_branch"] is None
    r = by["op=add a=0 b=10"]
    assert r["parse_ok"] and r["a"] == 0 and r["b"] == 10

    # no default: miss → unparsed
    spec_nd = [("f0", "fixed", "op="),
               ("op", "branch", (("opv", "word"),
                                 {"add": [("f1", "fixed", " a="),
                                          ("a", "int")]}, None))]
    out2 = parse_lines(
        rd.from_arrow(pa.table({"line": ["op=zzz x=4", "op=add a=3"]})),
        spec_nd).to_pandas().set_index("line")
    assert not out2.loc["op=zzz x=4", "parse_ok"]
    assert out2.loc["op=add a=3", "parse_ok"]

    # a 'branch' entry cannot reach the single-pattern compiler
    with pytest.raises(ValueError, match="branch"):
        line_model_regex(spec)
