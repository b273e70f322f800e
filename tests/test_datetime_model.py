"""DateTimeParser unit tests: reference-unit-test fixture values
(aecid-testsuite/unit/parsing/DateTimeModelElementTest.py), state
carry across batches, multi-format cascade, format validation."""

import numpy as np
import pyarrow as pa
import pytest

from logdata_anomaly_miner_ray.functions.datetime_model import (
    DateTimeParser,
    MultiFormatDateTimeParser,
    parse_tz_suffix,
)


def secs(parser, vals):
    return parser.parse_array(pa.array(vals, pa.string()))["seconds"].to_pylist()


def test_basic_formats_and_invalid_dates():
    p = DateTimeParser("%d.%m.%Y %H:%M:%S")
    assert secs(p, [
        "07.02.2019 11:40:00", "29.02.2020 11:40:00",
        "32.03.2019 11:40:00", "01.13.2019 11:40:00",
        "29.02.2019 11:40:00", "01.01.00 11:40:00",
    ]) == [1549539600, 1582976400, None, None, None, None]
    # trailing data is ignored (the reference consumes a prefix)
    assert secs(p, ["07.02.2019 11:40:00: it still works"]) == [1549539600]


def test_fraction_and_micros_exact():
    p = DateTimeParser("%d.%m.%Y %H:%M:%S.%f")
    out = p.parse_array(pa.array(["07.02.2019 11:40:00.123456",
                                  "07.02.2019 11:40:00."]))
    assert out["seconds"].to_pylist() == [1549539600.123456, None]
    assert out["micros"].to_pylist() == [1549539600123456, None]


def test_tz_specifier_reference_fixtures():
    p = DateTimeParser("%d.%m.%Y %H:%M:%S%z")
    cases = {
        "07.02.2019 11:40:00+0000": 1549539600,
        "07.02.2019 11:40:00 UTC": 1549539600,
        "07.02.2019 11:40:00 GMT": 1549539600,
        "07.02.2019 11:40:00 UTC+01": 1549536000,
        "07.02.2019 11:40:00 CET+01": 1549536000,  # offset ignored after CET
        "07.02.2018 11:40:00 UTC-1200": 1518046800,
        "07.02.2018 11:40:00 UTC-5": 1518021600,
        "07.02.2018 11:40:00-05:00": 1518021600,
        "07.02.2018 11:40:00+01:00": 1518000000,
        "07.02.2018 11:40:00 UTC+1400": 1517953200,
        "24.03.2018 11:40:00 CET": 1521888000,
        "25.03.2018 11:40:00 CEST": 1521970800,
        "27.10.2018 11:40:00 EST": 1540658400,
        "27.10.2018 11:40:00 PDT": 1540665600,
    }
    assert secs(p, list(cases)) == list(cases.values())


def test_unclean_format_percent_literal():
    p = DateTimeParser("Date %%d: %d.%m.%Y %H:%M:%S%z")
    assert secs(p, ["Date %d: 07.02.2018 11:40:00 UTC+0000"]) == [1518003600]


def test_epoch_seconds_scales():
    assert secs(DateTimeParser("%s"), ["1662760597"]) == [1662760597]
    assert secs(DateTimeParser("%s", timestamp_scale=1000),
                ["1662760597123"]) == [1662760597.123]
    assert secs(DateTimeParser("%s", timestamp_scale=1e6),
                ["1662760597123456"]) == [1662760597.123456]


def test_start_year_and_leap():
    assert secs(DateTimeParser("%d.%m %H:%M:%S", start_year=2017),
                ["07.02 11:40:00"]) == [1486467600]
    assert secs(DateTimeParser("%d.%m %H:%M:%S", start_year=2020),
                ["29.02 11:40:00"]) == [1582976400]
    assert secs(DateTimeParser("%d.%m %H:%M:%S", start_year=2019),
                ["29.02 11:40:00"]) == [None]


def test_year_wraparound_and_max_jump():
    p = DateTimeParser("%d.%m %H:%M:%S", start_year=2020)
    assert secs(p, ["31.12 23:59:00", "01.01 11:20:00"]) == [
        1609459140, 1609500000]
    assert p.start_year == 2021
    # exactly at the jump bound: accepted
    p = DateTimeParser("%d.%m %H:%M:%S", start_year=2020)
    assert secs(p, ["31.12 23:59:00", "01.01 23:59:00"]) == [
        1609459140, 1609545540]
    assert p.start_year == 2021
    # one second beyond: inconsistent, start_year kept
    p = DateTimeParser("%d.%m %H:%M:%S", start_year=2020)
    assert secs(p, ["31.12 23:59:00", "01.01 23:59:01"]) == [
        1609459140, 1577923141]
    assert p.start_year == 2020


def test_state_carries_across_batches():
    whole = DateTimeParser("%d.%m %H:%M:%S", start_year=2020)
    a = secs(whole, ["31.12 23:59:00", "01.01 11:20:00", "01.01 12:00:00"])
    split = DateTimeParser("%d.%m %H:%M:%S", start_year=2020)
    b = secs(split, ["31.12 23:59:00"]) + secs(
        split, ["01.01 11:20:00", "01.01 12:00:00"])
    assert a == b
    assert split.start_year == 2021


def test_pre_epoch_and_date_only():
    assert secs(DateTimeParser("%d.%m.%Y %H:%M:%S"),
                ["01.01.1900 11:40:00"]) == [-2208946800]
    assert secs(DateTimeParser("%d.%m.%Y"), ["07.02.2019"]) == [1549497600]


def test_month_name_and_locale_table():
    from logdata_anomaly_miner_ray.functions.datetime_model import MONTH_NAMES

    p = DateTimeParser("%b %d %H:%M:%S", start_year=2021)
    assert secs(p, ["Nov 19 05:08:43"]) == [1637298523]
    p = DateTimeParser("%d. %b %Y", month_names=MONTH_NAMES["de"])
    assert secs(p, ["19. Mär 2021"]) == [1616112000]


def test_element_timezone_offset():
    # element configured for CET (+1h): wall clock read back to UTC
    p = DateTimeParser("%d.%m.%Y %H:%M:%S", tz_offset_seconds=3600)
    assert secs(p, ["07.02.2019 11:40:00"]) == [1549536000]


def test_format_validation_errors():
    with pytest.raises(ValueError):
        DateTimeParser("%q")
    with pytest.raises(ValueError):
        DateTimeParser("%d.%d")  # duplicate slot
    with pytest.raises(ValueError):
        DateTimeParser("%s %H")  # epoch mixed with civil


def test_tz_suffix_machine_edges():
    assert parse_tz_suffix("") == (0, True)
    assert parse_tz_suffix(" UTC") == (0, True)
    assert parse_tz_suffix(" CET") == (3600, True)
    assert parse_tz_suffix(" CET+01: text") == (3600, True)
    assert parse_tz_suffix("+0100") == (3600, True)
    assert parse_tz_suffix("-05:00") == (-18000, True)
    # unknown word after space blocks a following offset (reference rule)
    assert parse_tz_suffix(" nonsense+01") == (0, True)
    # >4 digits invalidates the specifier
    assert parse_tz_suffix("+010000") == (0, False)
    # 3 digits: falls through with prior offset kept (reference quirk)
    assert parse_tz_suffix("+010") == (0, True)


def test_multi_format_cascade_vectorized():
    mp = MultiFormatDateTimeParser([
        "%d.%m.%Y %H:%M:%S", "%Y-%m-%d %H:%M:%S"])
    out = mp.parse_array(pa.array([
        "07.02.2019 11:40:00", "2019-02-07 11:40:00", "garbage"]))
    assert out["seconds"].to_pylist() == [1549539600, 1549539600, None]


def test_multi_format_prefix_rule():
    with pytest.raises(ValueError):
        MultiFormatDateTimeParser(["%d.%m.%Y", "%d.%m.%Y %H:%M:%S"])


def test_multi_format_stateful_shared_year():
    mp = MultiFormatDateTimeParser(
        ["%d.%m %H:%M:%S", "%Y-%m-%d %H:%M:%S"], start_year=2020)
    out = mp.parse_array(pa.array([
        "31.12 23:59:00", "2021-01-01 05:00:00", "01.01 11:20:00"]))
    assert out["seconds"].to_pylist() == [1609459140, 1609477200, 1609500000]
    assert mp.start_year == 2021


def test_null_and_chunked_inputs():
    p = DateTimeParser("%d.%m.%Y %H:%M:%S")
    chunked = pa.chunked_array([["07.02.2019 11:40:00"], [None, "bad"]])
    out = p.parse_array(chunked)
    assert out["seconds"].to_pylist() == [1549539600, None, None]
    assert out["matched"].to_pylist() == [True, False, False]


def test_space_padded_fixed_width():
    p = DateTimeParser("%d.%m.%Y %H:%M:%S")
    assert secs(p, [" 7.02.2019 11:40:00"]) == [1549539600]


def test_vectorized_matches_loop_on_random_inputs():
    rng = np.random.RandomState(7)
    days = rng.randint(1, 32, 500)
    months = rng.randint(1, 14, 500)
    years = rng.randint(1990, 2030, 500)
    hours = rng.randint(0, 25, 500)
    strs = [f"{d:02d}.{m:02d}.{y} {h:02d}:30:15"
            for d, m, y, h in zip(days, months, years, hours)]
    p = DateTimeParser("%d.%m.%Y %H:%M:%S")
    got = secs(p, strs)
    import datetime as dt
    for sv, g in zip(strs, got):
        try:
            expect = dt.datetime.strptime(
                sv, "%d.%m.%Y %H:%M:%S").replace(
                tzinfo=dt.timezone.utc).timestamp()
        except ValueError:
            expect = None
        assert g == expect, sv
