"""Full DateTimeModelElement recast: timezone, missing-year and
epoch-format datetime parsing over Arrow string columns.

Clean-room columnar recast of the reference's custom strptime-like
parser (reference: aminer/parsing/DateTimeModelElement.py:70-420 and
MultiLocaleDateTimeModelElement, same file :423-527). The reference
walks bytes per atom; here one RE2 ``pc.extract_regex`` pulls every
format component for the whole column, epoch arithmetic is integer
numpy (civil-days algorithm), and only the inherently-sequential
missing-year wraparound machine loops — over matched rows of a batch,
carrying (start_year, last_parsed_seconds) state across batches like
the reference element carries it across atoms.

Supported format specifiers (the reference's exact set,
DateTimeModelElement.py:84-95): ``%b %d %f %H %M %m %S %s %Y %z``
plus ``%%``. Semantics preserved per the reference unit tests
(aecid-testsuite/unit/parsing/DateTimeModelElementTest.py):

- fixed-width numeric fields tolerate space padding (int() semantics);
- invalid civil dates (32.03, 29.02 non-leap, month 13) → null;
- ``%z`` consumes an optional `` TZNAME`` (longest-match against the
  public abbreviation table), then a ``+/-H``, ``HH``, ``HHMM`` or
  ``HH:MM`` offset — an explicit offset is only honoured after UTC/GMT
  or with no name at all, never after other names (``CET+01`` keeps
  only CET); a trailing ``Z`` is consumed; the offset is subtracted so
  results are always UTC seconds;
- missing-year formats track ``start_year`` and detect year
  wraparound within ``max_time_jump_seconds`` (year += 1 on a forward
  wrap; backward values re-dated to the previous year without moving
  ``start_year``; inconsistent jumps parse at ``start_year``);
- ``%s`` scales by ``timestamp_scale`` (1=s, 1000=ms, 1e6=us);
- absent month/day components fill from ``default_date`` (the
  reference uses datetime.now(); pass an explicit tuple for
  deterministic pipelines).

Deviation (documented): the reference's 4-digit-offset minute term is
``int(data[p-2:p] * 60)`` — string repetition inside int(), a bug that
is only neutral for ``:00`` minutes; this recast computes
``int(mm) * 60``. All reference unit-test fixtures use ``:00``.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Public timezone-abbreviation table (offset hours), matching the
# reference's published mapping (DateTimeModelElement.py:27-60) so %z
# verdicts agree — including its disambiguation picks (BST=Bangladesh
# +6, IST=India +5.5, AST=Arabia +3, CST=US-Central -6, GST=Gulf +4).
_TZ_TABLE = (
    "A:1;ACDT:10.5;ACST:9.5;ACT:-5;ACWST:8.75;ADT:4;AEDT:11;AEST:10;AET:10;"
    "AFT:4.5;AKDT:-8;AKST:-9;ALMT:6;AMST:-3;AMT:-4;ANAST:12;ANAT:12;AQTT:5;"
    "ART:-3;AST:3;AT:-4;AWDT:9;AWST:8;AZOST:0;AZOT:-1;AZST:5;AZT:4;AoE:-12;"
    "B:2;BNT:8;BOT:-4;BRST:-2;BRT:-3;BST:6;BTT:6;"
    "C:3;CAST:8;CAT:2;CCT:6.5;CDT:-5;CEST:2;CET:1;CHADT:13.75;CHAST:12.75;"
    "CHOST:9;CHOT:8;CHUT:10;CIDST:-4;CIST:-5;CKT:-10;CLST:-3;CLT:-4;COT:-5;"
    "CST:-6;CT:-6;CVT:-1;CXT:7;ChST:10;"
    "D:4;DAVT:7;DDUT:10;"
    "E:5;EASST:-5;EAST:-6;EAT:3;ECT:-5;EDT:-4;EEST:3;EET:2;EGST:0;EGT:-1;"
    "EST:-5;ET:-5;"
    "F:6;FET:3;FJST:13;FJT:12;FKST:-3;FKT:-4;FNT:-2;"
    "G:7;GALT:-6;GAMT:-9;GET:4;GFT:-3;GILT:12;GMT:0;GST:4;GYT:-4;"
    "H:8;HDT:-9;HKT:8;HOVST:8;HOVT:7;HST:-10;"
    "I:9;ICT:7;IDT:3;IOT:6;IRDT:4.5;IRKST:9;IRKT:8;IRST:3.5;IST:5.5;"
    "JST:9;"
    "K:10;KGT:6;KOST:11;KRAST:8;KRAT:7;KST:9;KUYT:4;"
    "L:11;LHDT:11;LHST:10.5;LINT:14;"
    "M:12;MAGST:12;MAGT:11;MART:9.5;MAWT:5;MDT:-6;MHT:12;MMT:6.5;MSD:4;"
    "MSK:3;MST:-7;MT:-7;MUT:4;MVT:5;MYT:8;"
    "N:-1;NCT:11;NDT:2.5;NFT:11;NOVST:7;NOVT:7;NPT:5.5;NRT:12;NST:3.5;"
    "NUT:-11;NZDT:13;NZST:12;"
    "O:-2;OMSST:7;OMST:6;ORAT:5;"
    "P:-3;PDT:-7;PET:-5;PETST:12;PETT:12;PGT:10;PHOT:13;PHT:8;PKT:5;"
    "PMDT:-2;PMST:-3;PONT:11;PST:-8;PT:-8;PWT:9;PYST:-3;PYT:-4;"
    "Q:-4;QYZT:6;"
    "R:-5;RET:4;ROTT:-3;"
    "S:-6;SAKT:11;SAMT:4;SAST:2;SBT:11;SCT:4;SGT:8;SRET:11;SRT:-3;SST:-11;"
    "SYOT:3;"
    "T:-7;TAHT:-10;TFT:5;TJT:5;TKT:13;TLT:9;TMT:5;TOST:14;TOT:13;TRT:3;"
    "TVT:12;"
    "U:-8;ULAST:9;ULAT:8;UTC:0;UYST:-2;UYT:-3;UZT:5;"
    "V:-9;VET:-4;VLAST:11;VLAT:10;VOST:6;VUT:11;"
    "W:-10;WAKT:12;WARST:-3;WAST:2;WAT:1;WEST:1;WET:0;WFT:12;WGST:-2;"
    "WGT:-3;WIB:7;WIT:9;WITA:8;WST:14;WT:0;"
    "X:-11;Y:-12;YAKST:10;YAKT:9;YAPT:10;YEKST:6;YEKT:5;Z:0"
)

TIMEZONE_OFFSETS: dict[str, int] = {
    name: int(float(hours) * 3600)
    for name, hours in (kv.split(":") for kv in _TZ_TABLE.split(";"))
}

# Longest-match lookup grouped by (uppercase) first letter; among
# equal lengths alphabetical order wins — the reference's search dict
# sorts keys alphabetically then stable-sorts by length descending.
_SEARCH_TZ: dict[str, list[str]] = {}
for _k in sorted(TIMEZONE_OFFSETS):
    _c = _k[0]
    if "A" <= _c <= "Z":
        _SEARCH_TZ.setdefault(_c, []).append(_k)
for _c in _SEARCH_TZ:
    _SEARCH_TZ[_c].sort(key=len, reverse=True)

# Builtin month-name tables (first-3-letters → month) for common
# locales; the reference derives these from the active C locale.
MONTH_NAMES: dict[str, dict[str, int]] = {
    "en": {n: i + 1 for i, n in enumerate(
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])},
    "de": {n: i + 1 for i, n in enumerate(
        ["Jan", "Feb", "Mär", "Apr", "Mai", "Jun",
         "Jul", "Aug", "Sep", "Okt", "Nov", "Dez"])},
    "fr": {n: i + 1 for i, n in enumerate(
        ["jan", "fév", "mar", "avr", "mai", "jui",
         "jui", "aoû", "sep", "oct", "nov", "déc"])},
}

# format-slot indices, matching the reference's result vector:
# 0=year 1=month 2=day 3=hour 4=minute 5=second 6=fraction 7=epoch
_SLOT_OF = {"Y": 0, "b": 1, "m": 1, "d": 2, "H": 3, "M": 4, "S": 5,
            "f": 6, "s": 7}
_DIM = np.array([0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
                dtype=np.int64)


def _is_leap(y):
    return (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))


def _days_from_civil(y, m, d):
    """Days since 1970-01-01 for civil (y, m, d) — vectorized
    Howard-Hinnant civil-days algorithm (public domain algorithm)."""
    y = np.asarray(y, dtype=np.int64) - (np.asarray(m) <= 2)
    m = np.asarray(m, dtype=np.int64)
    d = np.asarray(d, dtype=np.int64)
    era = np.floor_divide(y, 400)
    yoe = y - era * 400
    doy = (153 * np.where(m > 2, m - 3, m + 9) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _civil_seconds(y, m, d, h, mi, s):
    return _days_from_civil(y, m, d) * 86400 + (
        np.asarray(h, dtype=np.int64) * 3600
        + np.asarray(mi, dtype=np.int64) * 60
        + np.asarray(s, dtype=np.int64)
    )


def _valid_civil(y, m, d, h, mi, s):
    ok = (y >= 1) & (y <= 9999) & (m >= 1) & (m <= 12)
    dim = _DIM[np.clip(m, 0, 12)] + ((np.clip(m, 0, 12) == 2) & _is_leap(y))
    ok &= (d >= 1) & (d <= dim)
    ok &= (h >= 0) & (h <= 23) & (mi >= 0) & (mi <= 59) & (s >= 0) & (s <= 59)
    return ok


def parse_tz_suffix(rest: str) -> tuple[int, bool]:
    """Parse the %z trailing-timezone state machine on the text after
    the fixed format parts (reference get_match_element
    DateTimeModelElement.py:347-413). Returns (offset_seconds, valid);
    the offset must be SUBTRACTED to reach UTC. Explicit numeric
    offsets are only honoured bare or after UTC/GMT."""
    valid = True
    offset_allowed = True
    off = 0
    pos = 0
    if rest[:1] == " ":
        pos = 1
        if pos < len(rest) and rest[pos] in _SEARCH_TZ:
            # the UTC/GMT-only offset restriction applies ONLY when a
            # letter opens a tz-name lookup; a bare " -0700" keeps
            # offsets allowed (reference DateTimeModelElement.py:
            # 355-366 — the not-in-(UTC,GMT) check sits INSIDE the
            # first-letter-in-dict branch)
            key = None
            for cand in _SEARCH_TZ[rest[pos]]:
                if rest.startswith(cand, pos):
                    key = cand
                    break
            if key not in ("UTC", "GMT"):
                offset_allowed = False
            if key is not None:
                off = TIMEZONE_OFFSETS[key]
                pos += len(key)
    if pos < len(rest) and rest[pos] in "+-" and offset_allowed and valid:
        sign = 1 if rest[pos] == "+" else -1
        pos += 1
        cnt = 0
        colon = 0
        while pos < len(rest):
            ch = rest[pos]
            if "0" <= ch <= "9":
                cnt += 1
                pos += 1
            elif cnt == 2 and ch == ":":
                pos += 1
                colon = 1
            else:
                break
        if cnt != 4 and colon == 1:
            pos -= 1
            colon = 0
        if cnt == 0 or cnt > 4:
            valid = False
        elif cnt == 1:
            off = sign * int(rest[pos - 1]) * 3600
        elif cnt == 2:
            off = sign * int(rest[pos - 2:pos]) * 3600
        elif cnt == 4:
            off = sign * (int(rest[pos - 4 - colon:pos - 2 - colon]) * 3600
                          + int(rest[pos - 2:pos]) * 60)
        # cnt == 3: reference falls through all branches — offset
        # keeps its prior value but the specifier stays valid.
    return (off if valid else 0), valid


class DateTimeParser:
    """Stateful columnar DateTimeModelElement. ``parse_array`` maps a
    string column to UTC epoch values; missing-year state carries
    across calls, so feed batches in stream order when the format has
    no %Y (the reference has the identical ordering requirement)."""

    def __init__(
        self,
        date_format: str,
        tz_offset_seconds: int = 0,
        start_year: int | None = None,
        max_time_jump_seconds: int = 86400,
        timestamp_scale: float = 1,
        month_names: dict[str, int] | None = None,
        default_date: tuple[int, int, int] | None = None,
    ):
        self.date_format = date_format
        self.tz_offset_seconds = int(tz_offset_seconds)
        self.max_time_jump_seconds = max_time_jump_seconds
        self.timestamp_scale = timestamp_scale
        self.month_map = dict(month_names or MONTH_NAMES["en"])
        self.default_date = default_date
        self.format_has_year_flag = False
        self.format_has_tz_specifier = False
        self._month_from_name = False
        self._slots: set[int] = set()
        self._regex = self._scan(date_format)
        if not self.format_has_year_flag and start_year is None:
            self.start_year = _dt.datetime.now(_dt.timezone.utc).year
        else:
            self.start_year = start_year if start_year is not None else 0
        self.last_parsed_seconds = 0

    def _scan(self, fmt: str) -> str:
        import re as _re

        out = []
        i = 0
        parts: list[tuple[int, str] | str] = []
        while i < len(fmt):
            j = fmt.find("%", i)
            if j < 0:
                j = len(fmt)
            if j != i:
                parts.append(fmt[i:j])
                i = j
                continue
            code = fmt[i + 1:i + 2]
            i += 2
            if code == "%":
                parts.append("%")
                continue
            if code == "z":
                self.format_has_tz_specifier = True
                continue
            if code not in _SLOT_OF:
                raise ValueError(f"Unknown dateformat specifier %{code}")
            slot = _SLOT_OF[code]
            if slot in self._slots:
                raise ValueError(f"Multiple format specifiers for type {slot}")
            self._slots.add(slot)
            if code == "Y":
                self.format_has_year_flag = True
            if code == "b":
                self._month_from_name = True
            parts.append((slot, code))
        if 7 in self._slots and self._slots & set(range(6)):
            raise ValueError(
                "Cannot use %s (seconds since epoch) with other "
                "non-second format types")
        for k, p in enumerate(parts):
            if isinstance(p, str):
                out.append(_re.escape(p))
                continue
            slot, code = p
            if code == "Y":
                out.append(r"(?P<g0>\d{4})")
            elif code == "b":
                alts = "|".join(_re.escape(nm) for nm in sorted(
                    self.month_map, key=len, reverse=True))
                out.append(f"(?P<g1>{alts})")
            elif code in "dHMmS":
                out.append(rf"(?P<g{slot}>[\d ][\d ])")
            elif code in "fs":
                # variable length: lazy up to a following literal,
                # greedy digit-run when last (reference find-separator
                # / digit-run rule, DateTimeModelElement.py:222-239).
                nxt_lit = k + 1 < len(parts) and isinstance(parts[k + 1], str)
                if nxt_lit:
                    body = r"[0-9]*?" if code == "f" else r"[0-9]+?"
                else:
                    body = r"[0-9]+"
                out.append(rf"(?P<g{slot}>{body})")
        tail = r"(?s)(?P<rest>.*)" if self.format_has_tz_specifier else ""
        return "^" + "".join(out) + tail

    def _num_slot(self, ex: pa.StructArray, slot: int, n: int):
        """Fixed-width int() semantics: strip spaces, digits → int64,
        anything else unmatched. Returns (values int64, ok bool)."""
        name = f"g{slot}"
        if name not in [f.name for f in ex.type]:
            return np.zeros(n, dtype=np.int64), None
        s = pc.utf8_trim(ex.field(name), " ")
        ok_a = pc.match_substring_regex(s, r"^[0-9]+$")
        ok = pc.fill_null(ok_a, False).to_numpy(zero_copy_only=False)
        guarded = pc.if_else(ok_a, s, pa.scalar(None, pa.string()))
        vals = pc.cast(guarded, pa.int64()).to_numpy(zero_copy_only=False)
        v = np.where(ok, np.nan_to_num(vals.astype(np.float64)), 0).astype(np.int64)
        return v, ok

    def parse_array(self, col) -> dict[str, pa.Array]:
        """Parse a string column. Returns ``matched`` (bool),
        ``seconds`` (float64 UTC epoch, null on no-match) and
        ``micros`` (int64 integer microseconds, exact for ≤6-digit
        fractions — use this for oracle-exact comparisons)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        ex = pc.extract_regex(col, self._regex)
        matched = pc.is_valid(ex).to_numpy(zero_copy_only=False).copy()
        names = [f.name for f in ex.type]

        y, ok = self._num_slot(ex, 0, n)
        if ok is not None:
            matched &= ok
        # month: %b (name, dict-mapped) or %m (numeric)
        if self._month_from_name:
            m = np.zeros(n, dtype=np.int64)
            if "g1" in names:
                f1 = ex.field("g1")
                for i in range(n):
                    if matched[i]:
                        m[i] = self.month_map.get(f1[i].as_py(), 0)
        else:
            m, ok = self._num_slot(ex, 1, n)
            if ok is not None:
                matched &= ok
        d, ok = self._num_slot(ex, 2, n)
        if ok is not None:
            matched &= ok
        h, ok = self._num_slot(ex, 3, n)
        if ok is not None:
            matched &= ok
        mi, ok = self._num_slot(ex, 4, n)
        if ok is not None:
            matched &= ok
        s, ok = self._num_slot(ex, 5, n)
        if ok is not None:
            matched &= ok

        # fraction: float('0.'+digits) (empty → 0.0); exact micros.
        frac = np.zeros(n, dtype=np.float64)
        frac_us = np.zeros(n, dtype=np.int64)
        if "g6" in names:
            f6 = ex.field("g6")
            digs = f6.to_pylist()
            for i in range(n):
                if matched[i] and digs[i] is not None:
                    ds = digs[i]
                    frac[i] = int(ds) / (10 ** len(ds)) if ds else 0.0
                    d6 = (ds + "000000")[:6] if ds else "000000"
                    frac_us[i] = int(d6)

        # epoch slot (%s)
        if "g7" in names:
            e7 = ex.field("g7")
            ok_a = pc.match_substring_regex(e7, r"^[0-9]+$")
            ok = pc.fill_null(ok_a, False).to_numpy(zero_copy_only=False)
            matched &= ok
            raw = np.zeros(n, dtype=np.int64)
            lst = e7.to_pylist()
            for i in range(n):
                if matched[i] and lst[i]:
                    raw[i] = int(lst[i])
            scale = self.timestamp_scale
            sec_f = raw / scale + frac
            if float(scale).is_integer() and 1_000_000 % int(scale) == 0:
                us = raw * (1_000_000 // int(scale)) + frac_us
            else:
                us = np.rint(raw * (1e6 / scale)).astype(np.int64) + frac_us
            # reference quirk: epoch value 0 falls through to the
            # civil-date branch; treat as unmatched-at-zero is wrong,
            # so route those rare rows through the default fill below
            # only when they exist.
            zero_rows = matched & (raw == 0)
            if zero_rows.any():
                fy, fm, fd = self._fill_date()
                base = int(_civil_seconds(
                    np.int64(self.start_year if not self.format_has_year_flag
                             else fy), np.int64(fm), np.int64(fd),
                    0, 0, 0)) - self.tz_offset_seconds
                sec_f = np.where(zero_rows, base + frac, sec_f)
                us = np.where(zero_rows, base * 1_000_000 + frac_us, us)
            return self._emit(matched, sec_f, us)

        fy, fm, fd = self._fill_date()
        if self.format_has_year_flag:
            y = np.where(y == 0, fy, y)
        m = np.where(m == 0, fm, m)
        d = np.where(d == 0, fd, d)

        rest_off = np.zeros(n, dtype=np.int64)
        if self.format_has_tz_specifier and "rest" in names:
            rest = ex.field("rest").to_pylist()
            cache: dict[str, int] = {}
            for i in range(n):
                if matched[i]:
                    r = rest[i] or ""
                    if r not in cache:
                        cache[r] = parse_tz_suffix(r)[0]
                    rest_off[i] = cache[r]

        if self.format_has_year_flag:
            ok = _valid_civil(y, m, d, h, mi, s)
            matched &= ok
            ys = np.where(matched, y, 1970)
            base = _civil_seconds(ys, np.where(matched, m, 1),
                                  np.where(matched, d, 1), h, mi, s)
            base = base - self.tz_offset_seconds - rest_off
            sec_f = base + frac
            us = base * 1_000_000 + frac_us
            return self._emit(matched, sec_f, us)

        # missing-year sequential machine (reference :296-341)
        base = np.zeros(n, dtype=np.int64)
        for i in np.nonzero(matched)[0]:
            yy = self.start_year
            if not _valid_civil(np.int64(yy), m[i], d[i], h[i], mi[i], s[i]):
                matched[i] = False
                continue
            total = int(_civil_seconds(np.int64(yy), m[i], d[i], h[i],
                                       mi[i], s[i])) - self.tz_offset_seconds
            if self.last_parsed_seconds == 0:
                self.last_parsed_seconds = total
            else:
                delta = self.last_parsed_seconds - total
                if abs(delta) <= self.max_time_jump_seconds:
                    self.last_parsed_seconds = total
                else:
                    ny_ok = _valid_civil(np.int64(yy + 1), m[i], d[i],
                                         h[i], mi[i], s[i])
                    ny_total = (int(_civil_seconds(
                        np.int64(yy + 1), m[i], d[i], h[i], mi[i], s[i]))
                        - self.tz_offset_seconds) if ny_ok else None
                    if (ny_total is not None and
                            ny_total - self.last_parsed_seconds
                            <= self.max_time_jump_seconds):
                        self.start_year += 1
                        total = ny_total
                        self.last_parsed_seconds = total
                    else:
                        ly_ok = _valid_civil(np.int64(yy - 1), m[i], d[i],
                                             h[i], mi[i], s[i])
                        ly_total = (int(_civil_seconds(
                            np.int64(yy - 1), m[i], d[i], h[i], mi[i], s[i]))
                            - self.tz_offset_seconds) if ly_ok else None
                        if (ly_total is not None and
                                self.last_parsed_seconds - ly_total
                                <= self.max_time_jump_seconds):
                            total = ly_total
                            self.last_parsed_seconds = total
                        # else: inconsistent — keep start_year value
            base[i] = total - rest_off[i]
        sec_f = base + frac
        us = base * 1_000_000 + frac_us
        return self._emit(matched, sec_f, us)

    def _fill_date(self) -> tuple[int, int, int]:
        if self.default_date is not None:
            return self.default_date
        now = _dt.datetime.now()
        return now.year, now.month, now.day

    @staticmethod
    def _emit(matched, sec_f, us):
        inv = ~matched
        return {
            "matched": pa.array(matched, pa.bool_()),
            "seconds": pa.array(np.where(matched, sec_f, 0.0),
                                pa.float64(), mask=inv),
            "micros": pa.array(np.where(matched, us, 0),
                               pa.int64(), mask=inv),
        }


class MultiFormatDateTimeParser:
    """MultiLocaleDateTimeModelElement recast (reference
    DateTimeModelElement.py:423-527): an ordered list of
    (date_format, tz_offset_seconds, month_names) alternatives; each
    row takes the first format that yields a valid datetime. Shares
    start_year/last_parsed state across sub-parsers. Enforces the
    reference's prefix rule (no format may extend an earlier one)."""

    def __init__(self, date_formats: list, start_year: int | None = None,
                 max_time_jump_seconds: int = 86400,
                 default_date: tuple[int, int, int] | None = None):
        if not date_formats:
            raise ValueError("At least one date_format must be specified.")
        self.parsers: list[DateTimeParser] = []
        seen: list[str] = []
        for spec in date_formats:
            fmt, tz_off, names = (spec if isinstance(spec, tuple)
                                  else (spec, 0, None))
            for prior in seen:
                if fmt.startswith(prior):
                    raise ValueError(
                        f"Invalid order of date_formats. {fmt} starts "
                        f"with {prior}. More specific datetimes would "
                        f"be skipped.")
            seen.append(fmt)
            self.parsers.append(DateTimeParser(
                fmt, tz_offset_seconds=tz_off, start_year=start_year,
                max_time_jump_seconds=max_time_jump_seconds,
                month_names=names, default_date=default_date))
        self._stateful = any(not p.format_has_year_flag for p in self.parsers)
        self.start_year = self.parsers[0].start_year
        self.last_parsed_seconds = 0

    def parse_array(self, col) -> dict[str, pa.Array]:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        out_m = np.zeros(n, dtype=bool)
        out_s = np.full(n, np.nan)
        out_us = np.zeros(n, dtype=np.int64)
        if self._stateful:
            # row order matters for shared year state: parse row by
            # row through single-element slices (parity path; the
            # scale path is year-qualified formats, fully vectorized).
            for i in range(n):
                one = col.slice(i, 1)
                for p in self.parsers:
                    p.start_year = self.start_year
                    p.last_parsed_seconds = self.last_parsed_seconds
                    r = p.parse_array(one)
                    if r["matched"][0].as_py():
                        self.start_year = p.start_year
                        self.last_parsed_seconds = p.last_parsed_seconds
                        out_m[i] = True
                        out_s[i] = r["seconds"][0].as_py()
                        out_us[i] = r["micros"][0].as_py()
                        break
        else:
            for p in self.parsers:
                todo = ~out_m
                if not todo.any():
                    break
                r = p.parse_array(col)
                mk = r["matched"].to_numpy(zero_copy_only=False) & todo
                if mk.any():
                    sv = r["seconds"].to_numpy(zero_copy_only=False)
                    uv = r["micros"].to_numpy(zero_copy_only=False)
                    out_s = np.where(mk, sv, out_s)
                    out_us = np.where(mk, np.nan_to_num(uv).astype(np.int64),
                                      out_us)
                    out_m |= mk
        inv = ~out_m
        return {
            "matched": pa.array(out_m, pa.bool_()),
            "seconds": pa.array(np.where(out_m, out_s, 0.0),
                                pa.float64(), mask=inv),
            "micros": pa.array(out_us, pa.int64(), mask=inv),
        }
