"""Derived-column 'parsing model': JSON field extraction and
datetime parsing over Arrow batches.

Clean-room recast of AMiner's parsing-model leaf elements for a
columnar world: the ModelElement tree consumed byte prefixes per
record (reference: aminer/parsing/ModelElementInterface.py:495-501);
here a 'parser path' is a derived column, produced vectorized:

- ``json_extract``       — JsonModelElement/JsonStringModelElement
  (reference: aminer/parsing/JsonModelElement.py:52-514): a JSON
  string column → typed columns for selected dotted paths, with
  parse-failure rows flagged null (AMiner's unparsed-atom event).
- ``parse_datetime``     — DateTimeModelElement (reference:
  aminer/parsing/DateTimeModelElement.py:70-422): %-format strings
  → timestamp[us] via pc.strptime, nulls on failure.
- ``parse_int/float``    — Decimal*ValueModelElement: string →
  number with null-on-failure.
- ``parse_ipv4``         — IpAddressDataModelElement
  (reference: aminer/parsing/IpAddressDataModelElement.py:19-93):
  dotted quad → uint32 int.
- ``fixed_wordlist_index`` — FixedWordlistDataModelElement:
  value → index in word list (match_object = index semantics).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def json_extract(
    col, paths: dict[str, pa.DataType], flag_name: str = "parse_ok"
) -> dict[str, pa.Array]:
    """Extract dotted paths from a JSON-string column.

    Returns {out_name: typed Array} plus a boolean parse-ok column.
    Row-level json.loads is unavoidable without a JSON kernel in
    this pyarrow build; the loop body is C-accelerated json parsing
    per row and runs inside distributed map_batches tasks.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    ok = np.zeros(n, dtype=bool)
    raw: dict[str, list] = {p: [None] * n for p in paths}
    for i in range(n):
        v = col[i].as_py()
        if v is None:
            continue
        try:
            obj = json.loads(v)
            ok[i] = True
        except (ValueError, TypeError):
            continue
        for p in paths:
            cur = obj
            for part in p.split("."):
                if isinstance(cur, dict) and part in cur:
                    cur = cur[part]
                else:
                    cur = None
                    break
            raw[p][i] = cur
    out: dict[str, pa.Array] = {}
    for p, typ in paths.items():
        vals = raw[p]
        if pa.types.is_integer(typ) or pa.types.is_floating(typ):
            coerced = []
            for v in vals:
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    coerced.append(None)
                else:
                    coerced.append(v)
            out[p.replace(".", "_")] = pa.array(coerced, typ)
        elif pa.types.is_boolean(typ):
            out[p.replace(".", "_")] = pa.array(
                [v if isinstance(v, bool) else None for v in vals], typ
            )
        else:
            out[p.replace(".", "_")] = pa.array(
                [v if isinstance(v, str) else (None if v is None else json.dumps(v)) for v in vals],
                typ,
            )
    out[flag_name] = pa.array(ok)
    return out


_JSON_MARKERS = frozenset(
    {"ALLOW_ALL", "EMPTY_ARRAY", "EMPTY_OBJECT", "EMPTY_STRING", "NULL_OBJECT"}
)


def validate_json_schema_spec(schema: dict) -> None:
    """Reject malformed schema dicts up front (the reference's
    validate_key_parser_dict, JsonModelElement.py:76-96)."""
    for v in schema.values():
        if isinstance(v, dict):
            validate_json_schema_spec(v)
        elif isinstance(v, list):
            if len(v) == 0:
                raise ValueError("lists in a json schema must have at least one entry")
            for alt in v:
                if isinstance(alt, dict):
                    validate_json_schema_spec(alt)
                elif not (alt in (str, int, float, bool) or alt in _JSON_MARKERS):
                    raise TypeError(f"wrong type found in json schema list: {alt!r}")
        elif not (v in (str, int, float, bool) or v in _JSON_MARKERS):
            raise TypeError(f"wrong type found in json schema: {v!r}")


class JsonSchema:
    """JsonModelElement marker semantics over a schema dict (clean-room
    recast of reference parsing/JsonModelElement.py:55-93,216-370):

    - keys may carry an ``optional_key_`` prefix (key may be absent)
      and/or a ``+`` prefix (value may be null), in either order;
    - leaf specs are the python types ``str/int/float/bool`` (json
      type match; int excludes bool, float accepts any number) or the
      markers ``"ALLOW_ALL"`` (any value), ``"EMPTY_ARRAY"`` /
      ``"EMPTY_OBJECT"`` / ``"EMPTY_STRING"`` (only the empty value),
      ``"NULL_OBJECT"`` (only null). Reference quirks preserved:
      ALLOW_ALL rejects json arrays (check_keys "RETURN [NONE] 5")
      and null needs the nullable prefix even under ALLOW_ALL;
    - a nested dict spec requires a json object and recurses; the
      special key ``"ALLOW_ALL_KEYS"`` lets every key through, each
      value validated against its spec;
    - a list spec requires a json array whose every element matches
      at least one of the listed alternatives;
    - ``allow_all_fields=True`` skips unexpected keys instead of
      rejecting (reference ``allow_all_fields``).

    Failures are reported as ``reason:keypath`` with a CANONICAL
    evaluation order (so the verdict is reproducible in SQL): per
    object first missing required keys (sorted), then per-key value
    checks (sorted, depth-first), then unexpected keys (sorted).
    """

    def __init__(
        self,
        schema: dict,
        optional_key_prefix: str = "optional_key_",
        nullable_key_prefix: str = "+",
        allow_all_fields: bool = False,
    ):
        validate_json_schema_spec(schema)
        self.schema = schema
        self.opt = optional_key_prefix
        self.nul = nullable_key_prefix
        self.allow_all_fields = allow_all_fields

    def _strip(self, key: str) -> str:
        # reference get_stripped_key: optional, nullable, optional again
        if key.startswith(self.opt):
            key = key[len(self.opt):]
        if key.startswith(self.nul):
            key = key[len(self.nul):]
        if key.startswith(self.opt):
            key = key[len(self.opt):]
        return key

    def _full_key(self, key: str, sdict: dict) -> str:
        # reference get_full_key probe order
        for opt in (
            self.opt + self.nul + key,
            self.nul + self.opt + key,
            self.opt + key,
            self.nul + key,
        ):
            if opt in sdict:
                return opt
        return key

    def _is_optional(self, full_key: str) -> bool:
        return full_key.startswith(self.opt) or full_key.startswith(self.nul + self.opt)

    def _is_nullable(self, full_key: str) -> bool:
        return full_key.startswith(self.nul) or (
            full_key.startswith(self.opt) and full_key[len(self.opt):].startswith(self.nul)
        )

    def _check_value(self, value, spec, path: str) -> str | None:
        if isinstance(spec, dict):
            if not isinstance(value, dict):
                return f"type:{path}"
            return self._check_object(value, spec, path)
        if isinstance(spec, list):
            if not isinstance(value, list):
                return f"type:{path}"
            for i, el in enumerate(value):
                if not any(
                    self._elem_ok(el, alt, f"{path}[{i}]") for alt in spec
                ):
                    return f"elem:{path}"
            return None
        if spec == "ALLOW_ALL":
            # reference check_keys rejects a json ARRAY under any
            # non-list spec including ALLOW_ALL
            # (JsonModelElement.py:331-339 "RETURN [NONE] 5")
            return None if not isinstance(value, list) else f"type:{path}"
        if spec == "NULL_OBJECT":
            return None if value is None else f"not_null:{path}"
        if spec == "EMPTY_ARRAY":
            return None if value == [] and isinstance(value, list) else f"not_empty_array:{path}"
        if spec == "EMPTY_OBJECT":
            return None if value == {} and isinstance(value, dict) else f"not_empty_object:{path}"
        if spec == "EMPTY_STRING":
            return None if value == "" else f"not_empty_string:{path}"
        if spec is bool:
            return None if isinstance(value, bool) else f"type:{path}"
        if spec is int:
            return None if isinstance(value, int) and not isinstance(value, bool) else f"type:{path}"
        if spec is float:
            ok = isinstance(value, (int, float)) and not isinstance(value, bool)
            return None if ok else f"type:{path}"
        if spec is str:
            return None if isinstance(value, str) else f"type:{path}"
        return f"type:{path}"  # unreachable after spec validation

    def _elem_ok(self, el, alt, path: str) -> bool:
        return self._check_value(el, alt, path) is None

    def _check_object(self, obj: dict, sdict: dict, path: str) -> str | None:
        def child(key: str) -> str:
            return f"{path}.{key}" if path else key

        if "ALLOW_ALL_KEYS" in sdict:
            spec = sdict["ALLOW_ALL_KEYS"]
            for key in sorted(obj):
                r = self._check_value(obj[key], spec, child(key))
                if r is not None:
                    return r
            return None
        # stage 1: missing required keys, sorted by stripped name
        stripped = {self._strip(k): k for k in sdict}
        # the reference accepts a data key in its LITERAL prefixed
        # form too ("_TrainingMode" in the data matching the
        # "_TrainingMode" spec entry) — but only for OPTIONAL spec
        # keys: a required-nullable key's PRESENCE is satisfied only
        # by the stripped form (JsonModelElement.py check_keys
        # :323-330 — the nullable branch re-probes the stripped name
        # in the data and rejects when absent), while its literal
        # form's VALUE is still checked when present (parse_json_dict
        # iterates DATA keys via get_full_key probing :221-223).
        # When BOTH forms are present, keep both: neither wins —
        # stage 2 checks both values and stage 3 treats the literal
        # form as a known key.
        renames = {
            k: self._strip(k)
            for k in obj
            if k in sdict and k not in stripped and self._is_optional(k)
            and self._strip(k) not in obj
        }
        if renames:
            obj = {renames.get(k, k): v for k, v in obj.items()}
        for sk in sorted(stripped):
            fk = stripped[sk]
            if sk not in obj and not self._is_optional(fk):
                return f"missing:{child(sk)}"
        # stage 2: per-key value checks (sorted), depth-first; when
        # the data carries both the stripped and the literal-prefixed
        # form of one spec key, BOTH values are checked (reference
        # probes each data key independently)
        for sk in sorted(stripped):
            fk = stripped[sk]
            for dk in (sk, fk) if (fk != sk and fk in obj) else (sk,):
                if dk not in obj:
                    continue
                value = obj[dk]
                if value is None and self._is_nullable(fk):
                    continue
                if value is None and sdict[fk] != "NULL_OBJECT":
                    # incl. ALLOW_ALL: the reference rejects null there
                    # unless the key carries the nullable prefix
                    # (JsonModelElement.py parse_json_object None branch)
                    return f"null:{child(sk)}"
                r = self._check_value(value, sdict[fk], child(sk))
                if r is not None:
                    return r
        # stage 3: unexpected keys, sorted (a literal-prefixed form
        # kept alongside its stripped sibling is a known spec key,
        # not unexpected)
        if not self.allow_all_fields:
            for key in sorted(obj):
                if key not in stripped and key not in sdict:
                    return f"unexpected:{child(key)}"
        return None

    def check_document(self, text: str | None) -> str | None:
        """Validate one JSON document; None = valid, else the first
        canonical ``reason:keypath``."""
        if text is None:
            return "bad_json:"
        try:
            obj = json.loads(text)
        except (ValueError, TypeError):
            return "bad_json:"
        if not isinstance(obj, dict):
            return "not_object:"
        return self._check_object(obj, self.schema, "")


def json_schema_validate(
    col,
    schema: dict | JsonSchema,
    flag_name: str = "valid",
    reason_name: str = "reject_reason",
    **schema_kwargs,
) -> dict[str, pa.Array]:
    """Validate a JSON-string column against a JsonSchema. Returns
    ``{flag_name: bool array, reason_name: string array}`` (reason is
    null for valid rows). Row-level json.loads is unavoidable without
    a JSON kernel in this pyarrow build; the loop runs inside
    distributed map_batches tasks."""
    js = schema if isinstance(schema, JsonSchema) else JsonSchema(schema, **schema_kwargs)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    reasons = [js.check_document(v.as_py()) for v in col]
    return {
        flag_name: pa.array([r is None for r in reasons], pa.bool_()),
        reason_name: pa.array(reasons, pa.string()),
    }


def parse_datetime(col, fmt: str = "%Y-%m-%d %H:%M:%S") -> pa.Array:
    """String → timestamp[us]; unparseable rows become null (the
    reference raises per-atom parse failure; columnar recast flags)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.strptime(col, format=fmt, unit="us", error_is_null=True)


def parse_datetime_multi(col, formats: list[str]) -> pa.Array:
    """First-match over multiple %-formats —
    MultiLocaleDateTimeModelElement semantics (reference:
    aminer/parsing/DateTimeModelElement.py:423-527): each row takes
    the first format that parses; all-fail → null."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = None
    for fmt in formats:
        parsed = pc.strptime(col, format=fmt, unit="us", error_is_null=True)
        out = parsed if out is None else pc.if_else(pc.is_valid(out), out, parsed)
    return out if out is not None else pa.nulls(len(col), pa.timestamp("us"))


def parse_int(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # cast with safe=False maps unparseable to error; use regex guard
    valid = pc.match_substring_regex(col, r"^[+-]?\d+$")
    guarded = pc.if_else(pc.fill_null(valid, False), col, pa.scalar(None, pa.string()))
    return pc.cast(guarded, pa.int64())


def parse_float(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = pc.match_substring_regex(col, r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
    guarded = pc.if_else(pc.fill_null(valid, False), col, pa.scalar(None, pa.string()))
    return pc.cast(guarded, pa.float64())


def parse_hex(col, upper_case: bool = False) -> pa.Array:
    """Hex-digit string column → decoded bytes (binary, null on
    non-hex input; odd-length strings are left-padded with '0') —
    HexStringModelElement semantics (reference:
    aminer/parsing/HexStringModelElement.py:19-49). RE2 validity
    guard vectorized; the decode itself is C-speed bytes.fromhex."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    rx = r"^[0-9A-F]+$" if upper_case else r"^[0-9a-f]+$"
    valid = pc.fill_null(pc.match_substring_regex(col, rx), False).to_numpy(
        zero_copy_only=False
    )
    vals = col.to_pylist()
    out = [
        bytes.fromhex(v if len(v) % 2 == 0 else "0" + v) if ok else None
        for v, ok in zip(vals, valid)
    ]
    return pa.array(out, pa.binary())


def parse_base64(col) -> pa.Array:
    """Base64 string column → decoded bytes (binary, null when the
    column value is not canonical base64) — Base64StringModelElement
    semantics (reference:
    aminer/parsing/Base64StringModelElement.py:21-52; the reference
    strips the longest base64 prefix, the columnar recast validates
    the whole value). Vectorized RE2 guard + C-speed b64decode."""
    import base64 as _b64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    rx = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
    valid = pc.fill_null(pc.match_substring_regex(col, rx), False).to_numpy(
        zero_copy_only=False
    )
    vals = col.to_pylist()
    out = [
        _b64.b64decode(v) if ok and v else None for v, ok in zip(vals, valid)
    ]
    return pa.array(out, pa.binary())


def parse_ipv6(col) -> pa.Array:
    """RFC4291 §2.2 IPv6 string → 16-byte big-endian binary
    (``fixed_size_binary`` keeps the full 128 bits; int64 can't) —
    IpAddressDataModelElement(ipv6=True) match_object semantics
    (reference: aminer/parsing/IpAddressDataModelElement.py:36-63,
    extract_ipv6_address :81-93): '::' zero-run expansion, hextets
    ≤ 4 hex digits, and embedded trailing IPv4 forms
    (``::FFFF:1.2.3.4``) REJECTED like the reference element; null
    on any failure. Row-wise stdlib parse — IP columns are narrow
    and rare relative to the text hot path; the RE2 guard skips the
    Python parse for rows that cannot possibly match."""
    import ipaddress

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    guard = pc.fill_null(
        pc.match_substring_regex(col, r"^[0-9A-Fa-f:]{2,39}$"), False
    ).to_numpy(zero_copy_only=False)
    out: list[bytes | None] = []
    for s, ok in zip(col.to_pylist(), guard):
        if not ok:
            out.append(None)
            continue
        try:
            out.append(ipaddress.IPv6Address(s).packed)
        except ValueError:
            out.append(None)
    return pa.array(out, pa.binary(16))


def ipv6_to_int_pair(parsed: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(hi, lo) int64 views of a parse_ipv6 column for groupby /
    compare stages. Each u64 half is BIASED by -2^63 (the XOR-sign
    trick) so unsigned address order survives int64 sorting."""
    import numpy as np

    vals = parsed.to_pylist()
    hi = [int.from_bytes(v[:8], "big", signed=False) - (1 << 63) if v else None
          for v in vals]
    lo = [int.from_bytes(v[8:], "big", signed=False) - (1 << 63) if v else None
          for v in vals]
    return pa.array(hi, pa.int64()), pa.array(lo, pa.int64())


def parse_ipv4(col) -> pa.Array:
    """Dotted-quad string → int (match_object semantics of
    IpAddressDataModelElement)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern(col, ".")
    out = np.full(len(col), -1, dtype=np.int64)
    lists = parts.to_pylist()
    for i, p in enumerate(lists):
        if p is None or len(p) != 4:
            continue
        try:
            o = [int(x) for x in p]
        except ValueError:
            continue
        if all(0 <= x <= 255 for x in o):
            out[i] = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    return pa.array([int(x) if x >= 0 else None for x in out], pa.int64())


def xml_extract(
    col, paths: dict[str, pa.DataType], flag_name: str = "parse_ok"
) -> dict[str, pa.Array]:
    """XmlModelElement recast (reference:
    aminer/parsing/XmlModelElement.py:45-406): extract element text /
    ``@attribute`` values at '/'-separated paths from an XML string
    column; unparseable rows → nulls + flag. stdlib ElementTree per
    row (C-accelerated expat), same execution shape as
    ``json_extract``."""
    import xml.etree.ElementTree as ET

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    ok = np.zeros(n, dtype=bool)
    raw: dict[str, list] = {p: [None] * n for p in paths}
    for i in range(n):
        v = col[i].as_py()
        if not v:
            continue
        try:
            root = ET.fromstring(v)
            ok[i] = True
        except ET.ParseError:
            continue
        for p in paths:
            parts = p.split("/")
            attr = None
            if parts and parts[-1].startswith("@"):
                attr = parts[-1][1:]
                parts = parts[:-1]
            cur = root
            found = True
            for part in parts:
                nxt = cur.find(part)
                if nxt is None:
                    found = False
                    break
                cur = nxt
            if not found:
                continue
            raw[p][i] = cur.get(attr) if attr else (cur.text or "")
    out: dict[str, pa.Array] = {}
    for p, typ in paths.items():
        name = p.replace("/", "_").replace("@", "")
        vals = raw[p]
        if pa.types.is_integer(typ) or pa.types.is_floating(typ):
            conv = []
            for v in vals:
                try:
                    conv.append(None if v is None else (int(v) if pa.types.is_integer(typ) else float(v)))
                except ValueError:
                    conv.append(None)
            out[name] = pa.array(conv, typ)
        else:
            out[name] = pa.array(vals, typ)
    out[flag_name] = pa.array(ok)
    return out


def fixed_wordlist_index(col, words: list[str]) -> pa.Array:
    """Value → index in the word list, null if absent."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    idx = pc.index_in(col, value_set=pa.array(words, pa.string()))
    return idx


# ---------------------------------------------------------------------------
# Declarative line model (parsing-model combinator recast)
# ---------------------------------------------------------------------------

_LINE_KINDS = {
    # kind -> (regex fragment template, output Arrow type tag)
    "fixed": (None, "drop"),          # literal, not captured
    # reference DecimalInteger/Float DEFAULTS: no sign, no leading-
    # zero padding (SIGN_TYPE_NONE + PAD_TYPE_NONE, DecimalIntegerValue
    # ModelElement.py); the s-variants are SIGN_TYPE_OPTIONAL (and
    # sfloat adds the optional exponent)
    "int": (r"(?:0|[1-9]\d*)", "int"),
    "sint": (r"[+-]?(?:0|[1-9]\d*)", "int"),
    "float": (r"(?:0|[1-9]\d*)(?:\.\d+)?", "float"),
    "sfloat": (r"[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?", "float"),
    "word": (r"\S+", "str"),          # WhiteSpaceLimitedDataModelElement
    "delimited": (None, "str"),       # bytes until delimiter; arg may be
                                      # (delim, escape) for escaped runs
    "varbyte": (None, "str"),         # VariableByteDataModelElement:
                                      # arg = allowed-character alphabet
    "wordlist": (None, "str"),        # FixedWordlistDataModelElement:
                                      # arg = list of words, longest wins
    "pattern": (None, "str"),         # raw RE2 fragment (arg) — custom
                                      # leaf shapes (e.g. syslog time)
    # AnyByteDataModelElement REJECTS empty remaining data
    # (AnyByteDataModelElement.py:27-29 `if not match_data: None`)
    "any": (r".+", "str"),
    # value-strict octets: the reference's simple \d{1,3} regex is
    # followed by an extract that REJECTS octets > 255 (but accepts
    # leading zeros) — for whole-value semantics that equals this
    # class (IpAddressDataModelElement.py:70-77)
    "ipv4": (r"(?:(?:25[0-5]|2[0-4]\d|[01]?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|[01]?\d?\d)", "ipv4"),
    # RE2-safe superset of RFC4291 text forms (no embedded IPv4 —
    # the reference element rejects those); parse_ipv6 nulls any
    # overmatch the fragment lets through
    "ipv6": (r"(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|(?:[0-9A-Fa-f]{1,4}:){1,7}:|:(?::[0-9A-Fa-f]{1,4}){1,7}|(?:[0-9A-Fa-f]{1,4}:){1,6}(?::[0-9A-Fa-f]{1,4}){1,6}|::)", "ipv6"),
    "datetime": (None, "datetime"),   # strptime after extraction
    "alnum": (r"[A-Za-z0-9]+", "str"),  # VariableByte over alnum
    "hex": (r"[0-9a-fA-F]+", "hex"),
    "optional": (None, None),         # wraps a sub-field
}


def line_model_regex(spec: list[tuple]) -> tuple[str, list[tuple[str, str, object]]]:
    """Compile a declarative LINE MODEL — the reference's linear
    SequenceModelElement of leaf elements (SURVEY §2.2;
    aminer/parsing/SequenceModelElement.py:19-49 over Fixed /
    Decimal / Delimited / WhiteSpaceLimited / AnyByte / Hex / IP /
    DateTime leaves) — into ONE anchored RE2 pattern with a named
    group per value field.

    ``spec`` entries: ``("name", kind)`` or ``("name", kind, arg)``;
    kinds: fixed(arg=literal) int float word delimited(arg=delim)
    any ipv4 alnum hex datetime(arg=strptime fmt);
    ``("name", "optional", inner_entry)`` makes one field optional
    (OptionalMatchModelElement). Returns (pattern, fields) where
    fields = [(group_name, type_tag, arg)]."""
    import re as _re

    parts = ["^"]
    fields: list[tuple[str, str, object]] = []
    for entry in spec:
        name, kind = entry[0], entry[1]
        arg = entry[2] if len(entry) > 2 else None
        optional = False
        if kind == "branch":
            raise ValueError(
                "'branch' entries need per-row dispatch — use parse_lines "
                "(ElementValueBranchModelElement recast), not a single "
                "compiled pattern"
            )
        if kind == "optional":
            optional = True
            inner = arg
            name, kind = inner[0], inner[1]
            arg = inner[2] if len(inner) > 2 else None
        if kind == "debug":
            # DebugModelElement (reference: aminer/parsing/
            # DebugModelElement.py:22-50): zero-width, always matches,
            # reports the parse position + unmatched remainder to
            # stderr. RE2 has no zero-width capture (no lookahead), so
            # the tap contributes NOTHING to the main pattern; instead
            # we record the prefix compiled so far and parse_lines runs
            # one auxiliary `prefix(?P<name>.*)` extraction per block,
            # logging the reach count and a remainder sample — the
            # per-block analogue of the reference's per-atom print.
            import sys as _sys

            msg = f"DebugModelElement {name} added"
            print(msg, file=_sys.stderr)
            fields.append((name, "debug", "".join(parts)))
            continue
        if kind == "repeated":
            # RepeatedElementDataModelElement (min..max reps of a
            # leaf, separator-joined) — capture the whole run, split
            # to a list column in the typed-cast phase
            inner_kind, sep, lo_n, hi_n = arg
            inner_frag = _LINE_KINDS[inner_kind][0]
            import re as _re2

            frag = (
                f"(?:{inner_frag}(?:{_re2.escape(sep)}{inner_frag})"
                + "{%d,%d})" % (max(lo_n - 1, 0), hi_n - 1)
            )
            group = f"(?P<{name}>{frag})"
            parts.append(f"(?:{group})?" if optional else group)
            fields.append((name, "repeated", (inner_kind, sep)))
            continue
        if kind == "fixed":
            frag = _re.escape(arg)
            parts.append(f"(?:{frag})?" if optional else frag)
            continue
        if kind == "delimited":
            # the reference requires AT LEAST one byte before the
            # delimiter (DelimitedDataModelElement.py:48 `if
            # match_len < 1: None`) — all three fragment shapes are
            # one-or-more; delimiter PRESENCE is enforced by the
            # following fixed leaf the spec must carry
            if isinstance(arg, tuple):
                # DelimitedDataModelElement with an escape byte: an
                # escaped char never terminates the run
                delim, esc = arg
                frag = f"(?:[^{_re.escape(delim + esc)}]|{_re.escape(esc)}.)+"
            elif len(arg) > 1:
                # multi-char delimiter (" from ", ") RELOAD ("): a
                # char class would wrongly exclude every delimiter
                # CHARACTER from the run — a lazy run cut by the
                # following fixed literal matches the reference's
                # first-occurrence-of-the-SEQUENCE semantics (the
                # spec must follow with that literal as a fixed leaf)
                frag = r"(?:.+?)"
            else:
                frag = f"[^{_re.escape(arg)}]+"
        elif kind == "varbyte":
            frag = f"[{_re.escape(arg)}]+"
        elif kind == "wordlist":
            words = sorted(arg, key=len, reverse=True)  # longest-match
            frag = "(?:" + "|".join(_re.escape(w) for w in words) + ")"
        elif kind == "pattern":
            frag = f"(?:{arg})"
        elif kind == "datetime":
            # build a permissive fragment from the strptime format
            frag = _re.escape(arg)
            for pat, sub in (
                ("%Y", r"\d{4}"), ("%m", r"\d{2}"), ("%d", r"\d{2}"),
                ("%H", r"\d{2}"), ("%M", r"\d{2}"), ("%S", r"\d{2}"),
                ("%b", r"[A-Za-z]{3}"),
            ):
                frag = frag.replace(_re.escape(pat), sub)
        else:
            frag = _LINE_KINDS[kind][0]
        group = f"(?P<{name}>{frag})"
        parts.append(f"(?:{group})?" if optional else group)
        fields.append((name, "datetime" if kind == "datetime" else _LINE_KINDS[kind][1], arg))
    parts.append("$")
    return "".join(parts), fields


def line_model_parse_fn(spec: list[tuple], line_col: str = "line"):
    """The per-batch parse callable used by ``parse_lines`` —
    exposed so the debug-tap stderr contract can be exercised
    deterministically in-process (worker stderr reaches the driver
    only via Ray's async log forwarding)."""
    return _make_parse(spec, line_col)


def parse_lines(
    ds: "ray.data.Dataset", spec: list[tuple], line_col: str = "line",
    diagnose: bool = False,
) -> "ray.data.Dataset":
    """Apply a compiled line model to a string/binary column: ONE
    vectorized ``pc.extract_regex`` per block (RE2, no per-row
    Python), then typed casts per field — int/float null-on-failure,
    ipv4 → uint32 int, hex → parsed bytes length-checked, datetime →
    timestamp[us]. Rows that do not match the model keep nulls and
    ``parse_ok = false`` (the reference's unparsed-atom path).

    A spec may carry ONE ``("name", "branch", (value_entry,
    branch_dict, default_spec))`` entry — the
    ElementValueBranchModelElement recast (reference:
    aminer/parsing/ElementValueBranchModelElement.py:22-88): the
    value leaf parses first, its STRING value selects the follow-on
    sub-spec from ``branch_dict`` (``default_spec`` on miss, fail
    when None), and the row matches only if the selected branch's
    full pattern does — a failed branch NEVER falls back to another
    (the reference's possessive value parse). Adds a
    ``{name}_branch`` column naming the winning key. Not combinable
    with ``diagnose=True``.

    ``diagnose=True`` adds the VerboseUnparsedAtomHandler columns
    (reference analysis/UnparsedAtomHandlers.py:75-100 over
    parsing/MatchContext.py:47-104 DebugMatchContext): for each
    UNPARSED row, ``matched_prefix_len`` = bytes consumed by the
    longest leaf-prefix of the model that still matches (the
    reference's stepwise per-leaf consumption before the failing
    leaf) and ``unmatched_data`` = the remaining suffix (the
    reference's shortest_unmatched_data). Parsed rows keep nulls.
    Cost: up to len(spec) extra vectorized extractions over ONLY the
    failed subset of each block."""
    if any(e[1] == "branch" for e in spec):
        if diagnose:
            raise ValueError("diagnose=True is not supported with a "
                             "'branch' entry")
        fn = _make_branch_parse(spec, line_col)
    else:
        fn = _make_parse(spec, line_col, diagnose=diagnose)
    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


def line_model_prefixes(spec: list[tuple]) -> list[tuple[str, bool]]:
    """Cumulative UNANCHORED-at-end prefix patterns of a line model,
    one per spec entry — the regex analogue of the reference
    MatchContext consumption boundary after each leaf. The bool flag
    marks prefixes ending in an int/float-family leaf: the reference
    DecimalInteger/Float REJECTS '0'+digit outright rather than
    matching the '0' (DecimalIntegerValueModelElement.py:
    leading-zero check), so their remainder must not start with a
    digit (RE2 has no lookahead — the caller guards the rest
    group)."""
    out = []
    for k in range(1, len(spec) + 1):
        pattern, _ = line_model_regex(spec[:k])
        kind = spec[k - 1][1]
        if kind == "optional":
            kind = spec[k - 1][2][1]
        out.append((pattern[:-1], kind in ("int", "sint", "float", "sfloat")))
    return out


def _make_parse(spec: list[tuple], line_col: str, diagnose: bool = False):
    pattern, fields = line_model_regex(spec)
    prefixes = line_model_prefixes(spec) if diagnose else []

    def parse(batch: pa.Table) -> pa.Table:
        col = batch[line_col]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            col = pc.cast(col, pa.large_string())
        s = pc.fill_null(pc.cast(col, pa.string()), "")
        ex = pc.extract_regex(s, pattern)
        ok = pc.is_valid(ex)
        out = batch.append_column("parse_ok", ok)
        if diagnose:
            import numpy as np

            n = len(s)
            okn = ok.to_numpy(zero_copy_only=False)
            rest = np.full(n, None, dtype=object)
            idx = np.flatnonzero(~okn)
            if idx.size:
                sub = pc.take(s, pa.array(idx, pa.int64()))
                # zero leaves consumed -> the whole line is unmatched
                best = np.array(sub.to_pylist(), dtype=object)
                for pfx, int_final in prefixes:
                    rest_frag = (r"(?P<zz_rest>|[^0-9].*)$" if int_final
                                 else r"(?P<zz_rest>.*)$")
                    aux = pc.extract_regex(sub, pfx + rest_frag)
                    rv = pc.struct_field(aux, "zz_rest").to_numpy(
                        zero_copy_only=False)
                    m = np.array([v is not None for v in rv])
                    # prefixes grow monotonically: later (longer)
                    # matches overwrite, yielding the deepest reach
                    best[m] = rv[m]
                rest[idx] = best
            rest_arr = pa.array(rest, pa.string())
            plen = pc.subtract(
                pc.binary_length(s), pc.binary_length(rest_arr))
            out = out.append_column("matched_prefix_len", plen)
            out = out.append_column("unmatched_data", rest_arr)
        for name, tag, arg in fields:
            if tag == "debug":
                # auxiliary extraction against the prefix up to the
                # debug tap; always matches when the prefix does
                import sys as _sys

                aux = pc.extract_regex(s, arg + f"(?P<{name}>.*)$")
                vals = pc.struct_field(aux, name)
                reached = pc.sum(
                    pc.cast(pc.is_valid(vals), pa.int64())
                ).as_py() or 0
                sample = next(
                    (v for v in vals.slice(0, 8).to_pylist() if v is not None),
                    None,
                )
                msg = (
                    f'DebugModelElement path = "{name}", reached = '
                    f"{reached}/{len(s)}, unmatched = {sample!r}"
                )
                print(msg, file=_sys.stderr)
                out = out.append_column(name, vals)
                continue
            vals = pc.struct_field(ex, name)
            # an absent OPTIONAL group captures "" (extract_regex has
            # no null-for-unmatched-group); no numeric leaf can
            # legitimately capture "" — null it before the cast
            if tag in ("int", "float"):
                vals = pc.if_else(
                    pc.equal(vals, ""), pa.scalar(None, pa.string()), vals
                )
            if tag == "int":
                vals = pc.cast(vals, pa.int64(), safe=False)
            elif tag == "float":
                vals = pc.cast(vals, pa.float64(), safe=False)
            elif tag == "ipv4":
                vals = parse_ipv4(vals)
            elif tag == "ipv6":
                vals = parse_ipv6(vals)
            elif tag == "hex":
                vals = parse_hex(vals)
            elif tag == "datetime":
                vals = parse_datetime(vals, arg or "%Y-%m-%d %H:%M:%S")
            elif tag == "repeated":
                vals = _split_repeated(vals, arg)
            out = out.append_column(name, vals)
        return out

    return parse


def _cast_field(vals, tag: str, arg):
    """Typed cast for one captured field — the shared tail of every
    parse path (empty-capture guard + per-tag conversion)."""
    if tag in ("int", "float"):
        vals = pc.if_else(
            pc.equal(vals, ""), pa.scalar(None, pa.string()), vals
        )
    if tag == "int":
        return pc.cast(vals, pa.int64(), safe=False)
    if tag == "float":
        return pc.cast(vals, pa.float64(), safe=False)
    if tag == "ipv4":
        return parse_ipv4(vals)
    if tag == "ipv6":
        return parse_ipv6(vals)
    if tag == "hex":
        return parse_hex(vals)
    if tag == "datetime":
        return parse_datetime(vals, arg or "%Y-%m-%d %H:%M:%S")
    if tag == "repeated":
        return _split_repeated(vals, arg)
    return vals


def _make_branch_parse(spec: list[tuple], line_col: str):
    """Compile a spec carrying one 'branch' entry (see parse_lines
    docstring) into a per-batch dispatch: one value-probe extraction
    selects each row's branch, then one anchored extraction per
    branch variant runs and is masked to its rows. A row whose
    selected branch pattern fails is unparsed — there is NO fallback
    to other branches or the default (reference
    ElementValueBranchModelElement.py:85-88: branch_match None →
    whole element None)."""
    import re as _re

    bidx = [i for i, e in enumerate(spec) if e[1] == "branch"]
    if len(bidx) != 1:
        raise ValueError("exactly one 'branch' entry per spec")
    i = bidx[0]
    bname = spec[i][0]
    value_entry, branch_dict, default_spec = spec[i][2]
    pre, post = list(spec[:i]), list(spec[i + 1:])
    pre_pat, pre_fields = line_model_regex(pre)
    pre_frag = pre_pat[1:-1]
    post_pat, post_fields = line_model_regex(post)
    post_frag = post_pat[1:-1]
    v_pat, v_fields = line_model_regex([value_entry])
    if len(v_fields) != 1:
        raise ValueError(
            "the branch value leaf must be a single capturing kind "
            "(not 'fixed') — the reference dispatches on its value"
        )
    v_frag = v_pat[1:-1]
    (v_name, v_tag, v_arg), = v_fields

    # variant = (key, full anchored pattern, branch-specific fields)
    variants: list[tuple[str | None, str, list[tuple]]] = []
    for key, sub in branch_dict.items():
        sub_pat, sub_fields = line_model_regex(sub)
        kv = f"(?P<{v_name}>{_re.escape(key)})"
        variants.append(
            (key, "^" + pre_frag + kv + sub_pat[1:-1] + post_frag + "$",
             sub_fields)
        )
    if default_spec is not None:
        d_pat, d_fields = line_model_regex(default_spec)
        variants.append(
            (None, "^" + pre_frag + v_frag + d_pat[1:-1] + post_frag + "$",
             d_fields)
        )
    keys = [k for k, _, _ in variants if k is not None]
    probe = "^" + pre_frag + v_frag

    def parse(batch: pa.Table) -> pa.Table:
        import numpy as np

        col = batch[line_col]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            col = pc.cast(col, pa.large_string())
        s = pc.fill_null(pc.cast(col, pa.string()), "")
        n = len(s)
        probe_ex = pc.extract_regex(s, probe)
        valnp = pc.struct_field(probe_ex, v_name).to_numpy(
            zero_copy_only=False)
        known = np.zeros(n, dtype=bool)
        for k in keys:
            known |= valnp == k
        parsed_probe = np.array([v is not None for v in valnp])

        ok_total = np.zeros(n, dtype=bool)
        blabel = np.full(n, None, dtype=object)
        merged: dict[str, pa.Array] = {}
        tags: dict[str, tuple[str, object]] = {}
        for key, pattern, sub_fields in variants:
            mask = (valnp == key) if key is not None \
                else (parsed_probe & ~known)
            if key is None and default_spec is None:
                continue
            ex = pc.extract_regex(s, pattern)
            win = pc.is_valid(ex).to_numpy(zero_copy_only=False) & mask
            ok_total |= win
            blabel[win] = key if key is not None else "<default>"
            win_arr = pa.array(win)
            for fname, tag, arg in (
                pre_fields + [(v_name, v_tag, v_arg)] + sub_fields
                + post_fields
            ):
                vals = _cast_field(pc.struct_field(ex, fname), tag, arg)
                if fname in merged:
                    if tags[fname][0] != tag:
                        raise ValueError(
                            f"field {fname!r} has conflicting kinds "
                            f"across branches"
                        )
                    merged[fname] = pc.if_else(
                        win_arr, vals, merged[fname])
                else:
                    merged[fname] = pc.if_else(
                        win_arr, vals, pa.nulls(n, type=vals.type))
                    tags[fname] = (tag, arg)
        out = batch.append_column("parse_ok", pa.array(ok_total))
        out = out.append_column(
            f"{bname}_branch", pa.array(blabel, pa.string()))
        for fname, arr in merged.items():
            out = out.append_column(fname, arr)
        return out

    return parse


def _split_repeated(vals, arg) -> pa.Array:
    """Split a captured repeated-run string into a typed LIST column
    (int/float lists cast element-wise; others stay list<string>).
    Unmatched rows (null capture) stay null lists."""
    inner_kind, sep = arg
    lst = pc.split_pattern(vals, sep)
    if inner_kind == "int":
        return pc.cast(lst, pa.list_(pa.int64()), safe=False)
    if inner_kind == "float":
        return pc.cast(lst, pa.list_(pa.float64()), safe=False)
    return lst


def parse_lines_first_match(
    ds: "ray.data.Dataset", specs: dict[str, list[tuple]], line_col: str = "line"
) -> "ray.data.Dataset":
    """FirstMatchModelElement over whole line models (reference:
    aminer/parsing/FirstMatchModelElement.py:17-38): each row is
    parsed by the FIRST model whose pattern matches; ``model`` names
    the winner (null = unparsed). One ``pc.extract_regex`` per model
    per block — still fully vectorized; fields of non-winning models
    stay null, so the union schema is the Arrow analogue of the
    reference's union parse tree."""
    compiled = {name: line_model_regex(spec) for name, spec in specs.items()}

    def parse(batch: pa.Table) -> pa.Table:
        col = batch[line_col]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            col = pc.cast(col, pa.large_string())
        s = pc.fill_null(pc.cast(col, pa.string()), "")
        import numpy as np

        n = len(s)
        taken = np.zeros(n, dtype=bool)
        model = np.full(n, None, dtype=object)
        out = batch
        for name, (pattern, fields) in compiled.items():
            ex = pc.extract_regex(s, pattern)
            ok = pc.is_valid(ex).to_numpy(zero_copy_only=False)
            win = ok & ~taken
            taken |= win
            model[win] = name
            win_arr = pa.array(win)
            for fname, tag, arg in fields:
                if tag == "debug":
                    # debug tap inside a FirstMatch branch: remainder
                    # only meaningful on rows this model wins
                    aux = pc.extract_regex(s, arg + f"(?P<{fname}>.*)$")
                    dv = pc.if_else(
                        win_arr,
                        pc.struct_field(aux, fname),
                        pa.nulls(n, type=pa.string()),
                    )
                    out = out.append_column(f"{name}.{fname}", dv)
                    continue
                vals = pc.struct_field(ex, fname)
                # same empty-capture guard as _make_parse: absent
                # optional groups capture "" and would break the cast
                if tag in ("int", "float"):
                    vals = pc.if_else(
                        pc.equal(vals, ""), pa.scalar(None, pa.string()), vals
                    )
                if tag == "int":
                    vals = pc.cast(vals, pa.int64(), safe=False)
                elif tag == "float":
                    vals = pc.cast(vals, pa.float64(), safe=False)
                elif tag == "ipv4":
                    vals = parse_ipv4(vals)
                elif tag == "ipv6":
                    vals = parse_ipv6(vals)
                elif tag == "hex":
                    vals = parse_hex(vals)
                elif tag == "datetime":
                    vals = parse_datetime(vals, arg or "%Y-%m-%d %H:%M:%S")
                vals = pc.if_else(win_arr, vals, pa.nulls(n, type=vals.type))
                col_name = f"{name}.{fname}"
                out = out.append_column(col_name, vals)
        return out.append_column("model", pa.array(model, pa.string()))

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
