"""Domain / first-seen-value constraints.

Recasts (clean-room):
- NewMatchPathValueDetector (reference:
  aminer/analysis/NewMatchPathValueDetector.py:68-120) — learned set
  of values per path; here the fit phase is a distinct-values
  aggregate and the validate phase flags values outside the learned
  domain.
- NewMatchPathValueComboDetector (reference:
  aminer/analysis/NewMatchPathValueComboDetector.py:85-143) — same
  over value TUPLES across several columns.
- EnhancedNewMatchPathValueComboDetector (reference:
  aminer/analysis/EnhancedNewMatchPathValueComboDetector.py:27-228)
  — combos annotated with (first_ts, last_ts, count) via
  ``_agg.grouped_span_count``.
- NewMatchPathDetector (reference:
  aminer/analysis/NewMatchPathDetector.py:61-105) — "known parser
  paths" become known COLUMNS: schema conformance of each block
  against the declared Arrow schema.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..schema import violations_table
from ._agg import distinct_rows, grouped_counts, grouped_span_count
from ._taskcache import cached_task_fn


def value_domain(ds: "ray.data.Dataset", cols: list[str]) -> "ray.data.Dataset":
    """Fit: distinct value tuples with occurrence counts (the
    learned domain; counts aid later PSI drift checks)."""
    return grouped_counts(ds, cols)


def distinct_values(ds: "ray.data.Dataset", cols: list[str]) -> "ray.data.Dataset":
    return distinct_rows(ds, cols)


def combo_span_counts(
    ds: "ray.data.Dataset", cols: list[str], ts_col: str
) -> "ray.data.Dataset":
    return grouped_span_count(ds, cols, ts_col)


def domain_violations(
    ds: "ray.data.Dataset",
    col: str,
    allowed_ref: "ray.ObjectRef",
    key_col: str | None = None,
    check_name: str = "NewMatchPathValueDetector",
) -> "ray.data.Dataset":
    """Validate: rows whose ``col`` value is outside the broadcast
    learned domain → violation rows. ``allowed_ref`` is a
    ``ray.put`` list/set of allowed values (read once per task from
    the local object store)."""

    class DomainCheck:
        def __init__(self):
            allowed = ray.get(allowed_ref)
            self.allowed = pa.array(sorted(str(v) for v in allowed), pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = pc.cast(batch[col], pa.string())
            bad = pc.invert(pc.is_in(vals, value_set=self.allowed))
            bad = pc.fill_null(bad, True)  # null = out of domain
            t = batch.filter(bad)
            if t.num_rows == 0:
                return violations_table(check_name, "", [], [], [], "")
            keys = (
                pc.cast(t[key_col], pa.string()).to_pylist()
                if key_col
                else [""] * t.num_rows
            )
            vs = pc.cast(t[col], pa.string()).to_pylist()
            return violations_table(
                check=check_name,
                message=f"new value for path '{col}' outside learned domain",
                keys=keys,
                affected_paths=[col],
                affected_values=[[str(v)] for v in vs],
                expected='{"domain": "learned"}',
            )

    return ds.map_batches(
        cached_task_fn(DomainCheck, cache_on=(allowed_ref, col, key_col, check_name)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


# Arrow → SQL (DuckDB-style) type names, the neutral space in which
# declared schemas are written so the conformance result is
# recomputable by an external SQL engine reading the same parquet
_ARROW_TO_SQL = {
    "int8": "TINYINT", "int16": "SMALLINT", "int32": "INTEGER", "int64": "BIGINT",
    "uint8": "UTINYINT", "uint16": "USMALLINT", "uint32": "UINTEGER", "uint64": "UBIGINT",
    "float": "FLOAT", "double": "DOUBLE", "bool": "BOOLEAN",
    "string": "VARCHAR", "large_string": "VARCHAR",
    "binary": "BLOB", "large_binary": "BLOB",
    "timestamp[us]": "TIMESTAMP", "timestamp[ns]": "TIMESTAMP_NS",
    "timestamp[ms]": "TIMESTAMP_MS", "timestamp[s]": "TIMESTAMP_S",
    "date32[day]": "DATE",
}


def schema_conformance_table(
    ds: "ray.data.Dataset", declared: dict[str, str]
) -> pa.Table:
    """NewMatchPathDetector recast as a *recomputable* schema diff:
    (col, kind, actual_type) rows where kind ∈ {new_path,
    type_mismatch, missing}. ``declared`` maps column → SQL type name
    (the portable space of ``_ARROW_TO_SQL``), so an external SQL
    engine's DESCRIBE of the same table reproduces the rows exactly.
    Reference: aminer/analysis/NewMatchPathDetector.py:61-105 (known
    parser paths ≙ known typed columns)."""
    actual = {
        f.name: _ARROW_TO_SQL.get(str(f.type), str(f.type))
        for f in ds.schema().base_schema
    }
    cols, kinds, types = [], [], []
    for name, typ in actual.items():
        if name not in declared:
            cols.append(name); kinds.append("new_path"); types.append(typ)
        elif declared[name] != typ:
            cols.append(name); kinds.append("type_mismatch"); types.append(typ)
    for name in declared:
        if name not in actual:
            cols.append(name); kinds.append("missing"); types.append("<absent>")
    return pa.table(
        {
            "col": pa.array(cols, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "actual_type": pa.array(types, pa.string()),
        }
    )


def schema_conformance_violations(
    ds: "ray.data.Dataset",
    expected_columns: dict[str, str],
    check_name: str = "NewMatchPathDetector",
) -> pa.Table:
    """Known-paths check: the dataset schema vs the declared one.
    New columns (paths never seen) and missing/mistyped columns are
    violations — the one check that is metadata-only and free."""
    actual = {f.name: str(f.type) for f in ds.schema().base_schema}
    rows_k, rows_v, rows_m = [], [], []
    for name, typ in actual.items():
        if name not in expected_columns:
            rows_k.append(name); rows_v.append([name, typ]); rows_m.append("new path (column) not in declared schema")
        elif expected_columns[name] != typ:
            rows_k.append(name); rows_v.append([name, typ]); rows_m.append(
                f"type mismatch: expected {expected_columns[name]}"
            )
    for name in expected_columns:
        if name not in actual:
            rows_k.append(name); rows_v.append([name, "<absent>"]); rows_m.append("declared path missing")
    if not rows_k:
        return violations_table(check_name, "", [], [], [], "")
    import json

    return pa.concat_tables(
        [
            violations_table(
                check=check_name,
                message=m,
                keys=[k],
                affected_paths=[k],
                affected_values=[v],
                expected=json.dumps(expected_columns, sort_keys=True),
            )
            for k, v, m in zip(rows_k, rows_v, rows_m)
        ]
    )
