"""Violation-row / verdict schemas and the Constraint protocol.

The violation row mirrors AMiner's EventData fields (reference:
aminer/events/EventData.py:18-47 — event_type "Analysis.<Detector>",
event_message, event_data) recast as an Arrow schema so violations
are themselves a ``ray.data.Dataset`` that streams to partitioned
Parquet.

The Constraint protocol replaces AMiner's AtomHandlerInterface
(reference: aminer/input/InputInterfaces.py:388-396): instead of a
per-record ``receive_atom`` push, a constraint exposes

- ``fit_partial(batch) -> state``: per-Arrow-block partial learned
  state (runs inside ``map_batches``, vectorized);
- ``merge(states) -> state``: associative reduce of partials (the
  persistence JSON of AMiner becomes one small mergeable object);
- ``validate(batch, state) -> violations``: per-block check against
  the broadcast merged state, emitting violation rows.

learn_mode / detect split (reference
aminer/input/InputInterfaces.py:251-281) becomes two dataset passes:
a fit pass and a validate pass with ``ray.put``-broadcast state.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Iterable, Protocol, runtime_checkable

import pyarrow as pa

VIOLATION_SCHEMA = pa.schema(
    [
        ("event_type", pa.string()),  # "Analysis.<CheckName>"
        ("message", pa.string()),
        ("affected_paths", pa.list_(pa.string())),
        ("affected_values", pa.list_(pa.string())),
        ("expected", pa.string()),  # JSON: range / charset / freq band / ...
        ("key", pa.string()),  # url or id-tuple rendering
        ("partition_id", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

VERDICT_SCHEMA = pa.schema(
    [
        ("partition_id", pa.string()),
        ("check", pa.string()),
        ("pass", pa.bool_()),
        ("n_rows", pa.int64()),
        ("n_violations", pa.int64()),
        ("metrics", pa.string()),  # JSON
        ("lineage", pa.string()),  # JSON: input files / block ids
        ("text_sha256_xor", pa.string()),  # byte-identity evidence
    ]
)


def empty_violations() -> pa.Table:
    return VIOLATION_SCHEMA.empty_table()


def violations_table(
    check: str,
    message: str,
    keys: Iterable[str],
    affected_paths: list[str],
    affected_values: Iterable[list[str]],
    expected: Iterable[str] | str,
    partition_id: "str | Iterable[str]" = "",
    ts: Iterable[Any] | None = None,
) -> pa.Table:
    """Build a violation-row table for one check over one block."""
    keys = list(keys)
    n = len(keys)
    if isinstance(expected, str):
        expected = [expected] * n
    if isinstance(partition_id, str):
        partition_id = [partition_id] * n
    else:
        partition_id = [str(p) for p in partition_id]
    return pa.table(
        {
            "event_type": pa.array([f"Analysis.{check}"] * n, pa.string()),
            "message": pa.array([message] * n, pa.string()),
            "affected_paths": pa.array([affected_paths] * n, pa.list_(pa.string())),
            "affected_values": pa.array(
                [[str(v) for v in vs] for vs in affected_values], pa.list_(pa.string())
            ),
            "expected": pa.array(list(expected), pa.string()),
            "key": pa.array([str(k) for k in keys], pa.string()),
            "partition_id": pa.array(partition_id, pa.string()),
            "ts": pa.array(
                list(ts) if ts is not None else [None] * n, pa.timestamp("us")
            ),
        },
        schema=VIOLATION_SCHEMA,
    )


@runtime_checkable
class Constraint(Protocol):
    """fit_partial / merge / validate — see module docstring."""

    name: str

    def fit_partial(self, batch: pa.Table) -> Any: ...

    def merge(self, states: list[Any]) -> Any: ...

    def validate(self, batch: pa.Table, state: Any) -> pa.Table: ...


@dataclass
class SuiteConfig:
    """Declarative constraint-suite configuration (the engine's
    analogue of AMiner's YAML ``Analysis:`` section, reference:
    aminer/YamlConfig.py:373-943). Plain dict-of-kwargs per check so
    it round-trips through JSON/YAML."""

    checks: dict[str, dict[str, Any]] = field(default_factory=dict)
    window_seconds: int = 600
    exact_mode: bool = True  # exact sets for oracle tests; sketches at scale
    # True: the fit pass materializes the narrow projection in the
    # object store and the keyed checks stream from it (overlapped
    # with the fused pass — fastest wall-clock, but at 10^12 rows the
    # ~40 B/row narrow table is tens of TB of spill-backed object
    # store). False: fit only, keyed checks re-derive the narrow
    # projection from the wide table per run (one extra read, O(1)
    # object-store footprint). Crossover notes in BASELINE.md.
    materialize_narrow: bool = True

    def to_json(self) -> str:
        return json.dumps(
            {
                "checks": self.checks,
                "window_seconds": self.window_seconds,
                "exact_mode": self.exact_mode,
                "materialize_narrow": self.materialize_narrow,
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "SuiteConfig":
        d = json.loads(s)
        return cls(**d)
