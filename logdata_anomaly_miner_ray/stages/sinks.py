"""Output sinks and violation post-processing.

Clean-room recasts:
- ``write_csv_projection`` — MatchValueStreamWriter (reference:
  aminer/analysis/MatchValueStreamWriter.py:21-104): AMiner's only
  columnar projection sink (selected paths → CSV stream) becomes
  ``select_columns`` + partitioned ``write_csv``.
- ``score_violations`` — ScoringEventHandler (reference:
  aminer/events/ScoringEventHandler.py:24-117): post-process the
  violations dataset with confidence scores; here the score is the
  rarity of each violation's (check, key-prefix) combination
  (auto-weights analogue: rarer phenomena score higher).
- ``render_event_text`` — StreamPrinterEventHandler text format
  (reference: aminer/events/EventData.py:49-78): canonical
  human-readable rendering of a violation row for golden-output
  comparisons.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def write_csv_projection(
    ds: "ray.data.Dataset", paths: list[str], out_dir: str
) -> str:
    """Project selected 'paths' (columns) and stream to CSV files."""
    ds.select_columns(paths).write_csv(out_dir)
    return out_dir


def score_violations(
    violations: "ray.data.Dataset", score_name: str = "confidence"
) -> "ray.data.Dataset":
    """Append a [0,1] confidence score: the self-information of each
    violation's (event_type) frequency among all violations,
    normalized — rarer checks firing → higher score."""
    counts = _counts(violations)
    total = max(sum(counts.values()), 1)
    import math

    info = {k: -math.log(max(v / total, 1e-12)) for k, v in counts.items()}
    max_info = max(info.values()) if info else 1.0
    weights = {k: v / max_info if max_info > 0 else 1.0 for k, v in info.items()}

    def add(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        s = [float(weights.get(e, 1.0)) for e in et]
        return batch.append_column(score_name, pa.array(s, pa.float64()))

    return violations.map_batches(
        add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def _counts(ds: "ray.data.Dataset") -> dict[str, int]:
    out: dict[str, int] = {}
    for b in ds.map_batches(
        lambda t: t.select(["event_type"]),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    ).iter_batches(batch_format="pyarrow"):
        for sv in b["event_type"].value_counts():
            out[sv["values"].as_py()] = out.get(sv["values"].as_py(), 0) + sv["counts"].as_py()
    return out


def render_event_text(row: dict) -> str:
    """Canonical text rendering of one violation row (the
    StreamPrinterEventHandler golden-output shape)."""
    vals = ", ".join(
        f"{p}: {v}" for p, v in zip(row.get("affected_paths", []), row.get("affected_values", []))
    )
    return (
        f"{row['event_type']} {row['message']}\n"
        f"  key: {row.get('key', '')}\n"
        f"  affected: [{vals}]\n"
        f"  expected: {row.get('expected', '')}\n"
    )
