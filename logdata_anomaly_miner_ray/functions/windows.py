"""Event-time window derivation.

AMiner's tumbling windows advance a ``next_check_time`` per detector
as atoms stream in (reference:
aminer/analysis/EventFrequencyDetector.py:184-214, default
``window_size=600``). In batch recast a window is just a derived
integer column ``floor(epoch_seconds / window_size)`` — groupable,
shuffle-friendly, and identical to the SQL oracle expression
``CAST(floor(epoch(ts)/W) AS BIGINT)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_WINDOW_SECONDS = 600  # EventFrequencyDetector.py:34 default


def window_id(ts: pa.ChunkedArray | pa.Array, window_seconds: int = DEFAULT_WINDOW_SECONDS) -> pa.Array:
    """int64 tumbling-window id from a timestamp[us] column.

    Floor division on the raw int64 microsecond representation —
    exact integer math, no float epoch round-trip.
    """
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    us = ts.cast(pa.int64())
    w = np.int64(window_seconds) * np.int64(1_000_000)
    # floor division (timestamps may predate the epoch in theory)
    arr = us.to_numpy(zero_copy_only=False)
    out = np.floor_divide(arr, w)
    return pa.array(out, type=pa.int64(), from_pandas=True)


def modulo_seconds(ts: pa.ChunkedArray | pa.Array, period_seconds: int = 86400) -> pa.Array:
    """Seconds-within-period (time-of-day by default) — the
    ModuloTimeMatchRule / PathValueTimeIntervalDetector bucketing
    (reference: aminer/analysis/Rules.py:596-687,
    aminer/analysis/PathValueTimeIntervalDetector.py:26-412)."""
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    us = ts.cast(pa.int64())
    p = np.int64(period_seconds) * np.int64(1_000_000)
    arr = us.to_numpy(zero_copy_only=False)
    return pa.array(np.mod(arr, p) // 1_000_000, type=pa.int64(), from_pandas=True)
