"""Multi-source timestamp-merge (SimpleMultisourceAtomSync recast).

The reference (aminer/input/SimpleMultisourceAtomSync.py:19-126)
synchronizes N live streams by always forwarding the source holding
the OLDEST pending atom, with three streaming artifacts: atoms
without a timestamp forward immediately, an atom older than its own
source's high-water mark is flagged unsorted (timestamps_unsorted_flag)
and forwarded immediately, and a source silent for ``sync_wait_time``
is dropped from the wait set so the merge can progress.

Batch recast: over finite inputs the k-way oldest-first merge IS the
global order ``(ts, source, seq)`` — there is nothing to wait for, so
the idle-source timeout degenerates into the per-row WATERMARK column
(the reference's ``last_forward_timestamp`` at each forward step:
the greatest timestamp forwarded so far; a real streaming deployment
resumes from it). Atoms without a timestamp sort FIRST (forwarded
before the merge blocks on anything, watermark still 0), and the
unsorted flag is computed per source in arrival (seq) order exactly
as the reference does — but flagged rows stay in merged order rather
than jumping the queue (the immediate-forward is a liveness artifact
of live streams, meaningless for a deterministic batch result).

Scale shape: raw rows never shuffle — each source reduces to NARROW
(src, seq, ts_us) rows; ONE range sort per order (arrival order for
the per-source running max, merged order for the global position)
over those ~24-byte rows; per-block metadata folds on the driver
(one row per block — the pack_sequences / shuffle_shard_manifest
prefix-scan contract) into broadcast base offsets / base maxima.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ._taskcache import cached_task_fn

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

# null timestamps sort first (the reference forwards them immediately)
_NULL_TS = np.int64(-(2**62))


def multisource_merge(
    sources: dict[str, "ray.data.Dataset"],
    ts_col: str = "ts",
    seq_col: str = "seq",
) -> "ray.data.Dataset":
    """Merge N sources by timestamp. Returns a Dataset of
    ``(src, seq, ts_us, merge_pos, watermark_us, src_unsorted)``:

    - ``merge_pos``     — 0-based position in the merged order
      ``(ts nulls-first, src, seq)``;
    - ``watermark_us``  — the reference's last_forward_timestamp at
      this position (0 until the first timestamped row);
    - ``src_unsorted``  — true when this row's ts is strictly below
      its own source's running max in seq order (the reference's
      timestamps_unsorted_flag, per row).
    """
    if not sources:
        raise ValueError("multisource_merge: no sources")

    def narrow_fn(name: str):
        def fn(batch: pa.Table) -> pa.Table:
            ts = batch[ts_col]
            if pa.types.is_timestamp(ts.type):
                ts = ts.cast(pa.int64())
            tsv = ts.to_numpy(zero_copy_only=False)
            null = pc.is_null(batch[ts_col]).to_numpy(zero_copy_only=False)
            tsk = np.where(null, _NULL_TS, tsv).astype(np.int64)
            n = batch.num_rows
            return pa.table({
                "src": pa.array([name] * n, pa.string()),
                "seq": batch[seq_col].cast(pa.int64()),
                "ts_us": pa.array(tsk, pa.int64()),
            })

        return fn

    parts = [
        ds.map_batches(narrow_fn(name), batch_format="pyarrow",
                       batch_size=None, zero_copy_batch=True)
        for name, ds in sorted(sources.items())
    ]
    narrow = parts[0]
    for p in parts[1:]:
        narrow = narrow.union(p)

    # ---- pass 1: per-source running max in arrival (seq) order ----
    by_arrival = narrow.sort(["src", "seq"]).materialize()

    def arrival_meta(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["src"].to_pylist(), dtype=object)
        seq = batch["seq"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, src))
        srcs, maxs = [], []
        for s in np.unique(src):
            srcs.append(str(s))
            maxs.append(int(ts[src == s].max()))
        return pa.table({
            "min_src": pa.array([str(src[order[0]])], pa.string()),
            "min_seq": pa.array([int(seq[order[0]])], pa.int64()),
            "srcs": pa.array([srcs], pa.list_(pa.string())),
            "maxs": pa.array([maxs], pa.list_(pa.int64())),
        })

    metas = by_arrival.map_batches(
        arrival_meta, batch_format="pyarrow", batch_size=None
    ).take_all()  # one row per block — bounded driver fold
    metas.sort(key=lambda r: (r["min_src"], r["min_seq"]))
    run: dict[str, int] = {}
    base_max: dict[tuple, dict[str, int]] = {}
    for m in metas:
        key = (m["min_src"], int(m["min_seq"]))
        base_max[key] = dict(run)
        for s, mx in zip(m["srcs"], m["maxs"]):
            run[s] = max(run.get(s, int(_NULL_TS)), int(mx))
    bm_ref = ray.put(base_max)

    class Flag:
        def __init__(self, bm_ref):
            self.base_max = ray.get(bm_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pandas as pd

            src = np.asarray(batch["src"].to_pylist(), dtype=object)
            seq = batch["seq"].to_numpy(zero_copy_only=False)
            ts = batch["ts_us"].to_numpy(zero_copy_only=False)
            order = np.lexsort((seq, src))
            key = (str(src[order[0]]), int(seq[order[0]]))
            base = self.base_max[key]
            s_ord, t_ord = src[order], ts[order]
            # within-block running max per contiguous source segment
            cm = (pd.Series(t_ord).groupby(pd.Series(s_ord), sort=False)
                  .cummax().to_numpy())
            prev = np.empty_like(cm)
            prev[0] = int(_NULL_TS)
            prev[1:] = cm[:-1]
            new_seg = np.r_[True, s_ord[1:] != s_ord[:-1]]
            seg_base = np.array(
                [base.get(str(s), int(_NULL_TS)) for s in s_ord],
                dtype=np.int64)
            prev = np.where(new_seg, seg_base, np.maximum(prev, seg_base))
            # a timestampless atom forwards immediately — never checked
            # against (nor updating) its source's high-water mark
            # (reference receive_atom: `if timestamp is None`)
            unsorted = (t_ord != _NULL_TS) & (t_ord < prev)
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order))
            return pa.table({
                "src": batch["src"],
                "seq": batch["seq"],
                "ts_us": batch["ts_us"],
                "src_unsorted": pa.array(unsorted[inv]),
            })

    flagged = by_arrival.map_batches(
        cached_task_fn(Flag, cache_on=(bm_ref,), bm_ref=bm_ref),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )

    # ---- pass 2: merged order + position prefix scan ----
    merged = flagged.sort(["ts_us", "src", "seq"]).materialize()

    def merge_meta(batch: pa.Table) -> pa.Table:
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        src = np.asarray(batch["src"].to_pylist(), dtype=object)
        seq = batch["seq"].to_numpy(zero_copy_only=False)
        i = int(np.lexsort((seq, src, ts))[0])
        return pa.table({
            "ts0": pa.array([int(ts[i])], pa.int64()),
            "src0": pa.array([str(src[i])], pa.string()),
            "seq0": pa.array([int(seq[i])], pa.int64()),
            "cnt": pa.array([len(ts)], pa.int64()),
        })

    mm = merged.map_batches(
        merge_meta, batch_format="pyarrow", batch_size=None
    ).take_all()
    mm.sort(key=lambda r: (r["ts0"], r["src0"], r["seq0"]))
    pos, bases = 0, {}
    for m in mm:
        bases[(m["ts0"], m["src0"], m["seq0"])] = pos
        pos += int(m["cnt"])
    bases_ref = ray.put(bases)

    class Emit:
        def __init__(self, bases_ref):
            self.bases = ray.get(bases_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ts = batch["ts_us"].to_numpy(zero_copy_only=False)
            src = np.asarray(batch["src"].to_pylist(), dtype=object)
            seq = batch["seq"].to_numpy(zero_copy_only=False)
            order = np.lexsort((seq, src, ts))
            i = int(order[0])
            rank = self.bases[(int(ts[i]), str(src[i]), int(seq[i]))] + \
                np.arange(len(ts), dtype=np.int64)
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order))
            rank = rank[inv]
            # watermark: merged order is ts-ascending, so the running
            # max IS the row's own ts (0 before any timestamped row)
            wm = np.where(ts == _NULL_TS, np.int64(0), ts)
            return pa.table({
                "src": batch["src"],
                "seq": batch["seq"],
                "ts_us": batch["ts_us"],
                "merge_pos": pa.array(rank, pa.int64()),
                "watermark_us": pa.array(wm.astype(np.int64), pa.int64()),
                "src_unsorted": batch["src_unsorted"],
            })

    return merged.map_batches(
        cached_task_fn(Emit, cache_on=(bases_ref,), bases_ref=bases_ref),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
