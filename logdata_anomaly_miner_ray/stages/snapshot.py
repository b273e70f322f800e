"""Crawl-snapshot delta: classify every page key across two crawls.

Web corpora are re-crawled: curation pipelines diff consecutive
snapshots to find what was added, removed, changed, or unchanged
(CDX-index diffing; incremental-crawl dedup keeps only changed
captures). The reference engine's analogue is the learn-then-detect
value-set delta of NewMatchPathValueDetector (reference
analysis/NewMatchPathValueDetector.py:25-120: a value present in the
learned set vs novel) — here the "learned set" is snapshot A keyed by
page, the probe is snapshot B, and content identity is a digest of
the extracted text (the byte-identical-text invariant makes the
digest the correct change witness).

Contract: each (key, snap) pair appears AT MOST ONCE (a crawl holds
one capture per page key) — duplicated captures are a hard error,
not a silent pick.

Scale shape: the input is already narrow (key, snap, digest, carry —
raw text/html never enters), so the diff is ONE keyed shuffle of
~50-byte rows: repartition to the cluster-sized shuffle matrix
(CLAUDE.md shuffle-matrix rule), groupby a coarse ``key % n_buckets``
bucket, and classify each key's ≤2 rows vectorized inside pandas
(pivot + integer compares). Each bucket emits only (status, carry,
n) partials; the driver folds the tiny partial table. Below
``driver_fold_limit`` input rows the shuffle is skipped entirely
(two-tier pattern). Sequential/hashed page keys spread uniformly
over the modulo buckets; for adversarial key skew pre-hash the key.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

STATUSES = ("added", "removed", "changed", "unchanged")


def _classify(df: pd.DataFrame, key_col: str, snap_col: str,
              hash_col: str, carry_col: str | None) -> pd.DataFrame:
    """(status, carry, n) counts for one self-contained key range.
    Every row of a key is present in ``df`` (keys never split across
    calls — guaranteed by the modulo bucketing / driver tier)."""
    if df.empty:
        cols = {"status": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64)}
        if carry_col:
            cols = {"status": cols["status"],
                    carry_col: pd.Series(dtype=object), "n": cols["n"]}
        return pd.DataFrame(cols)
    if df.duplicated([key_col, snap_col]).any():
        raise ValueError(
            "snapshot_diff: duplicate (key, snap) capture — a crawl "
            "snapshot must hold one capture per page key")
    values = ["_present", hash_col] + ([carry_col] if carry_col else [])
    # presence = ROW existence (a captured page with a null digest is
    # still captured — SQL classifies on a.key IS NULL, not the hash)
    p = df.assign(_present=True).pivot(
        index=key_col, columns=snap_col, values=values)

    def _col(name, snap, fill):
        c = p.get((name, snap))
        if c is None:
            return pd.Series(np.full(len(p), fill), index=p.index)
        return c

    has_a = _col("_present", "a", False).fillna(False).to_numpy(bool)
    has_b = _col("_present", "b", False).fillna(False).to_numpy(bool)
    ha = _col(hash_col, "a", None).to_numpy()
    hb = _col(hash_col, "b", None).to_numpy()
    # 'unchanged' needs both digests NON-NULL and equal (SQL: NULL =
    # NULL is NULL → the CASE falls through to 'changed')
    hv = pd.notna(ha) & pd.notna(hb)
    status = np.where(
        ~has_a, "added",
        np.where(~has_b, "removed",
                 np.where(hv & (ha == hb), "unchanged", "changed")))
    out = {"status": status}
    if carry_col:
        ca = p.get((carry_col, "a"))
        cb = p.get((carry_col, "b"))
        if cb is None:
            carry = ca.to_numpy()
        elif ca is None:
            carry = cb.to_numpy()
        else:
            # element-wise coalesce(b, a) — prefer b's value only when
            # non-null, mirroring the SQL oracle's coalesce(b.x, a.x)
            cbv, cav = cb.to_numpy(), ca.to_numpy()
            carry = np.where(has_b & pd.notna(cbv), cbv, cav)
        out[carry_col] = carry
    g = (pd.DataFrame(out).groupby(list(out), sort=True, dropna=False)
         .size().rename("n").reset_index())
    g["n"] = g["n"].astype(np.int64)
    return g


def snapshot_diff(
    ds: "ray.data.Dataset",
    key_col: str = "key",
    snap_col: str = "snap",
    hash_col: str = "h",
    carry_col: str | None = None,
    driver_fold_limit: int = 200_000,
    n_buckets: int | None = None,
) -> pd.DataFrame:
    """Per-(status[, carry]) counts of the A→B snapshot delta — see
    module docstring. ``snap_col`` values must be 'a' / 'b'. Returns
    a pandas frame sorted by (status[, carry])."""
    group_cols = ["status"] + ([carry_col] if carry_col else [])

    narrow = ds.materialize()  # count + classify reuse; narrow rows only
    if narrow.count() <= driver_fold_limit:
        df = narrow.to_pandas()
        out = _classify(df, key_col, snap_col, hash_col, carry_col)
    else:  # scale tier: coarse-key bucketed shuffle, classify per bucket
        from ._shuffle import shuffle_parallelism

        nb = n_buckets or 4 * shuffle_parallelism()

        def add_bk(batch: pa.Table) -> pa.Table:
            col = batch[key_col]
            if pa.types.is_integer(col.type):
                k = col.to_numpy(zero_copy_only=False).astype(np.int64)
                bk = np.abs(k) % np.int64(nb)
            else:  # string page keys: crc32 bucket (same tier contract)
                import zlib

                bk = np.array(
                    [zlib.crc32(str(v).encode()) for v in col.to_pylist()],
                    dtype=np.int64) % np.int64(nb)
            return batch.append_column("bk", pa.array(bk, pa.int64()))

        def per_bucket(g: pd.DataFrame) -> pa.Table:
            r = _classify(g, key_col, snap_col, hash_col, carry_col)
            return pa.Table.from_pandas(r, preserve_index=False)

        parts = (
            narrow.map_batches(add_bk, batch_format="pyarrow",
                               batch_size=None)
            .repartition(shuffle_parallelism())
            .groupby("bk")
            .map_groups(per_bucket, batch_format="pandas")
            .to_pandas()  # ≤ n_buckets × |statuses × carries| tiny rows
        )
        if parts.empty:
            out = _classify(pd.DataFrame(), key_col, snap_col,
                            hash_col, carry_col)
        else:
            out = (parts.groupby(group_cols, sort=True, dropna=False)["n"]
                   .sum().reset_index())
    out = out.sort_values(group_cols, ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    return out
