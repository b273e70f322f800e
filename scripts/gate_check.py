"""Local mirror of the driver's correctness gate: run every
queries() entry at sf0.01 and compare against oracle_sql() via
DuckDB (row count + schema + order-insensitive value equality)."""

from __future__ import annotations

import logging
import sys
import warnings

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01", only: str = "") -> int:
    warnings.filterwarnings("ignore")
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    if only:
        # SUBSTRING match per comma term (exact-only silently matched
        # NOTHING for shorthand names and printed a vacuous
        # "0 failures" — a scoped run must fail loudly instead)
        terms = [t for t in only.split(",") if t]
        qs = {k: v for k, v in qs.items()
              if any(t in k for t in terms)}
        if not qs:
            print(f"no queries match {only!r}")
            return 2
    failures = []
    for name, fn in qs.items():
        try:
            got = to_df(fn(sf_dir))
        except Exception as ex:
            failures.append(name)
            print(f"[RUN-FAIL] {name}: {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"[SQL-FAIL] {name}: {ex}")
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            failures.append(name)
            print(f"[COLS] {name}: got {list(g.columns)} want {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(name)
            print(f"[ROWS] {name}: got {len(g)} want {len(w)}")
            continue
        ok = True
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                if not np.allclose(
                    a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True
                ):
                    ok = False
            else:
                if not (a.astype(str).values == b.astype(str).values).all():
                    ok = False
            if not ok:
                failures.append(name)
                bad = (
                    np.flatnonzero(a.astype(str).values != b.astype(str).values)[:3]
                    if a.dtype.kind != "f"
                    else np.flatnonzero(
                        ~np.isclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True)
                    )[:3]
                )
                print(f"[VALS] {name} col={c} first-bad-rows={bad.tolist()}")
                for i in bad[:2]:
                    print("   got:", g.iloc[int(i)].to_dict())
                    print("  want:", w.iloc[int(i)].to_dict())
                break
        if ok:
            print(f"[OK] {name}: {len(g)} rows")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*(sys.argv[1:] or [])))
