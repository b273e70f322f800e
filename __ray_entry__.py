"""Driver contract: entry() smoke, queries() vs oracle_sql() gate.

Ray is initialised by the driver BEFORE this module is imported —
nothing here calls ray.init()/ray.shutdown().

Every queries() entry exercises one operator family from SURVEY.md §2
(re-expressed Ray-Data-first in logdata_anomaly_miner_ray.stages) on
the driver-provided testdata tables; the matching oracle_sql() entry
is the ANSI-SQL equivalent DuckDB runs on the same parquet. Column
names match exactly; float aggregates are rounded identically on
both sides (half away from zero).

ONE query intentionally has no oracle_sql() entry (the driver
records the weaker rows-only check):
- pages_suite — the flagship multi-check suite is a meta-artifact
  (per-check verdict rows); its constituent checks are each
  oracle-checked as standalone queries instead.
Former rows-only entries were upgraded to oracle-exact via
deterministic closed-form fixtures: vartype_events (six fixed-label
families), pca_windows_events (rank-1 + disjoint-support
eigenstructure → exact 0/1 scores), media_decode (real stdlib codec
+ arithmetic checkerboard stats).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WINDOW = 3600  # seconds, used by all frequency/window queries
CF = 0.33  # EventFrequencyDetector confidence_factor
GAP = 7200.0  # missing-value gap threshold (s)
SLIDE_LIMIT = 12  # sliding-window count limit
HIST_EDGES = [float(x) for x in range(0, 440, 40)]  # 0..400 step 40


def _round(arr, n):
    return pc.round(arr, ndigits=n, round_mode="half_towards_infinity")


def _scaled_int(arr, scale: int):
    """Float → BIGINT of round(value·scale): summation-order float
    noise (~ulp) cannot flip the integer, so the driver's value-hash
    compares exactly; plain ROUND(x, n) can differ between engines by
    one ulp of the rounded double."""
    return pc.cast(
        pc.round(pc.multiply(pc.cast(arr, pa.float64()), float(scale)), ndigits=0,
                 round_mode="half_towards_infinity"),
        pa.int64(),
    )


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------


def q_column_stats_lineitem(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.column_stats import column_stats

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    t = column_stats(_read(sf_dir, "lineitem", cols), cols, with_quantiles=False)
    return pa.table(
        {
            "col": t["column"],
            "n": t["n"],
            "n_null": t["n_null"],
            "min_v": pc.cast(t["min"], pa.float64()),  # min/max are exact
            "max_v": pc.cast(t["max"], pa.float64()),
            "mean_e4": _scaled_int(t["mean"], 10_000),
            "std_e4": _scaled_int(t["std"], 10_000),
        }
    )


def q_value_range_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.value_range import fit_ranges

    return fit_ranges(_read(sf_dir, "events", ["event_type", "value"]), ["event_type"], "value")


def q_distinct_lang_documents(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.domain import distinct_values

    return distinct_values(_read(sf_dir, "documents", ["lang"]), ["lang"])


def q_combo_domain_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.domain import distinct_values

    return distinct_values(
        _read(sf_dir, "events", ["event_type", "user_id"]), ["event_type", "user_id"]
    )


def q_enhanced_combo_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.domain import combo_span_counts

    return combo_span_counts(
        _read(sf_dir, "events", ["event_type", "ts"]), ["event_type"], "ts"
    )


def q_distinct_users_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages._agg import distinct_rows, grouped_counts

    d = distinct_rows(
        _read(sf_dir, "events", ["event_type", "user_id"]), ["event_type", "user_id"]
    )
    return grouped_counts(d, ["event_type"], out_name="n_users")


def q_window_counts_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.frequency import window_counts

    return window_counts(
        _read(sf_dir, "events", ["event_type", "ts"]), ["event_type"], "ts", WINDOW
    )


def q_frequency_anomalies_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.frequency import (
        frequency_anomalies,
        window_counts,
    )

    wc = window_counts(
        _read(sf_dir, "events", ["event_type", "ts"]), ["event_type"], "ts", WINDOW
    )
    fa = frequency_anomalies(wc, ["event_type"], confidence_factor=CF)
    return fa.select_columns(["event_type", "window", "n"])


def q_empty_windows_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.frequency import empty_windows, window_counts

    wc = window_counts(
        _read(sf_dir, "events", ["event_type", "ts"]), ["event_type"], "ts", WINDOW
    )
    out = empty_windows(wc, ["event_type"]).to_pandas()
    if out.empty:
        # typed empty frame: a 0-row Dataset loses its schema through
        # to_pandas (CLAUDE.md trap; legitimately 0 rows at sf0.1)
        out = pd.DataFrame({"event_type": pd.Series(dtype=object),
                            "window": pd.Series(dtype=np.int64)})
    return out[["event_type", "window"]]


def q_sliding_exceed_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.frequency import sliding_count_exceed

    out = sliding_count_exceed(
        _read(sf_dir, "events", ["event_type", "ts"]),
        ["event_type"],
        "ts",
        GAP,
        SLIDE_LIMIT,
    ).to_pandas()
    # small result; typed empty frame keeps the schema stable when
    # no window exceeds the limit (tiny scale factors)
    cols = {"event_type": "object", "ts": "datetime64[us]", "n_in_window": "int64"}
    if out.empty:
        out = pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    return out[list(cols)]


def q_missing_gaps_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.missing import gap_violations

    out = gap_violations(
        _read(sf_dir, "events", ["event_type", "ts"]), ["event_type"], "ts", GAP
    )

    def to_us(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "ts": df["ts"],
                "gap_us": (df["gap_seconds"] * 1e6).round().astype(np.int64),
            }
        )

    res = out.map_batches(
        to_us, batch_format="pandas", batch_size=None).to_pandas()
    if res.empty:
        # typed empty frame (0-row Datasets drop their schema)
        res = pd.DataFrame({
            "event_type": pd.Series(dtype=object),
            "ts": pd.Series(dtype="datetime64[us]"),
            "gap_us": pd.Series(dtype=np.int64)})
    return res[["event_type", "ts", "gap_us"]]


def q_uniqueness_lineitem(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.uniqueness import duplicate_keys

    return duplicate_keys(_read(sf_dir, "lineitem", ["l_orderkey"]), ["l_orderkey"])


def q_referential_missing_counts(sf_dir: str):
    """Anti-join summary over three FK relations (always non-empty:
    one row per relation, zero counts included)."""
    from logdata_anomaly_miner_ray.stages.referential import anti_join_keys

    rels = [
        ("customer->orders", "customer", "c_custkey", "orders", "o_custkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ]
    names, counts = [], []
    for rel, lt, lk, rt, rk in rels:
        n = anti_join_keys(
            _read(sf_dir, lt, [lk]), lk, _read(sf_dir, rt, [rk]), rk
        ).count()
        names.append(rel)
        counts.append(int(n))
    return pa.table(
        {"rel": pa.array(names, pa.string()), "n_missing": pa.array(counts, pa.int64())}
    )


def q_exact_dedup_documents(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.dedup import exact_dup_groups

    return exact_dup_groups(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id"
    )


def q_token_stats_documents(sf_dir: str):
    from logdata_anomaly_miner_ray.functions.text import token_counts

    def add(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(token_counts(batch["text"]), pa.int64()),
                "n_chars_text": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def q_charset_documents(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.charset import fit_charsets

    cs = fit_charsets(_read(sf_dir, "documents", ["lang", "text"]), "lang", "text")
    langs = sorted(cs)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_chars": pa.array([int(cs[l].sum()) for l in langs], pa.int64()),
        }
    )


def q_ordering_inversions_events(sf_dir: str):
    """Monotonicity check per user on the value path (the ts path is
    globally sorted in this table, so the value path exercises the
    non-empty case; ts ordering is exercised by pages_suite's seeded
    swaps)."""
    from logdata_anomaly_miner_ray.stages.ordering import inversion_counts

    return inversion_counts(
        _read(sf_dir, "events", ["user_id", "event_id", "value"]),
        ["user_id"],
        "event_id",
        "value",
    )


def q_sequence_2grams_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.sequence import ngram_counts

    return ngram_counts(
        _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"]),
        ["user_id"],
        "event_type",
        ["ts", "event_id"],
        n=2,
    )


def q_min_transition_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.sequence import min_transition_times

    out = min_transition_times(
        _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"]),
        ["user_id"],
        "event_type",
        "ts",
        order_cols=["ts", "event_id"],
    )

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "from_event": t["from_event"],
                "to_event": t["to_event"],
                "min_us": _scaled_int(t["min_seconds"], 1_000_000),
            }
        )

    return out.map_batches(to_us, batch_format="pyarrow", batch_size=None)


def q_histogram_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.drift import group_histograms

    return group_histograms(
        _read(sf_dir, "events", ["event_type", "value"]),
        "event_type",
        "value",
        np.array(HIST_EDGES),
    )


def q_q1_lineitem(sf_dir: str):
    from ray.data.aggregate import Sum

    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"]
    ds = _read(sf_dir, "lineitem", cols)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less_equal(batch["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        g = (
            t.select(["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("l_quantity", "sum"), ("l_extendedprice", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["l_returnflag", "l_linestatus", "__sq", "__sp", "__n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("__sq", alias_name="sum_qty_raw"),
            Sum("__sp", alias_name="sum_base_raw"),
            Sum("__n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                # quantities are integral doubles → the sum is exact
                "sum_qty": pc.cast(t["sum_qty_raw"], pa.int64()),
                "sum_base_cents": _scaled_int(t["sum_base_raw"], 100),
                "avg_qty_e4": _scaled_int(
                    pc.divide(t["sum_qty_raw"], pc.cast(t["n"], pa.float64())), 10_000
                ),
                "n": t["n"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_segment_revenue(sf_dir: str):
    """Broadcast join: small customer side shipped once via ray.put,
    looked up per batch (AMiner's dict dispatch, AtomFilters.py:91)."""
    import ray
    from ray.data.aggregate import Sum

    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    n_cust = cust_ds.count()
    # broadcast-side bound: past this, switch to stages/join.hash_join
    assert n_cust <= 50_000_000, (
        f"customer side too large to broadcast ({n_cust} rows); use hash_join"
    )
    cust = cust_ds.to_pandas()
    lookup_ref = ray.put(
        (cust["c_custkey"].to_numpy(np.int64), cust["c_mktsegment"].to_numpy())
    )

    class SegmentJoin:
        def __init__(self):
            keys, segs = ray.get(lookup_ref)
            order = np.argsort(keys)
            self.keys, self.segs = keys[order], segs[order]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, ck)
            pos = np.clip(pos, 0, len(self.keys) - 1)
            seg = np.where(self.keys[pos] == ck, self.segs[pos], None)
            t = pa.table(
                {
                    "c_mktsegment": pa.array(seg.tolist(), pa.string()),
                    "o_totalprice": batch["o_totalprice"],
                }
            ).filter(pc.is_valid(pa.array(seg.tolist(), pa.string())))
            g = t.group_by(["c_mktsegment"]).aggregate(
                [("o_totalprice", "sum"), ([], "count_all")]
            )
            return g.rename_columns(["c_mktsegment", "__sp", "__n"])

    from logdata_anomaly_miner_ray.stages._taskcache import cached_task_fn

    partials = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        cached_task_fn(SegmentJoin, cache_on=(lookup_ref,)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    # ≤ #segments rows per block: fold the partials on the driver
    # (a groupby job costs ~2s of fixed overhead for a 5-row result)
    acc: dict[str, tuple[float, int]] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for seg, sp, n in zip(
            b["c_mktsegment"].to_pylist(), b["__sp"].to_pylist(), b["__n"].to_pylist()
        ):
            cur = acc.get(seg, (0.0, 0))
            acc[seg] = (cur[0] + sp, cur[1] + n)
    segs = sorted(acc)
    return pa.table(
        {
            "c_mktsegment": pa.array(segs, pa.string()),
            "revenue_cents": _scaled_int(
                pa.array([acc[s][0] for s in segs], pa.float64()), 100
            ),
            "n": pa.array([acc[s][1] for s in segs], pa.int64()),
        }
    )


def q_nation_revenue_join(sf_dir: str):
    """Large×large hash-partitioned shuffle join (Ray native
    Dataset.join) — orders ⋈ customer grouped by nation."""
    from ray.data.aggregate import Sum

    from logdata_anomaly_miner_ray.stages.join import hash_join

    j = hash_join(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        on="o_custkey",
        right_on="c_custkey",
        num_partitions=16,
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["c_nationkey", "o_totalprice"])
            .group_by(["c_nationkey"])
            .aggregate([("o_totalprice", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["c_nationkey", "__sp", "__pn"])

    agg = (
        j.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("c_nationkey")
        .aggregate(Sum("__sp", alias_name="rev_raw"), Sum("__pn", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int32()),
                "revenue_cents": _scaled_int(t["rev_raw"], 100),
                "n": t["n"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_ann_topk_embeddings(sf_dir: str):
    import ray

    from logdata_anomaly_miner_ray.stages.ann import cosine_topk

    import pyarrow.parquet as pq

    q0 = (
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .filter(pc.equal(pc.field("vec_id"), 0))["embedding"]
        .to_pylist()[0]
    )
    out = cosine_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        "embedding",
        "vec_id",
        ray.put(np.array([q0], dtype=np.float64)),
        k=10,
    )
    return pa.table(
        {
            "vec_id": pa.array(out["vec_id"].to_numpy(np.int64)),
            "sim_e4": _scaled_int(pa.array(out["sim"].to_numpy()), 10_000),
        }
    )


def q_knn_graph_embeddings(sf_dir: str):
    """Exact k-nearest-neighbor graph (stages/ann.knn_graph): every
    vector is query AND candidate; neighbors by exact int8-quantized
    integer dots (order-independent ⇒ bit-identical at any
    partitioning), self excluded, ties dot DESC / neighbor id ASC
    via a composite integer key. Exact broadcast tier here (column-
    chunked integer kernel); the IVF-bucketed scale tier (one narrow
    shuffle, per-bucket exact kNN, coarse per-id merge) is
    pytest-checked for full-probe equivalence and pruned recall."""
    from logdata_anomaly_miner_ray.stages.ann import knn_graph

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_graph(ds, "embedding", "vec_id", k=5).to_pandas()
    return pd.DataFrame({
        "vec_id": out["vec_id"].to_numpy(np.int64),
        "neighbor_id": out["neighbor_id"].to_numpy(np.int64),
        "dot_q": out["dot_q"].to_numpy(np.int64),
        "rnk": out["rnk"].to_numpy(np.int64),
    }).sort_values(["vec_id", "rnk"], ignore_index=True)


def q_quantized_ann_embeddings(sf_dir: str):
    """Int8-quantized retrieval: symmetric per-vector absmax FLOOR
    quantization (stages/ann.quantize_int8) then top-10 per query by
    EXACT integer dot product — queries = vectors vec_id < 5. Integer
    sums are order-independent, so the ranking is bit-identical at
    any partitioning; the oracle restates the same floor quantizer
    and integer dots in SQL (unnest + position join)."""
    import ray

    import pyarrow.parquet as pq

    from logdata_anomaly_miner_ray.stages.ann import quantized_topk

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).filter(pc.less(pc.field("vec_id"), 5)).sort_by("vec_id")
    qmat = np.stack([np.asarray(v, np.float64)
                     for v in qt["embedding"].to_pylist()])
    qids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    out = quantized_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        "embedding", "vec_id", ray.put(qmat), k=10)
    out = out.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True],
        kind="mergesort").reset_index(drop=True)
    rnk = out.groupby("query_id").cumcount().to_numpy() + 1
    return pd.DataFrame(
        {"qid": qids[out["query_id"].to_numpy(np.int64)],
         "vec_id": out["vec_id"].to_numpy(np.int64),
         "dot_q": out["sim"].to_numpy(np.int64),
         "rnk": rnk.astype(np.int64)}
    )


def q_json_extract_events(sf_dir: str):
    """JsonModelElement recast: typed field extraction from the JSON
    props column (parse failures → null + flag)."""
    from logdata_anomaly_miner_ray.functions.parsing import json_extract

    def add(batch: pa.Table) -> pa.Table:
        cols = json_extract(batch["props"], {"k": pa.int64()})
        return pa.table({"event_id": batch["event_id"], "k": cols["k"]})

    return _read(sf_dir, "events", ["event_id", "props"]).map_batches(
        add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def q_json_schema_events(sf_dir: str):
    """JsonModelElement MARKER semantics (reference
    parsing/JsonModelElement.py:55-93): optional-key / nullable-key
    prefixes, EMPTY_ARRAY marker, strict unexpected-key rejection.
    Deterministic per-event JSON variants exercise every verdict; the
    oracle revalidates the same documents with DuckDB's JSON kernel."""
    from logdata_anomaly_miner_ray.functions.parsing import JsonSchema, json_schema_validate

    js = JsonSchema(
        {"k": int, "+note": str, "optional_key_tag": str, "optional_key_arr": "EMPTY_ARRAY"}
    )

    def add(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        docs = []
        for e in eid:
            k, m = int(e % 100), int(e % 8)
            if m == 0:
                docs.append('{"k": %d, "note": "n"}' % k)
            elif m == 1:
                docs.append('{"k": %d, "note": null}' % k)
            elif m == 2:
                docs.append('{"k": %d, "note": "x", "tag": "t"}' % k)
            elif m == 3:
                docs.append('{"k": "bad", "note": "x"}')
            elif m == 4:
                docs.append('{"note": "x"}')
            elif m == 5:
                docs.append('{"k": %d, "note": "x", "extra": 1}' % k)
            elif m == 6:
                docs.append('{"k": %d, "note": "x", "arr": []}' % k)
            else:
                docs.append('{"k": %d, "note": "x", "arr": [1]}' % k)
        cols = json_schema_validate(pa.array(docs, pa.string()), js)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "valid": cols["valid"],
                "reject_reason": pc.coalesce(cols["reject_reason"], pa.scalar("", pa.string())),
            }
        )

    return _read(sf_dir, "events", ["event_id"]).map_batches(
        add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def q_xml_extract_events(sf_dir: str):
    """XmlModelElement recast, oracle-verified by inversion: each
    event becomes a deterministic XML doc (every 7th malformed —
    unclosed element), extraction must recover the source columns
    and flag the broken rows."""
    from logdata_anomaly_miner_ray.functions.parsing import xml_extract

    def add(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_pylist()
        uid = batch["user_id"].to_pylist()
        et = batch["event_type"].to_pylist()
        docs = [
            (f'<e id="{u}"><t>{t}</t>' if e % 7 == 0
             else f'<e id="{u}"><t>{t}</t></e>')
            for e, u, t in zip(eid, uid, et)
        ]
        cols = xml_extract(
            pa.array(docs, pa.string()), {"@id": pa.int64(), "t": pa.string()}
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "parse_ok": cols["parse_ok"],
                "xid": cols["id"],
                "xt": pc.coalesce(cols["t"], pa.scalar("", pa.string())),
            }
        )

    return _read(sf_dir, "events", ["event_id", "user_id", "event_type"]).map_batches(
        add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def q_sshd_model_events(sf_dir: str):
    """conf-available SshdParsingModel over synthetic sshd log lines
    (deterministic per event row, 5 branch families + garbage),
    parsed by the 49-variant FirstMatch spec dict; oracle
    reconstructs winner + fields in SQL."""
    from logdata_anomaly_miner_ray.functions.models import SSHD_SPECS
    from logdata_anomaly_miner_ray.functions.parsing import parse_lines_first_match

    def render(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_pylist()
        uid = batch["user_id"].to_pylist()
        lines = []
        for e, u in zip(eid, uid):
            m = e % 6
            ip = f"10.{u % 250}.{e % 250}.{(e * 7) % 250}"
            if m == 0:
                lines.append(f"sshd[{u}]: Failed password for invalid user u{e} from {ip} port {1000 + e % 50000} ssh2")
            elif m == 1:
                lines.append(f"sshd[{u}]: Accepted password for u{e} from {ip} port {1000 + e % 50000} ssh2")
            elif m == 2:
                lines.append(f"sshd[{u}]: Connection closed by {ip}")
            elif m == 3:
                lines.append(f"sshd[{u}]: pam_unix(sshd:session): session opened for user u{e} by (uid=0)")
            elif m == 4:
                lines.append(f"sshd[{u}]: Invalid user u{e} from {ip} port {1000 + e % 50000}")
            else:
                lines.append("### unparseable ###")
        return pa.table(
            {"event_id": batch["event_id"], "line": pa.array(lines, pa.string())}
        )

    rendered = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        render, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    parsed = parse_lines_first_match(rendered, SSHD_SPECS, line_col="line")

    def project(t: pa.Table) -> pa.Table:
        def col(n, typ):
            return t[n] if n in t.column_names else pa.nulls(t.num_rows, typ)

        model = pc.coalesce(t["model"], pa.scalar("", pa.string()))
        # winner-specific fields folded to shared columns
        pid = pc.coalesce(*[col(f"{m}.pid", pa.int64()) for m in
                            ("failed_accept", "closed_ip", "pam", "invalid_user")])
        port = pc.coalesce(col("failed_accept.port", pa.int64()),
                           col("invalid_user.port", pa.int64()))
        user = pc.coalesce(col("failed_accept.user", pa.string()),
                           col("pam.user", pa.string()),
                           col("invalid_user.user", pa.string()))
        return pa.table(
            {
                "event_id": t["event_id"],
                "model": model,
                "pid": pid,
                "port": port,
                "u": pc.coalesce(user, pa.scalar("", pa.string())),
            }
        )

    return parsed.map_batches(project, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def q_audispd_model_events(sf_dir: str):
    """conf-available AudispdParsingModel (the branchiest of the 16
    generic models: 41 structured + 99 catch-all variants behind the
    audit-record preamble) over synthetic audit lines — 5 structured
    families + the queue-full sentinel + garbage, deterministic per
    event row; oracle reconstructs winner + folded fields in SQL.
    Reference: conf-available/generic/AudispdParsingModel.py."""
    from logdata_anomaly_miner_ray.functions.models import AUDISPD_SPECS
    from logdata_anomaly_miner_ray.functions.parsing import parse_lines_first_match

    def render(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_pylist()
        uid = batch["user_id"].to_pylist()
        lines = []
        for e, u in zip(eid, uid):
            m = e % 7
            pre = f"type=%s msg=audit({1600000000 + e % 86400}.{e % 1000}:{e % 90000 + 1}):"
            if m == 0:
                lines.append(pre % "CONFIG_CHANGE" + f' auid={u} ses={e % 500} op="add_rule" path="/etc/rule{e % 50}" key=(null) list=4 res=1')
            elif m == 1:
                lines.append(pre % "FD_PAIR" + f" fd0={e % 100} fd1={e % 100 + 1}")
            elif m == 2:
                lines.append(pre % "LOGIN" + f" login pid={u} uid=0 old auid=4294967295 new auid={u} old ses=4294967295 new ses=1 res=1")
            elif m == 3:
                lines.append(pre % "NETFILTER_CFG" + f" table=filter family=2 entries={e % 10}")
            elif m == 4:
                lines.append(pre % "SYSTEM_BOOT" + f" system boot payload {e}")
            elif m == 5:
                lines.append("audispd: queue is full - dropping event")
            else:
                lines.append("### not an audit record ###")
        return pa.table(
            {"event_id": batch["event_id"], "line": pa.array(lines, pa.string())}
        )

    rendered = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        render, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    parsed = parse_lines_first_match(rendered, AUDISPD_SPECS, line_col="line")

    def project(t: pa.Table) -> pa.Table:
        def col(n, typ):
            return t[n] if n in t.column_names else pa.nulls(t.num_rows, typ)

        fams = ("conf_change", "fdpair", "login", "netfilter_cfg",
                "system_boot")
        model = pc.coalesce(t["model"], pa.scalar("", pa.string()))
        atime = pc.coalesce(*[col(f"{f}.time", pa.int64()) for f in fams])
        aseq = pc.coalesce(*[col(f"{f}.seq", pa.int64()) for f in fams])
        val = pc.coalesce(col("conf_change.ses", pa.int64()),
                          col("fdpair.fd0", pa.int64()),
                          col("login.auid_new", pa.int64()),
                          col("netfilter_cfg.entries", pa.int64()))
        sval = pc.coalesce(col("conf_change.path", pa.string()),
                           col("system_boot.payload", pa.string()),
                           pa.scalar("", pa.string()))
        return pa.table(
            {
                "event_id": t["event_id"],
                "model": model,
                "atime": atime,
                "aseq": aseq,
                "val": val,
                "sval": sval,
            }
        )

    return parsed.map_batches(project, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def q_line_model_events(sf_dir: str):
    """Declarative line model (Sequence of Fixed/Decimal/WhiteSpace
    leaves + OptionalMatchModelElement), oracle-verified by
    inversion: events rendered as log lines (every 11th garbage,
    every 3rd carrying an optional suffix field), parsed back by ONE
    RE2 extraction with typed casts."""
    from logdata_anomaly_miner_ray.functions.parsing import parse_lines

    def render(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_pylist()
        uid = batch["user_id"].to_pylist()
        et = batch["event_type"].to_pylist()
        lines = []
        for e, u, t in zip(eid, uid, et):
            if e % 11 == 0:
                lines.append("### not a log line ###")
            elif e % 3 == 0:
                lines.append(f"u={u} t={t} k={e % 1000} x={u * 2}")
            else:
                lines.append(f"u={u} t={t} k={e % 1000}")
        return pa.table(
            {"event_id": batch["event_id"], "line": pa.array(lines, pa.string())}
        )

    spec = [
        ("f0", "fixed", "u="),
        ("u", "int"),
        ("f1", "fixed", " t="),
        ("t", "word"),
        ("f2", "fixed", " k="),
        ("k", "int"),
        ("fx", "optional", ("fx", "fixed", " x=")),
        ("x", "optional", ("x", "int")),
    ]
    rendered = _read(sf_dir, "events", ["event_id", "user_id", "event_type"]).map_batches(
        render, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    parsed = parse_lines(rendered, spec, line_col="line")

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "parse_ok": t["parse_ok"],
                "u": t["u"],
                "t": pc.coalesce(t["t"], pa.scalar("", pa.string())),
                "k": t["k"],
                "x": t["x"],
            }
        )

    return parsed.map_batches(project, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def q_value_branch_model_events(sf_dir: str):
    """ElementValueBranchModelElement true dispatch (reference
    parsing/ElementValueBranchModelElement.py:22-88): the parsed op
    value selects the follow-on sub-model; lookup miss takes the
    default branch; a selected branch that fails does NOT fall back
    (signup rows render 'op=add x=…' — 'add' wins the lookup, its
    pattern fails, row stays unparsed although the default would
    match). Oracle restates the rendering arithmetic per event_type."""
    from logdata_anomaly_miner_ray.functions.parsing import parse_lines

    def render(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_pylist()
        uid = batch["user_id"].to_pylist()
        et = batch["event_type"].to_pylist()
        lines = []
        for e, u, t in zip(eid, uid, et):
            if t == "click":
                lines.append(f"op=add a={u} b={e % 1000}")
            elif t == "error":
                lines.append(f"op=del id={u}")
            elif t == "purchase":
                lines.append(f"op=mul x={u}")      # lookup miss → default
            elif t == "signup":
                lines.append(f"op=add x={u}")      # possessive fail
            else:
                lines.append("### garbage ###")
        return pa.table(
            {"event_id": batch["event_id"], "line": pa.array(lines, pa.string())}
        )

    spec = [
        ("f0", "fixed", "op="),
        ("op", "branch", (
            ("opv", "word"),
            {
                "add": [("f1", "fixed", " a="), ("a", "int"),
                        ("f2", "fixed", " b="), ("b", "int")],
                "del": [("f3", "fixed", " id="), ("i", "int")],
            },
            [("f4", "fixed", " x="), ("x", "int")],
        )),
    ]
    rendered = _read(sf_dir, "events", ["event_id", "user_id", "event_type"]) \
        .map_batches(render, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    parsed = parse_lines(rendered, spec, line_col="line")

    def project(t: pa.Table) -> pa.Table:
        empty = pa.scalar("", pa.string())
        return pa.table({
            "event_id": t["event_id"],
            "parse_ok": t["parse_ok"],
            "op_branch": pc.coalesce(t["op_branch"], empty),
            "opv": pc.coalesce(t["opv"], empty),
            "a": t["a"],
            "b": t["b"],
            "i": t["i"],
            "x": t["x"],
        })

    return parsed.map_batches(project, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)


def q_unparsed_diagnosis_events(sf_dir: str):
    """VerboseUnparsedAtomHandler diagnosis as columns (reference
    analysis/UnparsedAtomHandlers.py:75-100 over DebugMatchContext,
    parsing/MatchContext.py:47-104): parse_lines(diagnose=True)
    emits, for every unparsed row, the byte length of the longest
    matched leaf prefix and the remaining suffix (the reference's
    shortest_unmatched_data). Two deterministic failure families
    land the diagnosis at different leaves so the oracle recomputes
    both offsets arithmetically."""
    from logdata_anomaly_miner_ray.functions.parsing import parse_lines

    def render(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_pylist()
        uid = batch["user_id"].to_pylist()
        lines = []
        for e, u in zip(eid, uid):
            if e % 11 == 0:
                # fails at the ' t=' fixed leaf, after the int
                lines.append(f"u={u} T={e}")
            elif e % 5 == 0:
                # fails at the ' k=' fixed leaf, after the word
                lines.append(f"u={u} t=x{e} j=7")
            else:
                lines.append(f"u={u} t=t{e} k={e % 1000}")
        return pa.table(
            {"event_id": batch["event_id"], "line": pa.array(lines, pa.string())}
        )

    spec = [
        ("f0", "fixed", "u="),
        ("u", "int"),
        ("f1", "fixed", " t="),
        ("t", "word"),
        ("f2", "fixed", " k="),
        ("k", "int"),
    ]
    rendered = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        render, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    parsed = parse_lines(rendered, spec, line_col="line", diagnose=True)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "parse_ok": t["parse_ok"],
                "plen": t["matched_prefix_len"],
                "rest": t["unmatched_data"],
            }
        )

    return parsed.map_batches(project, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def q_datetime_parse_events(sf_dir: str):
    """DateTimeModelElement depth (reference
    parsing/DateTimeModelElement.py:70-420): %z timezone-name and
    numeric-offset suffixes, fractional seconds, full civil-date
    validation. Deterministic per-event string variants (rendered
    from ts) are re-parsed back to UTC epoch micros; the oracle
    computes the same micros arithmetically."""
    from logdata_anomaly_miner_ray.functions.datetime_model import DateTimeParser

    # suffix by event_id % 6: bare, UTC, UTC+01:00, +0230, CET, Z
    suffixes = ["", " UTC", " UTC+01:00", "+0230", " CET", "Z"]

    def add(batch: pa.Table) -> pa.Table:
        # stateless (%Y present) → construct per batch, no carry
        parser = DateTimeParser("%d.%m.%Y %H:%M:%S.%f%z")
        rendered = pc.strftime(batch["ts"], format="%d.%m.%Y %H:%M:%S")
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        sfx = pa.array([suffixes[int(e % 6)] for e in eid], pa.string())
        full = pc.binary_join_element_wise(rendered, sfx, "")
        out = parser.parse_array(full)
        return pa.table({"event_id": batch["event_id"],
                         "epoch_us": out["micros"]})

    return _read(sf_dir, "events", ["event_id", "ts"]).map_batches(
        add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def q_allowlist_rules_events(sf_dir: str):
    """Rule-engine allowlist check (AllowlistViolationDetector):
    rows matching NO allowlist rule are violations."""
    from logdata_anomaly_miner_ray.functions.rules import (
        ValueListRule,
        ValueRangeRule,
        allowlist_violations_mask,
    )

    allow = [
        ValueListRule("event_type", ["click", "view", "purchase"]),
        ValueRangeRule("value", 0.0, 100.0),
    ]

    def flag(batch: pa.Table) -> pa.Table:
        mask = allowlist_violations_mask(batch, allow)
        return pa.table({"event_id": batch["event_id"]}).filter(mask)

    return _read(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
        flag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def q_multisource_merge_events(sf_dir: str):
    """SimpleMultisourceAtomSync recast (reference
    input/SimpleMultisourceAtomSync.py:19-126): events split into 3
    sources (event_id % 3), each with a derived ts stream carrying
    planted regressions (every 17th event shifted back an hour) so
    the per-source unsorted flag exercises; merged oldest-first order
    + position + watermark + flag, all integer-us arithmetic. Oracle
    = row_number over the same merged order + window running max."""
    from logdata_anomaly_miner_ray.stages.multisource import multisource_merge

    base = _read(sf_dir, "events", ["event_id", "ts"])

    def mk(i: int):
        def f(batch: pa.Table) -> pa.Table:
            eid = batch["event_id"].to_numpy(zero_copy_only=False)
            us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            keep = eid % 3 == i
            ts_us = us[keep] - np.where(eid[keep] % 17 == 0,
                                        3_600_000_000, 0)
            return pa.table({
                "seq": pa.array(eid[keep], pa.int64()),
                "ts": pa.array(ts_us.astype(np.int64), pa.int64()),
            })

        return f

    sources = {
        str(i): base.map_batches(mk(i), batch_format="pyarrow",
                                 batch_size=None, zero_copy_batch=True)
        for i in range(3)
    }
    return multisource_merge(sources, ts_col="ts", seq_col="seq")


def q_value_dependent_rules_events(sf_dir: str):
    """Value-dependent rule predicates (Rules.py:277,688): the
    delegate rule / modulo-time window is selected per row by the
    event_type value. Emits both flags for every row matching either
    rule; integer-us window arithmetic makes the oracle exact (for
    integer-second limits, ``us/1e6 mod 86400 in [lo,hi]`` ⟺
    ``us mod 86400e6 in [lo*1e6, hi*1e6]`` — division by 1e6 cannot
    cross an integer boundary for exact-int64 microseconds)."""
    from logdata_anomaly_miner_ray.functions.rules import (
        StringRegexRule,
        ValueDependentDelegatedRule,
        ValueDependentModuloTimeRule,
        ValueRangeRule,
    )

    deleg = ValueDependentDelegatedRule(
        ["event_type"],
        {("click",): ValueRangeRule("value", 0.0, 60.0),
         ("error",): StringRegexRule("props", '"k": 1')},
        default_rule=ValueRangeRule("value", 0.0, 20.0),
    )
    vmod = ValueDependentModuloTimeRule(
        "ts", 86400, ["event_type"],
        {"purchase": (3600, 43200), "signup": (0, 21600)},
        default_limit=(79200, 86400),
    )

    def flag(batch: pa.Table) -> pa.Table:
        md = deleg.evaluate(batch).to_numpy(zero_copy_only=False)
        mw = vmod.evaluate(batch).to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_id": batch["event_id"],
            "m_deleg": pa.array(md.astype("int64"), pa.int64()),
            "m_window": pa.array(mw.astype("int64"), pa.int64()),
        })
        return t.filter(pa.array(md | mw))

    return _read(
        sf_dir, "events", ["event_id", "ts", "event_type", "value", "props"]
    ).map_batches(flag, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)


def q_implication_support_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.correlation import implication_support

    return implication_support(
        _read(sf_dir, "events", ["user_id", "event_type", "ts"]),
        ["user_id"],
        "event_type",
        "ts",
        max_delta=600.0,
    )


def q_mean_shift_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.timeseries import mean_shift_violations

    out = mean_shift_violations(
        _read(sf_dir, "events", ["event_type", "value", "ts"]),
        ["event_type"],
        "value",
        "ts",
        window_seconds=21600,
        avg_factor=3.0,
        min_n=10,
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {"event_type": pd.Series(dtype=object), "window": pd.Series(dtype="int64")}
        )
    return out[["event_type", "window"]]


def q_sessions_events(sf_dir: str):
    from ray.data.aggregate import Max

    from logdata_anomaly_miner_ray.stages.session import sessionize

    s = sessionize(
        _read(sf_dir, "events", ["user_id", "ts"]), ["user_id"], "ts", 1800.0
    )
    agg = s.groupby("user_id").aggregate(Max("session_id", alias_name="max_sid"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_sessions": pc.add(t["max_sid"], 1),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_interval_unmatched_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.correlation import interval_join_violations

    out = interval_join_violations(
        _read(sf_dir, "events", ["user_id", "event_type", "ts"]),
        ["user_id"],
        "event_type",
        "ts",
        a_event="error",
        b_event="purchase",
        min_delta=0.0,
        max_delta=600.0,
    )
    return out.select_columns(["user_id", "ts"])


def q_topk_orders(sf_dir: str):
    """Top-k by value WITHOUT a global sort: per-block
    argpartition top-k partials, tiny driver merge (the
    worst-violations-report pattern, SURVEY.md §2.7)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        kk = min(10, len(v))
        if kk == 0:
            return batch.select(["o_orderkey", "o_totalprice"])
        top = np.argpartition(-v, kk - 1)[:kk]
        return batch.select(["o_orderkey", "o_totalprice"]).take(pa.array(top))

    parts = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    df = parts.to_pandas()
    out = df.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(10)
    return pa.table(
        {
            "o_orderkey": pa.array(out["o_orderkey"].to_numpy(np.int64)),
            "o_totalprice": pa.array(out["o_totalprice"].to_numpy(np.float64)),
        }
    )


# declared schema for the conformance check, in portable SQL type
# names: misses 'props' (new-path) and mistypes 'value' (BIGINT vs
# actual DOUBLE) so the check provably fires; the oracle recomputes
# the diff from DESCRIBE of the same parquet
DECLARED_EVENTS_SCHEMA = {
    "event_id": "BIGINT",
    "ts": "TIMESTAMP",
    "user_id": "BIGINT",
    "event_type": "VARCHAR",
    "value": "BIGINT",  # deliberate mistype (actual: DOUBLE)
    # "props" deliberately missing -> new-path violation
}


def q_schema_conformance_events(sf_dir: str):
    """NewMatchPathDetector recast: dataset schema vs the declared
    schema — oracle recomputes the diff from DuckDB DESCRIBE."""
    from logdata_anomaly_miner_ray.stages.domain import schema_conformance_table

    return schema_conformance_table(_read(sf_dir, "events"), DECLARED_EVENTS_SCHEMA)


def q_monotonic_adjust_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.ordering import monotonic_adjust

    out = monotonic_adjust(
        _read(sf_dir, "events", ["user_id", "event_id", "ts"]),
        ["user_id"],
        "event_id",
        "ts",
    )
    return out.select_columns(["event_id", "ts_adjusted"])


# ---- rows-only queries (non-SQL-expressible: heuristic scoring,
# sketches, LSH candidates, drift statistics, model plumbing) ----


def q_pca_windows_events(sf_dir: str):
    """PCADetector reconstruction-error windows (media_decode/vartype
    pattern: closed-form eigenstructure, arithmetic oracle). Derived
    stream: 50 events per window; normal windows carry counts
    (A,B) = (30,20) — every normal row is the SAME vector, so the
    normal block is exactly rank-1 along v=(3,2) — and every 10th
    window is 50 type-C events, orthogonal by DISJOINT support. The
    covariance is exactly block-diagonal, the top-1 eigenvector is
    v̂ (the v-mass dominates 9·1300 : 1·2500 per 10 windows at every
    scale), so reconstruction scores are EXACTLY 0 (normal) and 1
    (anomalous) up to fp noise ~1e-12, emitted e6-scaled. A partial
    tail window would tilt the eigenvector, so ids are trimmed to a
    multiple of 50 on BOTH sides."""
    from logdata_anomaly_miner_ray.stages.timeseries import pca_outlier_windows

    base = _read(sf_dir, "events", ["event_id"])
    lim = (base.count() // 50) * 50

    def derive(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        keep = eid < lim
        eid = eid[keep]
        w = eid // 50
        r = eid % 50
        et = np.where(w % 10 == 9, "C", np.where(r < 30, "A", "B"))
        ts = (w * 3600 * 1_000_000).astype(np.int64)
        return pa.table({
            "event_type": pa.array(et.astype(object), pa.string()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        })

    derived = base.map_batches(derive, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)
    out = pca_outlier_windows(derived, "event_type", "ts", 3600,
                              n_components=1)
    return pa.table({
        "window": pa.array(out["window"].to_numpy(np.int64), pa.int64()),
        "score_e6": pa.array(
            np.rint(out["score"].to_numpy(np.float64) * 1e6).astype(np.int64),
            pa.int64()),
        "anomaly": pa.array(out["anomaly"].to_numpy(bool)),
    })


def q_ar_outliers_events(sf_dir: str):
    """TSAArima recast, AR(1) closed-form flavor: oracle recomputes
    via regr_slope/regr_intercept over zero-filled (lag(n), n)."""
    from logdata_anomaly_miner_ray.stages.frequency import window_counts
    from logdata_anomaly_miner_ray.stages.timeseries import ar1_outliers

    wc = window_counts(
        _read(sf_dir, "events", ["event_type", "ts"]), ["event_type"], "ts", WINDOW
    ).to_pandas()
    out = ar1_outliers(wc, ["event_type"])
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].astype(str), pa.string()),
            "window": pa.array(out["window"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


def q_count_vector_outliers_events(sf_dir: str):
    """EventCountClusterDetector recast: per (user, day-window)
    event-type count vector cosine-scored against the user's mean
    vector; windows under the confidence factor are outliers. The
    oracle recomputes the zero-filled vectors + cosine in SQL."""
    from logdata_anomaly_miner_ray.stages.correlation import count_vector_outliers

    out = count_vector_outliers(
        _read(sf_dir, "events", ["user_id", "event_type", "ts"]),
        ["user_id"],
        "event_type",
        "ts",
        window_seconds=86400,
        confidence_factor=0.3,
    )
    return pa.table(
        {
            "user_id": pa.array(out["user_id"].to_numpy(np.int64)),
            "window": pa.array(out["window"].to_numpy(np.int64)),
            "sim_e6": _scaled_int(pa.array(out["similarity"].to_numpy(np.float64)), 1_000_000),
        }
    )


def q_chi2_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.correlation import contingency_chi2

    chi2, dof, _ = contingency_chi2(
        _read(sf_dir, "events", ["event_type", "user_id"]), "event_type", "user_id"
    )
    return pa.table(
        {"chi2_e4": pa.array([int(round(chi2 * 10_000))], pa.int64()),
         "dof": pa.array([dof], pa.int64())}
    )


def q_time_of_period_events(sf_dir: str):
    """PathValueTimeIntervalDetector recast: (user, event_type)
    occurrences whose time-of-day is >600 s (circular) from every
    other occurrence of the same key; oracle recomputes the circular
    NN distance with a self-excluded pair join."""
    from logdata_anomaly_miner_ray.stages.timeseries import time_of_period_outliers

    out = time_of_period_outliers(
        _read(sf_dir, "events", ["user_id", "event_type", "ts"]),
        ["user_id", "event_type"],
        "ts",
        period_seconds=86400,
        max_time_diff=600.0,
        min_occurrences=3,
    )
    return out.select_columns(["user_id", "event_type", "ts"])


def q_session_combos_events(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.session import session_combos

    out = session_combos(
        _read(sf_dir, "events", ["user_id", "event_type", "ts"]),
        ["user_id"],
        ["event_type"],
        "ts",
        gap_seconds=1800.0,
    )
    return out.select_columns(
        ["user_id", "session_id", "event_type_set", "first_ts", "last_ts", "n_events"]
    )


def q_ivf_topk_embeddings(sf_dir: str):
    """Trained-IVF top-k with nprobe = n_centroids (every cell
    probed → exact brute-force equivalence): oracle-checks the full
    IVF plumbing (sampling pass, k-means training, assignment,
    probing, distributed merge). Pruning-recall at nprobe=8 is
    pytest-checked (recall@10 vs brute force)."""
    import ray

    import pyarrow.parquet as pq

    from logdata_anomaly_miner_ray.stages.ann import ivf_topk

    t0 = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q0 = np.array(
        [t0.filter(pc.equal(pc.field("vec_id"), 0))["embedding"].to_pylist()[0]],
        dtype=np.float64,
    )
    out = ivf_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        "embedding",
        "vec_id",
        ray.put(q0),
        dim=q0.shape[1],
        k=10,
        n_centroids=16,
        nprobe=16,
    )
    return pa.table(
        {
            "vec_id": pa.array(out["vec_id"].to_numpy(np.int64)),
            "sim_e4": _scaled_int(pa.array(out["sim"].to_numpy(np.float64)), 10_000),
        }
    )


def q_vartype_events(sf_dir: str):
    """VariableTypeDetector type inference (media_decode pattern:
    deterministic fixture, arithmetic oracle): events are bucketed
    into fixed 200-row groups whose values derive from event_id in
    closed form so each group family's inferred kind is a constant —
    stat / unq / d / continuous / range / others, one family per
    grp%6 — and the SQL states those labels arithmetically. All six
    fixtures are order-independent (set-based kinds; the numeric
    families oscillate so no contiguous id segment is monotonic),
    and 200 < sample_per_group keeps every value in the sample.
    Partial tail groups are excluded on BOTH sides (n = 200)."""
    from logdata_anomaly_miner_ray.stages.vartype import infer_types_by_group

    def derive(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        grp = eid // 200
        r = eid % 200
        fam = grp % 6
        vals = np.empty(len(eid), dtype=object)
        vals[fam == 0] = "5"
        m = fam == 1
        vals[m] = np.char.add("v", r[m].astype(str))
        m = fam == 2
        vals[m] = np.array(list("abcd"), dtype=object)[r[m] % 4]
        m = fam == 3
        vals[m] = ((r[m] * 73) % 199).astype(str)
        m = fam == 4
        vals[m] = ((r[m] % 2) * 1000 + ((r[m] * 73) % 199) * 0.001).astype(str)
        m = fam == 5
        vals[m] = np.char.add("x", (r[m] % 199).astype(str))
        return pa.table({
            "grp": pa.array(grp.astype(np.int64), pa.int64()),
            "v": pa.array(vals, pa.string()),
        })

    derived = _read(sf_dir, "events", ["event_id"]).map_batches(
        derive, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    out = infer_types_by_group(derived, "grp", "v", with_sizes=True)
    rows = sorted((int(g), vt.kind) for g, (vt, n) in out.items() if n == 200)
    return pa.table({
        "grp": pa.array([g for g, _ in rows], pa.int64()),
        "var_kind": pa.array([k for _, k in rows], pa.string()),
    })


def q_time_correlation_events(sf_dir: str):
    """TimeCorrelationDetector recast (reference
    TimeCorrelationDetector.py:27-265): windowed pairwise
    cause→effect trigger tables — for each atom matching effect
    feature g, count cause features f whose last prior trigger lies
    within 10 s, summing the gaps. Features here are the
    value-match rules over event_type (the deterministic feature
    set); windows of 2000 records over the global event_id sequence
    mirror record_count_before_event + reset. Oracle: DuckDB ASOF
    join per (window, cause) on the same (ts, event_id) stream
    order; deltas are exact integer microseconds."""
    from logdata_anomaly_miner_ray.stages._agg import distinct_rows
    from logdata_anomaly_miner_ray.stages.correlation import time_correlation_report

    ds = _read(sf_dir, "events", ["event_type", "event_id", "ts"])
    types = sorted(distinct_rows(ds, ["event_type"]).to_pandas()["event_type"])
    rep = time_correlation_report(
        ds, "ts", "event_id",
        [[("event_type", v)] for v in types],
        record_window=2000, max_delta=10.0,
    )
    rep["a_event"] = rep["a_idx"].map(dict(enumerate(types)))
    rep["b_event"] = rep["b_idx"].map(dict(enumerate(types)))
    return rep[["window", "a_event", "b_event", "n", "delta_us"]]


def q_implication_rules_events(sf_dir: str):
    """EventCorrelationDetector FULL lifecycle, now ORACLE-exact:
    hypothesis generation from temporally-close samples, support
    evaluation, binomial rule acceptance. At the gate parameters
    (generation_probability = generation_factor = 1.0) every RNG
    draw is accepted, so generation is deterministic: each event
    pairs with its last ≤10 predecessors (bounded candidate deque)
    within the window — a window-function join in SQL. The binomial
    acceptance threshold (get_min_eval_true recast) is replayed
    step-for-step by a recursive CTE walking the same log-space
    float path. The 1000-hypothesis cap never binds at 5 event
    types (≤20 ordered pairs), keeping head() order irrelevant."""
    from logdata_anomaly_miner_ray.stages.correlation import event_correlation_rules

    # synthetic events are near-independent (hit rates ~2% at 1h);
    # p0=0.01 keeps the acceptance path exercised with real output
    out = event_correlation_rules(
        _read(sf_dir, "events", ["user_id", "event_type", "ts"]),
        ["user_id"],
        "event_type",
        "ts",
        max_delta=3600.0,
        hypothesis_max_delta_time=3600.0,
        p0=0.01,
        alpha=0.05,
    )
    return pa.table(
        {
            "a_event": pa.array(out["a_event"].astype(str), pa.string()),
            "b_event": pa.array(out["b_event"].astype(str), pa.string()),
            "n_a": pa.array(out["n_a"].to_numpy(np.int64)),
            "n_hit": pa.array(out["n_hit"].to_numpy(np.int64)),
            "conf_e6": _scaled_int(
                pa.array(out["confidence"].to_numpy(np.float64)), 1_000_000
            ),
            "min_hits": pa.array(out["min_hits"].to_numpy(np.int64)),
        }
    )


def q_correlation_rules_lineitem(sf_dir: str):
    """VariableCorrelationDetector 'Rel' rules over lineitem's
    discrete columns: deterministic value implications in both
    directions, each surviving iff its left value co-occurs with
    exactly one right value over the WHOLE table — recomputable in
    SQL via HAVING count(DISTINCT right) = 1."""
    from logdata_anomaly_miner_ray.stages.correlation_rules import (
        fit_rel_rules,
        pair_cooccurrence_counts,
    )

    def derive(batch: pa.Table) -> pa.Table:
        # tax_cents → tax_band is deterministic BY CONSTRUCTION (the
        # synthetic tables have no natural deterministic pair), so
        # the rule-extraction path provably fires; the natural
        # (l_returnflag, l_linestatus) pair checks agreed absence
        cents = pc.cast(
            pc.round(pc.multiply(batch["l_tax"], 100.0), ndigits=0), pa.int64()
        )
        band = pc.divide(cents, 3)  # integer division on int64
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "tax_cents": cents,
                "tax_band": band,
            }
        )

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_tax"]).map_batches(
        derive, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    pairs = [("l_returnflag", "l_linestatus"), ("tax_cents", "tax_band")]
    cooc = pair_cooccurrence_counts(ds, pairs)
    rows = []
    for (ca, cb) in pairs:
        rules = fit_rel_rules(cooc[(ca, cb)])
        for a, (b, n) in rules["fwd"].items():
            rows.append((ca, a, cb, b, n))
        for b, (a, n) in rules["rev"].items():
            rows.append((cb, b, ca, a, n))
    return pa.table(
        {
            "col_a": pa.array([r[0] for r in rows], pa.string()),
            "val_a": pa.array([r[1] for r in rows], pa.string()),
            "col_b": pa.array([r[2] for r in rows], pa.string()),
            "val_b": pa.array([r[3] for r in rows], pa.string()),
            "n": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def q_tail_values_events(sf_dir: str):
    """EventTypeDetector ring-buffer tail recast: the surviving
    value window per event_type after max->min cuts (max=40, min=25
    here so several cuts fire at sf scale); the closed-form cut
    position is recomputed by the oracle in integer SQL."""
    from logdata_anomaly_miner_ray.stages.sampling import tail_values_per_group

    return tail_values_per_group(
        _read(sf_dir, "events", ["event_type", "event_id"]),
        ["event_type"], "event_id", "event_id",
        max_num_vals=40, min_num_vals=25,
    ).select_columns(["event_type", "event_id"])


def q_reservoir_sample_events(sf_dir: str):
    """Deterministic per-group bottom-k priority reservoir
    (EventTypeDetector ring-buffer recast). The md5 priority mode is
    DuckDB-reproducible (md5(CAST(id AS VARCHAR)) ordered as hex), so
    the exact sample membership is oracle-checked."""
    from logdata_anomaly_miner_ray.stages.sampling import reservoir_per_group

    return reservoir_per_group(
        _read(sf_dir, "events", ["event_type", "event_id", "value"]),
        ["event_type"],
        "event_id",
        k=50,
        priority="md5",
    ).select_columns(["event_type", "event_id"])


def q_media_decode(sf_dir: str):
    """Multimodal decode through the REAL stdlib-codec actor pool
    (stages/multimodal.decode_images_stdlib — functions/media PNG/BMP,
    zlib + numpy, no PIL): a deterministic mixed media table
    (image/audio/video by media_id % 4; image payloads are encoded
    checkerboards, audio/video are opaque bytes) streams through the
    actor-pool stage; poison (non-image) rows surface as decode_ok=0
    with -1 sentinel features instead of failing the block. The
    oracle states the expected decode arithmetically: equal-count
    two-value checkerboards make each channel mean the exact integer
    v+1 (the image_roundtrip invariant), dims are id arithmetic."""
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.multimodal import (
        decode_images_stdlib,
    )

    def build(t: pa.Table) -> pa.Table:
        from logdata_anomaly_miner_ray.functions.media import (
            encode_bmp,
            encode_png,
        )

        ids = t["id"].to_numpy(zero_copy_only=False)
        kinds, payloads = [], []
        for i in ids.tolist():
            m = i % 4
            if m in (0, 1):
                kinds.append("image")
                h, w = 8 + i % 5, 8 + (i % 3) * 2
                y, x = np.mgrid[0:h, 0:w]
                par = ((y + x) % 2).astype(np.uint8)
                img = np.zeros((h, w, 3), np.uint8)
                for c, mult in enumerate((1, 3, 7)):
                    img[:, :, c] = (i * mult) % 254 + 2 * par
                payloads.append(
                    encode_png(img) if i % 2 == 0 else encode_bmp(img))
            else:
                kinds.append("audio" if m == 2 else "video")
                payloads.append(bytes([m]) * 32)  # opaque: must not decode
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        })

    media = rd.range(128).map_batches(
        build, batch_format="pyarrow", batch_size=None)
    # null-bearing fixed-size-list columns break Ray's to_pandas
    # tensor casting — drain via Arrow batches (CLAUDE.md rule)
    parts = [b for b in decode_images_stdlib(media).iter_batches(
        batch_format="pyarrow")]
    dec = pa.concat_tables(parts)
    order = np.argsort(dec["media_id"].to_numpy(zero_copy_only=False))
    ids = dec["media_id"].to_numpy(zero_copy_only=False)[order]
    m4 = ids % 4
    kind = np.where(m4 <= 1, "image", np.where(m4 == 2, "audio", "video"))
    feat = np.full((len(ids), 11), -1.0, dtype=np.float64)
    fl = dec["features"].to_pylist()
    for out_i, src_i in enumerate(order.tolist()):
        f = fl[src_i]
        if f is not None and len(f):
            feat[out_i] = np.asarray(f, dtype=np.float64)
    ok = dec["decode_ok"].to_numpy(zero_copy_only=False)[order]
    feat[~ok] = -1.0
    return pd.DataFrame({
        "media_id": ids,
        "kind": kind,
        "decode_ok": ok.astype(np.int64),
        "height": feat[:, 0].astype(np.int64),
        "width": feat[:, 1].astype(np.int64),
        "channels": feat[:, 2].astype(np.int64),
        "mean_r": feat[:, 3].astype(np.int64),
        "mean_g": feat[:, 4].astype(np.int64),
        "mean_b": feat[:, 5].astype(np.int64),
    })


def q_quality_scores_documents(sf_dir: str):
    """Heuristic web-text quality score; deterministic arithmetic
    over token/char-class counts, recomputed exactly by the SQL
    oracle (document text is ASCII so char counts == byte counts)."""
    from logdata_anomaly_miner_ray.stages.text_analysis import with_quality_score

    out = with_quality_score(_read(sf_dir, "documents", ["doc_id", "text"]))

    def scale(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "quality_e6": _scaled_int(t["quality"], 1_000_000)}
        )

    return out.map_batches(scale, batch_format="pyarrow", batch_size=None)


def q_langid_documents(sf_dir: str):
    from logdata_anomaly_miner_ray.stages.text_analysis import LangIdScorer

    return LangIdScorer.apply(
        _read(sf_dir, "documents", ["doc_id", "text"])
    ).select_columns(["doc_id", "pred_lang"])


def q_fingerprints_documents(sf_dir: str):
    """Winnowing fingerprint in the portable md5 hash family (min
    digest over word 3-shingles) — oracle recomputes with SQL md5().
    The engine's rolling-hash fingerprint + SimHash columns
    (with_fingerprints) are the scale path, pytest-verified."""
    from logdata_anomaly_miner_ray.functions.hashing import min_shingle_md5

    def add(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fp_min": pa.array(min_shingle_md5(batch["text"], k=3), pa.string()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def q_minhash_pairs_documents(sf_dir: str):
    """Banded MinHash LSH candidates verified with EXACT word 3-gram
    Jaccard ≥ 0.5; oracle recomputes the all-pairs shingle-set
    Jaccard in SQL (feasible at test scale). The fixture's true
    near-dup pairs all sit at J ≥ 0.88 with nothing in [0.3, 0.88),
    far above the LSH miss region for the 16×4 banding."""
    from logdata_anomaly_miner_ray.stages.dedup import minhash_verified_pairs

    out = minhash_verified_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        "text",
        "doc_id",
        jaccard_threshold=0.5,
        candidate_threshold=0.25,
    )
    return pa.table(
        {
            "id_a": pa.array(out["id_a"].to_numpy(np.int64)),
            "id_b": pa.array(out["id_b"].to_numpy(np.int64)),
            "jac_e6": _scaled_int(pa.array(out["jaccard"].to_numpy(np.float64)), 1_000_000),
        }
    )


def q_ngram_jaccard_pairs_documents(sf_dir: str):
    """EXACT word 3-gram Jaccard similarity join (≥ 0.4) via
    prefix-filtered candidate generation (Bayardo et al. WWW'07) +
    the shared exact-verify tail — the no-miss-probability
    counterpart of the MinHash query. Oracle: the same all-pairs
    shingle-set intersection in SQL at the lower threshold."""
    from logdata_anomaly_miner_ray.stages.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        "text",
        "doc_id",
        k_shingle=3,
        jaccard_threshold=0.4,
    )
    return pa.table(
        {
            "id_a": pa.array(out["id_a"].to_numpy(np.int64)),
            "id_b": pa.array(out["id_b"].to_numpy(np.int64)),
            "jac_e6": _scaled_int(pa.array(out["jaccard"].to_numpy(np.float64)), 1_000_000),
        }
    )


def q_decontaminate_documents(sf_dir: str):
    """Eval-set n-gram decontamination (Brown et al. 2020 appendix C):
    documents whose text shares any word 4-gram with the deterministic
    eval subset (doc_id % 41 == 0), with the count of distinct shared
    grams. Eval grams broadcast once; the corpus side is one
    shuffle-free pass. Oracle recomputes gram membership on strings."""
    from logdata_anomaly_miner_ray.stages.decontam import decontaminate

    def _mod41(want_zero: bool):
        def f(t: pa.Table) -> pa.Table:
            r = t["doc_id"].to_numpy(zero_copy_only=False) % 41 == 0
            return t.filter(pa.array(r if want_zero else ~r))
        return f

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    corpus = docs.map_batches(
        _mod41(False), batch_format="pyarrow", batch_size=None)
    eval_ds = docs.map_batches(
        _mod41(True), batch_format="pyarrow", batch_size=None)
    out = decontaminate(corpus, eval_ds, "text", "doc_id", k=4)
    df = out.to_pandas()
    if len(df) == 0:  # empty Datasets lose their schema through to_pandas
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64),
             "n_hits": pd.Series(dtype=np.int64)}
        )
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "n_hits": df["n_hits"].to_numpy(np.int64)}
    )


def q_dup_span_coverage_documents(sf_dir: str):
    """Duplicate-span coverage (Lee et al. 2022 exact-substring dedup,
    gram-fingerprint recast): per document, total word 8-gram
    positions and positions whose gram occurs in ≥2 distinct
    documents. One bounded keyed shuffle of per-(doc, gram) count
    rows; the duplicated-gram set never materializes."""
    from logdata_anomaly_miner_ray.stages.decontam import dup_span_coverage

    out = dup_span_coverage(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id", w=8
    )
    df = out.to_pandas()
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "n_pos": df["n_pos"].to_numpy(np.int64),
         "n_dup_pos": df["n_dup_pos"].to_numpy(np.int64)}
    )


def q_dup_span_rewrite_documents(sf_dir: str):
    """Exact duplicate-window dedup REWRITE (Lee et al. 2022 / C4
    style): remove every non-overlapping word 8-gram window occurring
    in >= 2 distinct documents and emit the cleaned text. A boilerplate
    sentence of exactly 8 tokens is injected deterministically from
    doc_id (header on doc_id % 5 != 0 -> window-aligned duplicate;
    footer on doc_id % 7 == 0 -> usually misaligned, exercising short
    final windows) IDENTICALLY in Arrow and SQL; the oracle recomputes
    the whole rewrite on strings, so cleaned text compares bit-exact."""
    import pyarrow.compute as pc

    from logdata_anomaly_miner_ray.stages.decontam import dup_span_rewrite

    bp = "please subscribe to our newsletter for more updates"

    def inject(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        txt = t["text"].cast(pa.string())
        bps = pa.array([bp] * len(d), pa.string())
        cur = pc.if_else(
            pa.array(d % 5 != 0),
            pc.binary_join_element_wise(bps, txt, " "), txt)
        cur = pc.if_else(
            pa.array(d % 7 == 0),
            pc.binary_join_element_wise(cur, bps, " "), cur)
        return pa.table({"doc_id": t["doc_id"], "text": cur})

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        inject, batch_format="pyarrow", batch_size=None)
    out = dup_span_rewrite(ds, "text", "doc_id", w=8)
    df = out.to_pandas()
    if len(df) == 0:  # empty Datasets lose their schema through to_pandas
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64),
             "clean_text": pd.Series(dtype=str),
             "n_win": pd.Series(dtype=np.int64),
             "n_dup": pd.Series(dtype=np.int64)}
        )
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "clean_text": df["clean_text"].astype(str),
         "n_win": df["n_win"].to_numpy(np.int64),
         "n_dup": df["n_dup"].to_numpy(np.int64)}
    )


def q_paragraph_dedup_documents(sf_dir: str):
    """Corpus-wide paragraph dedup, keep-first (CCNet §3.1 paragraph
    hashing / RefinedWeb). Multi-paragraph docs are synthesized
    deterministically: a shared boilerplate header on doc_id % 3 != 0,
    the original body, a 'thanks for reading' line whose SPACING
    varies on doc_id % 4 == 0 (tab + double spaces — exercises the
    normalization key), a trailing blank line on doc_id % 5 == 0
    (structural blanks never dedup), and a within-doc body repeat on
    doc_id % 7 == 0. The oracle recomputes the whole keep-first
    rewrite in SQL (row_number over the normalized paragraph), so
    clean_text compares bit-exact."""
    import pyarrow.compute as pc

    from logdata_anomaly_miner_ray.stages.decontam import paragraph_dedup

    def inject(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        txt = t["text"].cast(pa.string())
        n = len(d)

        def const(s):
            return pa.array([s] * n, pa.string())

        cur = pc.if_else(
            pa.array(d % 3 != 0),
            pc.binary_join_element_wise(const("welcome to our site"), txt, "\n"),
            txt)
        thanks = pc.if_else(
            pa.array(d % 4 == 0),
            const("thanks \t for  reading"), const("thanks for reading"))
        cur = pc.binary_join_element_wise(cur, thanks, "\n")
        cur = pc.if_else(
            pa.array(d % 5 == 0),
            pc.binary_join_element_wise(cur, const(""), "\n"), cur)
        cur = pc.if_else(
            pa.array(d % 7 == 0),
            pc.binary_join_element_wise(cur, txt, "\n"), cur)
        return pa.table({"doc_id": t["doc_id"], "text": cur})

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        inject, batch_format="pyarrow", batch_size=None)
    df = paragraph_dedup(ds, "text", "doc_id").to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64),
             "clean_text": pd.Series(dtype=str),
             "n_paras": pd.Series(dtype=np.int64),
             "n_dropped": pd.Series(dtype=np.int64)}
        )
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "clean_text": df["clean_text"].astype(str),
         "n_paras": df["n_paras"].to_numpy(np.int64),
         "n_dropped": df["n_dropped"].to_numpy(np.int64)}
    )


def q_pmi_collocations_documents(sf_dir: str):
    """Top-30 word collocations by PMI (Church & Hanks 1990) over
    adjacent whitespace-token bigrams, min support 5. Within a fixed
    corpus PMI orders exactly like n_ab/(n_a*n_b), so the checked
    ranking key is the exact integer 10^12*n_ab // (n_a*n_b) — no log
    in any oracle-checked column (DuckDB ln() is 1 ulp off numpy)."""
    from logdata_anomaly_miner_ray.stages.vocab import pmi_collocations

    t = pmi_collocations(
        _read(sf_dir, "documents", ["text"]), k=30, min_count=5)
    return t.to_pandas()


def q_pack_sequences_documents(sf_dir: str):
    """Concat-and-chunk sequence-packing manifest (GPT-style loader
    packing): documents in doc_id order, one EOS separator token
    between documents, fixed 128-token training sequences. The global
    token offsets come from a distributed exclusive prefix scan
    (per-block sums -> driver scan -> broadcast bases); the oracle is
    a SQL window cumsum over the same order — integer-exact."""
    from logdata_anomaly_miner_ray.stages.packing import pack_sequences

    out = pack_sequences(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        "text", "doc_id", seq_len=128, sep_tokens=1,
    )
    df = out.to_pandas()
    cols = ["doc_id", "n_tok", "tok_start", "seq_first", "seq_last",
            "off_in_first"]
    if len(df) == 0:  # empty Datasets lose their schema through to_pandas
        return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
    return pd.DataFrame({c: df[c].to_numpy(np.int64) for c in cols})


def q_url_normalize_documents(sf_dir: str):
    """URL canonicalization (RFC 3986 syntax-based normalization as
    applied before web-corpus URL dedup): raw URLs are synthesized
    deterministically from doc_id IDENTICALLY in Arrow and SQL
    (mixed-case scheme/host, www., default and non-default ports,
    utm_* params in every position, fragments), then both engines
    normalize — scheme/host lowercase, www./default-port/fragment/
    utm_*/bare-root-slash dropped. Both are RE2, so the canonical
    URLs compare bit-exact."""
    import pyarrow.compute as pc

    from logdata_anomaly_miner_ray.functions.url import normalize_url_array

    def build(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)

        def s(a):
            return pc.cast(pa.array(a, pa.int64()), pa.string())

        def pick(mask, val, other=""):
            return pc.if_else(
                pa.array(mask),
                pa.array([val] * len(d), pa.string()),
                other if isinstance(other, (pa.Array, pa.ChunkedArray))
                else pa.array([other] * len(d), pa.string()),
            )

        scheme = pick(d % 2 == 0, "http://", "HTTPS://")
        www = pick(d % 3 == 0, "WWW.")
        host = pc.binary_join_element_wise(
            www, "Site", s(d % 13), ".ORG", "")
        port = pick(d % 4 == 0, ":80", pick(d % 4 == 1, ":443",
                                            pick(d % 4 == 2, ":8080")))
        path = pc.if_else(
            pa.array(d % 5 == 0),
            pa.array(["/"] * len(d), pa.string()),
            pc.binary_join_element_wise(
                pa.array(["/p/"] * len(d), pa.string()), s(d % 7), ""),
        )
        q1 = pc.binary_join_element_wise(
            pa.array(["?utm_source=x&q="] * len(d), pa.string()), s(d % 11), "")
        q2 = pc.binary_join_element_wise(
            pa.array(["?q="] * len(d), pa.string()), s(d % 11), "&utm_b=2", "")
        query = pc.if_else(pa.array(d % 3 == 0), q1,
                           pc.if_else(pa.array(d % 3 == 1), q2,
                                      pa.array([""] * len(d), pa.string())))
        frag = pc.if_else(
            pa.array(d % 6 == 0),
            pc.binary_join_element_wise(
                pa.array(["#Sec"] * len(d), pa.string()), s(d % 9), ""),
            pa.array([""] * len(d), pa.string()),
        )
        url = pc.binary_join_element_wise(scheme, host, port, path, query, frag, "")
        return pa.table(
            {"doc_id": t["doc_id"], "url_norm": normalize_url_array(url)})

    out = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        build, batch_format="pyarrow", batch_size=None)
    df = out.to_pandas()
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "url_norm": df["url_norm"].astype(str)}
    )


def _synth_url_table(t: pa.Table) -> pa.Table:
    """(doc_id, url, n_chars) with URLs synthesized deterministically
    from doc_id IDENTICALLY in Arrow and SQL: mixed-case scheme/host,
    www., default and non-default ports, and an unparseable variant
    every 17th row (no scheme → null host in both engines)."""
    import pyarrow.compute as pc

    d = t["doc_id"].to_numpy(zero_copy_only=False)
    n = len(d)

    def s(a):
        return pc.cast(pa.array(a, pa.int64()), pa.string())

    def const(v):
        return pa.array([v] * n, pa.string())

    scheme = pc.if_else(pa.array(d % 2 == 0), const("http://"), const("HTTPS://"))
    www = pc.if_else(pa.array(d % 3 == 0), const("WWW."), const(""))
    host = pc.binary_join_element_wise(www, "Site", s(d % 13), ".ORG", "")
    port = pc.if_else(
        pa.array(d % 4 == 0), const(":80"),
        pc.if_else(pa.array(d % 4 == 1), const(":443"),
                   pc.if_else(pa.array(d % 4 == 2), const(":8080"), const(""))))
    path = pc.binary_join_element_wise(const("/p/"), s(d % 7), "")
    url = pc.binary_join_element_wise(scheme, host, port, path, "")
    url = pc.if_else(
        pa.array(d % 17 == 0),
        pc.binary_join_element_wise(const("page-"), s(d), ""), url)
    return pa.table({"doc_id": t["doc_id"], "url": url, "n_chars": t["n_chars"]})


def q_host_stats_documents(sf_dir: str):
    """Per-domain corpus stats (stages/webstats.host_stats): the host
    key (lowercased authority, www./port stripped — RE2 in both
    engines) groups a fused per-block partial pass; merge is the
    two-tier driver-fold / coarse-key-groupby pattern. Unparseable
    URLs group under the '(none)' sentinel. n_docs and sum_chars are
    exact integers."""
    from logdata_anomaly_miner_ray.stages.webstats import host_stats

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _synth_url_table, batch_format="pyarrow", batch_size=None)
    out = host_stats(ds, "url", ("n_chars",))
    return pd.DataFrame(
        {"host_key": out["host"].fillna("(none)").astype(str),
         "n_docs": out["n_docs"].to_numpy(np.int64),
         "sum_chars": out["sum_n_chars"].to_numpy(np.int64)}
    )


def q_host_cap_documents(sf_dir: str):
    """Per-domain retention cap (stages/webstats.host_cap —
    RefinedWeb-style): keep at most k=3 docs per URL host, preferring
    longest n_chars (ties: doc_id asc). One shuffle-free narrow
    (host, id, order) pass + mergeable per-block top-k partials; the
    keep manifest is bounded by k x |hosts|. Unparseable URLs group
    under '(none)'."""
    from logdata_anomaly_miner_ray.stages.webstats import host_cap

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _synth_url_table, batch_format="pyarrow", batch_size=None)
    out = host_cap(ds, "url", "doc_id", "n_chars", k=3).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"host_key": pd.Series(dtype=object),
             "doc_id": pd.Series(dtype=np.int64),
             "n_chars": pd.Series(dtype=np.int64),
             "host_rank": pd.Series(dtype=np.int64)})
    out["host_rank"] = out["host_rank"].astype(np.int64)
    return out[["host_key", "doc_id", "n_chars", "host_rank"]].sort_values(
        ["host_key", "host_rank"], ignore_index=True)


def q_url_dedup_latest_documents(sf_dir: str):
    """CDX-style latest-capture collapse per canonical URL
    (stages/webstats.url_dedup_latest): raw captures (url, ts) are
    synthesized deterministically from doc_id IDENTICALLY in Arrow
    and SQL (mixed-case scheme/host, www., default + non-default
    ports, an unparseable variant every 17th row — all COLLIDING
    after RFC 3986 canonicalization); keep the greatest-ts capture
    per canonical URL (ties: doc_id asc) plus the collapsed capture
    count. One shuffle-free partial pass bounded by distinct urls per
    block + a coarse-bucket merge."""
    import pyarrow.compute as pc

    from logdata_anomaly_miner_ray.stages.webstats import url_dedup_latest

    def build(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(d)

        def s(a):
            return pc.cast(pa.array(a, pa.int64()), pa.string())

        def const(v):
            return pa.array([v] * n, pa.string())

        scheme = pc.if_else(pa.array(d % 2 == 0), const("http://"),
                            const("HTTPS://"))
        www = pc.if_else(pa.array(d % 3 == 0), const("WWW."), const(""))
        host = pc.binary_join_element_wise(www, "Site", s(d % 5), ".ORG", "")
        port = pc.if_else(
            pa.array(d % 4 == 0), const(":80"),
            pc.if_else(pa.array(d % 4 == 1), const(":443"),
                       pc.if_else(pa.array(d % 4 == 2), const(":8080"),
                                  const(""))))
        path = pc.binary_join_element_wise(const("/p/"), s(d % 3), "")
        url = pc.binary_join_element_wise(scheme, host, port, path, "")
        url = pc.if_else(
            pa.array(d % 17 == 0),
            pc.binary_join_element_wise(const("page-"), s(d % 11), ""), url)
        ts = 1_600_000_000 + ((d * 7919) % 256) * 60
        return pa.table({"doc_id": t["doc_id"], "url": url,
                         "ts_s": pa.array(ts, pa.int64())})

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        build, batch_format="pyarrow", batch_size=None)
    out = url_dedup_latest(ds, "url", "doc_id", "ts_s").to_pandas()
    return pd.DataFrame({
        "url_norm": out["url_norm"].astype(str),
        "doc_id": out["doc_id"].to_numpy(np.int64),
        "ts_s": out["ts_s"].to_numpy(np.int64),
        "n_captures": out["n_captures"].to_numpy(np.int64),
    }).sort_values("url_norm", ignore_index=True)


def q_domain_stats_documents(sf_dir: str):
    """Per-registrable-domain (eTLD+1) doc counts (stages/webstats.
    domain_stats): multi-label hosts synthesized from doc_id
    (subdomain farms over both plain TLDs and a listed public suffix
    'co.uk'; unparseable every 17th row → '(none)'). The eTLD+1 key
    = last 3 labels when the last 2 are a listed suffix, else last 2
    (two RE2 tail extractions + is_in, mirrored by regexp_extract +
    IN). One shuffle-free partial pass + a tiny groupby."""
    import pyarrow.compute as pc

    from logdata_anomaly_miner_ray.stages.webstats import domain_stats

    def build(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(d)

        def s(a):
            return pc.cast(pa.array(a, pa.int64()), pa.string())

        def const(v):
            return pa.array([v] * n, pa.string())

        sub = pc.if_else(
            pa.array(d % 3 == 0),
            pc.binary_join_element_wise(const("sub"), s(d % 4), const("."), ""),
            const(""))
        tld = pc.if_else(pa.array(d % 2 == 0), const(".co.uk"),
                         const(".org"))
        url = pc.binary_join_element_wise(
            const("http://"), sub, const("Site"), s(d % 5), tld,
            const("/p"), "")
        url = pc.if_else(
            pa.array(d % 17 == 0),
            pc.binary_join_element_wise(const("junk-"), s(d), ""), url)
        return pa.table({"doc_id": t["doc_id"], "url": url})

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        build, batch_format="pyarrow", batch_size=None)
    out = domain_stats(ds, "url", suffixes=("co.uk",))
    return pd.DataFrame({
        "domain": out["domain"].astype(str),
        "n_docs": out["n_docs"].to_numpy(np.int64),
    }).sort_values("domain", ignore_index=True)


def q_token_novelty_documents(sf_dir: str):
    """Per-document novel-token-type fraction (stages/vocab.
    token_novelty — the Lee et al. 2022 inter-document repetition
    QA): distinct word types per doc, types first seen in this doc
    (corpus-wide min doc_id), and the exact integer fraction
    10^6·n_novel // n_types. Corpus-sized work = ONE narrow
    (word, min_id) type reduction shared with vocab_growth;
    per-doc counts attach by union + coarse-key merge."""
    from logdata_anomaly_miner_ray.stages.vocab import token_novelty

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = token_novelty(ds).to_pandas()
    return pd.DataFrame({
        "doc_id": out["doc_id"].to_numpy(np.int64),
        "n_types": out["n_types"].to_numpy(np.int64),
        "n_novel": out["n_novel"].to_numpy(np.int64),
        "novelty_e6": out["novelty_e6"].to_numpy(np.int64),
    }).sort_values("doc_id", ignore_index=True)


def q_group_split_documents(sf_dir: str):
    """Leakage-safe train/val/test split (stages/sampling.
    group_split_assign — GroupShuffleSplit discipline): the split
    hashes the URL HOST, so every doc of a site lands in one split
    and near-duplicate pages never straddle train/eval. Hosts from
    the same synthesized URL table as host_cap; null hosts coalesce
    to '(none)'. Shuffle-free one-pass; oracle = CASE over
    md5(host)."""
    import pyarrow.compute as pc

    from logdata_anomaly_miner_ray.functions.url import host_of_array
    from logdata_anomaly_miner_ray.stages.sampling import group_split_assign

    def add_host(t: pa.Table) -> pa.Table:
        host = pc.fill_null(host_of_array(t["url"]), "(none)")
        return pa.table({"doc_id": t["doc_id"], "host_key": host})

    ds = (_read(sf_dir, "documents", ["doc_id", "n_chars"])
          .map_batches(_synth_url_table, batch_format="pyarrow",
                       batch_size=None)
          .map_batches(add_host, batch_format="pyarrow", batch_size=None))
    out = group_split_assign(ds, "host_key", "doc_id").to_pandas()
    return pd.DataFrame({
        "doc_id": out["doc_id"].to_numpy(np.int64),
        "host_key": out["host_key"].astype(str),
        "split": out["split"].astype(str),
    }).sort_values("doc_id", ignore_index=True)


def q_fix_mojibake_documents(sf_dir: str):
    """Encoding repair (stages/text_analysis.fix_mojibake — the
    ftfy/double-encoding unwind of CCNet/FineWeb cleaning):
    deterministic mojibake tokens appended to the (ASCII) corpus
    text per doc_id class — a latin-1 class ('cafÃ©' → 'café'), a
    cp1252 class ('â€™' → '’'), and an INVALID class (lone 'Ã' —
    strict UTF-8 decode fails, row must come back unchanged). The
    oracle states the repaired literals arithmetically (the
    media_decode fixture pattern). ASCII fast path = exact (ASCII
    strings are fixed points of the unwind)."""
    import pyarrow.compute as pc

    from logdata_anomaly_miner_ray.stages.text_analysis import fix_mojibake

    def build(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(d)

        def const(v):
            return pa.array([v] * n, pa.string())

        t7 = pc.if_else(pa.array(d % 7 == 0), const(" cafÃ©"),
                        const(""))
        t11 = pc.if_else(pa.array(d % 11 == 0),
                         const(" itâ€™s"), const(""))
        t13 = pc.if_else(pa.array(d % 13 == 0), const(" Ã"), const(""))
        text = pc.binary_join_element_wise(t["text"], t7, t11, t13, "")
        return pa.table({"doc_id": t["doc_id"], "text": text})

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        build, batch_format="pyarrow", batch_size=None)
    out = fix_mojibake(ds).to_pandas()
    return pd.DataFrame({
        "doc_id": out["doc_id"].to_numpy(np.int64),
        "fixed_text": out["fixed_text"].astype(str),
        "was_fixed": out["was_fixed"].astype(bool),
    }).sort_values("doc_id", ignore_index=True)


def q_robots_parse_documents(sf_dir: str):
    """robots.txt group parsing (stages/webstats.robots_parse — the
    fetch → PARSE → filter chain's middle): deterministic robots
    bodies exercise comments, CRLF endings, a named-agent group
    (ignored), consecutive User-agent lines forming one star group,
    empty Disallow and Allow lines (no rule), and a rule before any
    group (ignored). One shuffle-free vectorized pass (masked-cumsum
    group ids + bincount star membership); output = distinct (host,
    prefix) Disallow rules of the '*' group."""
    import pyarrow.compute as pc

    from logdata_anomaly_miner_ray.stages.webstats import robots_parse

    def build(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(d)

        def s(a):
            return pc.cast(pa.array(a, pa.int64()), pa.string())

        def const(v):
            return pa.array([v] * n, pa.string())

        host = pc.binary_join_element_wise(
            const("site"), s(d % 5), const(".org"), "")
        ua2 = pc.if_else(pa.array(d % 2 == 0),
                         const("User-agent: bingbot\n"), const(""))
        last = pc.if_else(
            pa.array(d % 3 == 0), const("Disallow: /q"),
            pc.binary_join_element_wise(const("Disallow: /r/"), s(d % 2), ""))
        body = pc.binary_join_element_wise(
            const("Disallow: /early\n# comment line\n"
                  "User-agent: googlebot\nDisallow: /gb"),
            s(d % 3),
            const("\n\n"),
            ua2,
            const("User-agent: *\r\nAllow: /open\nDisallow: /p/"),
            s(d % 4),
            const("  # trailing comment\nDisallow:\n"),
            last, "")
        return pa.table({"host": host, "robots_txt": body})

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        build, batch_format="pyarrow", batch_size=None)
    out = robots_parse(ds, "host", "robots_txt").to_pandas()
    return pd.DataFrame({
        "host": out["host"].astype(str),
        "prefix": out["prefix"].astype(str),
    }).sort_values(["host", "prefix"], ignore_index=True)


_LEXICON = {
    "storage": ["scan", "table", "column", "row"],
    "exec": ["join", "merge", "sort", "hash"],
    "stream": ["stream", "window", "batch"],
}


def q_lexicon_classify_documents(sf_dir: str):
    """Keyword-lexicon topic routing (stages/text_analysis.
    lexicon_classify): per doc, exact lowercased-token hit counts
    against a 3-topic lexicon, argmax topic (ties: topic name asc),
    zero-hit docs '(none)'. Lexicon broadcast once; ONE shuffle-free
    vectorized pass (flat searchsorted + bincount)."""
    from logdata_anomaly_miner_ray.stages.text_analysis import lexicon_classify

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = lexicon_classify(ds, _LEXICON, "text", "doc_id").to_pandas()
    return pd.DataFrame({
        "doc_id": out["doc_id"].to_numpy(np.int64),
        "topic": out["topic"].astype(str),
        "n_hits": out["n_hits"].to_numpy(np.int64),
    }).sort_values("doc_id", ignore_index=True)


def q_stratified_sample_documents(sf_dir: str):
    """Exact stratified sample (stages/sampling.stratified_sample):
    per (source, lang) stratum keep exactly ceil(n/7) docs by the
    content-keyed md5(doc_id) priority — deterministic under
    re-sharding and SQL-reproducible (row_number over md5 order vs
    the exact integer quota (n + 6) // 7). Pass 1 = tiny per-stratum
    count groupby; pass 2 = mergeable per-block local top-k_g."""
    from logdata_anomaly_miner_ray.stages.sampling import stratified_sample

    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang"])
    out = stratified_sample(ds, ("source", "lang"), "doc_id", (1, 7)).to_pandas()
    return pd.DataFrame({
        "source": out["source"].astype(str),
        "lang": out["lang"].astype(str),
        "doc_id": out["doc_id"].to_numpy(np.int64),
    }).sort_values(["source", "lang", "doc_id"], ignore_index=True)


def q_cross_source_overlap_documents(sf_dir: str):
    """Cross-source exact-duplicate Venn census
    (stages/dedup.cross_source_overlap): per distinct text's source
    SET, the distinct-text and total-doc counts — the overlap report
    run before mixing crawls/dumps. 128-bit md5 identity; narrow
    (hash, source, n) partials; ONE coarse-bucket shuffle; per-set
    reduction inside the bucket so the driver fold is bounded by
    |distinct source sets|."""
    from logdata_anomaly_miner_ray.stages.dedup import cross_source_overlap

    return cross_source_overlap(
        _read(sf_dir, "documents", ["text", "source"]), "text", "source")


def q_vocab_growth_documents(sf_dir: str):
    """Heaps'-law vocabulary growth curve (stages/vocab.vocab_growth):
    distinct word types within each of 10 doc_id-prefix cutoffs,
    computed from ONE narrow (word, min doc_id) reduction + a tiny
    first-occurrence histogram — never a per-prefix rescan. The
    corpus-QA probe for boilerplate dominance / OCR noise."""
    from logdata_anomaly_miner_ray.stages.vocab import vocab_growth

    return vocab_growth(
        _read(sf_dir, "documents", ["doc_id", "text"]), n_checkpoints=10)


def q_bpe_learn_documents(sf_dir: str):
    """First 3 BPE merges (stages/vocab.bpe_learn — Sennrich et al.
    2016, character-level): iterative most-frequent adjacent symbol
    pair over word TYPES, greedy left-to-right merge application.
    The corpus-sized work is one narrow (word, cnt) reduction; the
    merge loop runs over the vocabulary. Oracle = 3 UNROLLED merge
    iterations in SQL (the _KMEANS_CTE precedent): per iteration,
    pair counts via a pos+1 self-join, argmax by (c DESC, s1, s2),
    greedy non-overlap selection as odd-run-position candidates
    (consecutive candidates only occur for s1 = s2), and sequence
    rebuild via window functions."""
    from logdata_anomaly_miner_ray.stages.vocab import bpe_learn

    return bpe_learn(
        _read(sf_dir, "documents", ["text"]), n_merges=3)


def q_bpe_encode_documents(sf_dir: str):
    """BPE tokenizer APPLICATION (stages/vocab.bpe_encode): the 3
    learned merges applied to every word occurrence, one shuffle-free
    pass with a per-block word-type cache. Oracle reuses the learn
    oracle's unrolled CTEs: the post-merge symbol table s3 gives
    per-word token counts, joined back onto the doc word stream."""
    from logdata_anomaly_miner_ray.stages.vocab import bpe_encode, bpe_learn

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    learned = bpe_learn(docs, n_merges=3)
    merges = list(zip(learned["s1"].to_pylist(), learned["s2"].to_pylist()))
    return bpe_encode(docs, merges)


def q_fertility_stats_documents(sf_dir: str):
    """Per-language tokenizer fertility report
    (stages/vocab.fertility_stats): BPE tokens per word + UTF-8 bytes
    per token per lang, over the 3 learned merges — the multilingual
    tokenizer-quality metric (Ács 2019 / Rust et al. 2021). lang
    rides the shuffle-free encode pass as a carry column; ratios are
    exact floor-divided scaled integers."""
    from logdata_anomaly_miner_ray.stages.vocab import (
        bpe_learn, fertility_stats)

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    learned = bpe_learn(docs, n_merges=3)
    merges = list(zip(learned["s1"].to_pylist(), learned["s2"].to_pylist()))
    return fertility_stats(docs, merges)


def q_editdist_pairs_documents(sf_dir: str):
    """Edit-distance-verified near-dup pairs (stages/editdist): the
    candidate rule is a 1-permutation MinHash LSH (same lang + same
    min md5 3-gram, the portable min_shingle_md5 convention) and the
    verifier is Myers' bit-parallel Levenshtein over UTF-8 bytes —
    byte granularity matches DuckDB levenshtein() exactly. Text
    shuffles ONCE into bounded candidate cells; all-pairs + Myers run
    inside each tiny group (hard_cap aborts on degenerate buckets)."""
    from logdata_anomaly_miner_ray.stages.editdist import (
        editdist_verified_pairs,
    )

    out = editdist_verified_pairs(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
        max_dist=24).to_pandas()  # typed-empty rule: schema survives
    return pd.DataFrame({
        "id_a": out.get("id_a", pd.Series(dtype=np.int64)).to_numpy(np.int64),
        "id_b": out.get("id_b", pd.Series(dtype=np.int64)).to_numpy(np.int64),
        "dist": out.get("dist", pd.Series(dtype=np.int64)).to_numpy(np.int64),
    })


def q_dedup_cluster_sizes_documents(sf_dir: str):
    """Near-dup cluster-size histogram (the dedup QA report): edit-
    distance verified pairs → connected components (min-id label) →
    (cluster size, #clusters). Membership is bounded by the verified-
    pair count (≪ corpus), so the histogram folds on the driver;
    singleton docs (no pair) are NOT clusters — matching the SQL,
    which only sees nodes of the edge list. Oracle embeds the
    editdist oracle + recursive-CTE closure verbatim."""
    from logdata_anomaly_miner_ray.stages.dedup import connected_components
    from logdata_anomaly_miner_ray.stages.editdist import (
        editdist_verified_pairs,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    pairs = editdist_verified_pairs(docs, max_dist=24).materialize()
    comp = connected_components(pairs).to_pandas()
    if comp.empty:
        return pd.DataFrame({
            "n_members": pd.Series(dtype=np.int64),
            "n_clusters": pd.Series(dtype=np.int64)})
    sizes = comp.groupby("component").size()
    hist = sizes.value_counts().sort_index()
    return pd.DataFrame({
        "n_members": hist.index.to_numpy(np.int64),
        "n_clusters": hist.to_numpy(np.int64),
    })


def q_neardup_keep_best_documents(sf_dir: str):
    """Near-dup retention policy (keep BEST, not first): edit-distance
    verified pairs (stages/editdist) → connected components
    (stages/dedup.connected_components, component = min id) → per
    cluster keep the member with the highest quality_e6 (tie → lowest
    doc_id). Cluster membership is bounded by the verified-pair count
    (≪ corpus), so only members' quality rows gather; the corpus
    passes are shuffle-free. Oracle composes the editdist + quality
    oracles with a recursive-CTE min-label closure."""
    from logdata_anomaly_miner_ray.stages.dedup import connected_components
    from logdata_anomaly_miner_ray.stages.editdist import (
        editdist_verified_pairs,
    )
    from logdata_anomaly_miner_ray.stages.text_analysis import (
        with_quality_score,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    # materialize: connected_components does count() + a drain — an
    # unmaterialized pipeline would run the whole verify job twice
    pairs = editdist_verified_pairs(docs, max_dist=24).materialize()
    comp = connected_components(pairs).to_pandas()
    empty = pd.DataFrame({
        "cluster": pd.Series(dtype=np.int64),
        "kept_doc_id": pd.Series(dtype=np.int64),
        "n_members": pd.Series(dtype=np.int64)})
    if comp.empty:
        return empty
    import ray as _ray

    members_ref = _ray.put(np.sort(comp["id"].to_numpy(np.int64)))

    def member_rows(t: pa.Table, _ref=members_ref) -> pa.Table:
        ids = _ray.get(_ref)
        return t.filter(pc.is_in(t["doc_id"], pa.array(ids, pa.int64())))

    q = with_quality_score(
        docs.map_batches(member_rows, batch_format="pyarrow",
                         batch_size=None))

    def qe6(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "quality_e6": _scaled_int(t["quality"], 1_000_000)})

    qd = q.map_batches(qe6, batch_format="pyarrow",
                       batch_size=None).to_pandas()  # bounded: members only
    m = comp.rename(columns={"id": "doc_id", "component": "cluster"}) \
        .merge(qd, on="doc_id")
    m = m.sort_values(["cluster", "quality_e6", "doc_id"],
                      ascending=[True, False, True], kind="mergesort")
    n = m.groupby("cluster", sort=True).size().rename("n_members")
    best = m.drop_duplicates("cluster").set_index("cluster")
    out = best.join(n).reset_index()
    return pd.DataFrame({
        "cluster": out["cluster"].to_numpy(np.int64),
        "kept_doc_id": out["doc_id"].to_numpy(np.int64),
        "n_members": out["n_members"].to_numpy(np.int64)})


def q_winnow_fingerprints_documents(sf_dir: str):
    """Robust winnowing (functions/hashing.winnow_select — the MOSS
    algorithm, Schleimer et al. 2003): md5 word-3-gram digests under
    a 4-gram window, min per window with the rightmost-tie rule,
    overlapping selections dedup. One shuffle-free vectorized pass;
    the oracle replays the window minimum with an explicit
    window-membership join + max(i) FILTER for the tie rule."""
    from logdata_anomaly_miner_ray.functions.hashing import winnow_select

    def sel(t: pa.Table) -> pa.Table:
        rid, pos, fp = winnow_select(t["text"], k=3, w=4)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[rid], pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "fp": pa.array(fp, pa.string()),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        sel, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def q_snapshot_diff_documents(sf_dir: str):
    """Crawl-to-crawl snapshot delta (stages/snapshot.snapshot_diff):
    two snapshots are synthesized deterministically from the corpus —
    A holds docs with doc_id % 3 != 0, B holds doc_id % 5 != 2, and
    B's capture content differs (a '#v2' suffix before digesting) for
    every 7th doc — so all four statuses (added/removed/changed/
    unchanged) are populated. Content identity is md5(text), identical
    in Arrow and SQL; the diff itself is one keyed shuffle of narrow
    digest rows classified per key (raw text never shuffles), counts
    per (status, lang)."""
    from logdata_anomaly_miner_ray.functions.hashing import md5_hex
    from logdata_anomaly_miner_ray.stages.snapshot import snapshot_diff

    def explode(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lang = t["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        h = np.array(md5_hex(text), dtype=object)
        suf = pc.if_else(pa.array(d % 7 == 0),
                         pa.array(["#v2"] * len(d), pa.string()),
                         pa.array([""] * len(d), pa.string()))
        h2 = np.array(md5_hex(
            pc.binary_join_element_wise(text, suf, "")), dtype=object)
        in_a, in_b = d % 3 != 0, d % 5 != 2
        key = np.concatenate([d[in_a], d[in_b]])
        snap = np.array(["a"] * int(in_a.sum()) + ["b"] * int(in_b.sum()),
                        dtype=object)
        hh = np.concatenate([h[in_a], h2[in_b]])
        lg = pa.concat_arrays(
            [lang.filter(pa.array(in_a)), lang.filter(pa.array(in_b))])
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "snap": pa.array(snap, pa.string()),
            "h": pa.array(list(hh), pa.string()),
            "lang": lg,
        })

    narrow = _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return snapshot_diff(narrow, carry_col="lang")


def q_robots_filter_documents(sf_dir: str):
    """Robots-exclusion-style URL filtering (stages/webstats
    .robots_filter — RFC 9309 path-prefix Disallow semantics): drop a
    row when host matches a rule AND the path-and-query starts with
    the rule's prefix; unparseable URLs conservatively kept. Rule set
    broadcasts once; ONE shuffle-free pass of host-equality AND
    starts_with Arrow kernels per rule."""
    from logdata_anomaly_miner_ray.stages.webstats import robots_filter

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _synth_url_table, batch_format="pyarrow", batch_size=None)
    return robots_filter(
        ds, "url",
        [("site1.org", "/p/1"), ("site4.org", "/p/"),
         ("site7.org", "/p/3")],
    ).select_columns(["doc_id", "url"])


def q_politeness_manifest_documents(sf_dir: str):
    """Crawl-frontier politeness schedule (stages/sampling
    .politeness_manifest): host-interleaved fetch order — per-host
    seq by content-keyed md5 order, global slot under ORDER BY
    (seq, host). One coarse-host bucketed shuffle of narrow rows for
    the seqs + one range sort with the driver prefix-scan for the
    slots; no global row_number materializes."""
    from logdata_anomaly_miner_ray.stages.sampling import (
        politeness_manifest,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _synth_url_table, batch_format="pyarrow", batch_size=None)
    return politeness_manifest(ds, "url", "doc_id")


def q_blocklist_filter_documents(sf_dir: str):
    """Domain blocklist filtering (stages/webstats.blocklist_filter):
    the curated denylist broadcasts once (ray.put) and the corpus
    streams through ONE shuffle-free is_in filter on the derived host
    key; null-host (malformed-URL) rows are conservatively KEPT —
    mirrored in SQL with an explicit IS NULL OR NOT IN."""
    from logdata_anomaly_miner_ray.stages.webstats import blocklist_filter

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _synth_url_table, batch_format="pyarrow", batch_size=None)
    out = blocklist_filter(
        ds, "url", ["site1.org", "site5.org", "site12.org"],
        host_out_col="host",
    ).to_pandas()
    return pd.DataFrame(
        {"doc_id": out["doc_id"].to_numpy(np.int64),
         "host_key": out["host"].fillna("(none)").astype(str)}
    )


def q_mixture_repeat_documents(sf_dir: str):
    """Epoch-weighted source mixture resampling
    (stages/sampling.mixture_repeat): per-source EXACT rational epoch
    multipliers — src0 ×3, src1 ×5/2, src2 ×1/2, src3 dropped, the
    rest ×1. Integral epochs repeat every doc; the fractional epoch
    is a deterministic content-keyed coin (first 4 md5 hex nibbles of
    the id vs the exact remainder fraction), so the resampled
    manifest is stable under re-sharding and corpus growth.
    Shuffle-free; the oracle replays the integer rule with
    generate_series + the strpos-nibble md5 recast."""
    from logdata_anomaly_miner_ray.stages.sampling import mixture_repeat

    out = mixture_repeat(
        _read(sf_dir, "documents", ["doc_id", "source"]),
        "source",
        {"src0": (3, 1), "src1": (5, 2), "src2": (1, 2), "src3": (0, 1)},
        "doc_id",
    ).to_pandas()
    return pd.DataFrame(
        {"doc_id": out["doc_id"].to_numpy(np.int64),
         "source": out["source"].astype(str),
         "copy": out["copy"].to_numpy(np.int64)}
    )


def q_c4_line_filter_documents(sf_dir: str):
    """C4-style line-level cleaning rewrite
    (stages/text_analysis.c4_line_filter): the corpus text (flat
    words) is first shaped into LINES deterministically and
    IDENTICALLY in Arrow and SQL — 5-token windows joined by spaces,
    a terminal-punctuation suffix cycling [. ! <none> ?] on
    (doc_id + ord) % 4, and ' javascript' injected on
    (doc_id + ord) % 7 — then both engines apply the published C4
    line rules (terminal punctuation, ≥3 words, no blocklist phrase)
    and the ≥2-kept-lines document gate, rebuilding clean_text as the
    kept lines joined by newlines. One shuffle-free vectorized pass;
    every predicate is the same RE2 on both sides."""
    import pyarrow.compute as pc

    from logdata_anomaly_miner_ray.stages.text_analysis import c4_line_filter

    W = 5

    def synth(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(txt), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        cnt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        cnt = cnt.astype(np.int64)
        first = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        j = np.arange(len(flat), dtype=np.int64) - first[parent]
        starts = np.flatnonzero(j % W == 0)
        line_tok_off = np.concatenate([starts, [len(flat)]]).astype(np.int32)
        line_strs = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(line_tok_off, pa.int32()), flat),
            " ")
        line_parent = parent[starts]
        line_ord = j[starts] // W
        d = t["doc_id"].to_numpy(zero_copy_only=False)[line_parent]
        m4 = ((d + line_ord) % 4).astype(np.int64)
        sfx = np.array([".", "!", "", "?"], dtype=object)[m4]
        inj = np.where((d + line_ord) % 7 == 0, " javascript", "")
        full = pc.binary_join_element_wise(
            line_strs, pa.array(inj.tolist(), pa.string()),
            pa.array(sfx.tolist(), pa.string()), "")
        n_lines_row = np.bincount(line_parent, minlength=t.num_rows)
        row_off = np.concatenate([[0], np.cumsum(n_lines_row)]).astype(np.int32)
        text2 = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(row_off, pa.int32()), full),
            "\n")
        return pa.table({"doc_id": t["doc_id"], "text": text2})

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        synth, batch_format="pyarrow", batch_size=None)
    out = c4_line_filter(ds, min_words=3, min_lines=2).to_pandas()
    return pd.DataFrame(
        {"doc_id": out["doc_id"].to_numpy(np.int64),
         "clean_text": out["clean_text"].astype(str),
         "n_lines": out["n_lines"].to_numpy(np.int64),
         "n_kept": out["n_kept"].to_numpy(np.int64)}
    )


def q_shuffle_shards_documents(sf_dir: str):
    """Deterministic global training-order shuffle + shard manifest
    (stages/sampling.shuffle_shard_manifest): order by
    md5(CAST(doc_id AS VARCHAR)) — a content-keyed uniform
    permutation — then shard = rank // 200, pos = rank % 200. The
    only all-to-all is a range sort over NARROW (id, md5-hex) rows;
    global ranks come from the per-block prefix-scan pattern
    (pack_sequences): one metadata row per block folds on the driver
    into base ranks. Oracle = row_number() OVER the same md5 order."""
    from logdata_anomaly_miner_ray.stages.sampling import shuffle_shard_manifest

    out = shuffle_shard_manifest(
        _read(sf_dir, "documents", ["doc_id"]), "doc_id", shard_size=200
    ).to_pandas()
    return pd.DataFrame(
        {"doc_id": out["doc_id"].to_numpy(np.int64),
         "shard": out["shard"].to_numpy(np.int64),
         "pos": out["pos"].to_numpy(np.int64)}
    )


def q_lm_score_documents(sf_dir: str):
    """Stupid-backoff n-gram LM quality scoring
    (stages/lm.stupid_backoff_scores — the CCNet-style reference-LM
    quality gate, Brants et al. 2007 backoff): the reference corpus
    is the source='src0' subset (the small curated side — its 1/2/3-
    gram count tables fold to the driver and broadcast once), and the
    full corpus streams through ONE shuffle-free vectorized pass.
    Per-token scores are exact integers (count ratios · 10^6 floor-
    divided; 0.4 = 2/5 stays rational), so DuckDB reproduces the sum
    bit-for-bit via LEFT JOINs on gram strings + the same CASE
    ladder."""
    from logdata_anomaly_miner_ray.stages.lm import stupid_backoff_scores

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def ref_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["source"], "src0"))

    ref = docs.map_batches(ref_only, batch_format="pyarrow", batch_size=None)
    out = stupid_backoff_scores(docs, ref).to_pandas()
    return pd.DataFrame(
        {"doc_id": out["doc_id"].to_numpy(np.int64),
         "n_tok": out["n_tok"].to_numpy(np.int64),
         "lm_score": out["lm_score"].to_numpy(np.int64)}
    )


def q_ccnet_buckets_documents(sf_dir: str):
    """CCNet head/middle/tail corpus split (stages/lm
    .perplexity_buckets — Wenzek et al. 2020 §4.4): every document is
    LM-scored against the src0 reference corpus (the oracle embeds
    the lm_score SQL verbatim), then cut at the exact per-lang
    tertiles — values at 1-based ranks ceil(n/3) and ceil(2n/3) of
    the sorted integer scores (grouped_quantiles, quantile_disc
    semantics). Bucket assignment is a pure integer comparison; the
    threshold table broadcasts once and the corpus streams through
    one shuffle-free pass (lang rides as a carry column — no
    corpus-sized join)."""
    from logdata_anomaly_miner_ray.stages.lm import (
        perplexity_buckets,
        stupid_backoff_scores,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source", "lang"])

    def ref_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["source"], "src0"))

    ref = docs.map_batches(ref_only, batch_format="pyarrow", batch_size=None)
    out = perplexity_buckets(
        stupid_backoff_scores(docs, ref, carry_cols=("lang",))).to_pandas()
    return pd.DataFrame(
        {"doc_id": out["doc_id"].to_numpy(np.int64),
         "lang": out["lang"].astype(str),
         "n_tok": out["n_tok"].to_numpy(np.int64),
         "lm_score": out["lm_score"].to_numpy(np.int64),
         "bucket": out["bucket"].astype(str)}
    )


def q_image_roundtrip_documents(sf_dir: str):
    """REAL image-codec round-trip (functions/media.decode_png /
    decode_bmp — stdlib zlib + numpy, no PIL): checkerboard images
    are synthesized arithmetically from doc_id (height 8+d%5, width
    8+(d%3)·2, per-channel values v and v+2 alternating per pixel
    parity), ENCODED to real PNG (even ids) or BMP (odd ids) bytes,
    then decoded back through the actor-pool decode stage and reduced
    to exact integer pixel statistics: equal-count two-value
    checkerboards make the per-channel mean the exact integer v+1 and
    the population std exactly 1. The oracle states those integers
    arithmetically — the whole encode→decode→stats path must be
    bit-correct for the hash to match."""
    from logdata_anomaly_miner_ray.functions.media import (
        decode_image, encode_bmp, encode_png)

    def build_and_decode(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        out = {"doc_id": [], "height": [], "width": [], "channels": [],
               "mean_r": [], "mean_g": [], "mean_b": [], "std_x1000": []}
        for did in d.tolist():
            h, w = 8 + did % 5, 8 + (did % 3) * 2
            y, x = np.mgrid[0:h, 0:w]
            par = ((y + x) % 2).astype(np.uint8)
            img = np.zeros((h, w, 3), np.uint8)
            for c, mult in enumerate((1, 3, 7)):
                v = (did * mult) % 254
                img[:, :, c] = v + 2 * par
            payload = encode_png(img) if did % 2 == 0 else encode_bmp(img)
            dec = decode_image(payload)  # the REAL codec round-trip
            px = dec.reshape(-1, 3).astype(np.int64)
            n = px.shape[0]
            means = px.sum(axis=0) // n  # exact by construction
            var_num = int(((px - means) ** 2).sum())  # == 3n for ±1
            std1000 = int(round((var_num / (3 * n)) ** 0.5 * 1000))
            out["doc_id"].append(did)
            out["height"].append(dec.shape[0])
            out["width"].append(dec.shape[1])
            out["channels"].append(dec.shape[2])
            out["mean_r"].append(int(means[0]))
            out["mean_g"].append(int(means[1]))
            out["mean_b"].append(int(means[2]))
            out["std_x1000"].append(std1000)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    res = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        build_and_decode, batch_format="pyarrow", batch_size=256,
        concurrency=8).to_pandas()
    return pd.DataFrame({c: res[c].to_numpy(np.int64) for c in res.columns})


def q_extract_text_documents(sf_dir: str):
    """HTML → visible-text extraction round-trip — the north-star
    per-row invariant ("byte-identical extracted text per url",
    BASELINE.json input_hint) made a first-class check. Each
    document's text is wrapped in a realistic deterministic HTML page
    (head/title/style/script boilerplate laden with entities and
    angle brackets, comments, nav/h1 block structure, inline <b>
    markup injected mid-text, whitespace noise, an entity-encoded
    visible suffix on doc_id%7 rows — functions/html.build_page_html),
    serialized to binary, and the vectorized RE2 extraction chain
    (functions/html.extract_text_array) must recover the page's
    visible text byte-identically. The oracle states the expected
    visible text directly over the table, so any divergence anywhere
    in the build → serialize → extract chain breaks the value hash.
    One zero-copy map_batches pass; no shuffle."""
    from logdata_anomaly_miner_ray.functions.html import (
        build_page_html,
        extract_text_array,
    )

    def rt(t: pa.Table) -> pa.Table:
        html = build_page_html(t["doc_id"], t["text"]).cast(pa.binary())
        return pa.table(
            {"doc_id": t["doc_id"], "extracted": extract_text_array(html)}
        )

    out = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        rt, batch_format="pyarrow", batch_size=None)
    df = out.to_pandas()
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "extracted": df["extracted"].astype(str)}
    )


def q_split_assign_documents(sf_dir: str):
    """Deterministic content-keyed train/val/test split
    (stages/sampling.split_assign): md5(CAST(doc_id AS VARCHAR))
    compared lexicographically against fixed hex-prefix boundaries
    (≈90/5/5). Re-sharding, re-ordering, or growing the corpus never
    moves an existing document between splits — the stability
    property a 100 TB training pipeline needs. Shuffle-free; oracle
    is the same CASE over DuckDB's md5()."""
    from logdata_anomaly_miner_ray.stages.sampling import split_assign

    out = split_assign(_read(sf_dir, "documents", ["doc_id"]), "doc_id")
    df = out.to_pandas()
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "split": df["split"].astype(str)}
    )


def q_normalize_text_documents(sf_dir: str):
    """Unicode canonicalization (functions/text.normalize_nfc_lower):
    decomposed combining sequences are injected deterministically
    (every 'a' → 'A'+U+0300, every 'e' → 'E'+U+0301 — the corpus text
    is ASCII, so the injection is reversible and the oracle can state
    it in SQL via chr()), then NFC-composed and Unicode-lowercased.
    Arrow's utf8proc kernels and DuckDB's nfc_normalize/lower
    implement the same Unicode algorithms, so the output value-hash
    is exact. One zero-copy map_batches pass; no shuffle."""
    from logdata_anomaly_miner_ray.functions.text import normalize_nfc_lower

    def norm(t: pa.Table) -> pa.Table:
        s = t["text"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        s = pc.replace_substring(s, "a", "A\u0300")
        s = pc.replace_substring(s, "e", "E\u0301")
        return pa.table({"doc_id": t["doc_id"],
                         "norm_text": normalize_nfc_lower(s)})

    out = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow", batch_size=None)
    df = out.to_pandas()
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "norm_text": df["norm_text"].astype(str)}
    )


def q_tfidf_top_terms_documents(sf_dir: str):
    """Inverted-index statistics + TF-IDF-ordered top terms per
    document (stages/ranking.py): one tokenization pass → (doc, term,
    tf) with NO shuffle (docs are block-local), per-block DF partials
    → one narrow cluster-sized groupby, broadcast (term, df) join
    tier, per-block head-k. Ordering is the exact integer key
    (tf DESC, df ASC, term ASC) — TF-IDF with the monotone log
    removed, so the output is bit-exact vs SQL window row_number."""
    from logdata_anomaly_miner_ray.stages.ranking import tfidf_top_terms

    out = tfidf_top_terms(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=5)
    df = out.to_pandas()
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "term": df["term"].astype(str),
         "tf": df["tf"].to_numpy(np.int64),
         "df": df["df"].to_numpy(np.int64),
         "rnk": df["rnk"].to_numpy(np.int64)}
    )


_SEARCH_TERMS = ["the", "scan", "window", "query", "spark"]


def q_term_search_documents(sf_dir: str):
    """Exact lexical search (the integer-exact core of a BM25
    ranker): broadcast query-term set, per-block (doc, term, tf) +
    doc_len, mergeable per-term top-k partials — the shuffle carries
    at most k rows per term per block; no global sort. Ordered by
    (tf DESC, doc_len ASC, doc_id ASC) — BM25's per-term score is
    monotone ↑tf / ↓doc_len for a fixed term, so this IS the BM25
    ranking for single-term queries, with no float in the
    oracle-checked columns."""
    from logdata_anomaly_miner_ray.stages.ranking import term_search_topk

    out = term_search_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        _SEARCH_TERMS, k=10)
    df = out.to_pandas()
    return pd.DataFrame(
        {"term": df["term"].astype(str),
         "doc_id": df["doc_id"].to_numpy(np.int64),
         "tf": df["tf"].to_numpy(np.int64),
         "doc_len": df["doc_len"].to_numpy(np.int64),
         "rnk": df["rnk"].to_numpy(np.int64)}
    )


def q_bm25_topk_documents(sf_dir: str):
    """Okapi BM25 (k1=1.2, b=0.75) per-term top-k with the tf/doc-len
    saturation trade-off expressed as an EXACT integer ordering key:
    sat_key = (3*T + 9*N*doc_len)*1e9 // tf (score DESC == key ASC;
    idf is constant within a term and drops out; see
    stages/ranking.bm25_topk). Two passes — a 2-ints-per-block corpus
    stats partial, then broadcast query set + per-block keys +
    mergeable per-term top-k partials; no float anywhere."""
    from logdata_anomaly_miner_ray.stages.ranking import bm25_topk

    out = bm25_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        _SEARCH_TERMS, k=10)
    df = out.to_pandas()
    return pd.DataFrame(
        {"term": df["term"].astype(str),
         "doc_id": df["doc_id"].to_numpy(np.int64),
         "tf": df["tf"].to_numpy(np.int64),
         "doc_len": df["doc_len"].to_numpy(np.int64),
         "sat_key": df["sat_key"].to_numpy(np.int64),
         "rnk": df["rnk"].to_numpy(np.int64)}
    )


def q_bpe_pair_counts_documents(sf_dir: str):
    """Vocabulary-induction statistics: corpus-wide adjacent
    codepoint-pair occurrence counts over whitespace pretokens — the
    exact first-merge counting step of a BPE trainer
    (stages/vocab.bpe_pair_counts). Offset-vectorized
    utf8_slice_codeunits pair explode (codepoint semantics == DuckDB
    substr), per-block Arrow group_by partials, ONE narrow groupby
    (rows bounded by distinct pairs per block, not corpus size), then
    mergeable local top-k + a k-rows-per-block driver fold."""
    from logdata_anomaly_miner_ray.stages.vocab import bpe_pair_counts

    out = bpe_pair_counts(
        _read(sf_dir, "documents", ["text"]), k=20).to_pandas()
    return pd.DataFrame(
        {"pair": out["pair"].astype(str),
         "cnt": out["cnt"].to_numpy(np.int64),
         "rnk": out["rnk"].to_numpy(np.int64)}
    )


def q_dsir_weights_documents(sf_dir: str):
    """DSIR-style importance weights (Xie et al. 2023) with the exact
    integer likelihood-ratio score (stages/importance.dsir_weights):
    tokens hash to 64 buckets via the first 4 md5 nibbles (the
    SQL-reproducible hash family), target = lang 'en'; per-bucket
    score s_b = ((ct+1)*(Tr+B)*1e6) // ((cr+1)*(Tt+B)) folded from
    2*B-ints-per-block partials; doc weight = sum of its tokens'
    scores in a shuffle-free second pass. The faithful float log-LLR
    column (w_llr) is user-facing and excluded here (DuckDB ln is
    1-ulp off numpy on ~25% of inputs, measured)."""
    from logdata_anomaly_miner_ray.stages.importance import dsir_weights

    out = dsir_weights(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
        target_col="lang", target_value="en", n_buckets=64,
    ).to_pandas()
    return pd.DataFrame(
        {"doc_id": out["doc_id"].to_numpy(np.int64),
         "n_tok": out["n_tok"].to_numpy(np.int64),
         "weight": out["weight"].to_numpy(np.int64)}
    )


def q_extract_links_documents(sf_dir: str):
    """Anchor extraction over deterministic link-bearing pages
    (functions/html.build_link_page_html + extract_links_table): each
    document's page carries one external entity-encoded anchor, k =
    1 + doc_id % 4 internal /doc/<t> anchors with formula-derived
    targets, and decoy anchors inside <script> and comments that must
    NOT surface. The oracle re-derives every (doc_id, pos, href)
    arithmetically from doc_id, so any extraction divergence (subtree
    drops, attribute parsing, entity decode, ordering) breaks the
    hash. One zero-copy map_batches pass; no shuffle."""
    from logdata_anomaly_miner_ray.functions.html import (
        build_link_page_html,
        extract_links_table,
    )

    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def links(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return extract_links_table(ids, build_link_page_html(ids, n_docs))

    out = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        links, batch_format="pyarrow", batch_size=None)
    df = out.to_pandas()
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "pos": df["pos"].to_numpy(np.int64),
         "href": df["href"].astype(str)}
    )


def q_anchor_text_topk_documents(sf_dir: str):
    """Per-target anchor-text aggregation (stages/graph.anchor_text_topk)
    over the deterministic link pages: extract (href, anchor) with
    inner-tag strip + entity decode + whitespace collapse, then rank
    each target's anchor texts by count (count DESC, anchor ASC).
    Narrow (href, anchor, n) partials, ONE coarse-bucket shuffle. The
    oracle re-derives every anchor arithmetically ('site' on the
    external link, 'Doc <t>' with indegree counts on /doc/<t>)."""
    from logdata_anomaly_miner_ray.functions.html import (
        build_link_page_html,
        extract_links_table,
    )
    from logdata_anomaly_miner_ray.stages.graph import anchor_text_topk

    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    def links(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return extract_links_table(
            ids, build_link_page_html(ids, n_docs), with_text=True)

    pages = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        links, batch_format="pyarrow", batch_size=None)
    df = anchor_text_topk(pages, "href", "anchor", k=2).to_pandas()
    if df.empty:
        return pd.DataFrame(
            {"href": pd.Series(dtype=object),
             "anchor": pd.Series(dtype=object),
             "n_anchor": pd.Series(dtype=np.int64),
             "rnk": pd.Series(dtype=np.int64)})
    return df.sort_values(["href", "rnk"], ignore_index=True)


def q_pagerank_documents(sf_dir: str):
    """Distributed PageRank over the extracted link graph in exact
    int64 fixed-point (stages/graph.py): total mass 10^12 units,
    r0 = S//n, contribution = r//outdeg, r' = (15*(S//n))//100 +
    (85*sum_in)//100 — integer sums are order-independent, so the
    result is bit-identical at any partitioning/cluster size, and a
    SQL oracle unrolls the same recurrence with DuckDB // division.
    3 iterations; edges come from the SAME vectorized anchor
    extraction the extract_links query checks (build → extract →
    parse target), so the whole chain is oracle-gated. Broadcast tier
    (rank vector via ray.put, sparse per-block bincount partials, one
    shuffle-free pass per iteration); the scale tier (ranks as a
    Dataset, 2 coarse keyed shuffles/iter) is exercised in tests."""
    from logdata_anomaly_miner_ray.stages.graph import link_edges, pagerank

    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    out = pagerank(
        link_edges(_read(sf_dir, "documents", ["doc_id"]), n_docs),
        n_docs, iters=3)
    df = out.to_pandas()
    return pd.DataFrame(
        {"node": df["node"].to_numpy(np.int64),
         "rank_fp": df["rank_fp"].to_numpy(np.int64)}
    )


def q_hits_scores_documents(sf_dir: str):
    """HITS hubs & authorities (stages/graph.hits_scores) over the
    extracted link graph in exact int64 fixed-point: each iteration
    pushes a ← Aᵀh then h ← A·a (the NEW a), renormalizing by the
    exact floor-rescale q = max(Σraw // 10^12, 1). Integer sums are
    order-independent ⇒ bit-identical at any partitioning; the SQL
    oracle unrolls the same recurrence (2 iterations) with DuckDB //
    and scalar-subquery totals. Broadcast tier here; the scale tier
    (vectors stay Datasets, coarse-keyed attach + per-node sums) is
    exercised in tests."""
    import pyarrow.parquet as pq

    from logdata_anomaly_miner_ray.stages.graph import hits_scores, link_edges

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    out = hits_scores(
        link_edges(_read(sf_dir, "documents", ["doc_id"]), n_docs),
        n_docs, iters=2)
    df = out.to_pandas()
    return pd.DataFrame(
        {"node": df["node"].to_numpy(np.int64),
         "auth_fp": df["auth_fp"].to_numpy(np.int64),
         "hub_fp": df["hub_fp"].to_numpy(np.int64)}
    ).sort_values("node", ignore_index=True)


def _hits_sql(iters: int) -> str:
    """Unrolled HITS SQL mirroring stages/graph.hits_scores: per
    push, raw sums via the edge join, total → q = greatest(Σ //
    10^12, 1), vector = coalesce(raw, 0) // q over ALL doc nodes."""
    S = 10**12
    parts = [f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
k AS (SELECT doc_id AS src, 1 + doc_id % 4 AS outdeg FROM documents),
j AS (SELECT src, outdeg,
             unnest(generate_series(0, outdeg - 1))::BIGINT AS jj
      FROM k),
e AS (SELECT j.src, (j.src * 31 + 7 * jj + 1) % nn.n AS dst
      FROM j CROSS JOIN nn),
h0 AS (SELECT doc_id AS node, {S} // nn.n AS v
       FROM documents CROSS JOIN nn)"""]
    prev_h = "h0"
    for i in range(1, iters + 1):
        parts.append(f""",
a{i}r AS (SELECT e.dst AS node, SUM(p.v)::HUGEINT AS m
          FROM e JOIN {prev_h} p ON p.node = e.src GROUP BY 1),
a{i}q AS (SELECT greatest(SUM(m) // {S}, 1) AS q FROM a{i}r),
a{i} AS (SELECT d.doc_id AS node,
                CAST(COALESCE(r.m, 0) // q.q AS BIGINT) AS v
         FROM documents d CROSS JOIN a{i}q q
         LEFT JOIN a{i}r r ON r.node = d.doc_id),
h{i}r AS (SELECT e.src AS node, SUM(a.v)::HUGEINT AS m
          FROM e JOIN a{i} a ON a.node = e.dst GROUP BY 1),
h{i}q AS (SELECT greatest(SUM(m) // {S}, 1) AS q FROM h{i}r),
h{i} AS (SELECT d.doc_id AS node,
                CAST(COALESCE(r.m, 0) // q.q AS BIGINT) AS v
         FROM documents d CROSS JOIN h{i}q q
         LEFT JOIN h{i}r r ON r.node = d.doc_id)""")
        prev_h = f"h{i}"
    parts.append(f"""
SELECT a.node, a.v AS auth_fp, h.v AS hub_fp
FROM a{iters} a JOIN h{iters} h ON a.node = h.node
ORDER BY a.node""")
    return "".join(parts)


def q_indegree_hist_documents(sf_dir: str):
    """Link-graph degree distribution (stages/graph.indegree_histogram)
    — the standard power-law QA over a crawl graph: per-block sparse
    (dst, cnt) partials, one coarse-keyed per-node sum, then a tiny
    histogram groupby. Integer counts end-to-end; nodes with zero
    in-links are not emitted (invisible to the edge list), matching
    the SQL GROUP BY. Edges come from the same oracle-gated anchor
    extraction as pagerank."""
    import pyarrow.parquet as pq

    from logdata_anomaly_miner_ray.stages.graph import (
        indegree_histogram,
        link_edges,
    )

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    out = indegree_histogram(
        link_edges(_read(sf_dir, "documents", ["doc_id"]), n_docs))
    df = out.to_pandas()
    return pd.DataFrame(
        {"indegree": df["indegree"].to_numpy(np.int64),
         "n_nodes": df["n_nodes"].to_numpy(np.int64)}
    )


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means over the embedding table (the
    cluster-then-curate primitive: SemDeDup / domain-discovery
    pipelines). k=10, 2 Lloyd iterations, init = the 10 smallest
    vec_ids, squared-L2 argmin with low-cluster-id tie-break, empty
    clusters keep their centroid. Each iteration is one shuffle-free
    pass (per-block partial sums -> driver fold -> broadcast). The
    oracle unrolls both iterations in SQL; assignments are discrete,
    so fp summation-order drift only matters at exact distance ties
    (measure-zero here; verified at all three scales)."""
    from logdata_anomaly_miner_ray.stages.clustering import kmeans_assign

    out, _ = kmeans_assign(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        "embedding", "vec_id", k=10, n_iter=2,
    )
    df = out.to_pandas()
    return pd.DataFrame(
        {"vec_id": df["vec_id"].to_numpy(np.int64),
         "cluster": df["cluster"].to_numpy(np.int64)}
    )


def q_semdedup_embeddings(sf_dir: str):
    """SemDeDup-style semantic dedup (Abbas et al. 2023): k-means
    (k=10, 2 iterations — identical lifecycle to kmeans_embeddings),
    then within each cluster drop vectors cosine-similar (>= 0.45, the
    fixture's near-dup band) to any lower-id cluster-mate. keep is
    0/1. The oracle reuses the unrolled k-means SQL and an EXISTS
    domination check with list_cosine_similarity."""
    from logdata_anomaly_miner_ray.stages.clustering import semdedup

    out = semdedup(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        "embedding", "vec_id", k=10, n_iter=2, cosine_threshold=0.45,
    )
    df = out.to_pandas()
    return pd.DataFrame(
        {"vec_id": df["vec_id"].to_numpy(np.int64),
         "cluster": df["cluster"].to_numpy(np.int64),
         "keep": df["keep"].to_numpy(np.int64)}
    )


def q_chunk_documents(sf_dir: str):
    """Token-aligned document chunking (32-token chunks): the
    row-explosion preprocessing step before embedding / packing.
    Shuffle-free; chunk text assembled with one gather/scatter. The
    oracle rebuilds every chunk string in SQL — bit-exact."""
    from logdata_anomaly_miner_ray.stages.text_analysis import chunk_documents

    out = chunk_documents(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        "text", "doc_id", max_tokens=32,
    )
    df = out.to_pandas()
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "chunk_ord": df["chunk_ord"].to_numpy(np.int64),
         "n_tok": df["n_tok"].to_numpy(np.int64),
         "chunk_text": df["chunk_text"].astype(str)}
    )


def q_corpus_report_documents(sf_dir: str):
    """Per-(source, lang) corpus card: docs / token sums+extrema /
    char sums / high-quality count / langid-agreement count, all
    fused in ONE shuffle-free pass with per-block partials on the
    tiny composite key. Quality is thresholded on the e6-ROUNDED
    integer so the count is SQL-bit-exact; the oracle recomputes the
    quality and langid kernels and groups."""
    from logdata_anomaly_miner_ray.stages.text_analysis import corpus_report

    out = corpus_report(
        _read(sf_dir, "documents",
              ["doc_id", "text", "source", "lang", "n_chars"])
    )
    return out


def q_oov_gram_rate_documents(sf_dir: str):
    """Reference-corpus novelty (integer-exact CCNet perplexity-filter
    recast): distinct word 3-grams per document and how many are
    unseen in the deterministic reference slice (doc_id % 17 == 0).
    Reference grams broadcast once; one shuffle-free corpus pass."""
    from logdata_anomaly_miner_ray.stages.decontam import oov_gram_rate

    def _mod17(want_zero: bool):
        def f(t: pa.Table) -> pa.Table:
            r = t["doc_id"].to_numpy(zero_copy_only=False) % 17 == 0
            return t.filter(pa.array(r if want_zero else ~r))
        return f

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    corpus = docs.map_batches(
        _mod17(False), batch_format="pyarrow", batch_size=None)
    ref_ds = docs.map_batches(
        _mod17(True), batch_format="pyarrow", batch_size=None)
    out = oov_gram_rate(corpus, ref_ds, "text", "doc_id", k=3)
    df = out.to_pandas()
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy(np.int64),
         "n_grams": df["n_grams"].to_numpy(np.int64),
         "n_oov": df["n_oov"].to_numpy(np.int64)}
    )


def q_pii_redaction_documents(sf_dir: str):
    """PII masking (Dolma-style email/IP/SSN/phone regex -> typed
    tokens) with per-type counts. The synthetic corpus has no digits,
    so PII spans are injected deterministically from doc_id (doc_id %
    4 == 0 rows stay clean as the negative control) IDENTICALLY in
    Arrow and SQL; the oracle then recomputes the masking with
    DuckDB's regexp_replace/'g' + regexp_extract_all — both engines
    are RE2, so redacted text compares bit-exact."""
    import pyarrow.compute as pc

    from logdata_anomaly_miner_ray.stages.text_analysis import with_pii_redaction

    def inject(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)

        def s(a):
            return pc.cast(pa.array(a, pa.int64()), pa.string())

        pad4 = pc.utf8_slice_codeunits(s(d % 10000 + 10000), 1)
        pad4b = pc.utf8_slice_codeunits(s(d % 7000 + 10000), 1)
        pii = pc.binary_join_element_wise(
            t["text"], " u", s(d), "@ex", s(d % 5), ".com 10.", s(d % 256),
            ".0.1 call 555-123-", pad4, " ssn 321-54-", pad4b, "",
        )
        txt = pc.if_else(pa.array(d % 4 == 0), t["text"], pii)
        return pa.table({"doc_id": t["doc_id"], "text": txt})

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        inject, batch_format="pyarrow", batch_size=None)
    out = with_pii_redaction(ds, "text", out_col="red_text").to_pandas()
    return pd.DataFrame(
        {"doc_id": out["doc_id"].to_numpy(np.int64),
         "red_text": out["red_text"].astype(str),
         "n_email": out["n_email"].to_numpy(np.int64),
         "n_ipv4": out["n_ipv4"].to_numpy(np.int64),
         "n_ssn": out["n_ssn"].to_numpy(np.int64),
         "n_phone": out["n_phone"].to_numpy(np.int64)}
    )


def q_quota_sample_documents(sf_dir: str):
    """Per-source quota sampling (data mixing): keep the k=10 docs
    per source with the smallest SQL-reproducible priority
    md5(CAST(doc_id AS VARCHAR)) — deterministic, content-derived,
    and computed with NO global sort via the mergeable per-block
    top-k partials of stages/_agg.topk_per_group. Oracle:
    row_number() OVER (PARTITION BY source ORDER BY md5, doc_id)."""
    from logdata_anomaly_miner_ray.functions.hashing import md5_hex
    from logdata_anomaly_miner_ray.stages._agg import topk_per_group

    def stamp(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        prio = md5_hex(pc.cast(t["doc_id"], pa.string()))
        return t.append_column("prio", pa.array(prio, pa.string()))

    ds = _read(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        stamp, batch_format="pyarrow", batch_size=None)
    out = topk_per_group(
        ds, ["source"], "prio", k=10, tiebreak_cols=("doc_id",), ascending=True
    ).to_pandas()
    return pd.DataFrame(
        {"doc_id": out["doc_id"].to_numpy(np.int64),
         "source": out["source"].astype(str)}
    )


def q_bloom_incremental_new_documents(sf_dir: str):
    """Bloom-prefiltered incremental dedup vs a prior snapshot
    (stages/bloom.py): snapshot = documents with doc_id % 3 != 0,
    batch = ALL documents, so 2/3 of the batch are guaranteed exact
    re-ingests the prefilter + exact verify must drop. Bloom-negative
    rows never travel; only candidates enter exact verification.
    Oracle recomputes membership on raw text (NOT EXISTS anti-join),
    so a hash/bitmap bug surfaces as an id-set mismatch."""
    from logdata_anomaly_miner_ray.stages.bloom import bloom_new_ids

    def _snap_only(t: pa.Table) -> pa.Table:
        keep = t["doc_id"].to_numpy(zero_copy_only=False) % 3 != 0
        return t.filter(pa.array(keep))

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    snap = docs.map_batches(
        _snap_only, batch_format="pyarrow", batch_size=None)
    out = bloom_new_ids(docs, snap, "text", "doc_id")
    df = out.to_pandas()
    if len(df) == 0:  # empty Datasets lose their schema through to_pandas
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64)})
    return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64)})


def q_dedup_clusters_documents(sf_dir: str):
    """Near-dup CLUSTER assignment: SimHash pairs (md5 mode, same
    oracle-exact pair set) fed through distributed connected
    components (min-label). Oracle recomputes the components as a
    recursive-CTE transitive closure over the same pairs."""
    from logdata_anomaly_miner_ray.stages.dedup import (
        connected_components,
        simhash_near_dup_pairs,
    )

    pairs = simhash_near_dup_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id",
        max_hamming=3, hash_mode="md5",
    )
    return connected_components(pairs).to_pandas()


def q_exact_quantiles_lineitem(sf_dir: str):
    """Exact order statistics of l_extendedprice with NO global sort:
    t-digest window + count/refine rounds + bounded gather
    (stages/quantiles.py). Values are selected input elements —
    bit-exact vs DuckDB quantile_disc."""
    from logdata_anomaly_miner_ray.stages.quantiles import exact_quantiles

    return exact_quantiles(
        _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
            lambda t: t.rename_columns(["x"]),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ),
        "x",
        [0.01, 0.25, 0.5, 0.75, 0.9, 0.99],
    )



def q_topk_per_group_orders(sf_dir: str):
    """Top-3 orders by totalprice per customer — group-wise top-k
    with no global sort: per-block local top-k partials (mergeable)
    folded under a bounded bucket key (stages/_agg.topk_per_group).
    SQL analogue: row_number() OVER (PARTITION BY ...) <= 3."""
    from logdata_anomaly_miner_ray.stages._agg import topk_per_group

    return topk_per_group(
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]),
        ["o_custkey"], "o_totalprice", k=3, tiebreak_cols=("o_orderkey",),
    )



def q_asof_join_events(sf_dir: str):
    """Backward as-of join (purchase -> latest prior-or-equal click
    per user) via ONE bounded-bucket shuffle + in-bucket merge_asof
    (stages/join.asof_join); inner projection with integer-us delta.
    Oracle: DuckDB ASOF JOIN."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from logdata_anomaly_miner_ray.stages.join import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts", "value"])
    a = ev.filter(expr="event_type == 'purchase'").map_batches(
        lambda t: t.select(["event_id", "user_id", "ts"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    b = ev.filter(expr="event_type == 'click'").map_batches(
        lambda t: t.select(["event_id", "user_id", "ts", "value"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    joined = asof_join(a, b, on="ts", by="user_id", right_cols=["event_id", "ts", "value"])

    def fin(t: _pa.Table) -> _pa.Table:
        t = t.filter(_pc.is_valid(t["event_id_r"]))
        delta = _pc.subtract(
            _pc.cast(t["ts"], _pa.int64()), _pc.cast(t["ts_r"], _pa.int64())
        )
        return _pa.table(
            {
                "event_id": t["event_id"],
                "m_event_id": _pc.cast(t["event_id_r"], _pa.int64()),
                "delta_us": _pc.cast(delta, _pa.int64()),
                "m_value": t["value_r"],
            }
        )

    return joined.map_batches(fin, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)



def q_heavy_hitters_documents(sf_dir: str):
    """Exact heavy-hitter tokens (count > total/32) via per-block
    Misra-Gries sketch partials + broadcast exact recount — the
    bounded-memory recast of EventTypeDetector's exact value-count
    dicts (reference: aminer/analysis/EventTypeDetector.py) for
    unbounded vocabularies. Provably exact: the candidate rule keeps
    every true heavy hitter (stages/heavy_hitters.py docstring)."""
    from logdata_anomaly_miner_ray.stages.heavy_hitters import heavy_hitter_tokens

    return heavy_hitter_tokens(
        _read(sf_dir, "documents", ["text"]), "text", phi_den=32
    )



def q_temperature_mixture_documents(sf_dir: str):
    """Temperature-scaled mixture quotas (α=0.5, Conneau & Lample
    2019 / XLM-R sampling; stages/sampling.temperature_mixture):
    weights are EXACT integer isqrt(n_tok) (SQL mirrors with a ±1
    fixed-up floor(sqrt)), then Hamilton apportionment of a 1M
    budget over the weights."""
    from logdata_anomaly_miner_ray.stages.sampling import temperature_mixture

    out = temperature_mixture(
        _read(sf_dir, "documents", ["source", "text"]),
        "text", "source", budget=1_000_000, alpha_halves=1)
    return pd.DataFrame({
        "source": out["source"].astype(str),
        "n_tok": out["n_tok"].to_numpy(np.int64),
        "weight": out["weight"].to_numpy(np.int64),
        "quota": out["quota"].to_numpy(np.int64),
    })


def q_token_budget_documents(sf_dir: str):
    """Largest-remainder (Hamilton) apportionment of a 1M-token
    budget across sources by exact corpus token mass — quotas sum to
    the budget exactly; base/remainder integer math mirrored by
    HUGEINT // and %% in the oracle."""
    from logdata_anomaly_miner_ray.stages.sampling import token_budget_allocation

    out = token_budget_allocation(
        _read(sf_dir, "documents", ["source", "text"]),
        "text", "source", budget=1_000_000)
    return pd.DataFrame({
        "source": out["source"].astype(str),
        "n_tok": out["n_tok"].to_numpy(np.int64),
        "quota": out["quota"].to_numpy(np.int64),
    })


def q_grouped_quantiles_documents(sf_dir: str):
    """Exact per-(source, lang) quantile_disc of n_chars (p25/p50/
    p75) — grouped order statistics with NO global sort: per-block
    (group, value, count) partials + one composite groupby + a tiny
    per-group selection from cumulative counts."""
    from logdata_anomaly_miner_ray.stages.quantiles import grouped_quantiles

    out = grouped_quantiles(
        _read(sf_dir, "documents", ["source", "lang", "n_chars"]),
        ["source", "lang"], "n_chars").to_pandas()
    return pd.DataFrame({
        "source": out["source"].astype(str),
        "lang": out["lang"].astype(str),
        "qe2": out["qe2"].to_numpy(np.int64),
        "n_vals": out["n_vals"].to_numpy(np.int64),
        "value": out["value"].to_numpy(np.int64),
    })


def q_length_buckets_documents(sf_dir: str):
    """Length-bucketed batching manifest: global length decile per
    document with EXACT SQL ntile semantics (earlier buckets take the
    remainder), computed with the narrow-row range-sort + block
    prefix-scan pattern — no corpus-wide gather."""
    from logdata_anomaly_miner_ray.stages.sampling import length_bucket_manifest

    return length_bucket_manifest(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        "doc_id", "n_chars", n_buckets=10)


def q_gopher_rules_documents(sf_dir: str):
    """Gopher/MassiveText A1.1 quality rules as exact integer
    comparisons (stages/text_analysis.gopher_rules). Bullet lines,
    trailing-ellipsis lines, and hash symbols are injected
    deterministically from doc_id so every counter is exercised; the
    oracle recomputes every counter + the composed keep verdict."""
    import pyarrow.compute as pc

    from logdata_anomaly_miner_ray.stages.text_analysis import gopher_rules

    def inject(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        txt = t["text"].cast(pa.string())
        n = len(d)

        def const(s):
            return pa.array([s] * n, pa.string())

        cur = pc.if_else(
            pa.array(d % 4 == 0),
            pc.binary_join_element_wise(const("- item one"), txt, "\n"), txt)
        cur = pc.if_else(
            pa.array(d % 6 == 0),
            pc.binary_join_element_wise(cur, const("wait for more..."), "\n"),
            cur)
        cur = pc.if_else(
            pa.array(d % 9 == 0),
            pc.binary_join_element_wise(cur, const(" ##"), ""), cur)
        return pa.table({"doc_id": t["doc_id"], "text": cur})

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        inject, batch_format="pyarrow", batch_size=None)
    return gopher_rules(ds, "text", "doc_id")


_GOPHER_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")


_CMS_TERMS = [
    "batch", "customer", "data", "dup", "fast", "filter", "group", "hash",
    "join", "key", "merge", "order", "query", "row", "scan", "slow",
    "small", "sort", "spark", "stream", "table", "the", "window",
    "zzzz-absent",
]


def q_cms_counts_documents(sf_dir: str):
    """Count-min sketch (Cormode & Muthukrishnan 2005) token counts,
    depth 4 × width 512, md5-nibble row hashes — plus exact recounts
    for a fixed query-term list (one absent term included). The
    oracle rebuilds the identical sketch in SQL, so cms_est is
    bit-exact, not just bounded."""
    from logdata_anomaly_miner_ray.stages.heavy_hitters import cms_token_counts

    return cms_token_counts(
        _read(sf_dir, "documents", ["text"]), "text", _CMS_TERMS,
        depth=4, width=512)


def _bpe_learn_sql(n: int = 3) -> str:
    """UNROLLED n-iteration BPE merge learning in SQL (the
    _KMEANS_CTE precedent). Per iteration k over the symbol table
    s{k}(word, cnt, pos, sym): pair counts by a pos+1 self-join →
    best pair b{k} by (c DESC, s1, s2); greedy left-to-right
    non-overlapping merge = mark candidates (sym, next-sym) = best,
    group CONSECUTIVE candidate positions into runs (consecutive
    candidates only arise when s1 = s2) and choose odd run
    positions; drop absorbed successors and renumber."""
    parts = [r"""
wt AS (SELECT tok AS word, count(*)::BIGINT AS cnt
       FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok
             FROM documents)
       WHERE length(tok) >= 1 GROUP BY 1),
s0 AS (SELECT word, cnt, i AS pos, substr(word, i, 1) AS sym
       FROM wt, unnest(generate_series(1, length(word))) t(i))"""]
    for k in range(n):
        parts.append(f"""
p{k} AS (SELECT a.sym AS s1, b.sym AS s2, sum(a.cnt)::BIGINT AS c
         FROM s{k} a JOIN s{k} b ON a.word = b.word AND b.pos = a.pos + 1
         GROUP BY 1, 2),
b{k} AS (SELECT s1, s2, c FROM p{k} ORDER BY c DESC, s1, s2 LIMIT 1),
c{k} AS (SELECT word, cnt, pos, sym,
                lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nsym,
                coalesce(sym = (SELECT s1 FROM b{k}) AND
                         lead(sym) OVER (PARTITION BY word ORDER BY pos)
                           = (SELECT s2 FROM b{k}), false) AS cand
         FROM s{k}),
r{k} AS (SELECT *, pos - row_number() OVER (PARTITION BY word, cand
                                            ORDER BY pos) AS grp
         FROM c{k}),
ch{k} AS (SELECT *, cand AND (row_number() OVER (
              PARTITION BY word, cand, grp ORDER BY pos) % 2 = 1) AS chosen
          FROM r{k}),
ab{k} AS (SELECT *, coalesce(lag(chosen) OVER (PARTITION BY word
                                               ORDER BY pos), false)
                    AS absorbed
          FROM ch{k}),
s{k + 1} AS (SELECT word, cnt,
                    row_number() OVER (PARTITION BY word ORDER BY pos)
                      AS pos,
                    CASE WHEN chosen THEN sym || nsym ELSE sym END AS sym
             FROM ab{k} WHERE NOT absorbed)""")
    union = "\nUNION ALL\n".join(
        f"SELECT {k + 1}::BIGINT AS step, s1, s2, c AS cnt FROM b{k}"
        for k in range(n))
    return ("WITH " + ",".join(parts)
            + f"\nSELECT * FROM ({union}) ORDER BY step")


def _bpe_encode_sql(n: int = 3) -> str:
    """BPE tokenizer APPLICATION oracle: reuse the learn oracle's
    unrolled CTEs verbatim — the post-merge symbol table s{n} IS the
    encoded segmentation, so per-word token counts are its row
    counts, joined back onto the per-doc word stream."""
    learn = _bpe_learn_sql(n)
    ctes = learn[: learn.index("\nSELECT * FROM (")]
    return (
        ctes
        + f""",
tl AS (SELECT word, count(*)::BIGINT AS ntok FROM s{n} GROUP BY 1),
dw AS (SELECT doc_id, tok AS word
       FROM (SELECT doc_id,
                    unnest(regexp_split_to_array(text, '\\s+')) AS tok
             FROM documents)
       WHERE length(tok) >= 1)
SELECT doc_id, count(*)::BIGINT AS n_words,
       sum(tl.ntok)::BIGINT AS n_bpe_tokens
FROM dw JOIN tl USING (word) GROUP BY 1"""
    )


def _fertility_sql(n: int = 3) -> str:
    """Per-lang tokenizer fertility oracle: the learn oracle's
    unrolled CTEs give the post-merge symbol table s{n} (per-word BPE
    token counts); group the doc word stream by lang and emit exact
    integer sums + HUGEINT floor-divided scaled ratios (the standing
    no-transcendentals recast)."""
    learn = _bpe_learn_sql(n)
    ctes = learn[: learn.index("\nSELECT * FROM (")]
    return (
        ctes
        + f""",
tl AS (SELECT word, count(*)::BIGINT AS ntok FROM s{n} GROUP BY 1),
dw AS (SELECT doc_id, tok AS word
       FROM (SELECT doc_id,
                    unnest(regexp_split_to_array(text, '\\s+')) AS tok
             FROM documents)
       WHERE length(tok) >= 1),
dl AS (SELECT doc_id, coalesce(lang, '(null)') AS lang FROM documents),
agg AS (
  SELECT dl.lang,
         count(DISTINCT dw.doc_id)::BIGINT AS n_docs,
         count(*)::BIGINT AS n_words,
         sum(tl.ntok)::BIGINT AS n_bpe_tokens,
         sum(strlen(dw.word))::BIGINT AS n_word_bytes
  FROM dw JOIN tl USING (word) JOIN dl USING (doc_id)
  GROUP BY 1)
SELECT lang, n_docs, n_words, n_bpe_tokens, n_word_bytes,
       (n_bpe_tokens::HUGEINT * 1000000 // n_words)::BIGINT
           AS fertility_e6,
       (n_word_bytes::HUGEINT * 1000000 // n_bpe_tokens)::BIGINT
           AS bytes_per_token_e6
FROM agg ORDER BY lang"""
    )


def _nib4_sql(md5_expr: str) -> str:
    """SQL for int(first 4 hex nibbles) of an md5() VARCHAR expr —
    the strpos-nibble idiom shared with the dsir oracle."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr({md5_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}" for i in range(4)) + ")"


def q_pretoken_counts_documents(sf_dir: str):
    """BPE-style pretokenizer counts (letters/digits/other runs —
    GPT-2-family pretokenization, RE2-safe) per document; oracle is
    len(regexp_extract_all(...))."""
    from logdata_anomaly_miner_ray.functions.text import pretoken_counts

    def add(t):
        import pyarrow as _pa

        return _pa.table(
            {"doc_id": t["doc_id"],
             "n_pretokens": _pa.array(pretoken_counts(t["text"]), _pa.int64())}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def q_clean_corpus_documents(sf_dir: str):
    """Composed C4/Gopher-style cleaning pass — length + token +
    exact-rational repetition gates fused in one pass, exact-dedup
    keep-set broadcast; kept doc ids. Oracle recomputes every gate
    in SQL (the component oracles composed)."""
    from logdata_anomaly_miner_ray.pipelines.clean import clean_corpus

    return clean_corpus(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        min_chars=200, max_chars=100_000, min_tokens=25,
        max_dup_line_frac=(1, 4), max_top_2gram_frac=(1, 5),
    )


def q_repetition_stats_documents(sf_dir: str):
    """Gopher-style repetition counters (dup lines, top 2-gram) as
    exact integers; oracle recomputes via string_split + lead."""
    from logdata_anomaly_miner_ray.stages.text_analysis import repetition_stats

    return repetition_stats(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id"
    )


def q_simhash_pairs_documents(sf_dir: str):
    """SimHash near-dup pairs, oracle-exact: the md5 shingle-hash
    mode lets DuckDB recompute every 64-bit fingerprint (md5 of
    space-joined word 2-shingles, sign-sum per bit) and take the
    all-pairs Hamming ≤ 3 set; the engine side is the Manku
    chunk-LSH path, so the oracle also certifies that the pigeonhole
    bucketing loses no qualifying pair."""
    from logdata_anomaly_miner_ray.stages.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id",
        max_hamming=3, hash_mode="md5",
    )


def q_embedding_near_dups(sf_dir: str):
    """EXACT embedding-cosine near-dup pairs (broadcast matmul per
    block); oracle recomputes every pair with list_cosine_similarity.
    The hyperplane-LSH variant (embedding_near_dup_pairs) remains the
    unbounded-N scale path, pytest-verified. Threshold 0.45 keeps the
    result non-empty on the near-orthogonal synthetic vectors."""
    from logdata_anomaly_miner_ray.stages.dedup import embedding_near_dup_pairs_exact

    out = embedding_near_dup_pairs_exact(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        "embedding",
        "vec_id",
        cosine_threshold=0.45,
    )
    return pa.table(
        {
            "id_a": pa.array(out["id_a"].to_numpy(np.int64)),
            "id_b": pa.array(out["id_b"].to_numpy(np.int64)),
            "sim_e4": _scaled_int(pa.array(out["cosine"].to_numpy(np.float64)), 10_000),
        }
    )


def q_hll_distinct_documents(sf_dir: str):
    """Distinct cardinality per column: exact count (hash-partitioned
    distinct over md5 digests, oracle-recomputable) alongside a
    verified bound on the HLL sketch estimate (within 5% of exact —
    the oracle asserts the bound as TRUE, so a drifting sketch fails
    the value hash)."""
    from logdata_anomaly_miner_ray.stages.column_stats import (
        column_stats,
        exact_distinct_counts,
    )

    cols = ["text", "lang", "source"]
    ds = _read(sf_dir, "documents", cols)
    t = column_stats(ds, cols, with_quantiles=False)
    est = dict(zip(t["column"].to_pylist(), t["approx_distinct"].to_pylist()))
    exact = exact_distinct_counts(ds, cols)
    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "n_distinct": pa.array([exact.get(c, 0) for c in cols], pa.int64()),
            "hll_ok": pa.array(
                [abs(est.get(c, 0) - exact.get(c, 0)) <= 0.05 * max(exact.get(c, 0), 1) for c in cols],
                pa.bool_(),
            ),
        }
    )


def q_cm_drift_events(sf_dir: str):
    """Exact two-sample Cramér–von Mises criterion of each
    event_type vs the pooled-all distribution (integral form,
    tie-robust), computed as an exact rational and scaled to e6 in
    INTEGER math — the oracle's HUGEINT arithmetic matches
    bit-for-bit (a float Σ would be summation-order sensitive)."""
    from logdata_anomaly_miner_ray.stages.drift import cm_exact_by_group

    out = cm_exact_by_group(
        _read(sf_dir, "events", ["event_type", "value"]), "event_type", "value"
    )
    cm_e6 = [
        (int(nu) * 2_000_000 + int(de)) // (2 * int(de))
        for nu, de in zip(out["cm_num"], out["cm_den"])
    ]
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].astype(str), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "cm_e6": pa.array(cm_e6, pa.int64()),
        }
    )


def q_ks_drift_events(sf_dir: str):
    """Exact two-sample KS of each event_type vs the pooled-all
    distribution; oracle recomputes both ECDFs with an ASOF join.
    The t-digest approximate variant (ks_drift_by_group) remains the
    unbounded-cardinality scale path, pytest-verified."""
    from logdata_anomaly_miner_ray.stages.drift import ks_exact_by_group

    out = ks_exact_by_group(
        _read(sf_dir, "events", ["event_type", "value"]), "event_type", "value"
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].astype(str), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "ks_e6": _scaled_int(pa.array(out["ks"].to_numpy(np.float64)), 1_000_000),
        }
    )


def q_psi_drift_events(sf_dir: str):
    """PSI (population stability index) of each event_type's binned
    value distribution vs the median-of-groups reference — the north
    rule's "KS/PSI distribution-drift tests per partition" PSI half
    (reference behavior: VariableTypeDetector drift re-tests,
    analysis/VariableTypeDetector.py:1605-1660, recast as a binned
    stability score). Fixed HIST_EDGES bins (the oracle-proven
    histogram_events scheme), Laplace +0.5 smoothing, per-bin median
    reference renormalized, psi() clip at 1e-6; the oracle replays
    the identical arithmetic in SQL and compares at 1e-6 scaling."""
    from logdata_anomaly_miner_ray.stages.drift import (
        group_histograms,
        psi_drift_by_group,
    )

    hist = group_histograms(
        _read(sf_dir, "events", ["event_type", "value"]),
        "event_type",
        "value",
        np.array(HIST_EDGES),
    ).to_pandas()
    out = psi_drift_by_group(hist, "event_type", len(HIST_EDGES) + 1, count_name="n")
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].astype(str), pa.string()),
            "psi_e6": _scaled_int(pa.array(out["psi"].to_numpy(np.float64)), 1_000_000),
            "drift": pa.array(out["drift"].astype(bool).tolist(), pa.bool_()),
        }
    )


def q_entropy_scores_documents(sf_dir: str):
    """Per-document character Shannon entropy (base 2) — the
    EntropyDetector's randomness signal in an oracle-recomputable
    form (SQL entropy() over the char-split column). The learned
    char-PAIR probability variant (fit_bigram_table/entropy_scores)
    stays the suite's scoring path, pytest-verified."""
    from logdata_anomaly_miner_ray.functions.text import char_entropy

    def add(batch: pa.Table) -> pa.Table:
        ent = char_entropy(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "ent_e6": _scaled_int(pa.array(ent, pa.float64()), 1_000_000),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def q_pages_suite_sf(sf_dir: str):
    """Flagship suite verdicts on pages derived from the documents
    table (rows-only check: verdict table shape is stable)."""
    return _pages_suite(sf_dir)


def _pages_from_documents(sf_dir: str):
    import ray.data as rd

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_pylist()
        urls = [f"https://{s}.example.org/d/{i}" for s, i in zip(src, ids)]
        ts = pa.array(1_735_689_600_000_000 + ids * 137_000, pa.int64()).cast(
            pa.timestamp("us")
        )
        html = [
            f"<html><body><p>{t}</p></body></html>".encode()
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": ts,
                "html": pa.array(html, pa.binary()),
                "text": batch["text"],
                "lang": batch["lang"],
                "row_idx": pa.array(ids, pa.int64()),
            }
        )

    return _read(sf_dir, "documents").map_batches(
        to_pages, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def _pages_suite(sf_dir: str):
    from logdata_anomaly_miner_ray.pipelines.validate import run_suite

    pages = _pages_from_documents(sf_dir)
    out = run_suite(pages)
    return out["verdicts"]


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: full constraint-suite validation of sf0.001 pages
    (driver smoke: runs, ≥0 rows, stable schema)."""
    return _pages_suite("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "column_stats_lineitem": q_column_stats_lineitem,
        "value_range_events": q_value_range_events,
        "distinct_lang_documents": q_distinct_lang_documents,
        "combo_domain_events": q_combo_domain_events,
        "enhanced_combo_events": q_enhanced_combo_events,
        "distinct_users_events": q_distinct_users_events,
        "window_counts_events": q_window_counts_events,
        "frequency_anomalies_events": q_frequency_anomalies_events,
        "empty_windows_events": q_empty_windows_events,
        "sliding_exceed_events": q_sliding_exceed_events,
        "missing_gaps_events": q_missing_gaps_events,
        "uniqueness_lineitem": q_uniqueness_lineitem,
        "referential_missing_counts": q_referential_missing_counts,
        "exact_dedup_documents": q_exact_dedup_documents,
        "token_stats_documents": q_token_stats_documents,
        "charset_documents": q_charset_documents,
        "ordering_inversions_events": q_ordering_inversions_events,
        "sequence_2grams_events": q_sequence_2grams_events,
        "min_transition_events": q_min_transition_events,
        "histogram_events": q_histogram_events,
        "q1_lineitem": q_q1_lineitem,
        "segment_revenue": q_segment_revenue,
        "nation_revenue_join": q_nation_revenue_join,
        "ann_topk_embeddings": q_ann_topk_embeddings,
        "quantized_ann_embeddings": q_quantized_ann_embeddings,
        "knn_graph_embeddings": q_knn_graph_embeddings,
        "json_extract_events": q_json_extract_events,
        "json_schema_events": q_json_schema_events,
        "xml_extract_events": q_xml_extract_events,
        "line_model_events": q_line_model_events,
        "value_branch_model_events": q_value_branch_model_events,
        "unparsed_diagnosis_events": q_unparsed_diagnosis_events,
        "sshd_model_events": q_sshd_model_events,
        "audispd_model_events": q_audispd_model_events,
        "datetime_parse_events": q_datetime_parse_events,
        "allowlist_rules_events": q_allowlist_rules_events,
        "value_dependent_rules_events": q_value_dependent_rules_events,
        "multisource_merge_events": q_multisource_merge_events,
        "implication_support_events": q_implication_support_events,
        "mean_shift_events": q_mean_shift_events,
        "sessions_events": q_sessions_events,
        "interval_unmatched_events": q_interval_unmatched_events,
        "monotonic_adjust_events": q_monotonic_adjust_events,
        "topk_orders": q_topk_orders,
        "schema_conformance_events": q_schema_conformance_events,
        # oracle status lives in oracle_sql(): every key present there
        # is SQL-exact-checked; the rows-only remainder is pages_suite
        # (meta-artifact) alone
        "quality_scores_documents": q_quality_scores_documents,
        "langid_documents": q_langid_documents,
        "fingerprints_documents": q_fingerprints_documents,
        "minhash_pairs_documents": q_minhash_pairs_documents,
        "ngram_jaccard_pairs_documents": q_ngram_jaccard_pairs_documents,
        "decontaminate_documents": q_decontaminate_documents,
        "dup_span_coverage_documents": q_dup_span_coverage_documents,
        "dup_span_rewrite_documents": q_dup_span_rewrite_documents,
        "paragraph_dedup_documents": q_paragraph_dedup_documents,
        "pmi_collocations_documents": q_pmi_collocations_documents,
        "pack_sequences_documents": q_pack_sequences_documents,
        "url_normalize_documents": q_url_normalize_documents,
        "host_stats_documents": q_host_stats_documents,
        "host_cap_documents": q_host_cap_documents,
        "url_dedup_latest_documents": q_url_dedup_latest_documents,
        "stratified_sample_documents": q_stratified_sample_documents,
        "lexicon_classify_documents": q_lexicon_classify_documents,
        "robots_parse_documents": q_robots_parse_documents,
        "fix_mojibake_documents": q_fix_mojibake_documents,
        "group_split_documents": q_group_split_documents,
        "token_novelty_documents": q_token_novelty_documents,
        "domain_stats_documents": q_domain_stats_documents,
        "cross_source_overlap_documents": q_cross_source_overlap_documents,
        "snapshot_diff_documents": q_snapshot_diff_documents,
        "robots_filter_documents": q_robots_filter_documents,
        "politeness_manifest_documents": q_politeness_manifest_documents,
        "neardup_keep_best_documents": q_neardup_keep_best_documents,
        "dedup_cluster_sizes_documents": q_dedup_cluster_sizes_documents,
        "winnow_fingerprints_documents": q_winnow_fingerprints_documents,
        "editdist_pairs_documents": q_editdist_pairs_documents,
        "bpe_learn_documents": q_bpe_learn_documents,
        "bpe_encode_documents": q_bpe_encode_documents,
        "fertility_stats_documents": q_fertility_stats_documents,
        "vocab_growth_documents": q_vocab_growth_documents,
        "blocklist_filter_documents": q_blocklist_filter_documents,
        "mixture_repeat_documents": q_mixture_repeat_documents,
        "c4_line_filter_documents": q_c4_line_filter_documents,
        "shuffle_shards_documents": q_shuffle_shards_documents,
        "lm_score_documents": q_lm_score_documents,
        "ccnet_buckets_documents": q_ccnet_buckets_documents,
        "image_roundtrip_documents": q_image_roundtrip_documents,
        "extract_text_documents": q_extract_text_documents,
        "split_assign_documents": q_split_assign_documents,
        "normalize_text_documents": q_normalize_text_documents,
        "tfidf_top_terms_documents": q_tfidf_top_terms_documents,
        "term_search_documents": q_term_search_documents,
        "bm25_topk_documents": q_bm25_topk_documents,
        "bpe_pair_counts_documents": q_bpe_pair_counts_documents,
        "dsir_weights_documents": q_dsir_weights_documents,
        "extract_links_documents": q_extract_links_documents,
        "anchor_text_topk_documents": q_anchor_text_topk_documents,
        "pagerank_documents": q_pagerank_documents,
        "hits_scores_documents": q_hits_scores_documents,
        "indegree_hist_documents": q_indegree_hist_documents,
        "kmeans_embeddings": q_kmeans_embeddings,
        "semdedup_embeddings": q_semdedup_embeddings,
        "chunk_documents": q_chunk_documents,
        "corpus_report_documents": q_corpus_report_documents,
        "oov_gram_rate_documents": q_oov_gram_rate_documents,
        "bloom_incremental_new_documents": q_bloom_incremental_new_documents,
        "pii_redaction_documents": q_pii_redaction_documents,
        "quota_sample_documents": q_quota_sample_documents,
        "simhash_pairs_documents": q_simhash_pairs_documents,
        "repetition_stats_documents": q_repetition_stats_documents,
        "clean_corpus_documents": q_clean_corpus_documents,
        "pretoken_counts_documents": q_pretoken_counts_documents,
        "heavy_hitters_documents": q_heavy_hitters_documents,
        "cms_counts_documents": q_cms_counts_documents,
        "gopher_rules_documents": q_gopher_rules_documents,
        "length_buckets_documents": q_length_buckets_documents,
        "grouped_quantiles_documents": q_grouped_quantiles_documents,
        "token_budget_documents": q_token_budget_documents,
        "temperature_mixture_documents": q_temperature_mixture_documents,
        "exact_quantiles_lineitem": q_exact_quantiles_lineitem,
        "asof_join_events": q_asof_join_events,
        "topk_per_group_orders": q_topk_per_group_orders,
        "dedup_clusters_documents": q_dedup_clusters_documents,
        "embedding_near_dups": q_embedding_near_dups,
        "hll_distinct_documents": q_hll_distinct_documents,
        "ks_drift_events": q_ks_drift_events,
        "cm_drift_events": q_cm_drift_events,
        "psi_drift_events": q_psi_drift_events,
        "entropy_scores_documents": q_entropy_scores_documents,
        "pca_windows_events": q_pca_windows_events,
        "ar_outliers_events": q_ar_outliers_events,
        "count_vector_outliers_events": q_count_vector_outliers_events,
        "chi2_events": q_chi2_events,
        "time_of_period_events": q_time_of_period_events,
        "session_combos_events": q_session_combos_events,
        "correlation_rules_lineitem": q_correlation_rules_lineitem,
        "ivf_topk_embeddings": q_ivf_topk_embeddings,
        "vartype_events": q_vartype_events,
        "implication_rules_events": q_implication_rules_events,
        "time_correlation_events": q_time_correlation_events,
        "reservoir_sample_events": q_reservoir_sample_events,
        "tail_values_events": q_tail_values_events,
        "media_decode": q_media_decode,
        "pages_suite": q_pages_suite_sf,
    }


# Unrolled 2-iteration Lloyd's k-means (k=10, init = 10 smallest
# vec_ids, low-cid tie-break, empty clusters keep their centroid) —
# shared by the kmeans_embeddings and semdedup_embeddings oracles.
_KMEANS_CTE = r"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
       FROM e ORDER BY vec_id LIMIT 10),
a1 AS (SELECT vec_id, cid FROM (
         SELECT e.vec_id, c0.cid,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY list_distance(e.v, c0.v), c0.cid) AS rn
         FROM e CROSS JOIN c0)
       WHERE rn = 1),
x1 AS (SELECT a1.cid, unnest(e.v) AS val, generate_subscripts(e.v, 1) AS dim
       FROM a1 JOIN e USING (vec_id)),
m1 AS (SELECT cid, dim, avg(val) AS val FROM x1 GROUP BY cid, dim),
u1 AS (SELECT cid, list(val ORDER BY dim) AS v FROM m1 GROUP BY cid),
c1 AS (SELECT c0.cid, COALESCE(u1.v, c0.v) AS v FROM c0 LEFT JOIN u1 USING (cid)),
a2 AS (SELECT vec_id, cid FROM (
         SELECT e.vec_id, c1.cid,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY list_distance(e.v, c1.v), c1.cid) AS rn
         FROM e CROSS JOIN c1)
       WHERE rn = 1),
x2 AS (SELECT a2.cid, unnest(e.v) AS val, generate_subscripts(e.v, 1) AS dim
       FROM a2 JOIN e USING (vec_id)),
m2 AS (SELECT cid, dim, avg(val) AS val FROM x2 GROUP BY cid, dim),
u2 AS (SELECT cid, list(val ORDER BY dim) AS v FROM m2 GROUP BY cid),
c2 AS (SELECT c1.cid, COALESCE(u2.v, c1.v) AS v FROM c1 LEFT JOIN u2 USING (cid)),
a3 AS (SELECT vec_id, cid FROM (
         SELECT e.vec_id, c2.cid,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY list_distance(e.v, c2.v), c2.cid) AS rn
         FROM e CROSS JOIN c2)
       WHERE rn = 1)
"""


def oracle_sql() -> dict[str, str]:
    zfill = f"""
WITH c AS (
  SELECT event_type, CAST(floor(epoch(ts)/{WINDOW}) AS BIGINT) AS "window",
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
), b AS (
  SELECT event_type, min("window") AS wmin, max("window") AS wmax FROM c GROUP BY 1
), f AS (
  SELECT event_type, unnest(generate_series(wmin, wmax)) AS "window" FROM b
), z AS (
  SELECT f.event_type, f."window", coalesce(c.n, 0)::BIGINT AS n
  FROM f LEFT JOIN c ON f.event_type = c.event_type AND f."window" = c."window"
)"""
    out = {
        "column_stats_lineitem": """
WITH s AS (
  SELECT 'l_quantity' AS col, count(l_quantity)::BIGINT AS n,
         (count(*) - count(l_quantity))::BIGINT AS n_null,
         min(l_quantity) mn, max(l_quantity) mx, avg(l_quantity) mean,
         stddev_pop(l_quantity) std FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', count(l_extendedprice)::BIGINT,
         (count(*) - count(l_extendedprice))::BIGINT,
         min(l_extendedprice), max(l_extendedprice), avg(l_extendedprice),
         stddev_pop(l_extendedprice) FROM lineitem
  UNION ALL
  SELECT 'l_discount', count(l_discount)::BIGINT,
         (count(*) - count(l_discount))::BIGINT,
         min(l_discount), max(l_discount), avg(l_discount),
         stddev_pop(l_discount) FROM lineitem
  UNION ALL
  SELECT 'l_tax', count(l_tax)::BIGINT,
         (count(*) - count(l_tax))::BIGINT,
         min(l_tax), max(l_tax), avg(l_tax), stddev_pop(l_tax) FROM lineitem
)
SELECT col, n, n_null, mn AS min_v, mx AS max_v,
       CAST(ROUND(mean * 10000) AS BIGINT) AS mean_e4,
       CAST(ROUND(std * 10000) AS BIGINT) AS std_e4 FROM s""",
        "value_range_events": """
SELECT event_type, min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type""",
        "distinct_lang_documents": "SELECT DISTINCT lang FROM documents",
        "combo_domain_events": "SELECT DISTINCT event_type, user_id FROM events",
        "enhanced_combo_events": """
SELECT event_type, min(ts) AS first_ts, max(ts) AS last_ts,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type""",
        "distinct_users_events": """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY event_type""",
        "window_counts_events": f"""
SELECT event_type, CAST(floor(epoch(ts)/{WINDOW}) AS BIGINT) AS window,
       count(*)::BIGINT AS n
FROM events GROUP BY 1, 2""",
        "frequency_anomalies_events": zfill
        + f""",
s AS (SELECT event_type, avg(n) AS mean, stddev_pop(n) AS std FROM z GROUP BY 1)
SELECT z.event_type, z."window", z.n
FROM z JOIN s ON z.event_type = s.event_type
WHERE z.n < s.mean - s.std/{CF} OR z.n > s.mean + s.std/{CF}""",
        "empty_windows_events": zfill
        + """
SELECT event_type, "window" FROM z WHERE n = 0""",
        "sliding_exceed_events": f"""
WITH w AS (
  SELECT event_type, ts,
         count(*) OVER (PARTITION BY event_type ORDER BY epoch(ts)
                        RANGE BETWEEN {GAP} PRECEDING AND CURRENT ROW)
           ::BIGINT AS n_in_window
  FROM events
), fl AS (
  SELECT event_type, ts, n_in_window,
         n_in_window > {SLIDE_LIMIT} AS ex,
         coalesce(lag(n_in_window > {SLIDE_LIMIT})
                  OVER (PARTITION BY event_type ORDER BY epoch(ts)), false) AS pex
  FROM w
)
SELECT event_type, ts, n_in_window FROM fl WHERE ex AND NOT pex""",
        "missing_gaps_events": f"""
WITH o AS (
  SELECT event_type, ts,
         lead(ts) OVER (PARTITION BY event_type ORDER BY ts) AS nxt
  FROM events
)
SELECT event_type, ts,
       CAST(ROUND((epoch(nxt) - epoch(ts)) * 1000000) AS BIGINT) AS gap_us
FROM o WHERE epoch(nxt) - epoch(ts) > {GAP}""",
        "uniqueness_lineitem": """
SELECT l_orderkey, count(*)::BIGINT AS n FROM lineitem
GROUP BY 1 HAVING count(*) > 1""",
        "referential_missing_counts": """
SELECT 'customer->orders' AS rel,
       (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)))::BIGINT AS n_missing
UNION ALL
SELECT 'orders->customer',
       (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders
         WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)))::BIGINT
UNION ALL
SELECT 'lineitem->part',
       (SELECT count(*) FROM (SELECT DISTINCT l_partkey FROM lineitem
         WHERE l_partkey NOT IN (SELECT p_partkey FROM part)))::BIGINT""",
        "exact_dedup_documents": """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*)::BIGINT AS n
FROM documents GROUP BY md5(text)""",
        "exact_quantiles_lineitem": r"""
SELECT 0.01::DOUBLE AS q, quantile_disc(l_extendedprice, 0.01)::DOUBLE AS value FROM lineitem
UNION ALL SELECT 0.25::DOUBLE, quantile_disc(l_extendedprice, 0.25)::DOUBLE FROM lineitem
UNION ALL SELECT 0.50::DOUBLE, quantile_disc(l_extendedprice, 0.50)::DOUBLE FROM lineitem
UNION ALL SELECT 0.75::DOUBLE, quantile_disc(l_extendedprice, 0.75)::DOUBLE FROM lineitem
UNION ALL SELECT 0.90::DOUBLE, quantile_disc(l_extendedprice, 0.90)::DOUBLE FROM lineitem
UNION ALL SELECT 0.99::DOUBLE, quantile_disc(l_extendedprice, 0.99)::DOUBLE FROM lineitem
ORDER BY q""",
        "topk_per_group_orders": r"""
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders) WHERE rn <= 3
ORDER BY o_custkey, o_totalprice DESC, o_orderkey""",
        "asof_join_events": r"""
WITH a AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
     b AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type='click')
SELECT a.event_id AS event_id, b.event_id AS m_event_id,
       (epoch_us(a.ts) - epoch_us(b.ts))::BIGINT AS delta_us,
       b.value AS m_value
FROM a ASOF JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
ORDER BY event_id""",
        "length_buckets_documents": """
SELECT doc_id, n_chars,
       ntile(10) OVER (ORDER BY n_chars, doc_id)::BIGINT AS bucket
FROM documents""",
        "temperature_mixture_documents": r"""
WITH c AS (SELECT source,
                  sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tok
           FROM documents GROUP BY source),
-- exact integer sqrt: float floor(sqrt) with a +/-1 fix-up so the
-- floor matches Python math.isqrt even across perfect squares
s0 AS (SELECT source, n_tok,
              CAST(floor(sqrt(CAST(n_tok AS DOUBLE))) AS HUGEINT) AS s
       FROM c),
s1 AS (SELECT source, n_tok,
              s - (CASE WHEN s * s > n_tok THEN 1 ELSE 0 END) AS s
       FROM s0),
w AS (SELECT source, n_tok,
             (s + (CASE WHEN (s + 1) * (s + 1) <= n_tok
                        THEN 1 ELSE 0 END))::BIGINT AS weight
      FROM s1),
t AS (SELECT sum(weight)::HUGEINT AS tw FROM w),
b AS (SELECT source, n_tok, weight,
             (1000000::HUGEINT * weight // tw)::BIGINT AS base,
             (1000000::HUGEINT * weight % tw)::BIGINT AS rem
      FROM w CROSS JOIN t),
sb AS (SELECT sum(base)::BIGINT AS sb FROM b),
r AS (SELECT source, n_tok, weight, base, rem,
             row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
SELECT source, n_tok, weight,
       (base + CASE WHEN rk <= (1000000 - sb.sb) THEN 1 ELSE 0 END)::BIGINT
       AS quota
FROM r CROSS JOIN sb ORDER BY source""",
        "token_budget_documents": r"""
WITH c AS (SELECT source,
                  sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tok
           FROM documents GROUP BY source),
t AS (SELECT sum(n_tok)::BIGINT AS tt FROM c),
b AS (SELECT source, n_tok,
             (1000000::HUGEINT * n_tok // tt)::BIGINT AS base,
             (1000000::HUGEINT * n_tok % tt)::BIGINT AS rem
      FROM c CROSS JOIN t),
s AS (SELECT sum(base)::BIGINT AS sb FROM b),
r AS (SELECT source, n_tok, base, rem,
             row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
SELECT source, n_tok,
       (base + CASE WHEN rk <= (1000000 - sb) THEN 1 ELSE 0 END)::BIGINT
       AS quota
FROM r CROSS JOIN s ORDER BY source""",
        "grouped_quantiles_documents": """
SELECT source, lang, 25::BIGINT AS qe2, count(*)::BIGINT AS n_vals,
       quantile_disc(n_chars, 0.25)::BIGINT AS value
FROM documents GROUP BY source, lang
UNION ALL
SELECT source, lang, 50::BIGINT, count(*)::BIGINT,
       quantile_disc(n_chars, 0.50)::BIGINT
FROM documents GROUP BY source, lang
UNION ALL
SELECT source, lang, 75::BIGINT, count(*)::BIGINT,
       quantile_disc(n_chars, 0.75)::BIGINT
FROM documents GROUP BY source, lang""",
        "gopher_rules_documents": r"""
WITH inj AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 4 = 0 THEN '- item one' || chr(10) ELSE '' END)
    || text
    || (CASE WHEN doc_id % 6 = 0
             THEN chr(10) || 'wait for more...' ELSE '' END)
    || (CASE WHEN doc_id % 9 = 0 THEN ' ##' ELSE '' END) AS text
  FROM documents),
base AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '\S+'))::BIGINT AS n_words,
    (length(text)
     - len(regexp_extract_all(text, '[\t\n\f\r ]')))::BIGINT AS word_chars,
    len(regexp_extract_all(text, '#'))::BIGINT AS n_hash,
    (len(regexp_extract_all(text, '\.\.\.'))
     + len(regexp_extract_all(text, '…')))::BIGINT AS n_ell,
    len(regexp_extract_all(text, '\S*[A-Za-z]\S*'))::BIGINT AS n_alpha,
    ("""
        + "\n     + ".join(
            "(CASE WHEN regexp_matches(text, '(^|[\\t\\n\\f\\r ])"
            + w + "([\\t\\n\\f\\r ]|$)') THEN 1 ELSE 0 END)"
            for w in _GOPHER_STOP)
        + r""")::BIGINT AS n_stop
  FROM inj),
ln AS (SELECT doc_id, unnest(str_split(text, chr(10))) AS line FROM inj),
lc AS (SELECT doc_id, count(*)::BIGINT AS n_lines,
         count(*) FILTER (
           WHERE regexp_matches(line, '^ *[-*•] '))::BIGINT AS n_bullet,
         count(*) FILTER (
           WHERE regexp_matches(line, '(\.\.\.|…)$'))::BIGINT AS n_ellend
       FROM ln GROUP BY doc_id)
SELECT b.doc_id, n_words, word_chars, n_hash, n_ell,
       n_lines, n_bullet, n_ellend, n_alpha, n_stop,
       (CASE WHEN n_words >= 50 AND n_words <= 100000
             AND 3 * n_words <= word_chars AND word_chars <= 10 * n_words
             AND 10 * n_hash <= n_words AND 10 * n_ell <= n_words
             AND 10 * n_bullet <= 9 * n_lines
             AND 10 * n_ellend <= 3 * n_lines
             AND 5 * n_alpha >= 4 * n_words AND n_stop >= 2
        THEN 1 ELSE 0 END)::BIGINT AS keep
FROM base b JOIN lc USING (doc_id)""",
        "cms_counts_documents": f"""
WITH tok AS (SELECT unnest(string_split_regex(text, '\\s+')) AS w
             FROM documents),
t2 AS (SELECT w FROM tok WHERE w <> ''),
rs AS (SELECT unnest(generate_series(0, 3)) AS r),
bk AS (SELECT r,
              {_nib4_sql("md5(CAST(r AS VARCHAR) || '|' || w)")} % 512 AS b
       FROM t2 CROSS JOIN rs),
cells AS (SELECT r, b, count(*)::BIGINT AS c FROM bk GROUP BY 1, 2),
q(term) AS (VALUES {", ".join("('" + t + "')" for t in _CMS_TERMS)}),
qb AS (SELECT term, r,
              {_nib4_sql("md5(CAST(r AS VARCHAR) || '|' || term)")} % 512 AS b
       FROM q CROSS JOIN rs),
est AS (SELECT term, min(coalesce(cells.c, 0))::BIGINT AS cms_est
        FROM qb LEFT JOIN cells ON qb.r = cells.r AND qb.b = cells.b
        GROUP BY term),
ex AS (SELECT w AS term, count(*)::BIGINT AS n FROM t2 GROUP BY 1)
SELECT q.term, coalesce(ex.n, 0)::BIGINT AS true_cnt, est.cms_est
FROM q JOIN est USING (term) LEFT JOIN ex USING (term)
ORDER BY q.term""",
        "heavy_hitters_documents": r"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
), t2 AS (SELECT token FROM tok WHERE token <> ''),
   c AS (SELECT token, count(*)::BIGINT AS n FROM t2 GROUP BY token)
SELECT token, n FROM c
WHERE n * 32 > (SELECT count(*) FROM t2)
ORDER BY n DESC, token""",
        "token_stats_documents": r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars_text
FROM documents""",
        "charset_documents": """
SELECT lang, count(DISTINCT u)::BIGINT AS n_chars
FROM (SELECT lang, unnest(string_split(text, '')) AS u FROM documents)
GROUP BY lang""",
        "ordering_inversions_events": """
WITH o AS (
  SELECT user_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_v
  FROM events
)
SELECT user_id, count(*)::BIGINT AS n_inversions
FROM o WHERE value < prev_v GROUP BY user_id""",
        "sequence_2grams_events": """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS g0, event_type AS g1, count(*)::BIGINT AS n
FROM o WHERE prev IS NOT NULL GROUP BY 1, 2""",
        "min_transition_events": """
WITH o AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pe,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt
  FROM events
)
SELECT pe AS from_event, event_type AS to_event,
       CAST(ROUND(min(epoch(ts) - epoch(pt)) * 1000000) AS BIGINT) AS min_us
FROM o WHERE pe IS NOT NULL GROUP BY 1, 2""",
        "histogram_events": f"""
SELECT event_type,
       CASE WHEN value < {HIST_EDGES[0]} THEN 0
            WHEN value >= {HIST_EDGES[-1]} THEN {len(HIST_EDGES)}
            ELSE CAST(floor(value/40) AS BIGINT) + 1 END AS bin,
       count(*)::BIGINT AS n
FROM events WHERE value IS NOT NULL GROUP BY 1, 2""",
        "q1_lineitem": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(ROUND(sum(l_extendedprice) * 100) AS BIGINT) AS sum_base_cents,
       CAST(ROUND(sum(l_quantity)/count(*) * 10000) AS BIGINT) AS avg_qty_e4,
       count(*)::BIGINT AS n
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2""",
        "segment_revenue": """
SELECT c_mktsegment,
       CAST(ROUND(sum(o_totalprice) * 100) AS BIGINT) AS revenue_cents,
       count(*)::BIGINT AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1""",
        "nation_revenue_join": """
SELECT c_nationkey,
       CAST(ROUND(sum(o_totalprice) * 100) AS BIGINT) AS revenue_cents,
       count(*)::BIGINT AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1""",
        "knn_graph_embeddings": """
WITH m AS (SELECT vec_id,
                  list_max(list_transform(embedding, x -> abs(x))) AS mx
           FROM embeddings),
fl AS (SELECT vec_id, unnest(embedding) AS v,
              generate_subscripts(embedding, 1) AS i
       FROM embeddings),
qz AS (SELECT f.vec_id, f.i,
              CASE WHEN m.mx = 0 THEN 0
                   ELSE floor(CAST(f.v AS DOUBLE) * CAST(127 AS DOUBLE)
                              / CAST(m.mx AS DOUBLE))
              END::BIGINT AS qv
       FROM fl f JOIN m ON f.vec_id = m.vec_id),
dots AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                sum(a.qv * b.qv)::BIGINT AS dot_q
         FROM qz a JOIN qz b ON a.i = b.i AND a.vec_id <> b.vec_id
         GROUP BY 1, 2)
SELECT * FROM (
  SELECT vec_id, neighbor_id, dot_q,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dot_q DESC, neighbor_id)::BIGINT AS rnk
  FROM dots)
WHERE rnk <= 5 ORDER BY vec_id, rnk""",
        "quantized_ann_embeddings": """
WITH m AS (SELECT vec_id,
                  list_max(list_transform(embedding, x -> abs(x))) AS mx
           FROM embeddings),
fl AS (SELECT vec_id, unnest(embedding) AS v,
              generate_subscripts(embedding, 1) AS i
       FROM embeddings),
qz AS (SELECT f.vec_id, f.i,
              CASE WHEN m.mx = 0 THEN 0
                   ELSE floor(CAST(f.v AS DOUBLE) * CAST(127 AS DOUBLE)
                              / CAST(m.mx AS DOUBLE))
              END::BIGINT AS qv
       FROM fl f JOIN m ON f.vec_id = m.vec_id),
dots AS (SELECT a.vec_id AS qid, b.vec_id AS vec_id,
                sum(a.qv * b.qv)::BIGINT AS dot_q
         FROM qz a JOIN qz b ON a.i = b.i
         WHERE a.vec_id < 5 GROUP BY 1, 2)
SELECT * FROM (
  SELECT qid, vec_id, dot_q,
         row_number() OVER (PARTITION BY qid
                            ORDER BY dot_q DESC, vec_id)::BIGINT AS rnk
  FROM dots)
WHERE rnk <= 10 ORDER BY qid, rnk""",
        "ann_topk_embeddings": """
SELECT vec_id,
       CAST(ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
              WHERE vec_id = 0)) * 10000) AS BIGINT) AS sim_e4
FROM embeddings
ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
          WHERE vec_id = 0)) DESC, vec_id
LIMIT 10""",
        "json_extract_events": """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events""",
        "json_schema_events": """
WITH docs AS (
  SELECT event_id,
    CASE CAST(event_id % 8 AS INTEGER)
      WHEN 0 THEN '{"k": ' || CAST(event_id % 100 AS VARCHAR) || ', "note": "n"}'
      WHEN 1 THEN '{"k": ' || CAST(event_id % 100 AS VARCHAR) || ', "note": null}'
      WHEN 2 THEN '{"k": ' || CAST(event_id % 100 AS VARCHAR) || ', "note": "x", "tag": "t"}'
      WHEN 3 THEN '{"k": "bad", "note": "x"}'
      WHEN 4 THEN '{"note": "x"}'
      WHEN 5 THEN '{"k": ' || CAST(event_id % 100 AS VARCHAR) || ', "note": "x", "extra": 1}'
      WHEN 6 THEN '{"k": ' || CAST(event_id % 100 AS VARCHAR) || ', "note": "x", "arr": []}'
      ELSE '{"k": ' || CAST(event_id % 100 AS VARCHAR) || ', "note": "x", "arr": [1]}'
    END AS doc
  FROM events
), checked AS (
  SELECT event_id,
    CASE
      WHEN NOT json_valid(doc) THEN 'bad_json:'
      WHEN json_type(doc) != 'OBJECT' THEN 'not_object:'
      -- stage 1: missing required keys, sorted stripped order (k, note;
      -- arr/tag are optional)
      WHEN json_type(doc, '$.k') IS NULL THEN 'missing:k'
      WHEN json_type(doc, '$.note') IS NULL THEN 'missing:note'
      -- stage 2: value checks in sorted key order (arr, k, note, tag)
      WHEN json_type(doc, '$.arr') = 'NULL' THEN 'null:arr'
      WHEN json_type(doc, '$.arr') IS NOT NULL
           AND (json_type(doc, '$.arr') != 'ARRAY'
                OR json_array_length(doc, '$.arr') != 0) THEN 'not_empty_array:arr'
      WHEN json_type(doc, '$.k') = 'NULL' THEN 'null:k'
      WHEN json_type(doc, '$.k') NOT IN ('UBIGINT', 'BIGINT') THEN 'type:k'
      WHEN json_type(doc, '$.note') NOT IN ('VARCHAR', 'NULL') THEN 'type:note'
      WHEN json_type(doc, '$.tag') = 'NULL' THEN 'null:tag'
      WHEN json_type(doc, '$.tag') IS NOT NULL
           AND json_type(doc, '$.tag') != 'VARCHAR' THEN 'type:tag'
      -- stage 3: unexpected keys, sorted
      WHEN len(list_filter(json_keys(doc), x -> x NOT IN ('k', 'note', 'tag', 'arr'))) > 0
        THEN 'unexpected:' ||
             list_sort(list_filter(json_keys(doc), x -> x NOT IN ('k', 'note', 'tag', 'arr')))[1]
      ELSE NULL
    END AS reject_reason
  FROM docs
)
SELECT event_id, reject_reason IS NULL AS valid,
       coalesce(reject_reason, '') AS reject_reason
FROM checked""",
        "xml_extract_events": """
SELECT event_id,
       event_id % 7 != 0 AS parse_ok,
       CASE WHEN event_id % 7 != 0 THEN user_id END AS xid,
       CASE WHEN event_id % 7 != 0 THEN event_type ELSE '' END AS xt
FROM events""",
        "audispd_model_events": """
SELECT event_id,
       CASE CAST(event_id % 7 AS INTEGER)
         WHEN 0 THEN 'conf_change' WHEN 1 THEN 'fdpair'
         WHEN 2 THEN 'login' WHEN 3 THEN 'netfilter_cfg'
         WHEN 4 THEN 'system_boot' WHEN 5 THEN 'queue_full'
         ELSE '' END AS model,
       CASE WHEN event_id % 7 <= 4
            THEN 1600000000 + event_id % 86400 END AS atime,
       CASE WHEN event_id % 7 <= 4
            THEN event_id % 90000 + 1 END AS aseq,
       CASE CAST(event_id % 7 AS INTEGER)
         WHEN 0 THEN event_id % 500 WHEN 1 THEN event_id % 100
         WHEN 2 THEN user_id WHEN 3 THEN event_id % 10 END AS val,
       CASE CAST(event_id % 7 AS INTEGER)
         WHEN 0 THEN '/etc/rule' || CAST(event_id % 50 AS VARCHAR)
         WHEN 4 THEN ' system boot payload ' || CAST(event_id AS VARCHAR)
         ELSE '' END AS sval
FROM events""",
        "sshd_model_events": """
SELECT event_id,
       CASE CAST(event_id % 6 AS INTEGER)
         WHEN 0 THEN 'failed_accept' WHEN 1 THEN 'failed_accept'
         WHEN 2 THEN 'closed_ip' WHEN 3 THEN 'pam'
         WHEN 4 THEN 'invalid_user' ELSE '' END AS model,
       CASE WHEN event_id % 6 != 5 THEN user_id END AS pid,
       CASE WHEN event_id % 6 IN (0, 1, 4)
            THEN 1000 + event_id % 50000 END AS port,
       CASE WHEN event_id % 6 IN (0, 1, 3, 4)
            THEN 'u' || CAST(event_id AS VARCHAR) ELSE '' END AS u
FROM events""",
        "unparsed_diagnosis_events": """
SELECT event_id,
       event_id % 11 != 0 AND event_id % 5 != 0 AS parse_ok,
       CASE WHEN event_id % 11 = 0
            THEN 2 + LENGTH(CAST(user_id AS VARCHAR))
            WHEN event_id % 5 = 0
            THEN 6 + LENGTH(CAST(user_id AS VARCHAR))
                 + LENGTH(CAST(event_id AS VARCHAR)) END AS plen,
       CASE WHEN event_id % 11 = 0
            THEN ' T=' || CAST(event_id AS VARCHAR)
            WHEN event_id % 5 = 0 THEN ' j=7' END AS rest
FROM events""",
        "line_model_events": """
SELECT event_id,
       event_id % 11 != 0 AS parse_ok,
       CASE WHEN event_id % 11 != 0 THEN user_id END AS u,
       CASE WHEN event_id % 11 != 0 THEN event_type ELSE '' END AS t,
       CASE WHEN event_id % 11 != 0 THEN event_id % 1000 END AS k,
       CASE WHEN event_id % 11 != 0 AND event_id % 3 = 0 THEN user_id * 2 END AS x
FROM events""",
        "pca_windows_events": """
WITH n AS (SELECT (count(*) // 50) * 50 AS lim FROM events),
w AS (SELECT DISTINCT event_id // 50 AS "window"
      FROM events, n WHERE event_id < lim)
SELECT "window",
       (CASE WHEN "window" % 10 = 9 THEN 1000000 ELSE 0 END)::BIGINT
         AS score_e6,
       "window" % 10 = 9 AS anomaly
FROM w""",
        "vartype_events": """
WITH g AS (SELECT event_id // 200 AS grp, count(*) AS n
           FROM events GROUP BY 1)
SELECT grp,
       CASE CAST(grp % 6 AS INTEGER)
            WHEN 0 THEN 'stat' WHEN 1 THEN 'unq' WHEN 2 THEN 'd'
            WHEN 3 THEN 'continuous' WHEN 4 THEN 'range'
            ELSE 'others' END AS var_kind
FROM g WHERE n = 200""",
        "value_branch_model_events": """
SELECT event_id,
  coalesce(event_type IN ('click', 'error', 'purchase'), FALSE) AS parse_ok,
  CASE WHEN event_type = 'click' THEN 'add'
       WHEN event_type = 'error' THEN 'del'
       WHEN event_type = 'purchase' THEN '<default>'
       ELSE '' END AS op_branch,
  CASE WHEN event_type = 'click' THEN 'add'
       WHEN event_type = 'error' THEN 'del'
       WHEN event_type = 'purchase' THEN 'mul'
       ELSE '' END AS opv,
  CASE WHEN event_type = 'click' THEN user_id END AS a,
  CASE WHEN event_type = 'click' THEN event_id % 1000 END AS b,
  CASE WHEN event_type = 'error' THEN user_id END AS i,
  CASE WHEN event_type = 'purchase' THEN user_id END AS x
FROM events""",
        "datetime_parse_events": """
SELECT event_id,
       epoch_us(ts) - CAST(CASE CAST(event_id % 6 AS INTEGER)
         WHEN 2 THEN 3600 WHEN 3 THEN 9000 WHEN 4 THEN 3600 ELSE 0
       END AS BIGINT) * 1000000 AS epoch_us
FROM events""",
        "allowlist_rules_events": """
SELECT event_id FROM events
WHERE NOT (event_type IN ('click', 'view', 'purchase')
           OR (value >= 0.0 AND value <= 100.0))""",
        "multisource_merge_events": """
WITH s AS (
  SELECT CAST(event_id % 3 AS VARCHAR) AS src, event_id AS seq,
         epoch_us(ts) - CASE WHEN event_id % 17 = 0
                             THEN 3600000000 ELSE 0 END AS ts_us
  FROM events)
SELECT src, seq, ts_us,
       row_number() OVER (ORDER BY ts_us, src, seq) - 1 AS merge_pos,
       ts_us AS watermark_us,
       coalesce(ts_us < max(ts_us) OVER (PARTITION BY src ORDER BY seq
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), FALSE)
         AS src_unsorted
FROM s""",
        "value_dependent_rules_events": """
WITH f AS (
  SELECT event_id,
    coalesce(CASE WHEN event_type = 'click'
                  THEN (value >= 0.0 AND value <= 60.0)
                  WHEN event_type = 'error'
                  THEN regexp_matches(props, '"k": 1')
                  ELSE (value >= 0.0 AND value <= 20.0) END,
             FALSE) AS m_deleg,
    coalesce(CASE WHEN event_type = 'purchase'
                  THEN (epoch_us(ts) % 86400000000)
                       BETWEEN 3600000000 AND 43200000000
                  WHEN event_type = 'signup'
                  THEN (epoch_us(ts) % 86400000000)
                       BETWEEN 0 AND 21600000000
                  ELSE (epoch_us(ts) % 86400000000)
                       BETWEEN 79200000000 AND 86400000000 END,
             FALSE) AS m_window
  FROM events)
SELECT event_id, m_deleg::BIGINT AS m_deleg, m_window::BIGINT AS m_window
FROM f WHERE m_deleg OR m_window""",
        "implication_support_events": """
WITH types AS (SELECT DISTINCT event_type FROM events),
a AS (SELECT user_id, event_type AS a_event, epoch_us(ts) AS ats FROM events)
SELECT a.a_event, t.event_type AS b_event,
       count(*)::BIGINT AS n_a,
       sum(CASE WHEN EXISTS (
            SELECT 1 FROM events b
            WHERE b.user_id = a.user_id AND b.event_type = t.event_type
              AND epoch_us(b.ts) > a.ats
              AND epoch_us(b.ts) <= a.ats + 600000000
          ) THEN 1 ELSE 0 END)::BIGINT AS n_hit
FROM a CROSS JOIN types t
GROUP BY 1, 2""",
        "implication_rules_events": """
WITH RECURSIVE
e AS (SELECT user_id, event_type AS ev, epoch_us(ts) AS uts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events),
fwd AS (SELECT DISTINCT p.ev AS a_event, c.ev AS b_event
        FROM e c JOIN e p ON p.user_id = c.user_id
          AND p.rn >= c.rn - 10 AND p.rn <= c.rn - 1
          AND p.uts >= c.uts - 3600000000
          AND p.ev <> c.ev),
a AS (SELECT user_id, event_type AS a_event, epoch_us(ts) AS ats FROM events),
sup AS (SELECT a.a_event, t.event_type AS b_event,
               count(*)::BIGINT AS n_a,
               sum(CASE WHEN EXISTS (
                    SELECT 1 FROM events b
                    WHERE b.user_id = a.user_id AND b.event_type = t.event_type
                      AND epoch_us(b.ts) > a.ats
                      AND epoch_us(b.ts) <= a.ats + 3600000000
                  ) THEN 1 ELSE 0 END)::BIGINT AS n_hit
        FROM a CROSS JOIN (SELECT DISTINCT event_type FROM events) t
        GROUP BY 1, 2),
r0 AS (SELECT s.a_event, s.b_event, s.n_a, s.n_hit
       FROM sup s JOIN fwd f ON s.a_event = f.a_event AND s.b_event = f.b_event
       WHERE s.n_a >= 20 AND s.a_event <> s.b_event),
bin AS (
  SELECT a_event, b_event, n_a, n_hit, 0::BIGINT AS k,
         n_a * ln(0.99) AS lp, exp(n_a * ln(0.99)) AS cdf
  FROM r0
  UNION ALL
  SELECT a_event, b_event, n_a, n_hit, k + 1,
         lp + ln((n_a - k)::DOUBLE / (k + 1)) + ln(0.01) - ln(0.99),
         cdf + exp(lp + ln((n_a - k)::DOUBLE / (k + 1)) + ln(0.01) - ln(0.99))
  FROM bin WHERE cdf < 0.05 AND k < n_a),
thr AS (SELECT a_event, b_event, n_a, n_hit, max(k) AS min_hits
        FROM bin GROUP BY 1, 2, 3, 4)
SELECT a_event, b_event, n_a, n_hit,
       CAST(ROUND(n_hit / n_a * 1000000) AS BIGINT) AS conf_e6, min_hits
FROM thr WHERE n_hit >= min_hits""",
        "mean_shift_events": """
WITH s AS (
  SELECT event_type, CAST(floor(epoch(ts)/21600) AS BIGINT) AS "window",
         count(*)::BIGINT AS n, avg(value) AS mean, var_pop(value) AS var
  FROM events GROUP BY 1, 2
), p AS (
  SELECT event_type, "window", n, mean, var,
         lag(n)    OVER w AS pn,
         lag(mean) OVER w AS pm,
         lag(var)  OVER w AS pv
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY "window")
)
SELECT event_type, "window" FROM p
WHERE pn IS NOT NULL AND pn >= 10 AND n >= 10
  AND sqrt(pv/pn + var/n) > 0
  AND abs(mean - pm) / sqrt(pv/pn + var/n) > 3.0""",
        "time_correlation_events": """
WITH trig AS (
  SELECT event_type, epoch_us(ts) AS tu, event_id // 2000 AS win,
         row_number() OVER (ORDER BY ts, event_id) AS rn
  FROM events
),
feats AS (SELECT DISTINCT event_type AS a_event FROM events),
tgt AS (SELECT t.*, f.a_event FROM trig t CROSS JOIN feats f),
j AS (
  SELECT g.win, g.a_event, g.event_type AS b_event, g.tu - p.tu AS d
  FROM tgt g ASOF JOIN trig p
    ON p.event_type = g.a_event AND p.win = g.win AND p.rn < g.rn
)
SELECT win AS "window", a_event, b_event, count(*)::BIGINT AS n, sum(d)::BIGINT AS delta_us
FROM j WHERE d <= 10000000 GROUP BY ALL""",
        "pretoken_counts_documents": r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))::BIGINT AS n_pretokens
FROM documents""",
        "clean_corpus_documents": r"""
WITH l AS (
  SELECT doc_id, unnest(list_filter(string_split(text, chr(10)), x -> x <> '')) AS line
  FROM documents
),
lc AS (
  SELECT doc_id, count(*) AS n_lines,
         count(*) - count(DISTINCT line) AS n_dup_lines
  FROM l GROUP BY doc_id
),
toks AS (
  SELECT doc_id, unnest(tl) AS tok, generate_subscripts(tl, 1) AS ord
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS tl
        FROM documents)
),
sh AS (
  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS s
  FROM toks QUALIFY s IS NOT NULL
),
sc AS (SELECT doc_id, s, count(*) AS c FROM sh GROUP BY doc_id, s),
g AS (SELECT doc_id, sum(c) AS n_2grams, max(c) AS top_2gram_n FROM sc GROUP BY doc_id),
tok AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
         length(text) AS n_chars
  FROM documents
),
keep AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text))
SELECT d.doc_id FROM documents d
JOIN tok USING (doc_id)
LEFT JOIN lc USING (doc_id)
LEFT JOIN g USING (doc_id)
WHERE tok.n_chars BETWEEN 200 AND 100000
  AND tok.n_tokens >= 25
  AND coalesce(lc.n_dup_lines, 0) * 4 <= 1 * coalesce(lc.n_lines, 0)
  AND coalesce(g.top_2gram_n, 0) * 5 <= 1 * coalesce(g.n_2grams, 0)
  AND d.doc_id IN (SELECT keep_id FROM keep)""",
        "repetition_stats_documents": r"""
WITH l AS (
  SELECT doc_id, unnest(list_filter(string_split(text, chr(10)), x -> x <> '')) AS line
  FROM documents
),
lc AS (
  SELECT doc_id, count(*) AS n_lines,
         count(*) - count(DISTINCT line) AS n_dup_lines
  FROM l GROUP BY doc_id
),
toks AS (
  SELECT doc_id, unnest(tl) AS tok, generate_subscripts(tl, 1) AS ord
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS tl
        FROM documents)
),
sh AS (
  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS s
  FROM toks QUALIFY s IS NOT NULL
),
sc AS (SELECT doc_id, s, count(*) AS c FROM sh GROUP BY doc_id, s),
g AS (SELECT doc_id, sum(c) AS n_2grams, max(c) AS top_2gram_n FROM sc GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(lc.n_lines, 0)::BIGINT AS n_lines,
       coalesce(lc.n_dup_lines, 0)::BIGINT AS n_dup_lines,
       coalesce(g.n_2grams, 0)::BIGINT AS n_2grams,
       coalesce(g.top_2gram_n, 0)::BIGINT AS top_2gram_n
FROM documents d LEFT JOIN lc USING (doc_id) LEFT JOIN g USING (doc_id)""",
        "dedup_clusters_documents": r"""
WITH RECURSIVE toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
        FROM documents)
),
sh AS (
  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS s
  FROM toks QUALIFY s IS NOT NULL
),
hx AS (SELECT doc_id, substr(md5(s), 1, 16) AS h FROM sh),
bits AS (
  SELECT doc_id, t.i,
         CASE WHEN 2 * sum(
           (strpos('0123456789abcdef', substr(h, CAST(16 - t.i // 4 AS INT), 1)) - 1) >> (t.i % 4) & 1
         ) - count(*) > 0 THEN 1 ELSE 0 END AS pos
  FROM hx, range(0, 64) t(i)
  GROUP BY doc_id, t.i
),
fp AS (
  SELECT doc_id,
         sum(CASE WHEN pos = 1 AND i < 32 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS lo,
         sum(CASE WHEN pos = 1 AND i >= 32 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS hi
  FROM bits GROUP BY doc_id
),
fp2 AS (
  SELECT d.doc_id, coalesce(fp.lo, 0)::BIGINT AS lo, coalesce(fp.hi, 0)::BIGINT AS hi
  FROM documents d LEFT JOIN fp USING (doc_id)
),
pr AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp2 a JOIN fp2 b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
),
e2 AS (SELECT id_a AS a, id_b AS b FROM pr UNION SELECT id_b, id_a FROM pr),
reach AS (
  SELECT a, b FROM e2
  UNION
  SELECT r.a, e2.b FROM reach r JOIN e2 ON r.b = e2.a
)
SELECT a AS id, min(b)::BIGINT AS component FROM reach GROUP BY a""",
        "simhash_pairs_documents": r"""
WITH toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
        FROM documents)
),
sh AS (
  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS s
  FROM toks QUALIFY s IS NOT NULL
),
hx AS (SELECT doc_id, substr(md5(s), 1, 16) AS h FROM sh),
bits AS (
  SELECT doc_id, t.i,
         CASE WHEN 2 * sum(
           (strpos('0123456789abcdef', substr(h, CAST(16 - t.i // 4 AS INT), 1)) - 1) >> (t.i % 4) & 1
         ) - count(*) > 0 THEN 1 ELSE 0 END AS pos
  FROM hx, range(0, 64) t(i)
  GROUP BY doc_id, t.i
),
fp AS (
  SELECT doc_id,
         sum(CASE WHEN pos = 1 AND i < 32 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS lo,
         sum(CASE WHEN pos = 1 AND i >= 32 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS hi
  FROM bits GROUP BY doc_id
),
fp2 AS (
  SELECT d.doc_id, coalesce(fp.lo, 0)::BIGINT AS lo, coalesce(fp.hi, 0)::BIGINT AS hi
  FROM documents d LEFT JOIN fp USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::BIGINT AS hamming
FROM fp2 a JOIN fp2 b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3""",
        "tail_values_events": """
WITH o AS (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id) - 1 AS rn0,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, event_id FROM o
WHERE n <= 40
   OR rn0 >= (41 + ((n - 41) // 16) * 16) - 25""",
        "reservoir_sample_events": """
SELECT event_type, event_id FROM (
  SELECT event_type, event_id,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
         ) AS rn
  FROM events
) WHERE rn <= 50""",
        "sessions_events": """
WITH o AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
)
SELECT user_id, (sum(brk) + 1)::BIGINT AS n_sessions
FROM o GROUP BY user_id""",
        "interval_unmatched_events": """
SELECT user_id, ts FROM events a
WHERE a.event_type = 'error' AND NOT EXISTS (
  SELECT 1 FROM events b
  WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
    AND epoch_us(b.ts) >= epoch_us(a.ts)
    AND epoch_us(b.ts) <= epoch_us(a.ts) + 600000000
)""",
        "monotonic_adjust_events": """
SELECT event_id,
       max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS UNBOUNDED PRECEDING) AS ts_adjusted
FROM events""",
        "topk_orders": """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        "session_combos_events": """
WITH o AS (
  SELECT user_id, event_type, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, session_id::BIGINT AS session_id,
       string_agg(DISTINCT event_type, '|' ORDER BY event_type) AS event_type_set,
       min(ts) AS first_ts, max(ts) AS last_ts, count(*)::BIGINT AS n_events
FROM s GROUP BY 1, 2""",
        "schema_conformance_events": """
WITH actual AS (
  SELECT column_name AS col, column_type AS typ FROM (DESCRIBE events)
), declared(col, typ) AS (VALUES """
        + ", ".join(
            f"('{c}', '{t}')" for c, t in DECLARED_EVENTS_SCHEMA.items()
        )
        + """),
j AS (SELECT coalesce(a.col, d.col) AS col, a.typ AS atyp, d.typ AS dtyp
      FROM actual a FULL JOIN declared d ON a.col = d.col)
SELECT col,
       CASE WHEN dtyp IS NULL THEN 'new_path'
            WHEN atyp IS NULL THEN 'missing'
            ELSE 'type_mismatch' END AS kind,
       coalesce(atyp, '<absent>') AS actual_type
FROM j WHERE dtyp IS NULL OR atyp IS NULL OR atyp <> dtyp""",
        "chi2_events": """
WITH c AS (SELECT event_type AS a, user_id AS b, count(*)::DOUBLE AS n
           FROM events GROUP BY 1, 2),
ra AS (SELECT a, sum(n) AS rt FROM c GROUP BY 1),
cb AS (SELECT b, sum(n) AS ct FROM c GROUP BY 1),
tot AS (SELECT sum(n) AS t FROM c),
grid AS (SELECT ra.a, cb.b, ra.rt, cb.ct FROM ra CROSS JOIN cb),
g2 AS (SELECT grid.a, grid.b, coalesce(c.n, 0) AS o, grid.rt * grid.ct / tot.t AS e
       FROM grid LEFT JOIN c ON grid.a = c.a AND grid.b = c.b CROSS JOIN tot)
SELECT CAST(ROUND(sum((o - e) * (o - e) / e) * 10000) AS BIGINT) AS chi2_e4,
       ((SELECT count(*) FROM ra) - 1) * ((SELECT count(*) FROM cb) - 1) AS dof
FROM g2""",
        "count_vector_outliers_events": """
WITH c AS (SELECT user_id, CAST(floor(epoch(ts)/86400) AS BIGINT) AS win,
                  event_type, count(*)::DOUBLE AS n
           FROM events GROUP BY 1, 2, 3),
et AS (SELECT DISTINCT event_type FROM events),
uw AS (SELECT DISTINCT user_id, win FROM c),
grid AS (SELECT uw.user_id, uw.win, et.event_type FROM uw CROSS JOIN et),
cz AS (SELECT g.user_id, g.win, g.event_type, coalesce(c.n, 0) AS n
       FROM grid g LEFT JOIN c
         ON g.user_id = c.user_id AND g.win = c.win AND g.event_type = c.event_type),
m AS (SELECT user_id, event_type, avg(n) AS mn FROM cz GROUP BY 1, 2),
s AS (SELECT cz.user_id, cz.win,
             sum(cz.n * m.mn) AS dot, sum(cz.n * cz.n) AS nn, sum(m.mn * m.mn) AS mm
      FROM cz JOIN m ON cz.user_id = m.user_id AND cz.event_type = m.event_type
      GROUP BY 1, 2),
r AS (SELECT user_id, win AS "window",
             CASE WHEN nn > 0 AND mm > 0 THEN dot / (sqrt(nn) * sqrt(mm))
                  ELSE 1.0 END AS sim
      FROM s)
SELECT user_id, "window", CAST(ROUND(sim * 1000000) AS BIGINT) AS sim_e6
FROM r WHERE sim < 0.3""",
        "quality_scores_documents": r"""
WITH q AS (
  SELECT doc_id,
    (CASE WHEN trim(text) = '' THEN 0
          ELSE len(string_split_regex(trim(text), '\s+')) END)::DOUBLE AS tc,
    greatest(strlen(text), 1)::DOUBLE AS slen,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS na,
    length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS nd,
    length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))::DOUBLE AS npn
  FROM documents
), sc AS (
  SELECT doc_id,
    0.25 * (least(tc / 100.0, 1.0) * (CASE WHEN tc >= 5 THEN 1.0 ELSE 0.0 END))
  + 0.35 * least((na / slen) / 0.7, 1.0)
  + 0.2 * greatest(1.0 - 2.0 * (npn / slen), 0.0)
  + 0.2 * greatest(1.0 - 2.0 * (nd / slen), 0.0) AS quality
  FROM q)
SELECT doc_id, CAST(ROUND(quality * 1000000) AS BIGINT) AS quality_e6 FROM sc""",
        "ar_outliers_events": zfill
        + """,
p AS (SELECT event_type, "window", n::DOUBLE AS y,
             lag(n::DOUBLE) OVER (PARTITION BY event_type ORDER BY "window") AS x
      FROM z),
pp AS (SELECT * FROM p WHERE x IS NOT NULL),
fit AS (SELECT event_type, regr_slope(y, x) AS b, regr_intercept(y, x) AS a
        FROM pp GROUP BY 1),
r AS (SELECT pp.event_type, pp."window", pp.y, fit.b * pp.x + fit.a AS pred
      FROM pp JOIN fit ON pp.event_type = fit.event_type),
s AS (SELECT event_type, stddev_pop(y - pred) AS sd FROM r GROUP BY 1)
SELECT r.event_type, r."window", CAST(r.y AS BIGINT) AS n
FROM r JOIN s ON r.event_type = s.event_type
WHERE abs(r.y - r.pred) > 3.0 * greatest(s.sd, 1e-9)""",
        "time_of_period_events": """
WITH v AS (SELECT user_id, event_type, event_id, ts,
                  floor(epoch(ts))::BIGINT % 86400 AS tod FROM events),
k AS (SELECT user_id, event_type FROM v GROUP BY 1, 2 HAVING count(*) >= 3),
p AS (SELECT a.user_id, a.event_type, a.event_id, a.ts,
             min(least(abs(a.tod - b.tod), 86400 - abs(a.tod - b.tod))) AS d
      FROM v a
      JOIN v b ON a.user_id = b.user_id AND a.event_type = b.event_type
              AND a.event_id <> b.event_id
      JOIN k ON k.user_id = a.user_id AND k.event_type = a.event_type
      GROUP BY 1, 2, 3, 4)
SELECT user_id, event_type, ts FROM p WHERE d > 600""",
        "hll_distinct_documents": """
SELECT 'text' AS "column", count(DISTINCT text)::BIGINT AS n_distinct, TRUE AS hll_ok
FROM documents
UNION ALL
SELECT 'lang', count(DISTINCT lang)::BIGINT, TRUE FROM documents
UNION ALL
SELECT 'source', count(DISTINCT source)::BIGINT, TRUE FROM documents""",
        "entropy_scores_documents": """
SELECT doc_id, CAST(ROUND(entropy(c) * 1000000) AS BIGINT) AS ent_e6
FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
GROUP BY doc_id""",
        "langid_documents": r"""
WITH s AS (
  SELECT doc_id,
    greatest(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END, 1)::DOUBLE AS nt,
    len(regexp_extract_all(lower(text),
        '\b(the|and|of|to|in|is|that|for|with|was|are)\b'))::DOUBLE AS c_en,
    len(regexp_extract_all(lower(text),
        '\b(der|die|das|und|ist|nicht|mit|ein|eine|von|zu)\b'))::DOUBLE AS c_de,
    len(regexp_extract_all(lower(text),
        '\b(le|la|les|et|est|une|des|dans|pour|que|pas)\b'))::DOUBLE AS c_fr,
    len(regexp_extract_all(lower(text),
        '\b(el|la|los|las|es|una|del|para|con|por|que)\b'))::DOUBLE AS c_es,
    len(regexp_extract_all(lower(text), '[一-鿿]'))::DOUBLE AS c_cjk,
    greatest(length(text), 1)::DOUBLE AS nc
  FROM documents
), sc AS (
  SELECT doc_id, c_en/nt AS s_en, c_de/nt AS s_de, c_fr/nt AS s_fr,
         c_es/nt AS s_es, c_cjk/nc AS s_cjk
  FROM s)
SELECT doc_id,
  CASE WHEN s_cjk > 0.2 THEN 'zh'
       WHEN greatest(s_en, s_de, s_fr, s_es) > 0.01 THEN
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              WHEN s_fr >= s_es THEN 'fr'
              ELSE 'es' END
       ELSE 'xx' END AS pred_lang
FROM sc""",
        "fingerprints_documents": r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
f AS (SELECT t.doc_id, min(md5(array_to_string(toks[i:i+2], ' '))) AS fp_min
      FROM t, unnest(generate_series(1, len(toks) - 2)) g(i)
      GROUP BY t.doc_id)
SELECT d.doc_id, f.fp_min FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id""",
        "cm_drift_events": """
WITH v AS (SELECT event_type AS g, value FROM events WHERE value IS NOT NULL),
ng AS (SELECT g, count(*)::HUGEINT AS ni FROM v GROUP BY 1),
mt AS (SELECT count(*)::HUGEINT AS mi FROM v),
pts AS (SELECT value, count(*)::HUGEINT AS w FROM v GROUP BY 1),
ac AS (SELECT g, value, count(*) AS c FROM v GROUP BY 1, 2),
ac2 AS (SELECT g, value, sum(c) OVER (PARTITION BY g ORDER BY value) AS ca FROM ac),
bc2 AS (SELECT value, w, sum(w) OVER (ORDER BY value) AS cb FROM pts),
grid AS (SELECT ng.g, ng.ni, p.value, p.w FROM ng CROSS JOIN pts p),
fa AS (SELECT grid.g, grid.ni, grid.value, grid.w, coalesce(a.ca, 0)::HUGEINT AS ca
       FROM grid ASOF LEFT JOIN ac2 a ON grid.g = a.g AND grid.value >= a.value),
j AS (SELECT fa.g, fa.ni, fa.w,
             (fa.ca * mt.mi - b.cb::HUGEINT * fa.ni) AS diff
      FROM fa JOIN bc2 b ON fa.value = b.value CROSS JOIN mt),
agg AS (SELECT g, ni, sum(w * diff * diff)::HUGEINT AS num FROM j GROUP BY g, ni),
fin AS (SELECT g, ni, num, (ni * mt.mi * (ni + mt.mi) * (ni + mt.mi))::HUGEINT AS den
        FROM agg CROSS JOIN mt)
SELECT g AS event_type, CAST(ni AS BIGINT) AS n,
       CAST((num * 2000000 + den) // (2 * den) AS BIGINT) AS cm_e6
FROM fin""",
        "psi_drift_events": f"""
WITH binned AS (
  SELECT event_type,
         CASE WHEN value < {HIST_EDGES[0]} THEN 0
              WHEN value >= {HIST_EDGES[-1]} THEN {len(HIST_EDGES)}
              ELSE CAST(floor(value/40) AS BIGINT) + 1 END AS bin
  FROM events WHERE value IS NOT NULL),
counts AS (SELECT event_type, bin, count(*)::BIGINT AS n FROM binned GROUP BY 1, 2),
ets AS (SELECT DISTINCT event_type FROM counts),
bins AS (SELECT CAST(range AS BIGINT) AS bin FROM range({len(HIST_EDGES) + 1})),
grid AS (
  SELECT e.event_type, b.bin, COALESCE(c.n, 0)::DOUBLE + 0.5 AS c
  FROM ets e CROSS JOIN bins b
  LEFT JOIN counts c ON c.event_type = e.event_type AND c.bin = b.bin),
fr AS (SELECT event_type, bin, c / sum(c) OVER (PARTITION BY event_type) AS f FROM grid),
md AS (SELECT bin, median(f) AS m FROM fr GROUP BY 1),
rf AS (SELECT bin, m / (SELECT sum(m) FROM md) AS r FROM md),
qc AS (SELECT event_type, bin, greatest(f, 0.000001) AS q FROM fr),
qn AS (SELECT event_type, bin, q / sum(q) OVER (PARTITION BY event_type) AS q FROM qc),
pc0 AS (SELECT bin, greatest(r, 0.000001) AS p FROM rf),
pn AS (SELECT bin, p / (SELECT sum(p) FROM pc0) AS p FROM pc0),
ps AS (SELECT qn.event_type, sum((qn.q - pn.p) * ln(qn.q / pn.p)) AS psi
       FROM qn JOIN pn ON qn.bin = pn.bin GROUP BY 1)
SELECT event_type, CAST(ROUND(psi * 1000000) AS BIGINT) AS psi_e6, psi > 0.2 AS drift
FROM ps""",
        "ks_drift_events": """
WITH v AS (SELECT event_type AS g, value FROM events WHERE value IS NOT NULL),
ng AS (SELECT g, count(*)::DOUBLE AS n FROM v GROUP BY 1),
mt AS (SELECT count(*)::DOUBLE AS m FROM v),
pts AS (SELECT DISTINCT value FROM v),
ac AS (SELECT g, value, count(*) AS c FROM v GROUP BY 1, 2),
ac2 AS (SELECT g, value, sum(c) OVER (PARTITION BY g ORDER BY value) AS ca FROM ac),
bc AS (SELECT value, count(*) AS c FROM v GROUP BY 1),
bc2 AS (SELECT value, sum(c) OVER (ORDER BY value) AS cb FROM bc),
grid AS (SELECT ng.g, p.value, ng.n FROM ng CROSS JOIN pts p),
fa AS (SELECT grid.g, grid.value, grid.n, coalesce(a.ca, 0)::DOUBLE AS ca
       FROM grid ASOF LEFT JOIN ac2 a ON grid.g = a.g AND grid.value >= a.value),
j AS (SELECT fa.g, abs(fa.ca / fa.n - b.cb / mt.m) AS d
      FROM fa JOIN bc2 b ON fa.value = b.value CROSS JOIN mt)
SELECT j.g AS event_type, CAST(ng.n AS BIGINT) AS n,
       CAST(ROUND(max(j.d) * 1000000) AS BIGINT) AS ks_e6
FROM j JOIN ng ON j.g = ng.g
GROUP BY 1, 2""",
        "embedding_near_dups": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) * 10000)
            AS BIGINT) AS sim_e4
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45""",
        "correlation_rules_lineitem": """
WITH d AS (SELECT CAST(l_returnflag AS VARCHAR) AS rf,
                  CAST(l_linestatus AS VARCHAR) AS ls,
                  CAST(CAST(ROUND(l_tax * 100) AS BIGINT) AS VARCHAR) AS tc,
                  CAST(CAST(ROUND(l_tax * 100) AS BIGINT) // 3 AS VARCHAR) AS tb
           FROM lineitem)
SELECT 'l_returnflag' AS col_a, rf AS val_a, 'l_linestatus' AS col_b,
       max(ls) AS val_b, count(*)::BIGINT AS n
FROM d GROUP BY rf HAVING count(DISTINCT ls) = 1
UNION ALL
SELECT 'l_linestatus', ls, 'l_returnflag', max(rf), count(*)::BIGINT
FROM d GROUP BY ls HAVING count(DISTINCT rf) = 1
UNION ALL
SELECT 'tax_cents', tc, 'tax_band', max(tb), count(*)::BIGINT
FROM d GROUP BY tc HAVING count(DISTINCT tb) = 1
UNION ALL
SELECT 'tax_band', tb, 'tax_cents', max(tc), count(*)::BIGINT
FROM d GROUP BY tb HAVING count(DISTINCT tc) = 1""",
        "minhash_pairs_documents": r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
sh AS (SELECT doc_id,
              list_distinct(list_transform(
                generate_series(1, greatest(len(toks) - 2, 0)),
                i -> array_to_string(toks[i:i+2], ' '))) AS s
       FROM t),
p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE AS ni,
             len(list_distinct(list_concat(a.s, b.s)))::DOUBLE AS nu
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(ROUND(ni / nu * 1000000) AS BIGINT) AS jac_e6
FROM p WHERE nu > 0 AND ni / nu >= 0.5""",
        "ngram_jaccard_pairs_documents": r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
sh AS (SELECT doc_id,
              list_distinct(list_transform(
                generate_series(1, greatest(len(toks) - 2, 0)),
                i -> array_to_string(toks[i:i+2], ' '))) AS s
       FROM t),
p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE AS ni,
             len(list_distinct(list_concat(a.s, b.s)))::DOUBLE AS nu
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(ROUND(ni / nu * 1000000) AS BIGINT) AS jac_e6
FROM p WHERE nu > 0 AND ni / nu >= 0.4""",
        "decontaminate_documents": r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
sh AS (SELECT doc_id,
              list_distinct(list_transform(
                generate_series(1, greatest(len(toks) - 3, 0)),
                i -> array_to_string(toks[i:i+3], ' '))) AS s
       FROM t),
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 41 = 0),
tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 41 <> 0)
SELECT tr.doc_id, count(*) AS n_hits
FROM tr JOIN ev USING (g)
GROUP BY tr.doc_id""",
        "dup_span_coverage_documents": r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
p AS (SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS pos
      FROM t),
g AS (SELECT doc_id, array_to_string(toks[pos:pos+7], ' ') AS g FROM p),
d AS (SELECT g AS gg FROM g GROUP BY g HAVING count(DISTINCT doc_id) >= 2)
SELECT doc_id, count(*) AS n_pos, count(d.gg) AS n_dup_pos
FROM g LEFT JOIN d ON g.g = d.gg
GROUP BY doc_id""",
        "dup_span_rewrite_documents": r"""
WITH inj AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN base || ' please subscribe to our newsletter for more updates'
              ELSE base END AS text
  FROM (SELECT doc_id,
               CASE WHEN doc_id % 5 <> 0
                    THEN 'please subscribe to our newsletter for more updates ' || text
                    ELSE text END AS base
        FROM documents)),
t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM inj WHERE trim(text) <> ''),
p AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks), 8)) AS pos FROM t),
wn AS (SELECT doc_id, pos, array_to_string(toks[pos:pos+7], ' ') AS g FROM p),
d AS (SELECT g FROM wn GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
k AS (SELECT wn.doc_id, wn.pos, wn.g, (d.g IS NOT NULL) AS is_dup
      FROM wn LEFT JOIN d ON wn.g = d.g)
SELECT doc_id,
       string_agg(g, ' ' ORDER BY pos) FILTER (WHERE NOT is_dup) AS clean_text,
       count(*) AS n_win,
       count(*) FILTER (WHERE is_dup) AS n_dup
FROM k GROUP BY doc_id
HAVING count(*) FILTER (WHERE NOT is_dup) > 0""",
        "pmi_collocations_documents": r"""
WITH raw AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '\s+')) AS w,
         generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos
  FROM documents),
tk AS (SELECT doc_id, w,
              row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS np
       FROM raw WHERE w <> ''),
seq AS (SELECT doc_id, w AS w1,
               lead(w) OVER (PARTITION BY doc_id ORDER BY np) AS w2
        FROM tk),
bg AS (SELECT w1, w2, count(*)::BIGINT AS n_ab
       FROM seq WHERE w2 IS NOT NULL GROUP BY 1, 2
       HAVING count(*) >= 5),
ug AS (SELECT w, count(*)::BIGINT AS n FROM tk GROUP BY 1),
sc AS (SELECT w1, w2, n_ab, a.n AS n_a, b.n AS n_b,
              ((n_ab::HUGEINT * 1000000000000)
               // (a.n::HUGEINT * b.n))::BIGINT AS assoc_e12
       FROM bg JOIN ug a ON bg.w1 = a.w JOIN ug b ON bg.w2 = b.w)
SELECT * FROM (
  SELECT w1, w2, n_ab, n_a, n_b, assoc_e12,
         row_number() OVER (ORDER BY assoc_e12 DESC, n_ab DESC,
                            w1, w2)::BIGINT AS rnk
  FROM sc)
WHERE rnk <= 30 ORDER BY rnk""",
        "paragraph_dedup_documents": r"""
WITH inj AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 3 <> 0
          THEN 'welcome to our site' || chr(10) ELSE '' END)
    || text || chr(10)
    || (CASE WHEN doc_id % 4 = 0
             THEN 'thanks ' || chr(9) || ' for  reading'
             ELSE 'thanks for reading' END)
    || (CASE WHEN doc_id % 5 = 0 THEN chr(10) ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || text ELSE '' END) AS text
  FROM documents),
ls AS (
  SELECT doc_id,
         unnest(str_split(text, chr(10))) AS para,
         generate_subscripts(str_split(text, chr(10)), 1) AS idx
  FROM inj),
marked AS (
  SELECT doc_id, idx, para, np,
         CASE WHEN np = '' THEN TRUE
              ELSE row_number() OVER (PARTITION BY np
                                      ORDER BY doc_id, idx) = 1 END AS keep
  FROM (SELECT doc_id, idx, para,
               trim(regexp_replace(para, '[ \t\r]+', ' ', 'g')) AS np
        FROM ls))
SELECT doc_id,
       coalesce(string_agg(para, chr(10) ORDER BY idx)
                FILTER (WHERE keep), '') AS clean_text,
       count(*)::BIGINT AS n_paras,
       (count(*) FILTER (WHERE NOT keep))::BIGINT AS n_dropped
FROM marked GROUP BY doc_id""",
        "pack_sequences_documents": r"""
WITH t AS (SELECT doc_id,
                  len(string_split_regex(trim(text), '\s+')) AS n_tok
           FROM documents WHERE trim(text) <> ''),
c AS (SELECT doc_id, n_tok,
             COALESCE(SUM(n_tok + 1) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
      FROM t)
SELECT doc_id, n_tok, tok_start,
       tok_start // 128 AS seq_first,
       (tok_start + n_tok - 1) // 128 AS seq_last,
       tok_start % 128 AS off_in_first
FROM c""",
        "extract_text_documents": """
SELECT doc_id,
       'home Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text
       || (CASE WHEN doc_id % 7 = 0 THEN ' & more' ELSE '' END)
       AS extracted
FROM documents""",
        "split_assign_documents": """
SELECT doc_id,
       CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'e666' THEN 'train'
            WHEN md5(CAST(doc_id AS VARCHAR)) < 'f333' THEN 'val'
            ELSE 'test' END AS split
FROM documents""",
        "normalize_text_documents": """
SELECT doc_id,
       lower(nfc_normalize(
         replace(replace(text, 'a', 'A' || chr(768)),
                 'e', 'E' || chr(769)))) AS norm_text
FROM documents""",
        "tfidf_top_terms_documents": r"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents
), tk2 AS (SELECT doc_id, term FROM tk WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tk2 GROUP BY 1, 2),
dfq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
        FROM tk2 GROUP BY 1),
r AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC)::BIGINT AS rnk
  FROM tf JOIN dfq USING (term))
SELECT doc_id, term, tf, df, rnk FROM r WHERE rnk <= 5""",
        "term_search_documents": r"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents
), tk2 AS (SELECT doc_id, term FROM tk WHERE term <> ''),
dl AS (SELECT doc_id, count(*)::BIGINT AS doc_len FROM tk2 GROUP BY 1),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tk2
       WHERE term IN ('the', 'scan', 'window', 'query', 'spark')
       GROUP BY 1, 2),
r AS (
  SELECT tf.term, tf.doc_id, tf.tf, dl.doc_len,
         row_number() OVER (
           PARTITION BY tf.term
           ORDER BY tf.tf DESC, dl.doc_len ASC, tf.doc_id ASC)::BIGINT AS rnk
  FROM tf JOIN dl USING (doc_id))
SELECT term, doc_id, tf, doc_len, rnk FROM r WHERE rnk <= 10""",
        "bm25_topk_documents": r"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents
), tk2 AS (SELECT doc_id, term FROM tk WHERE term <> ''),
st AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
              count(*)::BIGINT AS t FROM tk2),
dl AS (SELECT doc_id, count(*)::BIGINT AS doc_len FROM tk2 GROUP BY 1),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tk2
       WHERE term IN ('the', 'scan', 'window', 'query', 'spark')
       GROUP BY 1, 2),
keyed AS (
  SELECT tf.term, tf.doc_id, tf.tf, dl.doc_len,
         CAST((CAST(3 * st.t + 9 * st.n * dl.doc_len AS HUGEINT)
               * 1000000000) // tf.tf AS BIGINT) AS sat_key
  FROM tf JOIN dl USING (doc_id) CROSS JOIN st),
r AS (
  SELECT term, doc_id, tf, doc_len, sat_key,
         row_number() OVER (
           PARTITION BY term
           ORDER BY sat_key ASC, doc_id ASC)::BIGINT AS rnk
  FROM keyed)
SELECT term, doc_id, tf, doc_len, sat_key, rnk FROM r WHERE rnk <= 10""",
        "dsir_weights_documents": r"""
WITH tk AS (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(text, '\s+')) AS tok
  FROM documents
), tk2 AS (SELECT doc_id, lang, tok FROM tk WHERE tok <> ''),
bkt AS (
  SELECT doc_id, lang,
         ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1)) % 64
         AS bk
  FROM tk2),
cnt AS (
  SELECT bk,
         count(*) FILTER (WHERE lang = 'en')::BIGINT AS ct,
         count(*)::BIGINT AS cr
  FROM bkt GROUP BY bk),
tot AS (SELECT sum(ct)::BIGINT AS tt, sum(cr)::BIGINT AS tr FROM cnt),
sc AS (
  SELECT bk,
         CAST((CAST(ct + 1 AS HUGEINT) * (tr + 64) * 1000000)
              // (CAST(cr + 1 AS HUGEINT) * (tt + 64)) AS BIGINT) AS s
  FROM cnt CROSS JOIN tot),
w AS (
  SELECT bkt.doc_id, count(*)::BIGINT AS n_tok,
         CAST(sum(sc.s) AS BIGINT) AS weight
  FROM bkt JOIN sc USING (bk) GROUP BY 1)
SELECT d.doc_id, coalesce(w.n_tok, 0)::BIGINT AS n_tok,
       coalesce(w.weight, 0)::BIGINT AS weight
FROM documents d LEFT JOIN w USING (doc_id)""",
        "bpe_pair_counts_documents": r"""
WITH tk AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok
  FROM documents
), tk2 AS (SELECT tok FROM tk WHERE length(tok) >= 2),
p AS (
  SELECT substr(tok, unnest(generate_series(1, length(tok) - 1)), 2)
         AS pair
  FROM tk2),
c AS (SELECT pair, count(*)::BIGINT AS cnt FROM p GROUP BY 1),
r AS (SELECT pair, cnt,
             row_number() OVER (ORDER BY cnt DESC, pair ASC)::BIGINT
             AS rnk
      FROM c)
SELECT pair, cnt, rnk FROM r WHERE rnk <= 20""",
        "extract_links_documents": """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
k AS (SELECT doc_id, 1 + doc_id % 4 AS outdeg FROM documents),
j AS (SELECT doc_id, outdeg,
             unnest(generate_series(0, outdeg - 1))::BIGINT AS jj
      FROM k)
SELECT doc_id, 1::BIGINT AS pos,
       'https://example.com/?id=' || CAST(doc_id AS VARCHAR)
       || '&ref=nav' AS href
FROM documents
UNION ALL
SELECT j.doc_id, jj + 2 AS pos,
       '/doc/' || CAST((j.doc_id * 31 + 7 * jj + 1) % nn.n AS VARCHAR)
       AS href
FROM j CROSS JOIN nn""",
        "anchor_text_topk_documents": """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
k AS (SELECT doc_id AS src, 1 + doc_id % 4 AS outdeg FROM documents),
j AS (SELECT src, outdeg,
             unnest(generate_series(0, outdeg - 1))::BIGINT AS jj
      FROM k),
e AS (SELECT j.src, (j.src * 31 + 7 * jj + 1) % nn.n AS dst
      FROM j CROSS JOIN nn),
a AS (
  SELECT '/doc/' || CAST(dst AS VARCHAR) AS href,
         'Doc ' || CAST(dst AS VARCHAR) AS anchor,
         count(*)::BIGINT AS n_anchor
  FROM e GROUP BY 1, 2
  UNION ALL
  SELECT 'https://example.com/?id=' || CAST(doc_id AS VARCHAR)
           || '&ref=nav' AS href,
         'site' AS anchor, 1::BIGINT AS n_anchor
  FROM documents),
r AS (
  SELECT href, anchor, n_anchor,
         row_number() OVER (PARTITION BY href
                            ORDER BY n_anchor DESC, anchor) AS rnk
  FROM a)
SELECT href, anchor, n_anchor, rnk FROM r
WHERE rnk <= 2 ORDER BY href, rnk""",
        "indegree_hist_documents": """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
k AS (SELECT doc_id AS src, 1 + doc_id % 4 AS outdeg FROM documents),
j AS (SELECT src, outdeg,
             unnest(generate_series(0, outdeg - 1))::BIGINT AS jj
      FROM k),
e AS (SELECT j.src, (j.src * 31 + 7 * jj + 1) % nn.n AS dst
      FROM j CROSS JOIN nn),
deg AS (SELECT dst, count(*)::BIGINT AS indegree FROM e GROUP BY 1)
SELECT indegree, count(*)::BIGINT AS n_nodes FROM deg GROUP BY 1""",
        "hits_scores_documents": _hits_sql(2),
        "pagerank_documents": """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
k AS (SELECT doc_id AS src, 1 + doc_id % 4 AS outdeg FROM documents),
j AS (SELECT src, outdeg,
             unnest(generate_series(0, outdeg - 1))::BIGINT AS jj
      FROM k),
e AS (SELECT j.src, j.outdeg,
             (j.src * 31 + 7 * jj + 1) % nn.n AS dst
      FROM j CROSS JOIN nn),
r0 AS (SELECT doc_id AS node, 1000000000000 // nn.n AS r
       FROM documents CROSS JOIN nn),
i1 AS (SELECT e.dst AS node, SUM(r0.r // e.outdeg)::BIGINT AS inm
       FROM e JOIN r0 ON r0.node = e.src GROUP BY 1),
r1 AS (SELECT d.doc_id AS node,
              (15 * (1000000000000 // nn.n)) // 100
              + (85 * COALESCE(i1.inm, 0)) // 100 AS r
       FROM documents d CROSS JOIN nn
       LEFT JOIN i1 ON i1.node = d.doc_id),
i2 AS (SELECT e.dst AS node, SUM(r1.r // e.outdeg)::BIGINT AS inm
       FROM e JOIN r1 ON r1.node = e.src GROUP BY 1),
r2 AS (SELECT d.doc_id AS node,
              (15 * (1000000000000 // nn.n)) // 100
              + (85 * COALESCE(i2.inm, 0)) // 100 AS r
       FROM documents d CROSS JOIN nn
       LEFT JOIN i2 ON i2.node = d.doc_id),
i3 AS (SELECT e.dst AS node, SUM(r2.r // e.outdeg)::BIGINT AS inm
       FROM e JOIN r2 ON r2.node = e.src GROUP BY 1),
r3 AS (SELECT d.doc_id AS node,
              (15 * (1000000000000 // nn.n)) // 100
              + (85 * COALESCE(i3.inm, 0)) // 100 AS r
       FROM documents d CROSS JOIN nn
       LEFT JOIN i3 ON i3.node = d.doc_id)
SELECT node, r AS rank_fp FROM r3""",
        "url_normalize_documents": r"""
WITH raw AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'HTTPS://' END)
         || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
         || 'Site' || CAST(doc_id % 13 AS VARCHAR) || '.ORG'
         || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                  WHEN doc_id % 4 = 1 THEN ':443'
                  WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0 THEN '/'
                  ELSE '/p/' || CAST(doc_id % 7 AS VARCHAR) END)
         || (CASE WHEN doc_id % 3 = 0
                  THEN '?utm_source=x&q=' || CAST(doc_id % 11 AS VARCHAR)
                  WHEN doc_id % 3 = 1
                  THEN '?q=' || CAST(doc_id % 11 AS VARCHAR) || '&utm_b=2'
                  ELSE '' END)
         || (CASE WHEN doc_id % 6 = 0
                  THEN '#Sec' || CAST(doc_id % 9 AS VARCHAR) ELSE '' END)
         AS url
  FROM documents),
s1 AS (SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(url,
                '#.*$', ''), 'utm_[^&#]*&', '', 'g'),
                '[?&]utm_[^&#]*$', '') AS u
       FROM raw),
parts AS (
  SELECT doc_id, u,
         lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS sch,
         lower(regexp_extract(u,
           '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS host,
         regexp_replace(u,
           '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*', '') AS rest
  FROM s1),
canon AS (
  SELECT doc_id, u, sch,
         CASE WHEN sch = 'http'
              THEN regexp_replace(regexp_replace(host, '^www\.', ''), ':80$', '')
              WHEN sch = 'https'
              THEN regexp_replace(regexp_replace(host, '^www\.', ''), ':443$', '')
              ELSE regexp_replace(host, '^www\.', '') END AS host,
         regexp_replace(rest, '^/$', '') AS rest
  FROM parts)
SELECT doc_id,
       CASE WHEN regexp_matches(u, '^[A-Za-z][A-Za-z0-9+.\-]*://')
            THEN sch || '://' || host || rest ELSE u END AS url_norm
FROM canon""",
        "cross_source_overlap_documents": r"""
WITH hs AS (
  SELECT md5(text) AS h, coalesce(source, '(null)') AS source,
         count(*)::BIGINT AS n
  FROM documents GROUP BY 1, 2),
d AS (
  SELECT h, string_agg(source, ',' ORDER BY source) AS source_set,
         sum(n)::BIGINT AS n_docs_h
  FROM hs GROUP BY 1)
SELECT source_set, count(*)::BIGINT AS n_texts,
       sum(n_docs_h)::BIGINT AS n_docs
FROM d GROUP BY 1 ORDER BY source_set""",
        "domain_stats_documents": r"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 0 THEN 'junk-' || CAST(doc_id AS VARCHAR)
              ELSE 'http://'
                   || (CASE WHEN doc_id % 3 = 0
                            THEN 'sub' || CAST(doc_id % 4 AS VARCHAR) || '.'
                            ELSE '' END)
                   || 'Site' || CAST(doc_id % 5 AS VARCHAR)
                   || (CASE WHEN doc_id % 2 = 0 THEN '.co.uk' ELSE '.org' END)
                   || '/p' END AS url
  FROM documents),
h AS (
  SELECT CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.\-]*://')
              THEN lower(regexp_extract(url,
                '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) END AS host
  FROM raw),
e AS (
  SELECT CASE
    WHEN host IS NULL THEN '(none)'
    WHEN nullif(regexp_extract(host, '([^.]+\.[^.]+)$', 1), '')
           IN ('co.uk')
         AND nullif(regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1), '')
           IS NOT NULL
    THEN regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1)
    WHEN nullif(regexp_extract(host, '([^.]+\.[^.]+)$', 1), '')
           IS NOT NULL
    THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
    ELSE host END AS domain
  FROM h)
SELECT domain, count(*)::BIGINT AS n_docs
FROM e GROUP BY 1 ORDER BY 1""",
        "token_novelty_documents": r"""
WITH tok AS (SELECT doc_id,
                    unnest(regexp_split_to_array(text, '\s+')) AS w
             FROM documents),
tw AS (SELECT DISTINCT doc_id, w FROM tok WHERE length(w) >= 1),
f AS (SELECT w, min(doc_id) AS first_doc FROM tw GROUP BY 1),
t AS (SELECT doc_id, count(*)::BIGINT AS n_types FROM tw GROUP BY 1),
nv AS (SELECT first_doc AS doc_id, count(*)::BIGINT AS n_novel
       FROM f GROUP BY 1)
SELECT d.doc_id,
       coalesce(t.n_types, 0) AS n_types,
       coalesce(nv.n_novel, 0) AS n_novel,
       CASE WHEN coalesce(t.n_types, 0) = 0 THEN 0
            ELSE CAST(1000000 * coalesce(nv.n_novel, 0) // t.n_types
                      AS BIGINT) END AS novelty_e6
FROM documents d
LEFT JOIN t USING (doc_id) LEFT JOIN nv USING (doc_id)
ORDER BY d.doc_id""",
        "group_split_documents": r"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 0 THEN 'page-' || CAST(doc_id AS VARCHAR)
              ELSE (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'HTTPS://' END)
                   || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
                   || 'Site' || CAST(doc_id % 13 AS VARCHAR) || '.ORG'
                   || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                            WHEN doc_id % 4 = 1 THEN ':443'
                            WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
                   || '/p/' || CAST(doc_id % 7 AS VARCHAR) END AS url
  FROM documents),
h AS (
  SELECT doc_id,
         coalesce(nullif(regexp_replace(regexp_replace(lower(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)),
           '^www\.', ''), ':[0-9]*$', ''), ''), '(none)') AS host_key
  FROM raw)
SELECT doc_id, host_key,
       CASE WHEN md5(host_key) < 'e666' THEN 'train'
            WHEN md5(host_key) < 'f333' THEN 'val'
            ELSE 'test' END AS split
FROM h ORDER BY doc_id""",
        "fix_mojibake_documents": """
WITH raw AS (
  SELECT doc_id, text,
         text
         || (CASE WHEN doc_id % 7 = 0 THEN ' cafÃ©' ELSE '' END)
         || (CASE WHEN doc_id % 11 = 0 THEN ' itâ€™s' ELSE '' END)
         || (CASE WHEN doc_id % 13 = 0 THEN ' Ã' ELSE '' END) AS orig
  FROM documents)
SELECT doc_id,
       CASE WHEN doc_id % 13 = 0 THEN orig
            WHEN doc_id % 7 = 0 OR doc_id % 11 = 0
            THEN text
                 || (CASE WHEN doc_id % 7 = 0 THEN ' café' ELSE '' END)
                 || (CASE WHEN doc_id % 11 = 0 THEN ' it’s' ELSE '' END)
            ELSE orig END AS fixed_text,
       (doc_id % 13 <> 0 AND (doc_id % 7 = 0 OR doc_id % 11 = 0))
         AS was_fixed
FROM raw ORDER BY doc_id""",
        "robots_parse_documents": r"""
WITH raw AS (
  SELECT doc_id,
         'site' || CAST(doc_id % 5 AS VARCHAR) || '.org' AS host,
         'Disallow: /early' || chr(10) || '# comment line' || chr(10)
         || 'User-agent: googlebot' || chr(10)
         || 'Disallow: /gb' || CAST(doc_id % 3 AS VARCHAR)
         || chr(10) || chr(10)
         || (CASE WHEN doc_id % 2 = 0
                  THEN 'User-agent: bingbot' || chr(10) ELSE '' END)
         || 'User-agent: *' || chr(13) || chr(10)
         || 'Allow: /open' || chr(10)
         || 'Disallow: /p/' || CAST(doc_id % 4 AS VARCHAR)
         || '  # trailing comment' || chr(10) || 'Disallow:' || chr(10)
         || (CASE WHEN doc_id % 3 = 0 THEN 'Disallow: /q'
                  ELSE 'Disallow: /r/' || CAST(doc_id % 2 AS VARCHAR) END)
         AS body
  FROM documents),
l0 AS (SELECT doc_id, host,
              unnest(regexp_split_to_array(body, chr(10))) AS line,
              generate_subscripts(regexp_split_to_array(body, chr(10)), 1)
                AS i
       FROM raw),
l1 AS (SELECT doc_id, host, i,
              trim(regexp_replace(line, '#.*$', ''),
                   ' ' || chr(9) || chr(13)) AS ln
       FROM l0),
l2 AS (SELECT *,
              (lower(ln) LIKE 'user-agent:%') AS is_ua,
              (lower(ln) LIKE 'disallow:%') AS is_dis,
              trim(regexp_replace(ln, '^[A-Za-z\-]+:', ''),
                   ' ' || chr(9)) AS val
       FROM l1),
l3 AS (SELECT *,
              CASE WHEN is_ua AND NOT coalesce(
                     lag(is_ua) OVER (PARTITION BY doc_id ORDER BY i),
                     FALSE)
                   THEN 1 ELSE 0 END AS gs
       FROM l2),
l4 AS (SELECT *,
              SUM(gs) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS gid
       FROM l3),
g AS (SELECT doc_id, gid,
             max(CASE WHEN is_ua AND val = '*' THEN 1 ELSE 0 END) AS star
      FROM l4 GROUP BY 1, 2)
SELECT DISTINCT l4.host, l4.val AS prefix
FROM l4 JOIN g ON g.doc_id = l4.doc_id AND g.gid = l4.gid
WHERE l4.is_dis AND l4.gid > 0 AND g.star = 1 AND l4.val <> ''
ORDER BY host, prefix""",
        "lexicon_classify_documents": r"""
WITH lex(topic, kw) AS (VALUES
  ('exec', 'join'),
  ('exec', 'merge'),
  ('exec', 'sort'),
  ('exec', 'hash'),
  ('storage', 'scan'),
  ('storage', 'table'),
  ('storage', 'column'),
  ('storage', 'row'),
  ('stream', 'stream'),
  ('stream', 'window'),
  ('stream', 'batch')),
tok AS (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        FROM documents),
hits AS (SELECT t.doc_id, l.topic, count(*)::BIGINT AS n
         FROM tok t JOIN lex l ON t.tok = l.kw GROUP BY 1, 2),
best AS (SELECT doc_id, topic, n,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY n DESC, topic) AS rn
         FROM hits)
SELECT d.doc_id, coalesce(b.topic, '(none)') AS topic,
       coalesce(b.n, 0)::BIGINT AS n_hits
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
ORDER BY d.doc_id""",
        "stratified_sample_documents": r"""
WITH c AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
r AS (
  SELECT source, lang, doc_id,
         row_number() OVER (PARTITION BY source, lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents)
SELECT r.source, r.lang, r.doc_id
FROM r JOIN c ON r.source IS NOT DISTINCT FROM c.source
             AND r.lang IS NOT DISTINCT FROM c.lang
WHERE rn <= (c.n + 6) // 7
ORDER BY r.source, r.lang, r.doc_id""",
        "url_dedup_latest_documents": r"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 0
              THEN 'page-' || CAST(doc_id % 11 AS VARCHAR)
              ELSE (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'HTTPS://' END)
                   || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
                   || 'Site' || CAST(doc_id % 5 AS VARCHAR) || '.ORG'
                   || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                            WHEN doc_id % 4 = 1 THEN ':443'
                            WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
                   || '/p/' || CAST(doc_id % 3 AS VARCHAR) END AS url,
         1600000000 + ((doc_id * 7919) % 256) * 60 AS ts_s
  FROM documents),
parts AS (
  SELECT doc_id, ts_s, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS sch,
         lower(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS host,
         regexp_replace(url,
           '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*', '') AS rest
  FROM raw),
canon AS (
  SELECT doc_id, ts_s, url, sch,
         CASE WHEN sch = 'http'
              THEN regexp_replace(regexp_replace(host, '^www\.', ''), ':80$', '')
              WHEN sch = 'https'
              THEN regexp_replace(regexp_replace(host, '^www\.', ''), ':443$', '')
              ELSE regexp_replace(host, '^www\.', '') END AS host,
         regexp_replace(rest, '^/$', '') AS rest
  FROM parts),
n AS (
  SELECT doc_id, ts_s,
         CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.\-]*://')
              THEN sch || '://' || host || rest ELSE url END AS url_norm
  FROM canon),
r AS (
  SELECT url_norm, doc_id, ts_s,
         row_number() OVER (PARTITION BY url_norm
                            ORDER BY ts_s DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY url_norm) AS n_captures
  FROM n)
SELECT url_norm, doc_id, CAST(ts_s AS BIGINT) AS ts_s,
       CAST(n_captures AS BIGINT) AS n_captures
FROM r WHERE rn = 1 ORDER BY url_norm""",
        "host_cap_documents": r"""
WITH raw AS (
  SELECT doc_id, n_chars,
         CASE WHEN doc_id % 17 = 0 THEN 'page-' || CAST(doc_id AS VARCHAR)
              ELSE (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'HTTPS://' END)
                   || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
                   || 'Site' || CAST(doc_id % 13 AS VARCHAR) || '.ORG'
                   || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                            WHEN doc_id % 4 = 1 THEN ':443'
                            WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
                   || '/p/' || CAST(doc_id % 7 AS VARCHAR) END AS url
  FROM documents),
h AS (
  SELECT doc_id, n_chars,
         coalesce(nullif(regexp_replace(regexp_replace(lower(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)),
           '^www\.', ''), ':[0-9]*$', ''), ''), '(none)') AS host_key
  FROM raw),
r AS (
  SELECT host_key, doc_id, n_chars,
         row_number() OVER (PARTITION BY host_key
                            ORDER BY n_chars DESC, doc_id) AS host_rank
  FROM h)
SELECT host_key, doc_id, n_chars, host_rank
FROM r WHERE host_rank <= 3
ORDER BY host_key, host_rank""",
        "host_stats_documents": r"""
WITH raw AS (
  SELECT doc_id, n_chars,
         CASE WHEN doc_id % 17 = 0 THEN 'page-' || CAST(doc_id AS VARCHAR)
              ELSE (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'HTTPS://' END)
                   || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
                   || 'Site' || CAST(doc_id % 13 AS VARCHAR) || '.ORG'
                   || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                            WHEN doc_id % 4 = 1 THEN ':443'
                            WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
                   || '/p/' || CAST(doc_id % 7 AS VARCHAR) END AS url
  FROM documents),
h AS (
  SELECT doc_id, n_chars,
         nullif(regexp_replace(regexp_replace(lower(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)),
           '^www\.', ''), ':[0-9]*$', ''), '') AS host
  FROM raw)
SELECT coalesce(host, '(none)') AS host_key,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars
FROM h GROUP BY 1""",
        "blocklist_filter_documents": r"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 0 THEN 'page-' || CAST(doc_id AS VARCHAR)
              ELSE (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'HTTPS://' END)
                   || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
                   || 'Site' || CAST(doc_id % 13 AS VARCHAR) || '.ORG'
                   || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                            WHEN doc_id % 4 = 1 THEN ':443'
                            WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
                   || '/p/' || CAST(doc_id % 7 AS VARCHAR) END AS url
  FROM documents),
h AS (
  SELECT doc_id,
         nullif(regexp_replace(regexp_replace(lower(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)),
           '^www\.', ''), ':[0-9]*$', ''), '') AS host
  FROM raw)
SELECT doc_id, coalesce(host, '(none)') AS host_key
FROM h
WHERE host IS NULL OR host NOT IN ('site1.org', 'site5.org', 'site12.org')""",
        "mixture_repeat_documents": r"""
WITH par AS (
  SELECT doc_id, source,
         CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 5
                     WHEN 'src2' THEN 1 WHEN 'src3' THEN 0
                     ELSE 1 END AS p,
         CASE source WHEN 'src1' THEN 2 WHEN 'src2' THEN 2
                     ELSE 1 END AS q,
         ((strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) AS h16
  FROM documents),
n AS (
  SELECT doc_id, source,
         (p // q) + (CASE WHEN h16 * q < (p % q) * 65536
                          THEN 1 ELSE 0 END) AS n_copies
  FROM par)
SELECT doc_id, source,
       unnest(generate_series(0, n_copies - 1))::BIGINT AS copy
FROM n WHERE n_copies > 0""",
        "c4_line_filter_documents": r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
l AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks), 5)) AS pos
      FROM t),
l2 AS (SELECT doc_id, (pos - 1) // 5 AS ord,
              array_to_string(toks[pos:pos+4], ' ')
              || (CASE WHEN (doc_id + (pos - 1) // 5) % 7 = 0
                       THEN ' javascript' ELSE '' END)
              || (CASE (doc_id + (pos - 1) // 5) % 4
                       WHEN 0 THEN '.' WHEN 1 THEN '!'
                       WHEN 2 THEN '' ELSE '?' END) AS line
       FROM l),
k AS (SELECT doc_id, ord, line,
             CASE WHEN regexp_matches(line, '[.!?"]$')
                   AND len(regexp_extract_all(line, '\S+')) >= 3
                   AND NOT regexp_matches(line,
                         '(?i)javascript|lorem ipsum|\{')
             THEN 1 ELSE 0 END AS keep
      FROM l2),
agg AS (SELECT doc_id,
               count(*)::BIGINT AS n_lines,
               sum(keep)::BIGINT AS n_kept,
               string_agg(line, chr(10) ORDER BY ord)
                 FILTER (WHERE keep = 1) AS clean_text
        FROM k GROUP BY doc_id)
SELECT doc_id, clean_text, n_lines, n_kept
FROM agg WHERE n_kept >= 2""",
        "shuffle_shards_documents": """
WITH r AS (
  SELECT doc_id,
         (row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)))
          - 1)::BIGINT AS rk
  FROM documents)
SELECT doc_id, rk // 200 AS shard, rk % 200 AS pos FROM r""",
        "lm_score_documents": r"""
WITH rt AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
  FROM documents WHERE source = 'src0' AND trim(text) <> ''),
r2 AS (SELECT doc_id, pos, tok,
              lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
              lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
       FROM rt),
c1 AS (SELECT tok, count(*)::BIGINT AS c FROM rt GROUP BY 1),
t1 AS (SELECT count(*)::BIGINT AS t FROM rt),
c2 AS (SELECT p1 || ' ' || tok AS g, count(*)::BIGINT AS c
       FROM r2 WHERE p1 IS NOT NULL GROUP BY 1),
c3 AS (SELECT p2 || ' ' || p1 || ' ' || tok AS g, count(*)::BIGINT AS c
       FROM r2 WHERE p2 IS NOT NULL GROUP BY 1),
dt0 AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\s+')) AS tok,
         generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
  FROM documents WHERE trim(text) <> ''),
dt AS (SELECT doc_id, pos, tok,
              lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
              lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
       FROM dt0),
sc AS (
  SELECT dt.doc_id,
    CASE
      WHEN dt.p2 IS NOT NULL THEN
        CASE WHEN coalesce(g3.c, 0) > 0 THEN g3.c * 1000000 // gx.c
             WHEN coalesce(g2.c, 0) > 0 THEN 2 * g2.c * 1000000 // (5 * cp.c)
             WHEN coalesce(ct.c, 0) > 0 THEN 4 * ct.c * 1000000 // (25 * t1.t)
             ELSE 0 END
      WHEN dt.p1 IS NOT NULL THEN
        CASE WHEN coalesce(g2.c, 0) > 0 THEN g2.c * 1000000 // cp.c
             WHEN coalesce(ct.c, 0) > 0 THEN 2 * ct.c * 1000000 // (5 * t1.t)
             ELSE 0 END
      ELSE CASE WHEN coalesce(ct.c, 0) > 0 THEN ct.c * 1000000 // t1.t
                ELSE 0 END
    END AS s
  FROM dt
  LEFT JOIN c3 g3 ON g3.g = dt.p2 || ' ' || dt.p1 || ' ' || dt.tok
  LEFT JOIN c2 gx ON gx.g = dt.p2 || ' ' || dt.p1
  LEFT JOIN c2 g2 ON g2.g = dt.p1 || ' ' || dt.tok
  LEFT JOIN c1 cp ON cp.tok = dt.p1
  LEFT JOIN c1 ct ON ct.tok = dt.tok
  CROSS JOIN t1),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_tok,
               sum(s)::BIGINT AS lm_score
        FROM sc GROUP BY 1)
SELECT d.doc_id, coalesce(a.n_tok, 0)::BIGINT AS n_tok,
       coalesce(a.lm_score, 0)::BIGINT AS lm_score
FROM documents d LEFT JOIN agg a USING (doc_id)""",
        "image_roundtrip_documents": """
SELECT doc_id,
       (8 + doc_id % 5)::BIGINT AS height,
       (8 + (doc_id % 3) * 2)::BIGINT AS width,
       3::BIGINT AS channels,
       (doc_id % 254 + 1)::BIGINT AS mean_r,
       ((doc_id * 3) % 254 + 1)::BIGINT AS mean_g,
       ((doc_id * 7) % 254 + 1)::BIGINT AS mean_b,
       1000::BIGINT AS std_x1000
FROM documents""",
        "kmeans_embeddings": _KMEANS_CTE + """
SELECT vec_id, cid AS cluster FROM a3""",
        "semdedup_embeddings": _KMEANS_CTE + """
SELECT a3.vec_id, a3.cid AS cluster,
       CASE WHEN EXISTS (
         SELECT 1 FROM a3 b JOIN e eb ON eb.vec_id = b.vec_id
         WHERE b.cid = a3.cid AND b.vec_id < a3.vec_id
           AND list_cosine_similarity(ea.v, eb.v) >= 0.45)
       THEN 0 ELSE 1 END AS keep
FROM a3 JOIN e ea ON ea.vec_id = a3.vec_id""",
        "chunk_documents": r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE trim(text) <> ''),
p AS (SELECT doc_id, toks,
             unnest(generate_series(1, len(toks), 32)) AS pos FROM t)
SELECT doc_id,
       (pos - 1) // 32 AS chunk_ord,
       least(32, len(toks) - pos + 1) AS n_tok,
       array_to_string(toks[pos:pos+31], ' ') AS chunk_text
FROM p""",
        "corpus_report_documents": r"""
WITH q AS (
  SELECT doc_id,
    (CASE WHEN trim(text) = '' THEN 0
          ELSE len(string_split_regex(trim(text), '\s+')) END)::DOUBLE AS tc,
    greatest(strlen(text), 1)::DOUBLE AS slen,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS na,
    length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS nd,
    length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))::DOUBLE AS npn
  FROM documents),
qe AS (
  SELECT doc_id, CAST(ROUND((
    0.25 * (least(tc / 100.0, 1.0) * (CASE WHEN tc >= 5 THEN 1.0 ELSE 0.0 END))
  + 0.35 * least((na / slen) / 0.7, 1.0)
  + 0.2 * greatest(1.0 - 2.0 * (npn / slen), 0.0)
  + 0.2 * greatest(1.0 - 2.0 * (nd / slen), 0.0)) * 1000000) AS BIGINT) AS q_e6,
  CAST(tc AS BIGINT) AS n_tok
  FROM q),
ls AS (
  SELECT doc_id,
    greatest(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END, 1)::DOUBLE AS nt,
    len(regexp_extract_all(lower(text),
        '\b(the|and|of|to|in|is|that|for|with|was|are)\b'))::DOUBLE AS c_en,
    len(regexp_extract_all(lower(text),
        '\b(der|die|das|und|ist|nicht|mit|ein|eine|von|zu)\b'))::DOUBLE AS c_de,
    len(regexp_extract_all(lower(text),
        '\b(le|la|les|et|est|une|des|dans|pour|que|pas)\b'))::DOUBLE AS c_fr,
    len(regexp_extract_all(lower(text),
        '\b(el|la|los|las|es|una|del|para|con|por|que)\b'))::DOUBLE AS c_es,
    len(regexp_extract_all(lower(text), '[一-鿿]'))::DOUBLE AS c_cjk,
    greatest(length(text), 1)::DOUBLE AS nc
  FROM documents),
lsc AS (
  SELECT doc_id, c_en/nt AS s_en, c_de/nt AS s_de, c_fr/nt AS s_fr,
         c_es/nt AS s_es, c_cjk/nc AS s_cjk
  FROM ls),
pl AS (
  SELECT doc_id,
  CASE WHEN s_cjk > 0.2 THEN 'zh'
       WHEN greatest(s_en, s_de, s_fr, s_es) > 0.01 THEN
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              WHEN s_fr >= s_es THEN 'fr'
              ELSE 'es' END
       ELSE 'xx' END AS pred_lang
  FROM lsc)
SELECT d.source, d.lang,
       count(*) AS n_docs,
       sum(qe.n_tok) AS sum_tokens,
       min(qe.n_tok) AS min_tokens,
       max(qe.n_tok) AS max_tokens,
       sum(d.n_chars) AS sum_chars,
       sum(CASE WHEN qe.q_e6 >= 500000 THEN 1 ELSE 0 END) AS n_quality_hi,
       sum(CASE WHEN pl.pred_lang = d.lang THEN 1 ELSE 0 END) AS n_lang_match
FROM documents d JOIN qe USING (doc_id) JOIN pl USING (doc_id)
GROUP BY d.source, d.lang""",
        "oov_gram_rate_documents": r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
sh AS (SELECT doc_id,
              list_distinct(list_transform(
                generate_series(1, greatest(len(toks) - 2, 0)),
                i -> array_to_string(toks[i:i+2], ' '))) AS s
       FROM t),
rf AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 17 = 0),
tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 17 <> 0)
SELECT tr.doc_id, count(*) AS n_grams, count(*) - count(rf.g) AS n_oov
FROM tr LEFT JOIN rf USING (g)
GROUP BY tr.doc_id""",
        "bloom_incremental_new_documents": """
SELECT d.doc_id
FROM documents d
WHERE NOT EXISTS (
    SELECT 1 FROM documents s
    WHERE s.doc_id % 3 <> 0 AND s.text = d.text)""",
        "pii_redaction_documents": r"""
WITH inj AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN text
              ELSE text || ' u' || CAST(doc_id AS VARCHAR)
                   || '@ex' || CAST(doc_id % 5 AS VARCHAR)
                   || '.com 10.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.0.1 call 555-123-'
                   || substr(CAST(doc_id % 10000 + 10000 AS VARCHAR), 2)
                   || ' ssn 321-54-'
                   || substr(CAST(doc_id % 7000 + 10000 AS VARCHAR), 2)
         END AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
         '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
         '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS red_text,
       len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
       len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
       len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
       len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone
FROM inj""",
        "quota_sample_documents": """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= 10""",
        "ivf_topk_embeddings": """
SELECT vec_id,
       CAST(ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
              WHERE vec_id = 0)) * 10000) AS BIGINT) AS sim_e4
FROM embeddings
ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
          WHERE vec_id = 0)) DESC, vec_id
LIMIT 10""",
    }
    out["snapshot_diff_documents"] = """
WITH a AS (SELECT doc_id AS key, md5(text) AS h, lang
           FROM documents WHERE doc_id % 3 <> 0),
b AS (SELECT doc_id AS key,
             md5(text || CASE WHEN doc_id % 7 = 0 THEN '#v2' ELSE '' END)
               AS h,
             lang
      FROM documents WHERE doc_id % 5 <> 2),
j AS (SELECT CASE WHEN a.key IS NULL THEN 'added'
                  WHEN b.key IS NULL THEN 'removed'
                  WHEN a.h = b.h THEN 'unchanged'
                  ELSE 'changed' END AS status,
             coalesce(b.lang, a.lang) AS lang
      FROM a FULL OUTER JOIN b ON a.key = b.key)
SELECT status, lang, count(*)::BIGINT AS n FROM j GROUP BY 1, 2"""
    out["winnow_fingerprints_documents"] = r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE trim(text) <> ''),
g AS (SELECT doc_id, i, md5(array_to_string(toks[i:i+2], ' ')) AS h
      FROM t, unnest(generate_series(1, len(toks) - 2)) s(i)),
n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
ws AS (SELECT doc_id, unnest(generate_series(1, greatest(ng - 3, 1))) AS w0
       FROM n),
wmin AS (SELECT ws.doc_id, ws.w0, min(gg.h) AS mh
         FROM ws JOIN g gg ON gg.doc_id = ws.doc_id
              AND gg.i BETWEEN ws.w0 AND ws.w0 + 3
         GROUP BY 1, 2),
sel AS (SELECT w.doc_id, max(gg.i) AS pos, w.mh AS fp
        FROM wmin w JOIN g gg ON gg.doc_id = w.doc_id
             AND gg.i BETWEEN w.w0 AND w.w0 + 3 AND gg.h = w.mh
        GROUP BY w.doc_id, w.w0, w.mh)
SELECT DISTINCT doc_id, pos, fp FROM sel"""
    out["editdist_pairs_documents"] = r"""
WITH t AS (SELECT doc_id, lang, text,
                  string_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE trim(text) <> ''),
f AS (SELECT doc_id, lang, text,
             min(md5(array_to_string(toks[i:i+2], ' '))) AS fp
      FROM t, unnest(generate_series(1, len(toks) - 2)) s(i)
      GROUP BY 1, 2, 3)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.text, b.text)::BIGINT AS dist
FROM f a JOIN f b
  ON a.lang = b.lang AND a.fp = b.fp AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= 24"""
    out["bpe_learn_documents"] = _bpe_learn_sql(3)
    out["bpe_encode_documents"] = _bpe_encode_sql(3)
    out["fertility_stats_documents"] = _fertility_sql(3)
    out["robots_filter_documents"] = r"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 0 THEN 'page-' || CAST(doc_id AS VARCHAR)
              ELSE (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'HTTPS://' END)
                   || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
                   || 'Site' || CAST(doc_id % 13 AS VARCHAR) || '.ORG'
                   || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                            WHEN doc_id % 4 = 1 THEN ':443'
                            WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
                   || '/p/' || CAST(doc_id % 7 AS VARCHAR) END AS url
  FROM documents),
hp AS (
  SELECT doc_id, url,
         nullif(regexp_replace(regexp_replace(lower(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)),
           '^www\.', ''), ':[0-9]*$', ''), '') AS host,
         CASE WHEN regexp_extract(url,
                '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(.*)$', 1) = ''
              THEN '/'
              ELSE regexp_extract(url,
                '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(.*)$', 1) END AS path
  FROM raw)
SELECT doc_id, url FROM hp
WHERE host IS NULL OR NOT (
  (host = 'site1.org' AND path LIKE '/p/1%') OR
  (host = 'site4.org' AND path LIKE '/p/%') OR
  (host = 'site7.org' AND path LIKE '/p/3%'))"""
    out["politeness_manifest_documents"] = r"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 0 THEN 'page-' || CAST(doc_id AS VARCHAR)
              ELSE (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'HTTPS://' END)
                   || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
                   || 'Site' || CAST(doc_id % 13 AS VARCHAR) || '.ORG'
                   || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                            WHEN doc_id % 4 = 1 THEN ':443'
                            WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
                   || '/p/' || CAST(doc_id % 7 AS VARCHAR) END AS url
  FROM documents),
h AS (
  SELECT doc_id,
         coalesce(nullif(regexp_replace(regexp_replace(lower(
           regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)),
           '^www\.', ''), ':[0-9]*$', ''), ''), '(none)') AS host_key,
         md5(CAST(doc_id AS VARCHAR)) AS hx
  FROM raw),
s AS (SELECT doc_id, host_key, hx,
             row_number() OVER (PARTITION BY host_key ORDER BY hx) - 1
               AS seq
      FROM h)
SELECT doc_id, host_key, seq,
       row_number() OVER (ORDER BY seq, host_key, hx) - 1 AS slot
FROM s"""
    out["media_decode"] = """
WITH ids AS (SELECT unnest(generate_series(0, 127)) AS media_id),
k AS (SELECT media_id,
             CASE WHEN media_id % 4 IN (0, 1) THEN 'image'
                  WHEN media_id % 4 = 2 THEN 'audio'
                  ELSE 'video' END AS kind
      FROM ids)
SELECT media_id, kind,
       (CASE WHEN kind = 'image' THEN 1 ELSE 0 END)::BIGINT AS decode_ok,
       (CASE WHEN kind = 'image' THEN 8 + media_id % 5
             ELSE -1 END)::BIGINT AS height,
       (CASE WHEN kind = 'image' THEN 8 + (media_id % 3) * 2
             ELSE -1 END)::BIGINT AS width,
       (CASE WHEN kind = 'image' THEN 3 ELSE -1 END)::BIGINT AS channels,
       (CASE WHEN kind = 'image' THEN media_id % 254 + 1
             ELSE -1 END)::BIGINT AS mean_r,
       (CASE WHEN kind = 'image' THEN (media_id * 3) % 254 + 1
             ELSE -1 END)::BIGINT AS mean_g,
       (CASE WHEN kind = 'image' THEN (media_id * 7) % 254 + 1
             ELSE -1 END)::BIGINT AS mean_b
FROM k"""
    out["vocab_growth_documents"] = r"""
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
w AS (SELECT tok AS word, min(doc_id) AS min_id
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(text, '\s+')) AS tok
            FROM documents)
      WHERE length(tok) >= 1 GROUP BY 1),
c AS (SELECT DISTINCT (j + 1) * (m + 1) // 10 - 1 AS cutoff
      FROM mx, unnest(generate_series(0, 9)) t(j))
SELECT c.cutoff, count(w.word)::BIGINT AS vocab
FROM c LEFT JOIN w ON w.min_id <= c.cutoff
GROUP BY 1"""
    # near-dup retention: editdist pairs + recursive-CTE min-label
    # components (cluster = min id) + quality argmax per cluster
    out["neardup_keep_best_documents"] = f"""
WITH RECURSIVE
p AS ({out["editdist_pairs_documents"]}),
e AS (SELECT id_a AS a, id_b AS b FROM p
      UNION SELECT id_b, id_a FROM p),
nn AS (SELECT DISTINCT a AS node FROM e),
cc(node, lbl) AS (
  SELECT node, node FROM nn
  UNION
  SELECT e.a, cc.lbl FROM e JOIN cc ON cc.node = e.b
),
comp AS (SELECT node AS doc_id, min(lbl) AS cluster FROM cc GROUP BY 1),
qs AS ({out["quality_scores_documents"]}),
w AS (SELECT c.cluster, c.doc_id, q.quality_e6,
             row_number() OVER (PARTITION BY c.cluster
                                ORDER BY q.quality_e6 DESC, c.doc_id) AS rn,
             count(*) OVER (PARTITION BY c.cluster) AS n_members
      FROM comp c JOIN qs q USING (doc_id))
SELECT cluster, doc_id AS kept_doc_id, n_members FROM w WHERE rn = 1"""
    out["dedup_cluster_sizes_documents"] = f"""
WITH RECURSIVE
p AS ({out["editdist_pairs_documents"]}),
e AS (SELECT id_a AS a, id_b AS b FROM p
      UNION SELECT id_b, id_a FROM p),
nn AS (SELECT DISTINCT a AS node FROM e),
cc(node, lbl) AS (
  SELECT node, node FROM nn
  UNION
  SELECT e.a, cc.lbl FROM e JOIN cc ON cc.node = e.b
),
comp AS (SELECT node AS doc_id, min(lbl) AS cluster FROM cc GROUP BY 1),
sz AS (SELECT cluster, count(*)::BIGINT AS n_members FROM comp GROUP BY 1)
SELECT n_members, count(*)::BIGINT AS n_clusters
FROM sz GROUP BY 1 ORDER BY 1"""
    # ---- composed oracles (built on sibling entries verbatim, so a
    # fix to the base SQL propagates) ----
    # CCNet head/middle/tail: per-lang tertile thresholds at 1-based
    # ranks ceil(n/3) / ceil(2n/3) of the sorted exact-integer LM
    # scores (quantile_disc semantics spelled out as integer rank
    # arithmetic — no float quantile fractions anywhere).
    out["ccnet_buckets_documents"] = f"""
WITH scores AS (SELECT * FROM ({out["lm_score_documents"]})),
st AS (SELECT s.doc_id, d.lang, s.n_tok, s.lm_score
       FROM scores s JOIN documents d USING (doc_id)),
ranked AS (SELECT lang, lm_score,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY lm_score) AS rn,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM st),
th AS (SELECT lang,
              max(CASE WHEN rn = (n + 2) // 3 THEN lm_score END) AS t1,
              max(CASE WHEN rn = (2 * n + 2) // 3 THEN lm_score END) AS t2
       FROM ranked GROUP BY lang)
SELECT st.doc_id, st.lang, st.n_tok, st.lm_score,
       CASE WHEN st.lm_score <= th.t1 THEN 'tail'
            WHEN st.lm_score <= th.t2 THEN 'middle'
            ELSE 'head' END AS bucket
FROM st JOIN th USING (lang)"""
    return out
