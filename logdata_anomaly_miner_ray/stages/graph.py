"""Link-graph operators over a web corpus: edge extraction from HTML
anchors and distributed PageRank in exact integer fixed-point.

A crawl-scale corpus pipeline needs the link graph twice: as a
quality / centrality signal for curation (PageRank-weighted sampling)
and as the seed structure for crawl frontier analysis. Both recast
Ray-Data-first here:

- ``link_edges``: documents → (src, dst, outdeg) in ONE stateless
  zero-copy pass (build the deterministic link page, extract anchors
  with the vectorized RE2 chain in functions/html.py, keep internal
  ``/doc/<id>`` targets, count outdeg per src block-locally — a doc's
  links live wholly in its block, so NO shuffle).

- ``pagerank``: damped PageRank, but over **int64 fixed-point mass**
  instead of floats: total mass ``S = 10^12`` units, ``r0 = S // n``
  per node, and each iteration computes

      contribution(s) = r(s) // outdeg(s)
      r'(d) = (15 * (S // n)) // 100 + (85 * sum_in(d)) // 100

  entirely in integer arithmetic. Integer sums are associative and
  commutative with NO rounding, so the result is bit-identical
  regardless of partitioning, summation order, or cluster size — the
  same reproducibility discipline the engine applies to every
  oracle-checked float (CLAUDE.md: scaled BIGINTs), applied to an
  iterative algorithm. A SQL oracle unrolls the same recurrence
  (DuckDB ``//`` floor-division) and matches exactly. The iteration
  converges to the float PageRank within ~1e-10 relative mass (the
  truncation loses < 1 unit per node per step out of ~10^12/n).

  Two execution tiers per iteration:

  - broadcast (n ≤ ``max_broadcast_nodes``): the rank vector ships
    once via ``ray.put`` (int64, 8 bytes/node); each edge block
    bincounts its contributions into a sparse (node, inm) partial and
    the driver folds partials into the next dense vector. One
    shuffle-free pass per iteration; driver memory O(n). At 8 bytes a
    node this tier holds to ~10^8 nodes on a 16 GB driver.
  - scale (unbounded n): ranks stay a Dataset. Contributions attach
    to edges via union + ONE coarse-keyed (hash(src) mod P)
    groupby-merge — NOT ``Dataset.join``, which deadlocks when
    ``num_partitions`` exceeds cluster CPUs and crashes on the
    zero-column empty blocks hash-shuffle groupbys emit (CLAUDE.md) —
    then per-block partial sums per dst fold under a second coarse
    groupby, and missing nodes take the teleport-only value via a
    union with the node list. Two bounded shuffles per iteration of
    NARROW int64 rows; raw pages never enter the loop.

Node ids are assumed dense 0..n-1 (the corpus doc_id contract;
asserted in the broadcast tier). Dangling nodes (outdeg 0) simply
contribute nothing — their mass leaks, which the fixed teleport term
replenishes; the deterministic link builder gives every node
outdeg ≥ 1 so the oracle never exercises leakage.

Reference anchors (behavioral): the reference engine's learn-then
-score lifecycle over per-path value graphs is
aminer/analysis/EventCorrelationDetector.py (hypothesis graph edges
with support counts); here the graph is the hyperlink graph and the
iterated score is PageRank mass.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._shuffle import shuffle_parallelism

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

__all__ = ["link_edges", "pagerank", "PAGERANK_SCALE"]

# total fixed-point mass: 10^12 units keep 85*inm < 2^63 with
# room (85 * 10^12 ≈ 2^46.3) while giving ~10^12/n units per node
PAGERANK_SCALE = 10**12


def link_edges(
    ds: "ray.data.Dataset", n_docs: int, *, id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(src, dst, outdeg) from the deterministic link pages: build →
    extract → keep internal ``/doc/<id>`` anchors → per-src outdeg
    (block-local; a doc's anchors never cross blocks). One zero-copy
    pass, no shuffle."""
    from ..functions.html import build_link_page_html, extract_links_table

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        html = build_link_page_html(ids, n_docs)
        links = extract_links_table(ids, html)
        internal = links.filter(pc.starts_with(links["href"], "/doc/"))
        src = internal["doc_id"].to_numpy(zero_copy_only=False)
        dst = pc.cast(
            pc.utf8_slice_codeunits(internal["href"], 5, 2**31),
            pa.int64()).to_numpy(zero_copy_only=False)
        # outdeg per src: srcs are contiguous in extraction order
        if len(src):
            uniq, counts = np.unique(src, return_counts=True)
            deg = np.repeat(counts, counts).astype(np.int64)
        else:
            deg = np.array([], dtype=np.int64)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "outdeg": pa.array(deg, pa.int64()),
        })

    return ds.map_batches(
        edges, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def _teleport(n_nodes: int, total: int) -> int:
    return (15 * (total // n_nodes)) // 100


def pagerank(
    edges: "ray.data.Dataset", n_nodes: int, *, iters: int = 3,
    total: int = PAGERANK_SCALE, max_broadcast_nodes: int = 50_000_000,
) -> "ray.data.Dataset":
    """Damped PageRank in exact int64 fixed-point → (node, rank_fp)
    with ``sum(rank_fp) ≤ total``; see module docstring for the
    recurrence, reproducibility argument, and the two tiers."""
    import ray
    import ray.data as rd

    edges = edges.materialize()
    if n_nodes <= max_broadcast_nodes:
        r = np.full(n_nodes, total // n_nodes, dtype=np.int64)
        tele = np.int64(_teleport(n_nodes, total))
        for _ in range(iters):
            ref = ray.put(r)

            def partial(batch: pa.Table, _ref=ref) -> pa.Table:
                rv = ray.get(_ref)
                src = batch["src"].to_numpy(zero_copy_only=False)
                dst = batch["dst"].to_numpy(zero_copy_only=False)
                deg = batch["outdeg"].to_numpy(zero_copy_only=False)
                contrib = rv[src] // deg
                # sparse per-block partial: only touched nodes ship
                nodes, inv = np.unique(dst, return_inverse=True)
                inm = np.zeros(len(nodes), dtype=np.int64)
                np.add.at(inm, inv, contrib)
                return pa.table({
                    "node": pa.array(nodes, pa.int64()),
                    "inm": pa.array(inm, pa.int64()),
                })

            # materialize BEFORE iterating: iter_batches on an
            # unmaterialized pipeline paces execution at driver pull
            # speed (measured 35 s vs 0.7 s for this very pass —
            # CLAUDE.md); materialize runs it cluster-parallel and
            # the driver then drains finished blocks zero-copy
            nds, vals = [], []
            for b in edges.map_batches(
                partial, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True,
            ).materialize().iter_batches(
                batch_format="pyarrow", batch_size=None
            ):
                nds.append(b["node"].to_numpy(zero_copy_only=False))
                vals.append(b["inm"].to_numpy(zero_copy_only=False))
            # ONE weighted bincount folds every sparse partial:
            # float64 sums of int64 values are exact here (total mass
            # ≤ 10^12 < 2^53), and bincount is ~100× np.add.at
            if nds:
                inm = np.bincount(
                    np.concatenate(nds),
                    weights=np.concatenate(vals).astype(np.float64),
                    minlength=n_nodes,
                ).astype(np.int64)
            else:
                inm = np.zeros(n_nodes, dtype=np.int64)
            r = tele + (85 * inm) // 100
        return rd.from_arrow(pa.table({
            "node": pa.array(np.arange(n_nodes, dtype=np.int64), pa.int64()),
            "rank_fp": pa.array(r, pa.int64()),
        }))

    # ---- scale tier: ranks stay a Dataset; 2 coarse shuffles/iter ----
    import pandas as pd

    P = shuffle_parallelism()
    tele = _teleport(n_nodes, total)
    nodes_ds = edges.map_batches(
        lambda t: pa.table({"node": pc.unique(t["src"])}),
        batch_format="pyarrow", batch_size=None,
    )  # src side only seeds ranks; missing-in targets fill via union

    def _ck_of(arr_np: np.ndarray) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.Series(arr_np), index=False).to_numpy()
        return pa.array((h % np.uint64(P)).astype(np.int64))

    ranks = None  # None ⇒ uniform r0, avoids materializing it

    def tag_edges(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        n = len(src)
        return pa.table({
            "ck": _ck_of(src),
            "is_rank": pa.array(np.zeros(n, dtype=np.bool_)),
            "src": batch["src"],
            "dst": batch["dst"],
            "outdeg": batch["outdeg"],
            "r": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
        })

    edges_tagged = edges.map_batches(
        tag_edges, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).materialize()

    for it in range(iters):
        if ranks is None:
            r0 = np.int64(total // n_nodes)

            def contrib_direct(batch: pa.Table) -> pa.Table:
                deg = batch["outdeg"].to_numpy(zero_copy_only=False)
                dst = batch["dst"].to_numpy(zero_copy_only=False)
                c = r0 // deg
                nodes, inv = np.unique(dst, return_inverse=True)
                inm = np.zeros(len(nodes), dtype=np.int64)
                np.add.at(inm, inv, c)
                return pa.table({
                    "node": pa.array(nodes, pa.int64()),
                    "inm": pa.array(inm, pa.int64()),
                })

            contribs = edges.map_batches(
                contrib_direct, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True)
        else:
            def tag_ranks(batch: pa.Table) -> pa.Table:
                nd = batch["node"].to_numpy(zero_copy_only=False)
                n = len(nd)
                return pa.table({
                    "ck": _ck_of(nd),
                    "is_rank": pa.array(np.ones(n, dtype=np.bool_)),
                    "src": batch["node"],
                    "dst": pa.array(np.full(n, -1, dtype=np.int64),
                                    pa.int64()),
                    "outdeg": pa.array(np.ones(n, dtype=np.int64),
                                       pa.int64()),
                    "r": batch["rank_fp"],
                })

            rt = ranks.map_batches(
                tag_ranks, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True)

            def attach(g: pd.DataFrame) -> pa.Table:
                side = g[g["is_rank"]]
                e = g[~g["is_rank"]]
                m = e[["src", "dst", "outdeg"]].merge(
                    side[["src", "r"]], on="src", how="inner")
                if not len(m):
                    return pa.table({
                        "node": pa.array([], pa.int64()),
                        "inm": pa.array([], pa.int64())})
                c = m["r"].to_numpy(np.int64) // m["outdeg"].to_numpy(
                    np.int64)
                dst = m["dst"].to_numpy(np.int64)
                nodes, inv = np.unique(dst, return_inverse=True)
                inm = np.zeros(len(nodes), dtype=np.int64)
                np.add.at(inm, inv, c)
                return pa.table({
                    "node": pa.array(nodes, pa.int64()),
                    "inm": pa.array(inm, pa.int64()),
                })

            contribs = edges_tagged.union(rt).groupby("ck").map_groups(
                attach, batch_format="pandas")

        # fold partials per node + teleport fill: union with the node
        # list (inm 0) so teleport-only nodes appear, ONE coarse
        # groupby sums and applies the recurrence
        base = nodes_ds.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "inm": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64), pa.int64()),
            }),
            batch_format="pyarrow", batch_size=None)

        def add_nk(batch: pa.Table) -> pa.Table:
            nd = batch["node"].to_numpy(zero_copy_only=False)
            return batch.append_column("nk", _ck_of(nd))

        def fold(g: pd.DataFrame) -> pa.Table:
            s = g.groupby("node", sort=False)["inm"].sum()
            nd = s.index.to_numpy(np.int64)
            rk = tele + (85 * s.to_numpy(np.int64)) // 100
            return pa.table({
                "node": pa.array(nd, pa.int64()),
                "rank_fp": pa.array(rk, pa.int64()),
            })

        ranks = (
            contribs.union(base)
            .map_batches(add_nk, batch_format="pyarrow", batch_size=None)
            .groupby("nk")
            .map_groups(lambda g: fold(g.drop(columns="nk")),
                        batch_format="pandas")
            .materialize()
        )
    return ranks


def indegree_histogram(
    edges: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Degree-distribution QA for the link graph: (indegree,
    n_nodes) — how many nodes have each in-link count. The standard
    power-law sanity check on a crawl graph, and a two-level
    aggregation exercise: per-block sparse (dst, cnt) partials →
    one narrow coarse-keyed groupby summing per node → per-block
    (indegree, n) partials → one tiny groupby. Nodes with zero
    in-links are NOT emitted (they are invisible to the edge list);
    callers that need them subtract sum(n_nodes) from the node count.
    """
    import pandas as pd

    from ._agg import coarse_grouped

    def partial(batch: pa.Table) -> pa.Table:
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        nodes, cnt = np.unique(dst, return_counts=True)
        return pa.table({
            "node": pa.array(nodes, pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    partials = edges.map_batches(
        partial, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)

    def per_node(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("node", sort=False)["cnt"].sum()
        deg, n = np.unique(s.to_numpy(np.int64), return_counts=True)
        return pa.table({
            "indegree": pa.array(deg, pa.int64()),
            "n_part": pa.array(n.astype(np.int64), pa.int64()),
        })

    per_bucket = coarse_grouped(partials, ["node"], per_node)

    def hist_fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("indegree", sort=False)["n_part"].sum()
        return pd.DataFrame({
            "indegree": s.index.to_numpy(np.int64),
            "n_nodes": s.to_numpy(np.int64),
        })

    return coarse_grouped(per_bucket, ["indegree"], hist_fold, n_buckets=32)


def anchor_text_topk(
    ds: "ray.data.Dataset",
    href_col: str = "href",
    anchor_col: str = "anchor",
    k: int = 2,
    n_buckets: int = 256,
):
    """Per link TARGET, the top-k anchor texts by occurrence count —
    the classic web-graph relevance signal (anchor text describes the
    target better than the target's own page; used for retrieval
    training data and link-spam QA since Brin & Page 1998 §2.2 /
    Craswell et al. 2001). Ordering: count DESC, anchor ASC
    (bytewise, = SQL ``row_number() OVER (PARTITION BY href ORDER BY
    n DESC, anchor)``), output sorted (href, rnk).

    Scale shape: per-block Arrow group_by folds each block to narrow
    (href, anchor, n) partial rows — anchor texts are short by
    construction; raw pages never shuffle. ONE coarse-bucket shuffle
    on the href key, then each bucket merges counts and ranks
    per-href inside pandas (the coarse_grouped idiom — never
    per-href map_groups). Returns a Dataset of
    (href, anchor, n_anchor, rnk) rows, ≤ k per target."""
    import pandas as pd

    from ._agg import coarse_grouped

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "href": pc.fill_null(
                pc.cast(batch[href_col], pa.string()), ""),
            "anchor": pc.fill_null(
                pc.cast(batch[anchor_col], pa.string()), ""),
        })
        g = t.group_by(["href", "anchor"]).aggregate([([], "count_all")])
        return g.rename_columns(["href", "anchor", "n"])

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = (g.groupby(["href", "anchor"], sort=False, as_index=False)
             ["n"].sum())
        t = t.sort_values(["href", "n", "anchor"],
                          ascending=[True, False, True], kind="mergesort")
        t["rnk"] = t.groupby("href", sort=False).cumcount() + 1
        t = t[t["rnk"] <= k].rename(columns={"n": "n_anchor"})
        t["n_anchor"] = t["n_anchor"].astype(np.int64)
        t["rnk"] = t["rnk"].astype(np.int64)
        return t

    return coarse_grouped(parts, ["href"], per_bucket, n_buckets=n_buckets)


def hits_scores(
    edges: "ray.data.Dataset", n_nodes: int, *, iters: int = 2,
    total: int = PAGERANK_SCALE, max_broadcast_nodes: int = 50_000_000,
) -> "ray.data.Dataset":
    """HITS hubs & authorities (Kleinberg 1999) in exact int64
    fixed-point → (node, auth_fp, hub_fp). Each iteration is the
    textbook pair of pushes — a ← Aᵀh then h ← A·a (the NEW a) —
    with the L1 renormalization recast exactly: after each push the
    raw vector floor-rescales by ``q = max(Σraw // total, 1)``
    (elementwise ``raw // q``), so the mass stays ~``total`` units
    and EVERY value is integer arithmetic. Integer sums are
    order-independent ⇒ results are bit-identical at any
    partitioning/cluster size, and a SQL oracle unrolls the same
    recurrence with DuckDB ``//`` + scalar-subquery totals (the
    pagerank reproducibility discipline, see module docstring).

    Envelope: per-node raw mass is bounded by the TOTAL vector mass
    ≤ 2·total ≈ 2^41 (each push sums a subset of the pushed vector),
    so the float64-weighted bincount folds are exact (< 2^53); the
    driver total is Python-int. Asserted each fold.

    Tiers per push (same shapes as :func:`pagerank`): broadcast
    (vector via ``ray.put``, sparse per-block bincount partials, one
    shuffle-free pass) for n ≤ ``max_broadcast_nodes``; scale tier
    (vector stays a Dataset, union + coarse-keyed groupby attach,
    then a coarse per-node sum — 2 narrow shuffles per push, raw
    pages never enter the loop)."""
    import ray
    import ray.data as rd

    edges = edges.materialize()
    if n_nodes <= max_broadcast_nodes:
        def push(vec: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
            ref = ray.put(vec)

            def partial(batch: pa.Table, _ref=ref) -> pa.Table:
                v = ray.get(_ref)
                f = batch[from_col].to_numpy(zero_copy_only=False)
                t = batch[to_col].to_numpy(zero_copy_only=False)
                nodes, inv = np.unique(t, return_inverse=True)
                m = np.zeros(len(nodes), dtype=np.int64)
                np.add.at(m, inv, v[f])
                return pa.table({
                    "node": pa.array(nodes, pa.int64()),
                    "m": pa.array(m, pa.int64()),
                })

            # collect all sparse partials, then ONE weighted bincount
            # (pagerank's fold shape — an n_nodes-wide bincount per
            # BLOCK was 128× the work at 50M nodes and dominated the
            # 50M drill). Exact: per-node sums ≤ 2·total ≪ 2^53.
            nds, vals = [], []
            for b in edges.map_batches(
                partial, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True,
            ).materialize().iter_batches(
                batch_format="pyarrow", batch_size=None
            ):
                nds.append(b["node"].to_numpy(zero_copy_only=False))
                vals.append(b["m"].to_numpy(zero_copy_only=False))
            if nds:
                raw = np.bincount(
                    np.concatenate(nds),
                    weights=np.concatenate(vals).astype(np.float64),
                    minlength=n_nodes,
                ).astype(np.int64)
            else:
                raw = np.zeros(n_nodes, dtype=np.int64)
            t_raw = int(raw.sum(dtype=np.int64))
            assert t_raw < 2**62, "HITS mass envelope exceeded"
            q = max(t_raw // total, 1)
            out = raw // q
            assert int(out.max(initial=0)) <= 2 * total, \
                "HITS per-node envelope exceeded"
            return out

        h = np.full(n_nodes, total // n_nodes, dtype=np.int64)
        a = np.zeros(n_nodes, dtype=np.int64)
        for _ in range(iters):
            a = push(h, "src", "dst")
            h = push(a, "dst", "src")
        return rd.from_arrow(pa.table({
            "node": pa.array(np.arange(n_nodes, dtype=np.int64), pa.int64()),
            "auth_fp": pa.array(a, pa.int64()),
            "hub_fp": pa.array(h, pa.int64()),
        }))

    # ---- scale tier: vectors stay Datasets; 2 coarse shuffles/push ----
    import pandas as pd

    from ray.data.aggregate import Sum

    P = shuffle_parallelism()

    def _ck_of(arr_np: np.ndarray) -> pa.Array:
        hh = pd.util.hash_pandas_object(
            pd.Series(arr_np), index=False).to_numpy()
        return pa.array((hh % np.uint64(P)).astype(np.int64))

    # node list = every endpoint (either side) — zero-score nodes
    # absent from the edge list are the caller's to fill (documented).
    # Per-block unique is NOT enough here: h0 seeds one mass unit
    # per node ROW, so the list must be globally unique (one coarse
    # dedup groupby; pagerank's base-fill tolerates dups because it
    # only adds zeros — this one must not).
    def _nk_dedup(g: pd.DataFrame) -> pa.Table:
        return pa.table({"node": pa.array(
            np.unique(g["node"].to_numpy(np.int64)), pa.int64())})

    nodes_ds = (
        edges.map_batches(
            lambda t: pa.table({"node": pc.unique(pa.chunked_array([
                pa.chunked_array([t["src"]]).combine_chunks(),
                pa.chunked_array([t["dst"]]).combine_chunks(),
            ]).combine_chunks())}),
            batch_format="pyarrow", batch_size=None,
        )
        .map_batches(
            lambda t: t.append_column("nk", _ck_of(
                t["node"].to_numpy(zero_copy_only=False))),
            batch_format="pyarrow", batch_size=None)
        .groupby("nk")
        .map_groups(lambda g: _nk_dedup(g.drop(columns="nk")),
                    batch_format="pandas")
        .materialize()
    )

    def tag_edges_by(key_col: str):
        def tag(batch: pa.Table) -> pa.Table:
            k = batch[key_col].to_numpy(zero_copy_only=False)
            n = len(k)
            return pa.table({
                "ck": _ck_of(k),
                "is_vec": pa.array(np.zeros(n, dtype=np.bool_)),
                "src": batch["src"],
                "dst": batch["dst"],
                "v": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
            })
        return tag

    edges_by_src = edges.map_batches(
        tag_edges_by("src"), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).materialize()
    edges_by_dst = edges.map_batches(
        tag_edges_by("dst"), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).materialize()

    def push_ds(vec_ds, tagged, from_col: str, to_col: str):
        def tag_vec(batch: pa.Table) -> pa.Table:
            nd = batch["node"].to_numpy(zero_copy_only=False)
            n = len(nd)
            fill = pa.array(np.full(n, -1, dtype=np.int64), pa.int64())
            return pa.table({
                "ck": _ck_of(nd),
                "is_vec": pa.array(np.ones(n, dtype=np.bool_)),
                "src": batch["node"] if from_col == "src" else fill,
                "dst": batch["node"] if from_col == "dst" else fill,
                "v": batch["v"],
            })

        vt = vec_ds.map_batches(
            tag_vec, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True)

        def attach(g: pd.DataFrame) -> pa.Table:
            side = g[g["is_vec"]]
            e = g[~g["is_vec"]]
            m = e[["src", "dst"]].merge(
                side[[from_col, "v"]], on=from_col, how="inner")
            if not len(m):
                return pa.table({"node": pa.array([], pa.int64()),
                                 "m": pa.array([], pa.int64())})
            t = m[to_col].to_numpy(np.int64)
            nodes, inv = np.unique(t, return_inverse=True)
            mm = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(mm, inv, m["v"].to_numpy(np.int64))
            return pa.table({
                "node": pa.array(nodes, pa.int64()),
                "m": pa.array(mm, pa.int64()),
            })

        raws = tagged.union(vt).groupby("ck").map_groups(
            attach, batch_format="pandas")

        base = nodes_ds.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "m": pa.array(np.zeros(t.num_rows, dtype=np.int64),
                              pa.int64()),
            }),
            batch_format="pyarrow", batch_size=None)

        def add_nk(batch: pa.Table) -> pa.Table:
            nd = batch["node"].to_numpy(zero_copy_only=False)
            return batch.append_column("nk", _ck_of(nd))

        def fold(g: pd.DataFrame) -> pa.Table:
            s = g.groupby("node", sort=False)["m"].sum()
            return pa.table({
                "node": pa.array(s.index.to_numpy(np.int64), pa.int64()),
                "m": pa.array(s.to_numpy(np.int64), pa.int64()),
            })

        raw_ds = (
            raws.union(base)
            .map_batches(add_nk, batch_format="pyarrow", batch_size=None)
            .groupby("nk")
            .map_groups(lambda g: fold(g.drop(columns="nk")),
                        batch_format="pandas")
            .materialize()
        )
        t_raw = int(raw_ds.aggregate(Sum("m", alias_name="t"))["t"] or 0)
        assert t_raw < 2**62, "HITS mass envelope exceeded"
        q = max(t_raw // total, 1)
        return raw_ds.map_batches(
            lambda t, _q=q: pa.table({
                "node": t["node"],
                "v": pa.array(
                    t["m"].to_numpy(zero_copy_only=False) // _q,
                    pa.int64()),
            }),
            batch_format="pyarrow", batch_size=None,
        ).materialize()

    h0 = nodes_ds.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "v": pa.array(np.full(t.num_rows, total // n_nodes,
                                  dtype=np.int64), pa.int64()),
        }),
        batch_format="pyarrow", batch_size=None).materialize()
    h_ds, a_ds = h0, None
    for _ in range(iters):
        a_ds = push_ds(h_ds, edges_by_src, "src", "dst")
        h_ds = push_ds(a_ds, edges_by_dst, "dst", "src")

    def tag_out(which: str):
        def f(batch: pa.Table) -> pa.Table:
            v = batch["v"].to_numpy(zero_copy_only=False)
            z = np.zeros(len(v), dtype=np.int64)
            return pa.table({
                "node": batch["node"],
                "auth_fp": pa.array(v if which == "a" else z, pa.int64()),
                "hub_fp": pa.array(z if which == "a" else v, pa.int64()),
            })
        return f

    both = a_ds.map_batches(
        tag_out("a"), batch_format="pyarrow", batch_size=None
    ).union(h_ds.map_batches(
        tag_out("h"), batch_format="pyarrow", batch_size=None))

    def add_nk2(batch: pa.Table) -> pa.Table:
        nd = batch["node"].to_numpy(zero_copy_only=False)
        return batch.append_column("nk", _ck_of(nd))

    def merge2(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("node", sort=False)[["auth_fp", "hub_fp"]].sum()
        return pa.table({
            "node": pa.array(s.index.to_numpy(np.int64), pa.int64()),
            "auth_fp": pa.array(s["auth_fp"].to_numpy(np.int64), pa.int64()),
            "hub_fp": pa.array(s["hub_fp"].to_numpy(np.int64), pa.int64()),
        })

    return (both.map_batches(add_nk2, batch_format="pyarrow",
                             batch_size=None)
            .groupby("nk")
            .map_groups(lambda g: merge2(g.drop(columns="nk")),
                        batch_format="pandas"))
