"""stages/graph.py + functions/html link extraction vs brute force.

The brute force recomputes edges and the integer fixed-point PageRank
recurrence with plain Python dicts; both tiers must agree with it
bit-exactly regardless of block layout (integer sums are
order-independent — that is the point of the fixed-point design).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.functions.html import (
    build_link_page_html,
    extract_links_table,
)
from logdata_anomaly_miner_ray.stages.graph import (
    PAGERANK_SCALE,
    link_edges,
    pagerank,
)

N = 37  # small prime-ish corpus: targets wrap, no duplicate edges


def _ds(n_blocks: int = 4) -> "rd.Dataset":
    t = pa.table({"doc_id": pa.array(list(range(N)), pa.int64())})
    return rd.from_arrow(t).repartition(n_blocks)


def _brute_edges():
    edges = []
    for i in range(N):
        k = 1 + i % 4
        for j in range(k):
            edges.append((i, (i * 31 + 7 * j + 1) % N, k))
    return edges


def _brute_pagerank(iters: int = 3, total: int = PAGERANK_SCALE):
    edges = _brute_edges()
    r = {i: total // N for i in range(N)}
    tele = (15 * (total // N)) // 100
    for _ in range(iters):
        inm = {i: 0 for i in range(N)}
        for s, d, k in edges:
            inm[d] += r[s] // k
        r = {i: tele + (85 * inm[i]) // 100 for i in range(N)}
    return r


def test_link_page_extraction_matches_formula():
    ids = pa.array(list(range(N)), pa.int64())
    html = build_link_page_html(ids, N)
    links = extract_links_table(ids, html).to_pandas()
    got = sorted(map(tuple, links.itertuples(index=False)))
    want = []
    for i in range(N):
        want.append((i, 1, f"https://example.com/?id={i}&ref=nav"))
        for j in range(1 + i % 4):
            want.append((i, j + 2, f"/doc/{(i * 31 + 7 * j + 1) % N}"))
    assert got == sorted(want)
    # script/comment anchors never surface
    assert not any("/not-a-link" in h or "/commented-out" in h
                   for _, _, h in got)


def test_link_edges_block_invariant():
    want = sorted(_brute_edges())
    for nb in (1, 5):
        e = link_edges(_ds(nb), N).to_pandas()
        got = sorted(zip(e["src"], e["dst"], e["outdeg"]))
        assert [tuple(map(int, x)) for x in got] == want


def test_pagerank_broadcast_tier_exact():
    r = pagerank(link_edges(_ds(), N), N, iters=3).to_pandas()
    got = dict(zip(r["node"].astype(int), r["rank_fp"].astype(int)))
    assert got == _brute_pagerank(3)


def test_pagerank_scale_tier_exact():
    r = pagerank(
        link_edges(_ds(), N), N, iters=2, max_broadcast_nodes=0
    ).to_pandas()
    got = dict(zip(r["node"].astype(int), r["rank_fp"].astype(int)))
    assert got == _brute_pagerank(2)


def test_pagerank_mass_conserved_and_positive():
    r = pagerank(link_edges(_ds(), N), N, iters=4).to_pandas()
    tot = int(r["rank_fp"].sum())
    # truncation only ever loses mass: ≤ 1 unit per floor-division
    assert 0 < tot <= PAGERANK_SCALE
    assert tot > PAGERANK_SCALE - 100 * N * 4
    assert (r["rank_fp"].to_numpy() > 0).all()


def test_pagerank_tracks_float_pagerank():
    """The fixed-point iterate stays within ~1e-9 relative mass of
    the float recurrence with the same (truncating) teleport."""
    edges = _brute_edges()
    rf = {i: PAGERANK_SCALE / N for i in range(N)}
    tele = (15 * (PAGERANK_SCALE // N)) // 100
    for _ in range(3):
        inm = {i: 0.0 for i in range(N)}
        for s, d, k in edges:
            inm[d] += rf[s] / k
        rf = {i: tele + 0.85 * inm[i] for i in range(N)}
    fp = _brute_pagerank(3)
    for i in range(N):
        assert abs(fp[i] - rf[i]) / PAGERANK_SCALE < 1e-9


def test_indegree_histogram():
    from collections import Counter

    from logdata_anomaly_miner_ray.stages.graph import indegree_histogram

    hist = indegree_histogram(link_edges(_ds(5), N)).to_pandas()
    got = dict(zip(hist["indegree"].astype(int), hist["n_nodes"].astype(int)))
    deg = Counter(d for _, d, _ in _brute_edges())
    want = Counter(deg.values())
    assert got == dict(want)
    # total edges conserved through both aggregation levels
    assert sum(k * v for k, v in got.items()) == len(_brute_edges())


def test_anchor_text_extraction_strips_tags_entities_whitespace():
    import pyarrow as pa

    from logdata_anomaly_miner_ray.functions.html import extract_links_table

    html = pa.array([
        b'<a href="/x">One <b>Bold</b>\n\t station&amp;co</a>'
        b'<a href="/y">no close tag',
    ], pa.binary())
    t = extract_links_table(
        pa.array([1], pa.int64()), html, with_text=True).to_pandas()
    assert t["anchor"].tolist() == ["One Bold station&co", ""]


def test_anchor_text_topk_brute_force_and_layout():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.graph import anchor_text_topk

    rng = np.random.RandomState(5)
    n = 400
    df = pd.DataFrame({
        "href": [f"/t/{rng.randint(0, 12)}" for _ in range(n)],
        "anchor": [f"a{rng.randint(0, 5)}" for _ in range(n)],
    })
    t = df.groupby(["href", "anchor"], as_index=False).size()
    t = t.sort_values(["href", "size", "anchor"],
                      ascending=[True, False, True], kind="mergesort")
    t["rnk"] = t.groupby("href", sort=False).cumcount() + 1
    want = (t[t["rnk"] <= 2]
            .rename(columns={"size": "n_anchor"})
            .astype({"n_anchor": np.int64, "rnk": np.int64})
            .sort_values(["href", "rnk"], ignore_index=True))
    for nblocks in (1, 8):
        got = (anchor_text_topk(
            rd.from_pandas(df).repartition(nblocks), k=2)
            .to_pandas()
            .sort_values(["href", "rnk"], ignore_index=True))
        pd.testing.assert_frame_equal(
            got[["href", "anchor", "n_anchor", "rnk"]], want)


def _hits_brute(src, dst, n, iters=2, S=10**12):
    def push(v, f, t):
        raw = [0] * n
        for i in range(len(f)):
            raw[t[i]] += int(v[f[i]])
        q = max(sum(raw) // S, 1)
        return [x // q for x in raw]

    h = [S // n] * n
    a = [0] * n
    for _ in range(iters):
        a = push(h, src, dst)
        h = push(a, dst, src)
    return np.array(a, np.int64), np.array(h, np.int64)


def test_hits_broadcast_tier_matches_brute_force():
    from logdata_anomaly_miner_ray.stages.graph import hits_scores

    rng = np.random.RandomState(11)
    n = 40
    src = rng.randint(0, n, 200).astype(np.int64)
    dst = rng.randint(0, n, 200).astype(np.int64)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(5)
    a, h = _hits_brute(src, dst, n)
    out = (hits_scores(edges, n, iters=2).to_pandas()
           .sort_values("node").reset_index(drop=True))
    assert (out["auth_fp"].to_numpy(np.int64) == a).all()
    assert (out["hub_fp"].to_numpy(np.int64) == h).all()


def test_hits_scale_tier_bit_identical_to_broadcast():
    from logdata_anomaly_miner_ray.stages.graph import hits_scores

    rng = np.random.RandomState(12)
    n = 50
    src = rng.randint(0, n, 250).astype(np.int64)
    dst = rng.randint(0, n, 250).astype(np.int64)
    a, h = _hits_brute(src, dst, n)
    for nb in (1, 6):
        edges = rd.from_arrow(
            pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        ).repartition(nb)
        out = (hits_scores(edges, n, iters=2, max_broadcast_nodes=0)
               .to_pandas().sort_values("node").reset_index(drop=True))
        nodes = out["node"].to_numpy(np.int64)
        # scale tier emits only nodes present in the edge list
        present = np.union1d(src, dst)
        assert (nodes == present).all()
        assert (out["auth_fp"].to_numpy(np.int64) == a[nodes]).all()
        assert (out["hub_fp"].to_numpy(np.int64) == h[nodes]).all()


def test_hits_star_graph_closed_form():
    """Star: all spokes -> hub node 0. After one push every authority
    unit sits on node 0 and every hub unit spreads over the spokes."""
    from logdata_anomaly_miner_ray.stages.graph import hits_scores

    n = 5
    src = np.array([1, 2, 3, 4], np.int64)
    dst = np.array([0, 0, 0, 0], np.int64)
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    out = (hits_scores(edges, n, iters=2).to_pandas()
           .sort_values("node").reset_index(drop=True))
    a, h = _hits_brute(src, dst, n)
    assert (out["auth_fp"].to_numpy(np.int64) == a).all()
    assert (out["hub_fp"].to_numpy(np.int64) == h).all()
    assert out["auth_fp"][0] > 0 and (out["auth_fp"][1:] == 0).all()
    assert out["hub_fp"][0] == 0 and (out["hub_fp"][1:] > 0).all()
