"""Drift, dedup, ANN and charset/entropy scenario tests
(FIXTURES.md F3)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd


def test_ks_drift_flags_shifted_partition():
    # FIXTURES.md drift: partitions 0-8 ~ N(0,1), partition 9 ~ N(3,1)
    from logdata_anomaly_miner_ray.stages.drift import ks_drift_by_group

    rng = np.random.default_rng(42)
    parts, vals = [], []
    for p in range(10):
        v = rng.normal(3.0 if p == 9 else 0.0, 1.0, 1000)
        parts += [str(p)] * 1000
        vals += v.tolist()
    ds = rd.from_arrow(pa.table({"part": parts, "value": vals})).repartition(4)
    out = ks_drift_by_group(ds, "part", "value")
    flagged = set(out[out["drift"]]["part"])
    assert "9" in flagged
    assert len(flagged) == 1


def test_psi_drift_flags_shifted_partition():
    from logdata_anomaly_miner_ray.stages.drift import (
        group_histograms,
        psi_drift_by_group,
    )

    rng = np.random.default_rng(7)
    parts, vals = [], []
    for p in range(5):
        v = rng.normal(2.0 if p == 4 else 0.0, 1.0, 2000)
        parts += [str(p)] * 2000
        vals += v.tolist()
    ds = rd.from_arrow(pa.table({"part": parts, "value": vals})).repartition(4)
    edges = np.linspace(-4, 6, 21)
    hist = group_histograms(ds, "part", "value", edges).to_pandas()
    out = psi_drift_by_group(hist, "part", len(edges) + 1)
    assert set(out[out["drift"]]["part"]) == {"4"}


def test_ks_2samp_stat_matches_bruteforce():
    from logdata_anomaly_miner_ray.stages.drift import ks_2samp_from_sorted

    rng = np.random.default_rng(0)
    a = np.sort(rng.normal(0, 1, 500))
    b = np.sort(rng.normal(0.5, 1, 400))
    d = ks_2samp_from_sorted(a, b)
    # brute force over all sample points
    pts = np.concatenate([a, b])
    brute = max(
        abs((a <= x).mean() - (b <= x).mean()) for x in pts
    )
    assert d == pytest.approx(brute, abs=1e-12)


def test_exact_dedup_planted():
    from logdata_anomaly_miner_ray.stages.dedup import exact_dup_groups

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": ["same text", "other", "same text", "same text", "unique"],
        }
    )
    out = exact_dup_groups(rd.from_arrow(t).repartition(2), "text", "doc_id").to_pandas()
    dup = out[out["n"] > 1]
    assert len(dup) == 1
    assert dup["keep_id"].iloc[0] == 1 and dup["n"].iloc[0] == 3


def test_minhash_lsh_finds_near_dups():
    from logdata_anomaly_miner_ray.stages.dedup import minhash_lsh_candidate_pairs

    base = "the quick brown fox jumps over the lazy dog while rain falls on the dusty road near town"
    docs = [base, base.replace("dusty", "muddy"), "totally different words about ray data engines and arrow batches here now"]
    t = pa.table({"doc_id": pa.array([10, 20, 30], pa.int64()), "text": docs})
    pairs = minhash_lsh_candidate_pairs(
        rd.from_arrow(t), "text", "doc_id", jaccard_threshold=0.5
    ).to_pandas()
    assert set(zip(pairs["id_a"], pairs["id_b"])) == {(10, 20)}


def test_minhash_verified_pairs_dataset_tier_matches_driver(monkeypatch, capsys):
    """Adversarial near-dup-HEAVY corpus: many templated documents,
    most of them near-duplicates of each other. Forcing
    driver_pair_limit=0 exercises the dataset-native verification
    tier (pairs stay a Dataset end-to-end: bucket groupby dedup →
    member/text join → co-located verify groupby); it must produce
    exactly the driver tier's (id_a, id_b, jaccard) output — no pair
    lost at bucket boundaries, no driver-side pair materialization
    (asserted via the GRAFT_TRACE tier line)."""
    from logdata_anomaly_miner_ray.stages.dedup import minhash_verified_pairs

    rng = np.random.default_rng(17)
    base = ("the quick brown fox jumps over the lazy dog while rain falls "
            "on the dusty road near the old mill town after dark tonight").split()
    docs, ids = [], []
    for i in range(60):
        toks = list(base)
        # 0-2 word substitutions → most pairs are true near-dups
        for _ in range(int(rng.integers(0, 3))):
            toks[int(rng.integers(0, len(toks)))] = f"w{int(rng.integers(0, 5))}"
        docs.append(" ".join(toks))
        ids.append(i + 1)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": docs})
    ds = rd.from_arrow(t).repartition(6)

    monkeypatch.setenv("GRAFT_TRACE", "1")
    kw = dict(jaccard_threshold=0.6, candidate_threshold=0.3, k_shingle=3)
    want = minhash_verified_pairs(ds, "text", "doc_id", **kw)  # driver tier
    got = minhash_verified_pairs(
        ds, "text", "doc_id", driver_pair_limit=0, n_verify_groups=7, **kw
    )
    err = capsys.readouterr().err
    assert "tier=driver" in err and "tier=dataset" in err
    assert len(want) > 30  # the fixture really is near-dup-heavy
    pd.testing.assert_frame_equal(got, want)


def test_ngram_jaccard_pairs_matches_bruteforce_both_tiers(monkeypatch, capsys):
    """EXACT prefix-filtered n-gram Jaccard join vs a brute-force
    all-pairs oracle at three thresholds — unlike MinHash, no banding
    miss probability, so the pair set must match exactly (ids AND
    Jaccard values). The driver_pair_limit=0 rerun exercises the
    dataset-native verify tier on the same input."""
    from logdata_anomaly_miner_ray.stages.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(80):
        n = int(rng.integers(0, 25))
        docs.append(" ".join(rng.choice(vocab, size=n)))
    for i in range(0, 70, 10):  # planted near-dups
        toks = docs[i].split()
        if len(toks) > 8:
            toks[3] = "zz"
            docs[i + 1] = " ".join(toks)
    df = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )
    ds = rd.from_pandas(df).repartition(4)

    def grams(s):
        toks = s.split()
        return {tuple(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))}

    monkeypatch.setenv("GRAFT_TRACE", "1")
    for t in (0.3, 0.6):
        exp = []
        for a in range(len(docs)):
            ga = grams(docs[a])
            for b in range(a + 1, len(docs)):
                gb = grams(docs[b])
                if not ga and not gb:
                    continue
                j = len(ga & gb) / len(ga | gb)
                if j >= t:
                    exp.append((a, b, j))
        exp = (
            pd.DataFrame(exp, columns=["id_a", "id_b", "jaccard"])
            .astype({"id_a": np.int64, "id_b": np.int64})
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        got = ngram_jaccard_pairs(ds, "text", "doc_id", jaccard_threshold=t)
        pd.testing.assert_frame_equal(got, exp)
        got_ds = ngram_jaccard_pairs(
            ds, "text", "doc_id", jaccard_threshold=t,
            driver_pair_limit=0, n_verify_groups=5,
        )
        pd.testing.assert_frame_equal(got_ds, exp)
    err = capsys.readouterr().err
    assert "ngram_jaccard_pairs tier=driver" in err
    assert "ngram_jaccard_pairs tier=dataset" in err


def test_ngram_jaccard_borderline_threshold_kept():
    """A pair sitting EXACTLY on the threshold (J = 2/4 = 0.5 with
    t = 0.5) must survive both the prefix length computation and the
    min/max length filter — ≥ is inclusive end to end."""
    from logdata_anomaly_miner_ray.stages.dedup import ngram_jaccard_pairs

    # doc A: shingles {abc, bcd, cde} (3); doc B: {abc, bcd, dxy} —
    # build via tokens: A = a b c d e (shingles abc bcd cde),
    # B = a b c d x y → shingles abc bcd cdx dxy (4) → J = 2/5 = 0.4
    a = "a b c d e"          # {abc, bcd, cde}
    b = "a b c d x"          # {abc, bcd, cdx} → inter 2, union 4 → 0.5
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.array([1, 2], np.int64), "text": [a, b]})
    )
    got = ngram_jaccard_pairs(ds, "text", "doc_id", jaccard_threshold=0.5)
    assert len(got) == 1
    assert got["jaccard"].iloc[0] == pytest.approx(0.5)
    got2 = ngram_jaccard_pairs(ds, "text", "doc_id", jaccard_threshold=0.51)
    assert len(got2) == 0


def test_lsh_bucket_cap_keeps_connectivity_via_star_pairs():
    """>max_bucket near-identical docs sharing every band hash: the
    cap must NOT orphan the overflow members — hub star pairs keep
    the bucket one connected component, so a union-find over the
    verified pairs yields a single cluster covering all docs."""
    from logdata_anomaly_miner_ray.stages.dedup import (
        _lsh_collision_pairs,
        minhash_lsh_candidate_pairs,
    )

    docs = ["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 30
    t = pa.table({"doc_id": pa.array(range(1, 31), pa.int64()), "text": docs})
    ds = rd.from_arrow(t).repartition(3)

    for pairs in (
        _lsh_collision_pairs(
            ds, "text", "doc_id", num_perm=32, num_bands=8, k_shingle=2,
            max_bucket=8,
        ).to_pandas(),
        minhash_lsh_candidate_pairs(
            ds, "text", "doc_id", num_perm=32, num_bands=8, k_shingle=2,
            jaccard_threshold=0.9, max_bucket=8,
        ).to_pandas(),
    ):
        parent = {i: i for i in range(1, 31)}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pairs["id_a"], pairs["id_b"]):
            parent[find(int(a))] = find(int(b))
        roots = {find(i) for i in range(1, 31)}
        assert roots == {find(1)}, f"disconnected components: {roots}"


def test_simhash_near_dup_pairs():
    from logdata_anomaly_miner_ray.stages.dedup import simhash_near_dup_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    docs = [base, base + " omicron", "one two three four five six seven eight nine ten eleven twelve"]
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "text": docs})
    pairs = simhash_near_dup_pairs(
        rd.from_arrow(t), "text", "doc_id", max_hamming=8
    ).to_pandas()
    assert (1, 2) in set(zip(pairs["id_a"], pairs["id_b"]))
    assert (1, 3) not in set(zip(pairs["id_a"], pairs["id_b"]))


def test_embedding_near_dup_pairs():
    from logdata_anomaly_miner_ray.stages.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    emb = [base, base + rng.standard_normal(16) * 0.01, rng.standard_normal(16)]
    t = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in emb], pa.list_(pa.float32())),
        }
    )
    pairs = embedding_near_dup_pairs(
        rd.from_arrow(t), "embedding", "vec_id", cosine_threshold=0.99
    ).to_pandas()
    assert set(zip(pairs["id_a"], pairs["id_b"])) == {(1, 2)}


def test_cosine_topk_matches_numpy(sf_dir):
    from logdata_anomaly_miner_ray.stages.ann import cosine_topk

    import pyarrow.parquet as pq

    et = pq.read_table(f"{sf_dir}/embeddings.parquet")
    M = np.array(et["embedding"].to_pylist(), dtype=np.float64)
    ids = np.array(et["vec_id"].to_pylist())
    Q = M[:3]
    got = cosine_topk(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet").repartition(4),
        "embedding",
        "vec_id",
        ray.put(Q),
        k=5,
    )
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Mn @ Qn.T
    for qi in range(3):
        want_ids = ids[np.argsort(-sims[:, qi], kind="stable")[:5]]
        got_ids = got[got["query_id"] == qi]["vec_id"].to_numpy()
        assert set(got_ids) == set(want_ids)


def test_ivf_topk_recall_at_pruning_nprobe(sf_dir):
    """Trained IVF with nprobe < n_centroids must keep recall@10
    >= 0.9 vs brute force (VERDICT round-1 acceptance bar)."""
    from logdata_anomaly_miner_ray.stages.ann import ivf_topk

    import pyarrow.parquet as pq

    et = pq.read_table(f"{sf_dir}/embeddings.parquet")
    M = np.array(et["embedding"].to_pylist(), dtype=np.float64)
    ids = np.array(et["vec_id"].to_pylist())
    Q = M[:5]
    # the synthetic fixture is near-orthogonal random vectors — the
    # adversarial no-cluster case for IVF (recall ≈ probed-cell
    # fraction for far neighbors); nprobe=12/16 still prunes 25% of
    # the scoring work while holding the recall bar. Real clustered
    # embeddings do far better at smaller nprobe.
    got = ivf_topk(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet").repartition(4),
        "embedding", "vec_id", ray.put(Q), dim=M.shape[1],
        k=10, n_centroids=16, nprobe=12,
    )
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Mn @ Qn.T
    recalls = []
    for qi in range(len(Q)):
        want = set(ids[np.argsort(-sims[:, qi], kind="stable")[:10]])
        have = set(got[got["query_id"] == qi]["vec_id"].to_numpy())
        recalls.append(len(want & have) / 10)
    assert np.mean(recalls) >= 0.9, recalls


def test_minhash_bounded_group_keys_hot_bucket():
    """A degenerate hot bucket (many identical docs) must stay
    bounded by max_bucket truncation and still pair the dups."""
    from logdata_anomaly_miner_ray.stages.dedup import minhash_lsh_candidate_pairs

    texts = ["the same exact document text repeated many times over"] * 40 + [
        f"unique filler document number {i} with its own words entirely" for i in range(20)
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    pairs = minhash_lsh_candidate_pairs(
        rd.from_arrow(t).repartition(3), "text", "doc_id",
        jaccard_threshold=0.9, max_bucket=16,
    ).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    # truncation caps the quadratic blowup but the dup cluster still
    # surfaces pairs, and no false pair crosses into the fillers
    assert len(got) > 0
    assert all(a < 40 and b < 40 for a, b in got)
    assert len(got) <= 16 * 15 // 2 * 16  # bounded by cap per band


def test_charset_scenario():
    # FIXTURES.md charset: one row introduces '#'
    from logdata_anomaly_miner_ray.stages.charset import (
        charset_violations,
        fit_charsets,
    )

    fit_t = pa.table({"id": ["g", "g", "g"], "value": ["abc", "abd", "xyz"]})
    cs = fit_charsets(rd.from_arrow(fit_t), "id", "value")
    probe = pa.table({"id": ["g", "g"], "value": ["abz", "ab#"]})
    viol = charset_violations(
        rd.from_arrow(probe), "id", "value", ray.put(cs)
    ).to_pandas()
    assert len(viol) == 1
    assert viol["affected_values"].iloc[0] == ["#"]


def test_entropy_scenario():
    # FIXTURES.md entropy: normal words + high-entropy tokens
    from logdata_anomaly_miner_ray.stages.entropy import (
        entropy_violations,
        fit_bigram_table,
    )

    normal = ["the cat sat on the mat"] * 50 + ["a tale of two cities"] * 50
    fit_ds = rd.from_arrow(pa.table({"text": normal}))
    tbl = fit_bigram_table(fit_ds, "text")
    probe = pa.table({"text": ["the cat sat", "qxzkjvwpfh", "mat on the mat", "zqxvjkwygh"]})
    viol = entropy_violations(
        rd.from_arrow(probe), "text", ray.put(tbl), prob_thresh=0.01
    ).to_pandas()
    flagged = {v[0] for v in viol["affected_values"]}
    assert flagged == {"qxzkjvwpfh", "zqxvjkwygh"}


def test_multimodal_plumbing():
    from logdata_anomaly_miner_ray.stages.multimodal import (
        CodecDecoder,
        decode_media,
        synth_media_table,
    )

    media = rd.from_arrow(synth_media_table(16))
    out = decode_media(media).to_pandas()
    assert len(out) == 16
    assert all(len(f) == 16 for f in out["features"])
    # determinism: same payload → same features
    out2 = decode_media(rd.from_arrow(synth_media_table(16))).to_pandas()
    a = out.sort_values("media_id")["features"].tolist()
    b = out2.sort_values("media_id")["features"].tolist()
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    with pytest.raises(NotImplementedError):
        CodecDecoder()


def test_simhash_md5_mode_matches_duckdb_fingerprints():
    """hash_mode='md5' fingerprints must equal DuckDB's recomputation
    (md5 of space-joined 2-shingles over \\s+ tokens, sign-sum bits)."""
    import duckdb

    from logdata_anomaly_miner_ray.functions.hashing import simhash64_md5

    texts = ["a b c d", "a b c e", " pad\t mixed\nws doc ", "single", ""]
    arr = pa.array(texts, pa.string())
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": arr})
    py = simhash64_md5(arr, k=2)
    df = duckdb.sql(r"""
WITH toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord
  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l FROM tbl)
), sh AS (
  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS s
  FROM toks QUALIFY s IS NOT NULL
), hx AS (SELECT doc_id, substr(md5(s), 1, 16) AS h FROM sh),
bits AS (
  SELECT doc_id, t.i, CASE WHEN 2 * sum(
      (strpos('0123456789abcdef', substr(h, CAST(16 - t.i // 4 AS INT), 1)) - 1) >> (t.i % 4) & 1
    ) - count(*) > 0 THEN 1 ELSE 0 END AS pos
  FROM hx, range(0, 64) t(i) GROUP BY doc_id, t.i
), fp AS (
  SELECT doc_id,
    sum(CASE WHEN pos = 1 AND i < 32 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS lo,
    sum(CASE WHEN pos = 1 AND i >= 32 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS hi
  FROM bits GROUP BY doc_id)
SELECT d.doc_id, coalesce(fp.lo, 0)::BIGINT AS lo, coalesce(fp.hi, 0)::BIGINT AS hi
FROM tbl d LEFT JOIN fp USING (doc_id) ORDER BY doc_id
""").df()
    want = (df["hi"].to_numpy().astype(np.uint64) << np.uint64(32)) | df[
        "lo"
    ].to_numpy().astype(np.uint64)
    assert (py == want).all()


def test_connected_components_clusters():
    """Min-label propagation over a pair list: chain, triangle,
    disjoint pair, converging to component = min id."""
    from logdata_anomaly_miner_ray.stages.dedup import connected_components

    pairs = pa.table(
        {
            # chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
            "id_a": pa.array([1, 2, 3, 10, 11, 10, 20], pa.int64()),
            "id_b": pa.array([2, 3, 4, 11, 12, 12, 21], pa.int64()),
        }
    )
    out = (
        connected_components(rd.from_arrow(pairs).repartition(3))
        .to_pandas()
        .set_index("id")["component"]
        .to_dict()
    )
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges():
    from logdata_anomaly_miner_ray.stages.dedup import connected_components

    n = 200  # long chain, driver union-find path
    pairs = pa.table(
        {"id_a": pa.array(range(n - 1), pa.int64()),
         "id_b": pa.array(range(1, n), pa.int64())}
    )
    out = connected_components(rd.from_arrow(pairs)).to_pandas()
    assert (out["component"] == 0).all() and len(out) == n


def test_connected_components_distributed_path():
    """driver_edge_limit=0 forces the join-based min-label rounds;
    must agree with the union-find answer."""
    from logdata_anomaly_miner_ray.stages.dedup import connected_components

    pairs = pa.table(
        {"id_a": pa.array([1, 2, 10, 11, 20], pa.int64()),
         "id_b": pa.array([2, 3, 11, 12, 21], pa.int64())}
    )
    ds = rd.from_arrow(pairs).repartition(2)
    want = connected_components(ds).to_pandas().sort_values("id").reset_index(drop=True)
    got = (
        connected_components(ds, driver_edge_limit=0, num_partitions=2)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert got.equals(want)


def test_multimodal_resize_and_frame_sample():
    """Resize/frame-sample plumbing: schema, per-frame explosion
    count, deterministic stub payloads, non-video rows dropped."""
    from logdata_anomaly_miner_ray.stages.multimodal import (
        resize_images,
        sample_frames,
        synth_media_table,
    )

    media = rd.from_arrow(synth_media_table(24, seed=1))
    rs = resize_images(media, 8, 6, batch_size=4).to_pandas()
    assert len(rs) == 24
    assert (rs["payload"].map(len) == 8 * 6 * 3).all()
    assert (rs["width"] == 8).all() and (rs["height"] == 6).all()

    src = synth_media_table(24, seed=1).to_pandas()
    fr = sample_frames(media, every_ms=500, batch_size=4).to_pandas()
    vids = src[src["kind"] == "video"]
    want = int(sum(max(int(d) // 500, 1) for d in vids["duration_ms"]))
    assert len(fr) == want and want > 0
    assert set(fr["media_id"]).issubset(set(vids["media_id"]))
    one = fr[fr["media_id"] == fr["media_id"].iloc[0]]
    assert one["frame_idx"].tolist() == list(range(len(one)))
    assert (one["t_ms"] == one["frame_idx"] * 500).all()


def test_cm_exact_by_group():
    """Exact rational CvM vs a brute-force ECDF computation; a group
    drawn from a different distribution scores far higher than a
    same-distribution group of equal size."""
    from logdata_anomaly_miner_ray.stages.drift import cm_exact_by_group

    rng = np.random.default_rng(3)
    a = np.round(rng.normal(0, 1, 1500), 2)
    b = np.round(rng.normal(0, 1, 1500), 2)
    t = pa.table({"g": ["a"] * 1500 + ["b"] * 1500, "v": np.concatenate([a, b])})
    out = cm_exact_by_group(rd.from_arrow(t), "g", "v").set_index("g")

    pool = np.sort(np.concatenate([a, b]))
    pts, w = np.unique(pool, return_counts=True)
    n, m = 1500, 3000
    Fa = np.searchsorted(np.sort(a), pts, side="right")
    Fp = np.searchsorted(pool, pts, side="right")
    num = sum(int(w[k]) * (int(Fa[k]) * m - int(Fp[k]) * n) ** 2 for k in range(len(pts)))
    assert out.loc["a", "cm_num"] == num
    assert out.loc["a", "cm_den"] == n * m * (n + m) ** 2

    # shifted group dominates
    c = np.round(rng.normal(2, 1, 1500), 2)
    t2 = pa.table({"g": ["a"] * 1500 + ["b"] * 1500 + ["c"] * 1500,
                   "v": np.concatenate([a, b, c])})
    o2 = cm_exact_by_group(rd.from_arrow(t2), "g", "v")
    o2 = o2.assign(T=[nu / de for nu, de in zip(o2["cm_num"], o2["cm_den"])]).set_index("g")
    assert o2.loc["c", "T"] > 2 * o2.loc["a", "T"]


def test_quantize_int8_floor_scheme_and_zeros():
    import numpy as np

    from logdata_anomaly_miner_ray.stages.ann import quantize_int8

    m = np.array([[1.0, -1.0, 0.5], [0.0, 0.0, 0.0], [-2.0, 1.0, 0.25]])
    q = quantize_int8(m)
    # row 0: scale 1 -> floor(127), floor(-127), floor(63.5)=63
    assert q[0].tolist() == [127, -127, 63]
    assert q[1].tolist() == [0, 0, 0]  # all-zero vector
    # row 2: scale 2 -> 127*-2/2=-127, 127/2=63.5->63, 127*0.25/2=15.875->15
    assert q[2].tolist() == [-127, 63, 15]
    assert q.dtype == np.int64


def test_quantized_topk_exact_ties_and_partition_invariance():
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.ann import quantize_int8, quantized_topk

    rng = np.random.default_rng(3)
    # coarse vectors from a tiny value set force MANY exact dot ties
    vecs = rng.integers(-2, 3, size=(80, 8)).astype(np.float64)
    ids = np.arange(80, dtype=np.int64)
    qmat = vecs[:3]
    qref = ray.put(qmat)

    def run(parts):
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(vecs.astype(np.float32))),
        })).repartition(parts)
        out = quantized_topk(ds, "embedding", "vec_id", qref, k=5)
        return [tuple(r) for r in out[["query_id", "vec_id", "sim"]]
                .itertuples(index=False)]

    # brute force with the same quantizer
    qz = quantize_int8(vecs)
    qq = quantize_int8(qmat)
    dots = qz @ qq.T
    want = []
    for qi in range(3):
        order = np.lexsort((ids, -dots[:, qi]))[:5]
        want.extend((qi, int(ids[j]), int(dots[j, qi])) for j in order)

    assert sorted(run(1)) == sorted(want)
    assert sorted(run(7)) == sorted(want)


def test_cross_source_overlap_brute_force_and_layout():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.dedup import cross_source_overlap

    rng = np.random.RandomState(11)
    n = 300
    df = pd.DataFrame({
        "text": [f"t{rng.randint(0, 40)}" for _ in range(n)],
        "source": [["cc", "books", "wiki"][rng.randint(0, 3)]
                   for _ in range(n)],
    })
    grp = df.groupby("text")
    sets = grp["source"].agg(lambda s: ",".join(sorted(set(s))))
    docs = grp.size()
    want = (pd.DataFrame({"source_set": sets, "n_docs": docs})
            .groupby("source_set", sort=True)
            .agg(n_texts=("n_docs", "size"), n_docs=("n_docs", "sum"))
            .reset_index())
    want["n_texts"] = want["n_texts"].astype(np.int64)
    want["n_docs"] = want["n_docs"].astype(np.int64)
    for nblocks in (1, 9):
        got = cross_source_overlap(
            rd.from_pandas(df).repartition(nblocks), "text", "source")
        pd.testing.assert_frame_equal(got, want)


def test_cross_source_overlap_null_source_sentinel_and_empty():
    import pandas as pd
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.dedup import cross_source_overlap

    df = pd.DataFrame({"text": ["a", "a", "b"],
                       "source": ["cc", None, None]})
    got = cross_source_overlap(rd.from_pandas(df), "text", "source")
    assert got["source_set"].tolist() == ["(null)", "(null),cc"]
    assert got["n_texts"].tolist() == [1, 1]
    assert got["n_docs"].tolist() == [1, 2]

    empty = cross_source_overlap(
        rd.from_pandas(pd.DataFrame({"text": pd.Series(dtype=str),
                                     "source": pd.Series(dtype=str)})))
    assert list(empty.columns) == ["source_set", "n_texts", "n_docs"]
    assert len(empty) == 0
