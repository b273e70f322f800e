"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

AMiner only dedups learned artifacts with in-process sets (SURVEY.md
§2.7); these stages are the training-data-pipeline extension the
engine adds as first-class operators. All follow the same scale
shape: per-block vectorized signature computation (``map_batches``),
then ONE keyed shuffle on a short signature/bucket key — raw text
never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min, Sum

from ..functions.hashing import (
    hamming64,
    md5_hex,
    minhash_bands,
    minhash_jaccard,
    minhash_signatures,
    simhash64,
)
from ._taskcache import cached_task_fn


def _dedup_trace(fmt: str, *args) -> None:
    """GRAFT_TRACE=1 → tier-decision lines on stderr (same switch as
    pipelines/validate._trace; tests assert the dataset tier engages
    without driver-side pair materialization)."""
    import os
    import sys

    if os.environ.get("GRAFT_TRACE"):
        print("[dedup] " + (fmt % args), file=sys.stderr, flush=True)


def with_content_hash(
    ds: "ray.data.Dataset", text_col: str, hash_name: str = "text_hash"
) -> "ray.data.Dataset":
    """Append an md5 hex content hash (matches DuckDB md5() for the
    SQL oracle)."""

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(hash_name, pa.array(md5_hex(batch[text_col]), pa.string()))

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def exact_dup_groups(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    hash_name: str = "text_hash",
) -> "ray.data.Dataset":
    """Per distinct content hash: (hash, keep_id = min id, n). The
    keep/drop decision of exact dedup — only the 16-byte hash and the
    id shuffle."""
    hashed = with_content_hash(ds, text_col, hash_name)

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([hash_name, id_col])
            .group_by([hash_name])
            .aggregate([(id_col, "min"), ([], "count_all")])
        )
        return t.rename_columns([hash_name, "__mn", "__pn"])

    partials = hashed.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return partials.groupby(hash_name).aggregate(
        Min("__mn", alias_name="keep_id"), Sum("__pn", alias_name="n")
    )


def cross_source_overlap(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    source_col: str = "source",
    n_buckets: int = 256,
) -> pd.DataFrame:
    """Exact-duplicate overlap census across corpus sources (the Venn
    report corpus-curation runs before mixing crawls/dumps: how many
    distinct texts appear in exactly {cc}, {cc,books}, ... — cf. the
    cross-dump URL/content dedup accounting of CCNet (Wenzek et al.
    2020) and RefinedWeb's multi-dump dedup). Per distinct text: its
    set of sources; output one row per source-set with the number of
    distinct texts (``n_texts``) and total document rows
    (``n_docs``), sorted by the comma-joined set name.

    Scale shape: per-block Arrow group_by folds each block to one
    narrow (h1, h2, source, n) row per (distinct text, source) — the
    128-bit md5 identity (single-hash collisions would silently merge
    texts), raw text never shuffles. ONE coarse-bucket shuffle on the
    hash co-locates each text's rows; inside a bucket the source-set
    string is assembled per text and immediately reduced to per-set
    (n_texts, n_docs) partials — ≤ |distinct sets| rows per bucket,
    so the driver fold is bounded regardless of corpus size."""
    from ..functions.hashing import md5_u64_pair
    from ._agg import coarse_grouped

    def partial(batch: pa.Table) -> pa.Table:
        h1, h2 = md5_u64_pair(batch[text_col])
        src = pc.fill_null(
            pc.cast(batch[source_col], pa.string()), "(null)")
        t = pa.table({
            "h1": pa.array(h1.view(np.int64), pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64()),
            "source": src,
        })
        g = t.group_by(["h1", "h2", "source"]).aggregate([([], "count_all")])
        return g.rename_columns(["h1", "h2", "source", "n"])

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = (g.groupby(["h1", "h2", "source"], sort=False, as_index=False)
             ["n"].sum())
        t = t.sort_values(["h1", "h2", "source"], kind="mergesort")
        sets = (t.groupby(["h1", "h2"], sort=False)
                .agg(source_set=("source", ",".join), n_docs=("n", "sum")))
        out = (sets.groupby("source_set", sort=False)
               .agg(n_texts=("n_docs", "size"), n_docs=("n_docs", "sum"))
               .reset_index())
        return out

    folded = coarse_grouped(
        parts, ["h1", "h2"], per_bucket, n_buckets=n_buckets).to_pandas()
    if folded.empty:
        return pd.DataFrame(
            {"source_set": pd.Series(dtype=object),
             "n_texts": pd.Series(dtype=np.int64),
             "n_docs": pd.Series(dtype=np.int64)})
    out = (folded.groupby("source_set", sort=True, as_index=False)
           [["n_texts", "n_docs"]].sum())
    out["n_texts"] = out["n_texts"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out


def minhash_lsh_candidate_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    num_bands: int = 16,
    k_shingle: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 64,
    n_sub_buckets: int = 256,
) -> "ray.data.Dataset":
    """Near-duplicate pairs via banded MinHash LSH.

    Pipeline: per block compute signatures + band hashes → explode to
    (band, band_hash, id, signature) rows → groupby the bucket key →
    within-bucket pairwise signature Jaccard → pairs above threshold,
    deduped across buckets by a final groupby on the pair. Buckets
    larger than ``max_bucket`` are truncated with a WARNING log of
    the dropped bucket size — a skew guard: a degenerate bucket
    (e.g. empty docs) would otherwise go quadratic.

    The shuffle key is the COMPOSITE ``band·n_sub + (band_hash mod
    n_sub)``: per-group size is bounded by ~1/(num_bands·n_sub) of
    the exploded rows (a single band or — worse — the whole dataset
    never lands in one ``map_groups`` call), while same-bucket rows
    still co-locate. Size ``n_sub_buckets`` so exploded_rows /
    (num_bands · n_sub) fits one worker comfortably (~10⁵ rows);
    the default suits ≤10⁸-doc inputs, raise it at larger scale."""

    def explode(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch[text_col], num_perm=num_perm, k=k_shingle)
        bands = minhash_bands(sig, num_bands=num_bands)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        band_id = np.repeat(np.arange(num_bands, dtype=np.int64)[None, :], n, axis=0).ravel()
        band_hash = bands.ravel().astype(np.int64, copy=False)  # reinterpret ok
        out_ids = np.repeat(ids, num_bands)
        sig_blob = [sig[i].tobytes() for i in range(n) for _ in range(num_bands)]
        gk = band_id * np.int64(n_sub_buckets) + (
            band_hash.view(np.int64) % np.int64(n_sub_buckets)
        )
        return pa.table(
            {
                "gk": pa.array(gk, pa.int64()),
                "bh": pa.array(band_hash.view(np.int64), pa.int64()),
                id_col: pa.array(out_ids),
                "sig": pa.array(sig_blob, pa.binary()),
            }
        )

    from ._shuffle import shuffle_parallelism

    exploded = ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).repartition(shuffle_parallelism())  # narrow rows: size the
    # shuffle matrix to the cluster, not the input block count

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One call per bounded (band, bh mod n_sub) shard — large
        enough to amortize Ray per-group overhead, bounded so no
        shard materializes a data-proportional slice; buckets are the
        bh sub-groups, paired vectorized."""
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "est_jaccard": pd.Series(dtype=np.float64)})
        if len(g) < 2:
            return empty
        g = g.sort_values(["bh", id_col], kind="mergesort")
        bh = g["bh"].to_numpy()
        ids = g[id_col].to_numpy()
        sigs = np.stack([np.frombuffer(b, dtype=np.uint64) for b in g["sig"]])
        starts = np.flatnonzero(np.concatenate([[True], bh[1:] != bh[:-1]]))
        ends = np.concatenate([starts[1:], [len(bh)]])
        out_a, out_b, out_j = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            full_e = e
            if e - s > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "minhash LSH bucket of size %d capped at max_bucket=%d: "
                    "all-pairs within the cap + hub star pairs beyond it "
                    "(connectivity preserved; non-hub pairs among the "
                    "overflow are a recall bound)",
                    e - s, max_bucket,
                )
                e = s + max_bucket
            sub = sigs[s:e]
            eq = (sub[:, None, :] == sub[None, :, :]).mean(axis=2)
            iu = np.triu_indices(e - s, k=1)
            jac = eq[iu]
            keep = jac >= jaccard_threshold
            out_a.append(ids[s:e][iu[0][keep]])
            out_b.append(ids[s:e][iu[1][keep]])
            out_j.append(jac[keep])
            if full_e > e:
                # star pairs: hub = first member, vs every overflow
                # member — O(B) instead of O(B²), keeps the bucket's
                # connected component intact under truncation
                tail = sigs[e:full_e]
                sjac = (tail == sigs[s][None, :]).mean(axis=1)
                skeep = sjac >= jaccard_threshold
                hub = np.full(int(skeep.sum()), ids[s])
                out_a.append(np.minimum(hub, ids[e:full_e][skeep]))
                out_b.append(np.maximum(hub, ids[e:full_e][skeep]))
                out_j.append(sjac[skeep])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "est_jaccard": np.concatenate(out_j),
            }
        )

    pairs = exploded.groupby("gk").map_groups(band_pairs, batch_format="pandas")
    # a pair can surface from several bands — dedupe with one small groupby
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))


def _kgrams(s: str, k: int) -> set:
    toks = s.split()
    return {tuple(toks[i : i + k]) for i in range(max(0, len(toks) - k + 1))}


def _lsh_collision_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    num_perm: int,
    num_bands: int,
    k_shingle: int,
    max_bucket: int = 64,
    n_sub_buckets: int = 256,
) -> "ray.data.Dataset":
    """Raw banded-LSH collision pairs ``(id_a, id_b)`` in ONE
    all-to-all: explode to (bucket key, band hash, id) rows — NO
    signature blobs in the shuffle (≈23× fewer shuffle bytes than
    shipping 64×u64 sigs) — then emit every same-(band, band_hash)
    pair inside the bounded ``map_groups``. A pair colliding in
    several bands surfaces once PER band; callers dedup after the
    bounded collect (pairs, not documents, so no second shuffle
    needed). Buckets larger than ``max_bucket`` truncate with a
    WARNING (skew guard, same rule as minhash_lsh_candidate_pairs)."""

    def explode(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch[text_col], num_perm=num_perm, k=k_shingle)
        bands = minhash_bands(sig, num_bands=num_bands)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        band_id = np.repeat(np.arange(num_bands, dtype=np.int64)[None, :], n, axis=0).ravel()
        band_hash = bands.ravel().astype(np.int64, copy=False)
        gk = band_id * np.int64(n_sub_buckets) + (
            band_hash.view(np.int64) % np.int64(n_sub_buckets)
        )
        return pa.table(
            {
                "gk": pa.array(gk, pa.int64()),
                "bh": pa.array(band_hash.view(np.int64), pa.int64()),
                id_col: pa.array(np.repeat(ids, num_bands)),
            }
        )

    from ._shuffle import shuffle_parallelism

    exploded = ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).repartition(shuffle_parallelism())  # narrow rows: size the
    # shuffle matrix to the cluster, not the input block count

    def band_pairs(g: pd.DataFrame) -> pa.Table:
        # returns ARROW so output block types match the shuffle's
        # (arrow) empty blocks — mixed block types trip Ray's
        # downstream shuffle assert
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if len(g) < 2:
            return empty
        g = g.sort_values(["bh", id_col], kind="mergesort")
        bh = g["bh"].to_numpy()
        ids = g[id_col].to_numpy()
        starts = np.flatnonzero(np.concatenate([[True], bh[1:] != bh[:-1]]))
        ends = np.concatenate([starts[1:], [len(bh)]])
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            full_e = e
            if e - s > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "minhash LSH bucket of size %d capped at max_bucket=%d: "
                    "all-pairs within the cap + hub star pairs beyond it "
                    "(connectivity preserved; non-hub pairs among the "
                    "overflow are a recall bound)",
                    e - s, max_bucket,
                )
                e = s + max_bucket
            iu = np.triu_indices(e - s, k=1)
            out_a.append(ids[s:e][iu[0]])
            out_b.append(ids[s:e][iu[1]])
            if full_e > e:
                # hub star pairs over the overflow: the bucket stays
                # one connected candidate component at O(B) cost, and
                # the downstream EXACT-Jaccard verifier decides truth
                hub = np.full(full_e - e, ids[s])
                out_a.append(hub)
                out_b.append(ids[e:full_e])
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a).astype(np.int64), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b).astype(np.int64), pa.int64()),
        })

    return exploded.groupby("gk").map_groups(band_pairs, batch_format="pandas")


def minhash_verified_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.5,
    candidate_threshold: float = 0.25,
    num_perm: int = 64,
    num_bands: int = 16,
    k_shingle: int = 3,
    driver_text_limit: int = 4096,
    driver_pair_limit: int = 200_000,
    n_verify_groups: int = 512,
) -> pd.DataFrame:
    """LSH candidates verified with EXACT word k-gram Jaccard: the
    banded-LSH pass proposes every same-(band, band-hash) collision
    pair — a strict SUPERSET of any signature-agreement threshold, so
    signature noise never drops a true pair (``candidate_threshold``
    is retained for API compatibility but no longer prunes; the exact
    shingle-set Jaccard is the sole decider). Oversized collision
    buckets cap at all-pairs-within-cap + hub star pairs, so a
    degenerate bucket keeps its connected component; only non-hub
    pairs among the overflow are a (logged) recall bound.

    Two verification tiers, chosen by candidate volume:

    - raw collision pairs ≤ ``driver_pair_limit`` AND distinct
      candidate ids ≤ ``driver_text_limit``: the bounded driver fold
      — pair list to the driver, texts via one broadcast id-set
      filter pass, verification in-process. The fast path for
      dup-sparse corpora (same two-tier pattern as the suite's meta
      reductions).
    - larger (near-dup-heavy corpora): DATASET-NATIVE end-to-end —
      pairs stay a Dataset, ``bucket = hash(id_a,id_b) mod
      n_verify_groups`` is stamped in a narrow pass, one
      ``groupby(bucket)`` dedups cross-band pairs and derives member
      rows (same-pair copies co-locate by construction), candidate
      texts are selected by a broadcast of ONLY the distinct
      candidate ids (a flat int64 array, ≤ corpus size — never pair
      dicts) and joined to the member rows, and a final
      ``groupby(bucket)`` verifies with pairs + both texts
      co-located. No driver-side pair materialization at any corpus
      size. Size ``n_verify_groups`` so replicated candidate text
      per group (~total candidate bytes / groups) fits a worker;
      raise it at larger scale.

    Output (id_a, id_b, jaccard) is recomputable by a SQL engine's
    all-pairs shingle intersection at test scale."""
    pairs_ds = _lsh_collision_pairs(
        ds, text_col, id_col,
        num_perm=num_perm, num_bands=num_bands, k_shingle=k_shingle,
    )
    return verify_pairs_exact_jaccard(
        ds, pairs_ds, text_col, id_col,
        k_shingle=k_shingle, jaccard_threshold=jaccard_threshold,
        driver_text_limit=driver_text_limit,
        driver_pair_limit=driver_pair_limit,
        n_verify_groups=n_verify_groups,
        trace_name="minhash_verified_pairs",
    )


def verify_pairs_exact_jaccard(
    ds: "ray.data.Dataset",
    pairs_ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    k_shingle: int = 3,
    jaccard_threshold: float = 0.5,
    driver_text_limit: int = 4096,
    driver_pair_limit: int = 200_000,
    n_verify_groups: int = 512,
    trace_name: str = "verify_pairs",
) -> pd.DataFrame:
    """EXACT word k-gram Jaccard verification of a candidate-pair
    Dataset ``(id_a, id_b)`` (duplicates across generators allowed —
    deduped inside). The shared tail of ``minhash_verified_pairs``
    and ``ngram_jaccard_pairs``; see the former's docstring for the
    two tiers (bounded driver fold vs dataset-native end-to-end)."""
    import ray as _ray

    empty = pd.DataFrame(
        {"id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64),
         "jaccard": pd.Series(dtype=np.float64)}
    )
    pairs_ds = pairs_ds.materialize()
    n_raw = pairs_ds.count()
    if n_raw == 0:
        return empty

    # distinct candidate ids: per-block unique → driver np.unique.
    # A flat int64 array bounded by the corpus id count — the one
    # sanctioned driver-side artifact (pair lists/dicts never fold).
    def block_uniq(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t["id_a"].to_numpy(zero_copy_only=False),
            t["id_b"].to_numpy(zero_copy_only=False),
        ]))
        return pa.table({"mid": pa.array(u, pa.int64())})

    wanted = np.unique(
        pairs_ds.map_batches(block_uniq, batch_format="pyarrow", batch_size=None)
        .to_pandas()["mid"].to_numpy()
    )
    _dedup_trace(
        "%s tier=%s n_raw=%d n_ids=%d",
        trace_name,
        "driver" if (n_raw <= driver_pair_limit and len(wanted) <= driver_text_limit)
        else "dataset", n_raw, len(wanted),
    )

    if n_raw <= driver_pair_limit and len(wanted) <= driver_text_limit:
        cand = pairs_ds.to_pandas().drop_duplicates(["id_a", "id_b"])
        ca = cand["id_a"].to_numpy(np.int64)
        cb = cand["id_b"].to_numpy(np.int64)
        wref = _ray.put(wanted)

        def gather(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            keep = np.isin(ids, _ray.get(wref))
            return batch.select([id_col, text_col]).filter(pa.array(keep))

        texts = ds.map_batches(
            gather, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).to_pandas()
        lookup = dict(zip(texts[id_col], texts[text_col]))
        gcache = {i: _kgrams(lookup[i], k_shingle) for i in wanted if i in lookup}
        rows = []
        for a, b in zip(ca, cb):
            ga, gb = gcache.get(a), gcache.get(b)
            if ga is None or gb is None or (not ga and not gb):
                continue
            j = len(ga & gb) / len(ga | gb)
            if j >= jaccard_threshold:
                rows.append((int(a), int(b), j))
        out = pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    # ---- dataset-native tier: pairs never leave the cluster ----
    n_g = np.int64(max(1, n_verify_groups))

    def tag(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        bk = (a * np.int64(1_000_003) + b) % n_g
        return batch.append_column("bucket", pa.array(bk, pa.int64()))

    tagged = pairs_ds.map_batches(
        tag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def prep(g: pd.DataFrame) -> pa.Table:
        # same pair from several bands lands in the same bucket —
        # global dedup without any extra shuffle; member rows drive
        # the text replication join. Returns ARROW so the output
        # block type matches the shuffle's (arrow) empty blocks —
        # mixed pandas/arrow block types trip Ray's shuffle assert.
        g = g.drop_duplicates(["id_a", "id_b"])
        bk = np.int64(g["bucket"].iloc[0])
        members = np.unique(np.concatenate(
            [g["id_a"].to_numpy(np.int64), g["id_b"].to_numpy(np.int64)]
        ))
        np_, nm = len(g), len(members)
        return pa.table({
            "bucket": pa.array(np.concatenate(
                [g["bucket"].to_numpy(np.int64), np.full(nm, bk)]
            ), pa.int64()),
            "kind": pa.array(np.concatenate(
                [np.zeros(np_, np.int64), np.ones(nm, np.int64)]
            ), pa.int64()),
            "id_a": pa.array(np.concatenate(
                [g["id_a"].to_numpy(np.int64), np.full(nm, -1, np.int64)]
            ), pa.int64()),
            "id_b": pa.array(np.concatenate(
                [g["id_b"].to_numpy(np.int64), np.full(nm, -1, np.int64)]
            ), pa.int64()),
            "mid": pa.array(np.concatenate(
                [np.full(np_, -1, np.int64), members]
            ), pa.int64()),
            "text": pa.array([""] * (np_ + nm), pa.string()),
        })

    prep_ds = tagged.groupby("bucket").map_groups(
        prep, batch_format="pandas"
    ).materialize()
    pairs_part = prep_ds.filter(expr="kind == 0")
    members_ds = prep_ds.filter(expr="kind == 1")

    # Text replication join (member rows × candidate texts on mid) is
    # expressed as union + ONE coarse-keyed groupby-merge rather than
    # Dataset.join: Ray's hash-shuffle reduce emits ZERO-COLUMN empty
    # blocks for output partitions that received no groups, and
    # Dataset.join crashes on them ("No match ... FieldRef") while the
    # groupby shuffle tolerates them (map_batches BYPASSES empty
    # blocks, so they cannot be normalized away in a narrow pass).
    wref = _ray.put(wanted)
    n_att = np.int64(max(1, n_verify_groups))

    def gather(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = np.isin(ids, _ray.get(wref))
        t = batch.select([id_col, text_col]).filter(pa.array(keep))
        mid = t[0].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(t)
        return pa.table({
            "ck": pa.array(mid % n_att, pa.int64()),
            "bucket": pa.array(np.full(n, -1, dtype=np.int64)),
            "mid": pa.array(mid, pa.int64()),
            "is_text": pa.array(np.ones(n, dtype=np.bool_)),
            "text": t[1],
        })

    texts_ck = ds.map_batches(
        gather, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def member_ck(batch: pa.Table) -> pa.Table:
        mid = batch["mid"].to_numpy(zero_copy_only=False)
        n = len(batch)
        return pa.table({
            "ck": pa.array(mid % n_att, pa.int64()),
            "bucket": batch["bucket"],
            "mid": batch["mid"],
            "is_text": pa.array(np.zeros(n, dtype=np.bool_)),
            "text": pa.array([""] * n, pa.string()),
        })

    members_ck = members_ds.map_batches(
        member_ck, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def attach(g: pd.DataFrame) -> pa.Table:
        tm = g[g["is_text"]]
        mm = g[~g["is_text"]]
        merged = mm[["bucket", "mid"]].merge(
            tm[["mid", "text"]], on="mid", how="inner"
        )
        n = len(merged)
        return pa.table({
            "bucket": pa.array(merged["bucket"].to_numpy(np.int64), pa.int64()),
            "kind": pa.array(np.full(n, 1, dtype=np.int64), pa.int64()),
            "id_a": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
            "id_b": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
            "mid": pa.array(merged["mid"].to_numpy(np.int64), pa.int64()),
            "text": pa.array(merged["text"].tolist(), pa.string()),
        })

    text_rows = members_ck.union(texts_ck).groupby("ck").map_groups(
        attach, batch_format="pandas"
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        is_text = g["kind"].to_numpy() == 1
        gcache = {
            int(i): _kgrams(t, k_shingle)
            for i, t in zip(g["mid"].to_numpy()[is_text], g["text"][is_text])
        }
        rows = []
        for a, b in zip(
            g["id_a"].to_numpy()[~is_text], g["id_b"].to_numpy()[~is_text]
        ):
            ga, gb = gcache.get(int(a)), gcache.get(int(b))
            if ga is None or gb is None or (not ga and not gb):
                continue
            j = len(ga & gb) / len(ga | gb)
            if j >= jaccard_threshold:
                rows.append((int(a), int(b), j))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"]).astype(
            {"id_a": np.int64, "id_b": np.int64, "jaccard": np.float64}
        )

    out = (
        pairs_part.union(text_rows)
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return empty
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    k_shingle: int = 3,
    jaccard_threshold: float = 0.5,
    n_sub_buckets: int = 256,
    max_bucket: int = 4096,
    driver_text_limit: int = 4096,
    driver_pair_limit: int = 200_000,
    n_verify_groups: int = 512,
) -> pd.DataFrame:
    """EXACT n-gram-Jaccard similarity join: every ``(id_a < id_b)``
    pair with word ``k_shingle``-gram set Jaccard ≥ threshold — the
    exact counterpart of MinHash LSH (no banding miss probability).

    Candidate generation is the public prefix-filtering scheme
    (Chaudhuri et al. SSJoin / Bayardo et al. "Scaling Up All Pairs
    Similarity Search", WWW'07): order each document's DISTINCT
    shingle hashes by a global total order (the hash value itself);
    any pair with Jaccard ≥ t must share a shingle within each side's
    first ``n - ceil(t·n) + 1`` shingles, so only those prefix
    shingles are indexed. One groupby on the (coarse-bucketed)
    shingle hash emits same-shingle pairs, pruned by the length
    filter (``min(n_a, n_b) ≥ t·max(n_a, n_b)`` — a necessary
    condition for J ≥ t). Verification reuses the shared exact-
    Jaccard tail (``verify_pairs_exact_jaccard``), so false
    candidates cost only the verify pass and true pairs are decided
    on the real token sets.

    Exactness caveats, both documented bounds rather than silent
    drops: (a) candidate identity uses 64-bit shingle hashes — a
    cross-document hash collision (~2⁻⁶⁴ per shingle pair) can only
    ADD candidates, and a within-prefix collision could in principle
    shift a prefix boundary; (b) a prefix shingle shared by more than
    ``max_bucket`` documents caps at all-pairs-within-cap + hub star
    pairs with a WARNING (same skew guard + recall bound as the LSH
    stages; raise ``max_bucket`` or pre-drop stop-shingles for
    exactness on pathological skew). Scale shape matches the LSH
    stages: per-block vectorized prefix extraction, one bounded keyed
    shuffle of (hash, id, set-size) rows — raw text never shuffles."""
    from ..functions.text import shingle_hashes

    t = float(jaccard_threshold)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        sh, rid = shingle_hashes(batch[text_col], k=k_shingle)
        schema = {
            "gk": pa.int64(), "sh": pa.int64(), id_col: pa.int64(),
            "nsh": pa.int64(),
        }
        if len(sh) == 0:
            return pa.table({c: pa.array([], tp) for c, tp in schema.items()})
        order = np.lexsort((sh, rid))
        sh, rid = sh[order], rid[order]
        keep = np.concatenate(
            [[True], (rid[1:] != rid[:-1]) | (sh[1:] != sh[:-1])]
        )
        sh, rid = sh[keep], rid[keep]
        row_start = np.searchsorted(rid, np.arange(n))
        row_end = np.searchsorted(rid, np.arange(n), side="right")
        nsh = row_end - row_start
        # epsilon inside the ceil: if t·n is mathematically an integer
        # but fp-inflated, a spurious round-up would SHRINK the prefix
        # and could miss a true pair; rounding down only enlarges the
        # candidate set (verification is exact)
        plen = np.where(
            nsh > 0, nsh - np.ceil(t * nsh - 1e-9).astype(np.int64) + 1, 0
        )
        pos = np.arange(len(sh)) - row_start[rid]
        pmask = pos < plen[rid]
        shi = sh[pmask].view(np.int64)
        rid_p = rid[pmask]
        return pa.table(
            {
                "gk": pa.array(shi % np.int64(n_sub_buckets), pa.int64()),
                "sh": pa.array(shi, pa.int64()),
                id_col: pa.array(ids[rid_p].astype(np.int64), pa.int64()),
                "nsh": pa.array(nsh[rid_p], pa.int64()),
            }
        )

    from ._shuffle import shuffle_parallelism

    exploded = ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).repartition(shuffle_parallelism())  # narrow rows: size the
    # shuffle matrix to the cluster, not the input block count

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if len(g) < 2:
            return empty
        g = g.sort_values(["sh", id_col], kind="mergesort")
        sh = g["sh"].to_numpy()
        ids = g[id_col].to_numpy()
        nsh = g["nsh"].to_numpy()
        starts = np.flatnonzero(np.concatenate([[True], sh[1:] != sh[:-1]]))
        ends = np.concatenate([starts[1:], [len(sh)]])
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            full_e = e
            if e - s > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "prefix-shingle bucket of size %d capped at "
                    "max_bucket=%d: all-pairs within the cap + hub star "
                    "pairs beyond it (connectivity preserved; non-hub "
                    "pairs among the overflow are a recall bound)",
                    e - s, max_bucket,
                )
                e = s + max_bucket
            iu = np.triu_indices(e - s, k=1)
            na, nb = nsh[s:e][iu[0]], nsh[s:e][iu[1]]
            # length filter: J ≤ min/max, so J ≥ t needs min ≥ t·max
            # (tiny epsilon so float rounding never drops a true pair)
            lkeep = np.minimum(na, nb) + 1e-9 >= t * np.maximum(na, nb)
            out_a.append(ids[s:e][iu[0][lkeep]])
            out_b.append(ids[s:e][iu[1][lkeep]])
            if full_e > e:
                hub = np.full(full_e - e, ids[s])
                out_a.append(hub)
                out_b.append(ids[e:full_e])
        if not out_a:
            return empty
        out = pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )
        # local dedup: a pair sharing several prefix shingles in this
        # coarse group would otherwise replicate into the verify pass
        out = out.drop_duplicates(["id_a", "id_b"], ignore_index=True)
        return pa.table({
            "id_a": pa.array(out["id_a"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(out["id_b"].to_numpy(np.int64), pa.int64()),
        })

    pairs = exploded.groupby("gk").map_groups(bucket_pairs, batch_format="pandas")
    return verify_pairs_exact_jaccard(
        ds, pairs, text_col, id_col,
        k_shingle=k_shingle, jaccard_threshold=jaccard_threshold,
        driver_text_limit=driver_text_limit,
        driver_pair_limit=driver_pair_limit,
        n_verify_groups=n_verify_groups,
        trace_name="ngram_jaccard_pairs",
    )


def simhash_fingerprints(
    ds: "ray.data.Dataset", text_col: str, id_col: str, k_shingle: int = 2,
    hash_mode: str = "poly",
) -> "ray.data.Dataset":
    """Append a 64-bit SimHash column (stored as int64 bits).
    ``hash_mode="md5"`` uses the DuckDB-reproducible shingle hash
    (functions.hashing.simhash64_md5) for oracle-checked queries."""

    def add(batch: pa.Table) -> pa.Table:
        if hash_mode == "md5":
            from ..functions.hashing import simhash64_md5

            sh = simhash64_md5(batch[text_col], k=k_shingle)
        else:
            sh = simhash64(batch[text_col], k=k_shingle)
        return batch.select([id_col]).append_column(
            "simhash", pa.array(sh.view(np.int64), pa.int64())
        )

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def simhash_near_dup_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    k_shingle: int = 2,
    max_bucket: int = 256,
    n_sub_buckets: int = 256,
    hash_mode: str = "poly",
) -> "ray.data.Dataset":
    """Near-dup pairs with SimHash Hamming distance ≤ ``max_hamming``.
    Manku-style split: the 64-bit fingerprint is cut into
    ``max_hamming + 1`` chunks — by pigeonhole, any pair within the
    distance bound agrees on at least one chunk — and each chunk is
    one LSH bucket key for a single groupby. As in MinHash LSH, the
    shuffle key is the composite ``chunk·n_sub + (chunk_value mod
    n_sub)`` so per-group size is bounded (never a whole chunk
    position's rows in one call); buckets over ``max_bucket`` are
    truncated with a WARNING log."""

    n_chunks = min(16, max_hamming + 1)
    chunk_bits = 64 // n_chunks
    mask = np.uint64((1 << chunk_bits) - 1)
    fps = simhash_fingerprints(ds, text_col, id_col, k_shingle, hash_mode=hash_mode)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        chunks = np.stack(
            [((sh >> np.uint64(chunk_bits * c)) & mask).astype(np.int64) for c in range(n_chunks)],
            axis=1,
        )
        n = len(ids)
        chunk_id = np.repeat(np.arange(n_chunks, dtype=np.int64)[None, :], n, axis=0).ravel()
        ch = chunks.ravel()
        gk = chunk_id * np.int64(n_sub_buckets) + (ch % np.int64(n_sub_buckets))
        return pa.table(
            {
                "gk": pa.array(gk),
                "ch": pa.array(ch),
                id_col: pa.array(np.repeat(ids, n_chunks)),
                "simhash": pa.array(np.repeat(sh.view(np.int64), n_chunks)),
            }
        )

    from ._shuffle import shuffle_parallelism

    exploded = fps.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).repartition(shuffle_parallelism())  # narrow rows: see above

    def chunk_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One call per bounded (chunk, value mod n_sub) shard; ch
        sub-buckets paired inside (same tiny-group-overhead avoidance
        as MinHash bands)."""
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "hamming": pd.Series(dtype=np.int64)})
        if len(g) < 2:
            return empty
        g = g.sort_values(["ch", id_col], kind="mergesort")
        ch = g["ch"].to_numpy()
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().view(np.uint64)
        starts = np.flatnonzero(np.concatenate([[True], ch[1:] != ch[:-1]]))
        ends = np.concatenate([starts[1:], [len(ch)]])
        out_a, out_b, out_d = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            if e - s > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "simhash LSH bucket of size %d truncated to max_bucket=%d",
                    e - s, max_bucket,
                )
                e = s + max_bucket
            iu = np.triu_indices(e - s, k=1)
            d = hamming64(sh[s:e][iu[0]], sh[s:e][iu[1]])
            keep = d <= max_hamming
            out_a.append(ids[s:e][iu[0][keep]])
            out_b.append(ids[s:e][iu[1][keep]])
            out_d.append(d[keep])
        if not out_a:
            return empty
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b),
             "hamming": np.concatenate(out_d)}
        )

    pairs = exploded.groupby("gk").map_groups(chunk_pairs, batch_format="pandas")
    from ray.data.aggregate import Min as _Min

    return pairs.groupby(["id_a", "id_b"]).aggregate(_Min("hamming", alias_name="hamming"))


def embedding_near_dup_pairs_exact(
    ds: "ray.data.Dataset",
    emb_col: str,
    id_col: str,
    cosine_threshold: float = 0.95,
) -> pd.DataFrame:
    """EXACT embedding near-dup pairs: every (id_a < id_b) pair with
    cosine ≥ threshold. Shape: one pass collects the (small-dim)
    raw matrix + norms, ``ray.put`` broadcasts it, a second streaming
    pass matmuls each block against the broadcast side — the ANN
    brute-force pattern. Memory bound is dim×N floats on each worker
    (the verification tier; ``embedding_near_dup_pairs`` LSH is the
    unbounded-N scale path). Cosine is computed as
    dot/(norm_a·norm_b) over RAW vectors to mirror SQL
    list_cosine_similarity bit-for-bit up to summation noise."""
    import ray as _ray

    from .ann import _as_matrix

    blocks = ds.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "__m": pa.array(list(_as_matrix(b[emb_col]).astype(np.float64))),
            }
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).to_pandas()
    full = np.stack(blocks["__m"].to_numpy())
    full_ids = blocks[id_col].to_numpy(np.int64)
    order = np.argsort(full_ids)
    full, full_ids = full[order], full_ids[order]
    full_norm = np.linalg.norm(full, axis=1)
    full_norm[full_norm == 0] = 1.0
    ref = _ray.put((full, full_ids, full_norm))

    class BlockPairs:
        def __init__(self):
            self.full, self.ids, self.norms = _ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _as_matrix(batch[emb_col]).astype(np.float64)
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            nr = np.linalg.norm(emb, axis=1)
            nr[nr == 0] = 1.0
            sims = (emb @ self.full.T) / (nr[:, None] * self.norms[None, :])
            keep = (sims >= cosine_threshold) & (ids[:, None] < self.ids[None, :])
            ai, bi = np.nonzero(keep)
            return pa.table(
                {
                    "id_a": pa.array(ids[ai], pa.int64()),
                    "id_b": pa.array(self.ids[bi], pa.int64()),
                    "cosine": pa.array(sims[ai, bi], pa.float64()),
                }
            )

    pairs = ds.map_batches(
        cached_task_fn(BlockPairs, cache_on=(ref, emb_col, id_col, cosine_threshold)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).to_pandas()
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def embedding_near_dup_pairs(
    ds: "ray.data.Dataset",
    emb_col: str,
    id_col: str,
    cosine_threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    max_bucket: int = 512,
    n_sub_buckets: int = 1024,
) -> "ray.data.Dataset":
    """Near-dup pairs by embedding cosine similarity, bucketed by
    random-hyperplane LSH (sign bits of ``n_planes`` projections):
    candidate pairs share a bucket; exact cosine verifies. The
    hyperplanes derive from a fixed seed so every block buckets
    identically without shipping state. The shuffle key is ``bucket
    mod n_sub_buckets`` — bounded cardinality, each group ~1/n_sub of
    the rows, never a data-proportional slice in one call."""

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = np.stack(batch[emb_col].to_pylist()).astype(np.float64)
        dim = emb.shape[1]
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_planes))
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        unit = emb / norm
        bits = (unit @ planes) > 0
        bucket = bits @ (np.int64(1) << np.arange(n_planes, dtype=np.int64))
        return pa.table(
            {
                "coarse": pa.array((bucket % n_sub_buckets).astype(np.int64)),
                "bucket": pa.array(bucket.astype(np.int64)),
                id_col: batch[id_col],
                "unit": pa.array(list(unit.astype(np.float32))),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

    def coarse_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One call per coarse group (16); fine buckets sub-looped —
        avoids per-tiny-group map_groups overhead."""
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "cosine": pd.Series(dtype=np.float64)})
        if len(g) < 2:
            return empty
        g = g.sort_values(["bucket", id_col], kind="mergesort")
        bk = g["bucket"].to_numpy()
        ids = g[id_col].to_numpy()
        unit = np.stack(g["unit"].to_list()).astype(np.float64)
        starts = np.flatnonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))
        ends = np.concatenate([starts[1:], [len(bk)]])
        out_a, out_b, out_s = [], [], []
        for s_, e_ in zip(starts, ends):
            if e_ - s_ < 2:
                continue
            if e_ - s_ > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "embedding LSH bucket of size %d truncated to max_bucket=%d",
                    e_ - s_, max_bucket,
                )
                e_ = s_ + max_bucket
            sub = unit[s_:e_]
            sim = sub @ sub.T
            iu = np.triu_indices(e_ - s_, k=1)
            sv = sim[iu]
            keep = sv >= cosine_threshold
            out_a.append(ids[s_:e_][iu[0][keep]])
            out_b.append(ids[s_:e_][iu[1][keep]])
            out_s.append(sv[keep])
        if not out_a:
            return empty
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b),
             "cosine": np.concatenate(out_s)}
        )

    pairs = bucketed.groupby("coarse").map_groups(coarse_pairs, batch_format="pandas")
    from ray.data.aggregate import Max as _Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(_Max("cosine", alias_name="cosine"))


def connected_components(
    pairs: "ray.data.Dataset",
    id_a: str = "id_a",
    id_b: str = "id_b",
    driver_edge_limit: int = 5_000_000,
    max_iterations: int = 50,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Connected components over a near-dup pair list → per-doc
    cluster labels (component = min id in the cluster) — the cluster
    step that turns pairwise candidates (MinHash/SimHash/embedding
    pairs) into keep-one-per-cluster dedup decisions.

    Two paths by pair count:

    - ≤ ``driver_edge_limit``: union-find with path compression on
      the driver. The edge list is the minority product of dedup
      (dup-pair rate ≪ corpus size), so collecting IT — never the
      corpus — is the right call at this size: exact, one pass,
      O(E·α).
    - larger: distributed min-label propagation — per round ONE hash
      join (neighbor labels reach each node) + ONE groupby-min;
      labels only decrease, so the integer label sum is the
      convergence certificate. Rounds = graph diameter (near-dup
      clusters are small/star-like). Set ``num_partitions`` to the
      cluster's shuffle width at real scale.

    Returns (``id``, ``component``) for every node in a pair;
    singletons keep their own id by definition and need no rows."""
    import ray.data as rd
    from ray.data.aggregate import Min

    n_edges = pairs.count()
    if n_edges <= driver_edge_limit:
        df = pairs.map_batches(
            lambda t: pa.table(
                {"a": pc.cast(t[id_a], pa.int64()), "b": pc.cast(t[id_b], pa.int64())}
            ),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ).to_pandas()
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        parent = np.arange(len(nodes), dtype=np.int64)

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        ia, ib = inv[: len(a)], inv[len(a):]
        for i in range(len(ia)):
            ra, rbt = find(int(ia[i])), find(int(ib[i]))
            if ra != rbt:
                # union by smaller NODE ID so the root is the min id
                if nodes[ra] < nodes[rbt]:
                    parent[rbt] = ra
                else:
                    parent[ra] = rbt
        comp = np.array([nodes[find(i)] for i in range(len(nodes))], dtype=np.int64)
        return rd.from_arrow(
            pa.table({"id": pa.array(nodes), "component": pa.array(comp)})
        )

    edges = pairs.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [pc.cast(t[id_a], pa.int64()).combine_chunks(),
                     pc.cast(t[id_b], pa.int64()).combine_chunks()]
                ),
                "lbl": pa.concat_arrays(
                    [pc.cast(t[id_b], pa.int64()).combine_chunks(),
                     pc.cast(t[id_a], pa.int64()).combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).materialize()

    labels = (
        edges.map_batches(
            lambda t: pa.table(
                {"src": t["src"], "lbl": pc.min_element_wise(t["src"], t["lbl"])}
            ),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
        .groupby("src")
        .aggregate(Min("lbl", alias_name="component"))
        .materialize()
    )

    def label_sum(l) -> int:
        s = 0
        for bt in l.map_batches(
            lambda t: pa.table(
                {"s": pa.array([pc.sum(t["component"]).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow"):
            s += sum(x.as_py() for x in bt["s"])
        return s

    prev = label_sum(labels)
    for _ in range(max_iterations):
        lab = labels.map_batches(
            lambda t: pa.table({"lbl": t["src"], "nc": t["component"]}),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
        prop = edges.join(
            lab, join_type="inner", num_partitions=num_partitions,
            on=("lbl",), right_on=("lbl",),
        ).map_batches(
            lambda t: pa.table({"src": t["src"], "lbl": t["nc"]}),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
        merged = (
            prop.union(
                labels.map_batches(
                    lambda t: pa.table({"src": t["src"], "lbl": t["component"]}),
                    batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
                )
            )
            .groupby("src")
            .aggregate(Min("lbl", alias_name="component"))
            .materialize()
        )
        cur = label_sum(merged)
        labels = merged
        if cur == prev:
            break
        prev = cur
    return labels.map_batches(
        lambda t: pa.table({"id": t["src"], "component": t["component"]}),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
