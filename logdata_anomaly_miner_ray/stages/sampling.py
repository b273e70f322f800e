"""Sampling: dataset fractions and bounded per-group reservoirs.

Clean-room recasts:
- AMiner caps per-variable value lists with ring buffers
  (reference: aminer/analysis/EventTypeDetector.py:31-32,
  min_num_vals=1000/max_num_vals=1500) and keeps a
  logarithmic-backoff event history (reference:
  aminer/util/History.py:49-97 LogarithmicBackoffHistory). The
  distributed analogue is a deterministic PRIORITY reservoir: each
  row gets priority u = hash64(id) and each group keeps its k
  smallest-priority rows — priorities are content-derived, so the
  per-block partial top-k merges associatively across blocks and
  reruns reproduce the same sample (bottom-k sketch).
- randomized hypothesis sampling (reference:
  aminer/analysis/EventCorrelationDetector.py:56-59
  generation_probability) ≙ ``sample_fraction``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.text import flat_utf8, token_hashes
from ..state.sketches import hash_int64


def sample_fraction(ds: "ray.data.Dataset", fraction: float, seed: int = 42):
    """Uniform row sample (Ray native)."""
    return ds.random_sample(fraction, seed=seed)


def _priorities(
    batch: pa.Table, id_col: str, seed: int, priority: str = "hash64"
) -> np.ndarray:
    col = batch[id_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if priority == "md5":
        # SQL-reproducible priority: md5 hex of the value's decimal /
        # utf8 string form — DuckDB's md5(CAST(x AS VARCHAR)).
        # Ordering the 32-char hex lexicographically equals ordering
        # the 128-bit digest numerically.
        from ..functions.hashing import md5_hex
        import pyarrow.compute as pc

        s = pc.cast(col, pa.string())
        return np.array(md5_hex(s), dtype=object)
    if pa.types.is_integer(col.type):
        return hash_int64(col.to_numpy(zero_copy_only=False), seed=seed)
    data, off = flat_utf8(col)
    h = token_hashes(data, off[:-1], off[1:])
    if seed:
        h = hash_int64(h.view(np.int64), seed=seed)
    return h


def reservoir_per_group(
    ds: "ray.data.Dataset",
    keys: list[str],
    id_col: str,
    k: int = 100,
    seed: int = 42,
    priority: str = "hash64",
) -> "ray.data.Dataset":
    """Deterministic bounded sample: per key group, the k rows with
    the smallest content-hash priority. Per-block partial top-k
    bounds the shuffle to ≤ k rows per (group, block); the final
    per-group selection is a small map_groups.

    ``priority="md5"`` uses the DuckDB-reproducible md5-hex priority
    (md5(CAST(id AS VARCHAR)), compared lexicographically) so a SQL
    oracle can recompute the exact sample; the default ``hash64`` is
    the fast splitmix64 path."""

    def partial(batch: pa.Table) -> pa.Table:
        pr = _priorities(batch, id_col, seed, priority)
        gvals = [
            np.asarray(batch[c].to_numpy(zero_copy_only=False), dtype=object).astype(str)
            for c in keys
        ]
        gkey = gvals[0]
        for g in gvals[1:]:
            gkey = np.char.add(np.char.add(gkey, "\x1f"), g)
        order = np.lexsort((pr, gkey))
        gk_s, pr_s = gkey[order], pr[order]
        starts = np.flatnonzero(np.concatenate([[True], gk_s[1:] != gk_s[:-1]]))
        keep = np.zeros(len(order), dtype=bool)
        ends = np.concatenate([starts[1:], [len(order)]])
        for a, b in zip(starts, ends):
            keep[a : min(a + k, b)] = True
        idx = order[keep]
        out = batch.take(pa.array(np.sort(idx)))
        pr_keep = pr[np.sort(idx)]
        if pr_keep.dtype == object:  # md5 hex strings
            return out.append_column("__pr", pa.array(pr_keep.tolist(), pa.string()))
        # sign-bit flip: the final merge sorts __pr as int64, which
        # must agree with the uint64 order the partial keep used
        flipped = (pr_keep ^ np.uint64(1 << 63)).view(np.int64)
        return out.append_column("__pr", pa.array(flipped, pa.int64()))

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__pr", kind="mergesort").head(k)
        return g.drop(columns=["__pr"])

    return partials.groupby(keys).map_groups(final, batch_format="pandas")


def tail_values_per_group(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    order_col: str,
    max_num_vals: int = 1500,
    min_num_vals: int = 1000,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """EXACT EventTypeDetector ring-buffer semantics (reference:
    aminer/analysis/EventTypeDetector.py:276-285): values append per
    group and, whenever the list exceeds ``max_num_vals``, it is cut
    to the LAST ``min_num_vals``. The surviving set is a
    deterministic function of the ordered sequence, computed in
    closed form per group: reductions fire at fixed positions
    (max+1, then every max−min values), so the final window is one
    slice — no per-value loop. The deterministic bottom-k
    ``reservoir_per_group`` remains the order-free distributed
    alternative; this operator is the faithful recast and needs the
    global ``order_col``."""
    import pandas as pd

    from ._agg import coarse_grouped

    step = max_num_vals - min_num_vals + 1  # appends between cuts

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby(keys, sort=False):
            sub = sub.sort_values(order_col, kind="mergesort")
            n = len(sub)
            if n <= max_num_vals:
                outs.append(sub)
                continue
            # cuts fire when the list EXCEEDS max: first after
            # max+1 values, then every max−min+1 further appends
            # (each cut resets the length to min).
            n_reds = 1 + (n - max_num_vals - 1) // step
            last_red = (max_num_vals + 1) + (n_reds - 1) * step  # values seen at last cut
            keep_from = last_red - min_num_vals
            outs.append(sub.iloc[keep_from:])
        return pd.concat(outs) if outs else g.iloc[0:0]

    return coarse_grouped(ds, keys, per_bucket, n_buckets=n_buckets)


def log_backoff_history(
    values, max_items: int, draws=None, seed: int = 42
) -> list:
    """LogarithmicBackoffHistory recast (reference:
    aminer/util/History.py:49-80): the list fills to ``max_items``;
    each further value drops ONE element — position
    ``max_items − k − 1`` where k is a geometric draw (P(k) ∝ 2^−k,
    the reference's get_log_int) — and appends the new value, so the
    kept set spans ~2^max_items items with holes growing toward the
    oldest. ``draws``: injectable iterator of k values (parity
    tests / reproducibility); default is a seeded numpy geometric
    stream truncated at max_items−1."""
    hist: list = []
    if draws is None:
        rng = np.random.default_rng(seed)

        def gen():
            while True:
                # geometric over 0..max_items-1 with P(k) ∝ 2^-k
                k = int(rng.geometric(0.5)) - 1
                yield min(k, max_items - 1)

        draws = gen()
    it = iter(draws)
    for v in values:
        if len(hist) < max_items:
            hist.append(v)
        else:
            move_pos = next(it)
            hist = hist[: max_items - move_pos - 1] + hist[max_items - move_pos:] + [v]
    return hist


def split_assign(
    ds: "ray.data.Dataset",
    id_col: str,
    boundaries: dict[str, str] | None = None,
) -> "ray.data.Dataset":
    """Deterministic train/val/test split keyed on content, not
    position: each row's split is decided by the lexicographic rank
    of ``md5(CAST(id AS VARCHAR))`` against fixed hex-prefix
    boundaries — the industry-standard stable split (the assignment
    never changes when the corpus is re-sharded, re-ordered, grown,
    or re-run, and adding documents never moves an existing one
    between splits). ``boundaries`` maps split name to an EXCLUSIVE
    upper-bound hex prefix, in ascending order; the last entry should
    bound at 'g' (> every hex digest). Default ≈ 90/5/5:
    ``{"train": "e666", "val": "f333", "test": "g"}``
    (0xe666/0x10000 = 89.99%, then 5% each).

    Shuffle-free and embarrassingly parallel (one md5 per row —
    hashlib runs at C speed; the comparison is vectorized). The SQL
    oracle is a CASE over ``md5(CAST(id AS VARCHAR))`` with the same
    hex thresholds, so the assignment is oracle-exact."""
    from ..functions.hashing import md5_hex

    if boundaries is None:
        boundaries = {"train": "e666", "val": "f333", "test": "g"}
    names = list(boundaries)
    bounds = [boundaries[n] for n in names]

    def assign(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch[id_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = np.array(md5_hex(pc.cast(col, pa.string())), dtype=object)
        split = np.full(len(h), names[-1], dtype=object)
        # assign from the last boundary down so earlier (smaller)
        # ranges overwrite: equivalent to the first-match CASE
        for name, ub in zip(names[::-1], bounds[::-1]):
            split[h < ub] = name
        return pa.table({
            id_col: col,
            "split": pa.array(split, pa.string()),
        })

    return ds.map_batches(
        assign, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def mixture_repeat(
    ds: "ray.data.Dataset",
    source_col: str = "source",
    epochs: dict[str, tuple[int, int]] | None = None,
    id_col: str = "doc_id",
    default: tuple[int, int] = (1, 1),
    priority: str = "md5",
    seed: int = 1,
) -> "ray.data.Dataset":
    """Epoch-weighted source mixture resampling — the data-mixing
    step of LLM training pipelines (per-source epoch multipliers as
    published in the Llama / GPT-3 / Pile data cards: upsample
    high-quality small sources by repeating them, downsample bulk
    web crawl). ``epochs`` maps source → EXACT rational epochs
    ``(p, q)``: every row of that source is emitted ``p // q`` times,
    plus one more iff its content hash falls below the fractional
    remainder — so a source with epochs 5/2 emits each doc 2 times
    and half the docs (deterministically, content-keyed) a 3rd time,
    and epochs 1/2 keeps a deterministic half. (0, 1) drops a source
    entirely; missing sources use ``default``.

    Output = input columns + ``copy`` (the epoch ordinal, 0-based);
    rows with 0 copies disappear. Stable: re-sharding, re-ordering,
    or growing the corpus never changes which copies an existing doc
    gets (the same property split_assign guarantees).

    ``priority="md5"`` keys the fractional coin on the first 4 hex
    nibbles of ``md5(CAST(id AS VARCHAR))`` — bit-reproducible in SQL
    (the strpos-nibble recast, cf. stages/importance.py); ``"hash64"``
    is the vectorized splitmix64 tier with identical plumbing.
    Shuffle-free: one map_batches pass, the epoch table broadcasts in
    the task closure (it is a config-sized dict)."""
    import pyarrow.compute as pc

    from ..functions.hashing import md5_hex

    ep = {s: (int(p), int(q)) for s, (p, q) in (epochs or {}).items()}
    dp, dq = int(default[0]), int(default[1])
    if dq <= 0 or any(q <= 0 for _, q in ep.values()):
        raise ValueError("epoch denominators must be positive")

    def rep(batch: pa.Table) -> pa.Table:
        col = batch[id_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if priority == "md5":
            hx = md5_hex(pc.cast(col, pa.string()))
            h16 = np.array([int(h[:4], 16) for h in hx], dtype=np.int64)
        else:
            if pa.types.is_integer(col.type):
                hu = hash_int64(col.to_numpy(zero_copy_only=False), seed=seed)
            else:
                data, off = flat_utf8(col)
                hu = token_hashes(data, off[:-1], off[1:])
            h16 = (hu % np.uint64(65536)).astype(np.int64)
        src = pd.Series(batch[source_col].to_pandas())
        p = src.map({s: v[0] for s, v in ep.items()}).fillna(dp).to_numpy(np.int64)
        q = src.map({s: v[1] for s, v in ep.items()}).fillna(dq).to_numpy(np.int64)
        n = p // q + (h16 * q < (p % q) * 65536)
        idx = np.repeat(np.arange(len(n), dtype=np.int64), n)
        gex = np.cumsum(n) - n
        copy = np.arange(len(idx), dtype=np.int64) - np.repeat(gex, n)
        out = batch.take(pa.array(idx, pa.int64()))
        return out.append_column("copy", pa.array(copy, pa.int64()))

    return ds.map_batches(
        rep, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def shuffle_shard_manifest(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    shard_size: int = 1000,
) -> "ray.data.Dataset":
    """Deterministic global training-order shuffle + fixed-size shard
    assignment — the "shuffle once, shard for the loader" step every
    LLM pretraining pipeline runs before writing training shards.
    Order = ``md5(CAST(id AS VARCHAR))`` ascending (a content-keyed
    permutation: reproducible across runs/sharding, and statistically
    uniform), then ``shard = rank // shard_size``,
    ``pos = rank % shard_size``.

    Scale shape (the pack_sequences prefix-scan pattern): one
    shuffle-free pass reduces each doc to the NARROW (id, md5-hex)
    row; a range ``sort`` on those ~48-byte rows is the only
    all-to-all; per-block (min_key, count) metadata folds on the
    driver (one row per BLOCK) into exclusive base ranks keyed by the
    block's min key (range-sorted blocks have disjoint key ranges);
    a final shuffle-free pass emits base + within-block position.
    Returns ``(id_col, shard, pos)``.
    """
    import pyarrow.compute as pc

    import ray

    from ..functions.hashing import md5_hex
    from ._taskcache import cached_task_fn

    if shard_size <= 0:
        raise ValueError("shard_size must be positive")

    def key(batch: pa.Table) -> pa.Table:
        col = batch[id_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = md5_hex(pc.cast(col, pa.string()))
        return pa.table({id_col: col, "h": pa.array(h, pa.string())})

    narrow = ds.map_batches(
        key, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).sort("h").materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_pylist()
        return pa.table({"min_h": pa.array([min(h)], pa.string()),
                         "cnt": pa.array([len(h)], pa.int64())})

    metas = narrow.map_batches(
        block_meta, batch_format="pyarrow", batch_size=None
    ).take_all()  # one row per block — bounded by partition count
    metas.sort(key=lambda r: r["min_h"])
    base, bases = 0, {}
    for m in metas:
        bases[m["min_h"]] = base
        base += int(m["cnt"])
    bases_ref = ray.put(bases)

    class Emit:
        def __init__(self, bases_ref, id_col, shard_size):
            self.bases = ray.get(bases_ref)
            self.id_col, self.S = id_col, shard_size

        def __call__(self, batch: pa.Table) -> pa.Table:
            h = np.array(batch["h"].to_pylist(), dtype=object)
            order = np.argsort(h, kind="stable")  # guard intra-block order
            rank = self.bases[h[order[0]]] + np.arange(len(h), dtype=np.int64)
            inv = np.empty_like(order)
            inv[order] = np.arange(len(h))
            rank = rank[inv]
            return pa.table({
                self.id_col: batch[self.id_col],
                "shard": pa.array(rank // self.S, pa.int64()),
                "pos": pa.array(rank % self.S, pa.int64()),
            })

    return narrow.map_batches(
        cached_task_fn(
            Emit, cache_on=(bases_ref, id_col, shard_size),
            bases_ref=bases_ref, id_col=id_col, shard_size=shard_size,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


def length_bucket_manifest(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    len_col: str = "n_chars",
    n_buckets: int = 10,
) -> "ray.data.Dataset":
    """Length-bucketed batching manifest: assign every document its
    global length quantile bucket (SQL ``ntile(B) OVER (ORDER BY
    len, id)`` EXACTLY, including ntile's earlier-buckets-get-the-
    remainder rule) — the standard sequence-length bucketing step
    before padding-efficient batch assembly (and the curriculum
    variant when consumed in bucket order).

    Scale shape = the shuffle_shard_manifest prefix-scan pattern:
    the only all-to-all is a range ``sort`` over NARROW (id, len)
    rows; per-block (first-key, count) metadata folds on the driver
    (one row per block) into exclusive base ranks; one shuffle-free
    pass emits base + within-block position, mapped through the
    closed-form ntile boundary. Returns ``(id_col, len_col,
    bucket)`` with bucket 1-based like SQL ntile."""
    import pyarrow.compute as pc  # noqa: F401

    import ray

    from ._taskcache import cached_task_fn

    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")

    narrow = ds.select_columns([id_col, len_col]).sort(
        [len_col, id_col]).materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        lens = batch[len_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        j = int(np.lexsort((ids, lens))[0])
        return pa.table({
            "min_len": pa.array([int(lens[j])], pa.int64()),
            "min_id": pa.array([int(ids[j])], pa.int64()),
            "cnt": pa.array([len(ids)], pa.int64()),
        })

    metas = narrow.map_batches(
        block_meta, batch_format="pyarrow", batch_size=None
    ).take_all()  # one row per block — bounded by partition count
    metas.sort(key=lambda r: (r["min_len"], r["min_id"]))
    base, bases = 0, {}
    for m in metas:
        bases[(m["min_len"], m["min_id"])] = base
        base += int(m["cnt"])
    total = base
    bases_ref = ray.put(bases)

    def ntile_of(rank: np.ndarray) -> np.ndarray:
        # SQL ntile: the first (total % B) buckets hold q+1 rows
        q, rem = divmod(total, n_buckets)
        cut = rem * (q + 1)
        lo = rank // (q + 1)
        hi = rem + (np.maximum(rank - cut, 0) // q if q else 0)
        return np.where(rank < cut, lo, hi).astype(np.int64) + 1

    class Emit:
        def __init__(self, bases_ref, id_col, len_col):
            self.bases = ray.get(bases_ref)
            self.id_col, self.len_col = id_col, len_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            lens = batch[self.len_col].to_numpy(zero_copy_only=False)
            ids = batch[self.id_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, lens))  # guard intra-block order
            j = order[0]
            rank = (self.bases[(int(lens[j]), int(ids[j]))]
                    + np.arange(len(ids), dtype=np.int64))
            inv = np.empty_like(order)
            inv[order] = np.arange(len(ids))
            rank = rank[inv]
            return pa.table({
                self.id_col: batch[self.id_col],
                self.len_col: batch[self.len_col],
                "bucket": pa.array(ntile_of(rank), pa.int64()),
            })

    return narrow.map_batches(
        cached_task_fn(
            Emit, cache_on=(bases_ref, id_col, len_col, n_buckets),
            bases_ref=bases_ref, id_col=id_col, len_col=len_col,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


def token_budget_allocation(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    source_col: str = "source",
    budget: int = 1_000_000,
) -> "pd.DataFrame":
    """Apportion an integer token ``budget`` across sources by the
    largest-remainder (Hamilton) method over each source's EXACT
    corpus token count — the deterministic data-mixing budget step a
    training-data card specifies (quotas sum to the budget exactly;
    no float proportion ever materializes: base = budget·n_s // T,
    the +1 seats go to the largest remainders budget·n_s mod T,
    source-name tiebreak). Proportions follow token mass, not doc
    count.

    Scale shape: ONE narrow partial pass — each block emits (source,
    n_tok) rows bounded by the block's distinct sources — merged by
    one tiny groupby; the apportionment itself is exact Python-int
    driver math over #sources rows. Returns a pandas DataFrame
    ``(source, n_tok, quota)`` sorted by source."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    _WS = r"\s+"

    def part(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern_regex(text.cast(pa.string()), _WS)
        flat = pc.list_flatten(toks)
        per_row = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # subtract empty tokens per row (leading/trailing whitespace)
        empty = pc.equal(flat, "").to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        per_row -= np.bincount(
            parent[empty], minlength=batch.num_rows).astype(np.int64)
        src = batch[source_col]
        t = pa.table({"source": src, "n_tok": pa.array(per_row, pa.int64())})
        agg = t.group_by(["source"]).aggregate([("n_tok", "sum")])
        return agg.rename_columns(["source", "n_tok"])

    totals = ds.map_batches(
        part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).groupby("source").aggregate(Sum("n_tok", alias_name="n_tok")).to_pandas()
    totals = totals.sort_values("source", kind="mergesort").reset_index(
        drop=True)

    T = int(totals["n_tok"].sum())
    if T == 0:
        totals["quota"] = np.zeros(len(totals), np.int64)
        return totals
    n_s = [int(x) for x in totals["n_tok"]]
    base = [budget * n // T for n in n_s]
    rem = [budget * n % T for n in n_s]
    extra = budget - sum(base)
    order = sorted(range(len(n_s)),
                   key=lambda i: (-rem[i], str(totals["source"][i])))
    quota = list(base)
    for i in order[:extra]:
        quota[i] += 1
    totals["quota"] = np.array(quota, np.int64)
    return totals


def temperature_mixture(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    source_col: str = "source",
    budget: int = 1_000_000,
    alpha_halves: int = 1,
) -> "pd.DataFrame":
    """Temperature-scaled mixture quotas: apportion an integer token
    ``budget`` across sources proportional to ``n_s^alpha`` with
    ``alpha = alpha_halves / 2`` — the multilingual/multi-source
    sampling-temperature scheme (Conneau & Lample 2019 / XLM-R's
    p_i ∝ n_i^α, α<1 upsamples low-resource sources; UniMax is the
    capped variant). ``alpha_halves=1`` is the classic α=0.5;
    ``alpha_halves=2`` degenerates to proportional (=
    :func:`token_budget_allocation`).

    Exactness recast: the weight is the EXACT integer
    ``isqrt(n_s^alpha_halves)`` (Python ``math.isqrt`` on arbitrary
    ints — never a float power; a float ``n**0.5`` could flip a
    largest-remainder seat). The SQL mirror computes floor(sqrt(n))
    with an explicit ±1 fix-up (``s - (s*s>n) + ((s+1)^2<=n)``), so
    both engines floor identically even where the float sqrt rounds
    up across a perfect square. Quotas then follow the same
    largest-remainder (Hamilton) apportionment as
    :func:`token_budget_allocation` over the weights (quotas sum to
    the budget exactly; remainder ties break on source name).

    Scale shape: identical to token_budget_allocation — ONE narrow
    (source, n_tok) partial pass, tiny groupby, exact Python-int
    driver math over #sources rows. Returns
    ``(source, n_tok, weight, quota)`` sorted by source."""
    import math

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    _WS = r"\s+"

    def part(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern_regex(text.cast(pa.string()), _WS)
        flat = pc.list_flatten(toks)
        per_row = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        empty = pc.equal(flat, "").to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        per_row -= np.bincount(
            parent[empty], minlength=batch.num_rows).astype(np.int64)
        t = pa.table({"source": batch[source_col],
                      "n_tok": pa.array(per_row, pa.int64())})
        agg = t.group_by(["source"]).aggregate([("n_tok", "sum")])
        return agg.rename_columns(["source", "n_tok"])

    totals = ds.map_batches(
        part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).groupby("source").aggregate(Sum("n_tok", alias_name="n_tok")).to_pandas()
    totals = totals.sort_values("source", kind="mergesort").reset_index(
        drop=True)

    w = [math.isqrt(int(n) ** alpha_halves) for n in totals["n_tok"]]
    W = sum(w)
    totals["weight"] = np.array(w, np.int64)
    if W == 0:
        totals["quota"] = np.zeros(len(totals), np.int64)
        totals["n_tok"] = totals["n_tok"].astype(np.int64)
        return totals
    base = [budget * wi // W for wi in w]
    rem = [budget * wi % W for wi in w]
    extra = budget - sum(base)
    order = sorted(range(len(w)),
                   key=lambda i: (-rem[i], str(totals["source"][i])))
    quota = list(base)
    for i in order[:extra]:
        quota[i] += 1
    totals["quota"] = np.array(quota, np.int64)
    totals["n_tok"] = totals["n_tok"].astype(np.int64)
    return totals


def politeness_manifest(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    id_col: str = "doc_id",
    n_host_buckets: int = 64,
) -> "ray.data.Dataset":
    """Crawl-frontier politeness schedule: a host-interleaved fetch
    order (round-robin across hosts) so no host is hit in bursts —
    the scheduling step of every polite crawler (cf. RFC 9309
    crawl-delay etiquette; Heritrix/Nutch frontier queues). Each URL
    gets ``seq`` = its 0-based rank WITHIN its host (content-keyed
    md5 order — reproducible, no timestamps) and ``slot`` = its
    global fetch position under ``ORDER BY (seq, host)``: slot 0..H-1
    are every host's first URL, then every host's second, and so on.
    Unparseable URLs schedule under the '(none)' pseudo-host.

    Scale shape: per-host seqs via ONE coarse-key bucketed shuffle of
    narrow (id, host, hex) rows (pandas sub-sort inside each bucket);
    the global order is a range sort over the ~60-byte composite-key
    rows + the pack_sequences/driver prefix-scan (one (min_key,
    count) row per block folds to exclusive base ranks) — nothing
    corpus-sized gathers, no global row_number materializes.
    Returns ``(id_col, host_key, seq, slot)``.
    """
    import zlib

    import pyarrow.compute as pc

    import ray

    from ..functions.hashing import md5_hex
    from ..functions.url import host_of_array
    from ._shuffle import shuffle_parallelism
    from ._taskcache import cached_task_fn

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        host = host_of_array(batch[url_col]).fill_null("(none)")
        hx = md5_hex(pc.cast(ids, pa.string()))
        bk = np.array([zlib.crc32(h.encode()) for h in host.to_pylist()],
                      dtype=np.int64) % np.int64(n_host_buckets)
        return pa.table({
            id_col: ids, "host_key": host,
            "hx": pa.array(hx, pa.string()),
            "bk": pa.array(bk, pa.int64())})

    def seq_in_host(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["host_key", "hx"], kind="mergesort")
        seq = g.groupby("host_key", sort=False).cumcount().to_numpy(np.int64)
        # composite global-order key: zero-padded seq, then host, then
        # hex (the (seq, host) pair is already unique; hex keeps the
        # key self-describing)
        key = [f"{s:012d}\x1f{h}\x1f{x}" for s, h, x in
               zip(seq.tolist(), g["host_key"], g["hx"])]
        return pa.table({
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            "host_key": pa.array(g["host_key"].tolist(), pa.string()),
            "seq": pa.array(seq, pa.int64()),
            "gkey": pa.array(key, pa.string())})

    narrow = (
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .repartition(shuffle_parallelism())
        .groupby("bk")
        .map_groups(seq_in_host, batch_format="pandas")
        .sort("gkey")
        .materialize()
    )

    def block_meta(batch: pa.Table) -> pa.Table:
        ks = batch["gkey"].to_pylist()
        return pa.table({"min_k": pa.array([min(ks)], pa.string()),
                         "cnt": pa.array([len(ks)], pa.int64())})

    metas = narrow.map_batches(
        block_meta, batch_format="pyarrow", batch_size=None
    ).take_all()  # one row per block
    metas.sort(key=lambda r: r["min_k"])
    base, bases = 0, {}
    for m in metas:
        bases[m["min_k"]] = base
        base += int(m["cnt"])
    bases_ref = ray.put(bases)

    class Emit:
        def __init__(self, bases_ref, id_col):
            self.bases = ray.get(bases_ref)
            self.id_col = id_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            ks = np.array(batch["gkey"].to_pylist(), dtype=object)
            order = np.argsort(ks, kind="stable")
            rank = self.bases[ks[order[0]]] + np.arange(len(ks),
                                                        dtype=np.int64)
            inv = np.empty_like(order)
            inv[order] = np.arange(len(ks))
            return pa.table({
                self.id_col: batch[self.id_col],
                "host_key": batch["host_key"],
                "seq": batch["seq"],
                "slot": pa.array(rank[inv], pa.int64())})

    return narrow.map_batches(
        cached_task_fn(Emit, cache_on=(bases_ref, id_col, "politeness"),
                       bases_ref=bases_ref, id_col=id_col),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def stratified_sample(
    ds: "ray.data.Dataset",
    strata_cols: Sequence[str] = ("source", "lang"),
    id_col: str = "doc_id",
    frac: tuple[int, int] = (1, 10),
) -> "ray.data.Dataset":
    """Exact stratified sample: per stratum (the distinct
    ``strata_cols`` combo) keep exactly ``ceil(num·n / den)`` rows —
    ``frac=(num, den)`` is an exact rational, no float proportion
    ever materializes — chosen by the content-keyed
    ``md5(CAST(id AS VARCHAR))`` priority ascending. Deterministic
    under re-sharding/re-ordering and SQL-reproducible as
    ``row_number() OVER (PARTITION BY strata ORDER BY md5(...)) <=
    (num*n + den - 1) // den``. This is the per-(source, lang)
    inspection/eval-split sampler a corpus QA pipeline runs (the
    reference's analogue is EventTypeDetector's per-path bounded
    value samples, reference analysis/EventTypeDetector.py:237-286).

    Scale shape: pass 1 folds per-block (strata, n) Arrow partials
    through one tiny groupby (bounded by #strata — categorical by
    definition); the per-stratum quotas are exact Python-int driver
    math broadcast once via ``ray.put``. Pass 2 keeps each block's
    local top-k_g per stratum (mergeable: top-k of local top-ks),
    bounding the shuffle to the sample size, then one small
    ``map_groups`` per stratum finishes the selection. Raw text
    never shuffles if the caller projects first."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_hex

    num, den = int(frac[0]), int(frac[1])
    if num < 0 or den <= 0:
        raise ValueError("frac must be (num>=0, den>0)")
    keys = list(strata_cols)

    def count_part(batch: pa.Table) -> pa.Table:
        t = batch.select(keys)
        agg = t.group_by(keys).aggregate([([], "count_all")])
        return agg.rename_columns([*keys, "n"])

    counts = (
        ds.map_batches(count_part, batch_format="pyarrow",
                       batch_size=None, zero_copy_batch=True)
        .groupby(keys).aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    quotas = {
        tuple(str(r[c]) for c in keys): (num * int(r["n"]) + den - 1) // den
        for _, r in counts.iterrows()
    }
    quotas_ref = ray.put(quotas)

    def _gkey(batch: pa.Table):
        gvals = [
            np.asarray(batch[c].to_numpy(zero_copy_only=False),
                       dtype=object).astype(str)
            for c in keys
        ]
        gkey = gvals[0]
        for g in gvals[1:]:
            gkey = np.char.add(np.char.add(gkey, "\x1f"), g)
        return gkey

    class _Partial:
        def __init__(self, quotas_ref, id_col):
            self.quotas = ray.get(quotas_ref)
            self.id_col = id_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch[self.id_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            pr = np.array(md5_hex(pc.cast(col, pa.string())), dtype=object)
            gkey = _gkey(batch)
            order = np.lexsort((pr, gkey))
            gk_s = gkey[order]
            starts = np.flatnonzero(
                np.concatenate([[True], gk_s[1:] != gk_s[:-1]]))
            ends = np.concatenate([starts[1:], [len(order)]])
            keep = np.zeros(len(order), dtype=bool)
            for a, b in zip(starts, ends):
                kg = self.quotas.get(tuple(gk_s[a].split("\x1f")), 0)
                keep[a : min(a + kg, b)] = True
            idx = np.sort(order[keep])
            out = batch.take(pa.array(idx))
            return out.append_column(
                "__pr", pa.array(pr[idx].tolist(), pa.string()))

    from ._taskcache import cached_task_fn

    partials = ds.map_batches(
        cached_task_fn(_Partial, cache_on=(quotas_ref, id_col, "strat"),
                       quotas_ref=quotas_ref, id_col=id_col),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        kg = quotas.get(tuple(str(g[c].iloc[0]) for c in keys), 0)
        g = g.sort_values("__pr", kind="mergesort").head(kg)
        return g.drop(columns=["__pr"])

    return partials.groupby(keys).map_groups(final, batch_format="pandas")


def group_split_assign(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    boundaries: dict[str, str] | None = None,
) -> "ray.data.Dataset":
    """LEAKAGE-SAFE train/val/test split: every row of a group (e.g.
    every document of a URL host) lands in the SAME split, because
    the assignment hashes the GROUP key, not the row id — the
    GroupShuffleSplit discipline that keeps near-duplicate pages of
    one site from straddling train and eval. Same fixed hex-prefix
    boundaries and stability guarantees as :func:`split_assign`
    (re-sharding/growth never moves an existing group). Null group
    keys must be pre-coalesced by the caller (a sentinel group —
    null would silently md5 to its own bucket per engine).

    Shuffle-free one-pass (one md5 per row on the group string);
    output (id, group, split). SQL oracle = the same CASE over
    ``md5(group)``."""
    from ..functions.hashing import md5_hex

    if boundaries is None:
        boundaries = {"train": "e666", "val": "f333", "test": "g"}
    names = list(boundaries)
    bounds = [boundaries[n] for n in names]

    def assign(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        h = np.array(md5_hex(pc.cast(g, pa.string())), dtype=object)
        split = np.full(len(h), names[-1], dtype=object)
        for name, ub in zip(names[::-1], bounds[::-1]):
            split[h < ub] = name
        return pa.table({
            id_col: batch[id_col],
            group_col: g,
            "split": pa.array(split, pa.string()),
        })

    return ds.map_batches(
        assign, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
