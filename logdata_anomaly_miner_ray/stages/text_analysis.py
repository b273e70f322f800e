"""Text analysis stages: language-ID, quality scoring, token
counting, document fingerprinting.

Training-data-pipeline extensions (first-class per the build brief).
Quality/token kernels are single-pass Arrow-buffer numpy
(functions.text); language-ID is an actor-pool stage (stopword
regexes compiled once per actor — the AMiner pattern of loading
detector state at startup, reference:
aminer/input/InputInterfaces.py:70-386 kwargs/persistence init).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.hashing import fingerprint_min_k, simhash64
from ..functions.text import char_class_fractions, token_counts

# tiny built-in stopword profiles — heuristic langid, not a model
_STOPWORDS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was|are)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|von|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|des|dans|pour|que|pas)\b",
    "es": r"\b(el|la|los|las|es|una|del|para|con|por|que)\b",
}


def with_token_stats(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Append n_tokens + char-class fraction columns (one buffer
    pass per block)."""

    def add(batch: pa.Table) -> pa.Table:
        tc = token_counts(batch[text_col])
        fr = char_class_fractions(batch[text_col])
        out = batch.append_column("n_tokens", pa.array(tc, pa.int64()))
        for name, arr in fr.items():
            t = pa.int64() if arr.dtype.kind == "i" else pa.float64()
            out = out.append_column(name, pa.array(arr, t))
        return out

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def chunk_documents(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
) -> "ray.data.Dataset":
    """Token-aligned document chunking — the standard preprocessing
    row explosion before embedding / context-window packing: every
    document splits into consecutive ``max_tokens``-token chunks
    (final chunk shorter; zero-token documents emit nothing; chunk
    text is the tokens joined by single spaces, i.e. whitespace-
    normalizing). Returns ``(id_col, chunk_ord, n_tok, chunk_text)``.

    Embarrassingly parallel (no shuffle): the explosion happens
    per-block via ``functions.text.chunk_rows`` (one tokenization
    pass + one gather/scatter byte assembly, no per-row Python)."""
    from ..functions.text import chunk_rows

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        chunks, rid, cord, wlen = chunk_rows(batch[text_col], max_tokens)
        return pa.table(
            {
                id_col: pa.array(ids[rid].astype(np.int64), pa.int64()),
                "chunk_ord": pa.array(cord, pa.int64()),
                "n_tok": pa.array(wlen, pa.int64()),
                "chunk_text": chunks,
            }
        )

    return ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def with_quality_score(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    min_tokens: int = 5,
    score_name: str = "quality",
) -> "ray.data.Dataset":
    """Composite [0,1] heuristic quality score: rewards alphabetic
    mass and mid-length docs, penalizes punctuation/digit overload —
    the usual web-text pre-filter signals."""

    def add(batch: pa.Table) -> pa.Table:
        score = quality_scores(batch[text_col], min_tokens)
        return batch.append_column(score_name, pa.array(score, pa.float64()))

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def quality_scores(col, min_tokens: int = 5) -> np.ndarray:
    """The composite [0,1] quality score as a plain array (shared by
    ``with_quality_score`` and ``corpus_report``)."""
    tc = token_counts(col).astype(np.float64)
    fr = char_class_fractions(col)
    length_score = np.clip(tc / 100.0, 0, 1) * (tc >= min_tokens)
    alpha_score = np.clip(fr["alpha_frac"] / 0.7, 0, 1)
    punct_pen = np.clip(1.0 - 2.0 * fr["punct_frac"], 0, 1)
    digit_pen = np.clip(1.0 - 2.0 * fr["digit_frac"], 0, 1)
    return 0.25 * length_score + 0.35 * alpha_score + 0.2 * punct_pen + 0.2 * digit_pen


# (name, RE2 pattern, mask token). SSN before the lookalike phone
# shape; the \b anchors make the two digit-group layouts disjoint.
# Patterns follow the public Dolma-style PII masking recipe
# (Soldaini et al. 2024: email/IP/phone regex -> special tokens);
# AMiner's analogue is value-rewrite sanitization in event output
# (reference aminer/events/EventData.py render pipeline).
DEFAULT_PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def with_pii_redaction(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PII_PATTERNS,
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """Mask PII spans with typed tokens and append per-type match
    counts (``n_<name>`` int64 columns). One shuffle-free pass; the
    kernels are RE2 via ``pc.count_substring_regex`` /
    ``pc.replace_substring_regex`` on the zero-copy string column —
    the same engine DuckDB's regexp_* use, so the SQL oracle matches
    bit-for-bit.

    Semantics (mirrored exactly by the oracle): counts are measured
    on the ORIGINAL text per pattern; replacements apply
    sequentially in pattern order (a span consumed by an earlier
    pattern can still be counted by a later one — e.g. an IPv4-like
    email domain counts under both)."""
    import pyarrow.compute as pc

    dst = out_col or text_col

    def add(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        red = txt
        counts = []
        for name, pat, tok in patterns:
            counts.append(
                (f"n_{name}", pc.cast(pc.count_substring_regex(txt, pattern=pat), pa.int64()))
            )
            red = pc.replace_substring_regex(red, pattern=pat, replacement=tok)
        cols = {c: batch[c] for c in batch.column_names}
        cols[dst] = red
        cols.update(counts)
        return pa.table(cols)

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


class LangIdScorer:
    """Actor-pool language-ID: stopword regex hit-rates per language
    + CJK codepoint share. Arrow-native: counts come from RE2 via
    ``pc.count_substring_regex`` on the zero-copy string column (no
    per-row pandas object loop), which also matches the SQL oracle's
    RE2 ``regexp_extract_all`` semantics exactly. Tie-break on equal
    scores is first-in-order of ``_STOPWORDS``."""

    def __init__(self):
        self.langs = list(_STOPWORDS)
        self.patterns = [_STOPWORDS[lang] for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = pc.fill_null(batch["text"], "")
        lower = pc.utf8_lower(text)
        n_tok = np.maximum(token_counts(lower), 1).astype(np.float64)
        scores = np.stack(
            [
                pc.count_substring_regex(lower, rx).to_numpy(zero_copy_only=False)
                / n_tok
                for rx in self.patterns
            ],
            axis=1,
        )
        n_chars = np.maximum(
            pc.utf8_length(text).to_numpy(zero_copy_only=False), 1
        ).astype(np.float64)
        cjk = (
            pc.count_substring_regex(lower, r"[一-鿿]").to_numpy(zero_copy_only=False)
            / n_chars
        )
        best_idx = np.argmax(scores, axis=1)  # first max wins ties
        best_score = scores[np.arange(len(scores)), best_idx]
        best_lang = np.asarray(self.langs, dtype=object)[best_idx]
        pred = np.where(cjk > 0.2, "zh", np.where(best_score > 0.01, best_lang, "xx"))
        return batch.append_column(
            "pred_lang", pa.array(pred.astype(object), pa.string())
        ).append_column(
            "lang_score",
            pa.array(np.where(cjk > 0.2, cjk, best_score), pa.float64()),
        )

    @staticmethod
    def apply(ds: "ray.data.Dataset", batch_size: int = 4096):
        # task-based with per-worker construction cache (regex state
        # is cheap): see stages/_taskcache.py for why not a pool
        from ._taskcache import cached_task_fn

        return ds.map_batches(
            cached_task_fn(LangIdScorer),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )


def corpus_report(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
    n_chars_col: str = "n_chars",
    quality_hi_e6: int = 500_000,
) -> "pd.DataFrame":
    """The per-(source, lang) corpus card: one fused pass computes
    every per-doc signal (token count, quality score, language-ID
    prediction) and pre-aggregates per block by the tiny
    (source, lang) key, so only ≤ |sources × langs| partial rows per
    block leave the workers — the partial/combiner pattern for a
    bounded group key (no dataset shuffle at all; the final merge is
    a driver fold over key-space × n_blocks rows). Quality is
    thresholded on the e6-ROUNDED integer (``quality_hi_e6``) so the
    count is reproducible bit-exactly in SQL.

    Returns a pandas DataFrame: (source, lang, n_docs, sum_tokens,
    min_tokens, max_tokens, sum_chars, n_quality_hi, n_lang_match).
    """
    import pandas as pd

    from ._taskcache import cached_task_fn

    class Partial:
        def __init__(self, text_col, source_col, lang_col, n_chars_col, hi):
            self.lid = LangIdScorer()
            self.text_col, self.source_col = text_col, source_col
            self.lang_col, self.n_chars_col = lang_col, n_chars_col
            self.hi = hi

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            scored = self.lid(
                batch if self.text_col == "text"
                else batch.append_column("text", batch[self.text_col])
            )
            q_e6 = np.round(
                quality_scores(batch[self.text_col]) * 1e6).astype(np.int64)
            # Arrow-native group_by (the stages/vocab.py:52 pattern) —
            # no pandas round-trip inside the per-block hot path
            t = pa.table(
                {
                    "source": batch[self.source_col],
                    "lang": batch[self.lang_col],
                    "n_tok": pa.array(
                        token_counts(batch[self.text_col]).astype(np.int64),
                        pa.int64()),
                    "n_chars": batch[self.n_chars_col],
                    "q_hi": pa.array(
                        (q_e6 >= self.hi).astype(np.int64), pa.int64()),
                    "l_match": pc.cast(
                        pc.fill_null(pc.equal(scored["pred_lang"],
                                              batch[self.lang_col]), False),
                        pa.int64()),
                }
            )
            g = t.group_by(["source", "lang"]).aggregate(
                [("n_tok", "count"), ("n_tok", "sum"), ("n_tok", "min"),
                 ("n_tok", "max"), ("n_chars", "sum"), ("q_hi", "sum"),
                 ("l_match", "sum")]
            )
            return g.rename_columns(
                ["source", "lang", "n_docs", "sum_tokens", "min_tokens",
                 "max_tokens", "sum_chars", "n_quality_hi", "n_lang_match"])

    parts = ds.map_batches(
        cached_task_fn(
            Partial,
            cache_on=(text_col, source_col, lang_col, n_chars_col,
                      quality_hi_e6, "corpus_report"),
            text_col=text_col, source_col=source_col, lang_col=lang_col,
            n_chars_col=n_chars_col, hi=quality_hi_e6,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).to_pandas()  # ≤ key-space × n_blocks rows by construction
    out = parts.groupby(["source", "lang"], sort=True).agg(
        n_docs=("n_docs", "sum"), sum_tokens=("sum_tokens", "sum"),
        min_tokens=("min_tokens", "min"), max_tokens=("max_tokens", "max"),
        sum_chars=("sum_chars", "sum"), n_quality_hi=("n_quality_hi", "sum"),
        n_lang_match=("n_lang_match", "sum"),
    ).reset_index()
    for c in out.columns[2:]:
        out[c] = out[c].astype(np.int64)
    return out


def with_fingerprints(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Append rolling-hash document fingerprints: winnowing min-k
    fold + SimHash (both int64 bit-patterns)."""

    def add(batch: pa.Table) -> pa.Table:
        fp = fingerprint_min_k(batch[text_col])
        sh = simhash64(batch[text_col])
        return batch.append_column(
            "fingerprint", pa.array(fp.view(np.int64), pa.int64())
        ).append_column("simhash", pa.array(sh.view(np.int64), pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def repetition_stats(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Gopher/C4-style repetition quality counters per document —
    the duplicate-line and most-common-2-gram filters of web-corpus
    cleaning (Rae et al. 2021 "Scaling Language Models" quality
    heuristics; MassiveText filter family), emitted as EXACT
    integers so downstream fractions (dup_line_frac = n_dup_lines /
    n_lines, top_2gram_frac = top_2gram_n / n_2grams) carry no
    float-rounding ambiguity:

    - ``n_lines`` / ``n_dup_lines``: non-empty ``\\n``-split lines
      and how many of them are repeats of an earlier line;
    - ``n_2grams`` / ``top_2gram_n``: word 2-grams over ``\\s+``
      tokens and the multiplicity of the most frequent one.

    Embarrassingly parallel (no shuffle): pandas value_counts per
    block. Matches the SQL oracle's string_split/lead shingles."""

    def add(batch: pa.Table) -> pa.Table:
        n_lines, n_dup, n_grams, top_gram = repetition_arrays(batch[text_col])
        return pa.table(
            {
                id_col: batch[id_col],
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_dup_lines": pa.array(n_dup, pa.int64()),
                "n_2grams": pa.array(n_grams, pa.int64()),
                "top_2gram_n": pa.array(top_gram, pa.int64()),
            }
        )

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def repetition_arrays(col) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-row repetition counters for one Arrow string column:
    (n_lines, n_dup_lines, n_2grams, top_2gram_n).

    Fully vectorized (no per-document Python loop): the batch's lines
    and whitespace tokens are flattened into ONE flat string array
    each with a parallel row-id array (the same flat-column trick as
    functions.text.flat_utf8), ``pd.factorize`` interns the strings
    into integer codes once per batch (C hash table — codes identify
    EXACT strings, not digests), and the per-row distinct / top-count
    reductions become packed-int64 ``np.unique`` + ``bincount`` /
    ``maximum.at``. Tokenization uses ``pc.ascii_split_whitespace``
    (Arrow ASCII whitespace = ``[ \\t\\n\\v\\f\\r]`` = Python
    ``re.ASCII \\s``; ~5x faster than the RE2 split and byte-for-byte
    the same tokens — Python ``str.split()`` would also split unicode
    spaces, which the DuckDB oracle's RE2 does not)."""
    import pyarrow.compute as pc

    n = len(col)
    n_lines = np.zeros(n, dtype=np.int64)
    n_dup = np.zeros(n, dtype=np.int64)
    n_grams = np.zeros(n, dtype=np.int64)
    top_gram = np.zeros(n, dtype=np.int64)
    if n == 0:
        return n_lines, n_dup, n_grams, top_gram
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")

    def _flatten(list_arr):
        flat = pc.list_flatten(list_arr).to_numpy(zero_copy_only=False)
        per_row = pc.list_value_length(list_arr).to_numpy(zero_copy_only=False)
        row_id = np.repeat(np.arange(n, dtype=np.int64), per_row)
        keep = flat != ""
        return row_id[keep], flat[keep]

    # --- duplicate lines: distinct (row, line) pairs per row ---
    row_id_l, lines_np = _flatten(pc.split_pattern(col, "\n"))
    if len(row_id_l):
        n_lines[:] = np.bincount(row_id_l, minlength=n)
        codes, uniq = pd.factorize(lines_np)
        distinct_keys = np.unique(row_id_l * len(uniq) + codes)
        n_dup[:] = n_lines - np.bincount(distinct_keys // len(uniq), minlength=n)

    # --- 2-grams: pair consecutive tokens within a row ---
    row_id_t, toks_np = _flatten(pc.ascii_split_whitespace(col))
    if len(row_id_t):
        n_tok = np.bincount(row_id_t, minlength=n)
        n_grams[:] = np.where(n_tok >= 2, n_tok - 1, 0)
        same = row_id_t[1:] == row_id_t[:-1]
        if same.any():
            tcodes, tuniq = pd.factorize(toks_np)
            tcodes = tcodes.astype(np.int64)
            pair = tcodes[:-1][same] * len(tuniq) + tcodes[1:][same]
            pcodes, puniq = pd.factorize(pair)
            keys, cnt = np.unique(
                row_id_t[:-1][same] * len(puniq) + pcodes, return_counts=True
            )
            np.maximum.at(top_gram, keys // len(puniq), cnt)
    return n_lines, n_dup, n_grams, top_gram


def c4_line_filter(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_lines: int = 5,
    terminal_re: str = r'[.!?"]$',
    blocklist: tuple = ("javascript", "lorem ipsum", "{"),
) -> "ray.data.Dataset":
    """C4-style line-level cleaning REWRITE (Raffel et al. 2020 §2.2,
    the published C4 heuristics; also the line-wise stage of
    RefinedWeb): keep only lines that (a) end in a terminal
    punctuation mark, (b) have at least ``min_words`` words, and
    (c) contain no blocklist phrase (case-insensitive literal match;
    C4 uses "javascript" / "lorem ipsum" / "{"); then drop any
    document with fewer than ``min_lines`` surviving lines.

    Returns ``(id_col, clean_text, n_lines, n_kept)`` — clean text =
    kept lines joined by '\\n', one row per SURVIVING document.

    Fully vectorized and shuffle-free: ONE map_batches pass per
    block does split_pattern → flat line array + parent indices,
    three RE2 predicates on the flat array, and a ListArray rebuild +
    binary_join — no per-row Python anywhere (the idiom of
    functions/text.flat_utf8). Every predicate is an RE2 the DuckDB
    oracle reproduces verbatim."""
    import re as _re

    import pyarrow.compute as pc

    block_re = "(?i)" + "|".join(_re.escape(b) for b in blocklist)

    def f(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = txt.cast(pa.string())
        lines = pc.split_pattern(txt, "\n")
        n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lines)
        parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        nrows = batch.num_rows

        keep = pc.match_substring_regex(flat, terminal_re).to_numpy(
            zero_copy_only=False)
        nw = pc.count_substring_regex(flat, r"\S+").to_numpy(
            zero_copy_only=False)
        keep &= nw >= min_words
        keep &= ~pc.match_substring_regex(flat, block_re).to_numpy(
            zero_copy_only=False)

        kept_parent = parent[keep]
        n_kept = np.bincount(kept_parent, minlength=nrows).astype(np.int64)
        kept_flat = flat.filter(pa.array(keep))
        offsets = np.concatenate(
            [[0], np.cumsum(n_kept)]).astype(np.int32)
        rebuilt = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), kept_flat)
        clean = pc.binary_join(rebuilt, "\n")

        gate = n_kept >= min_lines
        idx = pa.array(np.flatnonzero(gate), pa.int64())
        return pa.table({
            id_col: batch[id_col].combine_chunks().take(idx)
            if isinstance(batch[id_col], pa.ChunkedArray)
            else batch[id_col].take(idx),
            "clean_text": clean.take(idx),
            "n_lines": pa.array(n_lines[gate].astype(np.int64), pa.int64()),
            "n_kept": pa.array(n_kept[gate], pa.int64()),
        })

    return ds.map_batches(
        f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def gopher_rules(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Gopher/MassiveText document-quality rules (Rae et al. 2021,
    appendix A1.1) as EXACT integer comparisons — no float ratio ever
    materializes, so the SQL oracle reproduces every flag bit-exactly:

    - word count in [50, 100000]
    - mean word length in [3, 10]       (3·n_words ≤ chars ≤ 10·n_words)
    - hash-symbol ratio ≤ 0.1           (10·n_hash ≤ n_words)
    - ellipsis ratio ≤ 0.1              (10·n_ell ≤ n_words)
    - ≤ 90% of lines start with a bullet (10·n_bullet ≤ 9·n_lines)
    - ≤ 30% of lines end with an ellipsis (10·n_ellend ≤ 3·n_lines)
    - ≥ 80% of words contain a letter    (5·n_alpha ≥ 4·n_words)
    - ≥ 2 distinct stop words of {the, be, to, of, and, that, have, with}

    Returns one row per document with every raw counter plus the
    composed ``keep`` verdict (counters kept so downstream can
    re-threshold without re-scanning — flags are never silently
    folded away). ONE shuffle-free vectorized pass: RE2 counts over
    the text and over the '\\n'-exploded flat line array (the
    c4_line_filter geometry); tokens = RE2 ``\\S+`` runs, identical
    to the DuckDB split. Bullet chars: ``-``, ``*``, ``•`` followed
    by a space (leading spaces allowed); ellipsis = ``...`` or ``…``.
    """
    import pyarrow.compute as pc

    _WS_CLASS = r"[\t\n\f\r ]"  # RE2 \s, spelled out for the oracle
    stop = ("the", "be", "to", "of", "and", "that", "have", "with")

    def f(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = txt.cast(pa.string())
        n = len(txt)

        n_words = pc.count_substring_regex(txt, r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_chars = pc.utf8_length(txt).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_ws = pc.count_substring_regex(txt, _WS_CLASS).to_numpy(
            zero_copy_only=False).astype(np.int64)
        word_chars = n_chars - n_ws
        n_hash = pc.count_substring(txt, "#").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_ell = (
            pc.count_substring_regex(txt, r"\.\.\.").to_numpy(
                zero_copy_only=False)
            + pc.count_substring(txt, "…").to_numpy(zero_copy_only=False)
        ).astype(np.int64)

        lines = pc.split_pattern(txt, "\n")
        flat = pc.list_flatten(lines)
        parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        n_lines = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        bullet = pc.match_substring_regex(flat, r"^ *[-*•] ").to_numpy(
            zero_copy_only=False)
        ellend = pc.match_substring_regex(flat, r"(\.\.\.|…)$").to_numpy(
            zero_copy_only=False)
        n_bullet = np.bincount(parent[bullet], minlength=n).astype(np.int64)
        n_ellend = np.bincount(parent[ellend], minlength=n).astype(np.int64)

        # words containing at least one ASCII letter
        n_alpha = pc.count_substring_regex(
            txt, r"\S*[A-Za-z]\S*").to_numpy(
            zero_copy_only=False).astype(np.int64)

        n_stop = np.zeros(n, np.int64)
        for w in stop:
            hit = pc.match_substring_regex(
                txt, rf"(^|{_WS_CLASS}){w}({_WS_CLASS}|$)").to_numpy(
                zero_copy_only=False)
            n_stop += hit.astype(np.int64)

        keep = (
            (n_words >= 50) & (n_words <= 100_000)
            & (3 * n_words <= word_chars) & (word_chars <= 10 * n_words)
            & (10 * n_hash <= n_words) & (10 * n_ell <= n_words)
            & (10 * n_bullet <= 9 * n_lines)
            & (10 * n_ellend <= 3 * n_lines)
            & (5 * n_alpha >= 4 * n_words)
            & (n_stop >= 2)
        )
        cols = {
            id_col: batch[id_col],
            "n_words": n_words, "word_chars": word_chars,
            "n_hash": n_hash, "n_ell": n_ell, "n_lines": n_lines,
            "n_bullet": n_bullet, "n_ellend": n_ellend,
            "n_alpha": n_alpha, "n_stop": n_stop,
            "keep": keep.astype(np.int64),
        }
        return pa.table({k: (v if isinstance(v, (pa.Array, pa.ChunkedArray))
                             else pa.array(v, pa.int64()))
                         for k, v in cols.items()})

    return ds.map_batches(
        f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def lexicon_classify(
    ds: "ray.data.Dataset",
    lexicon: dict[str, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    none_label: str = "(none)",
) -> "ray.data.Dataset":
    """Keyword-lexicon topic routing: per document, count exact
    (lowercased, whitespace-delimited) token matches against each
    topic's keyword list and assign the argmax topic — the cheap
    topic/domain bucketing step curation pipelines run before
    per-topic quotas (the keyword stage of FineWeb-Edu-style
    classifiers; the reference's analogue is
    MatchValueFilter/AllowlistViolationDetector dispatching on
    learned value sets, reference analysis/AllowlistViolationDetector
    .py:20-78). Ties break on topic name ascending; zero-hit
    documents get ``none_label``. Output (id, topic, n_hits).

    Scale shape: the lexicon broadcasts once via ``ray.put`` (small
    by definition); ONE shuffle-free vectorized pass — lower → RE2
    ``\\s+`` split (ASCII semantics == DuckDB) → flat searchsorted
    against the sorted keyword array → one bincount over
    (row, topic) — no per-row Python, no shuffle. SQL-reproducible:
    the oracle joins unnested tokens against a VALUES lexicon."""
    import pyarrow.compute as pc

    import ray

    from ._taskcache import cached_task_fn

    topics = sorted(lexicon)
    kw_list, kw_topic = [], []
    for ti, t in enumerate(topics):
        for w in lexicon[t]:
            kw_list.append(w.lower())
            kw_topic.append(ti)
    kw = np.array(kw_list, dtype=object)
    kt = np.array(kw_topic, dtype=np.int64)
    order = np.argsort(kw, kind="mergesort")
    if len(kw) != len(np.unique(kw)):
        raise ValueError("lexicon keywords must be unique across topics")
    lex_ref = ray.put((kw[order], kt[order], np.array(topics, dtype=object)))

    class _Classify:
        def __init__(self, lex_ref, text_col, id_col, none_label):
            self.kw, self.kt, self.topics = ray.get(lex_ref)
            self.text_col, self.id_col = text_col, id_col
            self.none_label = none_label

        def __call__(self, batch: pa.Table) -> pa.Table:
            text = batch[self.text_col]
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            toks = pc.split_pattern_regex(
                pc.utf8_lower(text.cast(pa.string())), r"\s+")
            flat = np.asarray(pc.list_flatten(toks), dtype=object)
            parent = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False)
            n = batch.num_rows
            T = len(self.topics)
            if len(flat) and len(self.kw):
                pos = np.searchsorted(self.kw, flat)
                pos = np.clip(pos, 0, len(self.kw) - 1)
                hit = self.kw[pos] == flat
                cells = parent[hit] * T + self.kt[pos[hit]]
                counts = np.bincount(cells, minlength=n * T).reshape(n, T)
            else:
                counts = np.zeros((n, T), dtype=np.int64)
            best = counts.argmax(axis=1)  # first max == topic-name asc
            nh = counts[np.arange(n), best].astype(np.int64)
            topic = self.topics[best]
            topic[nh == 0] = self.none_label
            return pa.table({
                self.id_col: batch[self.id_col],
                "topic": pa.array(topic.tolist(), pa.string()),
                "n_hits": pa.array(nh, pa.int64()),
            })

    return ds.map_batches(
        cached_task_fn(_Classify,
                       cache_on=(lex_ref, text_col, id_col, none_label,
                                 "lexicon"),
                       lex_ref=lex_ref, text_col=text_col, id_col=id_col,
                       none_label=none_label),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


def _repair_mojibake_str(s: str) -> str:
    """One UTF-8-as-cp1252/latin-1 double-encoding unwind: re-encode
    the string's codepoints as the 8-bit bytes they were mistaken
    for, then decode those bytes as the UTF-8 they originally were.
    Strict both ways — any failure returns the input unchanged (a
    string that is not actually mojibake almost never survives both
    strict steps, the ftfy heuristic)."""
    for enc in ("cp1252", "latin-1"):
        try:
            b = s.encode(enc)
        except UnicodeEncodeError:
            continue
        try:
            return b.decode("utf-8")
        except UnicodeDecodeError:
            return s
    return s


def fix_mojibake(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Detect and repair UTF-8-as-cp1252/latin-1 double-encoded text
    ('cafÃ©' → 'café', 'â€™' → '’') — the ftfy/encoding-repair step
    CCNet- and FineWeb-style cleaning runs before any other text
    work (the reference's analogue is CharsetDetector learning legal
    byte sets per path, reference analysis/CharsetDetector.py:20-86;
    here the illegal pattern is repaired, not just flagged). Output
    (id, fixed_text, was_fixed). Repair is whole-string and strict:
    if the unwound bytes are not valid UTF-8 the row is returned
    UNCHANGED (never a lossy partial fix).

    Scale shape: ONE shuffle-free pass; the ASCII fast path
    (``pc.string_is_ascii``, the normalize_nfc_lower pattern) skips
    the per-row repair entirely for ASCII blocks — ASCII strings are
    fixed points of the unwind by construction, so the fast path is
    exact, and the per-row Python touches only the (rare) non-ASCII
    rows."""
    import pyarrow.compute as pc

    def fix(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = text.cast(pa.string())
        na = pc.fill_null(pc.invert(pc.string_is_ascii(text)), False)
        na_np = na.to_numpy(zero_copy_only=False)
        if na_np.any():
            vals = np.asarray(text.to_numpy(zero_copy_only=False),
                              dtype=object)
            out = vals.copy()
            idx = np.flatnonzero(na_np)
            fixed_mask = np.zeros(len(vals), dtype=bool)
            for i in idx:
                r = _repair_mojibake_str(vals[i])
                if r != vals[i]:
                    out[i] = r
                    fixed_mask[i] = True
            fixed_col = pa.array(out.tolist(), pa.string())
            was = pa.array(fixed_mask)
        else:
            fixed_col = text
            was = pa.array(np.zeros(batch.num_rows, dtype=bool))
        return pa.table({
            id_col: batch[id_col],
            "fixed_text": fixed_col,
            "was_fixed": was,
        })

    return ds.map_batches(fix, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
