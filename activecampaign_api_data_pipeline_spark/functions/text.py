"""Text-analysis column functions for the large-scale training-data path.

All built-in expressions (regexp/split/aggregate/transform) — no Python UDFs,
so they run inside whole-stage codegen and scale with partitions. These power
the `documents`-table operators: language-ID, quality scoring, token
counting, fingerprinting, and the shingle generator shared by the
MinHash / Jaccard dedup family (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword marker sets for the n-gram/stopword heuristic
#: language-ID. Deliberately small + deterministic (mirrors what a fastText
#: fallback heuristic does, public-knowledge approach).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "nicht"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS_EN = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for",
    "with", "as", "at", "by", "be", "this", "that", "are",
)


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    c = F.col(c) if isinstance(c, str) else c
    t = F.trim(c)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column | str) -> Column:
    """Regex word/punct segmentation, a BPE-ish proxy for LLM token counts.

    Counts maximal runs of word chars plus isolated punctuation — the common
    public heuristic (≈ GPT-2 pre-tokenizer word split) for budgeting.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_count(c, F.lit(r"\w+|[^\w\s]"))


def normalize_text(c: Column | str) -> Column:
    """Canonical text normalization: lowercase, collapse whitespace."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def char_ngrams(c: Column | str, n: int = 5, normalized: bool = False) -> Column:
    """All character n-grams (shingles) of the normalized text, as an array.

    Built from ``sequence`` + ``transform`` + ``substring`` — pure
    expressions, no UDF. Pass ``normalized=True`` with a PRE-PROJECTED
    :func:`normalize_text` column for hot paths: the lambda references the
    text per element, and an inline regexp-normalization expression gets
    re-evaluated per gram (no CSE inside higher-order lambdas, measured
    ~4×); a bound column attribute does not.
    """
    c = F.col(c) if isinstance(c, str) else c
    norm = c if normalized else normalize_text(c)
    n_sh = F.greatest(F.length(norm) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), n_sh)
    return F.when(n_sh <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: norm.substr(i, F.lit(n)))
    )


def word_ngrams(c: Column | str, n: int = 3) -> Column:
    """Word n-grams joined by single spaces (for n-gram Jaccard dedup).

    Formulated as n parallel ``slice``s folded with ``zip_with`` — a
    constant number of array scans per row. The obvious
    ``transform(sequence(...), i -> slice(toks, i, n))`` re-evaluates the
    conditional token expression per element (no CSE inside higher-order
    lambdas), which measured ~10× slower on real documents.
    """
    toks = tokens(c)
    m = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    acc = F.slice(toks, 1, m)
    for j in range(2, n + 1):
        acc = F.zip_with(acc, F.slice(toks, j, m), lambda a, b: F.concat_ws(" ", a, b))
    return acc


def punct_ratio(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    n_punct = F.length(F.regexp_replace(c, r"[^\p{Punct}]", ""))
    return F.when(F.length(c) > 0, n_punct.cast("double") / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(c: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = F.transform(tokens(c), lambda t: F.lower(t))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def lang_score(c: Column | str, lang: str) -> Column:
    """Stopword-marker hit count for one language."""
    toks = F.transform(tokens(c), lambda t: F.lower(t))
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(c: Column | str) -> Column:
    """Argmax language over marker hit counts; ties break by language code.

    Deterministic: builds ``struct(score, neg-ord)`` per language and takes
    ``greatest``; on equal score the lexicographically-smaller code wins.
    """
    langs = sorted(LANG_MARKERS)
    structs = [
        F.struct(
            lang_score(c, lg).alias("score"),
            F.lit(-i).alias("ord"),
            F.lit(lg).alias("lang"),
        )
        for i, lg in enumerate(langs)
    ]
    return F.greatest(*structs).getField("lang")


def kgram_hashes(c: Column | str, k: int = 5, normalized: bool = False) -> Column:
    """hash60 of every character k-gram — the winnowing input. Materialize
    this as its OWN projected column before folding windows over it: the
    fold references the array ``w`` times, and slices of a raw expression
    tree re-evaluate the per-gram hashing each time (no CSE), while slices
    of a bound column attribute do not."""
    from activecampaign_api_data_pipeline_spark.functions.hashing import hash60

    return F.transform(char_ngrams(c, k, normalized=normalized), lambda g: hash60(g))


def winnow_mins(hashes: Column | str, w: int = 4) -> Column:
    """Window minima over a k-gram hash array: min of every ``w``-run,
    distinct + sorted. ``w``-slice ``zip_with``/``least`` fold — constant
    array scans per row, no explode."""
    h = F.col(hashes) if isinstance(hashes, str) else hashes
    m = F.greatest(F.size(h) - F.lit(w - 1), F.lit(0))
    acc = F.slice(h, 1, m)
    for j in range(2, w + 1):
        acc = F.zip_with(acc, F.slice(h, j, m), lambda a, b: F.least(a, b))
    return F.array_sort(F.array_distinct(acc))


def winnowing_fingerprints(c: Column | str, k: int = 5, w: int = 4) -> Column:
    """Winnowing fingerprint set (MOSS-style rolling-hash selection).

    Hash every character k-gram, keep the minimum of each window of ``w``
    consecutive hashes — the classic guarantee: any shared substring of
    length ≥ k+w-1 yields at least one shared fingerprint. Convenience
    single-expression form; for large corpora project
    :func:`kgram_hashes` first and fold :func:`winnow_mins` over the
    column (see docstrings for the CSE reason).
    """
    return winnow_mins(kgram_hashes(c, k), w)


def fingerprint(c: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.

    The reference fingerprints rows via md5 of canonicalized content
    (run_ac_extraction.py:93-131); for documents we normalize (lowercase,
    collapse whitespace, strip punctuation) then md5 — catches
    formatting-only duplicates.
    """
    c = F.col(c) if isinstance(c, str) else c
    norm = F.regexp_replace(F.regexp_replace(F.lower(F.trim(c)), r"[^\w\s]", ""), r"\s+", " ")
    return F.md5(norm)


def dup_ngram_frac(c: Column | str, n: int = 2) -> Column:
    """Fraction of repeated word n-grams — the Gopher-style repetition
    signal (public rule family: "duplicate n-gram fraction").

    ``1 - distinct/total`` over word n-grams; 0.0 when the document has
    fewer than ``n`` tokens. Pure array expressions per row — no explode,
    no shuffle — so a corpus-wide repetition scan is a single linear pass.
    """
    grams = word_ngrams(c, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
    ).otherwise(F.lit(0.0))


def top_token_frac(c: Column | str) -> Column:
    """Share of the document taken by its single most frequent token
    (case-folded) — high values flag boilerplate/spam (Gopher's
    "top word fraction" rule).

    Per-row array work, zero shuffle corpus-wide: sort the tokens, then
    one ``aggregate`` pass tracks the longest equal-run —
    O(tokens log tokens) per row. (The obvious distinct×filter nested
    scan is O(tokens²) in DOCUMENT LENGTH: at a 100× corpus with 2×
    docs it was the worst scaler in SCALE_SMOKE, 54× wall — the sorted
    run-length form removed the quadratic.)
    """
    toks = F.array_sort(F.transform(tokens(c), lambda t: F.lower(t)))
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    state = F.aggregate(
        toks,
        zero,
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc.getField("best"),
                F.when(t == acc.getField("prev"), acc.getField("run") + 1).otherwise(
                    F.lit(1)
                ),
            ).alias("best"),
        ),
    )
    return F.when(
        F.size(toks) > 0,
        state.getField("best").cast("double") / F.size(toks),
    ).otherwise(F.lit(0.0))


def token_chunks(c: Column | str, size: int = 64, overlap: int = 8) -> Column:
    """Fixed-size token windows with overlap — context-packing chunker.

    Splits a document into chunks of ``size`` whitespace tokens advancing
    by ``size - overlap`` (so consecutive chunks share ``overlap`` tokens),
    as an array of structs ``(chunk_id, start, n_tokens, chunk_text)``.
    Pure expressions (sequence + slice + array_join): runs in codegen,
    per-row work is O(tokens), no shuffle — explode downstream to get one
    row per chunk. Documents shorter than ``size`` yield one chunk; empty
    documents yield none.
    """
    step = size - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than size")
    t = tokens(c)
    starts = F.when(F.size(t) == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), F.greatest(F.size(t) - overlap, F.lit(1)), F.lit(step))
    )
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_id"),
            s.alias("start"),
            F.size(F.slice(t, s, size)).alias("n_tokens"),
            F.array_join(F.slice(t, s, size), " ").alias("chunk_text"),
        ),
    )
