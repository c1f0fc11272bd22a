"""Text-analysis operators for a training-data pipeline.

All scoring columns are pure Spark SQL (codegen'd, oracle-expressible);
only the rolling fingerprint needs the uint64 kernel (pandas UDF).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from lexis_minhash_spark import kernels as K

# Tiny per-language stopword marker sets for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic so the SQL twin is exact.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "que", "los"),
}

EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from",
)


def token_count_cols(text_col: str = "text") -> list:
    """Whitespace tokens + a BPE-ish subword proxy count (runs of letters,
    digits, or single punctuation — the standard pretokenizer shape)."""
    ws = f"size(split(trim({text_col}), '\\\\s+'))"
    bpe = f"size(regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0))"
    return [
        F.expr(f"CASE WHEN length(trim({text_col})) = 0 THEN 0 ELSE {ws} END").alias("n_words"),
        F.expr(bpe).alias("n_subword_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
    ]


def with_token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), *token_count_cols(text_col))


def quality_score_cols(text_col: str = "text") -> list:
    """Heuristic quality features (Gopher/C4-style gates, SQL-only):
    word count, mean word length, punctuation ratio, stopword ratio,
    uppercase ratio, and a composite keep-flag."""
    t = text_col
    n_words = f"CASE WHEN length(trim({t})) = 0 THEN 0 ELSE size(split(trim({t}), '\\\\s+')) END"
    n_chars = f"length({t})"
    n_punct = f"length(regexp_replace({t}, '[^.,;:!?]', ''))"
    n_upper = f"length(regexp_replace({t}, '[^A-Z]', ''))"
    sw = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    n_stop = (
        f"size(filter(split(trim(lower({t})), '\\\\s+'), w -> w IN ({sw})))"
    )
    mean_wl = (
        f"CASE WHEN {n_words} = 0 THEN 0.0 ELSE"
        f" length(regexp_replace({t}, '\\\\s', '')) / CAST({n_words} AS DOUBLE) END"
    )
    return [
        F.expr(n_words).alias("n_words"),
        F.round(F.expr(mean_wl), 6).alias("mean_word_len"),
        F.round(
            F.expr(f"CASE WHEN {n_chars} = 0 THEN 0.0 ELSE {n_punct} / CAST({n_chars} AS DOUBLE) END"),
            6,
        ).alias("punct_ratio"),
        F.round(
            F.expr(f"CASE WHEN {n_words} = 0 THEN 0.0 ELSE {n_stop} / CAST({n_words} AS DOUBLE) END"),
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.expr(f"CASE WHEN {n_chars} = 0 THEN 0.0 ELSE {n_upper} / CAST({n_chars} AS DOUBLE) END"),
            6,
        ).alias("upper_ratio"),
        F.expr(
            f"({n_words} BETWEEN 4 AND 100000) AND ({mean_wl} BETWEEN 2.0 AND 15.0)"
        ).alias("quality_keep"),
    ]


def with_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), *quality_score_cols(text_col))


def langid_col(text_col: str = "text"):
    """Marker-stopword-vote language ID: the language whose marker set hits
    the most tokens wins (ties broken by fixed language order; no hits →
    'und'). Pure SQL so the DuckDB oracle matches exactly."""
    t = text_col
    toks = f"split(trim(lower({t})), '\\\\s+')"
    scores = []
    for lang, markers in LANG_MARKERS.items():
        mk = ", ".join(f"'{m}'" for m in markers)
        scores.append((lang, f"size(filter({toks}, w -> w IN ({mk})))"))
    # build CASE picking argmax in declaration order
    best = " GREATEST(" + ", ".join(s for _, s in scores) + ")"
    case = "CASE WHEN" + best + " = 0 THEN 'und' "
    for lang, s in scores:
        case += f"WHEN {s} = {best} THEN '{lang}' "
    case += "END"
    return F.expr(case).alias("lang_pred")


def with_langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), langid_col(text_col))


def fingerprint_udf(window: int = 64):
    """pandas UDF text → int64 rolling-hash document fingerprint
    (min 64-byte-window polynomial hash — content-defined, stable under
    small appends; kernel: kernels.rolling_fingerprint)."""

    @pandas_udf(LongType())
    def _fp(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            vals = np.fromiter(
                (K.rolling_fingerprint(t if isinstance(t, str) else "", window) for t in texts),
                dtype=np.uint64,
                count=len(texts),
            )
            yield pd.Series(vals.view(np.int64))

    return _fp


def with_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", window: int = 64) -> DataFrame:
    return df.select(id_col, text_col).withColumn(
        "fingerprint", fingerprint_udf(window)(F.col(text_col))
    )
