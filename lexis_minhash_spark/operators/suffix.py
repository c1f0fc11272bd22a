"""Suffix-array exact-substring matching (north-star extension).

Methodology follows Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better"): find pairs of documents sharing an exact substring
of at least ``min_len`` characters.  At 100 TB you never build one global
suffix array; you build one per *candidate group* (LSH cluster / band
bucket), which keeps every group's text in one task's memory.  Expressed as
``groupBy(group_id).applyInPandas`` so Spark shuffles each group to one task
and the per-group kernel is plain NumPy/Python.

The per-group kernel concatenates member texts with unique separators,
builds a suffix array (sorted suffixes), and scans adjacent suffixes from
*different* documents for common prefixes >= min_len — the classic
cross-document LCP scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MATCH_SCHEMA = StructType(
    [
        StructField("a", LongType(), False),
        StructField("b", LongType(), False),
        StructField("common_len", IntegerType(), False),
        StructField("substring", StringType(), True),
    ]
)


def _lcp(s: str, i: int, j: int) -> int:
    n = len(s)
    k = 0
    while i + k < n and j + k < n and s[i + k] == s[j + k]:
        k += 1
    return k


def _group_matches(pdf: pd.DataFrame, min_len: int, emit_substring: bool) -> pd.DataFrame:
    """Suffix-array cross-document LCP scan for one candidate group."""
    docs = list(zip(pdf["doc_id"].tolist(), pdf["text"].astype(str).tolist()))
    if len(docs) < 2:
        return pd.DataFrame({c.name: pd.Series(dtype="object") for c in MATCH_SCHEMA})
    # concatenate with \x00 separators (cannot appear in transcripts); track
    # per-position owner doc
    parts = []
    owners = []
    pos = 0
    for doc_id, text in docs:
        parts.append(text)
        owners.append((pos, pos + len(text), doc_id))
        pos += len(text) + 1
        parts.append("\x00")
    s = "".join(parts)

    def owner_of(i: int) -> int | None:
        for lo, hi, d in owners:
            if lo <= i < hi:
                return d
        return None

    # suffix array over positions inside documents only
    positions = [i for lo, hi, _ in owners for i in range(lo, hi)]
    sa = sorted(positions, key=lambda i: s[i:])
    best: dict[tuple[int, int], tuple[int, int]] = {}
    for idx in range(1, len(sa)):
        i, j = sa[idx - 1], sa[idx]
        da, db = owner_of(i), owner_of(j)
        if da == db:
            continue
        l = _lcp(s, i, j)
        # clamp to end-of-document (separator \x00 terminates naturally)
        if l >= min_len:
            key = (min(da, db), max(da, db))
            cur = best.get(key)
            if cur is None or l > cur[0]:
                best[key] = (l, min(i, j))
    rows = [
        {
            "a": k[0],
            "b": k[1],
            "common_len": v[0],
            "substring": s[v[1] : v[1] + v[0]] if emit_substring else None,
        }
        for k, v in best.items()
    ]
    if not rows:
        return pd.DataFrame({c.name: pd.Series(dtype="object") for c in MATCH_SCHEMA})
    return pd.DataFrame(rows)


def exact_substring_matches(
    docs: DataFrame,
    groups: DataFrame,
    min_len: int = 20,
    emit_substring: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "cluster_id",
) -> DataFrame:
    """(docs ⋈ groups) → per-group suffix-array scan → exact-substring pairs.

    ``groups`` assigns each doc to a candidate group (LSH cluster id, band
    bucket, …).  Only multi-member groups shuffle.  Returns
    (a, b, common_len[, substring]) with a < b, strongest match per pair.
    """
    member = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).join(
        groups.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("_g")),
        "doc_id",
    )
    # drop singleton groups before the shuffle (they can't produce pairs)
    sizes = member.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    member = member.join(sizes.where(F.col("_n") >= 2).select("_g"), "_g")

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _group_matches(pdf, min_len, emit_substring)

    return member.groupBy("_g").applyInPandas(apply_fn, MATCH_SCHEMA)
