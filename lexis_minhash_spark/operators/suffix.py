"""Suffix-array exact-substring matching (north-star extension).

Methodology follows Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better"): find pairs of documents sharing an exact substring
of at least ``min_len`` characters.  At 100 TB you never build one global
suffix array; you build one per *candidate group* (LSH cluster / band
bucket), which keeps every group's text in one task's memory.  Expressed as
``groupBy(group_id).applyInPandas`` so Spark shuffles each group to one task
and the per-group kernel is vectorized NumPy.

Per-group kernel:
  1. concatenate member texts with ``\\x00`` separators (codepoint array via
     utf-32 so indexing is codepoint-exact),
  2. build the suffix array by Manber–Myers prefix doubling — O(L log L),
     fully vectorized (argsort/lexsort), keeping every doubling level's rank
     array,
  3. for each document pair, the longest shared substring is attained at
     adjacent cross-owner suffixes in the merged SA order (standard LCP
     property; holds under doc-boundary clamping because the separator
     ``\\x00`` sorts below all text and cannot occur inside a match), so we
     compute those LCPs with vectorized binary lifting over the saved rank
     levels and clamp each to ``min(lcp, doc_end_a - a, doc_end_b - b)`` —
     matches can therefore never cross a document boundary.

Owner lookup is ``np.searchsorted`` over document start offsets (O(log d)
per suffix, vectorized).
"""

from __future__ import annotations

import numpy as np
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


def build_suffix_array(codes: np.ndarray) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Manber–Myers prefix-doubling suffix array over a codepoint array.

    Returns (sa, levels) where ``levels`` is [(k, rank_k), ...] with
    ``rank_k[i]`` = rank of the length-k prefix of suffix i (out-of-bounds
    padded with a sentinel smaller than everything).  The levels enable
    O(log L) LCP queries for arbitrary suffix pairs (binary lifting).
    """
    n = int(codes.size)
    if n == 0:
        return np.empty(0, np.int64), []
    order = np.argsort(codes, kind="stable")
    rank = np.empty(n, np.int64)
    sc = codes[order]
    rank[order] = np.cumsum(np.concatenate(([0], (sc[1:] != sc[:-1]).astype(np.int64))))
    levels: list[tuple[int, np.ndarray]] = [(1, rank.copy())]
    k = 1
    while k < n and rank[order[-1]] < n - 1:
        rank2 = np.full(n, -1, np.int64)
        rank2[: n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        r_o = rank[order]
        r2_o = rank2[order]
        diff = np.concatenate(
            ([0], ((r_o[1:] != r_o[:-1]) | (r2_o[1:] != r2_o[:-1])).astype(np.int64))
        )
        new_rank = np.empty(n, np.int64)
        new_rank[order] = np.cumsum(diff)
        rank = new_rank
        k *= 2
        levels.append((k, rank.copy()))
    sa = order
    return sa, levels


def lcp_pairs(
    levels: list[tuple[int, np.ndarray]], n: int, i: np.ndarray, j: np.ndarray
) -> np.ndarray:
    """Vectorized LCP for arbitrary suffix pairs via binary lifting over the
    prefix-doubling rank levels (descending powers of two)."""
    l = np.zeros(i.shape, np.int64)
    ii = i.astype(np.int64).copy()
    jj = j.astype(np.int64).copy()
    for k, rank in reversed(levels):
        ok = (ii < n) & (jj < n)
        m = ok.copy()
        if m.any():
            m[ok] = rank[ii[ok]] == rank[jj[ok]]
        l[m] += k
        ii[m] += k
        jj[m] += k
    return l


def _group_matches(
    pdf: pd.DataFrame,
    min_len: int,
    emit_substring: bool,
    max_group_chars: int,
    max_group_docs: int,
) -> pd.DataFrame:
    """Suffix-array cross-document LCP scan for one candidate group."""
    empty = pd.DataFrame({c.name: pd.Series(dtype="object") for c in MATCH_SCHEMA})
    ids = pdf["doc_id"].to_numpy()
    texts = pdf["text"].astype(str).str.replace("\x00", "", regex=False).tolist()
    d = len(ids)
    if d < 2 or d > max_group_docs:
        # oversized groups are quarantined (same philosophy as hot LSH
        # buckets); a near-dup candidate group this large is pathological
        return empty
    total = sum(len(t) for t in texts) + d
    if total > max_group_chars:
        return empty

    s = "\x00".join(texts)
    # codepoint array (utf-32 little-endian) so offsets are codepoint-exact
    codes = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
    n = codes.size
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens[:-1] + 1)))
    ends = starts + lens

    sa, levels = build_suffix_array(codes)
    # keep only suffixes starting inside a document (drop separators / empty)
    own_all = np.searchsorted(starts, sa, side="right") - 1
    in_doc = sa < ends[own_all]
    filt = sa[in_doc]
    own = own_all[in_doc]
    rem = ends[own] - filt  # chars to the owning document's end

    best: dict[tuple[int, int], tuple[int, int]] = {}
    present = np.unique(own)
    for xi in range(len(present)):
        for yi in range(xi + 1, len(present)):
            x, y = int(present[xi]), int(present[yi])
            sel = (own == x) | (own == y)
            fs = filt[sel]
            os_ = own[sel]
            rs = rem[sel]
            if fs.size < 2:
                continue
            cross = os_[1:] != os_[:-1]
            if not cross.any():
                continue
            ii = fs[:-1][cross]
            jj = fs[1:][cross]
            raw = lcp_pairs(levels, n, ii, jj)
            # clamp to both owning documents' ends: a match never crosses a
            # separator into another document
            clamped = np.minimum(raw, np.minimum(rs[:-1][cross], rs[1:][cross]))
            kbest = int(np.argmax(clamped))
            l = int(clamped[kbest])
            if l < min_len:
                continue
            ia, ib = int(ids[x]), int(ids[y])
            key = (min(ia, ib), max(ia, ib))
            pos = int(min(ii[kbest], jj[kbest]))
            cur = best.get(key)
            if cur is None or l > cur[0]:
                best[key] = (l, pos)

    if not best:
        return empty
    rows = [
        {
            "a": k[0],
            "b": k[1],
            "common_len": v[0],
            "substring": s[v[1] : v[1] + v[0]] if emit_substring else None,
        }
        for k, v in best.items()
    ]
    return pd.DataFrame(rows)


def exact_substring_matches(
    docs: DataFrame,
    groups: DataFrame,
    min_len: int = 20,
    emit_substring: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "cluster_id",
    max_group_chars: int = 8_000_000,
    max_group_docs: int = 512,
) -> DataFrame:
    """(docs ⋈ groups) → per-group suffix-array scan → exact-substring pairs.

    ``groups`` assigns each doc to a candidate group (LSH cluster id, band
    bucket, …).  Only multi-member groups shuffle.  Returns
    (a, b, common_len[, substring]) with a < b, strongest match per pair;
    ``common_len`` is exact (clamped at document boundaries) and
    ``substring`` never contains the group separator.
    """
    member = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).join(
        groups.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("_g")),
        "doc_id",
    )
    # drop singleton groups before the shuffle (they can't produce pairs)
    sizes = member.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    member = member.join(sizes.where(F.col("_n") >= 2).select("_g"), "_g")

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _group_matches(pdf, min_len, emit_substring, max_group_chars, max_group_docs)

    return member.groupBy("_g").applyInPandas(apply_fn, MATCH_SCHEMA)
