"""Pure-SQL (whole-stage-codegen) similarity expressions.

Everything here stays JVM-side — no Python in the hot path.  These express
the reference's comparison operators (SURVEY.md §2.2) over array/map columns
so Catalyst can codegen them and DuckDB oracles can mirror them.

- S1 signature similarity  (engine.cr:365-375)        → sig_similarity_expr
- S2/S3 overlap coefficient (engine.cr:378-421)        → overlap_expr
- S4 weighted overlap       (similarity.cr:26-39)      → weighted_overlap_expr
- exact Jaccard (spec'd: openspec/specs/jaccard-similarity/spec.md) → jaccard_expr
- shared_bands (spec'd: openspec/specs/band-matching/spec.md)       → shared_bands_expr
- cosine similarity (ANN extension)                    → cosine_expr
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def sig_similarity_expr(s1: Column | str, s2: Column | str) -> Column:
    """Fraction of equal positions between two equal-length array columns;
    0.0 on empty or size mismatch (reference semantics, engine.cr:365-375)."""
    c1 = F.col(s1) if isinstance(s1, str) else s1
    c2 = F.col(s2) if isinstance(s2, str) else s2
    matches = F.aggregate(
        F.zip_with(c1, c2, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        F.when((F.size(c1) == 0) | (F.size(c2) == 0) | (F.size(c1) != F.size(c2)), F.lit(0.0))
        .otherwise(matches.cast("double") / F.size(c1).cast("double"))
    )


def overlap_expr(a: Column | str, b: Column | str) -> Column:
    """|A ∩ B| / min(|A|, |B|) over sorted-distinct array columns; 0.0 if
    either empty (engine.cr:378-421 two-pointer scan, relationally)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return (
        F.when((F.size(ca) == 0) | (F.size(cb) == 0), F.lit(0.0))
        .otherwise(
            F.size(F.array_intersect(ca, cb)).cast("double")
            / F.least(F.size(ca), F.size(cb)).cast("double")
        )
    )


def jaccard_expr(a: Column | str, b: Column | str) -> Column:
    """Exact Jaccard |A∩B| / |A∪B| over distinct array columns (spec'd
    operator, used as the verification/calibration metric)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    union = F.size(F.array_union(ca, cb))
    return (
        F.when(union == 0, F.lit(0.0))
        .otherwise(F.size(F.array_intersect(ca, cb)).cast("double") / union.cast("double"))
    )


def weighted_overlap_expr(a: Column | str, b: Column | str) -> Column:
    """Σ min(w_a, w_b) over shared keys / min(Σ w_a, Σ w_b) over two
    map<string,double> columns; 0.0 if either empty (similarity.cr:26-39)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b

    def _sum_vals(m: Column) -> Column:
        return F.aggregate(F.map_values(m), F.lit(0.0), lambda acc, v: acc + v)

    inter = F.aggregate(
        F.map_values(
            F.map_zip_with(
                ca,
                cb,
                lambda _k, x, y: F.when(x.isNotNull() & y.isNotNull(), F.least(x, y)).otherwise(
                    F.lit(0.0)
                ),
            )
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        F.when((F.size(ca) == 0) | (F.size(cb) == 0), F.lit(0.0))
        .otherwise(inter / F.least(_sum_vals(ca), _sum_vals(cb)))
    )


def shared_bands_expr(b1: Column | str, b2: Column | str) -> Column:
    """Positional count of equal band hashes between two band arrays
    (openspec/specs/band-matching/spec.md: all-shared → NUM_BANDS)."""
    c1 = F.col(b1) if isinstance(b1, str) else b1
    c2 = F.col(b2) if isinstance(b2, str) else b2
    return F.aggregate(
        F.zip_with(c1, c2, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def dot_expr(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(ca, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity between two numeric array columns (codegen'd;
    baseline for the ANN / embedding near-dup extensions)."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_expr(a, b) / denom)


def char_shingles_expr(text: Column | str, k: int, lowercase: bool = True) -> Column:
    """Distinct character k-gram array of a (trimmed, lowercased) string —
    the SQL-expressible twin of the byte-shingle kernel, used for exact
    Jaccard verification and the DuckDB oracles. Codepoint-based (equals
    byte-based for ASCII corpora)."""
    name = _sql_name(text)
    base = f"trim(lower({name}))" if lowercase else name
    # NB: Spark's sequence(1, 0) is the DESCENDING [1, 0], so short strings
    # must short-circuit to an empty array instead of relying on greatest().
    return F.array_distinct(
        F.expr(
            f"CASE WHEN length({base}) >= {k} THEN"
            f" transform(sequence(1, length({base}) - {k - 1}),"
            f" i -> substring({base}, i, {k}))"
            f" ELSE array() END"
        )
    )


def _sql_name(c: Column | str) -> str:
    if isinstance(c, str):
        return c
    raise TypeError("char_shingles_expr requires a column *name* (SQL expr internally)")
