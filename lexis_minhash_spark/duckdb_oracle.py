"""DuckDB SQL generators that replicate the MinHash/LSH math in pure SQL.

Used for the driver's correctness gate (oracle_sql side of
__spark_entry__.py): DuckDB independently recomputes signatures, band
hashes, candidate pairs, verified pairs, and clusters from the raw parquet
— no Python kernels involved — and the driver value-hash-compares it with
the Spark pipeline output.

Why this is exact: for shingle_size=5 over ASCII text the polynomial hash
sum(byte * 31^(k-1-j)) ≤ 255 * Σ31^j < 2^31, so it never wraps and fits
BIGINT; the multiply-shift a*h+b then fits HUGEINT (int128) where an
explicit ``% 2^64`` reproduces Crystal's ``&*``/``&+`` wraparound and
``// 2^32`` reproduces ``>> 32``.  The band fold's ``<< 7 ^`` is done with
HUGEINT modular shift + signed-BIGINT xor.

Scope guard: these oracles assume ASCII corpora (the driver's synthetic
``documents`` table is ASCII; parity fixtures are ASCII by design —
FIXTURES.md §6).  Non-ASCII text would diverge (codepoints vs UTF-8 bytes).
"""

from __future__ import annotations

from lexis_minhash_spark.config import EngineConfig

U64 = "18446744073709551616"  # 2^64
U63 = "9223372036854775808"  # 2^63
U32 = "4294967296"  # 2^32


def norm_expr(col: str = "text") -> str:
    """SQL twin of the kernel's Python ``str.lower().strip()``: strips the
    full ASCII whitespace class at both ends (DuckDB's ``trim`` strips only
    spaces, which diverges from Python ``strip`` on \\n/\\t/\\f/\\v/\\r
    boundary whitespace)."""
    return (
        f"regexp_replace(lower({col}), '^[ \t\n\r\f\v]+|[ \t\n\r\f\v]+$', '', 'g')"
    )


def coeff_cte(cfg: EngineConfig) -> str:
    a, b = cfg.coefficients
    rows = ",\n      ".join(
        f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)" for i in range(cfg.signature_size)
    )
    return f"coeff(i, a, b) AS (VALUES\n      {rows})"


def gated_docs_cte(cfg: EngineConfig, table: str = "documents", where: str = "TRUE") -> str:
    """Documents passing the zero-signature gates (engine/signature.cr:13-16),
    with normalized text."""
    return f"""docs AS (
    SELECT doc_id, {norm_expr("text")} AS norm
    FROM {table} WHERE {where}
  ),
  gated AS (
    SELECT doc_id, norm FROM docs
    WHERE length(norm) > 0
      AND length(regexp_split_to_array(norm, '\\s+')) >= {cfg.min_words}
      AND length(norm) >= {cfg.shingle_size}
  )"""


def shingles_cte(cfg: EngineConfig) -> str:
    k = cfg.shingle_size
    return f"""shingles AS (
    SELECT doc_id,
           list_reduce(
             list_transform(range(0, {k}), j -> ascii(substring(norm, (i + j)::INT, 1))),
             (x, y) -> x * 31 + y
           )::HUGEINT AS h
    FROM gated, UNNEST(range(1, length(norm) - {k - 2})) AS t(i)
  )"""


def signatures_cte() -> str:
    return f"""sigs AS (
    SELECT s.doc_id, c.i,
           (min(((c.a * s.h + c.b) % {U64}::HUGEINT) // {U32}::HUGEINT))::BIGINT AS value
    FROM shingles s CROSS JOIN coeff c
    GROUP BY s.doc_id, c.i
  )"""


def _fold_step() -> str:
    """Lambda body for one ((acc << 7) ^ v) mod 2^64 step over (x: HUGEINT
    unsigned acc, y: HUGEINT value < 2^32).  DuckDB lambdas cannot contain
    subqueries, so the shifted/xored intermediate is inlined (duplicated) in
    a flat CASE expression."""
    shifted_signed = (
        f"(CASE WHEN ((x * 128) % {U64}::HUGEINT) >= {U63}::HUGEINT"
        f" THEN (((x * 128) % {U64}::HUGEINT) - {U64}::HUGEINT)::BIGINT"
        f" ELSE ((x * 128) % {U64}::HUGEINT)::BIGINT END)"
    )
    xored = f"xor({shifted_signed}, y::BIGINT)"
    return (
        f"(CASE WHEN {xored} < 0 THEN {xored}::HUGEINT + {U64}::HUGEINT"
        f" ELSE {xored}::HUGEINT END)"
    )


def bands_cte(cfg: EngineConfig) -> str:
    """Band fold (engine.cr:443-456): list-ordered fold of rows_per_band
    signature values with ((acc << 7) ^ v) mod 2^64; list_reduce's
    first-element init is equivalent to the reference's acc=0 start since
    (0<<7)^v0 = v0."""
    r = cfg.rows_per_band
    return f"""band_vals AS (
    SELECT doc_id, (i // {r})::INT AS band_idx, list(value ORDER BY i) AS vals
    FROM sigs WHERE i < {cfg.num_bands * r}
    GROUP BY doc_id, (i // {r})
  ),
  bands_u AS (
    SELECT doc_id, band_idx,
           list_reduce(list_transform(vals, v -> v::HUGEINT),
                       (x, y) -> {_fold_step()}) AS u
    FROM band_vals
  ),
  bands AS (
    SELECT doc_id, band_idx,
           CASE WHEN u >= {U63}::HUGEINT THEN (u - {U64}::HUGEINT)::BIGINT
                ELSE u::BIGINT END AS band_hash
    FROM bands_u
  )"""


def signature_slots_sql(cfg: EngineConfig, table: str = "documents", where: str = "TRUE") -> str:
    """(doc_id, i, value): every signature slot of every gated doc."""
    return f"""WITH {coeff_cte(cfg)},
  {gated_docs_cte(cfg, table, where)},
  {shingles_cte(cfg)},
  {signatures_cte()}
  SELECT doc_id, i, value FROM sigs ORDER BY doc_id, i"""


def bands_sql(cfg: EngineConfig, table: str = "documents", where: str = "TRUE") -> str:
    """(doc_id, band_idx, band_hash) for every gated doc."""
    return f"""WITH {coeff_cte(cfg)},
  {gated_docs_cte(cfg, table, where)},
  {shingles_cte(cfg)},
  {signatures_cte()},
  {bands_cte(cfg)}
  SELECT doc_id, band_idx, band_hash FROM bands ORDER BY doc_id, band_idx"""


def _pairs_ctes(cfg: EngineConfig, table: str, where: str, recursive: bool = False) -> str:
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return f"""{kw} {coeff_cte(cfg)},
  {gated_docs_cte(cfg, table, where)},
  {shingles_cte(cfg)},
  {signatures_cte()},
  {bands_cte(cfg)},
  cand AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bands x JOIN bands y
      ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
  ),
  verified AS (
    SELECT c.a, c.b,
           avg(CASE WHEN sa.value = sb.value THEN 1.0 ELSE 0.0 END) AS similarity
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.a
    JOIN sigs sb ON sb.doc_id = c.b AND sb.i = sa.i
    GROUP BY c.a, c.b
  )"""


def candidate_pairs_sql(cfg: EngineConfig, table: str = "documents", where: str = "TRUE") -> str:
    return f"""{_pairs_ctes(cfg, table, where)}
  SELECT a, b FROM cand ORDER BY a, b"""


def verified_pairs_sql(
    cfg: EngineConfig, threshold: float = 0.75, table: str = "documents", where: str = "TRUE"
) -> str:
    return f"""{_pairs_ctes(cfg, table, where)}
  SELECT a, b, round(similarity, 6) AS similarity
  FROM verified WHERE similarity >= {threshold} ORDER BY a, b"""


def weighted_signature_slots_sql(
    cfg: EngineConfig,
    weights: dict[str, float],
    table: str = "documents",
    where: str = "TRUE",
) -> str:
    """(doc_id, i, value) weighted-MinHash slots (engine.cr:203-228).

    Weighted update: eff = max(w, 0); skip eff <= 0; divisor = ln(1+eff) if
    eff < 1 else eff; value = trunc(fmod(h32/divisor, 4294967295.0)).

    ORACLE CONSTRAINT: only use fixture weights >= 1.0 or < 0 here — the
    eff < 1 branch takes ln(1+eff), and NumPy's vectorized log can differ
    from DuckDB's libm log by 1 ulp (the < 1 branch is covered by pytest
    against the scalar Python oracle instead).  default_weight must be 1.0.
    """
    assert cfg.default_weight == 1.0
    assert all(w >= 1.0 or w < 0.0 for w in weights.values())
    k = cfg.shingle_size
    wrows = ", ".join(
        f"('{s}', {float(w)}::DOUBLE)" for s, w in sorted(weights.items())
    )
    return f"""WITH {coeff_cte(cfg)},
  {gated_docs_cte(cfg, table, where)},
  wmap(shingle, w) AS (VALUES {wrows}),
  shingles AS (
    SELECT doc_id,
           list_reduce(
             list_transform(range(0, {k}), j -> ascii(substring(norm, (i + j)::INT, 1))),
             (x, y) -> x * 31 + y
           )::HUGEINT AS h,
           substring(norm, i::INT, {k}) AS s
    FROM gated, UNNEST(range(1, length(norm) - {k - 2})) AS t(i)
  ),
  weighted AS (
    SELECT doc_id, h, greatest(coalesce(w, 1.0), 0.0) AS eff
    FROM shingles LEFT JOIN wmap ON shingles.s = wmap.shingle
  ),
  sigs AS (
    SELECT wd.doc_id, c.i,
           min(CAST(floor(fmod(
                 (((c.a * wd.h + c.b) % {U64}::HUGEINT) // {U32}::HUGEINT)::DOUBLE / wd.eff,
                 4294967295.0)) AS BIGINT)) AS value
    FROM weighted wd CROSS JOIN coeff c
    WHERE wd.eff > 0.0
    GROUP BY wd.doc_id, c.i
  )
  SELECT doc_id, i, value FROM sigs ORDER BY doc_id, i"""


def simhash_sql(cfg: EngineConfig, table: str = "documents", where: str = "TRUE") -> str:
    """(doc_id, simhash) — Charikar simhash over the mixed shingle stream,
    recomputed in SQL via per-bit sign sums.

    Mirrors kernels._simhash_mix: each shingle hash is spread to 64 bits
    with two fixed multiply-shift draws (HUGEINT mod-2^64 arithmetic);
    bit j<32 comes from the second draw (lo), bit j>=32 from the first (hi).
    """
    from lexis_minhash_spark.config import seeded_coefficients
    from lexis_minhash_spark.kernels import SIMHASH_MIX_SEED

    a, b = seeded_coefficients(SIMHASH_MIX_SEED, 2)
    a1, a2, b1, b2 = int(a[0]), int(a[1]), int(b[0]), int(b[1])
    msh = (
        lambda ai, bi: f"((({ai}::HUGEINT * h + {bi}::HUGEINT) % {U64}::HUGEINT)"
        f" // {U32}::HUGEINT)::BIGINT"
    )
    return f"""WITH {gated_docs_cte(cfg, table, where)},
  {shingles_cte(cfg)},
  mixed AS (
    SELECT doc_id, {msh(a1, b1)} AS m_hi, {msh(a2, b2)} AS m_lo FROM shingles
  ),
  bits AS (
    SELECT doc_id, j,
           sum(CASE WHEN j < 32
                    THEN (m_lo >> j::INT) & 1
                    ELSE (m_hi >> (j::INT - 32)) & 1
               END * 2 - 1) AS acc
    FROM mixed, UNNEST(range(0, 64)) AS t(j)
    GROUP BY doc_id, j
  ),
  fp_u AS (
    SELECT doc_id,
           sum(CASE WHEN acc > 0 THEN (1::HUGEINT << j::INT) ELSE 0::HUGEINT END) AS u
    FROM bits GROUP BY doc_id
  ),
  fp AS (
    SELECT doc_id,
           CASE WHEN u >= {U63}::HUGEINT THEN (u - {U64}::HUGEINT)::BIGINT
                ELSE u::BIGINT END AS simhash
    FROM fp_u
  )
  SELECT d.doc_id, coalesce(f.simhash, 0)::BIGINT AS simhash
  FROM (SELECT doc_id FROM {table} WHERE {where}) d
  LEFT JOIN fp f ON f.doc_id = d.doc_id
  ORDER BY d.doc_id"""


def simhash_pairs_sql(
    cfg: EngineConfig,
    max_hamming: int = 3,
    table: str = "documents",
    where: str = "TRUE",
) -> str:
    """(a, b, hamming) — all pairs within Hamming distance ``max_hamming``
    over the simhash fingerprints, via brute-force popcount (the Spark side
    uses the Manku block join, which by pigeonhole finds every pair at
    hamming <= num_blocks - 1, so the result sets are identical for
    max_hamming <= 3 with 4 blocks)."""
    assert max_hamming <= 3, "block-join completeness only guaranteed to 3"
    inner = simhash_sql(cfg, table, where)
    return f"""WITH fps AS ({inner})
  SELECT x.doc_id AS a, y.doc_id AS b,
         bit_count(xor(x.simhash, y.simhash))::INT AS hamming
  FROM fps x JOIN fps y ON x.doc_id < y.doc_id
  WHERE x.simhash <> 0 AND y.simhash <> 0
    AND bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
  ORDER BY a, b"""


def band_load_factors_sql(cfg: EngineConfig, table: str = "documents", where: str = "TRUE") -> str:
    """(band_idx, n_entries, n_buckets, avg_bucket_size) metrics."""
    return f"""WITH {coeff_cte(cfg)},
  {gated_docs_cte(cfg, table, where)},
  {shingles_cte(cfg)},
  {signatures_cte()},
  {bands_cte(cfg)}
  SELECT band_idx, count(*)::BIGINT AS n_entries,
         count(DISTINCT band_hash)::BIGINT AS n_buckets,
         round(count(*)::DOUBLE / count(DISTINCT band_hash), 6) AS avg_bucket_size
  FROM bands GROUP BY band_idx ORDER BY band_idx"""


def clusters_sql(
    cfg: EngineConfig, threshold: float = 0.75, table: str = "documents", where: str = "TRUE"
) -> str:
    """(doc_id, cluster_id) for ALL docs in scope: min reachable doc id over
    the verified-pair graph via a recursive transitive closure (clusters are
    tiny, so the closure is bounded); singletons + gated-out docs map to
    themselves."""
    return f"""{_pairs_ctes(cfg, table, where, recursive=True)},
  edges AS (
    SELECT a AS src, b AS dst FROM verified WHERE similarity >= {threshold}
    UNION ALL
    SELECT b, a FROM verified WHERE similarity >= {threshold}
  ),
  reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
  ),
  comp AS (
    SELECT src AS doc_id, least(min(dst), src) AS cluster_id
    FROM reach GROUP BY src
  )
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM (SELECT doc_id FROM {table} WHERE {where}) d
  LEFT JOIN comp c ON c.doc_id = d.doc_id
  ORDER BY d.doc_id"""
