"""Warehouse table layout for the engine's stage tables.

On the target cluster these are Iceberg tables (``writeTo(...).using(
"iceberg").partitionedBy(...)``); the sandbox has no Iceberg runtime, so
the same layout ships against the session catalog's parquet warehouse —
the LAYOUT decisions are the point:

- ``signatures``: partitioned by a low-cardinality shard of the doc id
  (``doc_id % n_shards``) so point lookups (L10 get_signature) prune files,
  bucketed by doc_id so the verify join can co-locate.
- ``bands``: bucketed by (band_hash) — candidate generation's groupBy
  shuffles on (band_idx, band_hash), so pre-bucketing by band_hash makes
  the grouped expansion a bucket-local aggregation (one fewer full shuffle
  per run over an immutable corpus, amortized across re-runs/queries).
- all writes are idempotent ``mode("overwrite")`` per the checkpoint
  protocol (plans/pipeline.py).

At 10^12 rows: signatures ≈ 10^12 × ~450 B ≈ 450 TB, bands ≈ 2×10^13 ×
~20 B ≈ 400 TB — both demand partition pruning; the shard column bounds
file sizes and lets compaction run per shard.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


def _drop_table(spark: SparkSession, table: str) -> None:
    """Idempotent drop: remove both the catalog entry and any orphaned
    managed-table location (a fresh session's in-memory catalog does not
    know about a previous session's warehouse directory, and saveAsTable
    refuses to reuse the location — LOCATION_ALREADY_EXISTS)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = os.path.join(warehouse.removeprefix("file:"), table.split(".")[-1])
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)


def write_signatures_table(
    sig_df: DataFrame,
    table: str = "lexis_signatures",
    n_shards: int = 64,
    n_buckets: int = 64,
) -> None:
    _drop_table(sig_df.sparkSession, table)
    (
        sig_df.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .format("parquet")
        .saveAsTable(table)
    )


def write_bands_table(
    bands_df: DataFrame,
    table: str = "lexis_bands",
    n_buckets: int = 64,
) -> None:
    _drop_table(bands_df.sparkSession, table)
    (
        bands_df.write.mode("overwrite")
        .bucketBy(n_buckets, "band_hash")
        .sortBy("band_hash")
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def point_lookup_signature(spark: SparkSession, doc_id: int, table: str = "lexis_signatures", n_shards: int = 64) -> DataFrame:
    """L10 get_signature with partition pruning via the shard column."""
    return spark.table(table).where(
        (F.col("shard") == int(doc_id) % n_shards) & (F.col("doc_id") == doc_id)
    )
