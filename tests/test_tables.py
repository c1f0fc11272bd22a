"""Warehouse layout: bucketed/partitioned stage tables + pruning."""

import re

import pytest
from pyspark.sql import functions as F

from lexis_minhash_spark.config import EngineConfig
from lexis_minhash_spark import ops
from lexis_minhash_spark.sources import tables

CFG = EngineConfig(seed=12345)


@pytest.fixture(scope="module")
def sig_df(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return ops.with_signatures(docs, CFG)


class TestWarehouseTables:
    def test_signatures_roundtrip_and_pruning(self, spark, sig_df, tmp_path_factory):
        spark.sql("DROP TABLE IF EXISTS lexis_signatures")
        tables.write_signatures_table(sig_df, n_shards=8, n_buckets=4)
        back = tables.read_table(spark, "lexis_signatures")
        assert back.count() == sig_df.count()
        row = tables.point_lookup_signature(spark, 7, n_shards=8).head()
        assert row.doc_id == 7
        # partition pruning visible in the plan
        plan = (
            tables.point_lookup_signature(spark, 7, n_shards=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "shard" in plan

    def test_bands_bucketed_groupby_avoids_exchange(self, spark, sig_df):
        spark.sql("DROP TABLE IF EXISTS lexis_bands")
        tables.write_bands_table(ops.bands_table(sig_df), n_buckets=4)
        back = tables.read_table(spark, "lexis_bands")
        # groupBy on the bucket key should not need a full exchange
        agg = back.groupBy("band_hash").agg(F.count(F.lit(1)).alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(band_hash" not in plan, plan
        assert back.count() == ops.bands_table(sig_df).count()
