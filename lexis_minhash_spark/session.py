"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 100 TB design point (and harmless locally):
- AQE on (runtime partition coalescing + skew-join splitting — our band
  self-join is the skew hotspot, SURVEY.md §4.2)
- shuffle partitions sized for local[32] tests; a real cluster overrides
  via spark-submit conf
- Arrow enabled + bounded batch size so pandas-UDF kernel blocks stay in
  executor memory
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lexis-minhash-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # one python worker per core already; nested BLAS threading inside the
    # pandas-UDF kernels only oversubscribes (workers inherit driver env)
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE re-picks the join strategy from ACTUAL post-shuffle sizes, so
        # a larger adaptive threshold is low-risk and high-value here: the
        # verify join's deduped pair list routinely lands just above the
        # 10 MB default (measured 13 MB at 1M clips), and missing the
        # broadcast conversion costs a full exchange+sort of the signature
        # table (measured 115 s vs 41.5 s).  Static threshold unchanged —
        # pre-shuffle size estimates are unreliable.
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
