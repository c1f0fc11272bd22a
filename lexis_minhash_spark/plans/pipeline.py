"""Checkpointed, resumable dedup pipeline with per-stage lineage + metrics.

north_rule requirements: every stage writes an idempotent checkpoint table
plus per-stage metrics (rows, wall ms) and lineage (input path, config hash)
so a killed run resumes from the last completed stage.

Sandbox storage is Parquet directories under a workdir; on a real cluster
these become Iceberg tables (``writeTo(...).createOrReplace()``) — the stage
protocol (write → _SUCCESS marker → skip-if-present) is identical.

Stages:
  1. signatures   docs → (doc_id, sig, bands, is_zero, n_shingles)
  2. bands        posexplode, zero-sig quarantined
  3. candidates   LSH bucket self-join, hot buckets capped
  4. verified     similarity >= threshold
  5. clusters     connected components + singletons
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from lexis_minhash_spark.config import EngineConfig
from lexis_minhash_spark import ops


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    wall_ms: int
    skipped: bool


class DedupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: EngineConfig,
        workdir: str,
        threshold: float = 0.75,
        max_bucket_size: int | None = 10_000,
        input_desc: str = "",
        sig_buckets: int | None = None,
    ):
        """``sig_buckets``: when set, the signatures checkpoint is written
        as a BUCKETED datasource table (``bucketBy(n, id).sortBy(id)``)
        instead of a plain parquet directory.  Both verify-join legs and
        the cluster join read signatures by id, so with a bucketed
        checkpoint Catalyst elides the signature-side exchange entirely —
        only the thin (a, b) pair list shuffles.  At 10^12 rows the
        signature payload (~0.5 KB/row) is the table that must never
        move; this is the cluster-native layout (Iceberg: a bucket
        partition transform on the id column).  Plan-asserted in
        tests/test_plans.py."""
        self.spark = spark
        self.cfg = cfg
        self.workdir = workdir.rstrip("/")
        self.threshold = threshold
        self.max_bucket_size = max_bucket_size
        self.input_desc = input_desc
        self.sig_buckets = sig_buckets
        self.results: list[StageResult] = []
        os.makedirs(self.workdir, exist_ok=True)

    # -- stage protocol ------------------------------------------------------

    def _path(self, stage: str) -> str:
        return f"{self.workdir}/{stage}"

    def _done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def _table_name(self, stage: str) -> str:
        import hashlib

        h = hashlib.md5(self.workdir.encode()).hexdigest()[:10]
        return f"lexis_ckpt_{stage}_{h}"

    def _bucket_meta_path(self, path: str) -> str:
        return os.path.join(path, "_lexis_bucket_spec.json")

    def _write_bucket_meta(self, path: str, col: str, n: int) -> None:
        with open(self._bucket_meta_path(path), "w") as f:
            json.dump({"bucket_col": col, "n_buckets": n}, f)

    def _register_bucketed(self, name: str, path: str, col: str, n: int) -> None:
        """Re-attach an existing bucketed checkpoint to the (session-local)
        catalog on resume, preserving its bucket spec for exchange elision.

        The bucket spec declared here MUST match the one the files were
        written with: re-declaring with a different count (resume after a
        --sig-buckets change) or over a previously PLAIN checkpoint would
        make Spark elide exchanges on a wrong assumption and silently drop
        join matches.  The spec of record is persisted at write time
        (_lexis_bucket_spec.json next to _SUCCESS) and validated here
        (round-5 advice)."""
        meta_path = self._bucket_meta_path(path)
        if not os.path.exists(meta_path):
            raise ValueError(
                f"checkpoint {path} has no bucket spec on record — it was "
                "written as plain parquet (or by a pre-bucketing version); "
                "resume it with sig_buckets=None, or delete the stage "
                "directory to rebuild it bucketed"
            )
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("n_buckets") != n or meta.get("bucket_col") != col:
            raise ValueError(
                f"checkpoint {path} was bucketed as "
                f"{meta.get('n_buckets')} buckets on "
                f"{meta.get('bucket_col')!r}; resuming with {n} buckets on "
                f"{col!r} would register a wrong bucket spec and can "
                "silently drop join matches — resume with the original "
                "sig_buckets or delete the stage directory to rebuild"
            )
        if self.spark.catalog.tableExists(name):
            return
        schema = self.spark.read.parquet(path).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        self.spark.sql(
            f"CREATE TABLE {name} ({cols}) USING parquet "
            f"CLUSTERED BY (`{col}`) SORTED BY (`{col}`) INTO {n} BUCKETS "
            f"LOCATION '{path}'"
        )

    def _run_stage(self, stage: str, build, bucket_col: str | None = None) -> DataFrame:
        """Idempotent stage: skip if checkpoint exists, else build + write.
        Returns the checkpointed DataFrame (always read back from disk so
        downstream lineage is cut at every stage boundary).  With
        ``bucket_col`` (and ``sig_buckets`` configured) the checkpoint is
        a bucketed table; downstream equi-joins on that column read it
        exchange-free."""
        path = self._path(stage)
        bucketed = bucket_col is not None and self.sig_buckets is not None
        t0 = time.monotonic()
        if self._done(stage):
            if bucketed:
                name = self._table_name(stage)
                self._register_bucketed(name, path, bucket_col, self.sig_buckets)
                df = self.spark.table(name)
            else:
                df = self.spark.read.parquet(path)
            self.results.append(StageResult(stage, path, -1, 0, skipped=True))
            return df
        df = build()
        if bucketed:
            name = self._table_name(stage)
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.mode("overwrite")
                .format("parquet")
                .bucketBy(self.sig_buckets, bucket_col)
                .sortBy(bucket_col)
                .option("path", path)
                .saveAsTable(name)
            )
            # spec of record for resume validation (_register_bucketed)
            self._write_bucket_meta(path, bucket_col, self.sig_buckets)
            out = self.spark.table(name)
        else:
            df.write.mode("overwrite").parquet(path)
            out = self.spark.read.parquet(path)
        rows = out.count()
        # per-partition lineage (north_rule): row histogram of the
        # checkpointed stage output, keyed by partition id
        part_rows = sorted(
            (int(r["pid"]), int(r["count"]))
            for r in out.groupBy(F.spark_partition_id().alias("pid")).count().collect()
        )
        wall_ms = int((time.monotonic() - t0) * 1000)
        self.results.append(StageResult(stage, path, rows, wall_ms, skipped=False))
        self._append_metrics(stage, rows, wall_ms, part_rows)
        return out

    def _append_metrics(
        self, stage: str, rows: int, wall_ms: int, part_rows: list | None = None
    ) -> None:
        rec = {
            "stage": stage,
            "rows": rows,
            "wall_ms": wall_ms,
            "config_hash": self.cfg.config_hash(),
            "input": self.input_desc,
            "threshold": self.threshold,
        }
        with open(f"{self.workdir}/_metrics.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
        # per-partition lineage for the stage output
        lineage_path = f"{self.workdir}/_lineage.jsonl"
        with open(lineage_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "stage": stage,
                        "output": self._path(stage),
                        "config": self.cfg.to_dict(),
                        "parent": self.results[-2].path if len(self.results) >= 2 else self.input_desc,
                        # per-partition (pid, rows) histogram, truncated for
                        # pathological partition counts
                        "partitions": (part_rows or [])[:1024],
                        "n_partitions": len(part_rows or []),
                    }
                )
                + "\n"
            )

    # -- pipeline ------------------------------------------------------------

    def run(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        signature_fn=None,
    ) -> DataFrame:
        """Full flagship pipeline; returns the clusters DataFrame.

        ``signature_fn(docs) -> DataFrame`` overrides the signature stage
        (must produce the ops.SIGNATURE_STRUCT columns keyed by ``id_col``)
        — e.g. operators.audio_dedup.with_audio_signatures to dedup on the
        decoded audio instead of the transcript; every downstream stage is
        payload-agnostic."""
        if signature_fn is None:
            signature_fn = lambda d: ops.with_signatures(d, self.cfg, text_col, id_col)
        sig = self._run_stage(
            "signatures", lambda: signature_fn(docs), bucket_col=id_col
        )
        bands = self._run_stage("bands", lambda: ops.bands_table(sig, id_col=id_col))
        # the bands CHECKPOINT keeps the composite (band_idx, band_hash) —
        # the query path needs it — but the candidate shuffle carries the
        # packed 64-bit key computed map-side on read (round-4 verdict
        # item #1: smaller exchange rows; collisions only merge buckets,
        # absorbed by the exact verify — see ops.pack_band_key)
        packed = bands.select(
            F.col(id_col), ops.pack_band_key().alias("band_key")
        )
        cands = self._run_stage(
            "candidates",
            lambda: (
                ops.candidate_pairs_grouped(
                    packed, id_col=id_col, max_bucket_size=self.max_bucket_size,
                    key_cols=("band_key",),
                )
                if self.max_bucket_size is not None
                else ops.candidate_pairs(bands, id_col=id_col)
            ),
        )
        verified = self._run_stage(
            "verified", lambda: ops.verified_pairs(cands, sig, self.threshold, id_col=id_col)
        )
        clusters = self._run_stage(
            "clusters",
            lambda: ops.clusters_with_singletons(
                sig, ops.connected_components(verified.select("a", "b")), id_col=id_col
            ),
        )
        return clusters

    def metrics(self) -> list[dict]:
        path = f"{self.workdir}/_metrics.jsonl"
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
