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
    ):
        self.spark = spark
        self.cfg = cfg
        self.workdir = workdir.rstrip("/")
        self.threshold = threshold
        self.max_bucket_size = max_bucket_size
        self.input_desc = input_desc
        self.results: list[StageResult] = []
        os.makedirs(self.workdir, exist_ok=True)

    # -- stage protocol ------------------------------------------------------

    def _path(self, stage: str) -> str:
        return f"{self.workdir}/{stage}"

    def _done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def _run_stage(self, stage: str, build) -> DataFrame:
        """Idempotent stage: skip if checkpoint exists, else build + write.
        Returns the checkpointed DataFrame (always read back from disk so
        downstream lineage is cut at every stage boundary)."""
        path = self._path(stage)
        t0 = time.monotonic()
        if self._done(stage):
            df = self.spark.read.parquet(path)
            self.results.append(StageResult(stage, path, -1, 0, skipped=True))
            return df
        df = build()
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
        sig = self._run_stage("signatures", lambda: signature_fn(docs))
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
