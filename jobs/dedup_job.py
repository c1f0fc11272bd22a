#!/usr/bin/env python
"""spark-submit entry point for the near-duplicate clustering pipeline.

Cluster usage (the --py-files contract from BASELINE.json north_rule):

    scripts/make_pyfiles.sh                       # -> dist/lexis_minhash_spark.zip
    spark-submit --py-files dist/lexis_minhash_spark.zip \
        jobs/dedup_job.py \
        --input  <warehouse>/clips            \
        --workdir <warehouse>/dedup_run_001   \
        --text-col transcript --id-col clip_id \
        --seed 12345 --threshold 0.75

The job is resumable: re-submitting with the same --workdir skips completed
stages (plans/pipeline.py checkpoint protocol) and appends per-stage
metrics + lineage.  On a real cluster, point --input at an Iceberg table
path and the workdir at an object-store prefix; the stage protocol is
storage-agnostic.

Local smoke run:
    python jobs/dedup_job.py --input /root/testdata/sf0.001/documents.parquet \
        --workdir /tmp/dedup_smoke --text-col text --id-col doc_id

Audio mode (dedup on the decoded PCM envelope instead of the transcript;
use the sensitive band config — envelope Jaccard for true near-dups sits
lower than text shingle Jaccard):
    ... jobs/dedup_job.py --input <warehouse>/clips --workdir <prefix> \
        --mode audio --id-col clip_id --num-bands 50 --threshold 0.25

Single-stage pair modes (round-3 verdict item #8 — the 100 TB skew-cap
configuration reachable from the CLI, no code edits): write (a, b, score)
pairs parquet to <workdir>/pairs.
    ... --mode ngram --threshold 0.5 --max-doc-freq 1000     # hot-gram cap
    ... --mode ann --threshold 0.95 --ann-tables 8 \
        --max-bucket-size 10000                              # hot-bucket cap
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def build_session(args) -> SparkSession:
    """On a cluster, spark-submit provides master/executors; locally fall
    back to the session factory defaults."""
    try:
        from lexis_minhash_spark.session import get_spark
    except ImportError:
        raise SystemExit(
            "lexis_minhash_spark not importable — pass it via "
            "--py-files dist/lexis_minhash_spark.zip"
        )
    if args.local:
        return get_spark(app_name="lexis-dedup", master=args.local)
    builder = SparkSession.builder.appName("lexis-dedup")
    builder = builder.config("spark.sql.adaptive.enabled", "true")
    builder = builder.config("spark.sql.adaptive.skewJoin.enabled", "true")
    return builder.getOrCreate()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet/Iceberg path of the corpus")
    ap.add_argument("--workdir", required=True, help="checkpoint prefix for stage tables")
    ap.add_argument("--text-col", default="transcript")
    ap.add_argument("--id-col", default="clip_id")
    ap.add_argument(
        "--mode",
        choices=("text", "audio", "ngram", "ann"),
        default="text",
        help="text: MinHash over --text-col; audio: decode the bytes/codec/"
        "sr_hz columns and fingerprint the PCM envelope (same downstream "
        "LSH/verify/cluster stages); ngram: exact word-n-gram Jaccard "
        "pairs (hot grams capped by --max-doc-freq); ann: LSH-bucketed "
        "embedding cosine pairs (hot buckets capped by --max-bucket-size)",
    )
    ap.add_argument("--seed", type=int, default=12345)
    ap.add_argument("--signature-size", type=int, default=100)
    ap.add_argument("--num-bands", type=int, default=20)
    ap.add_argument("--shingle-size", type=int, default=5)
    ap.add_argument("--min-words", type=int, default=4)
    ap.add_argument("--threshold", type=float, default=0.75)
    ap.add_argument("--max-bucket-size", type=int, default=10_000,
                    help="hot-bucket quarantine cap (LSH band buckets in "
                    "text/audio mode; hyperplane buckets in ann mode); "
                    "0 disables")
    # ngram-mode knobs
    ap.add_argument("--ngram-n", type=int, default=3)
    ap.add_argument("--max-doc-freq", type=int, default=1000,
                    help="ngram mode: quarantine grams with document "
                    "frequency above this (the hot-gram skew cap); 0 disables")
    # ann-mode knobs
    ap.add_argument("--embedding-col", default="embedding")
    ap.add_argument("--ann-planes", type=int, default=12)
    ap.add_argument("--ann-tables", type=int, default=4)
    ap.add_argument("--min-parallelism", type=int, default=0,
                    help="repartition the input if it has fewer partitions "
                    "(text mode; audio mode uses scan splits instead — "
                    "repartitioning would shuffle every audio blob)")
    ap.add_argument("--scan-split-mb", type=int, default=0,
                    help="set spark.sql.files.maxPartitionBytes (MB) before "
                    "the input scan; audio mode defaults to 16 so the "
                    "decode UDF parallelizes WITHOUT shuffling the binary "
                    "column (profiled: the blob shuffle, not the decode, "
                    "dominates otherwise)")
    ap.add_argument("--sig-buckets", type=int, default=0,
                    help="write the signatures checkpoint as a bucketed "
                    "table with this many buckets (0 = plain parquet). "
                    "Both verify-join legs and the cluster join then read "
                    "signatures exchange-free — size to ~one bucket per "
                    "executor core at the target scale")
    ap.add_argument("--local", default=None, help="local[N] master for smoke runs")
    args = ap.parse_args()

    spark = build_session(args)
    spark.sparkContext.setLogLevel("WARN")
    from lexis_minhash_spark.config import EngineConfig
    from lexis_minhash_spark.plans.pipeline import DedupPipeline

    cfg = EngineConfig(
        signature_size=args.signature_size,
        num_bands=args.num_bands,
        shingle_size=args.shingle_size,
        min_words=args.min_words,
        seed=args.seed,
    )
    scan_split_mb = args.scan_split_mb or (16 if args.mode == "audio" else 0)
    if scan_split_mb:
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(scan_split_mb * 1024 * 1024)
        )
    docs = spark.read.parquet(args.input)
    if args.mode in ("ngram", "ann"):
        import time as _time

        t0 = _time.monotonic()
        cap = args.max_bucket_size or None
        caches: list = []  # internal persists, released after the write
        if args.mode == "ngram":
            from lexis_minhash_spark.operators.dedup import ngram_jaccard_pairs

            pairs = ngram_jaccard_pairs(
                docs, text_col=args.text_col, id_col=args.id_col,
                n=args.ngram_n, threshold=args.threshold,
                max_doc_freq=args.max_doc_freq or None,
                cache_handle=caches,
            )
        else:
            from lexis_minhash_spark.operators.dedup import lsh_bucketed_cosine_pairs

            first = docs.select(args.embedding_col).head()
            if first is None or first[args.embedding_col] is None:
                raise SystemExit(
                    f"--input table is empty or {args.embedding_col!r} is "
                    "null in the first row — ann mode needs a non-empty "
                    "table with an array<float> --embedding-col"
                )
            dim = len(first[args.embedding_col])
            pairs = lsh_bucketed_cosine_pairs(
                docs, dim=dim, vec_col=args.embedding_col, id_col=args.id_col,
                threshold=args.threshold, n_planes=args.ann_planes,
                n_tables=args.ann_tables, seed=args.seed,
                max_bucket_size=cap, cache_handle=caches,
            )
        out = f"{args.workdir}/pairs"
        pairs.write.mode("overwrite").parquet(out)
        for c in caches:
            c.unpersist()
        n = spark.read.parquet(out).count()
        print(json.dumps({
            "mode": args.mode, "pairs": n, "out": out,
            "wall_ms": int((_time.monotonic() - t0) * 1000),
        }))
        spark.stop()
        return 0
    if args.min_parallelism and args.mode != "audio":
        # text rows are small; a repartition is cheap.  Audio blobs are NOT
        # repartitioned — scan splits above parallelize the decode without
        # moving the binary column through a shuffle.
        if docs.rdd.getNumPartitions() < args.min_parallelism:
            docs = docs.repartition(args.min_parallelism)
    pipe = DedupPipeline(
        spark, cfg, args.workdir,
        threshold=args.threshold,
        max_bucket_size=args.max_bucket_size,
        input_desc=args.input,
        sig_buckets=args.sig_buckets or None,
    )
    signature_fn = None
    if args.mode == "audio":
        from lexis_minhash_spark.operators.audio_dedup import with_audio_signatures

        signature_fn = lambda d: with_audio_signatures(d, cfg, id_col=args.id_col)
    clusters = pipe.run(
        docs, text_col=args.text_col, id_col=args.id_col, signature_fn=signature_fn
    )
    n = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(json.dumps({
        "rows": n,
        "clusters": n_clusters,
        "stages": [
            {"stage": r.name, "rows": r.rows, "wall_ms": r.wall_ms, "skipped": r.skipped}
            for r in pipe.results
        ],
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
