#!/usr/bin/env python
"""Executor-model scaling evidence for EVERY pipeline stage (round-3
verdict items #2 and #6).

The north rule's criterion is throughput scaling efficiency >= 0.8 from N
to 4N *executors*.  Threads inside one JVM are not executors: they share
one python-worker pool, Arrow pipe, heap, GC, page cache and disk, which
is exactly what a cluster scale-out multiplies (round-3 BENCH.md measured
the identical signature stage at 0.69 thread-model vs 0.97
process-model).  This script therefore measures the WHOLE pipeline under
the shared-nothing process model:

  one process, full input            vs     4 concurrent local[1] processes
  (identical phase sequence)                on disjoint shards per phase

Phases (both sides run the SAME code; only the shard predicate differs):

  sig    docs, row-sharded by pmod(doc_id, 4)        -> signatures parquet
  cmap   sigs (same row shards) -> bands explode,
         partitionBy(band_shard = pmod(xxhash64(band_idx, band_hash), 4))
  cred   band shard j: read every map output's band_shard=j subdir ->
         grouped candidate generation (pre-agg hot-bucket cap) -> pairs
  verify pair shard p = pmod(xxhash64(a, b), 4): global distinct over the
         shard, join signatures, codegen zip_with verify -> verified pairs
  cc     connected components + singleton clusters (driver-side serial,
         measured once, NOT sharded — reported as the Amdahl term)

The parquet handoff between phases is the file-materialized equivalent of
a cluster shuffle: cand-map writes its bands partitioned by the reduce
key (a shuffle write), cand-reduce reads only its key range (a shuffle
read).  No pair can cross band shards during generation (a bucket's rows
all carry one band key), and the global pair dedup happens in the
pair-sharded verify phase, exactly where a cluster plan would put the
distinct's exchange.  The one-process baseline runs the IDENTICAL
materialized phases, so both sides pay the same I/O; the baseline is
additionally compared against the round-3 un-materialized whole-job
number in BENCH.md.

Per-phase efficiency  = T_base(phase) / (4 * max_shard_wall(phase)).
Whole-job efficiency  = (sum of base phases + cc)
                        / (4 * (sum of max shard walls + cc)).

JVM/session startup and the one-time python-worker spawn are excluded
from every timed region (a long-lived cluster amortizes them); each
phase subprocess warms the session, then times the phase alone.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PHASE_JOB = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from lexis_minhash_spark.session import get_spark
from lexis_minhash_spark.config import EngineConfig
from lexis_minhash_spark import ops

phase, shard, corpus, work = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
shard_i = None if shard == "all" else int(shard)
tag = "all" if shard_i is None else str(shard_i)
CFG = EngineConfig(seed=12345)
spark = get_spark(app_name=f"execmodel-{phase}-{tag}", master="local[1]",
                  shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

def _warm(df):
    # spawn the python worker + import numpy outside the timed region
    ops.with_signatures(df.limit(4), CFG).count()

if phase == "sig":
    docs = spark.read.parquet(corpus).withColumnRenamed("transcript", "text")
    if shard_i is not None:
        docs = docs.where(F.pmod(F.col("doc_id"), F.lit(4)) == shard_i)
    docs.count()
    _warm(docs)
    t0 = time.monotonic()
    ops.with_signatures(docs, CFG).write.mode("overwrite").parquet(
        f"{work}/sigs/shard_{tag}")
    wall = time.monotonic() - t0
elif phase == "cmap":
    src = f"{work}/sigs/shard_{tag}"
    sig = spark.read.parquet(src)
    sig.count()
    t0 = time.monotonic()
    bands = ops.bands_table(sig).withColumn(
        "band_shard", F.pmod(F.xxhash64("band_idx", "band_hash"), F.lit(4)))
    bands.write.mode("overwrite").partitionBy("band_shard").parquet(
        f"{work}/cmap/shard_{tag}")
    wall = time.monotonic() - t0
elif phase == "cred":
    if shard_i is None:
        src = f"{work}/cmap/shard_all"
    else:
        src = f"{work}/cmap/shard_*/band_shard={shard_i}"
    bands = spark.read.parquet(src).select("doc_id", "band_idx", "band_hash")
    bands.count()
    t0 = time.monotonic()
    cands = ops.candidate_pairs_grouped(bands, max_bucket_size=10_000)
    cands.write.mode("overwrite").parquet(f"{work}/cands/shard_{tag}")
    wall = time.monotonic() - t0
elif phase == "verify":
    cands = spark.read.parquet(f"{work}/cands/shard_*")
    sigs = spark.read.parquet(f"{work}/sigs/shard_*")
    cands.count(); sigs.count()
    t0 = time.monotonic()
    if shard_i is not None:
        cands = cands.where(F.pmod(F.xxhash64("a", "b"), F.lit(4)) == shard_i)
    cands = cands.distinct()   # global pair dedup lives in this exchange
    ops.verified_pairs(cands, sigs, 0.75).write.mode("overwrite").parquet(
        f"{work}/verified/shard_{tag}")
    wall = time.monotonic() - t0
elif phase == "cc":
    ver = spark.read.parquet(f"{work}/verified/shard_*")
    sigs = spark.read.parquet(f"{work}/sigs/shard_*")
    ver.count(); sigs.count()
    t0 = time.monotonic()
    cc = ops.connected_components(ver.select("a", "b").distinct())
    n = ops.clusters_with_singletons(sigs, cc).count()
    wall = time.monotonic() - t0
else:
    raise SystemExit(f"unknown phase {phase}")
print(json.dumps({"phase": phase, "shard": tag, "wall_sec": round(wall, 2)}))
spark.stop()
"""


def run_phase_proc(phase: str, shard: str, corpus: str, work: str):
    f = tempfile.NamedTemporaryFile("w", suffix=".py", delete=False)
    f.write(PHASE_JOB)
    f.close()
    p = subprocess.Popen(
        [sys.executable, f.name, phase, shard, corpus, work],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    return p, f.name


def collect(p, path) -> float:
    out, err = p.communicate(timeout=7200)
    os.unlink(path)
    for line in out.splitlines():
        line = line.strip().split("\r")[-1]
        if line.startswith('{"phase"'):
            return json.loads(line)["wall_sec"]
    raise RuntimeError(f"phase failed: {out[-1500:]} {err[-1500:]}")


def wait_for_quiet(threshold: float, max_wait: int = 900) -> float:
    waited = 0
    while waited < max_wait:
        load = os.getloadavg()[0]
        if load < threshold:
            return load
        time.sleep(30)
        waited += 30
    return os.getloadavg()[0]


PHASES = ["sig", "cmap", "cred", "verify"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=1_000_000)
    ap.add_argument("--quiet", type=float, default=3.0)
    ap.add_argument("--skip-base", action="store_true",
                    help="reuse base timings from a previous run (printed)")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import bench as _bench

    corpus = f"/tmp/lexis_bench_corpus_{args.clips}_42_{_bench.CORPUS_VERSION}"
    assert os.path.exists(os.path.join(corpus, "_SUCCESS")), f"generate {corpus} first"

    results: dict = {"clips": args.clips}

    # ---- one-process baseline: identical phases, full input --------------
    base_work = f"/tmp/lexis_execmodel_{args.clips}_base"
    if not args.skip_base:
        shutil.rmtree(base_work, ignore_errors=True)
        os.makedirs(base_work, exist_ok=True)
        base = {}
        for ph in PHASES + ["cc"]:
            load = wait_for_quiet(args.quiet)
            p, f = run_phase_proc(ph, "all", corpus, base_work)
            base[ph] = collect(p, f)
            print(f"base {ph}: {base[ph]}s (load {load:.1f})", flush=True)
        results["base"] = base

    # ---- executor model: 4 concurrent local[1] processes per phase -------
    exec_work = f"/tmp/lexis_execmodel_{args.clips}_exec"
    shutil.rmtree(exec_work, ignore_errors=True)
    os.makedirs(exec_work, exist_ok=True)
    shards: dict = {}
    for ph in PHASES:
        load = wait_for_quiet(args.quiet)
        procs = [run_phase_proc(ph, str(i), corpus, exec_work) for i in range(4)]
        walls = [collect(p, f) for p, f in procs]
        shards[ph] = walls
        print(f"exec {ph}: shards {walls} max {max(walls)}s (load {load:.1f})",
              flush=True)
    load = wait_for_quiet(args.quiet)
    p, f = run_phase_proc("cc", "all", corpus, exec_work)
    cc_exec = collect(p, f)
    print(f"exec cc (driver-serial): {cc_exec}s (load {load:.1f})", flush=True)
    results["exec_shards"] = shards
    results["exec_cc"] = cc_exec

    if "base" in results:
        base = results["base"]
        per_phase = {
            ph: round(base[ph] / (4.0 * max(shards[ph])), 3) for ph in PHASES
        }
        t_base = sum(base[ph] for ph in PHASES) + base["cc"]
        t_exec = sum(max(shards[ph]) for ph in PHASES) + cc_exec
        results["per_phase_efficiency"] = per_phase
        results["whole_job"] = {
            "base_total_sec": round(t_base, 1),
            "exec_total_sec": round(t_exec, 1),
            "clips_per_sec_base": round(args.clips / t_base, 1),
            "clips_per_sec_exec": round(args.clips / t_exec, 1),
            "efficiency": round(t_base / (4.0 * t_exec), 3),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
