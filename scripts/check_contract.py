#!/usr/bin/env python
"""Simulate the driver's correctness gate: run every __spark_entry__
queries() entry at sf0.01 and compare with oracle_sql() via DuckDB
(row count + column names + order-insensitive value hash)."""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as E
from lexis_minhash_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        "|".join(norm_cell(r[c]) for c in cols) for _, r in pdf.iterrows()
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error {ex}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows ({t_spark:.1f}s spark)")
            continue
        t0 = time.time()
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error {ex}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if not problems and value_hash(sdf) != value_hash(ddf):
            problems.append("value hash mismatch")
            # show a diff sample
            key = sorted(sdf.columns)
            s_set = set(tuple(norm_cell(r[c]) for c in key) for _, r in sdf.iterrows())
            d_set = set(tuple(norm_cell(r[c]) for c in key) for _, r in ddf.iterrows())
            only_s = list(s_set - d_set)[:3]
            only_d = list(d_set - s_set)[:3]
            problems.append(f"only-spark={only_s} only-duck={only_d}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows (spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)")
    spark.stop()
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
