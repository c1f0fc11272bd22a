#!/usr/bin/env python
"""Sweep the minhash kernel's block size (cache-blocking experiment).

BLOCK_ELEMS bounds the (rows × S) float64 intermediate per block.  The
elementwise carry-chain passes (floor/mul/add/sub + reduceat) re-read the
block ~8×; if the block fits in cache those passes run at cache bandwidth,
if not they hit DRAM every pass.  8 MB/buffer (the round-4 value) is L3
territory on most hosts and DRAM under co-tenancy — this sweep measures
the docs/s as a function of block footprint, single-threaded, checksum-
gated (any value change = kernel broke).

Usage: python scripts/kernel_block_sweep.py [n_docs] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np

from lexis_minhash_spark.config import EngineConfig
from lexis_minhash_spark import kernels as K
from lexis_minhash_spark.sources.synth import generate_clips


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    clips, _ = generate_clips(n_clips=n_docs, seed=42, with_audio=False)
    texts = [t.lower().strip() for t in clips["transcript"].tolist()]
    cfg = EngineConfig(seed=12345)
    a, b = cfg.coefficients
    hc, counts = K.batch_shingle_hashes(texts, cfg.shingle_size)

    ref_sig = None
    results = []
    for block in (31_250, 62_500, 125_000, 250_000, 500_000, 1_000_000, 2_000_000):
        K.BLOCK_ELEMS = block
        K._SCRATCH_CACHE.clear()
        K.minhash_batch(hc, counts, a, b)  # warm scratch for this shape
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sig = K.minhash_batch(hc, counts, a, b)
            best = min(best, time.perf_counter() - t0)
        checksum = int(sig.astype(np.uint64).sum())
        if ref_sig is None:
            ref_sig = checksum
        assert checksum == ref_sig, f"checksum drift at block={block}"
        results.append((block, round(best, 3), round(n_docs / best, 1)))
        print({"block_elems": block, "mb_per_buf": round(block * 8 / 1e6, 1),
               "best_sec": round(best, 3), "docs_per_sec": round(n_docs / best, 1),
               "checksum": checksum}, flush=True)
    best_row = min(results, key=lambda r: r[1])
    print({"best_block": best_row[0], "docs_per_sec": best_row[2]})


if __name__ == "__main__":
    main()
