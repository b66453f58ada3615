"""Spark-free saturation probe for the decode kernel.

Runs the engine's ACTUAL decode function (functions/image.py:decode_image
— zlib inflate + numpy reshape, the dominant per-row cost of the fetch
stage) on real corpus rows across increasing process counts, bypassing
Spark/JVM entirely.  If aggregate rows/sec plateaus well below linear,
the ceiling is the box (memory bandwidth / allocator), not Spark, the
JVM, or the plan — the direct evidence behind BENCH/BASELINE.md's
single-box-ceiling analysis.

Usage: python scripts/saturation_probe.py [corpus_dir]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_CORPUS = "/tmp/spark-graft-corpus-v2-480000-96x161-s42-c97-b64/img_bucket=0"


def _load_rows(corpus_dir: str, n: int = 6000) -> list[bytes]:
    import pyarrow.parquet as pq

    t = pq.read_table(corpus_dir, columns=["bytes"])
    return [b.as_py() for b in t.column("bytes") if b.as_py() is not None][:n]


def _work(args):
    rows, reps = args
    from crawler_core_spark.functions.image import decode_image

    t0 = time.time()
    n = 0
    for _ in range(reps):
        for b in rows:
            try:
                decode_image(b)
                n += 1
            except Exception:
                pass
    return n, time.time() - t0


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CORPUS
    rows = _load_rows(corpus)
    out = []
    for w in (1, 2, 4, 8, 16, 32):
        with mp.get_context("fork").Pool(w) as pool:
            t0 = time.time()
            res = pool.map(_work, [(rows, 1)] * w)
            wall = time.time() - t0
        total = sum(r[0] for r in res)
        rec = {
            "workers": w,
            "rows_per_sec": round(total / wall),
            "per_worker_rows_per_sec": round(total / wall / w),
        }
        out.append(rec)
        print(json.dumps(rec))
    base = out[0]["rows_per_sec"]
    print(
        json.dumps(
            {
                "speedup_at_8": round(out[3]["rows_per_sec"] / base, 2),
                "speedup_at_32": round(out[5]["rows_per_sec"] / base, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
