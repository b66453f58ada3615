"""Spark-free saturation probe for the decode kernel.

Runs the engine's ACTUAL decode function (functions/image.py:decode_image
— zlib inflate + numpy reshape, the dominant per-row cost of the fetch
stage) on real corpus rows across increasing process counts, bypassing
Spark/JVM entirely.  If aggregate rows/sec plateaus well below linear,
the ceiling is the box (memory bandwidth / allocator), not Spark, the
JVM, or the plan — the direct evidence behind BENCH/BASELINE.md's
single-box-ceiling analysis.

Round 5: also the WEATHER GATE for scaling_bench.py — a north-rule
scaling leg is only meaningful when the bare kernel itself scales in the
same window (`probe_ratio()`), otherwise the measurement reports the
box's contention, not the plan's.  Rows fall back to synthesized corpus
bytes when no bench corpus is on disk, so the gate needs no prior run.

Usage: python scripts/saturation_probe.py [corpus_dir|--synth]
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


def _synth_rows(n: int = 3000) -> list[bytes]:
    """Deterministic corpus-shaped bytes when no bench corpus exists —
    same encoder the bench corpus uses (synth.make_image_row)."""
    from crawler_core_spark import synth

    return [synth.make_image_row(i)["bytes"] for i in range(n)]


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


def _measure(rows: list[bytes], w: int) -> float:
    with mp.get_context("fork").Pool(w) as pool:
        t0 = time.time()
        res = pool.map(_work, [(rows, 1)] * w)
        wall = time.time() - t0
    return sum(r[0] for r in res) / wall


def probe_ratio(corpus_dir: str | None = None, workers=(8, 32)) -> dict:
    """The weather gate: bare-kernel rows/sec at each worker count plus
    the N->4N ratio.  A healthy window shows the kernel still gaining
    from 8 to 32 workers; a saturated bus shows <= ~1.0."""
    if corpus_dir and os.path.isdir(corpus_dir):
        rows = _load_rows(corpus_dir)
        src = corpus_dir
    else:
        rows = _synth_rows()
        src = "synth"
    out = {"rows_src": src, "probed_at": time.strftime("%Y-%m-%dT%H:%M:%S")}
    rps = {}
    for w in workers:
        rps[w] = _measure(rows, w)
        out[f"kernel_rps_{w}"] = round(rps[w])
    lo, hi = min(workers), max(workers)
    out["kernel_ratio"] = round(rps[hi] / rps[lo], 3)
    return out


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CORPUS
    if arg == "--synth":
        rows, src = _synth_rows(), "synth"
    elif os.path.isdir(arg):
        rows, src = _load_rows(arg), arg
    elif len(sys.argv) > 1:
        # an EXPLICIT corpus path that doesn't exist must fail loudly —
        # silently probing synth bytes would record saturation numbers
        # from the wrong workload with nothing in the output to show it
        # (review r5); only the built-in default may fall back
        raise SystemExit(f"saturation_probe: no such corpus dir: {arg}")
    else:
        rows, src = _synth_rows(), "synth (default corpus absent)"
    out = []
    for w in (1, 2, 4, 8, 16, 32):
        rps = _measure(rows, w)
        rec = {
            "workers": w,
            "rows_src": src,
            "rows_per_sec": round(rps),
            "per_worker_rows_per_sec": round(rps / w),
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
