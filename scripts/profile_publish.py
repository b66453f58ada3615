"""Publish-phase scaling profile (round-2, judge item 8).

Runs ONLY the publish pipeline (parse UDF -> dns join -> denylist ->
robots -> frontier/results/counters stage+commit) at a given parallelism
in a fresh subprocess, printing step timings, to locate the 2->8 scaling
gap and evaluate Arrow batch sizing for the slim-row parse stage.

Usage:  python scripts/profile_publish.py                 # matrix driver
        python scripts/profile_publish.py --run <cores> <n> <arrow_batch>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(cores: int, n: int, arrow_batch: int) -> None:
    from pyspark.sql import functions as F

    from crawler_core_spark import synth
    from crawler_core_spark.plans.crawl import CrawlEngine
    from crawler_core_spark.session import get_spark
    from crawler_core_spark.sources.denylist import load_denylist
    from crawler_core_spark.sources.targets import target_lines_df
    from crawler_core_spark.storage import TableStore
    import tempfile

    spark = get_spark(
        app_name=f"pubprof-{cores}", master=f"local[{cores}]",
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": str(arrow_batch)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # format_string grows past 5 digits like Python %05d — lpad TRUNCATES
    # 6-digit ids to their first 5 chars, silently colliding 11 hosts onto
    # one name above n=100k (and fanning out the dns join 11x).
    host_of = lambda c: F.format_string("img-%05d.example.net", c)  # noqa: E731
    lines = spark.range(n).select(
        F.col("id").alias("line_no"), host_of(F.col("id")).alias("value")
    )
    targets = target_lines_df(lines)
    dns = spark.range(n).select(
        host_of(F.col("id")).alias("hostname"),
        F.concat_ws(".", F.lit("11"),
                    (F.floor(F.col("id") / 65536) % 256).cast("string"),
                    (F.floor(F.col("id") / 256) % 256).cast("string"),
                    (F.col("id") % 256).cast("string")).alias("ip"),
        (F.col("id") % 41 != 0).alias("resolvable"),
    )
    dl = load_denylist(spark, lines=synth.DENYLIST_LINES)
    robots = spark.createDataFrame([("*", "/", True, 0.001)], synth.ROBOTS_SCHEMA)
    store = TableStore(spark, tempfile.mkdtemp(prefix=f"pubprof-{cores}-"))
    eng = CrawlEngine(spark, store, images=None)
    t0 = time.time()
    eng.publish(targets, dns, dl, robots, "bs-prof")
    wall = time.time() - t0
    print(json.dumps({
        "cores": cores, "n": n, "arrow_batch": arrow_batch,
        "publish_s": round(wall, 2),
        "urls_per_s": round(n / wall, 1),
        "steps": eng.step_timings[0],
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        run_one(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    for arrow_batch in (2000, 16384):
        for cores in (2, 8, 32):
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run",
                 str(cores), str(n), str(arrow_batch)],
                check=True, cwd=REPO,
            )


if __name__ == "__main__":
    main()
