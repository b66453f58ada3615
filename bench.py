"""Bench harness — headline frontier throughput + query timings.

Prints ONE JSON line:
  {"metric": "frontier_urls_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., ...}

Headline: the full crawl engine (publish -> politeness-batched fetch loop
-> atomic commits) over a synthetic frontier sized by SF, reporting URLs
scheduled+deduped per second (BASELINE.json metric). Query timings cover
the SURVEY §2 suite at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_FRONTIER_URLS (default 30000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_crawl(spark, n_urls: int) -> dict:
    from pyspark.sql import functions as F

    from crawler_core_spark import synth
    from crawler_core_spark.plans.crawl import CrawlEngine
    from crawler_core_spark.sources.denylist import load_denylist
    from crawler_core_spark.sources.dns import dns_table
    from crawler_core_spark.sources.targets import target_lines_df
    from crawler_core_spark.storage import TableStore

    # distributed seed generation: (line_no, value) straight from range —
    # no driver-side list at bench scale.
    n_hosts = n_urls
    lines = spark.range(n_hosts).select(
        F.col("id").alias("line_no"),
        F.concat(
            F.lit("img-"),
            F.lpad(F.col("id").cast("string"), 5, "0"),
            F.lit(".example.net"),
            # every 10th line a canonicalization-equivalent dup variant port
            F.when(F.col("id") % 10 == 5, F.lit(":443")).otherwise(F.lit("")),
        ).alias("value"),
    )
    targets = target_lines_df(lines)
    dns = spark.range(n_hosts).select(
        F.concat(F.lit("img-"), F.lpad(F.col("id").cast("string"), 5, "0"), F.lit(".example.net")).alias("hostname"),
        F.concat_ws(
            ".", F.lit("11"),
            (F.floor(F.col("id") / 65536) % 256).cast("string"),
            (F.floor(F.col("id") / 256) % 256).cast("string"),
            (F.col("id") % 256).cast("string"),
        ).alias("ip"),
        (F.col("id") % 41 != 0).alias("resolvable"),
    )
    dl = load_denylist(spark, lines=synth.DENYLIST_LINES)
    robots = spark.createDataFrame(
        [("*", "/", True, 0.001)], synth.ROBOTS_SCHEMA
    )
    images = synth.images_df(spark, min(n_hosts, 5000))

    root = tempfile.mkdtemp(prefix="bench-wh-")
    try:
        store = TableStore(spark, root)
        eng = CrawlEngine(
            spark, store, images, url_seen_kind="bloom",
            batch_period=10_000.0, salt_buckets=16,
            url_seen_kw={"partitions": 64, "m_bits_per_partition": 1 << 22},
        )
        t0 = time.time()
        eng.publish(targets, dns, dl, robots, "bs-bench")
        stats = eng.run()
        wall = time.time() - t0
        processed = sum(s.fetched + s.deduped for s in stats)
        return {
            "wall_s": wall,
            "urls_processed": processed,
            "urls_per_sec": processed / wall if wall > 0 else 0.0,
            "batches": len(stats),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from crawler_core_spark.plans.queries import QUERIES
    from crawler_core_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_urls = int(os.environ.get("BENCH_FRONTIER_URLS", "30000"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="crawler-core-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    crawl = run_crawl(spark, n_urls)

    q_times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        q_times[name] = round(time.time() - t0, 3)
    total = round(sum(q_times.values()) + crawl["wall_s"], 3)

    print(
        json.dumps(
            {
                "metric": "frontier_urls_per_sec",
                "value": round(crawl["urls_per_sec"], 1),
                "unit": "sec",
                "queries": q_times,
                "sf": sf,
                "crawl_wall_s": round(crawl["wall_s"], 2),
                "crawl_urls": crawl["urls_processed"],
                "crawl_batches": crawl["batches"],
                "total_sec": total,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
