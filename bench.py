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
     BENCH_FRONTIER_URLS (default 120000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from crawler_core_spark.plans.bench_job import run_crawl_job
    from crawler_core_spark.plans.queries import QUERIES
    from crawler_core_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_urls = int(os.environ.get("BENCH_FRONTIER_URLS", "120000"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="crawler-core-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    crawl = run_crawl_job(spark, n_urls)

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
