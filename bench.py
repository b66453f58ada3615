"""Bench harness — headline frontier throughput + query timings.

Prints ONE JSON line:
  {"metric": "frontier_urls_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., ...}

Headline: the full crawl engine (publish -> politeness-batched fetch loop
-> atomic commits) over a synthetic frontier sized by SF, reporting URLs
scheduled+deduped per second (BASELINE.json metric). Query timings cover
the SURVEY §2 suite at $SPARK_GRAFT_SF_DIR.

Query timings are BEST-OF-N (BENCH_QUERY_REPEATS, default 3): this VM's
run-to-run wall-time variance is ±2x on identical plans, so single-run
per-query numbers across rounds are weather; best-of-N recovers the
plan-shape signal.

The headline crawl leg is ALSO best-of-N (BENCH_CRAWL_REPEATS, default
2): the decode stage alone swings 30-76 s between identical runs on
this VM, and the per-round BENCH record is a single driver invocation —
two legs with min-wall selection recovers the plan-shape signal the
same way the query loop does.  All leg values are reported.

The cc_stress leg (BENCH_CC_STRESS=1, default on) runs connected
components over a 10^6-node CHAIN — the adversarial shape for label
propagation (diameter = n; naive propagation would need 10^6 rounds) —
and records round count + per-round shuffled edge volume, asserting the
O(log diameter) round bound holds at bench scale.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_FRONTIER_URLS (default 120000),
     BENCH_QUERY_REPEATS (default 3),
     BENCH_CRAWL_REPEATS (default 2),
     BENCH_CC_STRESS (default 1), BENCH_CC_EDGES (default 1000000).
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

    crawl_repeats = max(1, int(os.environ.get("BENCH_CRAWL_REPEATS", "2")))
    legs = [run_crawl_job(spark, n_urls) for _ in range(crawl_repeats)]
    crawl = min(legs, key=lambda c: c["wall_s"])

    repeats = max(1, int(os.environ.get("BENCH_QUERY_REPEATS", "3")))
    q_times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        best = None
        for _ in range(repeats):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        q_times[name] = round(best, 3)
    total = round(sum(q_times.values()) + crawl["wall_s"], 3)

    out = {
        "metric": "frontier_urls_per_sec",
        "value": round(crawl["urls_per_sec"], 1),
        "unit": "sec",
        "queries": q_times,
        "sf": sf,
        "crawl_wall_s": round(crawl["wall_s"], 2),
        "crawl_wall_s_legs": [round(c["wall_s"], 2) for c in legs],
        "crawl_urls": crawl["urls_processed"],
        "crawl_batches": crawl["batches"],
        "total_sec": total,
        "cpus": int(cpus),
        "query_repeats": repeats,
    }

    if os.environ.get("BENCH_CC_STRESS", "1") == "1":
        import math

        from pyspark.sql import functions as F

        from crawler_core_spark.operators.components import connected_components

        n_edges = int(os.environ.get("BENCH_CC_EDGES", "1000000"))
        edges = spark.range(n_edges).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        stats: dict = {}
        t0 = time.time()
        cc = connected_components(edges, stats=stats)
        n_comp = cc.select("component").distinct().count()
        cc_wall = time.time() - t0
        assert n_comp == 1, n_comp  # one chain, one component
        # O(log diameter) contract: a diameter-n chain must converge in
        # ~log2(n) rounds (+1 fixpoint-confirm, + slack), NOT O(n)
        bound = int(math.log2(n_edges)) + 6
        assert stats["rounds"] <= bound, (stats["rounds"], bound)
        out["cc_stress"] = {
            "edges": n_edges,
            "wall_s": round(cc_wall, 2),
            "rounds": stats["rounds"],
            "round_bound": bound,
            # per-round shuffle volume == the round's edge count; for the
            # chain it stays O(n) flat while the diameter collapses
            "max_edges_per_round": max(stats["edges_per_round"]),
            "last_edges_per_round": stats["edges_per_round"][-1],
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
