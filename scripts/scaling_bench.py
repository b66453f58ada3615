"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8 from
N to 4N executors). No real cluster in the sandbox, so the same job runs
at local[8] and local[32] on identical input; we report throughput at
both, efficiency T(32)/(4*T(8)), and assert crawl-order + URL-seen
equality between the runs. Appends the measurement to BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_urls]
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_core_spark.plans.bench_job import run_crawl_job
from crawler_core_spark.session import get_spark
from crawler_core_spark.storage import TableStore


def crawl_order_and_seen(spark, root: str):
    store = TableStore(spark, root)
    rows = store.read("results").select("seq", "crawl_pos", "url_canon").collect()
    order = sorted(
        (r["crawl_pos"], r["seq"]) for r in rows if r["crawl_pos"] is not None
    )
    seen = {r["url_canon"] for r in rows if r["crawl_pos"] is not None}
    return order, seen


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    results = {}
    stores = {}
    for cores in (8, 32):
        spark = get_spark(app_name=f"scaling-{cores}", master=f"local[{cores}]")
        spark.sparkContext.setLogLevel("ERROR")
        r = run_crawl_job(spark, n_urls, keep_store=True)
        results[cores] = r
        stores[cores] = r["store_root"]
        order, seen = crawl_order_and_seen(spark, r["store_root"])
        results[cores]["order_len"] = len(order)
        results[cores]["_order"] = order
        results[cores]["_seen"] = seen
        spark.stop()

    same_order = results[8].pop("_order") == results[32].pop("_order")
    same_seen = results[8].pop("_seen") == results[32].pop("_seen")
    for root in stores.values():
        shutil.rmtree(root, ignore_errors=True)

    t8, t32 = results[8]["urls_per_sec"], results[32]["urls_per_sec"]
    eff = t32 / (4 * t8) if t8 > 0 else 0.0
    out = {
        "n_urls": n_urls,
        "local8": {k: round(v, 2) if isinstance(v, float) else v
                   for k, v in results[8].items() if not k.startswith("store")},
        "local32": {k: round(v, 2) if isinstance(v, float) else v
                    for k, v in results[32].items() if not k.startswith("store")},
        "scaling_efficiency": round(eff, 3),
        "speedup_8_to_32": round(t32 / t8, 2) if t8 else 0.0,
        "crawl_order_equal": same_order,
        "url_seen_equal": same_seen,
    }
    print(json.dumps(out))

    os.makedirs("BENCH", exist_ok=True)
    path = "BENCH/BASELINE.md"
    header = not os.path.exists(path)
    with open(path, "a") as f:
        if header:
            f.write(
                "# BENCH — two-cluster-size scaling evidence\n\n"
                "Same frontier job (publish -> bloom URL-seen -> politeness "
                "batches -> fetch join) on identical deterministic input at "
                "two parallelism levels (sandbox stand-in for N vs 4N "
                "executors). Efficiency = T(32) / (4 * T(8)).\n\n"
                "| n_urls | T(8) urls/s | T(32) urls/s | speedup | efficiency "
                "| order equal | seen equal |\n|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {n_urls} | {t8:.0f} | {t32:.0f} | {t32 / t8 if t8 else 0:.2f}x "
            f"| {eff:.3f} | {same_order} | {same_seen} |\n"
        )


if __name__ == "__main__":
    main()
