"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8 from
N to 4N executors). No real cluster in the sandbox, so the same job runs
at local[8] and local[32] on identical input; we report throughput at
both, efficiency T(32)/(4*T(8)), and assert crawl-order + URL-seen
equality between the runs. Appends the measurement to BENCH/BASELINE.md.

Each parallelism level runs in its own subprocess: two SparkSessions in
one JVM contaminate each other's timing (measured 2.4x slowdown on the
second session).

Usage: python scripts/scaling_bench.py [n_urls]
       python scripts/scaling_bench.py --run <cores> <n_urls> <out_json>
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(cores: int, n_urls: int, out_json: str) -> None:
    from crawler_core_spark.plans.bench_job import run_crawl_job
    from crawler_core_spark.session import get_spark
    from crawler_core_spark.storage import TableStore

    spark = get_spark(app_name=f"scaling-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    r = run_crawl_job(spark, n_urls, keep_store=True)
    store = TableStore(spark, r["store_root"])
    rows = store.read("results").select("seq", "crawl_pos", "url_canon").collect()
    r["order"] = sorted(
        [r_["seq"], r_["crawl_pos"]] for r_ in rows if r_["crawl_pos"] is not None
    )
    r["seen"] = sorted({r_["url_canon"] for r_ in rows if r_["crawl_pos"] is not None})
    with open(out_json, "w") as f:
        json.dump(r, f)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        run_one(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return

    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    results = {}
    for cores in (8, 32):
        out = f"/tmp/scaling_{cores}.json"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cores), str(n_urls), out],
            check=True, cwd=REPO,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        with open(out) as f:
            results[cores] = json.load(f)
        shutil.rmtree(results[cores].pop("store_root"), ignore_errors=True)

    same_order = results[8].pop("order") == results[32].pop("order")
    same_seen = results[8].pop("seen") == results[32].pop("seen")
    t8, t32 = results[8]["urls_per_sec"], results[32]["urls_per_sec"]
    eff = t32 / (4 * t8) if t8 > 0 else 0.0
    out = {
        "n_urls": n_urls,
        "local8": {k: round(v, 2) if isinstance(v, float) else v for k, v in results[8].items()},
        "local32": {k: round(v, 2) if isinstance(v, float) else v for k, v in results[32].items()},
        "scaling_efficiency": round(eff, 3),
        "speedup_8_to_32": round(t32 / t8, 2) if t8 else 0.0,
        "crawl_order_equal": same_order,
        "url_seen_equal": same_seen,
    }
    print(json.dumps(out))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    header = not os.path.exists(path)
    with open(path, "a") as f:
        if header:
            f.write(
                "# BENCH — two-cluster-size scaling evidence\n\n"
                "Same frontier job (publish -> bloom URL-seen -> politeness "
                "batches -> fetch join) on identical deterministic input at "
                "two parallelism levels (sandbox stand-in for N vs 4N "
                "executors), one subprocess each. Efficiency = T(32) / (4 * T(8)).\n\n"
                "| n_urls | T(8) urls/s | T(32) urls/s | speedup | efficiency "
                "| order equal | seen equal |\n|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {n_urls} | {t8:.0f} | {t32:.0f} | {t32 / t8 if t8 else 0:.2f}x "
            f"| {eff:.3f} | {same_order} | {same_seen} |\n"
        )


if __name__ == "__main__":
    main()
