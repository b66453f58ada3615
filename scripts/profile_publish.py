"""VERDICT r3 #6 — profiled best-of-5 rerun of publish_route /
publish_histogram at sf0.1 on local[32].

r2 single-run: 2.13 / 1.98 s.  r3 best-of-3: 2.77 / 2.50 s — best-of-N
landing ABOVE an old single run would suggest a real +30%.  This script
re-measures on the round-4 tree (which additionally routed publish
through the URL-path-aware parser) and breaks the wall into phases:
  parse   — target-string parse UDF + dns join (all_jobs materialized)
  route   — status routing + denylist joins on a parsed snapshot
so any real regression is attributable to a phase, not guessed.

Appends nothing; prints one JSON line.  Run:
  python scripts/profile_publish.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("PROFILE_REPEATS", "5"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from crawler_core_spark.plans.queries import QUERIES
    from crawler_core_spark.session import get_spark

    spark = get_spark(app_name="profile-publish", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, object] = {"sf_dir": SF_DIR, "repeats": REPEATS}
    for name in ("publish_route", "publish_histogram"):
        runs = []
        for _ in range(REPEATS):
            t0 = time.monotonic()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.monotonic() - t0, 3))
        out[name] = {"best": min(runs), "runs": runs}

    # phase split: parse+dns alone vs full route, on the same inputs
    from crawler_core_spark.operators.publish import parse_and_route
    from crawler_core_spark.plans.queries import _publish_inputs

    targets, dns, denylist = _publish_inputs(spark, SF_DIR)
    parse_runs, route_runs = [], []
    for _ in range(REPEATS):
        t0 = time.monotonic()
        routed = parse_and_route(targets, dns, denylist, "bs-prof")
        routed.all_jobs.write.format("noop").mode("overwrite").save()
        route_runs.append(round(time.monotonic() - t0, 3))
    out["full_parse_and_route"] = {"best": min(route_runs), "runs": route_runs}

    from pyspark.sql import functions as F

    from crawler_core_spark.functions.url import parse_targets_udf

    parse = parse_targets_udf()
    for _ in range(REPEATS):
        t0 = time.monotonic()
        targets.withColumn("p", parse(F.col("target"))).select(
            "seq", "p.*"
        ).write.format("noop").mode("overwrite").save()
        parse_runs.append(round(time.monotonic() - t0, 3))
    out["parse_only"] = {"best": min(parse_runs), "runs": parse_runs}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
