"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The query suite lives in ``crawler_core_spark.plans.queries``: one entry
per operator family from SURVEY.md §2 plus the training-data-pipeline
operators (dedup / minhash-LSH / simhash / ANN / text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the URL-frontier scheduler as one declarative plan —
    seed parse -> DNS join -> denylist joins -> status routing -> robots
    -> politeness-budgeted priority-window batch selection, over targets
    derived from sf0.001. Returns the first scheduled crawl batch."""
    from pyspark.sql import functions as F

    from crawler_core_spark.operators.scheduler import apply_robots, select_batch
    from crawler_core_spark.plans.queries import _publish_inputs, load
    from crawler_core_spark.operators.publish import parse_and_route

    targets, dns, denylist = _publish_inputs(spark, SF0001)
    routed = parse_and_route(targets, dns, denylist, "bs-entry")
    n = load(spark, SF0001, "nation")
    robots = n.select(
        F.lit("*").alias("host"),
        F.lit("/").alias("path_prefix"),
        (F.col("n_nationkey") >= 0).alias("allow"),
        (1.0 + F.col("n_nationkey") % 3).alias("crawl_delay"),
    ).limit(1)
    fr = apply_robots(routed.frontier, robots).filter(F.col("robots_allow"))
    empty_state = spark.createDataFrame(
        [], "host: string, next_fetch_time: double, crawl_delay: double"
    )
    batch = select_batch(fr, empty_state, clock=0.0, batch_period=10.0)
    return batch.select(
        "seq", "hostname", "ip", "port", "priority", "status", "url_canon"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawler_core_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from crawler_core_spark.plans.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
