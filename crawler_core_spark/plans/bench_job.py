"""The benchmark crawl job — shared by bench.py and the two-cluster-size
scaling evidence (scripts/scaling_bench.py).

One deterministic frontier job: N synthetic URL lines (with
canonicalization-equivalent duplicate variants), distributed generation
(spark.range -> native exprs, no driver lists), DNS + denylist + robots
dimensions, bloom URL-seen, politeness-budgeted batches, image fetch
join against the synthetic corpus.  Identical inputs at any parallelism
level -> identical crawl order (the determinism contract).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from crawler_core_spark import synth
from crawler_core_spark.plans.crawl import CrawlEngine
from crawler_core_spark.sources.denylist import load_denylist
from crawler_core_spark.sources.targets import target_lines_df
from crawler_core_spark.storage import TableStore


def run_crawl_job(
    spark: SparkSession,
    n_urls: int,
    images_n: int | None = None,
    keep_store: bool = False,
    url_seen_kind: str = "bloom",
    img_px: tuple[int, int] = (96, 161),
) -> dict:
    # ~10% of lines are explicit-default-port variants of an earlier host:
    # they canonicalize identically and exercise the URL-seen dedup path.
    n_hosts = n_urls
    # format_string grows past 5 digits like Python %05d — lpad TRUNCATES
    # 6-digit ids to their first 5 chars, silently colliding 11 hosts onto
    # one name above n=100k (and fanning out the dns join 11x).
    host_of = lambda c: F.format_string("img-%05d.example.net", c)  # noqa: E731
    base = spark.range(n_hosts).select(
        (F.col("id") * 2).alias("line_no"), host_of(F.col("id")).alias("value")
    )
    dups = (
        spark.range(n_hosts)
        .filter(F.col("id") % 10 == 5)
        .select(
            (F.col("id") * 2 + 1).alias("line_no"),
            F.concat(host_of(F.col("id")), F.lit(":443")).alias("value"),
        )
    )
    lines = base.unionByName(dups)
    targets = target_lines_df(lines)
    dns = spark.range(n_hosts).select(
        host_of(F.col("id")).alias("hostname"),
        F.concat_ws(
            ".", F.lit("11"),
            (F.floor(F.col("id") / 65536) % 256).cast("string"),
            (F.floor(F.col("id") / 256) % 256).cast("string"),
            (F.col("id") % 256).cast("string"),
        ).alias("ip"),
        (F.col("id") % 41 != 0).alias("resolvable"),
    )
    dl = load_denylist(spark, lines=synth.DENYLIST_LINES)
    robots = spark.createDataFrame([("*", "/", True, 0.001)], synth.ROBOTS_SCHEMA)

    root = tempfile.mkdtemp(prefix="bench-wh-")
    # materialize the image corpus OUTSIDE the timed section: in production
    # it is a pre-existing Iceberg table, not part of crawl throughput.
    # Cached across runs — fully deterministic in (n, px, seed).
    if images_n is None:
        images_n = n_hosts
    n_img = min(n_hosts, images_n)
    # cache key covers EVERYTHING the corpus depends on: row count, pixel
    # range, synth seed/corrupt schedule AND a synth/codec version tag —
    # a stale /tmp parquet from older generator code must never feed a
    # bench or scaling-evidence run.
    from crawler_core_spark.operators.fetch import (
        IMAGES_BUCKET_COL,
        IMAGES_BUCKETS_DEFAULT,
        image_bucket_col,
    )

    # corpus is hive-partitioned by bucket(image_id) at write time so the
    # engine can push each batch's bucket set as a partition filter (J6
    # corpus pruning); the -b tag keys the cache on the layout too.
    images_path = (
        f"/tmp/spark-graft-corpus-v{synth.SYNTH_VERSION}-{n_img}"
        f"-{img_px[0]}x{img_px[1]}-s{synth.DEFAULT_SEED}-c{synth.DEFAULT_CORRUPT_EVERY}"
        f"-b{IMAGES_BUCKETS_DEFAULT}c1"  # c1 = image_id-clustered layout
    )
    if not os.path.exists(os.path.join(images_path, "_SUCCESS")):
        # cluster each bucket partition by image_id so the engine's
        # second-level In(image_id) pushdown gets tight row-group
        # min/max stats (one shuffle, paid once at corpus build).
        synth.images_df(
            spark, n_img, px_min=img_px[0], px_max=img_px[1]
        ).withColumn(
            IMAGES_BUCKET_COL, image_bucket_col(F.col("image_id"))
        ).repartition(F.col(IMAGES_BUCKET_COL)).sortWithinPartitions(
            IMAGES_BUCKET_COL, "image_id"
        ).write.partitionBy(IMAGES_BUCKET_COL).mode("overwrite").parquet(images_path)
    images = spark.read.parquet(images_path)
    store = TableStore(spark, root)
    eng = CrawlEngine(
        spark, store, images, url_seen_kind=url_seen_kind,
        batch_period=10_000.0, salt_buckets=16,
        url_seen_kw={"partitions": 64, "m_bits_per_partition": 1 << 22}
        if url_seen_kind == "bloom" else {},
        images_bucket_col=IMAGES_BUCKET_COL,
        images_buckets=IMAGES_BUCKETS_DEFAULT,
    )
    t0 = time.time()
    # reexecutions=0: in the reference, reexecutions are INSIDE the
    # scanner (one result per job, no crawler redelivery) — the engine's
    # redelivery loop is an extension, pytest-covered; the headline
    # throughput measures the reference-shaped workload (1 politeness
    # batch, each ERROR terminal on first attempt, like round 1).
    from crawler_core_spark.config import ScanConfig
    eng.publish(targets, dns, dl, robots, "bs-bench",
                scan_config=ScanConfig(reexecutions=0))
    t1 = time.time()
    stats = eng.run()
    t2 = time.time()
    wall = t2 - t0
    processed = sum(s.fetched + s.deduped for s in stats)
    out = {
        "wall_s": wall,
        "publish_s": t1 - t0,
        "run_s": t2 - t1,
        "urls_processed": processed,
        "urls_per_sec": processed / wall if wall > 0 else 0.0,
        "batches": len(stats),
        "step_timings": eng.step_timings,
        "store_root": root,
    }
    if not keep_store:
        shutil.rmtree(root, ignore_errors=True)
        out.pop("store_root")
    return out
