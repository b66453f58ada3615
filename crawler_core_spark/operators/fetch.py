"""Fetch stage (J6 [EXT]) — frontier batch -> image corpus join -> statuses.

"Fetching" a URL means joining the scheduled batch to the images table by
content key (SURVEY.md S7/J6).  Status taxonomy mirrors the reference
worker (``core/Worker.java:72-140``):

- corpus hit + decode ok            -> SUCCESS   (result non-null, java:104-107)
- corpus miss                       -> EMPTY     (null result, java:104-107)
- decode failure (corrupt bytes)    -> ERROR     (ExecutionException, java:113-118)
- deadline exceeded                 -> CANCELLED (timeout -> cancel, java:78-91);
  the timeout apparatus (~580 LoC of executors/futures) is replaced by a
  *deadline-as-data* column: fetch_cost_ms > scan_timeout_ms.

Byte-column hygiene (SURVEY.md §4 item 4): scheduling shuffles only
``image_id``-sized rows; ``bytes`` enters the plan at this last stage and
is never part of a shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_core_spark.functions.image import decode_meta_udf

# reference default scan timeout: 840_000 ms (WorkerCommandConfig.java:38-44).
DEFAULT_SCAN_TIMEOUT_MS = 840_000.0


def image_id_from_host(host_col) -> F.Column:
    """Synthetic-corpus URL->content-key mapping: img-00042.example.net -> img-00042
    (FIXTURES.md §2). Case-insensitive + trailing-dot tolerant, matching the
    canonicalization the seen-set uses."""
    return F.regexp_extract(F.lower(host_col), r"^(img-\d+)\.", 1)


def fetch_batch(
    batch: DataFrame,
    images: DataFrame,
    scan_timeout_ms: float = DEFAULT_SCAN_TIMEOUT_MS,
    broadcast_batch: bool = True,
) -> DataFrame:
    """batch (scheduled, deduped rows) -> fetched rows with terminal status.

    ``fetch_cost_ms`` is the deterministic stand-in for wall-clock fetch
    time: proportional to payload pixels (w*h), so the CANCELLED path is
    exercised by data, not by sleeping.

    Join strategy (SURVEY.md §4 item 4 — byte-column hygiene): the batch
    is politeness-budget-bounded and slim, so it is BROADCAST against the
    streamed corpus scan; the 50 KB ``bytes`` column is decoded map-side
    on the scan partitions and NEVER shuffled.  (A plain batch-left-join
    picks a sort-merge join that shuffles the whole corpus payload — at
    bench scale that alone was >5 GB of shuffle.)  Corpus misses (EMPTY)
    come from a broadcast anti-join against the slim image_id projection.

    ``broadcast_batch=False`` is the giant-batch fallback (batch too big to
    broadcast): a salted shuffle join — the caller pre-salts the batch
    (operators/scheduler.py:salted_repartition) so a hot host cannot pin
    one reducer; the corpus side then shuffles, which is the price of an
    over-budget batch.
    """
    b = batch.withColumn("image_id", image_id_from_host(F.col("host")))

    img = images.select(
        F.col("image_id").alias("_img_id"),
        F.col("bytes").alias("_bytes"),
        F.col("caption").alias("_caption"),
    )
    bcast = F.broadcast(b) if broadcast_batch else b
    hits = img.join(bcast, b["image_id"] == img["_img_id"], "inner")
    hits = hits.withColumn("_meta", decode_meta_udf(F.col("_bytes"))).withColumn(
        "fetch_cost_ms",
        (F.col("_meta.w").cast("double") * F.col("_meta.h").cast("double")),
    )
    hit_status = (
        F.when(~F.coalesce(F.col("_meta.ok"), F.lit(False)), F.lit("ERROR"))
        .when(F.col("fetch_cost_ms") > F.lit(scan_timeout_ms), F.lit("CANCELLED"))
        .otherwise(F.lit("SUCCESS"))
    )
    hits = (
        hits.withColumn("status", hit_status)
        .withColumn(
            "result_caption",
            F.when(F.col("status") == "SUCCESS", F.col("_caption")),
        )
        .withColumn(
            "result_phash",
            F.when(F.col("status") == "SUCCESS", F.col("_meta.phash")),
        )
        .withColumn("result_w", F.col("_meta.w"))
        .withColumn("result_h", F.col("_meta.h"))
        .withColumn("result_fmt", F.col("_meta.fmt"))
        .drop("_img_id", "_bytes", "_caption", "_meta")
    )

    ids = F.broadcast(images.select(F.col("image_id").alias("_img_id")))
    misses = (
        b.join(ids, b["image_id"] == F.col("_img_id"), "left_anti")
        .withColumn("status", F.lit("EMPTY"))
        .withColumn("fetch_cost_ms", F.lit(None).cast("double"))
        .withColumn("result_caption", F.lit(None).cast("string"))
        .withColumn("result_phash", F.lit(None).cast("long"))
        .withColumn("result_w", F.lit(None).cast("int"))
        .withColumn("result_h", F.lit(None).cast("int"))
        .withColumn("result_fmt", F.lit(None).cast("string"))
    )
    return hits.unionByName(misses.select(*hits.columns))
