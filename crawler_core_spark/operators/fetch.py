"""Fetch stage (J6 [EXT]) — frontier batch -> image corpus join -> statuses.

"Fetching" a URL means joining the scheduled batch to the images table by
content key (SURVEY.md S7/J6).  Status taxonomy mirrors the reference
worker (``core/Worker.java:72-140``):

- corpus hit + decode ok            -> SUCCESS   (result non-null, java:104-107)
- corpus hit with NULL bytes        -> EMPTY     (null result contract, java:104-107)
- corpus miss                       -> EMPTY
- decode failure (corrupt bytes)    -> ERROR     (ExecutionException, java:113-118)
- metadata contract violation       -> CRAWLER_ERROR (unexpected non-scan
  exception, java:131-134): bytes decode fine but contradict the corpus
  row's declared (w, h) — a crawler-side bug, not a scan failure.
- deadline exceeded                 -> CANCELLED (timeout -> cancel, java:78-91);
  the timeout apparatus (~580 LoC of executors/futures) is replaced by a
  *deadline-as-data* column: fetch_cost_ms > scan_timeout_ms.
- injected fault                    -> INTERNAL_ERROR (InterruptedException,
  java:108-112: NOT persisted, job redelivered) — reachable via the
  engine's ``internal_fault`` predicate (fault injection for tests).

``result_status`` is a copy of ``status`` (the worker's status copy at
persist time, ``core/Worker.java:142-161``); the commit path asserts the
two stay equal (T6, ``MongoPersistenceProvider.java:250-258``).

Byte-column hygiene (SURVEY.md §4 item 4): scheduling shuffles only
``image_id``-sized rows; ``bytes`` enters the plan at this last stage and
is never part of a shuffle key.

Miss-path scale contract: EMPTY rows are derived from the BATCH side
(anti-join of the batch against the hit job_ids), never from a corpus
broadcast — at the 10^10-row design corpus a corpus-side broadcast is a
multi-GB ship to every executor.  ``fetch_misses`` takes the (persisted)
hits so the decode subtree is not recomputed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_core_spark.functions.image import decode_meta_udf

# reference default scan timeout: 840_000 ms (WorkerCommandConfig.java:38-44).
DEFAULT_SCAN_TIMEOUT_MS = 840_000.0

# result columns produced by the fetch stage (beyond the batch's own)
FETCH_OUT_COLS = [
    "status", "result_status", "fetch_cost_ms", "result_caption",
    "result_phash", "result_w", "result_h", "result_fmt", "corpus_phash",
]


# corpus bucketing for batch-driven scan pruning: the images table is
# hive-partitioned by this bucket of image_id at write time; the engine
# pushes each batch's distinct bucket set as a partition filter
# (CrawlEngine._pruned_images).  Writer and prober MUST share this expr.
IMAGES_BUCKET_COL = "img_bucket"
IMAGES_BUCKETS_DEFAULT = 64


def image_bucket_col(image_id_col, n_buckets: int = IMAGES_BUCKETS_DEFAULT) -> F.Column:
    return F.pmod(F.xxhash64(image_id_col), F.lit(int(n_buckets))).cast("int")


def image_id_from_host(host_col) -> F.Column:
    """Synthetic-corpus URL->content-key mapping: img-00042.example.net -> img-00042
    (FIXTURES.md §2). Case-insensitive + trailing-dot tolerant, matching the
    canonicalization the seen-set uses."""
    return F.regexp_extract(F.lower(host_col), r"^(img-\d+)\.", 1)


def fetch_hits(
    batch: DataFrame,
    images: DataFrame,
    scan_timeout_ms: float | Column = DEFAULT_SCAN_TIMEOUT_MS,
    broadcast_batch: bool = True,
    internal_fault: Column | None = None,
) -> DataFrame:
    """batch rows that HIT the corpus, with terminal status + decoded meta.

    ``fetch_cost_ms`` is the deterministic stand-in for wall-clock fetch
    time: proportional to payload pixels (w*h), so the CANCELLED path is
    exercised by data, not by sleeping.

    Join strategy (SURVEY.md §4 item 4 — byte-column hygiene): the batch
    is politeness-budget-bounded and slim, so it is BROADCAST against the
    streamed corpus scan; the 50 KB ``bytes`` column is decoded map-side
    on the scan partitions and NEVER shuffled.  (A plain batch-left-join
    picks a sort-merge join that shuffles the whole corpus payload — at
    bench scale that alone was >5 GB of shuffle.)

    ``broadcast_batch=False`` is the giant-batch fallback (batch too big to
    broadcast): a salted shuffle join — the caller pre-salts the batch
    (operators/scheduler.py:salted_repartition) so a hot host cannot pin
    one reducer; the corpus side then shuffles, which is the price of an
    over-budget batch.  No hint is forced in this mode anywhere — AQE
    owns the strategy (the broadcast hint must never apply to a batch the
    caller already judged too big to broadcast).
    """
    b = batch.withColumn("image_id", image_id_from_host(F.col("host")))

    img = images.select(
        F.col("image_id").alias("_img_id"),
        F.col("bytes").alias("_bytes"),
        F.col("caption").alias("_caption"),
        F.col("w").alias("_decl_w"),
        F.col("h").alias("_decl_h"),
        F.col("phash").alias("_decl_phash"),
    )
    timeout = (
        scan_timeout_ms
        if isinstance(scan_timeout_ms, Column)
        else F.lit(float(scan_timeout_ms))
    )
    bcast = F.broadcast(b) if broadcast_batch else b
    hits = img.join(bcast, b["image_id"] == img["_img_id"], "inner")
    hits = hits.withColumn(
        "_meta",
        F.when(F.col("_bytes").isNotNull(), decode_meta_udf(F.col("_bytes"))),
    ).withColumn(
        "fetch_cost_ms",
        (F.col("_meta.w").cast("double") * F.col("_meta.h").cast("double")),
    )
    # declared-metadata contract: decoded dims must match the corpus row
    meta_mismatch = (F.col("_meta.w") != F.col("_decl_w")) | (
        F.col("_meta.h") != F.col("_decl_h")
    )
    # Timeout-first precedence: the reference times out in
    # waitForScanResult (core/Worker.java:78-91) BEFORE the result is ever
    # examined, so a row that both exceeds the deadline and violates the
    # metadata contract is CANCELLED (terminal), not CRAWLER_ERROR
    # (retryable) — the ordering changes retry behavior for such rows.
    hit_status = (
        F.when(F.col("_bytes").isNull(), F.lit("EMPTY"))
        .when(~F.coalesce(F.col("_meta.ok"), F.lit(False)), F.lit("ERROR"))
        .when(F.col("fetch_cost_ms") > timeout, F.lit("CANCELLED"))
        .when(meta_mismatch, F.lit("CRAWLER_ERROR"))
        .otherwise(F.lit("SUCCESS"))
    )
    if internal_fault is not None:
        hit_status = F.when(internal_fault, F.lit("INTERNAL_ERROR")).otherwise(
            hit_status
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
        .withColumn("corpus_phash", F.col("_decl_phash"))
        .withColumn("result_status", F.col("status"))
        .drop(
            "_img_id", "_bytes", "_caption", "_meta",
            "_decl_w", "_decl_h", "_decl_phash",
        )
    )
    return hits


def fetch_misses(batch: DataFrame, hits: DataFrame) -> DataFrame:
    """EMPTY rows: the batch minus the hit job_ids.

    Batch-side anti-join — both sides are batch-bounded (the build side is
    at most the batch's own job_ids), so AQE broadcasts the small side
    regardless of corpus scale.  The caller passes the *persisted* hits so
    the decode subtree is reused, not recomputed.
    """
    b = batch.withColumn("image_id", image_id_from_host(F.col("host")))
    return (
        b.join(hits.select("job_id"), "job_id", "left_anti")
        .withColumn("status", F.lit("EMPTY"))
        .withColumn("result_status", F.lit("EMPTY"))
        .withColumn("fetch_cost_ms", F.lit(None).cast("double"))
        .withColumn("result_caption", F.lit(None).cast("string"))
        .withColumn("result_phash", F.lit(None).cast("long"))
        .withColumn("result_w", F.lit(None).cast("int"))
        .withColumn("result_h", F.lit(None).cast("int"))
        .withColumn("result_fmt", F.lit(None).cast("string"))
        .withColumn("corpus_phash", F.lit(None).cast("long"))
    )


def fetch_batch(
    batch: DataFrame,
    images: DataFrame,
    scan_timeout_ms: float = DEFAULT_SCAN_TIMEOUT_MS,
    broadcast_batch: bool = True,
    internal_fault: Column | None = None,
) -> DataFrame:
    """Convenience: hits + misses in one DataFrame.

    The hits are persisted so the miss side's anti-join (``fetch_misses``)
    probes the cached hits instead of paying a second corpus scan — the
    plan shows ONE corpus scan, same as the engine path.  The cache is a
    batch-bounded result set (no corpus-sized persist); suite-scale
    callers rely on Spark's LRU eviction, the engine loop manages its own
    persist/unpersist explicitly.
    """
    hits = fetch_hits(
        batch, images, scan_timeout_ms, broadcast_batch, internal_fault
    ).persist()
    return hits.unionByName(fetch_misses(batch, hits).select(*hits.columns))
