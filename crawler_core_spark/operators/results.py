"""Results-side operators: latest-wins retrieval (O2), lookup by target (J5),
the write-path status invariant (T6), partial-result upsert (K4), and the
image payload invariant gate (PSNR + caption equality, input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_core_spark.functions.image import psnr_udf


def latest_result_per_job(results: DataFrame, key: str = "job_id") -> DataFrame:
    """O2 — most-recent-result-wins, mirroring
    ``persistence/MongoPersistenceProvider.java:362-370`` (sort timestamp
    desc, limit 1 per job) / ``dummy/DummyPersistenceProvider.java:53-59``.
    Tie-break on batch_id then crawl_pos for a total order.  ``key`` is
    the identity column (job_id for results/partials; curation passes its
    url-derived doc_key) — ONE implementation of the O2 tie-break order
    so every latest-wins view stays in sync."""
    order = [F.desc(c) for c in ("ts", "batch_id", "crawl_pos") if c in results.columns]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        results.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def results_for_target(results: DataFrame, target: str) -> DataFrame:
    """J5 — $or hostname/ip lookup (MongoPersistenceProvider.java:292-298)."""
    return results.filter((F.col("hostname") == target) | (F.col("ip") == target))


def merge_partials(
    store,
    new_partials: DataFrame,
    table: str = "partial_results",
    compact_every: int | None = 16,
) -> int:
    """K4 — upsert keyed by job_id (``replaceOne(_id=jobId, upsert=true)``,
    MongoPersistenceProvider.java:397-423), expressed scale-first as an
    APPEND-ONLY upsert log: each batch appends only its own partials
    (O(batch) write volume) and latest-wins is applied AT READ
    (``read_partials`` — the results-table O2 pattern).  The previous
    whole-table window+replace per batch was O(table) per batch.  Once
    the live snapshot chain reaches ``compact_every`` directories, one
    compacted replace (window applied once) bounds both the chain length
    and the superseded-row volume readers must skip."""
    if store.exists(table) and store.should_compact(table, compact_every):
        from crawler_core_spark.storage import CommitConflictError

        # the compacted replace is derived from the chain read here; a
        # concurrent worker's append in between would be dropped by an
        # unguarded replace — on conflict fall back to the always-safe
        # append (the next cadence hit compacts again).
        base = store.commit_count()
        merged = latest_result_per_job(
            store.read(table).unionByName(new_partials, allowMissingColumns=True)
        )
        try:
            return store.write(merged, table, mode="replace", expected_base=base)
        except CommitConflictError:
            pass
    return store.write(new_partials, table, mode="append")


def read_partials(store, table: str = "partial_results") -> DataFrame:
    """Latest-wins view over the append-only partials log (O2 at read)."""
    return latest_result_per_job(store.read(table))


def validate_fetch_invariant(
    fetched: DataFrame,
    reference: DataFrame,
    min_psnr_db: float = 40.0,
    id_col: str = "image_id",
) -> DataFrame:
    """Per-row payload invariant (input_hint): fetched bytes decode within
    PSNR >= 40 dB of the reference row's bytes (exact decode -> PSNR inf,
    capped 999) and captions are string-equal.  Returns per-row verdicts
    ``(image_id, psnr_db, psnr_ok, caption_ok)``; callers gate a commit on
    ``filter(~psnr_ok | ~caption_ok).count() == 0``.
    """
    ref = reference.select(
        F.col(id_col).alias("_ref_id"),
        F.col("bytes").alias("_ref_bytes"),
        F.col("caption").alias("_ref_caption"),
    )
    j = fetched.join(ref, fetched[id_col] == ref["_ref_id"], "inner")
    return j.select(
        id_col,
        F.round(psnr_udf(F.col("bytes"), F.col("_ref_bytes")), 3).alias("psnr_db"),
        (psnr_udf(F.col("bytes"), F.col("_ref_bytes")) >= F.lit(min_psnr_db)).alias("psnr_ok"),
        (F.col("caption") == F.col("_ref_caption")).alias("caption_ok"),
    )


SERIALIZATION_NULLED = [
    "result_caption", "result_phash", "result_w", "result_h", "result_fmt",
]


def apply_serialization_guard(df: DataFrame, caption_col: str = "result_caption") -> DataFrame:
    """K3 serialization-failure fallback (``MongoPersistenceProvider.java:267-275``):
    a result that cannot be serialized is replaced by a SERIALIZATION_ERROR
    result for the same job — recursion-guarded in the reference; here the
    replacement (nulled payload) is trivially serializable, so one pass
    suffices.  With a typed schema the only BSON-style failure mode left is
    a NUL byte inside a string field (BSON cstrings cannot contain 0x00).

    Sets both ``status`` and ``result_status`` (the reference persists the
    fallback with the new status), preserving the T6 invariant.
    """
    bad = F.col(caption_col).isNotNull() & F.col(caption_col).contains("\x00")
    out = df.withColumn("_ser_bad", bad)
    for c in [c for c in SERIALIZATION_NULLED if c in df.columns]:
        out = out.withColumn(
            c, F.when(F.col("_ser_bad"), F.lit(None)).otherwise(F.col(c))
        )
    out = out.withColumn(
        "status",
        F.when(F.col("_ser_bad"), F.lit("SERIALIZATION_ERROR")).otherwise(F.col("status")),
    )
    if "result_status" in df.columns:
        out = out.withColumn(
            "result_status",
            F.when(F.col("_ser_bad"), F.lit("SERIALIZATION_ERROR")).otherwise(
                F.col("result_status")
            ),
        )
    return out.drop("_ser_bad")


def assert_status_invariant(results: DataFrame, job_status_col: str = "status", result_status_col: str = "result_status") -> None:
    """T6 — scanResult.status must equal jobDescription.status
    (MongoPersistenceProvider.java:250-258); gate before commit."""
    if result_status_col not in results.columns:
        return
    bad = results.filter(F.col(job_status_col) != F.col(result_status_col)).count()
    if bad:
        raise ValueError(f"status invariant violated on {bad} rows")
