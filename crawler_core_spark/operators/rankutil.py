"""Distributed dense sequence numbers (the zipWithIndex pattern for
DataFrames).

A global ``row_number() OVER (ORDER BY ...)`` collapses the whole input
into ONE partition — every downstream stage (including pandas UDFs) then
runs serially, which destroys N->4N scaling.  ``dense_seq`` computes the
same dense 0..n-1 rank scalably and *content-deterministically*:

1. one agg job for (min, max) of the numeric order key,
2. bucket id = value-range bucket of the key (``width_bucket``) — a pure
   function of the DATA, never of sampling or physical partitioning
   (repartitionByRange's sampled boundaries can differ between the two
   executions of the plan and silently duplicate ranks),
3. per-bucket counts (tiny groupBy -> driver) -> bucket offsets,
4. hash-repartition by bucket id, sort within partitions by (bucket,
   key), mapInPandas assigns ``offset[bucket] + local_index`` with a
   per-bucket counter.

Requirements: ``key`` is numeric (LONG), unique, and monotone in the
desired order. Composite orders must be packed into one long (e.g.
``priority * 2^32 + seq``) — document the bounds at the call site.
Bucket balance follows the key's value distribution; correctness never
depends on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def dense_seq(
    df: DataFrame,
    key: Column,
    out_col: str = "seq",
    start: int = 0,
    num_buckets: int | None = None,
) -> DataFrame:
    """Append a dense BIGINT rank ``out_col`` ordered by the unique
    numeric ``key`` column expression."""
    spark = df.sparkSession
    p = num_buckets or spark.sparkContext.defaultParallelism
    keyed = df.withColumn("_rank_key", key.cast("long"))
    stats = keyed.agg(
        F.min("_rank_key").alias("lo"), F.max("_rank_key").alias("hi")
    ).first()
    if stats["lo"] is None:
        schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])
        return spark.createDataFrame([], schema)
    lo, hi = int(stats["lo"]), int(stats["hi"])
    span = max(hi - lo + 1, 1)
    # Bucket ENTIRELY in DOUBLE: (key - lo) in int64 wraps when keys span
    # negative to positive (hi - lo >= 2^63), so the subtraction itself
    # must happen after the double cast, not before.  x->double is
    # monotone non-decreasing, as are -lo, *p/span and floor, so bucket
    # ids stay monotone in the key — balance may shift at the double's
    # 2^53 grain, correctness never does.  Clamp key==hi into the last
    # bucket.
    bucket = F.least(
        F.lit(p - 1).cast("long"),
        F.floor(
            (F.col("_rank_key").cast("double") - F.lit(float(lo)))
            * F.lit(float(p))
            / F.lit(float(span))
        ),
    )
    keyed = keyed.withColumn("_pid", bucket)

    sizes = {
        int(r["_pid"]): r["n"]
        for r in keyed.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets = {}
    acc = start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    rp = keyed.repartition(p, F.col("_pid")).sortWithinPartitions("_pid", "_rank_key")
    schema = StructType(list(rp.schema.fields) + [StructField(out_col, LongType())])

    def add_seq(batches):
        pos: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            counts = pdf["_pid"].value_counts()
            starts = {
                int(pid): pos.get(int(pid), offsets.get(int(pid), start))
                for pid in counts.index
            }
            pdf[out_col] = (
                pdf["_pid"].map(lambda x: starts[int(x)])
                + pdf.groupby("_pid").cumcount()
            ).astype("int64")
            for pid, c in counts.items():
                pos[int(pid)] = starts[int(pid)] + int(c)
            yield pdf

    out = rp.mapInPandas(add_seq, schema)
    return out.drop("_pid", "_rank_key")
