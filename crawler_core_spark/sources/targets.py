"""Target-list sources (S1-S4).

Every provider returns a ``DataFrame[(seq BIGINT, target STRING)]`` where
``seq`` pins the original list order — the reference publishes jobs in
target-list order (``orchestration/RabbitMqOrchestrationProvider.java:110-117``)
and our crawl-order contract tie-breaks on ``seq`` (SURVEY.md O1).

No network in the sandbox: the Tranco/Crux/MX providers take a seed
DataFrame with the same line format the reference downloads
(``targetlist/TrancoListProvider.java``, ``CruxListProvider.java:32-43``,
``TrancoEmailListProvider.java:37-64``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_core_spark.operators.rankutil import dense_seq


def _with_seq(df: DataFrame, order_col: str) -> DataFrame:
    # Deterministic submission order from the explicit line number / rank —
    # never from task order.  dense_seq is the distributed rank (a global
    # row_number window would collapse to one partition and serialize the
    # downstream parse UDF — the N->4N scaling killer).
    return dense_seq(df, F.col(order_col), "seq")


def target_file_df(spark: SparkSession, path: str | None = None, lines: list[str] | None = None) -> DataFrame:
    """S1: text file -> targets, dropping comment and empty lines
    (targetlist/TargetFileProvider.java:34-41: startswith('#') OR isEmpty)."""
    if lines is not None:
        raw = spark.createDataFrame(list(enumerate(lines)), "line_no: long, value: string")
    else:
        # preserve file order without a driver collect
        raw = (
            spark.read.text(path)
            .selectExpr("value", "monotonically_increasing_id() as line_no")
        )
    kept = raw.filter(~(F.col("value").startswith("#") | (F.col("value") == "")))
    return _with_seq(kept, "line_no").select("seq", F.col("value").alias("target"))


def target_lines_df(lines: DataFrame, line_no: str = "line_no", value: str = "value") -> DataFrame:
    """S1 over an already-distributed lines DataFrame (no driver list):
    same comment/empty filtering as ``target_file_df``
    (targetlist/TargetFileProvider.java:34-41), seq pinned by ``line_no``."""
    kept = lines.filter(
        ~(F.col(value).startswith("#") | (F.col(value) == ""))
    ).select(F.col(line_no).alias("line_no"), F.col(value).alias("value"))
    return _with_seq(kept, "line_no").select("seq", F.col("value").alias("target"))


def tranco_targets(spark: SparkSession, csv_df: DataFrame, number: int) -> DataFrame:
    """S2: tranco 'rank,host' csv -> first N lines, kept as full lines so the
    parser extracts the rank (TrancoListProvider.java:25-32 keeps the raw line)."""
    df = csv_df.select(
        F.split("value", ",").getItem(0).cast("long").alias("rank"),
        F.col("value").alias("target"),
    ).filter(F.col("rank") <= number)
    return _with_seq(df, "rank").select("seq", "target")


def crux_targets(spark: SparkSession, csv_df: DataFrame, number: int) -> DataFrame:
    """S3: crux 'proto://domain,rank' -> domains with rank <= N
    (CruxListProvider.java:32-43: https filter, rank filter, strip proto)."""
    df = (
        csv_df.filter(F.col("value").contains("https://"))
        .select(
            F.split("value", ",").getItem(1).cast("int").alias("rank"),
            F.split(F.split("value", ",").getItem(0), "://").getItem(1).alias("target"),
        )
        .filter(F.col("rank") <= number)
    )
    return _with_seq(df, "rank").select("seq", "target")


def mx_expanded_targets(spark: SparkSession, tranco: DataFrame, mx_table: DataFrame) -> DataFrame:
    """S4: per tranco host, MX expansion -> flatten -> distinct
    (TrancoEmailListProvider.java:37-64; distinct at :63).

    ``mx_table`` is the deterministic stand-in for live DNS-MX:
    (hostname STRING, mx_hosts ARRAY<STRING>).  Hosts with no MX record are
    dropped (reference logs and continues). Order = first appearance
    (list order, then MX record order), deduplicated.
    """
    base = tranco.select(
        "seq", F.element_at(F.split("target", ","), -1).alias("hostname")
    )
    exploded = (
        base.join(mx_table, "hostname", "inner")
        .select("seq", F.posexplode("mx_hosts").alias("pos", "target"))
    )
    first_seen = exploded.groupBy("target").agg(
        F.min(F.struct("seq", "pos")).alias("first")
    )
    # dense first-appearance rank, computed DISTRIBUTED: (seq, pos) packs
    # into one long (seq < 2^31 list lines, pos < 2^32 MX records/host) —
    # a global row_number window here would collapse the plan to one
    # partition (the N->4N scaling killer dense_seq exists to avoid).
    ord_key = F.col("first.seq") * F.lit(1 << 32) + F.col("first.pos")
    return dense_seq(first_seen, ord_key, "seq").select("seq", "target")
