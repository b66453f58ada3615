"""Iceberg Plan A — push-button swap for the parquet+commit-log Plan B.

The north_rule asks for Iceberg checkpoint tables; this sandbox ships no
``iceberg-spark-runtime`` jar, so the engine runs on ``storage.TableStore``
(Plan B), which mirrors Iceberg's contract 1:1 (SURVEY.md §7.3):

  Plan B (storage.py)                 Iceberg Plan A
  -------------------                 --------------
  stage() + commit()                  snapshot write (append/overwrite)
  commit(mode='replace')              createOrReplace / overwrite(true)
  commit(mode='merge', parts=...)     overwritePartitions() (dynamic)
  commit(expected_base=) conflict     commit ValidationException
  compact()                           rewrite_data_files
  table_paths() chain read            manifest list
  last_meta() resume                  snapshot summary properties

This module keeps the swap push-button: probe for a runtime jar at
session build (``find_iceberg_jar``), build a hadoop-catalog session
(``iceberg_session``), and an ``IcebergTableStore`` adapter exposing the
table-level subset of the TableStore surface so the storage contract
tests can run against a REAL Iceberg catalog the moment a jar appears
(tests/test_iceberg_plan_a.py — skipped-unless-jar).

Deliberate scope limit: a hadoop catalog commits atomically PER TABLE;
the multi-table atomic batch commit the crawl engine relies on (results
+ frontier + counters in one swap, K6) needs an Iceberg REST catalog
with multi-table transactions or a WAP/branch dance — documented here,
not silently faked.  The contract tests therefore exercise table-level
semantics (append/replace/dynamic-overwrite/snapshot history/time
travel/compaction), which is exactly the part Plan B re-implements.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

_JAR_GLOBS = (
    "iceberg-spark-runtime*.jar",
    "iceberg-spark4-runtime*.jar",
)


def find_iceberg_jar() -> str | None:
    """Locate an Iceberg Spark runtime jar, or None (Plan B stays active).

    Order: explicit ``SPARK_GRAFT_ICEBERG_JAR`` env; pyspark's bundled
    jars dir; ``$SPARK_HOME/jars``; ``/opt/spark/jars``.
    """
    explicit = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if explicit:
        # an explicitly-requested jar that is missing is a config error,
        # not "no jar shipped" — silently degrading to Plan B would make
        # a path typo invisible (the contract suite would quietly skip)
        if not os.path.exists(explicit):
            raise RuntimeError(
                f"SPARK_GRAFT_ICEBERG_JAR={explicit!r} does not exist; "
                "fix the path or unset the variable to use Plan B"
            )
        return explicit
    jar_dirs = []
    try:
        import pyspark

        jar_dirs.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:  # pragma: no cover
        pass
    if os.environ.get("SPARK_HOME"):
        jar_dirs.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    jar_dirs.append("/opt/spark/jars")
    for d in jar_dirs:
        for pat in _JAR_GLOBS:
            hits = sorted(glob.glob(os.path.join(d, pat)))
            if hits:
                return hits[-1]
    return None


def iceberg_session(
    warehouse: str,
    master: str = "local[4]",
    catalog: str = "ice",
    app_name: str = "crawler-core-iceberg",
) -> SparkSession:
    """SparkSession with a hadoop-catalog Iceberg catalog mounted.

    Raises RuntimeError when no runtime jar is present — callers gate on
    ``find_iceberg_jar()`` first (the pytest module skips).
    """
    jar = find_iceberg_jar()
    if jar is None:
        raise RuntimeError(
            "no iceberg-spark-runtime jar found; Plan B (storage.TableStore) "
            "is the active storage backend"
        )
    # spark.jars / spark.sql.extensions / catalog classes only take effect
    # at JVM construction: getOrCreate against an ALREADY-RUNNING session
    # silently ignores them and every catalog call dies with
    # ClassNotFoundException. Fail loudly instead — callers must build the
    # Iceberg session first (or in a fresh process, as the contract tests
    # do via subprocess).
    # getActiveSession is THREAD-local — a session built on another
    # thread would slip past it; SparkContext._active_spark_context is
    # process-global, so check both.
    from pyspark import SparkContext

    if (
        SparkSession.getActiveSession() is not None
        or SparkContext._active_spark_context is not None
    ):
        raise RuntimeError(
            "iceberg_session must be created before any other SparkSession "
            "in this process (spark.jars/extensions cannot be applied to a "
            "running JVM); run Plan-A work in a fresh process"
        )
    from crawler_core_spark.session import get_spark

    return get_spark(
        app_name=app_name,
        master=master,
        extra_conf={
            "spark.jars": jar,
            "spark.sql.extensions": (
                "org.apache.iceberg.spark.extensions."
                "IcebergSparkSessionExtensions"
            ),
            f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
            f"spark.sql.catalog.{catalog}.type": "hadoop",
            f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        },
    )


class IcebergTableStore:
    """Table-level TableStore adapter over a real Iceberg catalog.

    Mirrors the Plan-B surface the storage contract tests drive:
    ``write(mode=append|replace)``, ``merge_partitions`` (the
    ``commit(mode='merge')`` analogue via dynamic partition overwrite),
    ``read``, ``exists``, ``snapshot_count``, ``compact``, and
    ``read_at`` (time travel — Plan B's pre-compaction reader guarantee).
    """

    def __init__(self, spark: SparkSession, catalog: str = "ice", db: str = "crawl"):
        self.spark = spark
        self.catalog = catalog
        self.db = db
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{db}")

    def _fq(self, table: str) -> str:
        return f"{self.catalog}.{self.db}.{table}"

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._fq(table))

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append",
        partition_by: list[str] | None = None,
    ) -> None:
        w = df.writeTo(self._fq(table))
        if mode == "replace":
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        if not self.exists(table):
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.create()
        else:
            w.append()

    def merge_partitions(self, df: DataFrame, table: str) -> None:
        """Partition-level replace — Plan B's ``('merge', rel, col, parts)``
        commit is exactly Iceberg's dynamic partition overwrite: partitions
        present in ``df`` are replaced, untouched partitions survive."""
        df.writeTo(self._fq(table)).overwritePartitions()

    def read(self, table: str) -> DataFrame:
        return self.spark.table(self._fq(table))

    def read_at(self, table: str, snapshot_id: int) -> DataFrame:
        return self.spark.read.option("snapshot-id", snapshot_id).table(
            self._fq(table)
        )

    def snapshots(self, table: str) -> list[dict]:
        return [
            r.asDict()
            for r in self.spark.sql(
                f"SELECT snapshot_id, operation FROM {self._fq(table)}.snapshots "
                "ORDER BY committed_at"
            ).collect()
        ]

    def snapshot_count(self, table: str) -> int:
        return len(self.snapshots(table))

    def compact(self, table: str, target_mb: int = 128) -> None:
        """``rewrite_data_files`` — Plan B ``compact()`` analogue."""
        self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files("
            f"table => '{self.db}.{table}', "
            f"options => map('target-file-size-bytes', '{target_mb * 1024 * 1024}'))"
        )
