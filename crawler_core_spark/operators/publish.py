"""Publish pipeline — "PublishBulkScanJob on Spark" (SURVEY.md §3.1).

One declarative DataFrame plan replaces the reference's parallelStream
fan-out (``core/jobs/PublishBulkScanJob.java:71-76``):

    seed targets
      -> T1 vectorized parse (functions/url.py)
      -> J3 broadcast DNS join (dns-table miss == UnknownHostException)
      -> J1/J2 broadcast denylist joins
      -> T2 status routing: TO_BE_EXECUTED -> frontier,
         error statuses -> results (never queued)
      -> A1 status histogram -> bulk_scans counters

Semantics pinned to the reference:
- precedence parse -> resolve -> denylist (``data/ScanTarget.java:54-162``);
  UNRESOLVABLE wins over DENYLISTED.
- any parse exception -> RESOLUTION_ERROR with an *empty* target
  (``PublishBulkScanJob.java:135-142``).
- non-queued rows get an immediate result row; parse exceptions carry an
  error document (``ScanResult.java:66-73``), other error statuses a null
  result (``PublishBulkScanJob.java:147-150``).
- job ids are content-derived, not UUID.randomUUID()
  (``ScanJobDescription.java:24``): xxhash64(bulk_scan_id, seq) — unique
  per submission line even for duplicate targets, and reproducible across
  runs/parallelism levels (SURVEY.md §7.4 determinism).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_core_spark import ERROR_STATUSES
from crawler_core_spark.functions.url import (
    canonical_url_col,
    parse_targets_udf,
    url_key_col,
)
from crawler_core_spark.sources.denylist import Denylist

# priority [EXT]: lower = scheduled earlier. Ranked (tranco) targets are
# prioritized by their rank; unranked targets sort after all ranked ones.
UNRANKED_PRIORITY = 1_000_000


@dataclass
class PublishResult:
    frontier: DataFrame       # TO_BE_EXECUTED rows (the queue)
    error_results: DataFrame  # immediately-persisted error rows
    all_jobs: DataFrame       # union view (status accounting)


def parse_and_route(
    targets: DataFrame,
    dns: DataFrame,
    denylist: Denylist,
    bulk_scan_id: str,
    default_port: int = 443,
    parse_paths: bool = False,
) -> PublishResult:
    """targets: (seq BIGINT, target STRING) -> routed frontier/results.

    ``dns`` must be KEYED BY hostname (one row per hostname, like a real
    resolver map); duplicate hostnames fan out the left join and inflate
    the frontier — the engine does not pay a frontier-wide shuffle to
    dedup a malformed dimension (caught by the generator-collision bug:
    lpad-truncated hosts made 11-way dns duplicates at n>100k).

    ``parse_paths`` [EXT]: the reference's unit of work is host:port
    (``data/ScanTarget.java:164-170`` — it has no URL-path concept), so
    the default keeps its parse byte-identical.  When enabled, a seed
    line's path suffix (everything from the first ``/`` after the
    authority; protocol ``//`` skipped) is split off natively BEFORE the
    reference parse into a ``url_path`` column (default ``/``), the
    canonical URL (and hence the URL-seen key) includes it, and the
    engine matches robots rules at URL-path granularity
    (scheduler.robots_match) instead of the constant-root fast path.
    """
    if parse_paths:
        t = F.col("target")
        # a '//' only denotes a protocol separator when it is a real
        # '<scheme>://' prefix or a leading protocol-relative '//' —
        # a path-internal '//' (example.com/a//b) is path content
        proto = F.regexp_extract(t, r"^([A-Za-z][A-Za-z0-9+.\-]*://|//)", 1)
        after = t.substr(F.length(proto) + 1, F.length(t))
        raw_path = F.regexp_extract(after, "(/.*)$", 1)
        targets = targets.select(
            "seq",
            F.when(
                F.length(raw_path) > 0,
                t.substr(F.lit(1), F.length(t) - F.length(raw_path)),
            )
            .otherwise(t)
            .alias("target"),
            F.when(F.length(raw_path) > 0, raw_path)
            .otherwise(F.lit("/"))
            .alias("url_path"),
        )
    else:
        targets = targets.withColumn("url_path", F.lit("/"))
    parse = parse_targets_udf(default_port)
    p = targets.withColumn("_p", parse(F.col("target"))).select(
        "seq", "target", "url_path", "_p.*"
    )

    # J3: no forced broadcast — the dns table scales WITH the frontier
    # (a 10^10-URL crawl has a billion-host resolver map), so the join
    # strategy is left to Catalyst/AQE: tiny mock tables auto-broadcast
    # under the threshold, big ones co-shuffle on hostname. Forcing
    # broadcast serialized a 1M-row dns table through the driver.
    dnsb = dns.select(
        F.col("hostname").alias("_dns_host"),
        F.col("ip").alias("_dns_ip"),
        F.col("resolvable").alias("_dns_ok"),
    )
    j = p.join(dnsb, p["resolve_host"] == dnsb["_dns_host"], "left")

    parse_err = F.col("parse_status") == "RESOLUTION_ERROR"
    needs_dns = F.col("resolve_host").isNotNull()
    unresolved = needs_dns & ~F.coalesce(F.col("_dns_ok"), F.lit(False))

    j = (
        j.withColumn("_parse_err", parse_err)
        .withColumn("_unresolved", unresolved)
        .withColumn(
            "ip",
            F.when(parse_err, F.lit(None).cast("string"))
            .when(needs_dns & ~unresolved, F.col("_dns_ip"))
            .otherwise(F.col("ip")),
        )
        .withColumn(
            "hostname",
            F.when(parse_err, F.lit(None).cast("string")).otherwise(F.col("hostname")),
        )
        .withColumn(
            "port",
            F.when(parse_err, F.lit(0))
            .when(unresolved, F.col("port_fail"))
            .otherwise(F.col("port_ok")),
        )
        .withColumn(
            "tranco_rank", F.when(parse_err, F.lit(0)).otherwise(F.col("tranco_rank"))
        )
        .drop("_dns_host", "_dns_ip", "_dns_ok", "port_ok", "port_fail")
    )

    marked = denylist.mark(j, hostname="hostname", ip="ip")

    routed = marked.withColumn(
        "status",
        F.when(F.col("_parse_err"), F.lit("RESOLUTION_ERROR"))
        .when(F.col("_unresolved"), F.lit("UNRESOLVABLE"))
        .when(F.col("denylisted"), F.lit("DENYLISTED"))
        .otherwise(F.lit("TO_BE_EXECUTED")),
    ).drop("denylisted", "resolve_host", "parse_status", "_parse_err", "_unresolved")

    jobs = (
        routed.withColumn("bulk_scan_id", F.lit(bulk_scan_id))
        .withColumn(
            "job_id",
            F.lower(
                F.hex(F.xxhash64(F.lit(bulk_scan_id), F.col("seq")))
            ),
        )
        # the canonical URL carries the path when path parsing is on
        # (distinct paths on one host are distinct units of work / seen
        # keys); with the default constant '/' this is byte-identical to
        # the bare host:port key (Catalyst folds the empty concat).
        .withColumn(
            "url_canon",
            F.concat(
                canonical_url_col(),
                F.when(F.col("url_path") != "/", F.col("url_path")).otherwise(
                    F.lit("")
                ),
            ),
        )
        .withColumn("url_key", url_key_col(F.col("url_canon")))
        .withColumn(
            "priority",
            F.when(F.col("tranco_rank") > 0, F.col("tranco_rank")).otherwise(
                F.lit(UNRANKED_PRIORITY)
            ),
        )
    )

    frontier = jobs.filter(F.col("status") == "TO_BE_EXECUTED")
    errors = jobs.filter(F.col("status").isin(ERROR_STATUSES)).withColumn(
        "result",
        F.when(
            F.col("status") == "RESOLUTION_ERROR",
            F.struct(F.lit("parse exception").alias("exception")),
        ).otherwise(F.lit(None).cast("struct<exception:string>")),
    )
    return PublishResult(frontier=frontier, error_results=errors, all_jobs=jobs)


def status_histogram(all_jobs: DataFrame) -> DataFrame:
    """A1 — PublishBulkScanJob.java:71-86."""
    return all_jobs.groupBy("status").agg(F.count(F.lit(1)).alias("count"))


def bulk_scan_counters(hist: dict | list) -> dict:
    """Driver-side scalar extraction with default 0 (java:78-86)."""
    by = hist if isinstance(hist, dict) else {r["status"]: r["count"] for r in hist}
    return {
        "scan_jobs_published": by.get("TO_BE_EXECUTED", 0),
        "scan_jobs_resolution_errors": by.get("UNRESOLVABLE", 0) + by.get("RESOLUTION_ERROR", 0),
        "scan_jobs_denylisted": by.get("DENYLISTED", 0),
    }
