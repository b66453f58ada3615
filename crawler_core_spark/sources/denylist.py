"""Denylist source (S5) — classify raw lines into three broadcast tables.

Reference: ``denylist/DenylistFileProvider.java:40-58`` buckets each line
into {valid domain} / {valid IP} / {valid CIDR}; anything else is silently
dropped.  Membership (``:71-76``) is
``hostname ∈ domains ∨ ip ∈ ips ∨ ∃cidr: ip ∈ cidr`` with IPv6-vs-IPv4
subnet mismatches counting as "not in range" (``:61-68``).

Spark shape: three *tiny* DataFrames, always broadcast.  The CIDR list is
pre-flattened to numeric ``(ip_lo, ip_hi)`` bounds so containment is a
broadcast range join, never a per-row loop (SURVEY.md J1/J2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_core_spark.functions.net import (
    cidr_bounds,
    ipv4_num_col,
    is_valid_domain,
    is_valid_ip,
)


@dataclass
class Denylist:
    domains: DataFrame  # (deny_domain STRING)
    ips: DataFrame      # (deny_ip STRING)
    cidrs: DataFrame    # (cidr STRING, ip_lo LONG, ip_hi LONG)

    def mark(self, df: DataFrame, hostname: str = "hostname", ip: str = "ip") -> DataFrame:
        """Append a boolean ``denylisted`` column (J1 broadcast hash joins +
        J2 broadcast range join). Null hostname/ip never match (Java
        Set.contains(null) is false)."""
        dom = F.broadcast(self.domains.withColumn("_dl_dom", F.lit(True)))
        ipt = F.broadcast(self.ips.withColumn("_dl_ip", F.lit(True)))
        cid = F.broadcast(self.cidrs.select("ip_lo", "ip_hi").withColumn("_dl_cidr", F.lit(True)))

        out = (
            df.withColumn("_ip_num", ipv4_num_col(F.col(ip)))
            .join(dom, on=F.col(hostname) == dom["deny_domain"], how="left")
            .join(ipt, on=F.col(ip) == ipt["deny_ip"], how="left")
            .join(
                cid,
                on=(F.col("_ip_num") >= cid["ip_lo"]) & (F.col("_ip_num") <= cid["ip_hi"]),
                how="left",
            )
        )
        return (
            out.withColumn(
                "denylisted",
                F.coalesce(F.col("_dl_dom"), F.lit(False))
                | F.coalesce(F.col("_dl_ip"), F.lit(False))
                | F.coalesce(F.col("_dl_cidr"), F.lit(False)),
            )
            .drop("_dl_dom", "_dl_ip", "_dl_cidr", "deny_domain", "deny_ip", "ip_lo", "ip_hi", "_ip_num")
        )


def classify_denylist_lines(lines: list[str]) -> tuple[list, list, list]:
    """Driver-side classification, faithful to DenylistFileProvider.java:47-58
    including precedence (domain, then IP, then CIDR) and silent drop."""
    domains, ips, cidrs = [], [], []
    for entry in lines:
        if is_valid_domain(entry):
            domains.append((entry,))
        elif is_valid_ip(entry):
            ips.append((entry,))
        elif "/" in entry:
            head, _, tail = entry.partition("/")
            if is_valid_ip(head) and _is_int(tail):
                b = cidr_bounds(entry)
                if b is not None:
                    cidrs.append((entry, b[0], b[1]))
    return domains, ips, cidrs


def _is_int(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False


def load_denylist(spark: SparkSession, lines: list[str] | None = None, path: str | None = None) -> Denylist:
    if lines is None:
        lines = [r.value for r in spark.read.text(path).collect()]
    domains, ips, cidrs = classify_denylist_lines(lines)
    return Denylist(
        domains=spark.createDataFrame(domains or [("\x00none",)], "deny_domain: string"),
        ips=spark.createDataFrame(ips or [("\x00none",)], "deny_ip: string"),
        cidrs=spark.createDataFrame(cidrs or [("\x00none", -1, -2)], "cidr: string, ip_lo: long, ip_hi: long"),
    )
