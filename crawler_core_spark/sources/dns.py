"""DNS source (S6) — a deterministic resolution table.

Mirrors the test seam of the reference: ``dns/DnsResolver.java`` is an
interface, resolved in tests by ``dns/MockDnsResolver.java:20-56`` (a
hostname->ip map plus an explicit unresolvable set; unknown hostnames
throw UnknownHostException).  In the dataflow engine resolution is a
broadcast join (SURVEY.md J3): a dns-table *miss* or ``resolvable=false``
both mean UNRESOLVABLE, exactly like the mock's two throw paths.

Schema: (hostname STRING, ip STRING, resolvable BOOLEAN)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DNS_SCHEMA = "hostname: string, ip: string, resolvable: boolean"


def dns_table(spark: SparkSession, mappings: dict[str, str | None]) -> DataFrame:
    """mappings: hostname -> ip (None == explicitly unresolvable)."""
    rows = [(h, ip, ip is not None) for h, ip in mappings.items()]
    return spark.createDataFrame(rows or [("\x00none", None, False)], DNS_SCHEMA)
