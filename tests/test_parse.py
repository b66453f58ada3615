"""Parse matrix — mirrors data/ScanTargetTest.java:21-172 as DataFrame
assertions (SURVEY.md §5), driven through the full publish pipeline so DNS
resolution flows through the J3 join exactly like production."""

import pytest
from pyspark.sql import functions as F

from crawler_core_spark.operators.publish import parse_and_route
from crawler_core_spark.sources.denylist import load_denylist
from crawler_core_spark.sources.dns import dns_table

DNS = {
    "example.com": "93.184.216.34",
    "this-host-should-not-exist.invalid": None,
}

# (target, status, ip, hostname, port, rank) — ScanTargetTest.java cases
CASES = [
    ("192.168.1.1:8080", "TO_BE_EXECUTED", "192.168.1.1", None, 8080, 0),
    ("192.168.1.1", "TO_BE_EXECUTED", "192.168.1.1", None, 443, 0),
    ("[2001:db8::1]:8080", "TO_BE_EXECUTED", "2001:db8::1", None, 8080, 0),
    ("2001:db8::1", "TO_BE_EXECUTED", "2001:db8::1", None, 443, 0),
    (
        "[2001:0db8:85a3:0000:0000:8a2e:0370:7334]:8443",
        "TO_BE_EXECUTED",
        "2001:0db8:85a3:0000:0000:8a2e:0370:7334",
        None,
        8443,
        0,
    ),
    ("::1", "TO_BE_EXECUTED", "::1", None, 443, 0),
    ("example.com:8080", "TO_BE_EXECUTED", "93.184.216.34", "example.com", 8080, 0),
    ("example.com", "TO_BE_EXECUTED", "93.184.216.34", "example.com", 443, 0),
    ("192.168.1.1:70000", "TO_BE_EXECUTED", "192.168.1.1", None, 443, 0),
    ("192.168.1.1:0", "TO_BE_EXECUTED", "192.168.1.1", None, 443, 0),
    ("[2001:db8::1]:abc", "TO_BE_EXECUTED", "2001:db8::1", None, 443, 0),
    ("100,192.168.1.1:8080", "TO_BE_EXECUTED", "192.168.1.1", None, 8080, 100),
    ("200,[2001:db8::1]:8080", "TO_BE_EXECUTED", "2001:db8::1", None, 8080, 200),
    (
        "this-host-should-not-exist.invalid",
        "UNRESOLVABLE",
        None,
        "this-host-should-not-exist.invalid",
        443,
        0,
    ),
    ("[2001:db8::1:8080", "UNRESOLVABLE", None, "[2001:db8::1:8080", 443, 0),
    # exception paths -> RESOLUTION_ERROR with EMPTY target (PublishBulkScanJob.java:135-142)
    (",leading-comma", "RESOLUTION_ERROR", None, None, 0, 0),
    ("123,", "RESOLUTION_ERROR", None, None, 0, 0),
    ("trailing-slashes//", "RESOLUTION_ERROR", None, None, 0, 0),
]


@pytest.fixture(scope="module")
def parsed(spark):
    targets = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "seq: long, target: string"
    )
    dns = dns_table(spark, DNS)
    dl = load_denylist(spark, lines=[])
    routed = parse_and_route(targets, dns, dl, "bs-test")
    return {r["target"]: r for r in routed.all_jobs.collect()}


@pytest.mark.parametrize("target,status,ip,hostname,port,rank", CASES, ids=[c[0] for c in CASES])
def test_parse_case(parsed, target, status, ip, hostname, port, rank):
    r = parsed[target]
    assert r["status"] == status
    assert r["ip"] == ip
    assert r["hostname"] == hostname
    assert r["port"] == port
    assert r["tranco_rank"] == rank


def test_job_ids_deterministic_and_unique(parsed):
    ids = [r["job_id"] for r in parsed.values()]
    assert len(set(ids)) == len(ids)


def test_comma_ip_form(spark):
    """hostname,ip two-part form (ScanTarget.java:66-84)."""
    targets = spark.createDataFrame(
        [(0, "foo.com,1.2.3.4"), (1, "bar.com:8080,"), (2, "baz.com:9090,5.6.7.8")],
        "seq: long, target: string",
    )
    dns = dns_table(spark, {"bar.com": "9.9.9.9"})
    routed = parse_and_route(targets, dns, load_denylist(spark, lines=[]), "bs")
    rows = {r["target"]: r for r in routed.all_jobs.collect()}
    r = rows["foo.com,1.2.3.4"]
    # ip given inline: no resolve; port falls to default via java:134-136
    assert (r["hostname"], r["ip"], r["port"], r["status"]) == ("foo.com", "1.2.3.4", 443, "TO_BE_EXECUTED")
    r = rows["bar.com:8080,"]
    # early resolve succeeds; port overwritten to default by java:134-136
    assert (r["hostname"], r["ip"], r["port"], r["status"]) == ("bar.com", "9.9.9.9", 443, "TO_BE_EXECUTED")
    r = rows["baz.com:9090,5.6.7.8"]
    # unchecked comma-form port (java:73), then default overwrite on the ip part
    assert (r["hostname"], r["ip"], r["port"], r["status"]) == ("baz.com", "5.6.7.8", 443, "TO_BE_EXECUTED")


def test_udf_plan_is_arrow_vectorized(spark):
    """No per-row Python: the parse must appear as ArrowEvalPython, never
    BatchEvalPython (input_hint: pandas/Arrow UDFs only)."""
    targets = spark.createDataFrame([(0, "1.2.3.4")], "seq: long, target: string")
    routed = parse_and_route(targets, dns_table(spark, {}), load_denylist(spark, lines=[]), "bs")
    plan = routed.all_jobs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
