"""End-to-end crawl engine vs the pure-Python reference-semantics oracle.

This is the correctness gate from BASELINE.md: crawl-order exact match,
URL-seen exact set match, status-count equality, per-batch lineage
(fetched/deduped/deferred) equality, and kill-and-resume mid-frontier.
Mirrors the *intent* of the reference's ControllerTest / BulkScanWorkerTest
(SURVEY.md §5) on the dataflow engine.
"""

import pytest
from pyspark.sql import functions as F

from crawler_core_spark import synth
from crawler_core_spark.oracle import crawl_oracle, publish_oracle
from crawler_core_spark.plans.crawl import CrawlEngine
from crawler_core_spark.sources.denylist import load_denylist
from crawler_core_spark.sources.dns import dns_table
from crawler_core_spark.sources.targets import target_file_df
from crawler_core_spark.storage import TableStore

N_HOSTS = 48
BATCH_PERIOD = 5.0

# multi-URL hosts (distinct ports on one host) exercise the per-host
# politeness budget across several batches — the FIFO/priority contract.
HOT_HOST_IDX = 2
HOT_PORTS = list(range(8000, 8012))


def seed_lines():
    lines = synth.seed_lines(N_HOSTS)
    host = synth.host_for_image(HOT_HOST_IDX)
    lines += [f"{host}:{p}" for p in HOT_PORTS]
    return lines


def build_inputs(spark):
    lines = seed_lines()
    targets = target_file_df(spark, lines=lines)
    dns = dns_table(spark, synth.dns_mappings(N_HOSTS))
    dl = load_denylist(spark, lines=synth.DENYLIST_LINES)
    robots = spark.createDataFrame(synth.robots_rules(N_HOSTS), synth.ROBOTS_SCHEMA)
    images = spark.createDataFrame(synth.images_pandas(N_HOSTS))
    return lines, targets, dns, dl, robots, images


def run_oracle():
    lines = seed_lines()
    jobs = publish_oracle(
        lines, synth.dns_mappings(N_HOSTS), synth.DENYLIST_LINES,
        synth.robots_rules(N_HOSTS),
    )
    images = {r["image_id"]: r for _, r in synth.images_pandas(N_HOSTS).iterrows()}
    return crawl_oracle(jobs, images, batch_period=BATCH_PERIOD)


def run_engine(spark, tmp_path, url_seen_kind="exact", interrupt_after=None, **seen_kw):
    lines, targets, dns, dl, robots, images = build_inputs(spark)
    root = str(tmp_path / f"wh-{url_seen_kind}-{interrupt_after}")
    store = TableStore(spark, root)
    eng = CrawlEngine(
        spark, store, images, url_seen_kind=url_seen_kind,
        batch_period=BATCH_PERIOD, url_seen_kw=seen_kw,
    )
    eng.publish(targets, dns, dl, robots, "bs-e2e")
    if interrupt_after is not None:
        eng.run(max_batches=interrupt_after)
        # simulate a crash + cold resume: brand-new engine over the same
        # committed store (nothing carried over in memory).
        store2 = TableStore(spark, root)
        eng = CrawlEngine(
            spark, store2, images, url_seen_kind=url_seen_kind,
            batch_period=BATCH_PERIOD, url_seen_kw=seen_kw,
        )
    eng.run()
    return eng


@pytest.fixture(scope="module")
def oracle_run():
    return run_oracle()


@pytest.fixture(scope="module")
def engine_results(spark, tmp_path_factory):
    eng = run_engine(spark, tmp_path_factory.mktemp("crawl"))
    return eng, eng.store.read("results").collect()


def oracle_crawl_order(run):
    return [(j.seq, j.batch_id, j.crawl_pos) for j in run.crawl_order]


def engine_crawl_order(rows):
    fetched = [r for r in rows if r["crawl_pos"] is not None]
    fetched.sort(key=lambda r: r["crawl_pos"])
    return [(r["seq"], r["batch_id"], r["crawl_pos"]) for r in fetched]


def test_crawl_order_exact(engine_results, oracle_run):
    _, rows = engine_results
    assert engine_crawl_order(rows) == oracle_crawl_order(oracle_run)


def test_url_seen_set_exact(engine_results, oracle_run):
    _, rows = engine_results
    engine_seen = {r["url_canon"] for r in rows if r["crawl_pos"] is not None}
    assert engine_seen == oracle_run.url_seen


def test_status_counts_match(engine_results, oracle_run):
    _, rows = engine_results
    engine_counts = {}
    for r in rows:
        engine_counts[r["status"]] = engine_counts.get(r["status"], 0) + 1
    assert engine_counts == oracle_run.status_counts()


def test_every_job_terminal_exactly_once(engine_results, oracle_run):
    """BulkScanWorkerTest intent: one terminal results row per published job,
    frontier drained (ack-until-persisted upgraded to exactly-once)."""
    eng, rows = engine_results
    seqs = [r["seq"] for r in rows]
    assert len(seqs) == len(set(seqs))
    assert len(seqs) == len(oracle_run.jobs)
    assert eng.store.read("frontier").count() == 0


def test_batch_lineage_counters(engine_results, oracle_run):
    eng, _ = engine_results
    counters = eng.store.read("counters")
    got = {
        int(r["batch_id"]): (int(r["fetched"]), int(r["deduped"]), int(r["deferred"]))
        for r in counters.filter(F.col("batch_id") >= 0)
        .groupBy("batch_id")
        .agg(
            F.sum("fetched").alias("fetched"),
            F.sum("deduped").alias("deduped"),
            F.sum("deferred").alias("deferred"),
        )
        .collect()
    }
    want = {
        b["batch_id"]: (b["fetched"], b["deduped"], b["deferred"])
        for b in oracle_run.batches
    }
    assert got == want


def test_politeness_spreads_hot_host(engine_results):
    """The 12 same-host URLs must span multiple batches under the per-host
    budget (crawl_delay=3 for host idx 2 -> budget floor(5/3)=1/batch)."""
    _, rows = engine_results
    host = synth.host_for_image(HOT_HOST_IDX)
    hot = [r for r in rows if r["hostname"] == host and r["crawl_pos"] is not None]
    assert len(hot) >= len(HOT_PORTS)
    assert len({r["batch_id"] for r in hot}) > 1


def test_resume_mid_frontier(spark, tmp_path, oracle_run):
    """Kill after 1 committed batch, cold-resume from the store: final
    results identical to the uninterrupted run (K6 exactly-once)."""
    eng = run_engine(spark, tmp_path, interrupt_after=1)
    rows = eng.store.read("results").collect()
    assert engine_crawl_order(rows) == oracle_crawl_order(oracle_run)
    engine_counts = {}
    for r in rows:
        engine_counts[r["status"]] = engine_counts.get(r["status"], 0) + 1
    assert engine_counts == oracle_run.status_counts()


def test_bloom_matches_exact(spark, tmp_path, oracle_run):
    """Bloom seen-set path reproduces the exact path bit-for-bit at test
    scale (no false negatives by construction; false positives improbable
    at this fill factor) — the A7 property gate."""
    eng = run_engine(
        spark, tmp_path, url_seen_kind="bloom", partitions=8,
        m_bits_per_partition=1 << 16,
    )
    rows = eng.store.read("results").collect()
    assert engine_crawl_order(rows) == oracle_crawl_order(oracle_run)
    engine_seen = {r["url_canon"] for r in rows if r["crawl_pos"] is not None}
    assert engine_seen == oracle_run.url_seen


def test_timeout_cancelled_path(spark, tmp_path):
    """Deadline-as-data: fetch cost (w*h px) above scan_timeout -> CANCELLED
    (Worker.java:78-91 semantics without the thread machinery)."""
    lines, targets, dns, dl, robots, images = build_inputs(spark)
    store = TableStore(spark, str(tmp_path / "wh-timeout"))
    eng = CrawlEngine(
        spark, store, images, batch_period=BATCH_PERIOD, scan_timeout_ms=40 * 40,
    )
    eng.publish(targets, dns, dl, robots, "bs-t")
    eng.run()
    by_status = {
        r["status"]: r["count"]
        for r in eng.store.read("results").groupBy("status").count().collect()
    }
    assert by_status.get("CANCELLED", 0) > 0
    assert by_status.get("SUCCESS", 0) > 0
