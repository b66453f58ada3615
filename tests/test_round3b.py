"""Round-3 hardening regressions (post-review fixes).

Pins the review findings: cuckoo overflow must be loud, probe must not
mutate the caller's schema, centroid versions must survive compaction,
optimistic commit conflicts must be detected, master-string core parsing,
connected-components id-type guard, and worker -scanName validation.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_core_spark.storage import CommitConflictError, TableStore  # noqa: E402


# ---------------------------------------------------------------------------
# cuckoo filter: overflow is an error, never a silent false negative
# ---------------------------------------------------------------------------

def test_cuckoo_full_filter_raises_not_silently_drops(spark, tmp_path):
    from crawler_core_spark.operators.url_seen import CuckooUrlSeen

    store = TableStore(spark, str(tmp_path / "cuckoofull"))
    # 1 partition x 2 buckets x 4 slots = 8 slots total; 200 keys cannot fit
    seen = CuckooUrlSeen(store, partitions=1, buckets_per_partition=2)
    df = spark.range(200).select(F.col("id").alias("url_key"))
    with pytest.raises(Exception, match="cuckoo filter partition .* is full"):
        table, staged = seen.stage_add(df)
        store.commit({table: staged})
    # the failed stage never became visible state
    assert not store.exists(seen.table)


# ---------------------------------------------------------------------------
# probe() must not mutate the caller's cached schema (StructType.add pitfall)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_probe_does_not_mutate_caller_schema(spark, tmp_path, kind):
    from crawler_core_spark.operators.url_seen import BloomUrlSeen, CuckooUrlSeen

    store = TableStore(spark, str(tmp_path / f"probemut-{kind}"))
    cls = {"bloom": BloomUrlSeen, "cuckoo": CuckooUrlSeen}[kind]
    seen = cls(store, partitions=4)
    df = spark.range(10).select(F.col("id").alias("url_key"))
    # touch .schema so the cached_property is populated pre-probe
    cols_before = [f.name for f in df.schema.fields]
    p1 = seen.probe(df)
    assert [f.name for f in df.schema.fields] == cols_before
    assert df.columns == cols_before  # no phantom 'seen' column
    p2 = seen.probe(df)  # double probe on the SAME frame must not blow up
    assert p1.columns == p2.columns == cols_before + ["seen"]
    assert p2.filter(F.col("seen")).count() == 0


# ---------------------------------------------------------------------------
# IVF centroid versioning survives snapshot compaction
# ---------------------------------------------------------------------------

def test_centroid_version_survives_compaction(spark, tmp_path):
    from crawler_core_spark.operators.ann import (
        CENTROIDS_TABLE,
        load_centroids,
        save_centroids,
    )

    store = TableStore(spark, str(tmp_path / "centcompact"))
    old = [[1.0, 0.0], [0.0, 1.0]]
    for _ in range(3):
        save_centroids(store, old, model_id="m")
    store.compact(CENTROIDS_TABLE)  # chain collapses; snapshot_count resets
    new = [[5.0, 5.0], [6.0, 6.0]]
    save_centroids(store, new, model_id="m")
    assert load_centroids(store, "m") == new  # NOT the stale pre-compact model


# ---------------------------------------------------------------------------
# optimistic commit concurrency (Iceberg validation analogue)
# ---------------------------------------------------------------------------

def test_commit_conflict_on_overlapping_tables(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "occ"))
    df = spark.range(3).select(F.col("id").alias("k"))
    base = store.commit_count()
    # concurrent writer lands a commit on the same table
    store.commit({"frontier": ("replace", store.stage(df, "frontier"))})
    rel = store.stage(df, "frontier")
    with pytest.raises(CommitConflictError, match="stale"):
        store.commit({"frontier": ("replace", rel)}, expected_base=base)
    # disjoint table set from the same base: no conflict
    store.commit(
        {"results": ("append", store.stage(df, "results"))}, expected_base=base
    )
    # and without expected_base the legacy unconditional append still works
    store.commit({"frontier": ("replace", rel)})


def test_engine_batch_commit_carries_conflict_base(spark, tmp_path):
    """A foreign commit to the frontier between a batch's state read and
    its commit must abort the batch, not resurrect completed jobs — and a
    plain eng.run() re-invoke (the worker CLI's retry) must recover from
    the committed state with no duplicate results."""
    from test_round2 import make_engine, small_inputs

    targets, dns, dl, robots, images = small_inputs(spark)
    targets = targets.limit(6)
    eng = make_engine(spark, tmp_path, images, "occ-eng")
    eng.publish(targets, dns, dl, robots, "bs-occ")

    real_commit = eng.store.commit
    fired = {"n": 0}

    def sabotage(staged, meta=None, expected_base=None):
        if fired["n"] == 0 and (meta or {}).get("kind") == "batch":
            fired["n"] += 1
            # foreign writer sneaks in AFTER our state read, BEFORE our
            # commit: an append to counters — a plain append table in the
            # batch's staged set (overlap is what triggers the conflict;
            # merge tables like the frontier reject raw appends outright)
            empty = eng.store.read("counters").limit(0)
            real_commit({"counters": ("append", eng.store.stage(empty, "counters"))})
        return real_commit(staged, meta=meta, expected_base=expected_base)

    def n_cached():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    eng.store.commit = sabotage
    before = n_cached()
    with pytest.raises(CommitConflictError):
        eng.run(max_batches=2)
    # the aborted batch released its persisted frames (retries must not
    # accumulate pinned frontier/batch state)
    assert n_cached() == before
    eng.store.commit = real_commit
    # retry: state re-derived from the log on entry; crawl completes
    eng.run()
    res = eng.store.read("results")
    assert res.count() == res.select("job_id").distinct().count()
    assert res.count() == targets.count()


def test_compact_detects_concurrent_append(spark, tmp_path):
    """compact()'s replace is derived from its own read; an append that
    lands in between must raise, not be silently dropped by the replace."""
    store = TableStore(spark, str(tmp_path / "occcompact"))
    df = spark.range(4).select(F.col("id").alias("k"))
    store.write(df, "results")
    store.write(df, "results")

    real_read = store.read
    fired = {"n": 0}

    def sneaky_read(table, *a, **k):
        out = real_read(table, *a, **k)
        if table == "results" and fired["n"] == 0:
            fired["n"] += 1
            real_read_df = spark.range(1).select(F.col("id").alias("k"))
            store.write(real_read_df, "results")  # concurrent appender
        return out

    store.read = sneaky_read
    with pytest.raises(CommitConflictError):
        store.compact("results")
    store.read = real_read
    # nothing lost: both snapshots plus the concurrent append remain live
    assert store.read("results").count() == 9
    # and with no interference compaction succeeds
    store.compact("results")
    assert store.snapshot_count("results") == 1
    assert store.read("results").count() == 9


def test_merge_table_rejects_raw_append_on_read(spark, tmp_path):
    """An append mixed into a merge chain used to silently become 'the
    base snapshot', vanishing the real base — it must raise instead."""
    store = TableStore(spark, str(tmp_path / "mergeappend"))
    df = spark.range(6).select(
        F.col("id").alias("k"), F.pmod("id", F.lit(2)).cast("int").alias("p")
    )
    store.commit({"t": ("replace", store.stage(df, "t", partition_by=["p"]))})
    part0 = df.filter(F.col("p") == 0)
    store.commit(
        {"t": ("merge", store.stage(part0, "t", partition_by=["p"]), "p", [0])}
    )
    assert store.read("t").count() == 6
    store.commit({"t": ("append", store.stage(df.limit(1), "t"))})
    with pytest.raises(ValueError, match="merge chain"):
        store.read("t").count()


def test_merge_partials_compaction_conflict_falls_back_to_append(spark, tmp_path):
    from crawler_core_spark.operators.results import merge_partials, read_partials

    store = TableStore(spark, str(tmp_path / "partconf"))
    mk = lambda jid, ts: spark.createDataFrame(  # noqa: E731
        [(jid, "RUNNING", float(ts))], "job_id: long, status: string, ts: double"
    )
    merge_partials(store, mk(1, 1.0), compact_every=2)

    real_read = store.read
    fired = {"n": 0}

    def sneaky_read(table, *a, **k):
        out = real_read(table, *a, **k)
        if table == "partial_results" and fired["n"] == 0:
            fired["n"] += 1
            store.write(mk(99, 5.0), "partial_results")  # concurrent worker
        return out

    store.read = sneaky_read
    merge_partials(store, mk(2, 2.0), compact_every=2)  # cadence hit + conflict
    store.read = real_read
    assert store.log()[-1]["tables"]["partial_results"]["mode"] == "append"
    got = {r["job_id"] for r in read_partials(store).collect()}
    assert got == {1, 2, 99}  # the concurrent worker's row survived


def test_save_centroids_conflict_raises(spark, tmp_path):
    from crawler_core_spark.operators.ann import load_centroids, save_centroids

    store = TableStore(spark, str(tmp_path / "centconf"))
    save_centroids(store, [[1.0], [2.0]], model_id="m")

    real_read = store.read
    fired = {"n": 0}

    def sneaky_read(table, *a, **k):
        out = real_read(table, *a, **k)
        if table == "ann_centroids" and fired["n"] == 0:
            fired["n"] += 1
            store.read = real_read
            save_centroids(store, [[9.0], [9.0]], model_id="m")  # rival trainer
            store.read = sneaky_read
        return out

    store.read = sneaky_read
    with pytest.raises(CommitConflictError):
        save_centroids(store, [[3.0], [4.0]], model_id="m")
    store.read = real_read
    # no doubled-ver corruption: the rival's model is the clean latest
    assert load_centroids(store, "m") == [[9.0], [9.0]]


# ---------------------------------------------------------------------------
# master-string parsing
# ---------------------------------------------------------------------------

def test_total_cores_master_parsing():
    from crawler_core_spark.session import total_cores

    assert total_cores("local[8]") == 8
    assert total_cores("local[*]") == 0
    assert total_cores("local[4,2]") == 4  # second field = maxFailures
    assert total_cores("local[*,2]") == 0  # must not crash on int('*')
    assert total_cores("local-cluster[4,8,16384]") == 32
    assert total_cores("spark://host:7077") == 0


# ---------------------------------------------------------------------------
# connected components: loud failure on non-integral ids
# ---------------------------------------------------------------------------

def test_connected_components_rejects_string_ids(spark):
    from crawler_core_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [("img-1", "img-2")], "id_a: string, id_b: string"
    )
    with pytest.raises(TypeError, match="integral"):
        connected_components(edges)


# ---------------------------------------------------------------------------
# worker -scanName validation
# ---------------------------------------------------------------------------

def test_cli_worker_rejects_unknown_scan_name(spark, tmp_path):
    from crawler_core_spark import synth
    from crawler_core_spark.cli import main
    from crawler_core_spark.sources.dns import dns_table

    host_file = tmp_path / "hosts.txt"
    host_file.write_text("\n".join(synth.host_for_image(i) for i in range(3)) + "\n")
    img_path = str(tmp_path / "imgs-wsn.parquet")
    spark.createDataFrame(synth.images_pandas(3)).write.mode("overwrite").parquet(img_path)
    dns_path = str(tmp_path / "dns-wsn.parquet")
    dns_table(
        spark, {synth.host_for_image(i): synth.ip_for_image(i) for i in range(3)}
    ).write.mode("overwrite").parquet(dns_path)
    wh = str(tmp_path / "wh-wsn")
    rc = main([
        "controller", "-hostFile", str(host_file), "-warehouse", wh,
        "-images", img_path, "-dns", dns_path, "-scanName", "wsn",
        "-urlSeen", "exact", "-scanIntervalS", "0.01", "-scanRuns", "2",
    ])
    assert rc == 0
    # typo'd suffix -> loud SystemExit listing the real suffixes, BEFORE
    # any batch runs against an empty seen-set
    with pytest.raises(SystemExit, match="wsn-7"):
        main([
            "worker", "-warehouse", wh, "-images", img_path,
            "-urlSeen", "exact", "-scanName", "wsn-7",
        ])
    # the real per-scan suffix resolves and the (drained) frontier no-ops
    rc = main([
        "worker", "-warehouse", wh, "-images", img_path,
        "-urlSeen", "exact", "-scanName", "wsn-1",
    ])
    assert rc == 0
