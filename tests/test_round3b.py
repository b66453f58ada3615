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
            # commit (schema-valid empty append — overlap is what counts)
            empty = eng.store.read("frontier").limit(0)
            real_commit({"frontier": ("append", eng.store.stage(empty, "frontier"))})
        return real_commit(staged, meta=meta, expected_base=expected_base)

    eng.store.commit = sabotage
    with pytest.raises(CommitConflictError):
        eng.run(max_batches=2)
    eng.store.commit = real_commit
    # retry: state re-derived from the log on entry; crawl completes
    eng.run()
    res = eng.store.read("results")
    assert res.count() == res.select("job_id").distinct().count()
    assert res.count() == targets.count()


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
