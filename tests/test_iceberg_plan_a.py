"""Iceberg Plan A contract tests — skipped unless a runtime jar exists.

VERDICT r3 #8: probe for an Iceberg runtime jar; when one is present,
run the storage CONTRACT against a real hadoop-catalog table so the
Plan-B -> Plan-A swap (crawler_core_spark/iceberg.py) is push-button.
The assertions mirror the Plan-B guarantees tests/test_storage* pin:

  append chain visible          -> snapshots accumulate, union read
  replace atomicity             -> createOrReplace, old readers time-travel
  merge (partition-level)       -> overwritePartitions replaces exactly
                                   the touched partitions
  compaction                    -> rewrite_data_files keeps values, read
                                   before/after identical
  snapshot history              -> .snapshots metadata table

In THIS sandbox no jar ships, so the module is skipped — keeping it
importable and green-on-skip is the deliverable (the conditional path).
"""

import pytest

from crawler_core_spark.iceberg import IcebergTableStore, find_iceberg_jar, iceberg_session

_JAR = find_iceberg_jar()

pytestmark = pytest.mark.skipif(
    _JAR is None,
    reason="no iceberg-spark-runtime jar in pyspark/jars, $SPARK_HOME/jars "
    "or SPARK_GRAFT_ICEBERG_JAR — Plan B (storage.TableStore) active",
)


@pytest.fixture(scope="module")
def ice(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("iceberg-wh"))
    spark = iceberg_session(wh)
    spark.sparkContext.setLogLevel("ERROR")
    yield IcebergTableStore(spark)
    spark.stop()


def _df(store, rows):
    return store.spark.createDataFrame(rows, "fpart int, url_key long, host string")


def test_append_chain_and_snapshot_history(ice):
    ice.write(_df(ice, [(0, 1, "a")]), "frontier_a")
    ice.write(_df(ice, [(1, 2, "b")]), "frontier_a", mode="append")
    assert ice.snapshot_count("frontier_a") == 2
    got = {r.url_key for r in ice.read("frontier_a").collect()}
    assert got == {1, 2}


def test_replace_is_atomic_and_time_travel_reads_old(ice):
    ice.write(_df(ice, [(0, 1, "a")]), "frontier_b")
    first = ice.snapshots("frontier_b")[-1]["snapshot_id"]
    ice.write(_df(ice, [(0, 9, "z")]), "frontier_b", mode="replace")
    assert {r.url_key for r in ice.read("frontier_b").collect()} == {9}
    # pre-replace readers keep their snapshot (Plan B: old manifest)
    old = {r.url_key for r in ice.read_at("frontier_b", first).collect()}
    assert old == {1}


def test_merge_replaces_exactly_touched_partitions(ice):
    ice.write(
        _df(ice, [(0, 1, "a"), (1, 2, "b"), (2, 3, "c")]),
        "frontier_c",
        mode="replace",
        partition_by=["fpart"],
    )
    # dynamic overwrite of partition 1 only — 0 and 2 must survive
    ice.merge_partitions(_df(ice, [(1, 20, "B")]), "frontier_c")
    got = {(r.fpart, r.url_key) for r in ice.read("frontier_c").collect()}
    assert got == {(0, 1), (1, 20), (2, 3)}


def test_compaction_preserves_values(ice):
    for i in range(5):
        ice.write(_df(ice, [(i, i, f"h{i}")]), "frontier_d", mode="append")
    before = sorted(r.url_key for r in ice.read("frontier_d").collect())
    ice.compact("frontier_d")
    after = sorted(r.url_key for r in ice.read("frontier_d").collect())
    assert before == after == [0, 1, 2, 3, 4]


def test_jar_probe_is_the_gate():
    # inside this module the jar exists by construction of pytestmark
    assert find_iceberg_jar() is not None
