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

The contract runs in a FRESH SUBPROCESS: spark.jars / spark.sql.extensions
/ catalog classes only take effect at JVM construction, so building the
Iceberg session inside the pytest process (where conftest's shared session
may already exist) would silently drop them and fail with
ClassNotFoundException exactly when a jar appears (iceberg_session also
guards this loudly).  In THIS sandbox no jar ships, so the module is
skipped — keeping it importable and green-on-skip is the deliverable.
"""

import os
import subprocess
import sys

import pytest

from crawler_core_spark.iceberg import find_iceberg_jar, iceberg_session

_JAR = find_iceberg_jar()

pytestmark = pytest.mark.skipif(
    _JAR is None,
    reason="no iceberg-spark-runtime jar in pyspark/jars, $SPARK_HOME/jars "
    "or SPARK_GRAFT_ICEBERG_JAR — Plan B (storage.TableStore) active",
)

_CONTRACT_DRIVER = r"""
import sys
from crawler_core_spark.iceberg import IcebergTableStore, iceberg_session

wh = sys.argv[1]
spark = iceberg_session(wh)
spark.sparkContext.setLogLevel("ERROR")
ice = IcebergTableStore(spark)

def _df(rows):
    return spark.createDataFrame(rows, "fpart int, url_key long, host string")

# append chain + snapshot history
ice.write(_df([(0, 1, "a")]), "frontier_a")
ice.write(_df([(1, 2, "b")]), "frontier_a", mode="append")
assert ice.snapshot_count("frontier_a") == 2
assert {r.url_key for r in ice.read("frontier_a").collect()} == {1, 2}
print("CONTRACT-OK append_chain")

# replace atomicity + time travel
ice.write(_df([(0, 1, "a")]), "frontier_b")
first = ice.snapshots("frontier_b")[-1]["snapshot_id"]
ice.write(_df([(0, 9, "z")]), "frontier_b", mode="replace")
assert {r.url_key for r in ice.read("frontier_b").collect()} == {9}
assert {r.url_key for r in ice.read_at("frontier_b", first).collect()} == {1}
print("CONTRACT-OK replace_time_travel")

# partition-level merge: only touched partitions replaced
ice.write(_df([(0, 1, "a"), (1, 2, "b"), (2, 3, "c")]),
          "frontier_c", mode="replace", partition_by=["fpart"])
ice.merge_partitions(_df([(1, 20, "B")]), "frontier_c")
got = {(r.fpart, r.url_key) for r in ice.read("frontier_c").collect()}
assert got == {(0, 1), (1, 20), (2, 3)}, got
print("CONTRACT-OK merge_partitions")

# compaction preserves values
for i in range(5):
    ice.write(_df([(i, i, f"h{i}")]), "frontier_d", mode="append")
before = sorted(r.url_key for r in ice.read("frontier_d").collect())
ice.compact("frontier_d")
after = sorted(r.url_key for r in ice.read("frontier_d").collect())
assert before == after == [0, 1, 2, 3, 4]
print("CONTRACT-OK compaction")
print("CONTRACT-DONE")
"""


def test_contract_suite_in_fresh_jvm(tmp_path):
    """Full Plan-A storage contract against a real hadoop-catalog table,
    driven in a clean subprocess so the Iceberg jar/extensions land at
    JVM construction."""
    wh = str(tmp_path / "iceberg-wh")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _CONTRACT_DRIVER, wh],
        capture_output=True, text=True, timeout=600, env=env,
    )
    out = proc.stdout
    assert proc.returncode == 0, (out, proc.stderr[-2000:])
    for marker in ("append_chain", "replace_time_travel",
                   "merge_partitions", "compaction"):
        assert f"CONTRACT-OK {marker}" in out, out
    assert "CONTRACT-DONE" in out


def test_iceberg_session_refuses_running_jvm(spark):
    """spark.jars cannot be applied to an existing JVM: building the
    Iceberg catalog session while any SparkSession is active must fail
    loudly, not return a catalog-less session."""
    with pytest.raises(RuntimeError, match="before any other SparkSession"):
        iceberg_session("/tmp/never-used")


def test_jar_probe_is_the_gate():
    # inside this module the jar exists by construction of pytestmark
    assert find_iceberg_jar() is not None
