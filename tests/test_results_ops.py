"""Results-side operators + monitor: O2 latest-wins, J5 lookup, T6 status
invariant, K4 partial upsert, A2-A5 progress math, and the image payload
invariant (PSNR >= 40 dB lossy / exact lossless + caption equality)."""

import pytest
from pyspark.sql import functions as F

from crawler_core_spark.functions.image import decode_image, encode_image, psnr
from crawler_core_spark.operators.results import (
    assert_status_invariant,
    latest_result_per_job,
    merge_partials,
    read_partials,
    results_for_target,
    validate_fetch_invariant,
)
from crawler_core_spark.plans.monitor import ProgressMonitor
from crawler_core_spark.synth import make_image_row


def test_latest_result_wins(spark):
    """DummyPersistenceProviderTest.java:62-103 semantics."""
    df = spark.createDataFrame(
        [
            ("j1", 1.0, 0, "OLD"),
            ("j1", 3.0, 1, "NEW"),
            ("j1", 3.0, 0, "TIE_LOSER"),
            ("j2", 5.0, 0, "ONLY"),
        ],
        "job_id: string, ts: double, batch_id: int, payload: string",
    )
    got = {r["job_id"]: r["payload"] for r in latest_result_per_job(df).collect()}
    assert got == {"j1": "NEW", "j2": "ONLY"}


def test_results_for_target(spark):
    df = spark.createDataFrame(
        [("a.com", "1.1.1.1"), ("b.com", "2.2.2.2"), (None, "1.1.1.1")],
        "hostname: string, ip: string",
    )
    assert results_for_target(df, "1.1.1.1").count() == 2
    assert results_for_target(df, "a.com").count() == 1


def test_status_invariant_gate(spark):
    ok = spark.createDataFrame([("S", "S")], "status: string, result_status: string")
    assert_status_invariant(ok)
    bad = spark.createDataFrame([("S", "E")], "status: string, result_status: string")
    with pytest.raises(ValueError):
        assert_status_invariant(bad)


def test_merge_partials_upsert(spark, store):
    p1 = spark.createDataFrame(
        [("j1", 1.0, 0, "v1"), ("j2", 1.0, 0, "v1")],
        "job_id: string, ts: double, batch_id: int, payload: string",
    )
    merge_partials(store, p1)
    p2 = spark.createDataFrame(
        [("j1", 2.0, 1, "v2")],
        "job_id: string, ts: double, batch_id: int, payload: string",
    )
    merge_partials(store, p2)
    # upsert view: latest-wins applied at read over the append-only log
    got = {r["job_id"]: r["payload"] for r in read_partials(store).collect()}
    assert got == {"j1": "v2", "j2": "v1"}
    # write volume is O(batch): each merge appended only its own rows
    assert store.snapshot_count("partial_results") == 2


def test_merge_partials_write_volume_and_compaction(spark, store):
    """K4 scale contract: per-batch commit volume is the batch's own rows
    (append-only), and the compaction cadence collapses the chain."""
    for i in range(5):
        p = spark.createDataFrame(
            [("j1", float(i), i, f"v{i}")],
            "job_id: string, ts: double, batch_id: int, payload: string",
        )
        merge_partials(store, p, compact_every=5)
    # 4 appends then the 5th triggers a compacting replace
    assert store.snapshot_count("partial_results") == 1
    rows = read_partials(store).collect()
    assert len(rows) == 1 and rows[0]["payload"] == "v4"
    # raw table after compaction holds only the surviving row
    assert store.read("partial_results").count() == 1


def test_progress_monitor_reference_math():
    """A2-A4: exact alpha schedule (ProgressMonitor.java:108-114) and the
    completion condition totalDone == expectedTotal (:134-136)."""
    m = ProgressMonitor(expected_total=3)
    m.on_done("SUCCESS", now=2.0)
    # first done: alpha = 2/(1+1) = 1 -> ema = duration exactly
    assert m.moving_average == pytest.approx(2.0)
    m.on_done("ERROR", now=3.0)
    # second: alpha = 2/3 -> ema = 2/3*1 + 1/3*2
    assert m.moving_average == pytest.approx(2 / 3 * 1.0 + 1 / 3 * 2.0)
    assert not m.finished
    m.on_done("SUCCESS", now=4.5)
    assert m.finished
    assert m.eta == pytest.approx(0.0)
    roll = m.final_rollup()
    assert roll["successful_scans"] == 2
    assert roll["job_status_counters"] == {"SUCCESS": 2, "ERROR": 1}


def test_psnr_invariant_codec():
    """png round-trips exactly (PSNR inf); jpeg quantization stays >= 40 dB."""
    png = make_image_row(0)   # even idx -> png
    jpg = make_image_row(1)   # odd idx -> jpeg
    import numpy as np

    a = decode_image(png["bytes"])
    assert psnr(a, a) == float("inf")
    # re-encode the decoded jpeg losslessly: decoded-vs-decoded is exact,
    # original-gradient-vs-decoded is the lossy case checked in synth
    b = decode_image(jpg["bytes"])
    assert psnr(b, decode_image(encode_image(b, "jpeg"))) >= 40.0


def test_validate_fetch_invariant(spark):
    rows = [make_image_row(i) for i in range(8)]
    ref = spark.createDataFrame(
        [(r["image_id"], r["bytes"], r["caption"]) for r in rows],
        "image_id: string, bytes: binary, caption: string",
    )
    # fetched: same bytes (PSNR inf), one caption corrupted, one lossy re-encode
    fetched_rows = []
    for i, r in enumerate(rows):
        cap = r["caption"] + "!" if i == 3 else r["caption"]
        buf = r["bytes"]
        if i == 5:
            buf = encode_image(decode_image(r["bytes"]), "jpeg")
        fetched_rows.append((r["image_id"], buf, cap))
    fetched = spark.createDataFrame(
        fetched_rows, "image_id: string, bytes: binary, caption: string"
    )
    out = {r["image_id"]: r for r in validate_fetch_invariant(fetched, ref).collect()}
    assert all(r["psnr_ok"] for r in out.values())
    assert not out["img-00003"]["caption_ok"]
    assert sum(not r["caption_ok"] for r in out.values()) == 1
    assert out["img-00005"]["psnr_db"] >= 40.0
    assert out["img-00000"]["psnr_db"] == 999.0  # exact decode, capped sentinel
