"""Multimodal operators: area resize (real numpy math) and video
frame-sampling (real mapInPandas plumbing over the deterministic fake
container) — plans must stay ArrowEval, bytes never shuffle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_core_spark.functions.image import (
    decode_image,
    decode_video_frames,
    encode_image,
    encode_video,
    resize_image,
    resize_images,
    sample_frames,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_resize_image_exact_block_means():
    arr = _img(8, 8, 1)
    out = resize_image(arr, 4, 4)
    assert out.shape == (4, 4, 3)
    # each output pixel is the exact rounded mean of its 2x2 block
    want = np.clip(
        np.rint(
            arr.reshape(4, 2, 4, 2, 3).astype(np.float64).mean(axis=(1, 3))
        ),
        0,
        255,
    ).astype(np.uint8)
    assert (out == want).all()


def test_resize_image_upscale_duplicates():
    arr = _img(2, 2, 2)
    out = resize_image(arr, 4, 4)
    assert out.shape == (4, 4, 3)
    assert (out[0, 0] == arr[0, 0]).all() and (out[3, 3] == arr[1, 1]).all()


def test_resize_images_mapinpandas(spark):
    rows = [("a", encode_image(_img(16, 12, 3), "png")),
            ("b", encode_image(_img(9, 33, 4), "jpeg")),
            ("bad", b"XXXXnope")]
    df = spark.createDataFrame(rows, "image_id: string, bytes: binary")
    out = {r["image_id"]: r for r in resize_images(df, 8, 8).collect()}
    assert set(out) == {"a", "b"}  # corrupt row dropped
    for iid, r in out.items():
        arr = decode_image(bytes(r["bytes"]))
        assert arr.shape == (8, 8, 3)
        assert (r["w"], r["h"], r["fmt"]) == (8, 8, "png")
    # resized-a equals the driver-side numpy reference exactly (png lossless)
    want = resize_image(decode_image(bytes(rows[0][1])), 8, 8)
    assert (decode_image(bytes(out["a"]["bytes"])) == want).all()
    plan = resize_images(df, 8, 8)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEval" in plan or "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_video_roundtrip_and_frame_sampling(spark):
    frames = [_img(6, 6, s) for s in range(7)]
    vid = encode_video(frames)
    assert len(decode_video_frames(vid)) == 7
    df = spark.createDataFrame(
        [("v1", vid), ("bad", b"JUNK")], "video_id: string, bytes: binary"
    )
    got = sample_frames(df, stride=3).collect()
    by_idx = {(r["video_id"], r["frame_idx"]): bytes(r["bytes"]) for r in got}
    assert set(by_idx) == {("v1", 0), ("v1", 3), ("v1", 6)}
    for i in (0, 3, 6):
        assert (decode_image(by_idx[("v1", i)]) == frames[i]).all()
    with pytest.raises(ValueError):
        sample_frames(df, stride=0)


def test_frame_sampling_explodes_executor_side(spark):
    """The explosion happens inside the Arrow UDF: the plan has no
    Generate/explode node and no python row-at-a-time eval."""
    df = spark.createDataFrame(
        [("v", encode_video([_img(4, 4, s) for s in range(4)]))],
        "video_id: string, bytes: binary",
    )
    plan = sample_frames(df, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan
