"""Deterministic synthetic corpus (FIXTURES.md) — seeded, no external data.

Generators for: the images table (input_hint schema), seed target lists
(covering every ScanTargetTest parse case + bulk image hosts with
canonicalization-equivalent duplicates), the dns table, denylist lines,
and robots rules.  Everything is a pure function of (seed, index) so the
images table can be generated *distributed* (mapInPandas over
spark.range) at bench scale without driver materialization.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from crawler_core_spark.functions.image import encode_image, phash_py

IMAGES_SCHEMA = (
    "image_id: string, bytes: binary, w: int, h: int, fmt: string, "
    "caption: string, phash: long"
)

# bump when make_image_row / encode_image / phash_py numerics change —
# part of the bench corpus cache key (plans/bench_job.py)
SYNTH_VERSION = 2
DEFAULT_SEED = 42
DEFAULT_CORRUPT_EVERY = 97

_WORDS = (
    "amber brisk cedar dusky ember frost glade hazel irisa jetty kraal lumen "
    "mossy nadir ocher plume quill raven slate tulip umber vapor wharf xylem "
    "yonder zephyr"
).split()


def _rng_for(seed: int, idx: int) -> np.random.Generator:
    # stable per-row stream independent of partitioning
    mixed = int.from_bytes(
        hashlib.blake2b(f"{seed}:{idx}".encode(), digest_size=8).digest(), "big"
    )
    return np.random.default_rng(mixed)


def make_image_row(
    idx: int, seed: int = 42, corrupt_every: int = 97,
    px_min: int = 32, px_max: int = 65,
) -> dict:
    rng = _rng_for(seed, idx)
    w = int(rng.integers(px_min, px_max))
    h = int(rng.integers(px_min, px_max))
    # gradient + noise => non-degenerate PSNR
    gx = np.linspace(0, 255, w, dtype=np.float64)[None, :, None]
    gy = np.linspace(0, 255, h, dtype=np.float64)[:, None, None]
    noise = rng.integers(0, 64, size=(h, w, 3)).astype(np.float64)
    arr = np.clip((gx + gy) / 2 + noise - 32, 0, 255).astype(np.uint8)
    fmt = "png" if idx % 2 == 0 else "jpeg"
    buf = encode_image(arr, fmt)
    if corrupt_every and idx > 0 and idx % corrupt_every == 0:
        buf = b"XXXX" + buf[4:]  # corrupt magic -> decode ERROR path
    cap_words = [_WORDS[int(x) % len(_WORDS)] for x in rng.integers(0, 1 << 30, size=4)]
    return {
        "image_id": f"img-{idx:05d}",
        "bytes": buf,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": f"img-{idx:05d}: " + " ".join(cap_words),
        "phash": phash_py(arr),
    }


def images_df(
    spark: SparkSession, n: int, seed: int = 42, corrupt_every: int = 97,
    px_min: int = 32, px_max: int = 65,
) -> DataFrame:
    """Distributed deterministic images table (no driver materialization)."""

    def gen(batches):
        for pdf in batches:
            rows = [
                make_image_row(int(i), seed, corrupt_every, px_min, px_max)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    parts = max(spark.sparkContext.defaultParallelism, n // 5000)
    return spark.range(n).repartition(parts).mapInPandas(gen, IMAGES_SCHEMA)


def images_pandas(n: int, seed: int = 42, corrupt_every: int = 97) -> pd.DataFrame:
    return pd.DataFrame([make_image_row(i, seed, corrupt_every) for i in range(n)])


# ---------------------------------------------------------------------------
# seed target lists, dns, denylist, robots
# ---------------------------------------------------------------------------

SPECIAL_LINES = [
    "# comment line — must be dropped",
    "",
    "192.168.1.1",
    "192.168.1.1:8080",
    "192.168.1.1:70000",
    "192.168.1.1:0",
    "2001:db8::1",
    "::1",
    "[2001:db8::1]:8080",
    "[2001:0db8:85a3:0000:0000:8a2e:0370:7334]:8443",
    "[2001:db8::1]:abc",
    "[2001:db8::1:8080",
    "example.com",
    "example.com:8080",
    "100,192.168.1.1:8080",
    "200,[2001:db8::1]:8080",
    "https://crux-host.com",
    '"quoted.host.com"',
    "unresolvable.invalid",
    "denied.example.org",
    "10.66.0.5",
    "203.0.113.7",
    ",malformed-leading-comma",
]

DENYLIST_LINES = [
    "denied.example.org",
    "203.0.113.7",
    "10.66.0.0/16",
    "not_a_valid_entry_%%",
]


def host_for_image(idx: int) -> str:
    return f"img-{idx:05d}.example.net"


def image_id_for_host(idx: int) -> str:
    return f"img-{idx:05d}"


def ip_for_image(idx: int) -> str:
    return f"11.{(idx >> 16) & 255}.{(idx >> 8) & 255}.{idx & 255}"


def seed_lines(n_hosts: int, seed: int = 42, include_special: bool = True, dup_every: int = 10) -> list[str]:
    """Bulk image-host targets + canonicalization-equivalent duplicates
    (case variants / trailing dot / explicit default port) + the parse matrix."""
    lines: list[str] = list(SPECIAL_LINES) if include_special else []
    rng = np.random.default_rng(seed)
    for i in range(n_hosts):
        host = host_for_image(i)
        if i % 7 == 3:
            lines.append(f"{i + 1},{host}")  # ranked
        else:
            lines.append(host)
        if dup_every and i % dup_every == 5:
            variant = int(rng.integers(0, 3))
            if variant == 0:
                lines.append(host.upper())          # case dup
            elif variant == 1:
                lines.append(host + ".")            # trailing-dot dup
            else:
                lines.append(f"{host}:443")         # explicit default port dup
    return lines


def dns_mappings(n_hosts: int, unresolvable_every: int = 41) -> dict[str, str | None]:
    m: dict[str, str | None] = {
        "example.com": "93.184.216.34",
        "crux-host.com": "198.51.100.10",
        "quoted.host.com": "198.51.100.11",
        "unresolvable.invalid": None,
        "denied.example.org": "198.51.100.66",
    }
    for i in range(n_hosts):
        host = host_for_image(i)
        if unresolvable_every and i > 0 and i % unresolvable_every == 0:
            m[host] = None
        else:
            m[host] = ip_for_image(i)
        # canonicalization variants resolve like the base host only for the
        # exact-string forms the reference would hit the resolver with:
        m[host.upper()] = m[host]
        m[host + "."] = m[host]
    return m


ROBOTS_SCHEMA = "host: string, path_prefix: string, allow: boolean, crawl_delay: double"


def robots_rules(n_hosts: int, blocked_every: int = 29) -> list[tuple]:
    """[EXT] per-host robots rules (FIXTURES.md §5). Default allow-all with a
    hash-derived crawl delay; every `blocked_every`-th host disallows '/'."""
    rules = [("*", "/", True, 1.0)]
    for i in range(n_hosts):
        host = host_for_image(i)
        delay = 1.0 + (i % 5)  # 1..5 s
        if blocked_every and i > 0 and i % blocked_every == 0:
            rules.append((host, "/", False, delay))
        else:
            rules.append((host, "/", True, delay))
    return rules
