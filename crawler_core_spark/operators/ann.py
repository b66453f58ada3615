"""Approximate-nearest-neighbor search over an embedding column [EXT].

Two paths, one contract (query_id, neighbor_id, sim):

- **brute_force_topk** — the exact baseline: broadcast the (small) query
  set against the full embeddings table; cosine = native
  ``F.zip_with``/``F.aggregate`` (JVM higher-order functions, no Python),
  top-k by window. Cost O(|queries| x |corpus|) — correctness anchor and
  perfectly scalable when |queries| is small (the broadcast join never
  shuffles the corpus).
- **lsh_bucket_topk** — the scale path: sign-random-projection LSH.
  Hyperplanes are derived deterministically from a seed; each vector gets
  a bucket id = sign bits of ``n_planes`` dot products (all native).
  Candidates = corpus rows sharing the query's bucket; exact cosine +
  top-k within the bucket only. At 10^10 vectors the bucket join
  replaces the cross product with a hash join on bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """queries: (query_id, qvec). Returns (query_id, neighbor_id, sim)."""
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    j = e.crossJoin(F.broadcast(queries)).filter(F.col("neighbor_id") != F.col("query_id"))
    sims = j.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def _plane_component(i, j: int, seed: int, t: int):
    """Deterministic pseudo-random hyperplane component in [-1, 1] for
    vector index i, plane j — computed NATIVELY from xxhash64, so no
    hyperplane materialization and no dimension needed at plan-build time
    (the round-1 version did a driver ``.first()`` to learn the dim)."""
    h = F.xxhash64(i.cast("long"), F.lit(j), F.lit(seed), F.lit(t))
    return (F.pmod(h, F.lit(2_000_001)).cast("double") - F.lit(1_000_000.0)) / F.lit(
        1_000_000.0
    )


def bucket_col(vec, n_planes: int, seed: int = 42):
    """Native sign-bit bucket id: bit j = (vec . plane_j) >= 0.

    Plane components are sums of 4 hash-uniform terms (Irwin-Hall ≈
    gaussian), keeping the projection close to rotation-invariant without
    any driver-side randomness or dimension knowledge."""
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        prod = F.transform(
            vec,
            lambda x, i: x.cast("double")
            * sum(_plane_component(i, j, seed, t) for t in range(4)),
        )
        dot = F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.
    No driver round-trip: the hash-derived hyperplanes need no dim."""
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        bucket_col(F.col(vec_col), n_planes, seed).alias("bucket"),
    )
    q = queries.select(
        "query_id", "qvec", bucket_col(F.col("qvec"), n_planes, seed).alias("bucket")
    )
    j = e.join(F.broadcast(q), "bucket").filter(F.col("neighbor_id") != F.col("query_id"))
    sims = j.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )
