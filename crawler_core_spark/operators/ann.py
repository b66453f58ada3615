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

import numpy as np
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


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def bucket_col(vec, planes: list[list[float]]):
    """Native sign-bit bucket id: bit j = (vec . plane_j) >= 0."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
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
    """Approximate top-k: candidates share the query's LSH bucket."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        "query_id", "qvec", bucket_col(F.col("qvec"), planes).alias("bucket")
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
