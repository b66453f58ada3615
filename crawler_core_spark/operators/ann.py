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
- **ivf_topk** — the trained scale path (IVF / inverted-file index):
  k-means centroids fitted driver-side on a FIXED-size deterministic
  sample (training is a model fit, not a data pass), broadcast as
  literals; cell assignment is a native argmax of C dot products; queries
  probe their ``n_probe`` nearest cells and candidates come from a hash
  join on cell id. Recall/cost dial = (n_centroids, n_probe).
  Model lifecycle: ``train_centroids`` -> ``save_centroids`` (snapshot
  store, append-log with ``saved_ver`` latest-wins) -> ``load_centroids``
  -> ``ivf_topk_with_centroids`` — train once offline, probe many, the
  production shape at 10^10 rows (``ivf_topk`` fuses both for the query
  suite).
- **ivfpq_topk** — IVF + product quantization (Jegou et al. TPAMI 2011,
  the FAISS-IVFPQ architecture): the probe join carries only (id, cell,
  ~n_subvectors-byte codes), candidates are ordered by the asymmetric
  approximate cosine computed FROM THE CODES, and only the top
  ``rerank`` per query join back to true vectors for exact scoring —
  at 10^10 rows the working set of the join drops from dim x 4 bytes to
  a handful of bytes per row.
- **lsh_near_dup_pairs** — banded sign-LSH PAIR MINING for the
  embedding near-dup predicate (native expression banding, or
  ``impl="arrow"``: one numpy matmul per Arrow batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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


def _plane_component(i, j: int, seed, t: int):
    """Deterministic pseudo-random hyperplane component in [-1, 1] for
    vector index i, plane j — computed NATIVELY from xxhash64, so no
    hyperplane materialization and no dimension needed at plan-build time
    (the round-1 version did a driver ``.first()`` to learn the dim).
    ``seed`` may be a Column (per-band seeds for near-dup pair mining)."""
    seed_c = seed if isinstance(seed, Column) else F.lit(seed)
    h = F.xxhash64(i.cast("long"), F.lit(j), seed_c, F.lit(t))
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


def arrow_band_buckets_udf(n_planes: int, n_bands: int, seed: int = 42):
    """Arrow-vectorized band buckets: array<float> -> array<long> of
    ``n_bands`` sign-bucket ids in ONE matrix multiply.

    The native ``bucket_col`` keeps everything JVM-side but costs
    ``n_bands * n_planes * 4`` xxhash evaluations PER VECTOR ELEMENT
    (expression-tree depth grows with bands x planes); at 16 bands x 3
    planes that is 192 hash ops per float.  Here the whole banding is
    ``M (batch x dim) @ planes (dim x bands*planes)`` in numpy — one BLAS
    call per Arrow batch — with hyperplanes drawn from a Philox
    counter-based generator keyed ONLY by (seed), so every executor
    process regenerates identical planes with no driver round-trip, no
    broadcast, and no dimension knowledge at plan-build time (dim is read
    from the first batch; planes are cached per process).

    Bucket values differ from the native path's (different plane
    distribution: true gaussians vs Irwin-Hall sums), so recall/precision
    quality gates and the ``n_planes=0`` exhaustive-equivalence property
    are the correctness story — identical to the native variant's.
    """
    if n_planes > 62:
        # 1 << 63 overflows int64 to negative: buckets would be garbage
        # (deterministic garbage, so recall silently degrades instead of
        # failing loudly).  Sign-LSH past ~32 bits per band is useless
        # anyway (P(collision) ~ p^n_planes vanishes).
        raise ValueError(f"n_planes must be <= 62 (int64 bucket ids), got {n_planes}")
    plane_cache: dict[int, "np.ndarray"] = {}

    @pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        zeros = [0] * n_bands
        if n_planes == 0 or len(vecs) == 0:
            return pd.Series([zeros] * len(vecs))
        # NULL / empty / ragged-dimension rows must not kill the stage:
        # mirror the native path (null dot products -> bucket 0, pairs
        # die later at the exact-verify cosine filter) by bucketing each
        # dimension group separately and zero-bucketing bad rows.
        vals = vecs.tolist()
        result: list = [zeros] * len(vals)
        groups: dict[int, list[int]] = {}
        for i, v in enumerate(vals):
            if v is not None and len(v) > 0:
                groups.setdefault(len(v), []).append(i)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for dim, idxs in groups.items():
            planes = plane_cache.get(dim)
            if planes is None:
                rng = np.random.Generator(np.random.Philox(key=np.uint64(seed)))
                planes = rng.standard_normal((dim, n_bands * n_planes))
                plane_cache[dim] = planes
            M = np.asarray([vals[i] for i in idxs], dtype=np.float64)
            bits = (M @ planes) >= 0.0  # (group, n_bands * n_planes)
            buckets = bits.reshape(len(idxs), n_bands, n_planes) @ weights
            for j, i in enumerate(idxs):
                result[i] = buckets[j]
        return pd.Series(result)

    return _buckets


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 2_000,
    impl: str = "native",
) -> DataFrame:
    """Cosine near-dup PAIR MINING at scale — the 10^10-row path for the
    ``embed_near_dup`` predicate (the all-pairs form is oracle-scale only).

    Banding scheme (AND-OR amplification, Indyk-Motwani): each row gets
    ``n_bands`` sign-bucket ids of ``n_planes`` bits each (independent
    per-band hyperplane seeds); a pair is a candidate iff it shares ANY
    band's bucket.  P(candidate) = 1 - (1 - p^n_planes)^n_bands with
    p = 1 - theta/pi — steep around high cosine, so use thresholds
    >= ~0.8 (at low thresholds sign-LSH has no amplification gap).
    Candidates are distinct-deduped, joined back to the vectors, and
    EXACT-verified (cosine >= threshold) — output pairs are never
    approximate, only recall is.

    Scale shape: only (id, 8-byte bucket) rows shuffle through the
    band self-join; vectors re-enter via a candidates-only hash join.
    ``max_bucket`` caps degenerate buckets exactly like the MinHash path
    (operators/dedup.py) — a mega-bucket of b rows is b^2/2 pairs.

    ``n_planes=0`` collapses every row into one bucket per band: the
    candidate set is all-pairs and the output EQUALS the exact all-pairs
    form — the driver-oracle twin (`embed_near_dup_lsh_exhaustive`).

    ``impl``: ``"native"`` (default — all-JVM hash-derived planes, the
    oracle-twin reference) or ``"arrow"`` (one numpy matmul per batch via
    ``arrow_band_buckets_udf`` — the throughput path when bands x planes
    is large; same banding/verify machinery downstream).
    """
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if impl == "arrow":
        bucket_fn = arrow_band_buckets_udf(n_planes, n_bands, seed)
        banded = base.select(
            "id", F.posexplode(bucket_fn(F.col("vec"))).alias("band", "bucket")
        )
    else:
        banded = base.withColumn(
            "band", F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1)))
        ).select(
            "id",
            "band",
            bucket_col(
                F.col("vec"), n_planes, F.xxhash64(F.col("band"), F.lit(seed))
            ).alias("bucket"),
        )
    if max_bucket is not None:
        wb = Window.partitionBy("band", "bucket")
        banded = banded.withColumn("_bn", F.count(F.lit(1)).over(wb)).filter(
            F.col("_bn") <= max_bucket
        )
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = base.select(F.col("id").alias("id_a"), F.col("vec").alias("va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    verified = cand.join(va, "id_a").join(vb, "id_b").select(
        "id_a",
        "id_b",
        F.round(_cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
    )
    return verified.filter(F.col("cos_sim") >= threshold)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN with trained centroids
# ---------------------------------------------------------------------------

def sample_matrix(
    embeddings: DataFrame,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic bounded training sample as a numpy matrix.

    Sampled BY HASH, never by rank: ``orderBy(xxhash64(id), id).limit(n)``
    — physically TakeOrderedAndProject, ONE parallel scan keeping a
    per-partition top-n heap plus a driver merge of n rows per partition;
    no sort shuffle, no total order materialized, and (unlike a
    ``pmod(hash, D) == 0`` filter) no preparatory ``count()`` pass to
    size a modulus, so sampling reads the corpus exactly once.  The hash
    ordering makes the sample an unbiased deterministic subset (an id
    prefix would be ingest-order-biased).  One bounded driver fetch —
    model TRAINING, not a data-path collect; at 10^10 rows the fetch
    stays ~sample rows.  Callers that fit several models (IVF cells + PQ
    codebooks) pass the same matrix to each fit so the corpus is scanned
    once, not once per model."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(int(sample))
        .collect()
    )
    rows = sorted(rows, key=lambda r: r[0])
    return np.array([list(r[1]) for r in rows], dtype=np.float64)


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    x=None,
):
    """Fit k-means centroids on the ``sample_matrix`` sample (``x``: a
    precollected matrix skips the scan — see ``ivfpq_topk``).  Lloyd
    iterations in numpy; empty clusters re-seeded from distinct farthest
    points.  Returns a plain list[list[float]] (broadcast as literals by
    the caller)."""
    if x is None:
        x = sample_matrix(embeddings, sample, id_col, vec_col)
    rng = np.random.default_rng(seed)
    return _kmeans(x, n_centroids, iters, rng).tolist()


def _kmeans(x, k: int, iters: int, rng):
    """Lloyd's k-means in numpy (driver-side model fit on a bounded
    sample); empty clusters re-seeded from DISTINCT farthest points —
    reseeding them all at the single argmax would hand every empty
    cluster the SAME point (duplicate centroids, silently shrinking the
    effective k)."""
    c = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        empties = []
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
            else:
                empties.append(j)
        if empties:
            far = np.argsort(-d.min(axis=1))
            for idx, j in enumerate(empties):
                c[j] = x[far[idx % len(x)]]
    return c


def _dot_lit(vec, plane: list[float]):
    arr = F.array(*[F.lit(float(v)) for v in plane])
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cell_dists(vec, centroids: list[list[float]]):
    """Array of negative squared distances to each centroid (argmax =
    nearest cell), all native: -|v|^2 + 2 v.c - |c|^2; |v|^2 is constant
    across cells so argmax over (2 v.c - |c|^2) suffices."""
    scores = []
    for c in centroids:
        c2 = float(sum(v * v for v in c))
        scores.append(2.0 * _dot_lit(vec, c) - F.lit(c2))
    return F.array(*scores)


CENTROIDS_TABLE = "ann_centroids"
CENTROIDS_SCHEMA = (
    "model_id: string, saved_ver: long, cell: int, centroid: array<double>"
)


def _claim_next_ver(store, table: str, model_id: str) -> tuple[int, int]:
    """Compaction-safe version allocation shared by the model savers:
    next ver = max existing saved_ver + 1 (NOT snapshot_count: the
    snapshot chain collapses to 1 on `cli compact`, which would hand a
    later save a LOWER ver and make loads return stale models).  Returns
    (ver, base); the caller MUST append with ``expected_base=base`` —
    two concurrent trainers would otherwise both claim the same ver and
    a load would collect BOTH snapshots' rows, a doubled corrupt model.
    The losing trainer gets CommitConflictError and should retry."""
    base = store.commit_count()
    ver = 0
    if store.exists(table):
        prev = (
            store.read(table)
            .filter(F.col("model_id") == model_id)
            .agg(F.max("saved_ver"))
            .collect()[0][0]
        )
        ver = 0 if prev is None else int(prev) + 1
    return ver, base


def save_centroids(
    store, centroids, model_id: str = "ivf-default", table: str = CENTROIDS_TABLE
) -> int:
    """Persist a trained IVF model into the snapshot store (the offline
    half of the train-once / probe-many lifecycle: at 10^10 rows training
    runs in its own job and every probe job reloads the same cells).
    Append-log like bulk_scans: re-saves of a model_id are disambiguated
    by ``saved_ver`` at load, never by row order (versioning contract:
    ``_claim_next_ver``)."""
    ver, base = _claim_next_ver(store, table, model_id)
    rows = [
        (model_id, ver, i, [float(v) for v in c]) for i, c in enumerate(centroids)
    ]
    return store.write(
        store.spark.createDataFrame(rows, CENTROIDS_SCHEMA),
        table,
        mode="append",
        expected_base=base,
    )


def load_centroids(
    store, model_id: str = "ivf-default", table: str = CENTROIDS_TABLE
) -> list[list[float]]:
    """Latest saved centroid set for a model (bounded driver fetch:
    n_centroids rows — a model load, not a data collect)."""
    t = store.read(table).filter(F.col("model_id") == model_id)
    latest = t.agg(F.max("saved_ver")).collect()[0][0]
    if latest is None:
        raise KeyError(f"no centroids saved for model {model_id!r}")
    rows = (
        t.filter(F.col("saved_ver") == latest).orderBy("cell").collect()
    )
    return [list(r["centroid"]) for r in rows]


def ivf_topk_with_centroids(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe half of the IVF lifecycle: top-k against a PRETRAINED cell
    model (train_centroids / load_centroids); corpus rows hash-join
    queries on cell id, only probed cells pay the exact cosine."""
    scores = _cell_dists(F.col(vec_col), centroids)
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        (F.array_position(scores, F.array_max(scores)) - 1).cast("int").alias("cell"),
    )
    qs = _cell_dists(F.col("qvec"), centroids)
    # top-n_probe cells per query: sort (score, idx) structs desc, slice
    ranked = F.sort_array(
        F.transform(
            qs, lambda s, i: F.struct(s.alias("s"), i.cast("int").alias("i"))
        ),
        asc=False,
    )
    q = queries.select(
        "query_id",
        "qvec",
        F.explode(
            F.transform(F.slice(ranked, 1, n_probe), lambda x: x["i"])
        ).alias("cell"),
    )
    j = e.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
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


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    sample: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train + probe in one call (query-suite convenience; production
    trains once via train_centroids/save_centroids and probes with
    ivf_topk_with_centroids on load_centroids)."""
    centroids = train_centroids(
        embeddings, n_centroids, sample, seed=seed, id_col=id_col, vec_col=vec_col
    )
    return ivf_topk_with_centroids(
        embeddings, queries, centroids, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted-file pruning + product-quantization candidate
# ordering + exact rerank — the standard 10^10-row ANN architecture
# (Jegou et al., "Product Quantization for Nearest Neighbor Search",
# TPAMI 2011; the FAISS IVFPQ index family)
# ---------------------------------------------------------------------------

def train_pq(
    embeddings: DataFrame,
    n_subvectors: int = 4,
    n_codes: int = 16,
    sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    x=None,
    residual_centroids=None,
):
    """Per-subvector k-means codebooks on the ``sample_matrix`` sample
    (``x``: a precollected matrix skips the scan — ``ivfpq_topk`` passes
    one sample to both the cell and codebook fits so the corpus is
    scanned once, not twice).  Returns ``n_subvectors`` codebooks of
    ``n_codes`` x ``subdim`` centroids (plain lists — broadcast as
    literals by the encoders).

    ``residual_centroids=None`` quantizes the RAW vector; passing the
    trained IVF cell centroids quantizes the IVF RESIDUAL ``x - c(x)``
    instead — classic IVFADC (Jegou et al. TPAMI'11 §IV): residuals have
    the coarse cluster-center component removed, so the same code budget
    spends its resolution on fine structure and recall improves at
    identical bytes/row.  Encoders and scorers must then run in residual
    mode too (``encode_ivfpq`` / ``ivfpq_topk`` ``residual=True``)."""
    if x is None:
        x = sample_matrix(embeddings, sample, id_col, vec_col)
    dim = x.shape[1]
    if dim % n_subvectors:
        raise ValueError(
            f"vector dim {dim} not divisible by n_subvectors={n_subvectors}"
        )
    if residual_centroids is not None:
        c = np.asarray(residual_centroids, dtype=np.float64)
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        x = x - c[d.argmin(axis=1)]
    sub = dim // n_subvectors
    rng = np.random.default_rng(seed)
    return [
        _kmeans(x[:, s * sub:(s + 1) * sub], n_codes, iters, rng).tolist()
        for s in range(n_subvectors)
    ]


def _centroid_lits(centroids) -> Column:
    """array<array<double>> literal of the IVF cell centroids."""
    return F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )


def encode_ivfpq(
    embeddings: DataFrame,
    centroids,
    codebooks,
    residual: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The ingest-time projection (neighbor_id, cell, codes, norm2):
    coarse cell assignment + PQ codes, all native expressions.
    ``residual=True`` codes the IVF residual ``x - c(cell)`` (the
    codebooks must have been trained with ``residual_centroids`` —
    IVFADC); the residual is a ``zip_with`` subtract against the row's
    OWN cell centroid looked up from the literal centroid array, still
    zero-shuffle, zero-python.

    ``norm2`` = |x̃|² of the PQ reconstruction (x̃ = r̃ raw, c + r̃
    residual), computed HERE because ingest has the row's cell centroid
    and reconstruction as plain array expressions — linear-size literals.
    Deriving it at probe time instead needs a per-(cell, code) dot table
    of n_centroids × n_codes doubles per subvector baked into the plan
    (~2M literals at 1024 cells × 256 codes × 8 subvectors — a
    plan-construction hazard, review r5); storing 8 bytes/row at ingest
    deletes that whole expression family from the probe.

    At 10^10 rows this runs once at ingest; ``save_encoded`` persists the
    result so probe jobs never touch the vectors except for rerank."""
    cell_scores = _cell_dists(F.col(vec_col), centroids)
    cell = (
        F.array_position(cell_scores, F.array_max(cell_scores)) - 1
    ).cast("int")
    out = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        cell.alias("cell"),
        F.col(vec_col).alias("_v"),
    )
    code_input = F.col("_v")
    if residual:
        own = F.element_at(_centroid_lits(centroids), F.col("cell") + 1)
        code_input = F.zip_with(
            F.col("_v"), own, lambda a, b: a.cast("double") - b
        )
    out = out.select(
        "neighbor_id", "cell",
        pq_codes_col(code_input, codebooks).alias("codes"),
    )
    norm2 = _pq_recon_norm2(F.col("codes"), codebooks)
    if residual:
        # |c + r̃|² = |c|² + 2 c·r̃ + |r̃|²; c and r̃ are both in hand as
        # array columns, so the cross term is one zip_with dot per row
        own = F.element_at(_centroid_lits(centroids), F.col("cell") + 1)
        recon = F.concat(
            *[
                F.element_at(
                    F.array(
                        *[F.array(*[F.lit(float(v)) for v in code]) for code in cb]
                    ),
                    F.element_at(F.col("codes"), s + 1) + 1,
                )
                for s, cb in enumerate(codebooks)
            ]
        )
        c2 = F.array(*[F.lit(float(sum(v * v for v in c))) for c in centroids])
        cross = F.aggregate(
            F.zip_with(own, recon, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        norm2 = norm2 + F.element_at(c2, F.col("cell") + 1) + 2.0 * cross
    return out.select("neighbor_id", "cell", "codes", norm2.alias("norm2"))


def pq_codes_col(vec, codebooks) -> Column:
    """array<int> of per-subvector nearest-code ids — all native (the
    same argmax-over-literal-centroids expression as IVF cell
    assignment, per subvector slice).  At 10^10 rows this encoder runs
    once at ingest and the (id, cell, codes, norm2) projection — ~n_subvectors
    bytes of payload — is what the probe join ever shuffles."""
    sub = len(codebooks[0][0])
    cols = []
    for s, cb in enumerate(codebooks):
        vs = F.slice(vec, s * sub + 1, sub)
        scores = _cell_dists(vs, cb)
        cols.append((F.array_position(scores, F.array_max(scores)) - 1).cast("int"))
    return F.array(*cols)


def _adc_score(qvec, codes, codebooks) -> Column:
    """Asymmetric-distance approximation of dot(q, x): per subvector, the
    dot of the query slice with the candidate's SELECTED code centroid
    (looked up from the literal codebook array) — O(dim) per pair like an
    exact dot, but computed from the ~n_subvectors-byte codes, never the
    candidate's full vector."""
    sub = len(codebooks[0][0])
    terms = []
    for s, cb in enumerate(codebooks):
        cb_arr = F.array(*[F.array(*[F.lit(float(v)) for v in code]) for code in cb])
        chosen = F.element_at(cb_arr, F.element_at(codes, s + 1) + 1)
        qs = F.slice(qvec, s * sub + 1, sub)
        terms.append(
            F.aggregate(
                F.zip_with(qs, chosen, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _pq_recon_norm2(codes, codebooks) -> Column:
    """|x̃|² of the PQ-reconstructed vector = sum over subvectors of the
    chosen code centroid's squared norm — a pure literal lookup per code
    (subvector cross terms are zero: the reconstruction is a
    concatenation, not a sum)."""
    out = F.lit(0.0)
    for s, cb in enumerate(codebooks):
        norms = F.array(
            *[F.lit(float(sum(v * v for v in code))) for code in cb]
        )
        out = out + F.element_at(norms, F.element_at(codes, s + 1) + 1)
    return out


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    n_subvectors: int = 4,
    n_codes: int = 16,
    rerank: int | None = 64,
    sample: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ top-k: coarse cells prune the corpus (n_probe of
    n_centroids), PQ codes order the survivors by approximate dot
    product, the top ``rerank`` per query join BACK to the true vectors
    for exact cosine, and the final top-k is exact over that candidate
    set.

    Scale shape: the probe join carries (neighbor_id, cell, codes, norm2) —
    id + ~n_subvectors bytes per corpus row, NOT the vector; full
    vectors are touched only for ``rerank`` rows per query (the
    join-back is a hash join on id against the corpus, pruned to
    candidates).  ``rerank=None`` disables the PQ cut (every probed
    candidate is exactly scored) — with ``n_probe=n_centroids`` the
    result then EQUALS brute force, the driver-oracle twin.

    ``residual=True`` is classic IVFADC: codebooks quantize the IVF
    residual (see ``train_pq``) and the approximate ordering adds the
    per-(query, cell) centroid dot back in — better recall at identical
    bytes/row.

    Like ``ivf_topk`` this fuses train + encode + probe for the query
    suite; production trains once (``train_centroids`` + ``train_pq`` +
    ``save_pq``), persists the (id, cell, codes, norm2) projection at ingest
    (``save_encoded``), and probes many (``ivfpq_topk_with_models``)."""
    x = sample_matrix(embeddings, sample, id_col, vec_col)
    centroids = train_centroids(embeddings, n_centroids, seed=seed, x=x)
    codebooks = train_pq(
        embeddings, n_subvectors, n_codes, seed=seed, x=x,
        residual_centroids=centroids if residual else None,
    )
    enc = encode_ivfpq(embeddings, centroids, codebooks, residual, id_col, vec_col)
    return _ivfpq_probe(
        enc, embeddings, queries, centroids, codebooks,
        k=k, n_probe=n_probe, rerank=rerank, residual=residual,
        id_col=id_col, vec_col=vec_col,
    )


def _ivfpq_probe(
    enc: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    centroids,
    codebooks,
    k: int = 10,
    n_probe: int = 2,
    rerank: int | None = 64,
    residual: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe half shared by the fused and the persisted-model paths:
    ``enc`` is the (neighbor_id, cell, codes, norm2) projection — fresh from
    ``encode_ivfpq`` or reloaded via ``load_encoded``."""
    qs = _cell_dists(F.col("qvec"), centroids)
    ranked = F.sort_array(
        F.transform(
            qs, lambda s, i: F.struct(s.alias("s"), i.cast("int").alias("i"))
        ),
        asc=False,
    )
    q = queries.select(
        "query_id",
        "qvec",
        F.explode(
            F.transform(F.slice(ranked, 1, n_probe), lambda x: x["i"])
        ).alias("cell"),
    )
    if residual:
        # per-(query, probed-cell) centroid dot — computed ONCE on the
        # tiny exploded query frame (n_queries × n_probe rows), carried
        # through the broadcast, never per candidate
        qc = F.array(*[_dot_lit(F.col("qvec"), c) for c in centroids])
        q = q.withColumn("_qc", F.element_at(qc, F.col("cell") + 1))
    cand = enc.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    if rerank is not None:
        # rank by approximate COSINE, not raw dot: the exact metric is
        # cosine and corpus norms vary, so the ADC dot alone misorders
        # candidates; |x̃|² was computed at ENCODE time and rides the
        # projection as the 8-byte norm2 column (|q| is constant per
        # query — it cannot change the ordering).  The window exchange
        # carries ONLY (query_id, neighbor_id, approx) — qvec/codes are
        # projected away before the shuffle and qvec is re-joined from
        # the broadcast query set after the cut (shipping qvec per
        # candidate row would cost dim x 8 bytes per candidate — the
        # exact weight the codes-only join eliminates).  Residual mode
        # (IVFADC): x̃ = c + r̃, so dot(q, x̃) = dot(q, c) [query-side
        # _qc] + ADC(q, r̃); the |c|² + 2 c·r̃ cross terms are already
        # inside norm2.
        num = _adc_score(F.col("qvec"), F.col("codes"), codebooks)
        den2 = F.col("norm2")
        if residual:
            num = num + F.col("_qc")
        approx = num / F.sqrt(F.greatest(den2, F.lit(1e-12)))
        wa = Window.partitionBy("query_id").orderBy(
            F.desc("approx"), F.asc("neighbor_id")
        )
        cand = (
            cand.select("query_id", "neighbor_id", approx.alias("approx"))
            .withColumn("_ar", F.row_number().over(wa))
            .filter(F.col("_ar") <= int(rerank))
        )
    # exact rerank: only now touch the true vectors, candidates only;
    # qvec comes back from the (broadcast-small) query set, never from
    # the candidate shuffle
    vecs = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    # no distinct needed: each corpus row lives in exactly one cell and
    # each query probes distinct cells, so (query, neighbor) is unique
    sims = (
        cand.select("query_id", "neighbor_id")
        .join(F.broadcast(queries.select("query_id", "qvec")), "query_id")
        .join(vecs, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


# ---------------------------------------------------------------------------
# PQ model lifecycle (VERDICT r4 #3): train-once / encode-at-ingest /
# probe-many.  At 10^10 rows the codebooks are fit in an offline job,
# the (id, cell, codes, norm2) projection is written as each ingest batch
# commits, and probe jobs read ONLY models + projection — the vector
# column is touched for rerank rows alone.
# ---------------------------------------------------------------------------

PQ_TABLE = "ann_pq_codebooks"
PQ_SCHEMA = (
    "model_id: string, saved_ver: long, subvector: int, code: int, "
    "centroid: array<double>, residual: boolean"
)
ENCODED_TABLE = "ann_pq_encoded"


def save_pq(
    store,
    codebooks,
    model_id: str = "ivfpq-default",
    residual: bool = False,
    table: str = PQ_TABLE,
) -> int:
    """Persist PQ codebooks beside ``save_centroids``; returns the
    ``saved_ver`` written (pass it to ``save_encoded`` so the projection
    is pinned to its model generation).  The ``residual`` flag is MODEL
    METADATA — a probe must know whether codes quantize raw vectors or
    IVF residuals, so it round-trips with the codebooks instead of being
    a caller convention.  Same versioning contract as ``save_centroids``
    (shared ``_claim_next_ver``): max(saved_ver)+1, compaction-safe,
    read-max-then-append guarded by ``expected_base``."""
    ver, base = _claim_next_ver(store, table, model_id)
    rows = [
        (model_id, ver, s, i, [float(v) for v in code], bool(residual))
        for s, cb in enumerate(codebooks)
        for i, code in enumerate(cb)
    ]
    store.write(
        store.spark.createDataFrame(rows, PQ_SCHEMA),
        table,
        mode="append",
        expected_base=base,
    )
    return ver


def load_pq(
    store, model_id: str = "ivfpq-default", table: str = PQ_TABLE
) -> tuple[list, bool, int]:
    """Latest codebooks for a model: (codebooks, residual, saved_ver) —
    a bounded driver fetch of n_subvectors × n_codes rows."""
    t = store.read(table).filter(F.col("model_id") == model_id)
    latest = t.agg(F.max("saved_ver")).collect()[0][0]
    if latest is None:
        raise KeyError(f"no PQ codebooks saved for model {model_id!r}")
    rows = (
        t.filter(F.col("saved_ver") == latest)
        .orderBy("subvector", "code")
        .collect()
    )
    n_sub = max(r["subvector"] for r in rows) + 1
    books: list[list] = [[] for _ in range(n_sub)]
    residual = bool(rows[0]["residual"])
    for r in rows:
        books[r["subvector"]].append(list(r["centroid"]))
    return books, residual, int(latest)


def save_encoded(
    store,
    embeddings: DataFrame,
    centroids,
    codebooks,
    residual: bool = False,
    model_id: str = "ivfpq-default",
    ver: int = 0,
    table: str = ENCODED_TABLE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Encode-at-ingest: append this batch's (id, cell, codes, norm2) projection
    stamped with (model_id, saved_ver).  Plain append — the version was
    assigned by ``save_pq``, so there is no read-then-write race here
    (unlike the trainers); concurrent ingest batches append disjoint
    rows.  Partitioned by cell: a probe of n_probe cells prunes the scan
    to those directories."""
    enc = encode_ivfpq(embeddings, centroids, codebooks, residual, id_col, vec_col)
    return store.commit(
        {
            table: (
                "append",
                store.stage(
                    enc.select(
                        F.lit(model_id).alias("model_id"),
                        F.lit(int(ver)).cast("long").alias("saved_ver"),
                        "neighbor_id",
                        "cell",
                        "codes",
                        "norm2",
                    ),
                    table,
                    partition_by=["cell"],
                ),
            )
        }
    )


def load_encoded(
    store,
    model_id: str = "ivfpq-default",
    ver: int | None = None,
    table: str = ENCODED_TABLE,
) -> DataFrame:
    """The persisted projection for (model_id, ver) — ver=None loads the
    newest generation present.  Runs up to two bounded validation jobs
    (max(saved_ver) when ver=None, plus the norm2 NULL probe below);
    the returned DataFrame itself is lazy and the model_id/saved_ver
    filters prune on parquet stats."""
    t = store.read(table).filter(F.col("model_id") == model_id)
    if ver is None:
        ver = t.agg(F.max("saved_ver")).collect()[0][0]
        if ver is None:
            raise KeyError(f"no encoded rows for model {model_id!r}")
    out = t.filter(F.col("saved_ver") == int(ver)).select(
        "neighbor_id", "cell", "codes", "norm2"
    )
    # guard the projection contract LOUDLY (the corpus_sigs convention):
    # rows encoded before norm2 existed surface as NULL through the
    # union-with-missing-columns read path — den2 would silently collapse
    # to the 1e-12 floor and the rerank degrade to raw-dot ordering.
    # Cheap at scale: the IsNull predicate pushes down to parquet
    # null-count stats, so files with no NULLs cost only their footers.
    sample = out.filter(F.col("norm2").isNull()).limit(1).collect()
    if sample:
        raise ValueError(
            f"encoded projection for model {model_id!r} ver {ver} has rows "
            "with no norm2 (written by an older encoder) — re-encode with "
            "save_encoded before probing"
        )
    return out


def ivfpq_topk_with_models(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids,
    codebooks,
    enc: DataFrame,
    residual: bool = False,
    k: int = 10,
    n_probe: int = 2,
    rerank: int | None = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe-only IVF-PQ: pretrained cells (``load_centroids``) +
    codebooks (``load_pq``) + persisted projection (``load_encoded``).
    ``embeddings`` supplies true vectors for the exact rerank only —
    nothing in the candidate generation touches it."""
    return _ivfpq_probe(
        enc, embeddings, queries, centroids, codebooks,
        k=k, n_probe=n_probe, rerank=rerank, residual=residual,
        id_col=id_col, vec_col=vec_col,
    )
