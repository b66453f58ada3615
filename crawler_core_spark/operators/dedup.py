"""Document deduplication operators for the training-data pipeline [EXT].

The frontier's URL-seen set (url_seen.py) dedups by exact canonical key;
a 100 TB text/image corpus additionally needs *near*-dup detection.
Scale-first designs:

- **exact_dedup** — hash-groupBy: one shuffle on the content hash, never
  on the content itself.
- **minhash_lsh_pairs** — shingle -> 16 xxhash64 permutations -> min per
  doc (all JVM: explode + groupBy(min), no Python) -> band signatures ->
  self-join on (band, sig). Only (id, 8-byte sigs) shuffle; candidate
  pairs are verified with exact token-Jaccard *on the candidates only*.
  At 10^10 docs this is the standard linear-ish near-dup pipeline.
- **simhash_pairs** — 64-bit simhash per doc (all-JVM: explode ->
  xxhash64 -> 64 bit-sum aggregates, functions/text.py:simhash_df),
  near-dups = Hamming <= t via banded equality join on 16-bit chunks
  (native bit ops), never an all-pairs comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_core_spark.functions.text import simhash_df, tokens_col


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Survivor per exact-content group (lowest id wins), with group size."""
    key = F.xxhash64(F.col(text_col))
    w = Window.partitionBy("dup_key").orderBy(id_col)
    return (
        df.select(id_col, key.alias("dup_key"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("group_n", F.count(F.lit(1)).over(Window.partitionBy("dup_key")))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("group_n").cast("long").alias("group_n"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16
) -> DataFrame:
    """(id, perm, minhash) -> pivoted (id, sig ARRAY<LONG>) — all native.

    Shingles = distinct tokens (word 1-shingles; swap tokens_col for an
    n-gram generator for char shingles). Permutation i's hash =
    xxhash64(shingle, i): one explode, one groupBy(id, perm).min — the
    shuffle carries only (id, 2×8 bytes).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens_col(text_col))).alias("tok")
    )
    perms = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("perm")
    hashed = toks.select(id_col, perms, F.col("tok")).withColumn(
        "h", F.xxhash64(F.col("tok"), F.col("perm"))
    )
    return (
        hashed.groupBy(id_col, "perm")
        .agg(F.min("h").alias("mh"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("perm", "mh"))).alias("recs"))
        .select(id_col, F.col("recs.mh").alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.0,
    max_bucket: int | None = 64,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) with estimated + exact Jaccard.

    rows/band = n_hashes // bands; a pair is a candidate iff some band's
    signature slice matches exactly. Candidates (tiny vs all-pairs) are
    then exact-verified by token-set Jaccard — join back to tokens only
    for candidates.

    ``max_bucket`` drops band buckets with more members than the cap
    before pair generation: a bucket of b docs contributes b^2/2 pairs, so
    one degenerate mega-bucket (boilerplate, empty docs) turns the join
    quadratic. Capped buckets are near-identical clusters anyway — dedup
    them via the exact hash path. NOTE: this bounds the join at 10^10-doc
    scale; coverage loss is the documented trade, not silent truncation.
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n_hashes)
    banded = sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "band_sig",
        F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("sig"), F.col("band") * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
            ),
            F.col("band"),
        ),
    )
    if max_bucket is not None:
        wb = Window.partitionBy("band", "band_sig")
        banded = (
            banded.withColumn("_bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("band"), F.col("band_sig"), F.col("sig").alias("sig_a")
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("band"), F.col("band_sig"), F.col("sig").alias("sig_b")
    )
    cand = (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.first("sig_a").alias("sig_a"), F.first("sig_b").alias("sig_b"))
    )
    est = F.round(
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(float(n_hashes)),
        6,
    )
    cand = cand.select("id_a", "id_b", est.alias("est_jaccard"))

    toks = df.select(F.col(id_col), F.array_distinct(tokens_col(text_col)).alias("toks"))
    cand = (
        cand.join(toks.select(F.col(id_col).alias("id_a"), F.col("toks").alias("ta")), "id_a")
        .join(toks.select(F.col(id_col).alias("id_b"), F.col("toks").alias("tb")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("ta", "tb"))
                / F.size(F.array_union("ta", "tb")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "est_jaccard", "jaccard")
    )
    return cand


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """All-JVM simhash (explode -> xxhash64 -> 64 bit-sum aggregates); no
    pandas UDF in the plan (the round-1 per-token Python loop is gone)."""
    return simhash_df(df, id_col, text_col)


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int | None = 256,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance via 16-bit chunk banding:
    two hashes within Hamming<=3 share at least one of 4 exact 16-bit
    chunks (pigeonhole); candidates join on (chunk_idx, chunk), then the
    native bit_count verifies. No all-pairs product.

    With max_hamming > 3 the chunk guarantee weakens (recall drops); the
    exact filter stays correct for whatever candidates banding yields.
    """
    fp = simhash_fingerprints(df, id_col, text_col)
    chunks = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("ci"),
    ).withColumn(
        "chunk", F.expr("shiftrightunsigned(simhash, ci * 16) & 65535")
    )
    if max_bucket is not None:
        wb = Window.partitionBy("ci", "chunk")
        chunks = (
            chunks.withColumn("_bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    a = chunks.select(F.col(id_col).alias("id_a"), "ci", "chunk", F.col("simhash").alias("sh_a"))
    b = chunks.select(F.col(id_col).alias("id_b"), "ci", "chunk", F.col("simhash").alias("sh_b"))
    return (
        a.join(b, ["ci", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.first("sh_a").alias("sh_a"), F.first("sh_b").alias("sh_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )
