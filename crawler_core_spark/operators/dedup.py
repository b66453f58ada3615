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


def _minhash_banded(
    sigs: DataFrame, id_col: str, rows_per_band: int, bands: int
) -> DataFrame:
    """(id, sig) -> (id, sig, band, band_sig): one row per band, band_sig
    = hash of that band's signature slice (the LSH bucket key)."""
    return sigs.select(
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


def corpus_token_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, toks array<string>) verify-stage projection — persist this
    alongside ``minhash_signatures`` to make incremental dedup O(new)."""
    return docs.select(
        F.col(id_col), F.array_distinct(tokens_col(text_col)).alias("toks")
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    max_bucket: int | None = 64,
    corpus_sigs: DataFrame | None = None,
    corpus_tokens: DataFrame | None = None,
    new_sigs: DataFrame | None = None,
    new_tokens: DataFrame | None = None,
) -> DataFrame:
    """Which NEW docs near-duplicate the EXISTING corpus — the ingest-time
    dedup pass of a training-data pipeline (today's crawl batch vs the
    10^10-doc reference collection).  Returns (new_id, corpus_id, jaccard)
    for every cross pair with exact token-set Jaccard >= ``threshold``.

    Scale shape: candidates come from a band-bucket hash join of NEW x
    CORPUS only — the corpus is NEVER self-joined, and only (id, 8-byte
    band_sig) rows shuffle.  THE PRODUCTION FORM PASSES PRECOMPUTED
    PROJECTIONS: ``corpus_sigs`` = a persisted ``minhash_signatures``
    output (id, sig — ~136 bytes/doc at 16 hashes) and ``corpus_tokens``
    = a persisted ``corpus_token_sets`` output (id, toks) for the verify
    join; with both supplied, ``corpus`` is unused and the per-batch cost
    is O(|new| x bands) plus the bucket join — recomputing either
    projection from corpus text every batch would make each ingest pass
    O(corpus), defeating the operator.  ``corpus`` (id, text) alone is
    the convenience form (oracle twin / ad-hoc use): both projections are
    derived on the fly.  ``max_bucket`` caps degenerate buckets on the
    CORPUS side (the big side; a boilerplate bucket of b docs fans every
    colliding new doc to b candidates).  Verification is exact (token
    join-back), so precision is 1.0 by construction — banding only
    affects recall.

    ``new_sigs`` / ``new_tokens``: callers that ALSO persist this batch's
    projections (the crawl engine appends them to the corpus tables in the
    same commit) pass them in so the batch's text is hashed/tokenized
    once, not once for dedup and once for persistence."""
    if corpus_sigs is None:
        if corpus is None:
            raise ValueError("pass corpus (id, text) or corpus_sigs")
        corpus_sigs = minhash_signatures(corpus, id_col, text_col, n_hashes)
    else:
        # Guard the persisted-projection contract LOUDLY: a corpus_sigs
        # table written with a different n_hashes makes F.slice produce
        # short/empty band slices, band_sig degenerates, and cross-corpus
        # recall silently collapses with no error.  One-row sample check
        # (limit(1) scan of the projection — cheap, no shuffle).
        sample = corpus_sigs.select(F.size(F.col("sig")).alias("n")).limit(1).collect()
        if sample and sample[0]["n"] != n_hashes:
            raise ValueError(
                f"corpus_sigs signature length {sample[0]['n']} != n_hashes "
                f"{n_hashes} — the persisted minhash_signatures projection was "
                "built with a different n_hashes; rebuild it or pass the "
                "matching n_hashes"
            )
    if corpus_tokens is None:
        if corpus is None:
            raise ValueError("pass corpus (id, text) or corpus_tokens")
        corpus_tokens = corpus_token_sets(corpus, id_col, text_col)
    rows_per_band = n_hashes // bands
    if new_sigs is None:
        new_sigs = minhash_signatures(new_docs, id_col, text_col, n_hashes)
    nb = _minhash_banded(
        new_sigs, id_col, rows_per_band, bands,
    ).select(F.col(id_col).alias("new_id"), "band", "band_sig")
    cb = _minhash_banded(
        corpus_sigs, id_col, rows_per_band, bands,
    ).select(F.col(id_col).alias("corpus_id"), "band", "band_sig")
    if max_bucket is not None:
        wb = Window.partitionBy("band", "band_sig")
        cb = (
            cb.withColumn("_bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    cand = (
        nb.join(cb, ["band", "band_sig"])
        # a new doc whose id ALREADY EXISTS in the corpus is the same
        # document re-observed (e.g. a multi-scan crawl re-fetching a
        # url_key) — not a near-dup pair; without this a re-crawl flags
        # (K, K) jaccard 1.0 against itself (review r5)
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id")
        .distinct()
    )
    if new_tokens is None:
        new_tokens = corpus_token_sets(new_docs, id_col, text_col)
    tn = new_tokens.select(
        F.col(id_col).alias("new_id"), F.col("toks").alias("ta")
    )
    tc = corpus_tokens.select(
        F.col(id_col).alias("corpus_id"), F.col("toks").alias("tb")
    )
    return (
        cand.join(tn, "new_id")
        .join(tc, "corpus_id")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("ta", "tb"))
                / F.size(F.array_union("ta", "tb")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
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
    banded = _minhash_banded(sigs, id_col, rows_per_band, bands)
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


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, token_hash=None
) -> DataFrame:
    """All-JVM simhash (explode -> xxhash64 -> 64 bit-sum aggregates); no
    pandas UDF in the plan (the round-1 per-token Python loop is gone).
    ``token_hash`` swaps the per-token hash (exact-oracle twin)."""
    return simhash_df(df, id_col, text_col, token_hash=token_hash)


def hamming_pairs(
    fp: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    max_bucket: int | None = 256,
) -> DataFrame:
    """Near-dup pairs by Hamming distance over ANY 64-bit fingerprint
    column, via 16-bit chunk banding: two fingerprints within Hamming<=3
    share at least one of 4 exact 16-bit chunks (pigeonhole), so
    candidates join on (chunk_idx, chunk) and the native bit_count
    verifies — never an all-pairs product.  For ``max_hamming < 4`` with
    ``max_bucket=None`` the banding is recall-COMPLETE: the result is
    EXACT, not approximate (the multi-index Hamming scheme of Manku et
    al., WWW'07 simhash dedup).

    Scale shape: only (id, fp, 2-byte chunk) rows shuffle; ``max_bucket``
    caps degenerate buckets (a bucket of b rows is b^2/2 candidate pairs)
    exactly like the MinHash / sign-LSH paths — a documented recall trade
    at corpus scale.  With max_hamming > 3 the chunk guarantee weakens
    (recall drops); the exact filter stays correct for whatever
    candidates banding yields.
    """
    chunks = fp.select(
        F.col(id_col),
        F.col(fp_col).alias("_fp"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("ci"),
    ).withColumn(
        "chunk", F.expr("shiftrightunsigned(_fp, ci * 16) & 65535")
    )
    if max_bucket is not None:
        wb = Window.partitionBy("ci", "chunk")
        chunks = (
            chunks.withColumn("_bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    a = chunks.select(F.col(id_col).alias("id_a"), "ci", "chunk", F.col("_fp").alias("fp_a"))
    b = chunks.select(F.col(id_col).alias("id_b"), "ci", "chunk", F.col("_fp").alias("fp_b"))
    return (
        a.join(b, ["ci", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.first("fp_a").alias("fp_a"), F.first("fp_b").alias("fp_b"))
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int | None = 256,
    token_hash=None,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance (see hamming_pairs for
    the banding scheme and its exactness guarantee).  ``token_hash``
    swaps the per-token hash; every other step is identical — the
    exact-oracle twin runs THIS function with the SQL-computable
    polynomial hash."""
    fp = simhash_fingerprints(df, id_col, text_col, token_hash=token_hash)
    return hamming_pairs(fp, id_col, "simhash", max_hamming, max_bucket)


def phash_near_dup(
    images: DataFrame,
    max_hamming: int = 2,
    max_bucket: int | None = 256,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """Perceptual near-duplicate IMAGE pairs over the crawl corpus
    (input table shape: image_id, bytes, w, h, fmt, caption,
    phash:int64).  The 64-bit mean-threshold phash is computed once at
    ingest by the decode gate (functions/image.py:decode_validate_udf),
    so this never touches ``bytes`` — only (image_id, phash) rows ever
    shuffle, which is what makes visual dedup tractable over a 100 TB
    byte corpus.  Banded-Hamming exact for max_hamming < 4 (see
    hamming_pairs); rows whose decode failed carry a null phash and are
    excluded up front."""
    fp = images.select(id_col, phash_col).filter(F.col(phash_col).isNotNull())
    return hamming_pairs(fp, id_col, phash_col, max_hamming, max_bucket)


def decontaminate_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 5,
    min_shared: int = 3,
) -> DataFrame:
    """Train/test DECONTAMINATION — which corpus docs share winnowing
    fingerprints with a benchmark/eval set (the pass every LLM training
    pipeline runs before a corpus ships; Schleimer et al. SIGMOD'03 is
    the guarantee: any shared substring of length >= window + k - 1
    yields a shared fingerprint).  Returns (doc_id, bench_id, n_shared)
    for pairs sharing >= ``min_shared`` distinct fingerprints.

    Scale shape: both sides reduce to (id, fp) 16-byte rows; the
    benchmark side is broadcast (eval sets are tiny next to a 100 TB
    corpus) so the fingerprint join never shuffles the corpus — each
    corpus partition streams against the in-memory benchmark fp table,
    and only matching (doc, bench) pairs reach the count aggregate."""
    from crawler_core_spark.functions.text import winnow_fingerprints_pandas_df

    def fps(frame, out_id):
        return winnow_fingerprints_pandas_df(
            frame, id_col=id_col, text_col=text_col, k=k, window=window
        ).select(F.col(id_col).alias(out_id), F.explode("fps").alias("fp"))

    # fps lists are distinct per doc by construction, so count(*) per
    # pair == count of DISTINCT shared fingerprints
    return (
        fps(docs, "doc_id")
        .join(F.broadcast(fps(benchmark, "bench_id")), "fp")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )
