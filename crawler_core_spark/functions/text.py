"""Text-analysis functions for a large-scale training-data pipeline [EXT].

The reference has no text analytics; these are the corpus-hygiene
operators a 100 TB crawl corpus needs (BASELINE "training-data pipeline"
mandate): tokenization, quality scoring, language-ID heuristic, document
fingerprinting, simhash.  Everything — including simhash — stays in
native ``pyspark.sql.functions`` (JVM, whole-stage codegen); there is no
Python in any of these plans.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "and", "of", "to")

# tiny per-language marker sets for the n-gram/stopword lang-ID heuristic
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
}


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokenization; native split (JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count_col(text: str | Column = "text") -> Column:
    return F.size(tokens_col(text)).cast("long")


def count_tokens_in(tokens: Column, words: tuple[str, ...]) -> Column:
    """# tokens ∈ words — native higher-order filter, no UDF."""
    return F.size(F.filter(tokens, lambda t: t.isin(*words))).cast("long")


def stopword_ratio_col(text: str | Column = "text") -> Column:
    toks = tokens_col(text)
    n = F.size(toks).cast("double")
    stop = count_tokens_in(toks, STOPWORDS).cast("double")
    return F.when(n > 0, stop / n).otherwise(F.lit(0.0))


def quality_score_col(text: str | Column = "text") -> Column:
    """Deterministic [0,1] quality proxy: long-enough docs with low stopword
    density score higher. (The exact formula is the pinned contract, not a
    linguistic claim.)"""
    n = token_count_col(text).cast("double")
    return (1.0 - stopword_ratio_col(text)) * F.least(F.lit(1.0), n / F.lit(100.0))


def lang_id_col(text: str | Column = "text") -> Column:
    """Marker-word language ID with deterministic tie-break en > de > fr;
    'und' (undetermined) when no marker hits."""
    toks = tokens_col(text)
    s_en = count_tokens_in(toks, LANG_MARKERS["en"])
    s_de = count_tokens_in(toks, LANG_MARKERS["de"])
    s_fr = count_tokens_in(toks, LANG_MARKERS["fr"])
    return (
        F.when((s_en >= s_de) & (s_en >= s_fr) & (s_en > 0), F.lit("en"))
        .when((s_de >= s_fr) & (s_de > 0), F.lit("de"))
        .when(s_fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def fingerprint_col(text: str | Column = "text") -> Column:
    """64-bit document fingerprint: xxhash64 of the canonical token stream
    (lowercased, whitespace-normalized) — native, content-addressed."""
    return F.xxhash64(F.array_join(tokens_col(F.lower(F.col(text) if isinstance(text, str) else text)), " "))


def winnow_fingerprints_col(
    text: str | Column = "text", k: int = 4, window: int = 5, base: int = 257
) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — the
    rolling-hash dedup/decontamination primitive): hash every char
    k-gram with a polynomial rolling hash, then keep the minimum of each
    ``window`` consecutive hashes; the distinct minima are the document's
    fingerprint set.  Guarantees a shared fingerprint for any match of
    length >= window + k - 1 between two documents.

    Entirely native (sequence -> transform -> slice -> array_min, one
    whole-stage-codegen projection, no shuffle, no Python) and expressed
    in closed form so a SQL oracle computes the identical values: the
    gram hash is sum(code(c_{i+j}) * base^(k-1-j)), exact in int64 — no
    modulus, no engine-specific hash function.
    """
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)

    def gram(i):
        h = F.lit(0).cast("long")
        for j in range(k):
            h = h + F.ascii(c.substr(i + F.lit(j), F.lit(1))).cast("long") * F.lit(
                base ** (k - 1 - j)
            )
        return h

    empty = F.array().cast("array<bigint>")
    # guard: F.sequence(1, m) DESCENDS when m < 1, so short docs must
    # short-circuit to an empty gram/window list explicitly
    hs = F.when(n >= k, F.transform(F.sequence(F.lit(1), n - k + 1), gram)).otherwise(
        empty
    )
    n_h = F.size(hs)
    fps = F.when(
        n_h >= window,
        F.transform(
            F.sequence(F.lit(1), n_h - window + 1),
            lambda j: F.array_min(F.slice(hs, j, window)),
        ),
    ).otherwise(empty)
    return F.array_distinct(fps)


# ---------------------------------------------------------------------------
# simhash — all-JVM: explode -> xxhash64 per token -> 64 bit-sum aggregates
# ---------------------------------------------------------------------------

def simhash_df(df, id_col: str, text_col: str):
    """64-bit simhash per document, entirely native (whole-stage codegen,
    no Python in the plan): explode tokens -> ``xxhash64(token)`` -> per
    bit j, sum(2*bit_j - 1) > 0 decides bit j of the fingerprint.

    The shuffle carries 65 longs per (doc, partial) with map-side combine
    — at 10^10 docs this is the linear all-JVM path (the previous pandas
    UDF ran a per-token pure-Python FNV loop: the round-1 scale offender).
    Tokenless/empty docs fingerprint to 0.  Returns DataFrame[id, simhash].
    """
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))
    hashed = toks.withColumn("h", F.xxhash64(F.col("tok")))
    aggs = [
        F.sum(F.expr(f"shiftrightunsigned(h, {j}) & 1")).alias(f"b{j}")
        for j in range(64)
    ] + [F.count(F.lit(1)).alias("n")]
    per_doc = hashed.groupBy(id_col).agg(*aggs)
    # bit j set iff acc_j = 2*b_j - n > 0; bit 63 contributes the sign
    # value -2^63 (signed int64 two's complement).
    terms = [
        F.when(
            F.col(f"b{j}") * 2 > F.col("n"),
            F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(64)
    ]
    val = terms[0]
    for t in terms[1:]:
        val = val + t
    fp = per_doc.select(F.col(id_col), val.alias("simhash"))
    # left join back: docs with zero tokens (empty/whitespace) -> 0
    return (
        df.select(id_col)
        .join(fp, id_col, "left")
        .select(F.col(id_col), F.coalesce(F.col("simhash"), F.lit(0)).alias("simhash"))
    )


def _simhash_tokens(tok_lists, hash_fn=None) -> list[int]:
    """Pure-Python simhash reference for pytest (NOT in any Spark plan).

    ``hash_fn`` defaults to FNV-1a (PYTHONHASHSEED-independent); tests of
    the native path pass the Spark-computed xxhash64 per token so the
    bit-aggregation math is verified independently of the hash function.
    """
    hash_fn = hash_fn or _str_hash64
    out = []
    for toks in tok_lists:
        if toks is None or len(toks) == 0:
            out.append(0)
            continue
        hs = np.array([hash_fn(t) for t in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        acc = (2 * bits - 1).sum(axis=0)
        val = 0
        for j in range(64):
            if acc[j] > 0:
                val |= 1 << j
        out.append(val - (1 << 64) if val >= (1 << 63) else val)
    return out


def _str_hash64(s: str) -> int:
    """Deterministic 64-bit string hash (FNV-1a), independent of
    PYTHONHASHSEED; used only by the pure-Python pytest reference."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hamming64_col(a: Column, b: Column) -> Column:
    """Native popcount of XOR via bit_count (Spark >= 3.3)."""
    return F.bit_count(a.bitwiseXOR(b))
