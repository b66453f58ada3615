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


# explicit whitespace class, NOT \s: Java regex counts \x0B as
# whitespace where DuckDB's RE2 does not, so an oracle twin over a
# document containing one would value-mismatch (same engine-identity
# rule as BPE_PRETOKEN_RE below)
WS_RE = r"[ \t\n\r\f]+"


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokenization; native split (JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), WS_RE)


def token_count_col(text: str | Column = "text") -> Column:
    return F.size(tokens_col(text)).cast("long")


# GPT-2-style BPE PRE-tokenizer (ASCII form), the second token counter the
# pipeline mandate lists beside whitespace: contraction suffixes, space-
# prefixed letter runs / digit runs / punctuation runs, whitespace runs.
# Deliberately lookahead-free and EXPLICITLY-classed so the SAME pattern
# runs identically in Spark (java.util.regex), DuckDB (RE2) and python
# re — the oracle gate depends on that three-way agreement.  NO \s: the
# three engines disagree on its members (Java includes \x0B, RE2 does
# not, python re is Unicode-aware and adds e.g. U+00A0 — review r5 pass
# 3, confirmed by execution), so the whitespace class is spelled out.
# The real GPT-2 pattern's \p{L}/\p{N} classes and trailing-space
# lookahead are the documented deltas (lookahead is unsupported in RE2).
BPE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+"
    r"| ?[^ \t\n\r\fa-zA-Z0-9']+|'| ?[ \t\n\r\f]+"
)


def bpe_pretokens_col(text: str | Column = "text") -> Column:
    """array<string> of BPE-ish pre-tokens — native regexp_extract_all
    (JVM, codegen); group idx 0 = the whole match (the pattern has only
    non-capturing groups, and Spark's default idx is 1)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), F.lit(0))


def bpe_token_count_col(text: str | Column = "text") -> Column:
    """Pre-token count — the standard proxy for BPE token budget when
    estimating LLM training-corpus size from a crawl."""
    return F.size(bpe_pretokens_col(text)).cast("long")


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

    IMPORTANT evaluation-order contract: the gram-hash array MUST be
    materialized (a real column) before the window pass — if the hash
    transform is inlined into the window lambda, ``slice`` re-evaluates
    the WHOLE gram array per window element and the per-doc cost goes
    O(n^2 k) (measured: minutes instead of seconds at 5k docs).  Use
    ``winnow_fingerprints_df`` which stages the two projections; this
    column variant exists for expression-level tests on short inputs.
    """
    hs = gram_hashes_col(text, k=k, base=base)
    return _winnow_windows(hs, window=window)


def gram_hashes_col(
    text: str | Column = "text", k: int = 4, base: int = 257
) -> Column:
    """Polynomial rolling hashes of every char k-gram (closed form, exact
    in int64 — SQL-oracle-computable)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)

    def gram(i):
        h = F.lit(0).cast("long")
        for j in range(k):
            h = h + F.ascii(c.substr(i + F.lit(j), F.lit(1))).cast("long") * F.lit(
                base ** (k - 1 - j)
            )
        return h

    # guard: F.sequence(1, m) DESCENDS when m < 1, so short docs must
    # short-circuit to an empty gram list explicitly
    return F.when(
        n >= k, F.transform(F.sequence(F.lit(1), n - k + 1), gram)
    ).otherwise(F.array().cast("array<bigint>"))


def _winnow_windows(hs: Column, window: int = 5) -> Column:
    """Sliding-window minima as ONE F.aggregate pass with a (buffer, out)
    accumulator struct.

    The naive form — transform(sequence(...), j -> array_min(slice(hs,
    j, w))) — references ``hs`` inside the lambda: when Catalyst inlines
    the gram-hash transform into a consumer (Generate substitution on
    explode, CollapseProject), ``slice`` re-evaluates the WHOLE gram
    expression per window and the per-doc cost goes O(n^2 k) — measured
    as minutes-instead-of-seconds at a few hundred docs.  The aggregate
    form consumes ``hs`` exactly once regardless of what the optimizer
    inlines: each step appends to a <=w-element ring buffer and emits
    the buffer min once full — O(n*w) per doc, structurally."""
    w = window
    zero = F.struct(
        F.array().cast("array<bigint>").alias("buf"),
        F.array().cast("array<bigint>").alias("out"),
    )

    def step(acc, x):
        buf2 = F.concat(acc["buf"], F.array(x))
        full = F.size(buf2) >= w
        out2 = F.when(
            full, F.concat(acc["out"], F.array(F.array_min(buf2)))
        ).otherwise(acc["out"])
        buf3 = F.when(full, F.slice(buf2, 2, w - 1)).otherwise(buf2)
        return F.struct(buf3.alias("buf"), out2.alias("out"))

    return F.array_distinct(F.aggregate(hs, zero, step, lambda acc: acc["out"]))


def winnow_fingerprints_df(
    df,
    id_col: str,
    text_col: str = "text",
    k: int = 4,
    window: int = 5,
    base: int = 257,
    out_col: str = "fps",
):
    """Winnowing fingerprints via the all-native expression path (the
    oracle-translatable reference).  Interpreted higher-order-function
    lambdas cost ~7 ms/doc: correct at any optimizer whim (see
    _winnow_windows), but for bulk corpora prefer the value-identical
    Arrow path ``winnow_fingerprints_pandas_df`` (~2 orders faster)."""
    hashed = df.select(
        F.col(id_col), gram_hashes_col(text_col, k=k, base=base).alias("_hs")
    )
    return hashed.select(
        F.col(id_col), _winnow_windows(F.col("_hs"), window=window).alias(out_col)
    )


def winnow_fingerprints_pandas_df(
    df,
    id_col: str,
    text_col: str = "text",
    k: int = 4,
    window: int = 5,
    base: int = 257,
    out_col: str = "fps",
):
    """Winnowing fingerprints, vectorized numpy over Arrow batches — the
    bulk-corpus path.  Value-identical to winnow_fingerprints_df (same
    closed-form polynomial, exact int64; pinned by test) but ~2 orders
    of magnitude cheaper per doc than interpreted HOF lambdas."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    coefs = np.array([base ** (k - 1 - j) for j in range(k)], dtype=np.int64)
    in_fields = [df.schema[id_col], df.schema[text_col]]
    schema = StructType(
        [in_fields[0], StructField(out_col, ArrayType(LongType()))]
    )

    def winnow_one(text: str):
        if text is None or len(text) < k + window - 1:
            return []
        codes = np.frombuffer(
            text.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        n = len(codes) - k + 1
        h = np.zeros(n, dtype=np.int64)
        for j in range(k):
            h += codes[j : j + n] * coefs[j]
        mins = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
        return np.unique(mins).tolist()

    def run(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: pdf[text_col].map(winnow_one),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# simhash — all-JVM: explode -> xxhash64 per token -> 64 bit-sum aggregates
# ---------------------------------------------------------------------------

def poly_token_hash_col(tok: Column, k: int = 8, base: int = 31) -> Column:
    """Closed-form polynomial token hash over the first ``k`` chars
    (missing chars contribute 0): sum(code(c_j) * base^(k-1-j)), exact in
    int64 — code() is the full Unicode codepoint (Spark ``ascii`` and
    DuckDB ``ord`` agree on it, verified up to astral-plane emoji), so at
    the defaults max < 0x10FFFF * (31^8-1)/30 < 2^55: no modulus, no
    overflow, no engine-specific hash.  Exists so an SQL oracle can
    reproduce the ENTIRE simhash pipeline exactly (the production path
    hashes with xxhash64, which DuckDB lacks) — the winnowing-oracle
    pattern applied to simhash's token hash."""
    h = F.lit(0).cast("long")
    for j in range(k):
        code = F.when(
            F.length(tok) > j, F.ascii(F.substring(tok, j + 1, 1)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        h = h + code * F.lit(base ** (k - 1 - j))
    return h


def simhash_df(df, id_col: str, text_col: str, token_hash=None):
    """64-bit simhash per document, entirely native (whole-stage codegen,
    no Python in the plan): explode tokens -> ``xxhash64(token)`` -> per
    bit j, sum(2*bit_j - 1) > 0 decides bit j of the fingerprint.

    The shuffle carries 65 longs per (doc, partial) with map-side combine
    — at 10^10 docs this is the linear all-JVM path (the previous pandas
    UDF ran a per-token pure-Python FNV loop: the round-1 scale offender).
    Tokenless/empty docs fingerprint to 0.  Returns DataFrame[id, simhash].

    ``token_hash``: Column -> Column producing the per-token 64-bit hash;
    defaults to ``F.xxhash64``.  The exact-oracle twin passes
    ``poly_token_hash_col`` — every downstream step (bit sums, sign math,
    banding, verify) is hash-agnostic and runs identically.
    """
    token_hash = token_hash or F.xxhash64
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))
    hashed = toks.withColumn("h", token_hash(F.col("tok")))
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
