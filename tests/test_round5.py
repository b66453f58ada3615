"""Round-5 pins: ADVICE-r4 fixes + this round's new surface.

Each test pins one specific behavioral contract added or fixed in round 5,
mirroring the test strategy of the reference's controller/worker suites
(reference: src/test/java/de/rub/nds/crawler — SURVEY.md §5).
"""
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- ADVICE r4

def test_incremental_dedup_rejects_mismatched_corpus_sigs(spark):
    """ADVICE #1: a persisted corpus_sigs built with a different n_hashes
    must fail loudly, not silently degrade band recall."""
    from crawler_core_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
        corpus_token_sets,
    )

    corpus = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(4)],
        "doc_id INT, text STRING",
    )
    new = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id INT, text STRING"
    )
    sigs32 = minhash_signatures(corpus, "doc_id", "text", n_hashes=32)
    toks = corpus_token_sets(corpus, "doc_id", "text")
    with pytest.raises(ValueError, match="signature length 32 != n_hashes 16"):
        incremental_minhash_dedup(
            new, corpus_sigs=sigs32, corpus_tokens=toks, n_hashes=16
        )
    # matching length passes the guard and still finds the dup
    sigs16 = minhash_signatures(corpus, "doc_id", "text", n_hashes=16)
    out = incremental_minhash_dedup(
        new, corpus_sigs=sigs16, corpus_tokens=toks, n_hashes=16
    )
    assert out.count() == 4


def test_arrow_band_buckets_rejects_overflowing_n_planes():
    """ADVICE #2: n_planes > 62 overflows int64 bucket weights — loud guard."""
    from crawler_core_spark.operators.ann import arrow_band_buckets_udf

    with pytest.raises(ValueError, match="n_planes must be <= 62"):
        arrow_band_buckets_udf(n_planes=63, n_bands=2)
    arrow_band_buckets_udf(n_planes=62, n_bands=2)  # boundary OK


def test_validate_unique_respects_key_column(spark, store):
    """ADVICE #4: validate_unique must check the same key column probe()
    is parameterized with."""
    from crawler_core_spark.operators.url_seen import ExactUrlSeen

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "z")], "alt_key STRING, url_key STRING"
    )
    store.write(df, "alt_seen", mode="replace")
    seen = ExactUrlSeen(store, table="alt_seen")
    assert seen.validate_unique(key="alt_key") == 1  # 'a' duplicated
    assert seen.validate_unique(key="url_key") == 0


def test_conflict_retry_log_messages(capsys):
    """ADVICE #3: budget-exceeded prints an abort line (never 'retry 4/3');
    progress-bearing conflicts log a counter reset, not 'fruitless 0'."""
    from crawler_core_spark.cli import (
        call_with_conflict_retries,
        run_with_conflict_retries,
    )
    from crawler_core_spark.storage import CommitConflictError

    def always_conflicts():
        raise CommitConflictError("contested")

    with pytest.raises(SystemExit):
        call_with_conflict_retries(always_conflicts, max_retries=2, label="pub")
    out = capsys.readouterr().out
    assert "retry 3/2" not in out
    assert "budget exhausted" in out
    assert "retry 1/2" in out and "retry 2/2" in out

    class FakeEngine:
        def __init__(self):
            self.calls = 0

        def run(self, **kw):
            self.calls += 1
            if self.calls == 1:
                e = CommitConflictError("lost a race after progress")
                e.batches_committed = 3
                raise e
            if self.calls == 2:
                raise CommitConflictError("fruitless")
            return ["done"]

    eng = FakeEngine()
    assert run_with_conflict_retries(eng, max_retries=1) == ["done"]
    out = capsys.readouterr().out
    assert "counter reset" in out
    assert "3 batches committed" in out
    assert "fruitless attempt 0" not in out
    assert "fruitless attempt 1" in out
