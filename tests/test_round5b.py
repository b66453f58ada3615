"""Round-5 second-half review fixes (the per-round review pass over the
round's own diff): multi-scan re-crawl safety for the incremental
near-dup corpus, latest-result-wins at the curation quality gate,
pass-aware force resume over a KILLED pass, and the CLI -maxStages
budget holding across conflict retries."""

from test_round5 import _near_dup_inputs


def _results_df(spark, rows):
    """Minimal results-table rows for CurationEngine (the columns the
    quality stage reads)."""
    return spark.createDataFrame(
        rows,
        "status: string, url_canon: string, result_caption: string, "
        "result_phash: long, ts: double, batch_id: int, crawl_pos: long",
    )


GOOD = (
    "quick brown fox jumps over lazy dog near riverbank during sunny "
    "morning walk today"
)


def test_multi_scan_recrawl_corpus_unique_no_self_pairs(spark, tmp_path):
    """Review r5: a second scan run against the same warehouse (per-scan
    URL-seen scope, the -scanRuns path) re-crawls every url_key.  The
    corpus projections must stay unique by doc_key (first-observation-
    wins) and the probe must never flag a re-crawled doc against ITSELF
    — before the fix corpus_sigs doubled and (K, K) jaccard-1.0 pairs
    appeared, double-counting every later batch's output."""
    from crawler_core_spark.plans.crawl import (
        CORPUS_SIGS_TABLE,
        CORPUS_TOKENS_TABLE,
        NEAR_DUPS_TABLE,
        CrawlEngine,
    )
    from crawler_core_spark.storage import TableStore

    targets, dns, dl, robots, images = _near_dup_inputs(spark)
    store = TableStore(spark, str(tmp_path / "mswh"))
    eng = CrawlEngine(spark, store, images, batch_period=2.0,
                      near_dup_captions=True)
    eng.publish(targets, dns, dl, robots, "bs-s1")
    eng.run()
    n1 = store.read(CORPUS_SIGS_TABLE).count()
    pairs1 = store.read(NEAR_DUPS_TABLE).count()

    # scan 2: fresh URL-seen scope, same warehouse -> full re-crawl
    eng2 = CrawlEngine(
        spark, store, images, batch_period=2.0, near_dup_captions=True,
        url_seen_kw={"table": "url_seen_scan2"},
    )
    eng2.publish(targets, dns, dl, robots, "bs-s2")
    eng2.run()

    sigs = store.read(CORPUS_SIGS_TABLE)
    assert sigs.count() == n1, "re-crawled doc_keys must not re-append"
    assert sigs.select("doc_key").distinct().count() == n1
    assert store.read(CORPUS_TOKENS_TABLE).count() == n1
    pairs = store.read(NEAR_DUPS_TABLE).collect()
    assert all(r["new_key"] != r["corpus_key"] for r in pairs), pairs
    # scan 2's re-crawls ARE near-dups of the OTHER hosts' identical
    # captions already in the corpus — those cross pairs still flag
    assert len(pairs) > pairs1


def test_curate_quality_latest_wins_on_multi_scan_results(spark, tmp_path):
    """Review r5: multi-scan crawls append several SUCCESS rows per
    url_canon; the quality stage must apply latest-result-wins (O2) or
    one doc enters every downstream stage twice (and survivors'
    n_members double-count)."""
    from crawler_core_spark.plans.curate import (
        DOCS_TABLE,
        STAGES,
        SURVIVORS_TABLE,
        CurationEngine,
    )
    from crawler_core_spark.storage import TableStore

    store = TableStore(spark, str(tmp_path / "lwwh"))
    store.write(
        _results_df(spark, [
            # url A crawled twice across scans: caption CHANGED — only the
            # latest (ts=20) text may survive into cur_docs
            ("SUCCESS", "https://a.example:443/", GOOD + " alpha", 11, 10.0, 0, 1),
            ("SUCCESS", "https://a.example:443/", GOOD + " beta", 12, 20.0, 1, 2),
            # url B crawled twice with an identical caption (steady page)
            ("SUCCESS", "https://b.example:443/", GOOD + " gamma", 13, 10.0, 0, 3),
            ("SUCCESS", "https://b.example:443/", GOOD + " gamma", 13, 20.0, 1, 4),
            ("SUCCESS", "https://c.example:443/", "unrelated solitary caption "
             "about vintage bicycles leaning near downtown brick walls",
             14, 10.0, 0, 5),
        ]),
        "results",
    )
    eng = CurationEngine(spark, store, quality_threshold=0.08,
                         jaccard_threshold=0.8, max_hamming=0)
    assert eng.run() == STAGES

    docs = {r["text"] for r in store.read(DOCS_TABLE).collect()}
    assert store.read(DOCS_TABLE).count() == 3  # one row per url
    assert GOOD + " beta" in docs and GOOD + " alpha" not in docs

    surv = sorted(
        (r["n_members"]) for r in store.read(SURVIVORS_TABLE).collect()
    )
    # beta/gamma near-dup into one cluster of 2; bicycle is a singleton —
    # with the bug, members double-counted (2 became 4)
    assert surv == [1, 2]


def test_stages_done_resets_when_force_overrides_killed_pass(spark, tmp_path):
    """Review r5: forcing over an UNFINISHED pass, then dying after the
    fresh 'quality' commit, must resume the NEW pass from 'exact' — the
    old survivors-only reset rule resumed at 'phash' against the stale
    pass's cur_exact/cur_edges."""
    from crawler_core_spark.plans.curate import STAGES, CurationEngine
    from crawler_core_spark.storage import TableStore

    store = TableStore(spark, str(tmp_path / "fkwh"))
    store.write(
        _results_df(spark, [
            ("SUCCESS", "https://a.example:443/", GOOD + " alpha", 11, 1.0, 0, 1),
            ("SUCCESS", "https://b.example:443/", GOOD + " beta", 12, 1.0, 0, 2),
        ]),
        "results",
    )
    eng = CurationEngine(spark, store, quality_threshold=0.08,
                         jaccard_threshold=0.8, max_hamming=0)
    assert eng.run(max_stages=3) == STAGES[:3]  # pass 1, killed mid-way
    assert eng.run(force=True, max_stages=1) == STAGES[:1]  # forced, killed
    # pass-aware resume: only the forced pass's quality counts as done
    assert eng.stages_done() == STAGES[:1]
    assert eng.run() == STAGES[1:]
    assert eng.stages_done() == STAGES


def test_cli_curate_max_stages_budget_across_conflict_retries(
    spark, tmp_path, monkeypatch
):
    """Review r5: -maxStages bounds the INVOCATION — a conflict-after-
    progress retry must re-enter run() with the REMAINING budget, not a
    fresh one (before the fix, `-maxStages 2` could commit 3 stages)."""
    import crawler_core_spark.plans.curate as curate_mod
    from crawler_core_spark.cli import main
    from crawler_core_spark.storage import CommitConflictError, TableStore

    store = TableStore(spark, str(tmp_path / "bwh"))
    store.write(
        _results_df(
            spark,
            [("SUCCESS", "https://a.example:443/", GOOD, 11, 1.0, 0, 1)],
        ),
        "results",
    )
    calls = []

    class FakeEngine:
        def __init__(self, *a, **kw):
            pass

        def run(self, max_stages=None, verbose=False, force=False):
            calls.append(max_stages)
            if len(calls) == 1:
                # committed one stage, then hit a concurrent writer
                e = CommitConflictError("intruder")
                e.batches_committed = 1
                raise e
            return ["stage"] * (0 if max_stages is None else max_stages)

        def stages_done(self):
            return ["quality"]

    monkeypatch.setattr(curate_mod, "CurationEngine", FakeEngine)
    assert main(["curate", "-warehouse", store.root, "-maxStages", "2"]) == 0
    # attempt 1 got the full budget; the retry got only the remainder
    assert calls == [2, 1]


def test_encode_ivfpq_norm2_matches_numpy_reconstruction(spark):
    """Review r5: |x̃|² moved from probe-time literal tables (quadratic
    n_centroids × n_codes plan size) to an 8-byte norm2 column computed
    at encode time — pin it against a numpy reconstruction in both raw
    and residual (IVFADC) modes."""
    import numpy as np

    from crawler_core_spark.operators.ann import (
        encode_ivfpq,
        sample_matrix,
        train_centroids,
        train_pq,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16)) * 3
    rows = [
        (i, (centers[i % 4] + rng.standard_normal(16) * 0.3)
            .astype("float32").tolist())
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    x = sample_matrix(df, 120)
    cents = train_centroids(df, 4, x=x)
    for residual in (False, True):
        cbs = train_pq(
            df, n_subvectors=4, n_codes=8, x=x,
            residual_centroids=cents if residual else None,
        )
        got = {
            r["neighbor_id"]: (r["cell"], list(r["codes"]), r["norm2"])
            for r in encode_ivfpq(df, cents, cbs, residual).collect()
        }
        c = np.asarray(cents)
        for vid, vec in rows[:40]:
            cell, codes, norm2 = got[vid]
            recon = np.concatenate(
                [np.asarray(cbs[s][codes[s]]) for s in range(4)]
            )
            if residual:
                recon = recon + c[cell]
            assert abs(norm2 - float(recon @ recon)) < 1e-6, (vid, residual)


def test_load_encoded_rejects_pre_norm2_rows(spark, tmp_path):
    """Review r5 pass 2: encoded-projection rows written before norm2
    existed surface as NULL through the union-with-missing-columns read
    path — den2 would silently collapse to the 1e-12 floor and the
    rerank degrade to raw-dot ordering.  load_encoded must refuse."""
    import numpy as np
    import pytest

    from crawler_core_spark.operators.ann import (
        load_encoded,
        sample_matrix,
        save_encoded,
        train_centroids,
        train_pq,
    )
    from crawler_core_spark.storage import TableStore

    store = TableStore(spark, str(tmp_path / "encwh"))
    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(8).astype("float32").tolist())
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    x = sample_matrix(df, 40)
    cents = train_centroids(df, 2, x=x)
    cbs = train_pq(df, n_subvectors=2, n_codes=4, x=x)

    # an "old writer" appended rows with no norm2 column
    store.write(
        spark.createDataFrame(
            [("m", 0, 999, 0, [0, 1])],
            "model_id: string, saved_ver: long, neighbor_id: long, "
            "cell: int, codes: array<int>",
        ),
        "ann_pq_encoded",
    )
    save_encoded(store, df, cents, cbs, model_id="m", ver=0)
    with pytest.raises(ValueError, match="norm2"):
        load_encoded(store, "m", 0)


def test_bpe_pretoken_count_matches_python_re(spark):
    """BPE-ish pre-tokenizer: the Spark-native regexp_extract_all result
    must equal python re.findall on the same pattern (the oracle gate
    additionally pins DuckDB RE2 agreement at sf0.01)."""
    import re

    from pyspark.sql import functions as F

    from crawler_core_spark.functions.text import (
        BPE_PRETOKEN_RE,
        bpe_pretokens_col,
        bpe_token_count_col,
    )

    texts = [
        "The quick brown fox's 2 jumps, don't stop!  multiple   spaces",
        "it's we're I'll you've he'd 100,000.5 ... '' '",
        "  leading and trailing  ",
        "",
        "no-punct words only here",
        # review r5 pass 3: \s is NOT engine-identical (Java counts \x0B
        # as whitespace, RE2 does not; python re adds U+00A0) — the
        # explicit class must tokenize these identically in all three
        "a\x0b\x0b.b",
        "a\xa0\xa0.b",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        "text",
        bpe_pretokens_col("text").alias("toks"),
        bpe_token_count_col("text").alias("n"),
    ).collect()
    for r in rows:
        expect = re.findall(BPE_PRETOKEN_RE, r["text"])
        assert list(r["toks"]) == expect, r["text"]
        assert r["n"] == len(expect)
    # the canonical GPT-2 examples: contractions split off, spaces attach
    one = dict((r["text"], list(r["toks"])) for r in rows)
    assert one[texts[0]][:5] == ["The", " quick", " brown", " fox", "'s"]


def test_decontaminate_pairs_substring_guarantee(spark):
    """decontaminate_pairs: the winnowing guarantee — a shared substring
    of length >= window + k - 1 (= 8 at defaults) forces shared
    fingerprints; unrelated docs share none.  The benchmark fp side must
    be broadcast (no corpus shuffle for the join)."""
    from crawler_core_spark.operators.dedup import decontaminate_pairs

    bench = spark.createDataFrame(
        [(0, "the secret benchmark passage about quantum chromodynamics")],
        "doc_id: long, text: string",
    )
    docs = spark.createDataFrame(
        [
            # verbatim contamination: whole benchmark sentence embedded
            (100, "prefix text the secret benchmark passage about quantum "
                  "chromodynamics and a suffix"),
            # clean doc, no 8-char substring overlap
            (101, "zebras wander across moonlit plateaus, yawning"),
        ],
        "doc_id: long, text: string",
    )
    got = decontaminate_pairs(docs, bench, min_shared=3).collect()
    assert [(r["doc_id"], r["bench_id"]) for r in got] == [(100, 0)]
    assert got[0]["n_shared"] >= 3
    # clean doc flagged at NO threshold
    none = decontaminate_pairs(docs, bench, min_shared=1).collect()
    assert {r["doc_id"] for r in none} == {100}
    # scale shape: benchmark side broadcast
    plan = decontaminate_pairs(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
