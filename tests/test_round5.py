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


# ------------------------------------------------------- robots.txt parser

class TestRobotsParse:
    """Directive r4-#2: parse real robots.txt text into the rules table."""

    def _p(self, text, ua="testbot"):
        from crawler_core_spark.sources.robots import parse_robots_text

        return parse_robots_text(text, ua)

    def test_comments_and_blank_lines(self):
        rules, delay = self._p(
            "# header comment\n\nUser-agent: *  # trailing\n\n"
            "Disallow: /a # path comment\n\nAllow: /a/b\n"
        )
        assert rules == [("/a", False), ("/a/b", True)]
        assert delay is None

    def test_specific_group_beats_wildcard_and_is_not_merged(self):
        rules, delay = self._p(
            "User-agent: *\nDisallow: /tmp\nCrawl-delay: 9\n"
            "User-agent: testbot\nDisallow: /private\nCrawl-delay: 2\n"
        )
        assert rules == [("/private", False)]  # '*' rules NOT merged in
        assert delay == 2.0

    def test_longest_agent_token_wins(self):
        rules, _ = self._p(
            "User-agent: test\nDisallow: /short\n"
            "User-agent: testbot\nDisallow: /long\n",
            ua="testbot-images/1.0",
        )
        assert rules == [("/long", False)]

    def test_consecutive_ua_lines_share_one_group(self):
        rules, _ = self._p(
            "User-agent: megabot\nUser-agent: testbot\nDisallow: /x\n"
        )
        assert rules == [("/x", False)]

    def test_ua_line_after_rules_starts_new_group(self):
        rules, _ = self._p(
            "User-agent: testbot\nDisallow: /a\n"
            "User-agent: otherbot\nDisallow: /b\n"
        )
        assert rules == [("/a", False)]

    def test_empty_disallow_is_allow_all(self):
        rules, delay = self._p("User-agent: testbot\nDisallow:\nAllow:\n")
        assert rules == []
        assert delay is None

    def test_crawl_delay_float_and_invalid_ignored(self):
        _, delay = self._p(
            "User-agent: testbot\nCrawl-delay: soon\nCrawl-delay: 2.5\n"
            "Crawl-delay: 7\n"
        )
        assert delay == 2.5  # first VALID wins; 'soon' skipped

    def test_case_insensitive_fields_and_ua(self):
        rules, delay = self._p(
            "USER-AGENT: TestBot\nDISALLOW: /up\nCRAWL-DELAY: 3\n"
        )
        assert rules == [("/up", False)]
        assert delay == 3.0

    def test_wildcard_and_anchor_clip_to_prefix(self):
        rules, _ = self._p(
            "User-agent: testbot\nDisallow: /cgi/*.php\nDisallow: /end$\n"
            "Disallow: /tail*\nDisallow: *\n"
        )
        # trailing-* equivalent; mid-*/$ conservative superset; pure-* dropped
        assert rules == [("/cgi/", False), ("/end", False), ("/tail", False)]

    def test_rules_before_any_ua_ignored_and_no_colon_lines(self):
        rules, _ = self._p(
            "Disallow: /orphan\nnonsense line\nUser-agent: testbot\nDisallow: /x\n"
        )
        assert rules == [("/x", False)]

    def test_wildcard_group_fallback(self):
        rules, delay = self._p(
            "User-agent: somebot\nDisallow: /a\nUser-agent: *\nDisallow: /w\n",
            ua="unrelated",
        )
        assert rules == [("/w", False)]

    def test_same_specificity_groups_merge(self):
        rules, delay = self._p(
            "User-agent: testbot\nDisallow: /a\n"
            "User-agent: testbot\nDisallow: /b\nCrawl-delay: 4\n"
        )
        assert rules == [("/a", False), ("/b", False)]
        assert delay == 4.0

    def test_empty_or_none_text(self):
        assert self._p(None) == ([], None)
        assert self._p("") == ([], None)

    def test_utf8_bom_stripped(self):
        # a BOM-prefixed first line must not hide the leading UA group
        rules, delay = self._p("\ufeffUser-agent: testbot\nDisallow: /b\n")
        assert rules == [("/b", False)]

    def test_allow_wildcard_never_widens(self):
        # review r5: clipping 'Allow: /private*.html$' to '/private' would
        # TIE the explicit 'Disallow: /private' downstream and allow wins
        # ties -> the crawler would fetch /private/secret.txt.  Wildcarded
        # Allows that aren't pure-prefix must be DROPPED (under-allow).
        rules, _ = self._p(
            "User-agent: testbot\nDisallow: /private\n"
            "Allow: /private*.html$\nAllow: /a$\nAllow: /b*c\n"
        )
        assert rules == [("/private", False)]

    def test_allow_trailing_star_and_star_dollar_still_clip(self):
        # trailing '*' (and '*$') IS exact prefix semantics \u2014 keep those
        rules, _ = self._p(
            "User-agent: testbot\nAllow: /pub*\nAllow: /p2*$\nAllow: /p3**\n"
        )
        assert rules == [("/pub", True), ("/p2", True), ("/p3", True)]


def test_rows_for_text_baseline_semantics():
    from crawler_core_spark.sources.robots import _rows_for_text

    # matching group with a delay but no rules: baseline pins the delay
    assert _rows_for_text("User-agent: testbot\nCrawl-delay: 5\n", "testbot", 1.0) == [
        ("", True, 5.0)
    ]
    # matching group, allow-all empty Disallow only: baseline at default
    assert _rows_for_text("User-agent: testbot\nDisallow:\n", "testbot", 1.0) == [
        ("", True, 1.0)
    ]
    # no matching group at all -> no rows (global default downstream)
    assert _rows_for_text("User-agent: otherbot\nDisallow: /\n", "testbot", 1.0) == []
    # no file -> no rows
    assert _rows_for_text(None, "testbot", 1.0) == []
    # rules inherit group delay; baseline appended last
    assert _rows_for_text(
        "User-agent: testbot\nDisallow: /p\nCrawl-delay: 2\n", "testbot", 1.0
    ) == [("/p", False, 2.0), ("", True, 2.0)]
    # review r5: BOM-prefixed file whose only matching group is EMPTY —
    # the old second parser (_group_selected) skipped the BOM strip and
    # mis-read it as "no group", dropping the baseline row
    assert _rows_for_text("﻿User-agent: testbot\nDisallow:\n", "testbot", 1.0) == [
        ("", True, 1.0)
    ]


def test_robots_rules_from_texts_distributed(spark):
    """Distributed parse ≡ pure core, rules feed robots_match, and the
    plan stays Arrow-batched (ArrowEvalPython, never BatchEvalPython)."""
    from crawler_core_spark.sources.robots import robots_rules_from_texts
    from crawler_core_spark.operators.scheduler import robots_match

    bodies = spark.createDataFrame(
        [
            ("h0", "User-agent: testbot\nDisallow: /private\nAllow: /private/pub\nCrawl-delay: 2"),
            ("h1", "User-agent: *\nDisallow: /tmp"),
            ("h2", None),  # no robots.txt fetched
            ("h3", "User-agent: otherbot\nDisallow: /"),  # no matching group
        ],
        "host STRING, robots_txt STRING",
    )
    rules = robots_rules_from_texts(bodies, user_agent="testbot")
    got = {(r.host, r.path_prefix): (r.allow, r.crawl_delay) for r in rules.collect()}
    assert got == {
        ("h0", "/private"): (False, 2.0),
        ("h0", "/private/pub"): (True, 2.0),
        ("h0", ""): (True, 2.0),
        ("h1", "/tmp"): (False, 1.0),
        ("h1", ""): (True, 1.0),
    }
    plan = rules._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan

    jobs = spark.createDataFrame(
        [
            (1, "h0", "/private/x"),
            (2, "h0", "/private/pub/y"),
            (3, "h0", "/other"),
            (4, "h1", "/tmp/z"),
            (5, "h2", "/anything"),
            (6, "h3", "/anything"),
        ],
        "job_id INT, host STRING, path STRING",
    )
    out = {
        r.job_id: (r.robots_allow, r.crawl_delay)
        for r in robots_match(jobs, rules, id_col="job_id", path_col="path").collect()
    }
    assert out == {
        1: (False, 2.0),   # /private disallow, group delay
        2: (True, 2.0),    # longest prefix allow wins
        3: (True, 2.0),    # baseline: no explicit rule, group delay
        4: (False, 1.0),
        5: (True, 1.0),    # no robots.txt: global default
        6: (True, 1.0),    # no matching group: global default
    }


def test_load_robots_file_s5_shape(spark, tmp_path):
    from crawler_core_spark.sources.robots import load_robots_file

    p = tmp_path / "robots.txt"
    p.write_text("User-agent: *\nDisallow: /kb\nCrawl-delay: 1.5\n")
    df = load_robots_file(spark, "example.com", path=str(p))
    rows = {(r.path_prefix): (r.allow, r.crawl_delay) for r in df.collect()}
    assert rows == {"/kb": (False, 1.5), "": (True, 1.5)}
    empty = load_robots_file(spark, "x.com", lines=["User-agent: nobody", "Disallow: /"])
    assert empty.count() == 0 and empty.columns == ["host", "path_prefix", "allow", "crawl_delay"]


def test_url_paths_e2e_on_parsed_robots_text(spark, tmp_path):
    """The r4 URL-path E2E rerun with rules PARSED FROM robots.txt TEXT
    (per-host bodies -> robots_rules_from_texts) instead of a hand-built
    rules DataFrame: engine results must match the pure-python oracle run
    on the very same parsed rules, and the path-granular block set must
    be the known {2, 5}."""
    import pandas as pd

    from crawler_core_spark import oracle, synth
    from crawler_core_spark.plans.crawl import CrawlEngine
    from crawler_core_spark.sources.denylist import load_denylist
    from crawler_core_spark.sources.dns import dns_table
    from crawler_core_spark.sources.robots import robots_rules_from_texts
    from crawler_core_spark.sources.targets import target_file_df
    from crawler_core_spark.storage import TableStore

    hosts = [synth.host_for_image(i) for i in range(6)]
    lines = [
        f"{hosts[0]}/docs/a",            # 0: allowed, path-bearing
        f"{hosts[0]}/docs/b",            # 1: same host, distinct work unit
        f"https://{hosts[1]}/private/x", # 2: blocked by hosts[1]'s robots
        f"{hosts[1]}/public/y",          # 3: allowed on the same host
        hosts[2],                        # 4: pathless seed -> '/'
        f"{hosts[3]}/blocked/z",         # 5: blocked by hosts[3]'s robots
        f"{hosts[4]}/same",              # 6: fetched
        f"{hosts[4]}/same",              # 7: DEDUPED (same canon incl path)
    ]
    base_txt = "# per-host robots\nUser-agent: *\nAllow: /\nDisallow: /blocked\n"
    bodies = spark.createDataFrame(
        [
            (h, base_txt + ("Disallow: /private\n" if h == hosts[1] else ""))
            for h in hosts
        ],
        "host STRING, robots_txt STRING",
    )
    rules_df = robots_rules_from_texts(bodies, user_agent="crawler-core-spark")
    rules = [
        (r.host, r.path_prefix, r.allow, r.crawl_delay) for r in rules_df.collect()
    ]
    dns_map = {h: synth.ip_for_image(i) for i, h in enumerate(hosts)}
    pdf = pd.DataFrame([synth.make_image_row(i) for i in range(6)])

    store = TableStore(spark, str(tmp_path / "robotstxtwh"))
    eng = CrawlEngine(spark, store, spark.createDataFrame(pdf), url_paths=True)
    eng.publish(
        target_file_df(spark, lines=lines),
        dns_table(spark, dns_map),
        load_denylist(spark, lines=[]),
        rules_df,
        "bs-rt",
    )
    eng.run()

    jobs = oracle.publish_oracle(lines, dns_map, [], rules, parse_paths=True)
    run = oracle.crawl_oracle(
        jobs, {r["image_id"]: {"bytes": r["bytes"]} for _, r in pdf.iterrows()}
    )
    res = {r["seq"]: r for r in store.read("results").collect()}
    assert {j.seq: j.status for j in run.jobs} == {
        s: r["status"] for s, r in res.items()
    }
    got_order = sorted(
        (r["seq"], r["crawl_pos"]) for r in res.values()
        if r["crawl_pos"] is not None
    )
    want_order = sorted((j.seq, j.crawl_pos) for j in run.crawl_order)
    assert got_order == want_order
    blocked = {s for s, r in res.items() if r["status"] == "ROBOTS_BLOCKED"}
    assert blocked == {2, 5}
    assert res[7]["status"] == "DEDUPED"


# ----------------------------------------------- PQ model lifecycle + IVFADC

import numpy as np


@pytest.fixture(scope="module")
def vectors5(spark):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((4, 16)) * 3
    rows = [
        (
            i,
            (centers[i % 4] + rng.standard_normal(16) * 0.3)
            .astype("float32")
            .tolist(),
        )
        for i in range(200)
    ]
    return rows, spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_pq_model_persistence_roundtrip(spark, vectors5, tmp_path):
    """Directive r4-#3: save_pq/load_pq mirror the IVF centroid lifecycle —
    exact roundtrip incl. the residual flag, re-save supersedes by
    saved_ver, missing model raises."""
    from crawler_core_spark.operators.ann import (
        load_pq,
        save_pq,
        train_centroids,
        train_pq,
    )
    from crawler_core_spark.storage import TableStore

    _, df = vectors5
    store = TableStore(spark, str(tmp_path / "pqwh"))
    cents = train_centroids(df, n_centroids=4, sample=64)
    cb_raw = train_pq(df, n_subvectors=4, n_codes=8, sample=64)
    cb_res = train_pq(
        df, n_subvectors=4, n_codes=8, sample=64, residual_centroids=cents
    )
    assert cb_raw != cb_res  # residual training actually changes the model

    v0 = save_pq(store, cb_raw, model_id="m1", residual=False)
    assert v0 == 0
    assert load_pq(store, "m1") == (cb_raw, False, 0)
    v1 = save_pq(store, cb_res, model_id="m1", residual=True)
    assert v1 == 1
    assert load_pq(store, "m1") == (cb_res, True, 1)  # latest wins
    save_pq(store, cb_raw, model_id="m2")
    assert load_pq(store, "m2")[0] == cb_raw  # other models unaffected
    with pytest.raises(KeyError):
        load_pq(store, "nope")


def test_pq_ver_safe_vs_compaction(spark, vectors5, tmp_path):
    """saved_ver must keep increasing across cli-compact (snapshot_count
    resets there — the r3 centroid bug class)."""
    from crawler_core_spark.operators.ann import (
        PQ_TABLE,
        load_pq,
        save_pq,
        train_centroids,
        train_pq,
    )
    from crawler_core_spark.storage import TableStore

    _, df = vectors5
    store = TableStore(spark, str(tmp_path / "pqcwh"))
    cents = train_centroids(df, n_centroids=4, sample=64)
    cb1 = train_pq(df, n_subvectors=2, n_codes=4, sample=64)
    cb2 = train_pq(df, n_subvectors=2, n_codes=4, sample=32)
    assert save_pq(store, cb1, model_id="m") == 0
    store.compact(PQ_TABLE)
    assert save_pq(store, cb2, model_id="m") == 1
    assert load_pq(store, "m") == (cb2, False, 1)


def test_ivfpq_probe_with_persisted_models_equals_fused(spark, vectors5, tmp_path):
    """Train-once/encode-at-ingest/probe-many ≡ the fused ivfpq_topk:
    centroids + codebooks + (id, cell, codes) projection all reloaded
    from the store, probe touches only models + projection + rerank
    vectors."""
    from crawler_core_spark.operators.ann import (
        encode_ivfpq,
        ivfpq_topk,
        ivfpq_topk_with_models,
        load_centroids,
        load_encoded,
        load_pq,
        sample_matrix,
        save_centroids,
        save_encoded,
        save_pq,
        train_centroids,
        train_pq,
    )
    from crawler_core_spark.storage import TableStore

    _, df = vectors5
    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    store = TableStore(spark, str(tmp_path / "encwh"))
    for residual in (False, True):
        mid = f"m-res{residual}"
        x = sample_matrix(df, 200)
        cents = train_centroids(df, n_centroids=8, x=x)
        cbs = train_pq(
            df, n_subvectors=4, n_codes=8, x=x,
            residual_centroids=cents if residual else None,
        )
        save_centroids(store, cents, model_id=mid)
        ver = save_pq(store, cbs, model_id=mid, residual=residual)
        save_encoded(
            store, df, cents, cbs, residual=residual, model_id=mid, ver=ver
        )

        lc = load_centroids(store, mid)
        lb, lres, lver = load_pq(store, mid)
        assert (lc, lb, lres, lver) == (cents, cbs, residual, ver)
        enc = load_encoded(store, mid, ver)
        fresh = encode_ivfpq(df, cents, cbs, residual)
        assert sorted(map(tuple, enc.collect())) == sorted(
            map(tuple, fresh.collect())
        )

        probed = ivfpq_topk_with_models(
            df, q, lc, lb, enc, residual=lres, k=5, n_probe=2, rerank=15
        )
        fused = ivfpq_topk(
            df, q, k=5, n_centroids=8, n_probe=2, n_subvectors=4,
            n_codes=8, rerank=15, sample=200, residual=residual,
        )
        assert sorted(map(tuple, probed.collect())) == sorted(
            map(tuple, fused.collect())
        )


def test_ivfadc_recall_beats_raw_pq_at_same_bytes(spark, vectors5):
    """Directive r4-#6: residual quantization (IVFADC, Jegou et al.
    TPAMI'11) must reach >= the raw-vector variant's recall at identical
    (n_subvectors, n_codes) — the coarse component is removed so the
    same code budget resolves fine structure.  Exact sims wherever both
    report a pair (the rerank is exact in both)."""
    from crawler_core_spark.operators.ann import brute_force_topk, ivfpq_topk

    _, df = vectors5
    q = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = brute_force_topk(df, q, k=5)
    e = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact.collect()}
    kw = dict(
        k=5, n_centroids=8, n_probe=2, n_subvectors=4, n_codes=8,
        rerank=15, sample=200,
    )
    raw = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in ivfpq_topk(df, q, residual=False, **kw).collect()
    }
    adc = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in ivfpq_topk(df, q, residual=True, **kw).collect()
    }
    recall_raw = len(e.keys() & raw.keys()) / len(e)
    recall_adc = len(e.keys() & adc.keys()) / len(e)
    assert recall_adc >= recall_raw, (recall_adc, recall_raw)
    assert recall_adc >= 0.7, recall_adc  # absolute floor at these params
    for key in e.keys() & adc.keys():
        assert e[key] == pytest.approx(adc[key], abs=1e-6)


def test_save_encoded_partitions_by_cell(spark, vectors5, tmp_path):
    """The persisted projection is cell-partitioned: a probe of n_probe
    cells prunes the scan to those directories (PartitionFilters)."""
    import os

    from crawler_core_spark.operators.ann import (
        ENCODED_TABLE,
        load_encoded,
        sample_matrix,
        save_encoded,
        train_centroids,
        train_pq,
    )
    from crawler_core_spark.storage import TableStore

    _, df = vectors5
    store = TableStore(spark, str(tmp_path / "partwh"))
    x = sample_matrix(df, 200)
    cents = train_centroids(df, n_centroids=4, x=x)
    cbs = train_pq(df, n_subvectors=2, n_codes=4, x=x)
    save_encoded(store, df, cents, cbs, model_id="m", ver=0)
    snap = store.table_paths(ENCODED_TABLE)[0]
    assert any(d.startswith("cell=") for d in os.listdir(snap))
    pruned = load_encoded(store, "m", 0).filter(F.col("cell") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters")[1][:120], plan


# -------------------------------------------- incremental dedup in the loop

def _near_dup_inputs(spark):
    from crawler_core_spark import synth
    from crawler_core_spark.sources.denylist import load_denylist
    from crawler_core_spark.sources.dns import dns_table
    from crawler_core_spark.sources.targets import target_file_df

    hosts = [synth.host_for_image(i) for i in range(4)]
    # host 0 has three ports: same image -> identical caption fetched in
    # three DIFFERENT batches (crawl_delay == batch_period -> 1/host/batch)
    lines = [hosts[0], f"{hosts[0]}:8000", f"{hosts[0]}:8001"] + hosts[1:]
    targets = target_file_df(spark, lines=lines)
    dns = dns_table(spark, synth.dns_mappings(4))
    dl = load_denylist(spark, lines=[])
    robots = spark.createDataFrame(
        [("*", "/", True, 2.0)], synth.ROBOTS_SCHEMA
    )
    images = spark.createDataFrame(synth.images_pandas(4))
    return targets, dns, dl, robots, images


def _run_near_dup_engine(spark, root, interrupt_after=None):
    from crawler_core_spark.plans.crawl import CrawlEngine
    from crawler_core_spark.storage import TableStore

    targets, dns, dl, robots, images = _near_dup_inputs(spark)
    store = TableStore(spark, root)
    eng = CrawlEngine(
        spark, store, images, batch_period=2.0, near_dup_captions=True
    )
    eng.publish(targets, dns, dl, robots, "bs-nd")
    if interrupt_after is not None:
        eng.run(max_batches=interrupt_after)
        store = TableStore(spark, root)  # cold resume
        eng = CrawlEngine(
            spark, store, images, batch_period=2.0, near_dup_captions=True
        )
    eng.run()
    return eng


def test_crawl_loop_incremental_near_dup_lineage(spark, tmp_path):
    """Directive r4-#4: later batches' caption near-dups of earlier
    batches are flagged in per-batch lineage counters and the near_dups
    table, and the corpus projections accumulate atomically with each
    batch commit."""
    from crawler_core_spark.plans.crawl import (
        CORPUS_SIGS_TABLE,
        CORPUS_TOKENS_TABLE,
        NEAR_DUP_COUNTERS_TABLE,
        NEAR_DUPS_TABLE,
    )

    eng = _run_near_dup_engine(spark, str(tmp_path / "ndwh"))
    store = eng.store

    counters = {
        r["batch_id"]: (r["new_docs"], r["near_dup_docs"], r["near_dup_pairs"])
        for r in store.read(NEAR_DUP_COUNTERS_TABLE).collect()
    }
    # batch 0: host0:443 + hosts 1-3 fetched, corpus empty -> no flags
    assert counters[0] == (4, 0, 0)
    # batch 1: host0:8000 re-fetches img-00000's caption -> dups batch 0
    assert counters[1] == (1, 1, 1)
    # batch 2: host0:8001 -> dups BOTH earlier instances
    assert counters[2] == (1, 1, 2)

    pairs = store.read(NEAR_DUPS_TABLE).collect()
    assert {(r["batch_id"],) for r in pairs} == {(1,), (2,)}
    assert all(r["jaccard"] == 1.0 for r in pairs)
    assert len([r for r in pairs if r["batch_id"] == 2]) == 2

    # corpus projections: one row per SUCCESS caption, unique by doc_key
    n_success = store.read("results").filter(F.col("status") == "SUCCESS").count()
    sigs = store.read(CORPUS_SIGS_TABLE)
    assert sigs.count() == n_success == 6
    assert sigs.select("doc_key").distinct().count() == 6
    assert store.read(CORPUS_TOKENS_TABLE).count() == 6


def test_crawl_loop_near_dup_resume_equivalence(spark, tmp_path):
    """Kill-and-resume with near-dup enabled: the resumed run's corpus
    projections, counters and flagged pairs equal the uninterrupted
    run's (the appends ride the atomic batch commit)."""
    from crawler_core_spark.plans.crawl import (
        CORPUS_SIGS_TABLE,
        NEAR_DUP_COUNTERS_TABLE,
        NEAR_DUPS_TABLE,
    )

    full = _run_near_dup_engine(spark, str(tmp_path / "full")).store
    resumed = _run_near_dup_engine(
        spark, str(tmp_path / "resumed"), interrupt_after=1
    ).store
    for table in (NEAR_DUP_COUNTERS_TABLE, NEAR_DUPS_TABLE, CORPUS_SIGS_TABLE):
        a = sorted(map(tuple, full.read(table).collect()))
        b = sorted(map(tuple, resumed.read(table).collect()))
        assert a == b, table


def test_near_dup_probe_is_o_new(spark, tmp_path):
    """The per-batch probe's plan must read ONLY the corpus projection
    tables — never results (corpus text) or frontier — and hash only the
    batch's own text: per-ingest-batch cost scales with |new|, not
    |corpus| (the r4 review-pattern trap)."""
    eng = _run_near_dup_engine(spark, str(tmp_path / "plnwh"))
    new_docs = spark.createDataFrame(
        [(999, "some fresh caption text here")], "doc_key LONG, text STRING"
    )
    probe = eng.near_dup_probe(new_docs)
    # inputFiles() = the exact parquet files the plan scans (plan-string
    # asserts truncate on long warehouse paths)
    files = probe.inputFiles()
    assert any("/corpus_sigs/" in f for f in files), files
    assert any("/corpus_token_sets/" in f for f in files), files
    assert not any("/results/" in f for f in files), files
    assert not any("/frontier/" in f for f in files), files
    assert {f for f in files if "/corpus" not in f} == set(), files


# ------------------------------------------------ resumable curation engine

CLUSTER_BASE = (
    "quick brown fox jumps over lazy dog near riverbank during sunny "
    "morning walk"
)


def _curation_images(spark):
    """12 images whose captions/bytes exercise every curation stage:
    0-2 near-dup text cluster, 3-4 exact dup, 5-6 identical bytes (phash
    dup) with unrelated captions, 7 all-stopwords (quality-gated out),
    8-11 singletons."""
    import pandas as pd

    from crawler_core_spark import synth

    rows = [synth.make_image_row(i) for i in range(12)]
    caps = {
        0: CLUSTER_BASE + " alpha",
        1: CLUSTER_BASE + " beta",
        2: CLUSTER_BASE + " gamma",
        3: "identical caption text written once for exact duplicate detection",
        4: "identical caption text written once for exact duplicate detection",
        5: "photo shows mountain lake scene with pine trees reflected",
        6: "painting depicts ocean sunset with sailing boats offshore",
        7: "the a of and to the a of and to",
        8: "solitary lighthouse stands on rocky northern coastline cliffs",
        9: "vintage bicycle leans against red brick wall downtown",
        10: "children fly colorful kites across windy autumn meadow",
        11: "chef plates seasonal vegetables in busy restaurant kitchen",
    }
    for i, r in enumerate(rows):
        r["caption"] = caps[i]
    # 6 shares 5's exact bytes -> identical decoded phash (visual dup)
    for f in ("bytes", "w", "h", "fmt", "phash"):
        rows[6][f] = rows[5][f]
    return spark.createDataFrame(pd.DataFrame(rows))


def _curation_warehouse(spark, root):
    from crawler_core_spark import synth
    from crawler_core_spark.plans.crawl import CrawlEngine
    from crawler_core_spark.sources.denylist import load_denylist
    from crawler_core_spark.sources.dns import dns_table
    from crawler_core_spark.sources.targets import target_file_df
    from crawler_core_spark.storage import TableStore

    hosts = [synth.host_for_image(i) for i in range(12)]
    store = TableStore(spark, root)
    eng = CrawlEngine(spark, store, _curation_images(spark))
    eng.publish(
        target_file_df(spark, lines=hosts),
        dns_table(spark, synth.dns_mappings(12)),
        load_denylist(spark, lines=[]),
        spark.createDataFrame([("*", "/", True, 1.0)], synth.ROBOTS_SCHEMA),
        "bs-cur",
    )
    eng.run()
    return store


# max_hamming=0: the synthetic gradient images are ALL within hamming<=3
# of each other (shared gradient dominates the phash) — only identical
# decoded bytes should edge in this fixture
CURATE_KW = dict(quality_threshold=0.08, jaccard_threshold=0.8, max_hamming=0)


def _one_shot_survivors(spark, store):
    from crawler_core_spark.plans.curate import curation_one_shot

    docs = (
        store.read("results")
        .filter((F.col("status") == "SUCCESS") & F.col("result_caption").isNotNull())
        .select(
            F.xxhash64(F.col("url_canon")).alias("doc_key"),
            F.col("result_caption").alias("text"),
            F.col("result_phash").alias("phash"),
        )
    )
    return sorted(
        map(tuple, curation_one_shot(docs, **CURATE_KW).collect())
    )


def test_curate_engine_stages_lineage_and_one_shot_parity(spark, tmp_path):
    """Directive r4-#1: the staged engine's survivor set equals the
    one-shot pipeline semantics over the same warehouse; every stage
    commits a lineage row with consistent in/out counts."""
    from crawler_core_spark.plans.curate import (
        LINEAGE_TABLE,
        STAGES,
        SURVIVORS_TABLE,
        CurationEngine,
    )

    store = _curation_warehouse(spark, str(tmp_path / "curwh"))
    eng = CurationEngine(spark, store, **CURATE_KW)
    ran = eng.run(verbose=True)
    assert ran == STAGES
    assert eng.stages_done() == STAGES
    assert eng.run() == []  # idempotent: everything committed

    got = sorted(map(tuple, store.read(SURVIVORS_TABLE).collect()))
    assert got == _one_shot_survivors(spark, store)
    # structure: 12 fetched, 1 quality-gated, 1 exact-dropped; clusters
    # {0,1,2} text and {5,6} phash collapse -> 7 survivors
    assert len(got) == 7
    assert sorted(r[1] for r in got) == [1, 1, 1, 1, 1, 2, 3]

    lin = {r["stage"]: (r["rows_in"], r["rows_out"])
           for r in store.read(LINEAGE_TABLE).collect()}
    assert lin["quality"] == (12, 11)      # doc 7 gated out
    assert lin["exact"] == (11, 10)        # doc 4 exact-dropped
    assert lin["near"] == (10, 3)          # cluster {0,1,2} pairs
    assert lin["phash"] == (10, 1)         # pair (5,6)
    assert lin["components"] == (10, 10)   # every kept doc labeled
    assert lin["survivors"] == (10, 7)


def test_curate_kill_and_resume_equivalence(spark, tmp_path):
    """Killed after 2 stages, a cold-resumed engine skips the committed
    stages and the final survivor set is identical to the uninterrupted
    run's."""
    from crawler_core_spark.plans.curate import (
        STAGES,
        SURVIVORS_TABLE,
        CurationEngine,
    )

    store = _curation_warehouse(spark, str(tmp_path / "curwh2"))
    eng = CurationEngine(spark, store, **CURATE_KW)
    assert eng.run(max_stages=2) == STAGES[:2]
    # cold resume: brand-new engine over the committed store
    eng2 = CurationEngine(spark, store, **CURATE_KW)
    assert eng2.run() == STAGES[2:]
    got = sorted(map(tuple, store.read(SURVIVORS_TABLE).collect()))
    assert got == _one_shot_survivors(spark, store)


def test_curate_commit_conflict_guard(spark, tmp_path):
    """A concurrent writer committing to a curation table between a
    stage's state read and its commit raises CommitConflictError (with
    the progress marker for the CLI retry budget); a plain re-run
    completes and still matches the one-shot semantics."""
    from crawler_core_spark.plans.curate import (
        EXACT_TABLE,
        SURVIVORS_TABLE,
        CurationEngine,
    )
    from crawler_core_spark.storage import CommitConflictError, TableStore

    store = _curation_warehouse(spark, str(tmp_path / "curwh3"))
    eng = CurationEngine(spark, store, **CURATE_KW)

    intruder = TableStore(spark, store.root)
    original_commit = store.commit
    state = {"fired": False}

    def hijacked(staged, meta=None, expected_base=None):
        if not state["fired"] and EXACT_TABLE in staged:
            state["fired"] = True
            intruder.write(
                spark.createDataFrame([(1, 1)], "doc_key: long, group_n: long"),
                EXACT_TABLE,
                mode="append",
            )
        return original_commit(staged, meta=meta, expected_base=expected_base)

    store.commit = hijacked
    with pytest.raises(CommitConflictError) as ei:
        eng.run()
    store.commit = original_commit
    assert ei.value.batches_committed == 1  # quality committed, exact lost

    # re-run: quality skipped, exact re-derived from fresh state, done
    eng2 = CurationEngine(spark, store, **CURATE_KW)
    ran = eng2.run()
    assert ran[0] == "exact"
    got = sorted(map(tuple, store.read(SURVIVORS_TABLE).collect()))
    assert got == _one_shot_survivors(spark, store)


def test_cli_curate_command(spark, tmp_path):
    """The spark-submit surface: `curate -warehouse ...` drains all six
    stages with conflict retries and resumes via -maxStages."""
    from crawler_core_spark.cli import main
    from crawler_core_spark.plans.curate import STAGES, SURVIVORS_TABLE, CurationEngine
    from crawler_core_spark.storage import TableStore

    root = str(tmp_path / "curcli")
    _curation_warehouse(spark, root)
    args = [
        "curate", "-warehouse", root,
        "-qualityThreshold", "0.08", "-jaccardThreshold", "0.8",
        "-maxHamming", "0",  # synth gradient phashes all within hamming<=3
    ]
    assert main(args + ["-maxStages", "2"]) == 0
    store = TableStore(spark, root)
    assert CurationEngine(spark, store).stages_done() == STAGES[:2]
    assert main(args) == 0
    assert CurationEngine(spark, store).stages_done() == STAGES
    assert store.read(SURVIVORS_TABLE).count() == 7


# ------------------------------------------- components stress instrumentation

def test_connected_components_stats_and_chain_round_bound(spark):
    """Directive r4-#7 (small-scale pin; bench.py runs the 10^6 leg): a
    diameter-n chain converges in O(log n) rounds — never O(n) — and the
    per-round shuffled edge volume stays O(n)."""
    import math

    from crawler_core_spark.operators.components import connected_components

    n = 4096  # chain diameter 4096; naive propagation would need 4096 rounds
    edges = spark.range(n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stats = {}
    cc = connected_components(edges, stats=stats)
    assert cc.select("component").distinct().count() == 1
    assert cc.count() == n + 1  # every chain node labeled
    assert stats["rounds"] <= int(math.log2(n)) + 6, stats["rounds"]
    assert len(stats["edges_per_round"]) == stats["rounds"]
    # shuffle volume: each round's edge set is O(n), never quadratic
    assert max(stats["edges_per_round"]) <= 2 * n, stats["edges_per_round"]
    # converged star forest: one root, n member edges
    assert stats["edges_per_round"][-1] == n


def _extend_curation_warehouse(spark, store):
    """Second bulk scan into the same warehouse: 6 new hosts, one of
    whose captions near-dups the existing {0,1,2} text cluster."""
    import pandas as pd

    from crawler_core_spark import synth
    from crawler_core_spark.plans.crawl import CrawlEngine
    from crawler_core_spark.sources.denylist import load_denylist
    from crawler_core_spark.sources.dns import dns_table
    from crawler_core_spark.sources.targets import target_file_df

    rows = [synth.make_image_row(i) for i in range(12, 18)]
    caps = {
        12: CLUSTER_BASE + " delta",  # joins the {0,1,2} cluster
        13: "astronaut repairs solar panel outside orbital station module",
        14: "farmers harvest golden wheat under towering cumulus clouds",
        15: "street musician plays violin beneath glowing neon signage",
        16: "divers photograph coral reef teeming with tropical fish",
        17: "archivist carefully restores medieval manuscript with delicate tools",
    }
    for i, r in zip(range(12, 18), rows):
        r["caption"] = caps[i]
    hosts = [synth.host_for_image(i) for i in range(12, 18)]
    eng = CrawlEngine(spark, store, spark.createDataFrame(pd.DataFrame(rows)))
    eng.publish(
        target_file_df(spark, lines=hosts),
        dns_table(spark, {h: synth.ip_for_image(i) for i, h in enumerate(hosts, 12)}),
        load_denylist(spark, lines=[]),
        spark.createDataFrame([("*", "/", True, 1.0)], synth.ROBOTS_SCHEMA),
        "bs-cur2",
    )
    eng.run()


def test_curate_force_recurates_after_new_results(spark, tmp_path):
    """A finished warehouse re-curates with force=True after the crawl
    appended new results: plain run() is a no-op, the forced pass
    rebuilds every stage over the enlarged corpus, a KILLED forced pass
    resumes with a plain run (pass-aware stages_done), and lineage
    lookups stay well-defined across passes (monotone seq)."""
    from crawler_core_spark.plans.curate import (
        LINEAGE_TABLE,
        STAGES,
        SURVIVORS_TABLE,
        CurationEngine,
    )

    store = _curation_warehouse(spark, str(tmp_path / "curf"))
    eng = CurationEngine(spark, store, **CURATE_KW)
    assert eng.run() == STAGES  # pass 1

    _extend_curation_warehouse(spark, store)
    assert eng.run() == []  # plain run: pass 1 complete, no-op

    # forced pass 2, killed after 2 stages -> PLAIN run resumes it
    assert eng.run(force=True, max_stages=2) == STAGES[:2]
    assert eng.stages_done() == STAGES[:2]  # pass-aware: new pass underway
    assert eng.run() == STAGES[2:]

    got = sorted(map(tuple, store.read(SURVIVORS_TABLE).collect()))
    assert got == _one_shot_survivors(spark, store)
    # 18 fetched docs, 1 quality-gated, 1 exact-dropped; clusters
    # {0,1,2,12} and {5,6} collapse -> 12 survivors, one of size 4
    assert len(got) == 12
    assert sorted(r[1] for r in got) == [1] * 10 + [2, 4]

    # lineage: two rows per stage now; the seq-max row is pass 2's
    lin = store.read(LINEAGE_TABLE).filter(F.col("stage") == "quality").collect()
    assert len(lin) == 2
    assert eng._lineage_out("quality") == 17  # 18 docs, doc 7 gated


def test_cli_controller_with_robots_txt_bodies(spark, tmp_path):
    """-robotsTxt: the controller parses RAW robots.txt bodies into rules
    distributed (sources/robots.py) and enforces them at publish — the
    full user path from fetched robots files to ROBOTS_BLOCKED rows."""
    from crawler_core_spark import synth
    from crawler_core_spark.cli import main
    from crawler_core_spark.sources.dns import dns_table
    from crawler_core_spark.storage import TableStore

    hosts = [synth.host_for_image(i) for i in range(6)]
    host_file = tmp_path / "hosts.txt"
    host_file.write_text("\n".join(hosts) + "\n")
    img_path = str(tmp_path / "imgs.parquet")
    spark.createDataFrame(synth.images_pandas(6)).write.parquet(img_path)
    dns_path = str(tmp_path / "dns.parquet")
    dns_table(
        spark, {h: synth.ip_for_image(i) for i, h in enumerate(hosts)}
    ).write.parquet(dns_path)
    # hosts 0/1: robots forbids everything for our UA; others allow
    bodies = spark.createDataFrame(
        [
            (hosts[0], "User-agent: graftbot\nDisallow: /"),
            (hosts[1], "User-agent: *\nDisallow: /\nUser-agent: graftbot\nDisallow: /"),
            (hosts[2], "User-agent: graftbot\nDisallow:\nCrawl-delay: 1"),
            (hosts[3], "User-agent: otherbot\nDisallow: /"),  # not our UA
        ],
        "host STRING, robots_txt STRING",
    )
    rt_path = str(tmp_path / "robots_txt.parquet")
    bodies.write.parquet(rt_path)
    wh = str(tmp_path / "wh-rt")
    rc = main([
        "controller", "-hostFile", str(host_file), "-warehouse", wh,
        "-images", img_path, "-dns", dns_path, "-robotsTxt", rt_path,
        "-userAgent", "graftbot/1.0", "-scanName", "bs-rt",
        "-urlSeen", "exact", "-reexecutions", "1",
    ])
    assert rc == 0
    store = TableStore(spark, wh)
    res = {r["hostname"]: r["status"] for r in store.read("results").collect()}
    assert res[hosts[0]] == "ROBOTS_BLOCKED"
    assert res[hosts[1]] == "ROBOTS_BLOCKED"
    for h in hosts[2:]:
        assert res[h] == "SUCCESS", (h, res[h])
    # both flags together is an error
    with pytest.raises(SystemExit, match="not both"):
        main([
            "controller", "-hostFile", str(host_file), "-warehouse", wh,
            "-images", img_path, "-robots", rt_path, "-robotsTxt", rt_path,
        ])


def test_cli_curate_force_flag(spark, tmp_path):
    """`curate -force` re-runs all six stages on a finished warehouse."""
    from crawler_core_spark.cli import main
    from crawler_core_spark.plans.curate import STAGES, CurationEngine
    from crawler_core_spark.storage import TableStore

    root = str(tmp_path / "curcf")
    _curation_warehouse(spark, root)
    args = [
        "curate", "-warehouse", root,
        "-qualityThreshold", "0.08", "-maxHamming", "0",
    ]
    assert main(args) == 0
    store = TableStore(spark, root)
    n_commits_after_pass1 = store.commit_count()
    assert main(args) == 0  # plain rerun: no-op
    assert store.commit_count() == n_commits_after_pass1
    assert main(args + ["-force"]) == 0  # forced pass 2: all 6 stages again
    assert store.commit_count() == n_commits_after_pass1 + len(STAGES)
    assert CurationEngine(spark, store).stages_done() == STAGES
