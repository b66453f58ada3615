"""Round-4 review-pass pins: path-internal '//' in seeds, arrow-banding
null/ragged robustness, pre-url_path warehouse resume, simhash twin
beyond Latin-1, single-scan IVF training (plan pinned in test_round4),
and the worker conflict-retry budget semantics.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_core_spark.storage import CommitConflictError, TableStore


# ---------------------------------------------------------------------------
# parse_paths: '//' is a protocol separator ONLY as '<scheme>://' or a
# leading protocol-relative '//' — path-internal '//' is path content
# ---------------------------------------------------------------------------

_SPLIT_CASES = [
    # (seed line, expected stripped target, expected url_path)
    ("example.com/a//b", "example.com", "/a//b"),
    ("example.com//x", "example.com", "//x"),
    ("https://example.com/a", "https://example.com", "/a"),
    ("//example.com/x", "//example.com", "/x"),
    ("example.com", "example.com", "/"),
    ("https://example.com", "https://example.com", "/"),
    ("git+ssh://example.com/repo", "git+ssh://example.com", "/repo"),
]


def test_oracle_path_split_protocol_vs_path_internal_double_slash():
    from crawler_core_spark.oracle import _split_path

    for line, target, path in _SPLIT_CASES:
        assert _split_path(line) == (target, path), line


def test_engine_path_split_matches_oracle(spark):
    """The native split in parse_and_route(parse_paths=True) must agree
    with the oracle mirror on every '//' shape — a schemeless seed with a
    path-internal '//' used to lose its whole path (both sides)."""
    from crawler_core_spark.operators.publish import parse_and_route
    from crawler_core_spark.sources.denylist import load_denylist
    from crawler_core_spark.sources.dns import dns_table
    from crawler_core_spark.sources.targets import target_file_df

    lines = [c[0] for c in _SPLIT_CASES]
    p = parse_and_route(
        target_file_df(spark, lines=lines),
        dns_table(spark, {"example.com": "10.0.0.1"}),
        load_denylist(spark, lines=[]),
        "bs-split",
        parse_paths=True,
    )
    got = {
        r["seq"]: (r["target"], r["url_path"])
        for r in p.all_jobs.select("seq", "target", "url_path").collect()
    }
    for seq, (line, target, path) in enumerate(_SPLIT_CASES):
        assert got[seq] == (target, path), line


# ---------------------------------------------------------------------------
# arrow banding: NULL / empty / ragged embeddings must not kill the stage
# ---------------------------------------------------------------------------

def test_arrow_banding_survives_null_and_ragged_vectors(spark):
    from crawler_core_spark.operators.ann import lsh_near_dup_pairs

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # exact dup of 0 -> must pair
        (2, None),                    # NULL embedding
        (3, []),                      # empty embedding
        (4, [1.0, 2.0, 3.0]),         # ragged dimension (3 != 4)
        (5, [0.0, 1.0, 0.0, 0.0]),    # orthogonal -> below threshold
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in lsh_near_dup_pairs(
            df, threshold=0.9, n_planes=3, n_bands=8, max_bucket=None,
            impl="arrow",
        ).collect()
    }
    assert (0, 1) in got and got[(0, 1)] == pytest.approx(1.0)
    # no pair involves a null/empty/ragged row, and nothing crashed
    bad = {2, 3, 4}
    assert all(a not in bad and b not in bad for a, b in got)


# ---------------------------------------------------------------------------
# resume: a frontier written before the url_path column existed must
# still drain (normalized to '/' on read), not die in a FRONTIER_COLS
# projection mid-batch
# ---------------------------------------------------------------------------

def test_resume_frontier_without_url_path_column(spark, tmp_path):
    import pandas as pd

    from crawler_core_spark import oracle, synth
    from crawler_core_spark.plans.crawl import CrawlEngine
    from crawler_core_spark.sources.denylist import load_denylist
    from crawler_core_spark.sources.dns import dns_table
    from crawler_core_spark.sources.targets import target_file_df

    n = 6
    lines = synth.seed_lines(n)
    dns_map = synth.dns_mappings(n)
    robots = spark.createDataFrame(synth.robots_rules(n), synth.ROBOTS_SCHEMA)
    pdf = pd.DataFrame([synth.make_image_row(i) for i in range(n)])

    store = TableStore(spark, str(tmp_path / "oldwh"))
    eng = CrawlEngine(spark, store, spark.createDataFrame(pdf))
    eng.publish(target_file_df(spark, lines=lines), dns_table(spark, dns_map),
                load_denylist(spark, lines=synth.DENYLIST_LINES), robots, "bs-old")

    # simulate a pre-round-4 warehouse: rewrite the frontier WITHOUT the
    # url_path column (replace = a fresh merge-chain base, valid layout)
    old = store.read("frontier").drop("url_path")
    rel = store.stage(old.repartition(1, F.col("fpart")), "frontier",
                      partition_by=["fpart"])
    store.commit({"frontier": ("replace", rel)})

    eng2 = CrawlEngine(spark, store, spark.createDataFrame(pdf))
    eng2.run()

    jobs = oracle.publish_oracle(lines, dns_map, synth.DENYLIST_LINES,
                                 synth.robots_rules(n))
    run = oracle.crawl_oracle(
        jobs, {r["image_id"]: {"bytes": r["bytes"]} for _, r in pdf.iterrows()}
    )
    got = {r["seq"]: r["status"] for r in store.read("results").collect()}
    assert got == {j.seq: j.status for j in run.jobs}


# ---------------------------------------------------------------------------
# simhash poly twin: exact beyond Latin-1 (codepoints up to 0x10FFFF push
# the polynomial hash past 2^43; the twin must carry bits up to 2^55)
# ---------------------------------------------------------------------------

def _poly_hash_py(tok: str, k: int = 8, base: int = 31) -> int:
    h = 0
    for j in range(k):
        code = ord(tok[j]) if len(tok) > j else 0
        h += code * base ** (k - 1 - j)
    return h


def test_poly_token_hash_agrees_cross_engine_beyond_latin1(spark):
    from crawler_core_spark.functions.text import poly_token_hash_col

    toks = ["the", "Straße", "中文字符测试串", "🙂🙃🙂🙃", "naïve-café"]
    want = {t: _poly_hash_py(t) for t in toks}
    # the regression: at least one real-world token exceeds the old 2^43
    # Latin-1 bound (its high bits were silently zeroed in the oracle)
    assert any(v >= (1 << 43) for v in want.values())
    assert all(v < (1 << 55) for v in want.values())

    df = spark.createDataFrame([(t,) for t in toks], "tok: string")
    got_spark = {
        r["tok"]: r["h"]
        for r in df.select("tok", poly_token_hash_col(F.col("tok")).alias("h")).collect()
    }
    assert got_spark == want

    con = duckdb.connect()
    k, base = 8, 31
    poly = " + ".join(
        f"(CASE WHEN length(tok) > {j} THEN ord(substring(tok, {j + 1}, 1)) "
        f"ELSE 0 END) * CAST({base ** (k - 1 - j)} AS BIGINT)"
        for j in range(k)
    )
    got_duck = {
        t: con.execute(f"SELECT {poly} FROM (SELECT ? AS tok)", [t]).fetchone()[0]
        for t in toks
    }
    assert got_duck == want


def test_simhash_twin_sql_carries_unicode_bits():
    from crawler_core_spark.plans.queries import SQL_DOC_SIMHASH_EXACT_TWIN

    # bits 43..54 are reachable by non-Latin-1 tokens and must be summed
    assert "b54" in SQL_DOC_SIMHASH_EXACT_TWIN
    assert "b43" in SQL_DOC_SIMHASH_EXACT_TWIN


# ---------------------------------------------------------------------------
# worker conflict-retry budget: N retries = N+1 attempts
# ---------------------------------------------------------------------------

class _FlakyEngine:
    def __init__(self, fail_times: int):
        self.fail_times = fail_times
        self.attempts = 0

    def run(self, **kw):
        self.attempts += 1
        if self.attempts <= self.fail_times:
            raise CommitConflictError(f"conflict #{self.attempts}")
        return ["batch"]


def test_conflict_retry_budget_is_retries_not_attempts():
    from crawler_core_spark.cli import run_with_conflict_retries

    # N conflicts with max_retries=N: every conflict gets its retry
    eng = _FlakyEngine(fail_times=1)
    assert run_with_conflict_retries(eng, 1) == ["batch"]
    assert eng.attempts == 2

    eng = _FlakyEngine(fail_times=3)
    assert run_with_conflict_retries(eng, 3) == ["batch"]
    assert eng.attempts == 4

    # the (N+1)-th conflict aborts
    eng = _FlakyEngine(fail_times=99)
    with pytest.raises(SystemExit):
        run_with_conflict_retries(eng, 2)
    assert eng.attempts == 3


class _ProgressingEngine:
    """Every attempt drains batches before losing its race: progress."""

    def __init__(self, fail_times: int):
        self.fail_times = fail_times
        self.attempts = 0

    def run(self, **kw):
        self.attempts += 1
        if self.attempts <= self.fail_times:
            e = CommitConflictError(f"conflict #{self.attempts}")
            e.batches_committed = 1
            raise e
        return ["batch"]


def test_conflict_budget_resets_on_progress():
    """A long contested drain loses many races while advancing — the
    budget counts CONSECUTIVE FRUITLESS attempts, so conflicts whose run
    committed batches never accumulate toward the abort."""
    from crawler_core_spark.cli import run_with_conflict_retries

    eng = _ProgressingEngine(fail_times=10)  # >> max_retries=2
    assert run_with_conflict_retries(eng, 2) == ["batch"]
    assert eng.attempts == 11


def test_publish_conflict_retry_helper():
    from crawler_core_spark.cli import call_with_conflict_retries

    calls = {"n": 0}

    def flaky_publish():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise CommitConflictError("worker won the race")
        return {"published": True}

    assert call_with_conflict_retries(flaky_publish, 3, "t")["published"]
    assert calls["n"] == 3

    calls["n"] = -99  # always conflicts
    with pytest.raises(SystemExit):
        call_with_conflict_retries(flaky_publish, 1, "t")


def test_explicit_iceberg_jar_path_typo_raises(monkeypatch):
    from crawler_core_spark.iceberg import find_iceberg_jar

    monkeypatch.setenv("SPARK_GRAFT_ICEBERG_JAR", "/no/such/iceberg.jar")
    with pytest.raises(RuntimeError, match="does not exist"):
        find_iceberg_jar()
