"""Resumable curation job — the K6 exactly-once contract applied to the
LLM-training-data curation pipeline (VERDICT r4 #1).

``doc_curation_survivors`` (plans/queries.py) proves the curation
OPERATORS as a one-shot query; a training-data user needs them as an
ENGINE JOB over the crawl warehouse: quality gate -> exact dedup ->
near-dup text edges -> phash visual edges -> connected components ->
survivors, where every stage commits atomically (output table + lineage
row in ONE commit-log entry), a killed run resumes by skipping committed
stages, and concurrent writers are caught by the same optimistic
``expected_base`` validation the crawl loop uses
(reference analogue: the controller/worker exactly-once hand-off,
``persistence/`` + ``core/Controller.java`` — here applied to curation).

Scale notes (the 100 TB shape):
- every stage reads the PREVIOUS stage's committed table, never the raw
  corpus again — a resume re-scans only what the next stage needs;
- near-dup edges come from banded MinHash-LSH (only (id, band_sig)
  shuffles) and 16-bit-chunk phash banding — nothing all-pairs;
- components is the O(log² n) large-star/small-star loop;
- stage outputs are id-typed projections (doc_key longs, edges, labels);
  caption text lives only in cur_docs, written once at the quality gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from crawler_core_spark.storage import TableStore

DOCS_TABLE = "cur_docs"
EXACT_TABLE = "cur_exact"
EDGES_TABLE = "cur_edges"
COMPONENTS_TABLE = "cur_components"
SURVIVORS_TABLE = "cur_survivors"
LINEAGE_TABLE = "cur_lineage"

STAGES = ["quality", "exact", "near", "phash", "components", "survivors"]


def curation_one_shot(
    docs: DataFrame,
    quality_threshold: float = 0.35,
    jaccard_threshold: float = 0.8,
    max_hamming: int = 3,
    n_hashes: int = 16,
    bands: int = 16,
    max_bucket: int | None = 64,
) -> DataFrame:
    """The whole pipeline as ONE lazy plan over (doc_key, text, phash) —
    the semantic spec the staged engine must reproduce (and the parity
    target of the kill-and-resume E2E).  Same stage composition as
    ``CurationEngine.run``, no store, no commits."""
    from crawler_core_spark.functions.text import quality_score_col
    from crawler_core_spark.operators.components import assign_components
    from crawler_core_spark.operators.dedup import (
        exact_dedup,
        hamming_pairs,
        minhash_lsh_pairs,
    )

    gated = docs.select(
        "doc_key", "text", "phash",
        F.round(quality_score_col("text"), 6).alias("quality"),
    ).filter(F.col("quality") >= quality_threshold)
    exact = exact_dedup(gated, "doc_key", "text")
    keep = gated.join(exact.select("doc_key"), "doc_key")
    text_edges = minhash_lsh_pairs(
        keep, id_col="doc_key", text_col="text", n_hashes=n_hashes,
        bands=bands, verify_threshold=jaccard_threshold, max_bucket=max_bucket,
    ).select("id_a", "id_b")
    phash_edges = hamming_pairs(
        keep.filter(F.col("phash").isNotNull()), "doc_key", "phash",
        max_hamming=max_hamming, max_bucket=max_bucket,
    ).select("id_a", "id_b")
    comp = assign_components(
        keep.select("doc_key"), text_edges.unionByName(phash_edges), "doc_key"
    )
    return (
        comp.join(
            keep.select(F.col("doc_key").alias("id"), "quality"), "id"
        )
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(F.min("quality"), 6).alias("min_quality"),
        )
        .select(
            F.col("component").alias("survivor_doc_key"),
            "n_members",
            "min_quality",
        )
    )


class CurationEngine:
    """Stage-at-a-time curation over a crawl warehouse's results table.

    Each ``run()`` executes the stages not yet committed (resume = skip),
    in order; each stage's output table and its lineage row land in one
    atomic commit guarded by ``expected_base`` captured before the stage
    read its inputs — a concurrent writer touching the same tables turns
    into ``CommitConflictError`` (with ``batches_committed`` = stages this
    run finished, so the CLI's progress-aware retry budget applies
    unchanged)."""

    def __init__(
        self,
        spark: SparkSession,
        store: TableStore,
        quality_threshold: float = 0.35,
        jaccard_threshold: float = 0.8,
        max_hamming: int = 3,
        n_hashes: int = 16,
        bands: int = 16,
        max_bucket: int | None = 64,
        results_table: str = "results",
    ):
        self.spark = spark
        self.store = store
        self.quality_threshold = float(quality_threshold)
        self.jaccard_threshold = float(jaccard_threshold)
        self.max_hamming = int(max_hamming)
        self.n_hashes = int(n_hashes)
        self.bands = int(bands)
        self.max_bucket = max_bucket
        self.results_table = results_table

    # -------------------------------------------------------------- state
    def stages_done(self) -> list[str]:
        """Stages committed in the CURRENT curation pass (from the commit
        log's meta — the same resume source the crawl loop uses for
        clock/batch_id).  'quality' is always a pass's FIRST commit (plain
        runs skip it once committed; force re-runs start there), so a new
        'quality' entry after any other stage marks a new pass and resets
        the list — whether the previous pass finished or was killed
        mid-way.  A killed ``force=True`` pass therefore resumes like any
        other: only the new pass's stages count as done, and a plain
        run() finishes it against the new pass's fresh outputs (review
        r5: the old rule reset only after 'survivors', so forcing over an
        UNFINISHED pass resumed against the stale pass's tables)."""
        cur: list[str] = []
        for e in self.store.log():
            meta = e.get("meta") or {}
            if meta.get("kind") == "curation" and meta.get("cur_stage"):
                if cur and meta["cur_stage"] == STAGES[0]:
                    cur = []  # a fresh first-stage commit = a new pass
                cur.append(meta["cur_stage"])
        return cur

    def _lineage_out(self, stage: str) -> int:
        rows = (
            self.store.read(LINEAGE_TABLE)
            .filter(F.col("stage") == stage)
            .collect()
        )
        if not rows:
            raise ValueError(f"stage {stage!r} committed no lineage row")
        # re-curation appends a second row per stage and snapshot read
        # order is NOT commit order — the monotone seq disambiguates
        return int(max(rows, key=lambda r: r["seq"])["rows_out"])

    def _commit_stage(
        self, stage: str, staged: dict, rows_in: int, rows_out: int, base: int
    ) -> None:
        staged[LINEAGE_TABLE] = (
            "append",
            self.store.stage(
                self.spark.createDataFrame(
                    [(stage, int(rows_in), int(rows_out), int(base))],
                    "stage: string, rows_in: long, rows_out: long, seq: long",
                ),
                LINEAGE_TABLE,
            ),
        )
        self.store.commit(
            staged,
            expected_base=base,
            meta={"kind": "curation", "cur_stage": stage},
        )

    def _staged_count(self, rel: str) -> int:
        """Row count of a staged (not yet visible) snapshot — parquet
        footer metadata only, no data scan."""
        import os

        return self.spark.read.parquet(os.path.join(self.store.root, rel)).count()

    # -------------------------------------------------------------- stages
    def _stage_quality(self) -> None:
        from crawler_core_spark.functions.text import quality_score_col
        from crawler_core_spark.operators.results import latest_result_per_job

        base = self.store.commit_count()
        obs = Observation()
        # doc identity is URL-keyed, and multi-scan crawls (-scanRuns > 1
        # with per-scan URL-seen scopes) legitimately append several
        # SUCCESS rows per url_canon — latest-result-wins (the canonical
        # O2 operator, keyed by doc_key) BEFORE curation, or a re-crawled
        # doc enters every downstream stage twice (review r5)
        docs = latest_result_per_job(
            self.store.read(self.results_table)
            .filter(
                (F.col("status") == "SUCCESS")
                & F.col("result_caption").isNotNull()
            )
            .select(
                # results rows don't carry url_key (FRONTIER col); the doc
                # identity is re-derived exactly as publish derived it:
                # xxhash64(url_canon) == functions/url.url_key_col
                F.xxhash64(F.col("url_canon")).alias("doc_key"),
                F.col("result_caption").alias("text"),
                F.col("result_phash").alias("phash"),
                "ts", "batch_id", "crawl_pos",
            )
            .observe(obs, F.count(F.lit(1)).alias("n_in")),
            key="doc_key",
        ).select("doc_key", "text", "phash").withColumn(
            "quality", F.round(quality_score_col("text"), 6)
        ).filter(F.col("quality") >= self.quality_threshold)
        rel = self.store.stage(docs, DOCS_TABLE)
        self._commit_stage(
            "quality",
            {DOCS_TABLE: ("replace", rel)},
            rows_in=int(obs.get["n_in"]),
            rows_out=self._staged_count(rel),
            base=base,
        )

    def _stage_exact(self) -> None:
        from crawler_core_spark.operators.dedup import exact_dedup

        base = self.store.commit_count()
        gated = self.store.read(DOCS_TABLE)
        exact = exact_dedup(gated, "doc_key", "text")
        rel = self.store.stage(exact, EXACT_TABLE)
        self._commit_stage(
            "exact",
            {EXACT_TABLE: ("replace", rel)},
            rows_in=self._lineage_out("quality"),
            rows_out=self._staged_count(rel),
            base=base,
        )

    def _keep(self) -> DataFrame:
        """Exact-dedup survivors with text/phash/quality (the working set
        of every post-exact stage)."""
        return self.store.read(DOCS_TABLE).join(
            self.store.read(EXACT_TABLE).select("doc_key"), "doc_key"
        )

    def _stage_near(self) -> None:
        from crawler_core_spark.operators.dedup import minhash_lsh_pairs

        base = self.store.commit_count()
        edges = minhash_lsh_pairs(
            self._keep(), id_col="doc_key", text_col="text",
            n_hashes=self.n_hashes, bands=self.bands,
            verify_threshold=self.jaccard_threshold,
            max_bucket=self.max_bucket,
        ).select("id_a", "id_b", F.lit("text").alias("kind"))
        rel = self.store.stage(edges, EDGES_TABLE)
        self._commit_stage(
            "near",
            {EDGES_TABLE: ("replace", rel)},
            rows_in=self._lineage_out("exact"),
            rows_out=self._staged_count(rel),
            base=base,
        )

    def _stage_phash(self) -> None:
        from crawler_core_spark.operators.dedup import hamming_pairs

        base = self.store.commit_count()
        edges = hamming_pairs(
            self._keep().filter(F.col("phash").isNotNull()),
            "doc_key", "phash",
            max_hamming=self.max_hamming, max_bucket=self.max_bucket,
        ).select("id_a", "id_b", F.lit("phash").alias("kind"))
        rel = self.store.stage(edges, EDGES_TABLE)
        self._commit_stage(
            "phash",
            {EDGES_TABLE: ("append", rel)},
            rows_in=self._lineage_out("exact"),
            rows_out=self._staged_count(rel),
            base=base,
        )

    def _stage_components(self) -> None:
        from crawler_core_spark.operators.components import assign_components

        base = self.store.commit_count()
        edges = (
            self.store.read(EDGES_TABLE)
            if self.store.exists(EDGES_TABLE)
            else self.spark.createDataFrame(
                [], "id_a: long, id_b: long, kind: string"
            )
        )
        comp = assign_components(
            self.store.read(EXACT_TABLE).select("doc_key"),
            edges.select("id_a", "id_b"),
            "doc_key",
        )
        rel = self.store.stage(comp, COMPONENTS_TABLE)
        self._commit_stage(
            "components",
            {COMPONENTS_TABLE: ("replace", rel)},
            rows_in=self._lineage_out("exact"),
            rows_out=self._staged_count(rel),
            base=base,
        )

    def _stage_survivors(self) -> None:
        base = self.store.commit_count()
        keep = self._keep().select(F.col("doc_key").alias("id"), "quality")
        surv = (
            self.store.read(COMPONENTS_TABLE)
            .join(keep, "id")
            .groupBy("component")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_members"),
                F.round(F.min("quality"), 6).alias("min_quality"),
            )
            .select(
                F.col("component").alias("survivor_doc_key"),
                "n_members",
                "min_quality",
            )
        )
        rel = self.store.stage(surv, SURVIVORS_TABLE)
        self._commit_stage(
            "survivors",
            {SURVIVORS_TABLE: ("replace", rel)},
            rows_in=self._lineage_out("components"),
            rows_out=self._staged_count(rel),
            base=base,
        )

    # ----------------------------------------------------------------- run
    def run(
        self,
        max_stages: int | None = None,
        verbose: bool = False,
        force: bool = False,
    ) -> list[str]:
        """Execute the not-yet-committed stages in order; returns the
        stage names run.  ``max_stages`` bounds this invocation (the
        kill-and-resume test's interruption point).  ``force=True``
        re-curates a finished warehouse (the crawl appended new results
        since the last pass): every stage re-runs — safe because stage
        outputs are replace-mode snapshots (the phash edges append rides
        the near stage's fresh replace) and lineage rows carry a monotone
        seq so readers always see the latest pass."""
        from crawler_core_spark.storage import CommitConflictError

        fns = {
            "quality": self._stage_quality,
            "exact": self._stage_exact,
            "near": self._stage_near,
            "phash": self._stage_phash,
            "components": self._stage_components,
            "survivors": self._stage_survivors,
        }
        done = set() if force else set(self.stages_done())
        ran: list[str] = []
        for stage in STAGES:
            if stage in done:
                continue
            if max_stages is not None and len(ran) >= int(max_stages):
                break
            try:
                fns[stage]()
            except CommitConflictError as e:
                # progress marker for the CLI's consecutive-fruitless
                # retry budget (same contract as CrawlEngine.run)
                e.batches_committed = len(ran)
                raise
            ran.append(stage)
            if verbose:
                print(f"curate: stage {stage} committed")
        return ran
