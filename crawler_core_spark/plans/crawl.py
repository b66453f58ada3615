"""The crawl engine — publish + micro-batch fetch loop with atomic commits.

Architecture (SURVEY.md §3 Spark translation): the reference's
controller/worker/RabbitMQ topology collapses into a driver ``while``
loop over self-scheduled micro-batches; every batch ends in ONE atomic
multi-table commit {results append, frontier replace, host_state replace,
url_seen add, counters append} + checkpoint metadata (K6), so a killed
run resumes mid-frontier from the last commit with nothing lost and
nothing double-fetched — the exactly-once upgrade of the reference's
ack-until-persisted protocol (RabbitMqOrchestrationProvider.java:140-187).

Structured Streaming is deliberately NOT used (SURVEY.md §7.2): batches
are self-scheduled by the politeness clock and Iceberg-style commits give
resumability; readStream would add state-store machinery without adding
semantics.

Reference semantics modeled per batch (round 2):
- scan-config propagation (ControllerTest.java:54-121): every frontier
  row carries the ScanConfig struct + an ``attempt`` counter.
- reexecutions (ScanConfig.java:41): ERROR/CRAWLER_ERROR attempts with
  ``attempt < reexecutions`` persist their result row AND requeue with
  attempt+1 (each execution persists; O2 latest-wins on retrieval).
- INTERNAL_ERROR (Worker.java:108-112): nothing persisted, the job is
  redelivered (stays in the frontier, attempt unchanged) — reachable via
  the ``internal_fault`` injection hook.
- T6 status invariant (MongoPersistenceProvider.java:250-258) and the
  [EXT] payload invariant (phash-fidelity of SUCCESS rows) are COMMIT
  GATES: their violation counts ride the results write as Observation
  metrics (no extra job) and a violation aborts before the commit point,
  leaving only invisible staged files (no partial batch).
- K3 serialization fallback (MongoPersistenceProvider.java:267-275):
  unserializable captions (NUL byte) become SERIALIZATION_ERROR rows.
- K4 RUNNING partials (BulkScanWorker.java:107-116): with
  ``emit_partials``, long-running rows upsert a RUNNING partial into
  ``partial_results`` before the batch commit (the progress stream is
  deliberately OUTSIDE the atomic commit, like the reference's progress
  consumer vs the ack transaction); final results supersede via O2.

Tables:
  frontier    (merge)    — pending TO_BE_EXECUTED rows (+attempt, config),
                           hive-partitioned by fpart = pmod(url_key, P);
                           each batch rewrites only touched partitions
  results     (append)   — terminal rows incl. publish-time errors
  host_state  (replace)  — (host, next_fetch_time, crawl_delay)
  url_seen_*  (append)   — see operators/url_seen.py
  counters    (append)   — per-(batch, seen-partition) lineage:
                           fetched / deduped / deferred / robots_blocked
  bulk_scans  (append)   — scan-run metadata rows (K1/K2 as append-log,
                           latest row wins like O2)
  partial_results (append) — K4 progress-stream upsert log (latest-wins
                           at read via read_partials; periodic compaction)
  notifications (append) — K7/K8 no-op completion webhook rows
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from typing import Callable

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from crawler_core_spark import ERROR_STATUSES, STATUS_NAMES
from crawler_core_spark.config import RETRYABLE_STATUSES, ScanConfig
from crawler_core_spark.operators.fetch import (
    DEFAULT_SCAN_TIMEOUT_MS,
    fetch_hits,
    fetch_misses,
)
from crawler_core_spark.operators.publish import (
    bulk_scan_counters,
    parse_and_route,
)
from crawler_core_spark.operators.results import (
    apply_serialization_guard,
    merge_partials,
)
from crawler_core_spark.operators.scheduler import (
    DEFAULT_BATCH_PERIOD,
    apply_robots,
    salted_repartition,
    select_batch,
    updated_host_state,
)
from crawler_core_spark.operators.rankutil import dense_seq
from crawler_core_spark.operators.url_seen import make_url_seen
from crawler_core_spark.plans.monitor import ProgressMonitor
from crawler_core_spark.storage import CommitConflictError, TableStore

FRONTIER_COLS = [
    "job_id", "bulk_scan_id", "seq", "target", "hostname", "ip", "port",
    "tranco_rank", "priority", "url_canon", "url_key", "url_path", "host",
    "crawl_delay", "attempt", "scan_config",
]

RESULT_COLS = [
    "job_id", "bulk_scan_id", "seq", "hostname", "ip", "port", "tranco_rank",
    "status", "result_status", "attempt", "url_canon", "batch_id",
    "crawl_pos", "ts", "image_id", "result_caption", "result_phash",
    "result_w", "result_h", "result_fmt", "fetch_cost_ms",
]

LINEAGE_PARTITIONS = 16

# ingest-time near-dup tables (committed atomically with each batch)
CORPUS_SIGS_TABLE = "corpus_sigs"          # (doc_key, sig array<long>)
CORPUS_TOKENS_TABLE = "corpus_token_sets"  # (doc_key, toks array<string>)
NEAR_DUPS_TABLE = "near_dups"              # (batch_id, new_key, corpus_key, jaccard)
NEAR_DUP_COUNTERS_TABLE = "near_dup_counters"  # per-batch lineage

_NULL_RESULT_FIELDS = [
    ("image_id", "string"), ("result_caption", "string"),
    ("result_phash", "long"), ("result_w", "int"), ("result_h", "int"),
    ("result_fmt", "string"), ("fetch_cost_ms", "double"),
]


def _with_null_results(df: DataFrame) -> DataFrame:
    for name, typ in _NULL_RESULT_FIELDS:
        df = df.withColumn(name, F.lit(None).cast(typ))
    return df


# Timestamped per-scan collection naming (BulkScan.java:59-60): the
# reference derives a Mongo collection name `name_yyyy-MM-dd_HH-mm` at
# publish; here it's a bulk_scans column so retrieval can address a scan
# run by its formatted name (getCollectionName round-trip, BulkScan.java:91).
COLLECTION_TS_FMT = "yyyy-MM-dd_HH-mm"
_COLLECTION_SUFFIX_RE = r"_\d{4}-\d{2}-\d{2}_\d{2}-\d{2}$"


def collection_name_col(name_col: Column, published_at_col: Column) -> Column:
    """`name_yyyy-MM-dd_HH-mm` via native date_format over the publish
    timestamp (epoch seconds, session timezone)."""
    return F.concat(
        name_col,
        F.lit("_"),
        F.date_format(F.to_timestamp(published_at_col), COLLECTION_TS_FMT),
    )


def scan_name_from_collection(collection_name: str) -> str:
    """Inverse of collection_name_col (the getCollectionName round-trip):
    strip the trailing `_yyyy-MM-dd_HH-mm` stamp."""
    import re

    return re.sub(_COLLECTION_SUFFIX_RE, "", collection_name)


@dataclass
class BatchStats:
    batch_id: int
    fetched: int
    deduped: int
    deferred: int
    requeued: int = 0


class CommitGateError(RuntimeError):
    """An invariant gate fired: the staged batch was NOT committed."""


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: TableStore,
        images: DataFrame,
        url_seen_kind: str = "exact",
        batch_period: float = DEFAULT_BATCH_PERIOD,
        scan_timeout_ms: float = DEFAULT_SCAN_TIMEOUT_MS,
        salt_buckets: int = 8,
        url_seen_kw: dict | None = None,
        broadcast_fetch_limit: int = 4_000_000,
        internal_fault: Callable[[int], Column | None] | None = None,
        invariant_max_hamming: int | None = None,
        emit_partials: bool = False,
        partial_cost_threshold: float | None = None,
        compact_results_every: int | None = None,
        frontier_parts: int = 64,
        compact_frontier_every: int | None = 64,
        images_bucket_col: str | None = None,
        images_buckets: int | None = None,
        images_id_pushdown_cap: int | None = 100_000,
        url_paths: bool = False,
        near_dup_captions: bool = False,
        near_dup_kw: dict | None = None,
    ):
        self.spark = spark
        self.store = store
        self.images = images
        self.batch_period = batch_period
        self.scan_timeout_ms = scan_timeout_ms
        self.salt_buckets = salt_buckets
        self.broadcast_fetch_limit = broadcast_fetch_limit
        self.url_seen = make_url_seen(store, url_seen_kind, **(url_seen_kw or {}))
        self.internal_fault = internal_fault
        self.invariant_max_hamming = invariant_max_hamming
        self.emit_partials = emit_partials
        self.partial_cost_threshold = partial_cost_threshold
        self.compact_results_every = compact_results_every
        # K6 frontier scale contract: the frontier is hive-partitioned by
        # pmod(url_key, frontier_parts); each batch commits a MERGE
        # snapshot rewriting only the partitions that contain selected/
        # requeued rows — per-batch write volume is O(touched partitions),
        # not O(pending frontier) (the bloom-delta pattern applied to the
        # frontier itself; at a 10^10-row frontier the full rewrite was
        # the dominant per-batch cost).  Every compact_frontier_every
        # batches one full replace bounds the merge chain.
        self.frontier_parts = frontier_parts
        self.compact_frontier_every = compact_frontier_every
        # J6 scale contract: when the corpus is hive-partitioned by a
        # bucket of image_id (images_bucket_col, images_buckets), each
        # batch derives its distinct bucket set and pushes it as a
        # partition filter on the corpus scan — a politeness-bounded
        # batch scans O(batch buckets), not the whole 100 TB corpus
        # (runtime-filter / DPP analogue).
        self.images_bucket_col = images_bucket_col
        self.images_buckets = images_buckets
        # Second pruning level: when the batch's distinct image_id count
        # is at most this cap, the literal id set is ALSO pushed as a
        # parquet data filter (In) — row-group min/max + dictionary
        # skipping WITHIN each touched bucket (the corpus writer clusters
        # bucket partitions by image_id for tight row-group stats).  The
        # cap bounds driver memory and plan size; batches are politeness-
        # bounded so it is rarely exceeded.  None disables.
        self.images_id_pushdown_cap = images_id_pushdown_cap
        # [EXT] URL-path granularity: seed lines may carry paths; the
        # frontier's url_path column feeds the general longest-prefix
        # robots matcher (scheduler.robots_match) at publish and the
        # seen-key includes the path.  Off by default — the reference's
        # unit of work is host:port and the constant-root fast path is
        # zero-shuffle.
        self.url_paths = bool(url_paths)
        # [EXT] ingest-time near-dup (VERDICT r4 #4): each batch's SUCCESS
        # captions are minhashed, probed against the PERSISTED corpus
        # projections (corpus_sigs / corpus_token_sets — never the corpus
        # text), and the batch's own projections are appended in the SAME
        # atomic commit.  Per-batch cost is O(new): the corpus side of the
        # probe reads ~(8 x n_hashes + tokens) bytes/doc of projection,
        # and the only text ever hashed is this batch's.
        self.near_dup_captions = bool(near_dup_captions)
        cfg = {"n_hashes": 16, "bands": 4, "threshold": 0.8, "max_bucket": 64}
        cfg.update(near_dup_kw or {})
        self.near_dup_cfg = cfg
        self.step_timings: list[dict] = []  # per-batch driver-step seconds

    def _fpart(self) -> Column:
        return F.pmod(F.col("url_key"), F.lit(self.frontier_parts)).cast("int")

    def _pruned_images(self, batch: DataFrame) -> DataFrame:
        """J6 corpus pruning: restrict the corpus scan to the hive
        buckets the batch can possibly hit.  The batch's distinct bucket
        set (<= images_buckets ints, a bounded driver fetch over the
        politeness-bounded batch) becomes a partition filter on the
        corpus scan — the runtime-filter/DPP analogue.  Correctness is
        unchanged: a corpus row can only join a batch row with the same
        image_id, hence the same bucket; misses are derived batch-side.
        No-op unless the corpus carries the bucket column."""
        from crawler_core_spark.operators.fetch import (
            IMAGES_BUCKETS_DEFAULT,
            image_bucket_col,
            image_id_from_host,
        )

        if (
            not self.images_bucket_col
            or self.images_bucket_col not in self.images.columns
        ):
            return self.images
        n = int(self.images_buckets or IMAGES_BUCKETS_DEFAULT)
        # persisted: the per-bucket count job and the (gated) id collect
        # below both consume it — without the cache the distinct shuffle
        # over the batch would run twice per crawl-loop iteration
        batch_ids = batch.select(
            image_id_from_host(F.col("host")).alias("i")
        ).distinct().persist()
        # Driver contract ("driver sees O(1) rows per batch"): the
        # unconditional collect is the per-bucket distinct-id COUNT —
        # <= images_buckets rows regardless of batch size.  The id-level
        # collect below is gated on that count, so it is bounded by the
        # pushdown cap, never by the batch.
        per_bucket = (
            batch_ids.select(image_bucket_col(F.col("i"), n).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("n_ids"))
            .collect()
        )
        buckets = sorted(int(r["b"]) for r in per_bucket)
        total_ids = int(sum(r["n_ids"] for r in per_bucket))
        pruned = self.images.filter(F.col(self.images_bucket_col).isin(buckets))
        cap = self.images_id_pushdown_cap
        if cap is not None and total_ids <= cap:
            # literal In(image_id, ...) reaches the parquet reader as a
            # data filter: row-group stats + dictionary pages skip the
            # non-hit remainder of each touched bucket.  This collect is
            # capped (<= images_id_pushdown_cap ids) by the check above.
            ids = sorted(r["i"] for r in batch_ids.collect())
            pruned = pruned.filter(F.col("image_id").isin(ids))
        batch_ids.unpersist()
        return pruned

    def near_dup_probe(
        self,
        new_docs: DataFrame,
        new_sigs: DataFrame | None = None,
        new_tokens: DataFrame | None = None,
    ) -> DataFrame:
        """(new_id, corpus_id, jaccard) pairs of THIS batch's docs vs the
        persisted corpus projections.  O(new) by construction: the corpus
        side reads only corpus_sigs / corpus_token_sets (projection
        tables, ~(8·n_hashes + token) bytes/doc) — never the results
        table, never corpus text (pinned by plan assert in tests)."""
        from crawler_core_spark.operators.dedup import incremental_minhash_dedup

        cfg = self.near_dup_cfg
        return incremental_minhash_dedup(
            new_docs,
            id_col="doc_key",
            text_col="text",
            n_hashes=cfg["n_hashes"],
            bands=cfg["bands"],
            threshold=cfg["threshold"],
            max_bucket=cfg["max_bucket"],
            corpus_sigs=self.store.read(CORPUS_SIGS_TABLE),
            corpus_tokens=self.store.read(CORPUS_TOKENS_TABLE),
            new_sigs=new_sigs,
            new_tokens=new_tokens,
        )

    def _stage_near_dup(self, fetched: DataFrame, batch_id: int, staged: dict):
        """Stage this batch's near-dup pass: probe new SUCCESS captions
        against the persisted corpus projections, append the batch's own
        projections + flagged pairs + a lineage counters row — all into
        ``staged`` so they land in the SAME atomic commit as results
        (kill-and-resume never sees a corpus the results don't match).

        Returns (counts_tuple, pairs_df_to_unpersist_or_None)."""
        from crawler_core_spark.operators.dedup import (
            corpus_token_sets,
            minhash_signatures,
        )

        cfg = self.near_dup_cfg
        new_docs = fetched.filter(
            (F.col("status") == "SUCCESS") & F.col("result_caption").isNotNull()
        ).select(
            F.col("url_key").alias("doc_key"),
            F.col("result_caption").alias("text"),
        )
        # terminal SUCCESS url_keys are unique WITHIN a scan (URL-seen +
        # in-batch dedup), but a later scan run against the same warehouse
        # (per-scan URL-seen scope, -scanRuns > 1) legitimately re-crawls
        # a url_key — first-observation-wins for the corpus projections
        # (the anti-join below), or corpus_sigs grows duplicate doc_keys
        # and every later probe's verify join-back emits duplicated pairs
        # (review r5).  First-wins is the CONTRACT, not a shortcut: the
        # projections represent content ALREADY INGESTED into the corpus
        # (results keep every observation), so a re-crawl whose caption
        # changed still dedups new docs against what the corpus actually
        # holds; curation separately applies latest-result-wins when
        # choosing which observation to KEEP.  The key scan touches only
        # corpus_sigs's id column, which the probe's band join scans
        # anyway — no new asymptotics.  persist both projections: each is
        # consumed twice (inside the probe's candidate/verify plans AND
        # by its own corpus-table stage write) — without the cache the
        # batch minhash runs twice.
        sigs = minhash_signatures(new_docs, "doc_key", "text", cfg["n_hashes"]).persist()
        toks = corpus_token_sets(new_docs, "doc_key", "text").persist()
        new_cnt = new_docs.count()  # fetched is persisted: cheap
        near_docs = near_pairs = 0
        pairs = None
        if new_cnt and self.store.exists(CORPUS_SIGS_TABLE):
            pairs = self.near_dup_probe(
                new_docs, new_sigs=sigs, new_tokens=toks
            ).persist()
            near_pairs = pairs.count()
            if near_pairs:
                near_docs = pairs.select("new_id").distinct().count()
                staged[NEAR_DUPS_TABLE] = (
                    "append",
                    self.store.stage(
                        pairs.select(
                            F.lit(batch_id).alias("batch_id"),
                            F.col("new_id").alias("new_key"),
                            F.col("corpus_id").alias("corpus_key"),
                            "jaccard",
                        ),
                        NEAR_DUPS_TABLE,
                    ),
                )
        dup_keys = None
        if new_cnt:
            app_sigs, app_toks = sigs, toks
            if self.store.exists(CORPUS_SIGS_TABLE):
                # re-crawled key set computed ONCE (semi-join of the corpus
                # ids against the broadcast batch — one corpus-column scan,
                # batch-sized result), then broadcast into both anti-joins:
                # two independent left_antis would each scan the corpus ids
                dup_keys = (
                    self.store.read(CORPUS_SIGS_TABLE)
                    .select("doc_key")
                    .join(
                        F.broadcast(sigs.select("doc_key")),
                        "doc_key",
                        "left_semi",
                    )
                    .persist()
                )
                app_sigs = sigs.join(F.broadcast(dup_keys), "doc_key", "left_anti")
                app_toks = toks.join(F.broadcast(dup_keys), "doc_key", "left_anti")
            staged[CORPUS_SIGS_TABLE] = (
                "append", self.store.stage(app_sigs, CORPUS_SIGS_TABLE)
            )
            staged[CORPUS_TOKENS_TABLE] = (
                "append", self.store.stage(app_toks, CORPUS_TOKENS_TABLE)
            )
        staged[NEAR_DUP_COUNTERS_TABLE] = (
            "append",
            self.store.stage(
                self.spark.createDataFrame(
                    [(batch_id, int(new_cnt), int(near_docs), int(near_pairs))],
                    "batch_id: int, new_docs: long, near_dup_docs: long, "
                    "near_dup_pairs: long",
                ),
                NEAR_DUP_COUNTERS_TABLE,
            ),
        )
        # safe to release now: every consumer above has already written
        # its staged snapshot (the commit only renames log entries)
        sigs.unpersist()
        toks.unpersist()
        if dup_keys is not None:
            dup_keys.unpersist()
        return (new_cnt, near_docs, near_pairs), pairs

    def _tick(self, timings: dict, label: str, t0: float) -> float:
        now = time.time()
        timings[label] = round(timings.get(label, 0.0) + (now - t0), 3)
        return now

    # ------------------------------------------------------------------
    # publish (§3.1)
    # ------------------------------------------------------------------
    def publish(
        self,
        targets: DataFrame,
        dns: DataFrame,
        denylist,
        robots: DataFrame,
        bulk_scan_id: str,
        default_port: int = 443,
        scan_config: ScanConfig | None = None,
        monitored: bool = False,
        notify_url: str | None = None,
        published_at: float | None = None,
    ) -> dict:
        timings: dict = {}
        t = time.time()
        if published_at is None:
            published_at = time.time()
        # optimistic-concurrency base, captured BEFORE any state read:
        # (a) the publish commit validates against it, so a concurrent
        # worker/publisher commit to these tables raises
        # CommitConflictError instead of being clobbered by our frontier
        # replace; (b) pub_seq is derived from it — under (a)'s guard two
        # publishers can never both commit from the same base, so pub_seq
        # is collision-free AND monotonic in commit order (the previous
        # unguarded len(log()) could be claimed twice).
        commit_base = self.store.commit_count()
        cfg = scan_config or ScanConfig(timeout_ms=self.scan_timeout_ms)
        routed = parse_and_route(
            targets, dns, denylist, bulk_scan_id, default_port,
            parse_paths=self.url_paths,
        )

        # Materialize the parse->dns->denylist pipeline ONCE (it carries a
        # pandas UDF + three joins) via persist(MEMORY_AND_DISK): the two
        # downstream writes (frontier split, error split) read the cache
        # instead of re-executing the plan — one fewer full parquet
        # write+read-back than staging a snapshot, which measured as the
        # single largest fixed cost of the publish phase.  The A1 histogram
        # rides the first write as an Observation — no extra job.
        hist_obs = Observation()
        all_jobs = routed.all_jobs.observe(
            hist_obs,
            *[
                F.count(F.when(F.col("status") == s, 1)).alias(s)
                for s in STATUS_NAMES
            ],
        ).persist(StorageLevel.MEMORY_AND_DISK)
        t = self._tick(timings, "pub_parse_stage", t)

        # O6 robots happens at publish: rules are static per crawl.  The
        # robots join (two broadcasts, zero shuffles, zero driver jobs —
        # operators/scheduler.py:apply_robots) is applied to the WHOLE
        # cached job set so each downstream write is exactly ONE cache
        # scan: frontier = queued ∧ allowed; error results = publish-time
        # errors ∪ robots-blocked, in a single pass.  The robots-blocked
        # count rides the frontier write as an Observation.
        robots_obs = Observation()
        is_queued = F.col("status") == "TO_BE_EXECUTED"
        if self.url_paths:
            # URL-path granularity: the general longest-prefix matcher
            # (distinct (host, path) keys -> one equi-join back; the
            # rules never BNLJ the frontier).  Costs one keyed shuffle
            # that the constant-root fast path below avoids.
            from crawler_core_spark.operators.scheduler import (
                host_col,
                robots_match,
            )

            routed_jobs = robots_match(
                all_jobs.withColumn("host", host_col()),
                robots,
                path_col="url_path",
            )
        else:
            routed_jobs = apply_robots(all_jobs, robots)
        aj = routed_jobs.observe(
            robots_obs,
            F.count(F.when(is_queued & ~F.col("robots_allow"), 1)).alias("blocked"),
        )
        frontier = (
            aj.filter(is_queued & F.col("robots_allow"))
            # scan-config propagation: every queued job carries the config
            # (BulkScanInfo on each ScanJobDescription, ControllerTest.java:54-121)
            .withColumn("attempt", F.lit(0))
            .withColumn("scan_config", cfg.as_column())
            .select(*FRONTIER_COLS)
            .withColumn("fpart", self._fpart())
        )

        publish_ts = 0.0
        base_err_cols = [
            "job_id", "bulk_scan_id", "seq", "hostname", "ip", "port",
            "tranco_rank", "status", "url_canon",
        ]
        error_results = (
            aj.filter(
                F.col("status").isin(ERROR_STATUSES)
                | (is_queued & ~F.col("robots_allow"))
            )
            .withColumn(
                "status",
                F.when(is_queued, F.lit("ROBOTS_BLOCKED")).otherwise(F.col("status")),
            )
            .select(*base_err_cols)
            .withColumn("result_status", F.col("status"))
            .withColumn("attempt", F.lit(0))
            .withColumn("batch_id", F.lit(-1))
            .withColumn("crawl_pos", F.lit(None).cast("long"))
            .withColumn("ts", F.lit(publish_ts))
        )
        error_results = _with_null_results(error_results).select(*RESULT_COLS)

        t = self._tick(timings, "pub_plan", t)

        staged = {}
        # the frontier's base snapshot: hive-partitioned by fpart so batch
        # commits can MERGE individual partitions (run loop).  Cluster by
        # fpart first: a partitionBy write from T shuffle tasks otherwise
        # emits up to T files PER partition (P*T tiny files — measured as
        # a 2x publish-stage regression); clustered, each partition gets
        # exactly the files of its owning task.
        staged["frontier"] = (
            "replace",
            self.store.stage(
                frontier.repartition(self.frontier_parts, F.col("fpart")),
                "frontier",
                partition_by=["fpart"],
            ),
        )
        robots_blocked = int(robots_obs.get["blocked"])
        hist = {s: int(n) for s, n in hist_obs.get.items() if n}
        t = self._tick(timings, "pub_stage_frontier", t)
        staged["results"] = (
            "append",
            self.store.stage(
                # partition by a MIRROR column so bulk_scan_id stays in the
                # data files (the streaming source reads them schema-first)
                error_results.withColumn("bs_part", F.col("bulk_scan_id")),
                "results",
                partition_by=["bs_part"], sort_within=[F.desc("ts")],
            ),
        )
        all_jobs.unpersist()
        t = self._tick(timings, "pub_stage_results", t)

        # robots-blocked rows leave TO_BE_EXECUTED accounting (they were
        # routed to the queue by reference semantics, then [EXT]-blocked).
        counters = bulk_scan_counters(hist)

        # every kept seed line became exactly one job row (T2 routing is
        # total), so targetsGiven = sum of the histogram — no extra pass.
        targets_given = int(sum(hist.values()))
        bulk_row = {
            "bulk_scan_id": bulk_scan_id,
            # commit-order stamp: parquet row order across unioned
            # snapshots is arbitrary, so re-publications of the SAME
            # bulk_scan_id are disambiguated by max_by(pub_seq), never by
            # collect order (finalize).  Unique-by-construction: the
            # publish commit is guarded by expected_base=commit_base.
            "pub_seq": commit_base,
            "published_at": float(published_at),
            "targets_given": targets_given,
            "scan_jobs_published": counters["scan_jobs_published"],
            "scan_jobs_resolution_errors": counters["scan_jobs_resolution_errors"],
            "scan_jobs_denylisted": counters["scan_jobs_denylisted"],
            "robots_blocked": robots_blocked,
            "finished": False,
            "successful_scans": 0,
            "monitored": bool(monitored),
            "notify_url": notify_url,
            **{f"cfg_{k}": v for k, v in cfg.as_dict().items()},
        }
        bulk_df = self.spark.createDataFrame(
            [bulk_row],
            "bulk_scan_id: string, pub_seq: long, published_at: double, "
            "targets_given: long, "
            "scan_jobs_published: long, scan_jobs_resolution_errors: long, "
            "scan_jobs_denylisted: long, robots_blocked: long, "
            "finished: boolean, successful_scans: long, monitored: boolean, "
            "notify_url: string, cfg_scanner_detail: string, "
            "cfg_reexecutions: int, cfg_timeout_ms: double, "
            "cfg_parallel_probes: int, cfg_excluded_probes: array<string>",
        ).withColumn(
            "collection_name",
            collection_name_col(F.col("bulk_scan_id"), F.col("published_at")),
        )

        lineage = self.spark.createDataFrame(
            [(-1, -1, 0, 0, 0, int(robots_blocked))],
            "batch_id: int, partition_id: int, fetched: long, deduped: long, deferred: long, robots_blocked: long",
        )
        staged["bulk_scans"] = ("append", self.store.stage(bulk_df, "bulk_scans"))
        staged["counters"] = ("append", self.store.stage(lineage, "counters"))
        # fresh politeness state per publication: the virtual clock resets
        # to 0, so stale next_fetch_time from a previous scan (CLI cron
        # re-publication) must not throttle the new frontier.
        staged["host_state"] = (
            "replace",
            self.store.stage(
                self.spark.createDataFrame(
                    [], "host: string, next_fetch_time: double, crawl_delay: double"
                ),
                "host_state",
            ),
        )
        t = self._tick(timings, "pub_stage_meta", t)
        self.step_timings.append(timings)
        self.store.commit(
            staged,
            expected_base=commit_base,
            meta={
                "kind": "publish",
                "bulk_scan_id": bulk_scan_id,
                "clock": 0.0,
                "batch_id": -1,
                "crawl_offset": 0,
                # the committed frontier LAYOUT: batch merge commits must
                # recompute fpart with this same P or _read_merge silently
                # drops rows (run() validates on entry/resume).
                "frontier_parts": int(self.frontier_parts),
                "hist": {k: int(v) for k, v in hist.items()},
            },
        )
        return bulk_row

    # ------------------------------------------------------------------
    # crawl loop (§3.2)
    # ------------------------------------------------------------------
    def run(self, max_batches: int | None = None, verbose: bool = False) -> list[BatchStats]:
        # layout guard: the frontier's hive partitioning was committed by
        # publish with a specific P; a resuming engine configured with a
        # DIFFERENT frontier_parts would recompute fpart into partitions
        # not listed in its merge commits — _read_merge would silently
        # drop them and resurrect stale base rows.  Fail loudly instead.
        # (Warehouses from pre-meta versions carry no value -> unchecked.)
        stored_parts = self.store.last_meta("frontier_parts")
        if stored_parts is not None and int(stored_parts) != int(self.frontier_parts):
            raise ValueError(
                f"frontier layout mismatch: warehouse committed with "
                f"frontier_parts={stored_parts}, engine configured with "
                f"{self.frontier_parts}; use the committed value (merge "
                "commits on a re-partitioned layout silently lose rows)"
            )
        clock = float(self.store.last_meta("clock") or 0.0)
        batch_id = int(self.store.last_meta("batch_id") if self.store.last_meta("batch_id") is not None else -1) + 1
        offset = int(self.store.last_meta("crawl_offset") or 0)
        published = int(
            (self.store.last_meta("hist") or {}).get("TO_BE_EXECUTED", 0)
        )
        monitor = ProgressMonitor(expected_total=published)

        stats: list[BatchStats] = []
        # driver-tracked frontier size: counted once on entry/resume, then
        # maintained arithmetically (remaining -= selected - requeued) —
        # saves one full table-scan job per batch and the final empty-check.
        remaining: int | None = None
        while max_batches is None or len(stats) < int(max_batches):
            timings: dict = {}
            t = time.time()
            # optimistic-concurrency base: everything staged below derives
            # from the state visible NOW; a concurrent worker committing to
            # these tables in between makes our commit raise
            # CommitConflictError rather than resurrect its completed jobs.
            commit_base = self.store.commit_count()
            frontier = self.store.read("frontier")
            if "url_path" not in frontier.columns:
                # pre-url_path warehouse (paths were implicitly "/"):
                # normalize on read so FRONTIER_COLS projections resume
                # old frontiers instead of dying mid-batch
                frontier = frontier.withColumn("url_path", F.lit("/"))
            frontier = frontier.persist()
            if remaining is None:
                remaining = frontier.count()
            t = self._tick(timings, "frontier_read", t)
            if remaining == 0:
                frontier.unpersist()
                break

            host_state = (
                self.store.read("host_state")
                if self.store.exists("host_state")
                else self.spark.createDataFrame([], "host: string, next_fetch_time: double, crawl_delay: double")
            )

            # eligible (pre-budget) count rides the selection job as an
            # Observation — the deferred counter costs no extra join/count.
            elig_obs = Observation()
            eligible_sel = select_batch(
                frontier, host_state, clock, self.batch_period, eligible_obs=elig_obs
            )

            selected = eligible_sel.persist()
            # one action does double duty: the selected count AND the set
            # of touched frontier partitions (<= frontier_parts rows to
            # the driver) that the merge commit below will rewrite.
            part_counts = (
                selected.groupBy("fpart").agg(F.count(F.lit(1)).alias("n")).collect()
            )
            sel_cnt = int(sum(r["n"] for r in part_counts))
            touched_parts = sorted(int(r["fpart"]) for r in part_counts)
            eligible_cnt = int(elig_obs.get["eligible"])
            t = self._tick(timings, "select_batch", t)
            if sel_cnt == 0:
                # every eligible host throttled: advance virtual time
                selected.unpersist()
                frontier.unpersist()
                clock += self.batch_period
                # bounded: next_fetch_time values are finite
                continue

            # URL-seen probe on a slim projection (keys only shuffle)
            slim = selected.select("job_id", "url_key", "priority", "seq")
            probed = self.url_seen.probe(slim)
            w_dup = Window.partitionBy("url_key").orderBy("priority", "seq")
            flags = probed.withColumn(
                "dup", F.col("seen") | (F.row_number().over(w_dup) > 1)
            ).select("job_id", "dup")
            batch = selected.join(flags, "job_id", "left")

            to_fetch = batch.filter(~F.col("dup")).drop("dup")
            dup_rows = batch.filter(F.col("dup")).drop("dup").persist()
            dedup_keys = dup_rows.select("url_key")

            # persist the decoded HITS first: the miss anti-join, dense_seq
            # and the commit each re-read them, and the image decode must
            # run once.  Budget-bounded batches broadcast against the
            # streamed corpus (bytes never shuffle); over-budget batches
            # fall back to the salted shuffle join (hot-host skew defused
            # by the salt).  EMPTY rows are derived batch-side from the
            # persisted hits (anti-join on job_id) — NEVER from a corpus
            # broadcast (the 10^10-row corpus must not ship to executors).
            use_bcast = sel_cnt <= self.broadcast_fetch_limit
            fetch_src = (
                to_fetch if use_bcast
                else salted_repartition(to_fetch, self.salt_buckets)
            )
            fault = self.internal_fault(batch_id) if self.internal_fault else None
            timeout_col = F.coalesce(
                F.col("scan_config.timeout_ms"), F.lit(self.scan_timeout_ms)
            )
            hits = fetch_hits(
                fetch_src,
                # prune from the PERSISTED selected (superset of to_fetch's
                # ids, so the bucket/id filters stay correct): pruning from
                # to_fetch would re-execute the whole URL-seen cogroup
                # probe + dedup window as an extra action every batch.
                self._pruned_images(selected),
                timeout_col,
                broadcast_batch=use_bcast,
                internal_fault=fault,
            ).persist()
            misses = fetch_misses(to_fetch, hits)
            fetched_all = hits.unionByName(misses.select(*hits.columns))

            is_internal = F.col("status") == "INTERNAL_ERROR"
            persistable = fetched_all.filter(~is_internal)
            # crawl_pos: dense rank over the batch's total order — computed
            # distributed (a global window would serialize the batch). The
            # (priority, seq) order packs into one long: priority < 2^31
            # (UNRANKED_PRIORITY or an int32 tranco rank), seq < 2^31.
            fetched = dense_seq(
                persistable,
                F.col("priority").cast("long") * F.lit(1 << 32) + F.col("seq"),
                "crawl_pos",
                start=offset,
            )
            fetched = (
                fetched.withColumn("batch_id", F.lit(batch_id))
                .withColumn("ts", F.lit(clock))
            ).persist()
            deferred_cnt = eligible_cnt - sel_cnt
            t = self._tick(timings, "fetch_decode_rank", t)

            # reexecutions (ScanConfig.java:41): retryable failures below
            # the attempt budget persist their row AND requeue attempt+1.
            is_retryable = F.col("status").isin(*RETRYABLE_STATUSES) & (
                F.col("attempt") < F.coalesce(F.col("scan_config.reexecutions"), F.lit(0))
            )

            # K4 RUNNING partials — progress stream OUTSIDE the atomic
            # commit (reference: progress consumer vs ack transaction).
            if self.emit_partials:
                thr = (
                    self.partial_cost_threshold
                    if self.partial_cost_threshold is not None
                    else 0.0
                )
                partials = (
                    fetched.filter(
                        (F.col("fetch_cost_ms") > F.lit(thr))
                        & F.col("status").isin("SUCCESS", "CANCELLED")
                    )
                    .withColumn("status", F.lit("RUNNING"))
                    .withColumn("result_status", F.lit("RUNNING"))
                    .withColumn("ts", F.lit(clock - 0.5 * self.batch_period))
                )
                partials = partials.select(
                    *[c for c in RESULT_COLS if c not in (
                        "result_caption", "result_phash", "crawl_pos")],
                    F.lit(None).cast("string").alias("result_caption"),
                    F.lit(None).cast("long").alias("result_phash"),
                    F.lit(None).cast("long").alias("crawl_pos"),
                ).select(*RESULT_COLS)
                merge_partials(self.store, partials)
                t = self._tick(timings, "partials", t)

            # ---- stage the atomic batch commit -------------------------
            # deduped rows reach a terminal state too ([EXT] status DEDUPED):
            # every published job ends in exactly one results row.
            dedup_results = (
                dup_rows.withColumn("status", F.lit("DEDUPED"))
                .withColumn("result_status", F.lit("DEDUPED"))
                .withColumn("batch_id", F.lit(batch_id))
                .withColumn("crawl_pos", F.lit(None).cast("long"))
                .withColumn("ts", F.lit(clock))
            )
            dedup_results = _with_null_results(dedup_results).select(*RESULT_COLS)
            # per-status counts, retry split and the two COMMIT GATES (T6
            # status invariant + [EXT] phash payload invariant) all ride
            # the results write as one Observation — no separate jobs.
            res_obs = Observation()
            gate_metrics = [
                F.count(
                    F.when(F.col("status") != F.col("result_status"), 1)
                ).alias("_t6_bad"),
                F.count(F.when(is_retryable, 1)).alias("_requeue_retry"),
            ]
            if self.invariant_max_hamming is not None:
                gate_metrics.append(
                    F.count(
                        F.when(
                            (F.col("status") == "SUCCESS")
                            & F.col("corpus_phash").isNotNull()
                            & (
                                F.bit_count(
                                    F.col("result_phash").bitwiseXOR(
                                        F.col("corpus_phash")
                                    )
                                )
                                > F.lit(self.invariant_max_hamming)
                            ),
                            1,
                        )
                    ).alias("_phash_bad")
                )
            results_out = (
                apply_serialization_guard(
                    fetched.unionByName(
                        dedup_results, allowMissingColumns=True
                    )
                )
                .observe(
                    res_obs,
                    *[
                        F.count(F.when(F.col("status") == s, 1)).alias(s)
                        for s in STATUS_NAMES
                    ],
                    *gate_metrics,
                )
                .select(*RESULT_COLS)
            )

            # frontier: drop every selected job, then put back the
            # requeued ones (retry attempt+1; INTERNAL_ERROR unchanged —
            # redelivery without persist, Worker.java:108-112).
            requeue = (
                fetched.filter(is_retryable)
                .withColumn("attempt", F.col("attempt") + 1)
                .select(*FRONTIER_COLS)
                .unionByName(hits.filter(is_internal).select(*FRONTIER_COLS))
            )
            # requeue accounting: retry rows are counted by the results
            # write's Observation (_requeue_retry); INTERNAL_ERROR
            # redeliveries never reach results, so count them from the
            # persisted hits cache — only when fault injection is active
            # (a dedicated Observation on the requeue subtree would be
            # silently dropped when AQE empty-propagates a zero-row
            # frontier write).
            internal_cnt = (
                hits.filter(is_internal).count() if self.internal_fault else 0
            )
            # partition-incremental frontier commit: only partitions with
            # selected rows change (requeued rows come FROM the selected
            # batch, so their partitions are already in touched_parts) —
            # the rewrite is O(touched partitions), not O(frontier).
            # Every compact_frontier_every batches, a full replace bounds
            # the merge-chain length (snapshot compaction).
            compacting_frontier = bool(
                self.compact_frontier_every
                and batch_id > 0
                and batch_id % self.compact_frontier_every == 0
            )
            frontier_src = (
                frontier
                if compacting_frontier
                else frontier.filter(F.col("fpart").isin(touched_parts))
            )
            new_frontier = (
                frontier_src.join(selected.select("job_id"), "job_id", "left_anti")
                .select(*FRONTIER_COLS)
                .unionByName(requeue)
                .withColumn("fpart", self._fpart())
            )
            new_host_state = updated_host_state(
                host_state, fetched_all.select("host", "crawl_delay"), clock
            )
            t = self._tick(timings, "plan_updates", t)
            # URL-seen: only rows that reached a TERMINAL state are marked
            # seen — a requeued job must not dedup its own retry.
            seen_table, seen_staged = self.url_seen.stage_add(
                fetched.filter(~is_retryable).select("url_key")
            )
            t = self._tick(timings, "stage_seen_write", t)
            lineage = (
                fetched.select(F.pmod(F.col("url_key"), F.lit(LINEAGE_PARTITIONS)).alias("partition_id"))
                .groupBy("partition_id")
                .agg(F.count(F.lit(1)).alias("fetched"))
                .withColumn("batch_id", F.lit(batch_id))
                .withColumn("deduped", F.lit(0).cast("long"))
                .withColumn("deferred", F.lit(0).cast("long"))
                .withColumn("robots_blocked", F.lit(0).cast("long"))
                .unionByName(
                    dedup_keys.select(
                        F.pmod(F.col("url_key"), F.lit(LINEAGE_PARTITIONS)).alias("partition_id")
                    )
                    .groupBy("partition_id")
                    .agg(F.count(F.lit(1)).alias("deduped"))
                    .withColumn("batch_id", F.lit(batch_id))
                    .withColumn("fetched", F.lit(0).cast("long"))
                    .withColumn("deferred", F.lit(0).cast("long"))
                    .withColumn("robots_blocked", F.lit(0).cast("long")),
                    allowMissingColumns=False,
                )
                .unionByName(
                    self.spark.createDataFrame(
                        [(batch_id, -1, 0, 0, int(deferred_cnt), 0)],
                        "batch_id: int, partition_id: int, fetched: long, deduped: long, deferred: long, robots_blocked: long",
                    )
                )
                .select("batch_id", "partition_id", "fetched", "deduped", "deferred", "robots_blocked")
            )

            staged = {}
            # K5/O3: partition spec + ts-desc sort order (partition pruning +
            # row-group min/max skipping on the read path)
            staged["results"] = (
                "append",
                self.store.stage(
                    results_out.withColumn("bs_part", F.col("bulk_scan_id")),
                    "results",
                    partition_by=["bs_part"], sort_within=[F.desc("ts")],
                ),
            )
            obs_vals = {k: int(v) for k, v in res_obs.get.items() if v}
            # ---- commit gates (staged data stays invisible on abort) ----
            if obs_vals.get("_t6_bad", 0):
                raise CommitGateError(
                    f"T6 status invariant violated on {obs_vals['_t6_bad']} rows; "
                    "batch NOT committed"
                )
            if obs_vals.get("_phash_bad", 0):
                raise CommitGateError(
                    f"payload invariant (phash hamming > {self.invariant_max_hamming}) "
                    f"violated on {obs_vals['_phash_bad']} SUCCESS rows; batch NOT committed"
                )
            batch_counts = {
                s: n for s, n in obs_vals.items() if not s.startswith("_")
            }
            fetched_cnt = sum(
                n for s, n in batch_counts.items() if s != "DEDUPED"
            )
            deduped_cnt = batch_counts.get("DEDUPED", 0)
            t = self._tick(timings, "stage_results", t)
            # cluster by fpart before the partitioned write (one file per
            # touched partition, not one per shuffle task per partition)
            n_clust = max(1, min(
                self.frontier_parts,
                len(touched_parts) if not compacting_frontier else self.frontier_parts,
            ))
            frontier_rel = self.store.stage(
                new_frontier.repartition(n_clust, F.col("fpart")),
                "frontier",
                partition_by=["fpart"],
            )
            staged["frontier"] = (
                ("replace", frontier_rel)
                if compacting_frontier
                else ("merge", frontier_rel, "fpart", touched_parts)
            )
            requeued_cnt = int(obs_vals.get("_requeue_retry", 0)) + int(internal_cnt)
            t = self._tick(timings, "stage_frontier", t)
            staged["host_state"] = ("replace", self.store.stage(new_host_state, "host_state"))
            t = self._tick(timings, "stage_host_state", t)
            staged[seen_table] = seen_staged
            t = self._tick(timings, "stage_seen", t)
            staged["counters"] = ("append", self.store.stage(lineage, "counters"))
            t = self._tick(timings, "stage_counters", t)
            nd_pairs_df = None
            if self.near_dup_captions:
                _nd_counts, nd_pairs_df = self._stage_near_dup(
                    fetched, batch_id, staged
                )
                t = self._tick(timings, "stage_near_dup", t)
            clock_next = clock + self.batch_period
            try:
                self.store.commit(
                    staged,
                    expected_base=commit_base,
                    meta={
                        "kind": "batch",
                        "batch_id": batch_id,
                        "clock": clock_next,
                        "crawl_offset": offset + fetched_cnt,
                        "fetched": fetched_cnt,
                        "deduped": deduped_cnt,
                        "deferred": deferred_cnt,
                        "requeued": requeued_cnt,
                        "hist": self.store.last_meta("hist"),
                    },
                )
            except CommitConflictError as e:
                # conflict is an EXPECTED flow (the worker CLI retries the
                # whole run): release this batch's cached frames before
                # propagating, or each failed attempt pins 5 frames of
                # batch/frontier state for the rest of the session.
                for df_ in (dup_rows, hits, fetched, selected, frontier):
                    df_.unpersist()
                if nd_pairs_df is not None:
                    nd_pairs_df.unpersist()
                # progress marker for the retry budget: batches THIS run
                # committed before the conflict (the CLI resets its
                # consecutive-fruitless-attempt counter when > 0)
                e.batches_committed = len(stats)
                raise

            t = self._tick(timings, "commit", t)
            # periodic results-snapshot compaction (storage maintenance;
            # bounds the manifest a long run's readers must enumerate)
            if (
                self.compact_results_every
                and batch_id > 0
                and batch_id % self.compact_results_every == 0
            ):
                try:
                    self.store.compact(
                        "results",
                        partition_by=["bs_part"], sort_within=[F.desc("ts")],
                    )
                except CommitConflictError:
                    # another worker appended results mid-compaction;
                    # maintenance is best-effort — next cadence retries
                    pass
                t = self._tick(timings, "compact", t)

            # A2-A4 driver-side monitoring over the per-batch status
            # COUNTS (already observed on the results write; DEDUPED rows
            # never went through the worker, mirroring the reference's
            # done-notification stream).  Counts, not an expanded status
            # list: the monitor update is O(1) per batch.
            monitor.on_batch_counts(
                {s: n for s, n in batch_counts.items() if s != "DEDUPED"},
                now=clock_next,
            )
            t = self._tick(timings, "monitor", t)
            self.step_timings.append(timings)
            if verbose:
                print(
                    f"batch {batch_id}: fetched={fetched_cnt} deduped={deduped_cnt} "
                    f"deferred={deferred_cnt} requeued={requeued_cnt} "
                    f"ema={monitor.moving_average:.3f} eta={monitor.eta:.1f}"
                )

            stats.append(
                BatchStats(batch_id, fetched_cnt, deduped_cnt, deferred_cnt, requeued_cnt)
            )
            dup_rows.unpersist()
            hits.unpersist()
            fetched.unpersist()
            selected.unpersist()
            frontier.unpersist()
            if nd_pairs_df is not None:
                nd_pairs_df.unpersist()
            remaining -= sel_cnt - requeued_cnt
            offset += fetched_cnt
            clock = clock_next
            batch_id += 1

        return stats

    # ------------------------------------------------------------------
    def finalize(self, bulk_scan_id: str) -> dict:
        """A5 rollup — groupBy(status).count() over results -> bulk_scans;
        K7/K8: monitored scans get a completion-notification row (the
        sandboxed no-op of the notifyUrl webhook POST,
        ProgressMonitor.java:218-232)."""
        results = self.store.read("results")
        hist = {
            r["status"]: r["count"]
            for r in results.filter(F.col("bulk_scan_id") == bulk_scan_id)
            .groupBy("status")
            .count()
            .collect()
        }
        row = {
            "bulk_scan_id": bulk_scan_id,
            "finished": True,
            "successful_scans": int(hist.get("SUCCESS", 0)),
            "job_status_counters": {k: int(v) for k, v in hist.items()},
        }
        self.store.write(
            self.spark.createDataFrame(
                [(bulk_scan_id, True, row["successful_scans"])],
                "bulk_scan_id: string, finished: boolean, successful_scans: long",
            ),
            "bulk_scan_final",
            mode="append",
            meta={"kind": "finalize", "hist": row["job_status_counters"]},
        )
        # K7 monitored-only notification (RabbitMqOrchestrationProvider.java:176-186)
        # + K8 webhook no-op: record what WOULD be POSTed.
        monitored, notify_url = False, None
        if self.store.exists("bulk_scans"):
            # latest PUBLICATION wins: max_by over the commit-order stamp
            # (collect order over unioned parquet snapshots is arbitrary)
            bs = (
                self.store.read("bulk_scans")
                .filter(F.col("bulk_scan_id") == bulk_scan_id)
                .agg(
                    F.max_by("monitored", "pub_seq").alias("monitored"),
                    F.max_by("notify_url", "pub_seq").alias("notify_url"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()[0]
            )
            if bs["n"]:
                monitored = bool(bs["monitored"])
                notify_url = bs["notify_url"]
        if monitored:
            payload = json.dumps(row, sort_keys=True)
            self.store.write(
                self.spark.createDataFrame(
                    [(bulk_scan_id, notify_url, payload)],
                    "bulk_scan_id: string, notify_url: string, payload: string",
                ),
                "notifications",
                mode="append",
                meta={"kind": "notification"},
            )
            row["notified"] = True
        return row
