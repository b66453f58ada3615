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

Tables:
  frontier    (replace)  — pending TO_BE_EXECUTED rows
  results     (append)   — terminal rows incl. publish-time errors
  host_state  (replace)  — (host, next_fetch_time, crawl_delay)
  url_seen_*  (append/replace) — see operators/url_seen.py
  counters    (append)   — per-(batch, seen-partition) lineage:
                           fetched / deduped / deferred / robots_blocked
  bulk_scans  (append)   — scan-run metadata rows (K1/K2 as append-log,
                           latest row wins like O2)
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from crawler_core_spark import STATUS_NAMES

from crawler_core_spark import ERROR_STATUSES
from crawler_core_spark.operators.fetch import DEFAULT_SCAN_TIMEOUT_MS, fetch_batch
from crawler_core_spark.operators.publish import (
    bulk_scan_counters,
    parse_and_route,
    status_histogram,
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
from crawler_core_spark.storage import TableStore

FRONTIER_COLS = [
    "job_id", "bulk_scan_id", "seq", "target", "hostname", "ip", "port",
    "tranco_rank", "priority", "url_canon", "url_key", "host", "crawl_delay",
]

RESULT_COLS = [
    "job_id", "bulk_scan_id", "seq", "hostname", "ip", "port", "tranco_rank",
    "status", "url_canon", "batch_id", "crawl_pos", "ts",
    "image_id", "result_caption", "result_phash", "result_w", "result_h",
    "result_fmt", "fetch_cost_ms",
]

LINEAGE_PARTITIONS = 16


@dataclass
class BatchStats:
    batch_id: int
    fetched: int
    deduped: int
    deferred: int


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
    ):
        self.spark = spark
        self.store = store
        self.images = images
        self.batch_period = batch_period
        self.scan_timeout_ms = scan_timeout_ms
        self.salt_buckets = salt_buckets
        self.broadcast_fetch_limit = broadcast_fetch_limit
        self.url_seen = make_url_seen(store, url_seen_kind, **(url_seen_kw or {}))
        self.step_timings: list[dict] = []  # per-batch driver-step seconds

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
    ) -> dict:
        timings: dict = {}
        t = time.time()
        routed = parse_and_route(targets, dns, denylist, bulk_scan_id, default_port)

        # Materialize the parse->dns->denylist pipeline ONCE (it carries a
        # pandas UDF + three joins); every downstream consumer (frontier
        # split, error split, counts) re-reads the columnar snapshot with
        # pruning instead of re-executing the plan.  The A1 histogram rides
        # the same write as an Observation — no separate aggregation job.
        hist_obs = Observation()
        observed = routed.all_jobs.observe(
            hist_obs,
            *[
                F.count(F.when(F.col("status") == s, 1)).alias(s)
                for s in STATUS_NAMES
            ],
        )
        jobs_rel = self.store.stage(observed, "all_jobs")
        all_jobs = self.spark.read.parquet(os.path.join(self.store.root, jobs_rel))
        hist = {s: int(n) for s, n in hist_obs.get.items() if n}
        t = self._tick(timings, "pub_parse_stage", t)
        frontier_in = all_jobs.filter(F.col("status") == "TO_BE_EXECUTED")
        error_in = all_jobs.filter(F.col("status").isin(ERROR_STATUSES))

        # O6 robots happens at publish: rules are static per crawl. The
        # robots-blocked count rides the frontier write (observe before the
        # filter sees the blocked rows) — no separate count job.
        robots_obs = Observation()
        fr = apply_robots(frontier_in, robots)
        blocked = fr.filter(~F.col("robots_allow"))
        frontier = (
            fr.observe(
                robots_obs,
                F.count(F.when(~F.col("robots_allow"), 1)).alias("blocked"),
            )
            .filter(F.col("robots_allow"))
            .select(*FRONTIER_COLS)
        )

        publish_ts = 0.0
        err = error_in.withColumn("host", F.coalesce("hostname", "ip"))
        error_results = (
            err.select(
                "job_id", "bulk_scan_id", "seq", "hostname", "ip", "port",
                "tranco_rank", "status", "url_canon",
            )
            .unionByName(
                blocked.withColumn("status", F.lit("ROBOTS_BLOCKED")).select(
                    "job_id", "bulk_scan_id", "seq", "hostname", "ip", "port",
                    "tranco_rank", "status", "url_canon",
                )
            )
            .withColumn("batch_id", F.lit(-1))
            .withColumn("crawl_pos", F.lit(None).cast("long"))
            .withColumn("ts", F.lit(publish_ts))
            .withColumn("image_id", F.lit(None).cast("string"))
            .withColumn("result_caption", F.lit(None).cast("string"))
            .withColumn("result_phash", F.lit(None).cast("long"))
            .withColumn("result_w", F.lit(None).cast("int"))
            .withColumn("result_h", F.lit(None).cast("int"))
            .withColumn("result_fmt", F.lit(None).cast("string"))
            .withColumn("fetch_cost_ms", F.lit(None).cast("double"))
            .select(*RESULT_COLS)
        )

        t = self._tick(timings, "pub_plan", t)

        staged = {}
        staged["frontier"] = ("replace", self.store.stage(frontier, "frontier"))
        robots_blocked = int(robots_obs.get["blocked"])
        t = self._tick(timings, "pub_stage_frontier", t)
        staged["results"] = ("append", self.store.stage(error_results, "results"))
        t = self._tick(timings, "pub_stage_results", t)

        # robots-blocked rows leave TO_BE_EXECUTED accounting (they were
        # routed to the queue by reference semantics, then [EXT]-blocked).
        counters = bulk_scan_counters(hist)

        # every kept seed line became exactly one job row (T2 routing is
        # total), so targetsGiven = sum of the histogram — no extra pass.
        targets_given = int(sum(hist.values()))
        bulk_row = {
            "bulk_scan_id": bulk_scan_id,
            "targets_given": targets_given,
            "scan_jobs_published": counters["scan_jobs_published"],
            "scan_jobs_resolution_errors": counters["scan_jobs_resolution_errors"],
            "scan_jobs_denylisted": counters["scan_jobs_denylisted"],
            "robots_blocked": robots_blocked,
            "finished": False,
            "successful_scans": 0,
        }
        bulk_df = self.spark.createDataFrame([bulk_row])

        lineage = self.spark.createDataFrame(
            [(-1, -1, 0, 0, 0, int(robots_blocked))],
            "batch_id: int, partition_id: int, fetched: long, deduped: long, deferred: long, robots_blocked: long",
        )
        staged["bulk_scans"] = ("append", self.store.stage(bulk_df, "bulk_scans"))
        staged["counters"] = ("append", self.store.stage(lineage, "counters"))
        t = self._tick(timings, "pub_stage_meta", t)
        self.step_timings.append(timings)
        self.store.commit(
            staged,
            meta={
                "kind": "publish",
                "bulk_scan_id": bulk_scan_id,
                "clock": 0.0,
                "batch_id": -1,
                "crawl_offset": 0,
                "hist": {k: int(v) for k, v in hist.items()},
            },
        )
        return bulk_row

    # ------------------------------------------------------------------
    # crawl loop (§3.2)
    # ------------------------------------------------------------------
    def run(self, max_batches: int | None = None, verbose: bool = False) -> list[BatchStats]:
        clock = float(self.store.last_meta("clock") or 0.0)
        batch_id = int(self.store.last_meta("batch_id") if self.store.last_meta("batch_id") is not None else -1) + 1
        offset = int(self.store.last_meta("crawl_offset") or 0)
        published = int(
            (self.store.last_meta("hist") or {}).get("TO_BE_EXECUTED", 0)
        )
        monitor = ProgressMonitor(expected_total=published)

        stats: list[BatchStats] = []
        # driver-tracked frontier size: counted once on entry/resume, then
        # maintained arithmetically (remaining -= selected) — saves one full
        # table-scan job per batch and the final empty-check scan.
        remaining: int | None = None
        while max_batches is None or len(stats) < int(max_batches):
            timings: dict = {}
            t = time.time()
            frontier = self.store.read("frontier").persist()
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

            eligible_sel = select_batch(frontier, host_state, clock, self.batch_period)
            # count eligible (pre-budget) for the deferred counter; with no
            # host state yet every pending row is eligible — skip the join.
            if self.store.exists("host_state"):
                hs = host_state.select(F.col("host").alias("_h"), "next_fetch_time")
                eligible_cnt = (
                    frontier.join(hs, frontier["host"] == F.col("_h"), "left")
                    .filter(F.coalesce(F.col("next_fetch_time"), F.lit(0.0)) <= clock)
                    .count()
                )
            else:
                eligible_cnt = remaining
            t = self._tick(timings, "eligible", t)

            selected = eligible_sel.persist()
            sel_cnt = selected.count()
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

            # persist the decode output first: dense_seq and the commit
            # below each re-read it, and the image decode must run once.
            # Budget-bounded batches broadcast against the streamed corpus
            # (bytes never shuffle); over-budget batches fall back to the
            # salted shuffle join (hot-host skew defused by the salt).
            use_bcast = sel_cnt <= self.broadcast_fetch_limit
            fetch_src = (
                to_fetch if use_bcast
                else salted_repartition(to_fetch, self.salt_buckets)
            )
            fetched_raw = fetch_batch(
                fetch_src,
                self.images,
                self.scan_timeout_ms,
                broadcast_batch=use_bcast,
            ).persist()
            # crawl_pos: dense rank over the batch's total order — computed
            # distributed (a global window would serialize the batch). The
            # (priority, seq) order packs into one long: priority < 2^31
            # (UNRANKED_PRIORITY or an int32 tranco rank), seq < 2^31.
            fetched = dense_seq(
                fetched_raw,
                F.col("priority").cast("long") * F.lit(1 << 32) + F.col("seq"),
                "crawl_pos",
                start=offset,
            )
            fetched = (
                fetched.withColumn("batch_id", F.lit(batch_id))
                .withColumn("ts", F.lit(clock))
                .select(*RESULT_COLS, "host", "crawl_delay", "url_key")
            ).persist()
            deferred_cnt = eligible_cnt - sel_cnt
            t = self._tick(timings, "fetch_decode_rank", t)

            # ---- stage the atomic batch commit -------------------------
            # deduped rows reach a terminal state too ([EXT] status DEDUPED):
            # every published job ends in exactly one results row.
            dedup_results = (
                dup_rows.withColumn("status", F.lit("DEDUPED"))
                .withColumn("batch_id", F.lit(batch_id))
                .withColumn("crawl_pos", F.lit(None).cast("long"))
                .withColumn("ts", F.lit(clock))
                .withColumn("image_id", F.lit(None).cast("string"))
                .withColumn("result_caption", F.lit(None).cast("string"))
                .withColumn("result_phash", F.lit(None).cast("long"))
                .withColumn("result_w", F.lit(None).cast("int"))
                .withColumn("result_h", F.lit(None).cast("int"))
                .withColumn("result_fmt", F.lit(None).cast("string"))
                .withColumn("fetch_cost_ms", F.lit(None).cast("double"))
                .select(*RESULT_COLS)
            )
            # per-status counts + fetched/deduped split ride the results
            # write as an Observation — no separate count/collect jobs.
            res_obs = Observation()
            results_out = (
                fetched.select(*RESULT_COLS)
                .unionByName(dedup_results)
                .observe(
                    res_obs,
                    *[
                        F.count(F.when(F.col("status") == s, 1)).alias(s)
                        for s in STATUS_NAMES
                    ],
                )
            )
            new_frontier = frontier.join(
                selected.select("job_id"), "job_id", "left_anti"
            ).select(*FRONTIER_COLS)
            new_host_state = updated_host_state(
                host_state, fetched.select("host", "crawl_delay"), clock
            )
            t = self._tick(timings, "plan_updates", t)
            seen_table, seen_staged = self.url_seen.stage_add(
                fetched.select("url_key")
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
            staged["results"] = ("append", self.store.stage(results_out, "results"))
            batch_counts = {s: int(n) for s, n in res_obs.get.items() if n}
            fetched_cnt = sum(
                n for s, n in batch_counts.items() if s != "DEDUPED"
            )
            deduped_cnt = batch_counts.get("DEDUPED", 0)
            t = self._tick(timings, "stage_results", t)
            staged["frontier"] = ("replace", self.store.stage(new_frontier, "frontier"))
            t = self._tick(timings, "stage_frontier", t)
            staged["host_state"] = ("replace", self.store.stage(new_host_state, "host_state"))
            t = self._tick(timings, "stage_host_state", t)
            staged[seen_table] = seen_staged
            t = self._tick(timings, "stage_seen", t)
            staged["counters"] = ("append", self.store.stage(lineage, "counters"))
            t = self._tick(timings, "stage_counters", t)
            clock_next = clock + self.batch_period
            self.store.commit(
                staged,
                meta={
                    "kind": "batch",
                    "batch_id": batch_id,
                    "clock": clock_next,
                    "crawl_offset": offset + fetched_cnt,
                    "fetched": fetched_cnt,
                    "deduped": deduped_cnt,
                    "deferred": deferred_cnt,
                    "hist": self.store.last_meta("hist"),
                },
            )

            t = self._tick(timings, "commit", t)

            # A2-A4 driver-side monitoring over the per-batch statuses
            # (already observed on the results write; DEDUPED rows never
            # went through the worker, mirroring the reference's
            # done-notification stream)
            batch_statuses = [
                s
                for s, n in sorted(batch_counts.items())
                if s != "DEDUPED"
                for _ in range(n)
            ]
            monitor.on_batch(batch_statuses, now=clock_next)
            t = self._tick(timings, "monitor", t)
            self.step_timings.append(timings)
            if verbose:
                print(
                    f"batch {batch_id}: fetched={fetched_cnt} deduped={deduped_cnt} "
                    f"deferred={deferred_cnt} ema={monitor.moving_average:.3f} eta={monitor.eta:.1f}"
                )

            stats.append(BatchStats(batch_id, fetched_cnt, deduped_cnt, deferred_cnt))
            dup_rows.unpersist()
            fetched_raw.unpersist()
            fetched.unpersist()
            selected.unpersist()
            frontier.unpersist()
            remaining -= sel_cnt
            offset += fetched_cnt
            clock = clock_next
            batch_id += 1

        return stats

    # ------------------------------------------------------------------
    def finalize(self, bulk_scan_id: str) -> dict:
        """A5 rollup — groupBy(status).count() over results -> bulk_scans."""
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
        return row
