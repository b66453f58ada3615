"""CLI entry point — ``CommonMain.java:39-87`` as a spark-submit main.

The reference ships two commands, ``controller`` (publish targets, track
progress) and ``worker`` (consume the queue, persist results).  In the
dataflow engine those map onto:

- ``controller`` — publish the target list into a warehouse (frontier +
  error results + bulk_scans), then run the crawl loop to completion and
  finalize.  One spark-submit run == the reference's controller+worker
  pair on a single box.
- ``worker``     — resume an EXISTING warehouse's frontier (the analogue
  of attaching another worker to the queue: the commit log hands over
  exactly-once, K6), run until drained.
- ``compact``    — storage maintenance (snapshot compaction).

Flag names/defaults mirror ``config/ControllerCommandConfig.java:41-80``
(-portToBeScanned 443, -reexecutions 3, -parallelProbes 1, -exclude,
-scanName, -notifyUrl, -monitor) and ``WorkerCommandConfig.java:27-44``.

Usage:
    spark-submit -m crawler_core_spark controller \
        -hostFile targets.txt -warehouse /tmp/wh -images images.parquet \
        [-denylist deny.txt] [-dns dns.parquet] [-reexecutions 3] ...
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import SparkSession


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="crawler_core_spark")
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("controller", help="publish + crawl + finalize")
    c.add_argument("-hostFile", required=True, help="target list file (S1)")
    c.add_argument("-warehouse", required=True, help="store root directory")
    c.add_argument("-images", required=True, help="images corpus parquet path")
    c.add_argument("-denylist", default=None, help="denylist file (S5)")
    c.add_argument("-dns", default=None,
                   help="dns table parquet (hostname, ip, resolvable); "
                        "no live DNS in this engine")
    c.add_argument("-robots", default=None,
                   help="robots rules parquet (host, path_prefix, allow, crawl_delay)")
    c.add_argument("-robotsTxt", default=None,
                   help="parquet of RAW robots.txt bodies (host, robots_txt) "
                        "— parsed distributed via sources/robots.py; "
                        "mutually exclusive with -robots")
    c.add_argument("-userAgent", default="*",
                   help="crawler user-agent for robots.txt group selection "
                        "(only with -robotsTxt)")
    c.add_argument("-portToBeScanned", type=int, default=443)
    c.add_argument("-scanDetail", default="NORMAL")
    c.add_argument("-timeout", type=float, default=840_000.0,
                   help="scan timeout in ms (deadline-as-data)")
    c.add_argument("-reexecutions", type=int, default=3)
    c.add_argument("-parallelProbes", type=int, default=1)
    c.add_argument("-exclude", default="",
                   help="comma-separated excluded probe names")
    c.add_argument("-scanName", default="bulk-scan")
    c.add_argument("-notifyUrl", default=None)
    c.add_argument("-monitor", action="store_true")
    c.add_argument("-urlSeen", choices=["exact", "bloom", "cuckoo"], default="bloom")
    c.add_argument("-batchPeriod", type=float, default=10.0)
    c.add_argument("-maxBatches", type=int, default=None)
    # cron re-publication (Controller.java:85-92): empty = one immediate
    # scan; otherwise repeat every N seconds for -scanRuns scans and shut
    # down when the last one finishes (SchedulerListenerShutdown.java:19-92
    # semantics: the scheduler stops once all scans are done).
    c.add_argument("-scanIntervalS", type=float, default=None,
                   help="re-publish the target list every N seconds")
    c.add_argument("-scanRuns", type=int, default=1,
                   help="number of scheduled scans before shutdown")

    w = sub.add_parser("worker", help="resume an existing warehouse frontier")
    w.add_argument("-warehouse", required=True)
    w.add_argument("-images", required=True)
    w.add_argument("-urlSeen", choices=["exact", "bloom", "cuckoo"], default="bloom")
    w.add_argument("-batchPeriod", type=float, default=10.0)
    w.add_argument("-maxBatches", type=int, default=None)
    # per-scan URL-seen scope: a controller run with -scanRuns > 1 writes
    # suffixed seen tables (url_seen_*_<scanName>-<i>); a worker resuming
    # such a warehouse must probe the ACTIVE scan's table, not the global
    # one, or it re-fetches already-seen URLs of that scan.
    w.add_argument("-scanName", default=None,
                   help="active scan id whose URL-seen table to probe "
                        "(e.g. myscan-2 for a multi-run controller)")
    # reference worker knobs (WorkerCommandConfig.java:27-36): accepted
    # for flag-surface parity; in the dataflow engine Spark's executor
    # cores own both scan and connection concurrency, so these map to
    # documented no-ops (tune spark.master local[N] / executor cores).
    w.add_argument("-parallelScanThreads", type=int, default=None,
                   help="accepted for parity; concurrency is owned by "
                        "Spark cores (no-op)")
    w.add_argument("-parallelConnectionThreads", type=int, default=None,
                   help="accepted for parity; concurrency is owned by "
                        "Spark cores (no-op)")
    w.add_argument("-maxConflictRetries", type=int, default=3,
                   help="retries after a commit conflict before giving up "
                        "(N retries = N+1 run attempts); raise when several "
                        "workers drain one warehouse concurrently (every "
                        "conflict means another worker committed, so global "
                        "progress is guaranteed)")

    k = sub.add_parser("compact", help="compact a table's snapshots")
    k.add_argument("-warehouse", required=True)
    k.add_argument("-table", default="results")

    u = sub.add_parser(
        "curate",
        help="resumable curation job over a crawl warehouse: quality gate "
             "-> exact dedup -> near-dup text edges -> phash visual edges "
             "-> connected components -> survivors, one atomic commit + "
             "lineage row per stage (kill-and-resume skips committed "
             "stages)",
    )
    u.add_argument("-warehouse", required=True)
    u.add_argument("-qualityThreshold", type=float, default=0.35)
    u.add_argument("-jaccardThreshold", type=float, default=0.8)
    u.add_argument("-maxHamming", type=int, default=3)
    u.add_argument("-nHashes", type=int, default=16)
    u.add_argument("-bands", type=int, default=16)
    u.add_argument("-maxBucket", type=int, default=64)
    u.add_argument("-maxStages", type=int, default=None,
                   help="bound this invocation to N stages (resume later)")
    u.add_argument("-force", action="store_true",
                   help="re-curate a finished warehouse (the crawl "
                        "appended new results since the last pass); a "
                        "killed forced pass resumes with a plain curate")
    u.add_argument("-maxConflictRetries", type=int, default=3)
    return p


def _spark(app: str) -> SparkSession:
    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    # imports deferred so --help costs no Spark startup
    from crawler_core_spark.config import ScanConfig
    from crawler_core_spark.plans.crawl import CrawlEngine
    from crawler_core_spark.storage import TableStore

    spark = _spark(f"crawler-core-spark-{args.command}")
    store = TableStore(spark, args.warehouse)

    if args.command == "compact":
        from pyspark.sql import functions as F

        if args.table == "results":
            # preserve the results partition/sort spec through compaction
            cid = store.compact(
                "results", partition_by=["bs_part"], sort_within=[F.desc("ts")]
            )
        else:
            cid = store.compact(args.table)
        print(f"compacted {args.table} at commit {cid}")
        return 0

    if args.command == "curate":
        from crawler_core_spark.plans.curate import STAGES, CurationEngine

        if not store.exists("results"):
            raise SystemExit(
                f"curate: warehouse {args.warehouse!r} has no results table — "
                "run a controller/worker crawl first"
            )
        eng = CurationEngine(
            spark, store,
            quality_threshold=args.qualityThreshold,
            jaccard_threshold=args.jaccardThreshold,
            max_hamming=args.maxHamming,
            n_hashes=args.nHashes,
            bands=args.bands,
            max_bucket=args.maxBucket,
        )
        # conflict retry with force demotion: once the forced pass has
        # committed its first stage, retries must RESUME it (plain run —
        # stages_done is pass-aware), not restart from quality; only a
        # conflict before any commit keeps the force flag alive.
        from crawler_core_spark.storage import CommitConflictError

        force = bool(args.force)
        fruitless = 0
        total_ran = 0  # -maxStages bounds the INVOCATION, not each attempt
        while True:
            try:
                remaining = (
                    None
                    if args.maxStages is None
                    else max(0, int(args.maxStages) - total_ran)
                )
                ran = eng.run(max_stages=remaining, verbose=True, force=force)
                total_ran += len(ran)
                break
            except CommitConflictError as e:
                committed = getattr(e, "batches_committed", 0)
                total_ran += int(committed)
                if committed > 0:
                    fruitless = 0
                    force = False
                    print(
                        f"curate: conflict after progress ({committed} "
                        f"stage(s) committed; counter reset): {e}"
                    )
                else:
                    fruitless += 1
                    print(
                        f"curate: commit conflict (fruitless attempt "
                        f"{fruitless} of {args.maxConflictRetries + 1} "
                        f"tolerated): {e}"
                    )
                if fruitless > args.maxConflictRetries:
                    raise SystemExit(
                        "curate: repeated commit conflicts without progress"
                    )
        done = eng.stages_done()
        print(
            f"curate: ran {total_ran} stage(s) this invocation; "
            f"{len(set(done))}/{len(STAGES)} committed total"
        )
        return 0

    images = spark.read.parquet(args.images)

    def make_engine(seen_table_suffix: str | None = None):
        from crawler_core_spark.operators.url_seen import SEEN_TABLE_BASES

        kw = {}
        if seen_table_suffix:
            kw["table"] = f"{SEEN_TABLE_BASES[args.urlSeen]}_{seen_table_suffix}"
        return CrawlEngine(
            spark, store, images,
            url_seen_kind=args.urlSeen,
            batch_period=args.batchPeriod,
            url_seen_kw=kw,
        )

    eng = make_engine()

    if args.command == "controller":
        from crawler_core_spark.sources.denylist import load_denylist
        from crawler_core_spark.sources.targets import target_file_df
        from crawler_core_spark.synth import ROBOTS_SCHEMA

        targets = target_file_df(spark, path=args.hostFile)
        dns = (
            spark.read.parquet(args.dns)
            if args.dns
            else spark.createDataFrame(
                [], "hostname: string, ip: string, resolvable: boolean"
            )
        )
        denylist = load_denylist(
            spark, path=args.denylist
        ) if args.denylist else load_denylist(spark, lines=[])
        if args.robots and args.robotsTxt:
            raise SystemExit("controller: pass -robots OR -robotsTxt, not both")
        if args.robotsTxt:
            from crawler_core_spark.sources.robots import robots_rules_from_texts

            robots = robots_rules_from_texts(
                spark.read.parquet(args.robotsTxt), user_agent=args.userAgent
            )
        elif args.robots:
            robots = spark.read.parquet(args.robots)
        else:
            robots = spark.createDataFrame([("*", "/", True, 1.0)], ROBOTS_SCHEMA)
        cfg = ScanConfig(
            scanner_detail=args.scanDetail,
            reexecutions=args.reexecutions,
            timeout_ms=args.timeout,
            parallel_probes=args.parallelProbes,
            excluded_probes=tuple(
                x for x in args.exclude.split(",") if x
            ),
        )
        # cron loop (Controller.java:85-92): run -scanRuns scans, waiting
        # -scanIntervalS between publications, then shut down when the
        # last scan completes (shutdown-when-done listener semantics).
        runs = max(1, int(args.scanRuns)) if args.scanIntervalS else 1
        for i in range(runs):
            if i > 0:
                time.sleep(float(args.scanIntervalS))
            scan_id = args.scanName if runs == 1 else f"{args.scanName}-{i}"
            # per-scan URL-seen scope: a re-publication re-fetches its
            # targets (the reference starts each scan with a fresh
            # collection); within a scan dedup still applies.
            eng = make_engine(seen_table_suffix=scan_id if runs > 1 else None)
            # publish carries the same optimistic guard as batch commits:
            # a worker committing mid-publish raises CommitConflictError,
            # and a plain re-invoke (state re-read, pub_seq re-derived
            # from the new base) is the correct retry — without it the
            # cron loop dies and scans i+1..N are never published
            bulk = call_with_conflict_retries(
                lambda: eng.publish(
                    targets, dns, denylist, robots, scan_id,
                    default_port=args.portToBeScanned, scan_config=cfg,
                    monitored=args.monitor, notify_url=args.notifyUrl,
                ),
                max_retries=3, label="controller publish",
            )
            print(f"published[{i}]: {bulk}")
            stats = run_with_conflict_retries(
                eng, 3, max_batches=args.maxBatches, verbose=True
            )
            roll = eng.finalize(scan_id)  # append-only: conflict-free
            print(f"finalized[{i}]: {roll} in {len(stats)} batches")
    else:  # worker
        if args.parallelScanThreads or args.parallelConnectionThreads:
            print(
                "note: -parallelScanThreads/-parallelConnectionThreads are "
                "accepted for reference-flag parity; concurrency is owned "
                "by Spark executor cores in this engine"
            )
        if args.scanName:
            from crawler_core_spark.operators.url_seen import SEEN_TABLE_BASES

            base = SEEN_TABLE_BASES[args.urlSeen]
            seen_table = f"{base}_{args.scanName}"
            if not store.exists(seen_table):
                # a typo'd/unsuffixed name would silently probe an EMPTY
                # seen-set and re-fetch every already-seen URL of the scan
                existing = sorted(
                    t[len(base) + 1:] for t in store.tables()
                    if t.startswith(base + "_")
                )
                raise SystemExit(
                    f"worker: seen table {seen_table!r} does not exist in this "
                    f"warehouse; known -scanName suffixes for -urlSeen="
                    f"{args.urlSeen}: {existing or '(none)'}"
                )
            eng = make_engine(seen_table_suffix=args.scanName)
        stats = run_with_conflict_retries(
            eng, args.maxConflictRetries,
            max_batches=args.maxBatches, verbose=True,
        )
        print(f"worker drained frontier in {len(stats)} batches")
    return 0


def call_with_conflict_retries(fn, max_retries: int, label: str):
    """Plain retry budget for one-shot guarded commits (publish): the
    callable re-derives all state on entry — nothing was committed when
    the conflict raised — so re-invoking is the correct retry."""
    from crawler_core_spark.storage import CommitConflictError

    attempts = 0
    while True:
        try:
            return fn()
        except CommitConflictError as e:
            attempts += 1
            if attempts > max_retries:
                # Budget exceeded: print the abort, not a misleading
                # "retry 4/3" line for a retry that will never happen.
                print(f"{label}: commit conflict (budget exhausted): {e}")
                raise SystemExit(
                    f"{label}: repeated commit conflicts — another writer "
                    "is continuously committing to this warehouse"
                )
            print(f"{label}: commit conflict (retry {attempts}/{max_retries}): {e}")


def run_with_conflict_retries(eng, max_retries: int, **run_kwargs):
    """Optimistic-concurrency retry (the Iceberg client pattern): a
    CommitConflictError means another worker advanced the shared tables
    after our state read; ``eng.run()`` re-derives clock / batch_id /
    offset / frontier from the NOW-committed state on entry, so a plain
    re-invoke is the correct retry.

    The budget counts CONSECUTIVE FRUITLESS attempts, not lifetime
    conflicts: an attempt that committed batches before losing a race is
    progress (a long contested two-worker drain loses many races while
    the drain advances — a lifetime counter would abort it spuriously),
    so the counter resets whenever the conflicting run reports
    ``batches_committed > 0``.  ``max_retries`` consecutive fruitless
    retries = up to ``max_retries + 1`` attempts without progress; one
    more aborts."""
    from crawler_core_spark.storage import CommitConflictError

    fruitless = 0
    while True:
        try:
            return eng.run(**run_kwargs)
        except CommitConflictError as e:
            if getattr(e, "batches_committed", 0) > 0:
                fruitless = 0  # the attempt drained batches: progress
                print(
                    f"worker: conflict after progress (fruitless counter "
                    f"reset; {e.batches_committed} batches committed): {e}"
                )
            else:
                fruitless += 1
                print(
                    f"worker: commit conflict (fruitless attempt "
                    f"{fruitless} of {max_retries + 1} tolerated): {e}"
                )
            if fruitless > max_retries:
                raise SystemExit(
                    "worker: repeated commit conflicts without progress — "
                    "another writer is continuously committing to this "
                    "warehouse's crawl tables (raise -maxConflictRetries "
                    "for heavily contested drains)"
                )


if __name__ == "__main__":
    sys.exit(main())
