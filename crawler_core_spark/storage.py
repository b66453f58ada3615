"""Transactional table store — Iceberg-style snapshots over parquet (Plan B).

The north_rule asks for Iceberg checkpoint tables; the sandbox has no
Iceberg runtime jar, so this module provides the same *contract* behind
the same module boundary (SURVEY.md §7.3):

- named tables, each a set of committed parquet directories;
- **multi-table atomic commits**: one commit-log entry lists every table
  touched by a batch ({results append, frontier replace, counters append,
  checkpoint append} — SURVEY.md K6), made visible by a single atomic
  ``os.replace`` of the log file.  A crash between staging and commit
  leaves only invisible stage directories — exactly Iceberg's
  snapshot-isolation story, and the Spark-level engine code would be
  unchanged on a real Iceberg catalog;
- append vs replace table modes (append-only results log vs
  MERGE-equivalent frontier/host-state replacement, SURVEY.md K1-K4);
- readable commit metadata for resume (last committed batch_id).

This replaces the reference's RabbitMQ unacked-delivery protocol
(``orchestration/RabbitMqOrchestrationProvider.java:140,174-187``): a row
is "acked" iff its batch committed; a killed run redelivers the whole
uncommitted batch on resume (K6 exactly-once upgrade).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = "_commits.json"


class CommitConflictError(RuntimeError):
    """Another writer committed to an overlapping table set since this
    writer read its base state (optimistic-concurrency failure — the
    Iceberg validation-exception analogue).  The caller's staged state was
    computed from a stale snapshot; retry the whole read-stage-commit."""


class TableStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- commit log -------------------------------------------------------
    def _log_path(self) -> str:
        return os.path.join(self.root, _LOG)

    def _commit_lock(self):
        """Advisory exclusive lock for the commit read-modify-write: two
        workers (processes) sharing one warehouse must serialize their
        commit-log appends or one loses its commit (the Iceberg-catalog
        atomic-swap contract; readers need no lock — os.replace keeps the
        log file atomic at all times)."""
        import contextlib

        try:
            import fcntl
        except ImportError:  # non-POSIX: single-writer deployments only

            @contextlib.contextmanager
            def _noop():
                yield

            return _noop()

        @contextlib.contextmanager
        def _locked():
            with open(os.path.join(self.root, "_commits.lock"), "w") as lk:
                fcntl.flock(lk, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(lk, fcntl.LOCK_UN)

        return _locked()

    def log(self) -> list[dict]:
        try:
            with open(self._log_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return []

    def _write_log(self, entries: list[dict]) -> None:
        tmp = self._log_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(entries, f)
        os.replace(tmp, self._log_path())  # the atomic commit point

    # -- staging + commit ---------------------------------------------------
    def stage(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        sort_within: list | None = None,
    ) -> str:
        """Write df to an invisible stage directory; return its relpath.

        ``partition_by`` is the Iceberg partition-spec analogue (hive-style
        directories -> partition pruning on read); ``sort_within`` is the
        sort-order analogue (``sortWithinPartitions`` -> parquet row-group
        min/max stats tight on the sort key, giving index-like skipping —
        the Mongo secondary-index / timestamp-desc-index story, K5/O3,
        ``MongoPersistenceProvider.java:205-210``). Neither adds a shuffle.
        """
        rel = os.path.join(table, f"snap-{uuid.uuid4().hex}")
        out = df
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(self.root, rel))
        if partition_by:
            # a partitioned write of ZERO rows leaves no files at all —
            # park the schema in a sidecar (pure python, no job) so reads
            # of such snapshots stay schema-full.
            with open(os.path.join(self.root, rel, "_schema.json"), "w") as f:
                f.write(df.schema.json())
        return rel

    def commit(
        self,
        staged: dict[str, tuple],
        meta: dict | None = None,
        expected_base: int | None = None,
    ) -> int:
        """staged: table -> (mode, relpath) with mode in {'append',
        'replace'}, or ('merge', relpath, part_col, part_values) for a
        PARTITION-LEVEL replace (Iceberg MERGE / dynamic-partition-
        overwrite analogue): the snapshot supersedes exactly the listed
        hive partitions of the table — a listed partition with no data
        files in the snapshot becomes empty.  All tables become visible
        atomically.  Returns commit id.

        ``expected_base``: optimistic concurrency (Iceberg commit
        validation).  Pass ``commit_count()`` captured BEFORE reading the
        state this commit was derived from; if any commit since then
        touched an overlapping table set, raises CommitConflictError
        instead of silently overwriting the other writer's state (the
        advisory lock alone only serializes the log append — it cannot
        see that a replace/merge snapshot was computed from a stale
        read)."""
        tables = {}
        for t, v in staged.items():
            if v[0] == "merge":
                _, p, part_col, parts = v
                tables[t] = {
                    "mode": "merge", "path": p,
                    "part_col": part_col, "parts": [int(x) for x in parts],
                }
            else:
                tables[t] = {"mode": v[0], "path": v[1]}
        # the read-modify-write is serialized across workers (processes)
        # by an advisory lock; staging stayed uncontended outside it
        with self._commit_lock():
            entries = self.log()
            if expected_base is not None:
                clashes = [
                    (e["commit_id"], sorted(set(e["tables"]) & set(tables)))
                    for e in entries[expected_base:]
                    if set(e["tables"]) & set(tables)
                ]
                if clashes:
                    raise CommitConflictError(
                        f"commit base {expected_base} is stale: concurrent "
                        f"commits touched overlapping tables {clashes}; "
                        "re-read state and retry the batch"
                    )
            commit_id = len(entries)
            entries.append(
                {"commit_id": commit_id, "meta": meta or {}, "tables": tables}
            )
            self._write_log(entries)
        return commit_id

    def commit_count(self) -> int:
        """Current log length — capture before reading state, pass to
        ``commit(expected_base=...)`` for optimistic concurrency."""
        return len(self.log())

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append",
        meta: dict | None = None,
        expected_base: int | None = None,
    ) -> int:
        return self.commit(
            {table: (mode, self.stage(df, table))},
            meta=meta,
            expected_base=expected_base,
        )

    def compact(
        self,
        table: str,
        num_files: int | None = None,
        partition_by: list[str] | None = None,
        sort_within: list | None = None,
    ) -> int:
        """Snapshot compaction (Iceberg ``rewrite_data_files`` analogue):
        collapse a table's append-chain of snapshot directories into ONE
        replace snapshot, so a thousand-batch run's reads stop enumerating
        a thousand directories.  Readers before the commit keep the old
        manifest; the switch is the same atomic log replace as any commit.

        Conflict-guarded: the replace is computed from the chain read at
        entry, so a concurrent writer's append between read and commit
        would be silently dropped by the replace — raises
        CommitConflictError instead (periodic-maintenance callers catch
        and skip; the next cadence hit retries).
        """
        base = self.commit_count()
        df = self.read(table)
        if num_files:
            df = df.coalesce(num_files)
        rel = self.stage(df, table, partition_by=partition_by, sort_within=sort_within)
        return self.commit(
            {table: ("replace", rel)},
            meta={"kind": "compact", "table": table},
            expected_base=base,
        )

    def should_compact(self, table: str, every: int | None) -> bool:
        """Persisted compaction cadence, shared by every operator that
        bounds a version chain: True when the table's live snapshot chain
        (plus the commit about to happen) reaches ``every``.  Derived from
        committed state, never an in-memory counter, so short CLI/worker
        runs still compact on schedule."""
        return bool(every and self.snapshot_count(table) + 1 >= every)

    def snapshot_count(self, table: str) -> int:
        """Number of live snapshot directories a read of ``table`` touches."""
        return len(self.table_paths(table))

    # -- reads --------------------------------------------------------------
    def table_paths(self, table: str) -> list[str]:
        paths: list[str] = []
        for e in self.log():
            t = e["tables"].get(table)
            if t is None:
                continue
            if t["mode"] == "replace":
                paths = [t["path"]]
            else:  # append and merge both extend the live chain
                paths.append(t["path"])
        return [os.path.join(self.root, p) for p in paths]

    def _merge_entries(self, table: str) -> list[dict] | None:
        """Live entry chain for a table that uses merge commits, or None
        if the table has no merge entries (plain append/replace table)."""
        chain: list[dict] = []
        any_merge = False
        for e in self.log():
            t = e["tables"].get(table)
            if t is None:
                continue
            if t["mode"] == "replace":
                chain = [t]
                any_merge = False
            else:
                chain.append(t)
                any_merge = any_merge or t["mode"] == "merge"
        return chain if any_merge else None

    def _read_merge(self, table: str, chain: list[dict]) -> DataFrame:
        """Merge-on-read: each partition's rows come from the LAST
        snapshot that owns it (a merge entry listing it, else the base
        replace snapshot).  Only the owning subdirectories are read, so a
        scan never re-reads superseded partition data."""
        part_col = next(e["part_col"] for e in chain if e["mode"] == "merge")
        owner: dict[int, str] = {}
        base: str | None = None
        for t in chain:
            if t["mode"] == "merge":
                for v in t["parts"]:
                    owner[int(v)] = t["path"]
            elif t["mode"] == "replace":  # the base snapshot
                base = t["path"]
            else:
                # an append mixed into a merge chain would silently be
                # treated as "the base", dropping the real base and every
                # earlier append from reads — refuse loudly instead.
                raise ValueError(
                    f"table {table!r} mixes an append commit into a merge "
                    "chain; merge tables accept only merge/replace commits"
                )
        pieces: list[DataFrame] = []
        if base is not None:
            bdf = self._read_snapshot(os.path.join(self.root, base))
            if owner:
                bdf = bdf.filter(~F.col(part_col).isin(list(owner)))
            pieces.append(bdf)
        by_path: dict[str, list[int]] = {}
        for v, p in owner.items():
            by_path.setdefault(p, []).append(v)
        for p, vals in by_path.items():
            full = os.path.join(self.root, p)
            subdirs = [
                os.path.join(full, f"{part_col}={v}")
                for v in vals
                if os.path.isdir(os.path.join(full, f"{part_col}={v}"))
            ]
            if subdirs:
                pieces.append(
                    self.spark.read.option("basePath", full).parquet(*subdirs)
                )
        if not pieces:
            raise KeyError(f"merge table {table!r} resolved to no snapshots")
        df = pieces[0]
        for extra in pieces[1:]:
            df = df.unionByName(extra, allowMissingColumns=True)
        return df

    def exists(self, table: str) -> bool:
        return bool(self.table_paths(table))

    def tables(self) -> list[str]:
        """All table names ever committed in this warehouse."""
        names = set()
        for e in self.log():
            names.update(e["tables"])
        return sorted(names)

    @staticmethod
    def _is_partitioned(path: str) -> bool:
        try:
            return any(
                "=" in d for d in os.listdir(path) if not d.startswith("_")
            )
        except OSError:
            return False

    @staticmethod
    def _is_empty_partitioned(path: str) -> bool:
        """A partitioned write of zero rows: sidecar schema, no data files."""
        try:
            entries = os.listdir(path)
        except OSError:
            return False
        return "_schema.json" in entries and not any(
            "=" in e or e.endswith(".parquet") for e in entries
        )

    def _read_snapshot(self, path: str) -> DataFrame:
        if self._is_empty_partitioned(path):
            from pyspark.sql.types import StructType

            with open(os.path.join(path, "_schema.json")) as f:
                return self.spark.createDataFrame([], StructType.fromJson(json.load(f)))
        return self.spark.read.parquet(path)

    def read(self, table: str, schema: str | None = None) -> DataFrame:
        paths = self.table_paths(table)
        if not paths:
            if schema is None:
                raise KeyError(f"table {table!r} has no committed snapshots")
            return self.spark.createDataFrame([], schema)
        chain = self._merge_entries(table)
        if chain is not None:
            return self._read_merge(table, chain)
        special = [
            p for p in paths
            if self._is_partitioned(p) or self._is_empty_partitioned(p)
        ]
        if len(paths) == 1 or special:
            # hive-partitioned snapshots: partition discovery needs one
            # root per scan — union the snapshot reads (the manifest is
            # bounded by compaction, so the union stays shallow).
            df = self._read_snapshot(paths[0])
            for p in paths[1:]:
                df = df.unionByName(self._read_snapshot(p), allowMissingColumns=True)
            return df
        return self.spark.read.parquet(*paths)

    def last_meta(self, key: str | None = None):
        entries = self.log()
        if not entries:
            return None
        if key is None:
            return entries[-1]["meta"]
        for e in reversed(entries):
            if key in e["meta"]:
                return e["meta"][key]
        return None
