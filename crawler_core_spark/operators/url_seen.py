"""URL-seen set (A7/J7 [EXT]) — exact oracle path + partitioned-Bloom scale path.

The reference dedups only implicitly (distinct target lists,
``targetlist/TrancoEmailListProvider.java:63``); the north_rule mandates an
explicit seen-set designed for a 10^10-URL frontier.

Three interchangeable implementations behind one interface (the
north_star names the "Bloom/cuckoo-filter" pair explicitly; exact is
the correctness oracle):

- **ExactUrlSeen** — a keys table (url_key BIGINT). Probe = left join,
  add = append of new keys.  This is the *correctness oracle* at test
  scale and the semantics contract.
- **BloomUrlSeen** — the *scale* mechanism: P hash-partitioned Bloom
  filters persisted as ``(partition_id INT, ver BIGINT, bloom BINARY)``.
  At 10^10 keys and ~12 bits/key the filter is ~15 GB total — never a
  single broadcast object, but P=4096 partitions of ~4 MB each
  co-partitioned with the keys (``pmod(xxhash64(url_canon), P)``) keep
  every probe/merge a co-grouped, map-side-local operation: only 8-byte
  keys shuffle, never image bytes, never the filter itself except its own
  P-way state.  Probes/merges are vectorized numpy inside cogrouped
  pandas UDFs.

Incremental commit contract (round-2 rewrite): each batch APPENDS only
the partitions that received new keys, as a new ``ver`` of those
partitions — per-batch write volume is proportional to TOUCHED
partitions, not P (at design scale a full-state rewrite is ~15 GB per
micro-batch; the delta is a few MB).  Readers take the max-``ver`` row
per partition (merge-on-read; versions are cumulative supersets).  Every
``compact_every`` adds, one full-state ``replace`` snapshot bounds the
version-chain length, like Iceberg snapshot compaction.

Property pinned by tests: the Bloom path has **no false negatives**
(bloom-seen ⊇ exact-seen); false-positive rate is sized by bits/key; and
per-batch committed rows == touched partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from crawler_core_spark.storage import TableStore

KEYS_TABLE = "url_seen_keys"
BLOOM_TABLE = "url_seen_bloom"

# kind -> base table name, the single registry every caller (engine
# factory, CLI -scanName validation) derives per-scan table names from
SEEN_TABLE_BASES = {
    "exact": KEYS_TABLE,
    "bloom": BLOOM_TABLE,
    "cuckoo": "url_seen_cuckoo",
}

BLOOM_SCHEMA = "partition_id: int, ver: long, bloom: binary"

_BLOOM_K = 7  # hash functions


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def _bit_positions(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, K) bit positions for each key."""
    u = keys.astype(np.uint64)
    cols = []
    for i in range(_BLOOM_K):
        cols.append(_splitmix64(u + np.uint64(i * 0x9E3779B9)) % np.uint64(m_bits))
    return np.stack(cols, axis=1)


def _bloom_set(bloom: np.ndarray, keys: np.ndarray, m_bits: int) -> np.ndarray:
    pos = _bit_positions(keys, m_bits).ravel()
    np.bitwise_or.at(bloom, pos >> np.uint64(3), (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
    return bloom


def _bloom_test(bloom: np.ndarray, keys: np.ndarray, m_bits: int) -> np.ndarray:
    pos = _bit_positions(keys, m_bits)
    hits = (bloom[(pos >> np.uint64(3)).astype(np.int64)] >> (pos & np.uint64(7)).astype(np.uint8)) & 1
    return hits.all(axis=1)


def _latest_bloom(st: pd.DataFrame) -> np.ndarray | None:
    """Max-ver row of a partition's state group (merge-on-read)."""
    if st.empty:
        return None
    row = st.loc[st["ver"].idxmax()]
    return np.frombuffer(row["bloom"], dtype=np.uint8)


class ExactUrlSeen:
    """Exact seen-set over a committed keys table.

    ``table`` scopes the seen-set: recurring scans (CLI cron loop) use a
    per-scan table so a re-publication re-fetches its targets.

    ``dedup_keys``: the engine-written keys table is unique by
    construction (see probe), so the probe-side dedup shuffle is off by
    default; pass True for a warehouse written by pre-invariant code or
    by direct ``stage_add`` calls with overlapping key sets (duplicate
    keys would otherwise fan out the probe's left join and silently
    duplicate jobs into both to_fetch and dup_rows).  ``validate_unique``
    checks the invariant explicitly."""

    def __init__(
        self, store: TableStore, table: str = KEYS_TABLE, dedup_keys: bool = False
    ):
        self.store = store
        self.table = table
        self.dedup_keys = dedup_keys

    def validate_unique(self, key: str = "url_key") -> int:
        """Debug/validate path: number of DUPLICATED keys in the table
        (0 == the uniqueness invariant the default probe relies on).
        ``key`` matches probe()'s parameter — validating a table probed
        under a different key column must check THAT column."""
        if not self.store.exists(self.table):
            return 0
        return (
            self.store.read(self.table)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )

    def probe(self, df: DataFrame, key: str = "url_key") -> DataFrame:
        """Append boolean ``seen`` column."""
        if not self.store.exists(self.table):
            return df.withColumn("seen", F.lit(False))
        # no .distinct() by default: the keys table is unique by
        # construction — stage_add writes distinct keys per batch, and a
        # key already in the table can never be re-added (its later jobs
        # probe seen=true and are DEDUPED before reaching a terminal
        # fetch) — so the full-table dedup shuffle the probe used to pay
        # bought nothing.  dedup_keys=True restores it for tables that
        # predate (or bypass) the invariant.
        keys_df = self.store.read(self.table)
        if self.dedup_keys:
            keys_df = keys_df.select("url_key").distinct()
        seen = keys_df.select(
            F.col("url_key").alias("_seen_key")
        ).withColumn("_seen", F.lit(True))
        return (
            df.join(seen, df[key] == seen["_seen_key"], "left")
            .withColumn("seen", F.coalesce(F.col("_seen"), F.lit(False)))
            .drop("_seen_key", "_seen")
        )

    def stage_add(self, df: DataFrame, key: str = "url_key") -> tuple[str, tuple[str, str]]:
        """Stage the key append; caller includes it in the batch commit."""
        rel = self.store.stage(df.select(F.col(key).alias("url_key")).distinct(), self.table)
        return self.table, ("append", rel)


class BloomUrlSeen:
    """Partitioned-Bloom seen-set. State: (partition_id, ver, bloom)."""

    def __init__(
        self,
        store: TableStore,
        partitions: int = 64,
        m_bits_per_partition: int = 1 << 20,
        compact_every: int = 64,
        table: str = BLOOM_TABLE,
    ):
        self.store = store
        self.table = table
        self.p = partitions
        self.m = m_bits_per_partition
        self.compact_every = compact_every

    def _pid(self, key_col):
        return F.pmod(key_col, F.lit(self.p)).cast("int")

    def _state(self) -> DataFrame:
        if self.store.exists(self.table):
            return self.store.read(self.table)
        return self.store.spark.createDataFrame([], BLOOM_SCHEMA)

    def probe(self, df: DataFrame, key: str = "url_key") -> DataFrame:
        m = self.m
        in_cols = df.columns
        keyed = df.withColumn("_pid", self._pid(F.col(key)))
        state = self._state()
        # fresh StructType: StructType.add MUTATES in place, and
        # DataFrame.schema is cached — df.schema.add would give the
        # caller's frame a phantom "seen" column.
        schema = StructType(
            list(df.schema.fields) + [StructField("seen", BooleanType())]
        )

        def _probe(lk, cand, st):
            if cand.empty:
                return pd.DataFrame(columns=[f.name for f in schema.fields])
            bloom = _latest_bloom(st)
            out = cand.copy()
            if bloom is None:
                out["seen"] = False
            else:
                out["seen"] = _bloom_test(bloom, cand[key].to_numpy(), m)
            return out.drop(columns=["_pid"])

        return (
            keyed.groupBy("_pid")
            .cogroup(state.groupBy("partition_id"))
            .applyInPandas(_probe, schema)
            .select(*in_cols, "seen")
        )

    def stage_add(self, df: DataFrame, key: str = "url_key") -> tuple[str, tuple[str, str]]:
        """Stage the bloom delta; caller includes it in the batch commit.

        Normal batches: cogroup restricted to TOUCHED partitions (state
        semi-joined on the new keys' partition ids) -> an APPEND of one
        new ver per touched partition.  Once the table's live snapshot
        chain reaches ``compact_every`` directories: full-state REPLACE
        (every partition re-emitted at its merged latest ver) to bound
        the version chain.  The cadence derives from PERSISTED state
        (snapshot_count), not an in-memory counter — repeated short
        CLI/worker runs on one warehouse still compact on schedule.
        """
        m = self.m
        compacting = self.store.should_compact(self.table, self.compact_every)
        keyed = df.select(F.col(key).alias("url_key")).withColumn(
            "_pid", self._pid(F.col("url_key"))
        )
        state = self._state()
        if not compacting:
            touched = keyed.select(F.col("_pid").alias("partition_id")).distinct()
            state = state.join(touched, "partition_id", "left_semi")

        def _merge(lk, new, st):
            pid = int(lk[0])
            base = _latest_bloom(st)
            ver = 0 if st.empty else int(st["ver"].max()) + 1
            bloom = (
                np.zeros(m // 8, dtype=np.uint8) if base is None else base.copy()
            )
            if not new.empty:
                _bloom_set(bloom, new["url_key"].to_numpy(), m)
            return pd.DataFrame(
                {"partition_id": [pid], "ver": [ver], "bloom": [bloom.tobytes()]}
            )

        merged = (
            keyed.groupBy("_pid")
            .cogroup(state.groupBy("partition_id"))
            .applyInPandas(_merge, BLOOM_SCHEMA)
        )
        rel = self.store.stage(merged, self.table)
        return self.table, ("replace" if compacting else "append", rel)


CUCKOO_TABLE = "url_seen_cuckoo"
CUCKOO_SCHEMA = "partition_id: int, ver: long, table: binary"

_CUCKOO_SLOTS = 4  # slots per bucket (standard (2,4)-cuckoo filter)


def _cuckoo_fp(keys: np.ndarray) -> np.ndarray:
    """8-bit fingerprints in 1..255 (0 marks an empty slot)."""
    h = _splitmix64(keys.astype(np.uint64) ^ np.uint64(0xA5A5A5A5A5A5A5A5))
    return ((h % np.uint64(255)) + np.uint64(1)).astype(np.uint8)


def _cuckoo_i1(keys: np.ndarray, m: int) -> np.ndarray:
    return (_splitmix64(keys.astype(np.uint64)) % np.uint64(m)).astype(np.int64)


def _cuckoo_alt(i: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    """Partner bucket: i XOR hash(fp) — involutive, so either bucket
    derives the other from (bucket, fingerprint) alone (Fan et al.,
    CoNEXT'14 partial-key cuckoo hashing)."""
    return (
        (i.astype(np.uint64) ^ _splitmix64(fp.astype(np.uint64)))
        % np.uint64(m)
    ).astype(np.int64)


def _bulk_place(table: np.ndarray, fps: np.ndarray, buckets: np.ndarray) -> np.ndarray:
    """Vectorized first-fit: place each (fp -> bucket) request into a free
    slot of its bucket, as many as capacity allows.  Keys contending for
    one bucket are ranked (stable by input order); key with in-bucket
    rank r takes the (r+1)-th free slot iff r < #free.  All numpy — no
    per-key Python.  Returns the boolean placed mask (input order)."""
    n = len(fps)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(buckets, kind="stable")
    b_sorted = buckets[order]
    grp_start = np.flatnonzero(np.r_[True, b_sorted[1:] != b_sorted[:-1]])
    counts = np.diff(np.r_[grp_start, n])
    ranks = np.arange(n, dtype=np.int64) - np.repeat(grp_start, counts)
    free_mask = table[b_sorted] == 0  # (n, SLOTS)
    fits = ranks < free_mask.sum(axis=1)
    # slot index of each key's (rank+1)-th free slot
    want = (np.cumsum(free_mask, axis=1) == (ranks + 1)[:, None]) & free_mask
    slots = want.argmax(axis=1)
    table[b_sorted[fits], slots[fits]] = fps[order][fits]
    placed = np.zeros(n, dtype=bool)
    placed[order[fits]] = True
    return placed


def _cuckoo_insert(table: np.ndarray, keys: np.ndarray, m: int) -> int:
    """Insert keys: vectorized first-fit into the primary bucket, then the
    alternate bucket; only keys finding BOTH buckets full fall to the
    per-key bounded-eviction walk (at sane load factors a vanishing tail
    — the round-3 version paid Python-per-key for every insert).
    Returns #failed (filter full).

    Deliberately NO already-present suppression: distinct keys that
    collide on (bucket, fingerprint) must each hold their own slot copy,
    or deleting one would false-negative the other (standard
    cuckoo-filter multiplicity semantics; the engine adds each url_key
    at most once, so copies = colliding distinct keys)."""
    fps = _cuckoo_fp(keys)
    i1s = _cuckoo_i1(keys, m)
    placed = _bulk_place(table, fps, i1s)
    if placed.all():
        return 0
    rem = ~placed
    fps2, i1s2 = fps[rem], i1s[rem]
    i2s2 = _cuckoo_alt(i1s2, fps2, m)
    placed2 = _bulk_place(table, fps2, i2s2)
    if placed2.all():
        return 0
    # eviction tail (per-key, bounded walk — reached only when both
    # candidate buckets were full)
    rng = np.random.default_rng(1234)
    failed = 0
    for fp, i1 in zip(fps2[~placed2].tolist(), i1s2[~placed2].tolist()):
        b, cur = i1, fp
        for _ in range(500):
            s = int(rng.integers(0, _CUCKOO_SLOTS))
            cur, table[b][s] = int(table[b][s]), cur
            b = int(_cuckoo_alt(np.array([b]), np.array([cur]), m)[0])
            empty = np.flatnonzero(table[b] == 0)
            if len(empty):
                table[b][empty[0]] = cur
                break
        else:
            failed += 1
    return failed


def _cuckoo_test(table: np.ndarray, keys: np.ndarray, m: int) -> np.ndarray:
    fps = _cuckoo_fp(keys)
    i1s = _cuckoo_i1(keys, m)
    i2s = _cuckoo_alt(i1s, fps, m)
    hit1 = (table[i1s] == fps[:, None]).any(axis=1)
    hit2 = (table[i2s] == fps[:, None]).any(axis=1)
    return hit1 | hit2


def _cuckoo_delete(table: np.ndarray, keys: np.ndarray, m: int) -> None:
    """Remove one matching fingerprint per key (the cuckoo filter's
    distinguishing capability over bloom — recrawl/invalidation)."""
    fps = _cuckoo_fp(keys)
    i1s = _cuckoo_i1(keys, m)
    i2s = _cuckoo_alt(i1s, fps, m)
    for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
        for b in (i1, i2):
            slot = np.flatnonzero(table[b] == fp)
            if len(slot):
                table[b][slot[0]] = 0
                break


class CuckooUrlSeen:
    """Partitioned (2,4)-cuckoo-filter seen-set — the north_star's named
    alternative to the bloom path.  Same interface, same incremental
    commit contract (per-touched-partition ver appends, merge-on-read,
    snapshot-count-driven compaction) plus what bloom cannot do:
    DELETION (``stage_remove`` — recrawl / invalidation semantics) at
    comparable space (~12 bits/key at 95% load, FPR ~ 2e-3).

    State: ``(partition_id, ver, table BINARY)`` where ``table`` is an
    (m_buckets x 4)-slot uint8 fingerprint array (~4 KB per 1k-bucket
    partition); like the bloom state it is only ever co-grouped with its
    own partition's keys — never broadcast, never shuffled wholesale.
    """

    def __init__(
        self,
        store: TableStore,
        partitions: int = 64,
        buckets_per_partition: int = 1 << 14,
        compact_every: int = 64,
        table: str = CUCKOO_TABLE,
    ):
        self.store = store
        self.table = table
        self.p = partitions
        # power-of-2 REQUIRED: the partner-bucket map (i ^ h(fp)) % m is
        # involutive only when % m is a bit mask — with any other m an
        # eviction can re-home a fingerprint into a bucket lookups never
        # probe (silent false negatives).
        if buckets_per_partition & (buckets_per_partition - 1):
            raise ValueError(
                f"buckets_per_partition must be a power of 2, got {buckets_per_partition}"
            )
        self.m = buckets_per_partition
        self.compact_every = compact_every

    def _pid(self, key_col):
        return F.pmod(key_col, F.lit(self.p)).cast("int")

    def _state(self) -> DataFrame:
        if self.store.exists(self.table):
            return self.store.read(self.table)
        return self.store.spark.createDataFrame([], CUCKOO_SCHEMA)

    @staticmethod
    def _latest(st: pd.DataFrame, m: int) -> np.ndarray:
        if st.empty:
            return np.zeros((m, _CUCKOO_SLOTS), dtype=np.uint8)
        row = st.loc[st["ver"].idxmax()]
        return (
            np.frombuffer(row["table"], dtype=np.uint8)
            .reshape(m, _CUCKOO_SLOTS)
            .copy()
        )

    def probe(self, df: DataFrame, key: str = "url_key") -> DataFrame:
        m = self.m
        in_cols = df.columns
        keyed = df.withColumn("_pid", self._pid(F.col(key)))
        # fresh StructType (not df.schema.add — see BloomUrlSeen.probe)
        schema = StructType(
            list(df.schema.fields) + [StructField("seen", BooleanType())]
        )

        def _probe(lk, cand, st):
            if cand.empty:
                return pd.DataFrame(columns=[f.name for f in schema.fields])
            table = CuckooUrlSeen._latest(st, m)
            out = cand.copy()
            out["seen"] = _cuckoo_test(table, cand[key].to_numpy(), m)
            return out.drop(columns=["_pid"])

        return (
            keyed.groupBy("_pid")
            .cogroup(self._state().groupBy("partition_id"))
            .applyInPandas(_probe, schema)
            .select(*in_cols, "seen")
        )

    def _stage_update(self, df: DataFrame, key: str, op) -> tuple[str, tuple[str, str]]:
        m = self.m
        compacting = self.store.should_compact(self.table, self.compact_every)
        keyed = df.select(F.col(key).alias("url_key")).withColumn(
            "_pid", self._pid(F.col("url_key"))
        )
        state = self._state()
        if not compacting:
            touched = keyed.select(F.col("_pid").alias("partition_id")).distinct()
            state = state.join(touched, "partition_id", "left_semi")

        def _merge(lk, new, st):
            pid = int(lk[0])
            table = CuckooUrlSeen._latest(st, m)
            ver = 0 if st.empty else int(st["ver"].max()) + 1
            if not new.empty:
                failed = op(table, new["url_key"].to_numpy(), m)
                if failed:
                    # a full filter would otherwise produce SILENT false
                    # negatives (keys never marked seen -> re-fetched
                    # forever, and deleting a never-inserted key can evict
                    # someone else's fingerprint).  Fail the stage job —
                    # nothing commits — so the operator tells the user to
                    # resize instead of quietly corrupting the seen-set.
                    raise ValueError(
                        f"cuckoo filter partition {pid} is full: {failed} key(s) "
                        f"unplaceable at ~{m * _CUCKOO_SLOTS} slots/partition. "
                        "Increase partitions or buckets_per_partition "
                        "(capacity = partitions * buckets * 4 slots * ~0.95 load)."
                    )
            return pd.DataFrame(
                {"partition_id": [pid], "ver": [ver], "table": [table.tobytes()]}
            )

        merged = (
            keyed.groupBy("_pid")
            .cogroup(state.groupBy("partition_id"))
            .applyInPandas(_merge, CUCKOO_SCHEMA)
        )
        rel = self.store.stage(merged, self.table)
        return self.table, ("replace" if compacting else "append", rel)

    def stage_add(self, df: DataFrame, key: str = "url_key") -> tuple[str, tuple[str, str]]:
        return self._stage_update(df, key, _cuckoo_insert)

    def stage_remove(self, df: DataFrame, key: str = "url_key") -> tuple[str, tuple[str, str]]:
        """Deletion — bloom's missing capability: un-mark keys so they
        probe unseen again (recrawl / cache-invalidation path).

        PRECONDITION (standard cuckoo-filter deletion contract, Fan et
        al. §3.3): only remove keys that were previously inserted and not
        yet removed.  A key that tests negative is skipped (probe-before-
        delete is built into ``_cuckoo_delete``: no matching fingerprint
        -> no slot cleared), but a NEVER-INSERTED key whose fingerprint
        collides with a resident key's (same bucket, same 8-bit fp —
        indistinguishable by construction) would evict the resident key
        and silently false-negative it (perpetual re-fetch).  The engine
        satisfies the contract structurally: keys are added at most once
        (terminal-state transitions only) and removed only via explicit
        recrawl of previously-seen keys."""
        return self._stage_update(df, key, _cuckoo_delete)


def make_url_seen(store: TableStore, kind: str = "exact", **kw):
    if kind == "exact":
        return ExactUrlSeen(store, **kw)
    if kind == "bloom":
        return BloomUrlSeen(store, **kw)
    if kind == "cuckoo":
        return CuckooUrlSeen(store, **kw)
    raise ValueError(kind)
