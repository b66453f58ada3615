"""Connected components over a pair/edge DataFrame — the dedup GROUP
ASSIGNMENT step that follows pair mining [EXT].

The near-dup miners (minhash_lsh_pairs / simhash_pairs / phash_near_dup /
lsh_near_dup_pairs) emit PAIRS; retention policy needs GROUPS (keep one
survivor per duplicate cluster).  Pairs are edges; clusters are connected
components.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).  Each round is
two shuffle-bounded aggregate+join passes over the current edge set and
the edge set only ever shrinks toward star graphs centered at each
component's minimum id; convergence is O(log^2 n) rounds on ANY graph
shape — unlike naive min-label propagation, whose round count is the
component DIAMETER (a chain of near-dups at 10^10 nodes never finishes).
Each iteration is localCheckpoint'ed: without it the plan doubles per
round and analysis time goes exponential.

The driver loop iterates over ROUNDS (a dozen at planet scale), never
over rows; the convergence probe is a 2-value aggregate (count +
order-insensitive xxhash64 sum), not a collect of the edge set.

Reference parity: Crawler-Core has no graph stage (URL-seen dedup is
exact-key, UrlPool.java); this extends the training-data pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(sym: DataFrame) -> DataFrame:
    """For each node u with neighborhood G(u): m = min(G(u) + {u});
    emit (v, m) for every STRICTLY LARGER neighbor v > u.
    ``sym`` must contain both orientations of every edge."""
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient every edge high->low; for each node u: m = min of its
    smaller neighbors; re-point all of them (and u) at m."""
    d = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    return (
        d.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """(id, component) for every node INCIDENT TO AN EDGE; component is
    the minimum id in the node's connected component.  Ids must be
    integral (hash string ids to int64 first — xxhash64 — as every
    miner in this package already does for shuffle keys).

    ``stats``: pass a dict to receive {"rounds": r, "edges_per_round":
    [...]} — the per-round edge count IS the round's shuffle volume
    (every round shuffles the current edge set twice: the groupBy-min
    and the join), so the list pins both convergence and exchange cost
    at zero extra jobs (the counts ride the existing convergence probe)."""
    # static guard: a non-integral id column (string doc ids, doubles)
    # would cast to NULL with ANSI off, silently dropping EVERY edge and
    # reporting all nodes as singletons — fail loudly on the driver instead.
    dtypes = dict(edges.dtypes)
    for c in (id_a, id_b):
        if dtypes.get(c) not in ("tinyint", "smallint", "int", "bigint"):
            raise TypeError(
                f"connected_components: column {c!r} has type "
                f"{dtypes.get(c)!r}; ids must be integral — hash string ids "
                "first (F.xxhash64)"
            )
    e = (
        edges.select(
            F.col(id_a).cast("long").alias("u"), F.col(id_b).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev = None
    rounds = 0
    edges_per_round: list[int] = []
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        e = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        probe = e.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-insensitive set fingerprint with no ANSI
            # overflow (a sum of xxhash64 longs overflows int64)
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        rounds += 1
        edges_per_round.append(int(probe["n"]))
        cur = (probe["n"], probe["h"])
        if cur == prev:
            break
        prev = cur
    else:  # pragma: no cover - loud backstop, not an expected state
        # 64 default: the worst case is ~log2(diameter) + O(log^2 n)
        # rounds — a pathological high-diameter component (one long
        # near-dup chain) converges slower than the average-case bound,
        # and 25 rounds was reachable for valid inputs at 10^10 nodes.
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    if stats is not None:
        stats["rounds"] = rounds
        stats["edges_per_round"] = edges_per_round
    # converged edge set is a star forest: every edge is (member, root)
    labels = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = (
        e.select(F.col("v").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    return labels.union(roots).distinct()


def assign_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Every node gets a component label; edge-free nodes are their own
    singleton component.  This is the dedup retention input: keep
    min(id) per component, drop the rest."""
    cc = connected_components(edges, id_a, id_b)
    n = nodes.select(F.col(id_col).cast("long").alias("id")).distinct()
    return n.join(cc, "id", "left").select(
        F.col("id"),
        F.coalesce(F.col("component"), F.col("id")).alias("component"),
    )
