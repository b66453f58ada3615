"""Politeness scheduler (O1/O5/O6 [EXT]) — the priority queue as a DataFrame.

Replaces the reference's FIFO RabbitMQ queue + prefetch backpressure
(``orchestration/RabbitMqOrchestrationProvider.java:110-144``) with a
deterministic rank-over-window selection.  The crawl-ordering contract
(BASELINE.md): total order ``(priority, next_fetch_time, seq)`` — ``seq``
reproduces reference FIFO when priorities tie, and the order is a pure
function of the data, never of task scheduling, so `local[8]` and
`local[32]` runs are bit-identical.

Virtual-time politeness model (shared verbatim with the pure-Python
oracle in oracle.py — this docstring IS the contract):

- ``host = coalesce(hostname, ip)``; virtual clock starts at 0.0 and
  advances by ``batch_period`` (default 10.0 s) per micro-batch.
- robots rules (host, path_prefix, allow, crawl_delay): longest
  path-prefix match per (host, url_path); an exact-host rule beats the
  ``'*'`` wildcard. ``allow=false`` -> terminal status ROBOTS_BLOCKED.
  ``crawl_delay`` defaults to 1.0 s.
- a host is *eligible* when ``next_fetch_time <= clock`` (initially 0).
- per-batch per-host budget = ``max(1, floor(batch_period / crawl_delay))``.
- batch selection = ``row_number() over (partition by host order by
  priority, seq) <= budget``.
- after the batch, for each host that fetched k rows:
  ``next_fetch_time = clock + k * crawl_delay``.

Hot-host skew [north_rule]: the fetch stage repartitions on a *salted*
key ``(host, pmod(xxhash64(url_canon), S))`` so one hot host spreads over
S tasks; per-host state is re-aggregated unsalted afterwards (the groupBy
below is on the bare host).

Robots matching scale plan (round-2 rewrite): the best rule is a function
of the DISTINCT (host, path) key, not of the frontier row — so the match
runs over the distinct keys (tiny vs a 10^10-row frontier), with an
equi-join for exact-host rules plus a broadcast of only the wildcard
rules, reduced by one ``max_by`` aggregation (no BroadcastNestedLoopJoin
over the frontier, no per-job_id window shuffle+sort of frontier×rules),
then ONE hash equi-join back to the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

DEFAULT_BATCH_PERIOD = 10.0
DEFAULT_CRAWL_DELAY = 1.0

HOST_STATE_SCHEMA = "host: string, next_fetch_time: double, crawl_delay: double"


def host_col() -> F.Column:
    return F.coalesce(F.col("hostname"), F.col("ip"))


def _best_rules_for_keys(keys: DataFrame, robots: DataFrame) -> DataFrame:
    """Best robots rule per distinct (host, path) key.

    keys: DataFrame[(host, _path)] (distinct).  Exact-host rules join by
    host equality (hash join); wildcard rules ('*') are a tiny broadcast
    unioned in.  Within the candidates, the winner is picked by ONE
    ``max_by`` aggregation on (is_exact, prefix_len, allow, crawl_delay)
    — the trailing fields only break exact ties deterministically.
    """
    r = robots.select(
        F.col("host").alias("_r_host"),
        F.col("path_prefix").alias("_r_prefix"),
        F.col("allow").alias("_r_allow"),
        F.col("crawl_delay").alias("_r_delay"),
    )
    exact = keys.join(r, keys["host"] == r["_r_host"], "inner").withColumn(
        "_is_exact", F.lit(1)
    )
    wild = keys.join(
        F.broadcast(r.filter(F.col("_r_host") == "*")), how="cross"
    ).withColumn("_is_exact", F.lit(0))
    cand = exact.unionByName(wild).filter(
        F.col("_path").startswith(F.col("_r_prefix"))
    )
    rank = F.struct(
        F.col("_is_exact"),
        F.length("_r_prefix").alias("_plen"),
        F.col("_r_allow"),
        F.col("_r_delay"),
    )
    return cand.groupBy("host", "_path").agg(
        F.max_by(F.struct(F.col("_r_allow"), F.col("_r_delay")), rank).alias("_best")
    )


def robots_match(
    df: DataFrame,
    robots: DataFrame,
    id_col: str = "job_id",
    host_col_name: str = "host",
    path_col=None,
) -> DataFrame:
    """O6: longest-prefix-match robots rules -> adds (robots_allow, crawl_delay).

    robots: (host, path_prefix, allow, crawl_delay); '*' matches any host but
    loses to an exact host row; longer path_prefix wins within a host.
    ``path_col`` is a Column (or name) holding the URL path; defaults '/'.

    Plan shape (the 100×-scale contract): match per distinct (host, path)
    — never per frontier row — then one equi-join back.  ``.explain``
    shows no BroadcastNestedLoopJoin and no window over ``id_col``.
    """
    if path_col is None:
        path = F.lit("/")
    elif isinstance(path_col, str):
        path = F.col(path_col)
    else:
        path = path_col
    keyed = df.withColumn("_path", path)
    keys = keyed.select(F.col(host_col_name).alias("host"), "_path").distinct()
    best = _best_rules_for_keys(keys, robots).select(
        F.col("host").alias("_bk_host"),
        F.col("_path").alias("_bk_path"),
        F.col("_best"),
    )
    out = (
        keyed.join(
            best,
            (keyed[host_col_name] == F.col("_bk_host"))
            & (F.col("_path") == F.col("_bk_path")),
            "left",
        )
        .withColumn("robots_allow", F.coalesce(F.col("_best._r_allow"), F.lit(True)))
        .withColumn(
            "crawl_delay",
            F.coalesce(F.col("_best._r_delay"), F.lit(DEFAULT_CRAWL_DELAY)),
        )
        .drop("_bk_host", "_bk_path", "_best", "_path")
    )
    return out


def robots_best_for_const_path(robots: DataFrame, path: str = "/"):
    """Best rule per RULE host for a CONSTANT path, computed entirely on
    the (tiny) rules dimension — the frontier is never shuffled and no
    driver collect runs (everything stays lazy for the caller's one job).

    Returns (exact_best DataFrame[(host, _rb_allow, _rb_delay)],
    wild_best one-row DataFrame[(_w_allow, _w_delay)] — nulls when no
    wildcard rule matches).
    """
    cand = robots.filter(F.lit(path).startswith(F.col("path_prefix")))
    rank = F.struct(
        F.length("path_prefix").alias("_plen"),
        F.col("allow"),
        F.col("crawl_delay"),
    )
    exact_best = (
        cand.filter(F.col("host") != "*")
        .groupBy("host")
        .agg(
            F.max_by(
                F.struct(
                    F.col("allow").alias("_rb_allow"),
                    F.col("crawl_delay").alias("_rb_delay"),
                ),
                rank,
            ).alias("_rb")
        )
        .select("host", F.col("_rb._rb_allow").alias("_rb_allow"), F.col("_rb._rb_delay").alias("_rb_delay"))
    )
    # global aggregation -> always exactly ONE row (null struct if empty)
    wild_best = (
        cand.filter(F.col("host") == "*")
        .agg(F.max_by(F.struct(F.col("allow"), F.col("crawl_delay")), rank).alias("_w"))
        .select(
            F.col("_w.allow").alias("_w_allow"),
            F.col("_w.crawl_delay").alias("_w_delay"),
        )
    )
    return exact_best, wild_best


def apply_robots(frontier: DataFrame, robots: DataFrame, url_path: str = "/") -> DataFrame:
    """O6 at publish time: frontier rows carry no path (the reference's unit
    of work is host:port), so rules match against the constant root path —
    which means the best rule is a function of HOST alone, computed on the
    rules dimension and broadcast: ONE broadcast equi-join plus a one-row
    broadcast cross join onto the frontier, zero frontier shuffles and
    zero driver collects (the round-1 plan was a BNLJ + per-job window;
    the first round-2 cut still shuffled the frontier twice via
    distinct + join-back)."""
    fr = frontier.withColumn("host", host_col())
    exact_best, wild_best = robots_best_for_const_path(robots, url_path)
    return (
        fr.crossJoin(F.broadcast(wild_best))
        .join(F.broadcast(exact_best), "host", "left")
        .withColumn(
            "robots_allow",
            F.coalesce(F.col("_rb_allow"), F.col("_w_allow"), F.lit(True)),
        )
        .withColumn(
            "crawl_delay",
            F.coalesce(
                F.col("_rb_delay"), F.col("_w_delay"), F.lit(DEFAULT_CRAWL_DELAY)
            ),
        )
        .drop("_rb_allow", "_rb_delay", "_w_allow", "_w_delay")
    )


def select_batch(
    frontier: DataFrame,
    host_state: DataFrame,
    clock: float,
    batch_period: float = DEFAULT_BATCH_PERIOD,
    eligible_obs: Observation | None = None,
) -> DataFrame:
    """O5+O1: eligibility filter + per-host budgeted rank-over-window.

    frontier rows need: job_id, host, priority, seq, crawl_delay.
    host_state: (host, next_fetch_time, crawl_delay).

    ``eligible_obs``: optional Observation that records the pre-budget
    eligible row count (metric ``eligible``) as a side effect of whatever
    action the caller runs on the selection — the deferred counter
    (eligible - selected) then costs no extra job (SURVEY.md §4 item 5:
    only O(1) metrics hit the driver).
    """
    hs = host_state.select(
        F.col("host").alias("_hs_host"), F.col("next_fetch_time").alias("_nft")
    )
    eligible = (
        frontier.join(hs, frontier["host"] == hs["_hs_host"], "left")
        .withColumn("next_fetch_time", F.coalesce(F.col("_nft"), F.lit(0.0)))
        .filter(F.col("next_fetch_time") <= F.lit(clock))
        .drop("_hs_host", "_nft")
    )
    if eligible_obs is not None:
        eligible = eligible.observe(
            eligible_obs, F.count(F.lit(1)).alias("eligible")
        )
    budget = F.greatest(
        F.lit(1), F.floor(F.lit(batch_period) / F.col("crawl_delay"))
    ).cast("int")
    w = Window.partitionBy("host").orderBy("priority", "seq")
    return (
        eligible.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= budget)
        .drop("_rn")
    )


def updated_host_state(
    host_state: DataFrame,
    fetched_batch: DataFrame,
    clock: float,
) -> DataFrame:
    """MERGE-equivalent per-host state update: hosts that fetched k rows get
    next_fetch_time = clock + k * crawl_delay. State stays tiny:
    (host, next_fetch_time, crawl_delay)."""
    served = fetched_batch.groupBy("host").agg(
        F.count(F.lit(1)).alias("_k"), F.first("crawl_delay").alias("_delay")
    )
    hs = host_state.select(
        "host", "next_fetch_time", F.col("crawl_delay").alias("_old_delay")
    )
    merged = hs.join(served, "host", "full")
    return merged.select(
        "host",
        F.when(
            F.col("_k").isNotNull(), F.lit(clock) + F.col("_k") * F.col("_delay")
        )
        .otherwise(F.col("next_fetch_time"))
        .alias("next_fetch_time"),
        F.coalesce(F.col("_delay"), F.col("_old_delay")).alias("crawl_delay"),
    )


def salted_repartition(df: DataFrame, salt_buckets: int = 8, partitions: int | None = None) -> DataFrame:
    """Defuse hot-host skew before the fetch join (SURVEY.md §4 item 1)."""
    salt = F.pmod(F.xxhash64(F.col("url_canon")), F.lit(salt_buckets))
    if partitions:
        return df.repartition(partitions, F.col("host"), salt)
    return df.repartition(F.col("host"), salt)
