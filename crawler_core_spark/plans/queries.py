"""Driver-facing query suite over /root/testdata parquet tables.

Each query expresses one operator family from SURVEY.md §2 on the shared
test tables (region nation customer supplier part orders lineitem events
documents embeddings), with a DuckDB-runnable ANSI-SQL oracle computing
the identical result.  Crawler-shaped inputs (target strings, dns,
denylists, robots rules, frontier rows) are derived *deterministically
from the tables themselves* with closed-form expressions, so both sides
compute from the same rows and the comparison is exact.

Column-name discipline: every computed column is aliased identically in
the Spark plan and the SQL (the driver sorts columns by name and
value-hashes).  Doubles are rounded on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_core_spark.functions.text import (
    count_tokens_in,
    lang_id_col,
    quality_score_col,
    stopword_ratio_col,
    token_count_col,
    tokens_col,
)
from crawler_core_spark.functions.url import canonicalize_urls_udf
from crawler_core_spark.operators.publish import parse_and_route
from crawler_core_spark.operators.results import latest_result_per_job
from crawler_core_spark.operators.scheduler import robots_match, select_batch
from crawler_core_spark.plans.monitor import ProgressMonitor
from crawler_core_spark.sources.denylist import Denylist
from crawler_core_spark.sources.targets import (
    crux_targets,
    mx_expanded_targets,
    target_lines_df,
    tranco_targets,
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# shared closed-form generators (Spark side)
# ---------------------------------------------------------------------------

def _ip_expr(k):
    """'10.a.b.c' derived from an integer key (matches the SQL oracle)."""
    return F.concat_ws(
        ".",
        F.lit("10"),
        (F.floor(k / 65536) % 256).cast("string"),
        (F.floor(k / 256) % 256).cast("string"),
        (k % 256).cast("string"),
    )


_IP_SQL = (
    "'10.' || (({k} // 65536) % 256) || '.' || (({k} // 256) % 256) || '.' || ({k} % 256)"
)


def _publish_inputs(spark: SparkSession, sf_dir: str):
    """Crawler seed list + dns + denylist derived from `customer`.

    Line forms by k % 6 (k = c_custkey): ip / ip:port / hostname /
    hostname:port / 'rank,hostname' / ip:badport; every 31st line a
    comment, every 37th empty (S1 filter fodder). DNS: host-k resolves to
    ip(k+7) unless k % 41 == 0. Denylist: domains k%23==0, ips k%29==0,
    CIDR 10.42.0.0/16.
    """
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    k = F.col("k")
    host = F.concat(F.lit("host-"), k.cast("string"), F.lit(".example.com"))
    ip = _ip_expr(k)
    goodport = (F.lit(1024) + k % 60000).cast("string")
    badport = (F.lit(65536) + k % 10000).cast("string")
    rank = (k % 1000 + 1).cast("string")
    form = (k % 6).cast("int")
    value = (
        F.when(k % 31 == 0, F.concat(F.lit("# comment "), k.cast("string")))
        .when(k % 37 == 0, F.lit(""))
        .when(form == 0, ip)
        .when(form == 1, F.concat(ip, F.lit(":"), goodport))
        .when(form == 2, host)
        .when(form == 3, F.concat(host, F.lit(":"), goodport))
        .when(form == 4, F.concat(rank, F.lit(","), host))
        .otherwise(F.concat(ip, F.lit(":"), badport))
    )
    lines = c.select(k.alias("line_no"), value.alias("value"))
    targets = target_lines_df(lines)

    dns = c.select(
        host.alias("hostname"),
        _ip_expr(k + 7).alias("ip"),
        (k % 41 != 0).alias("resolvable"),
    )
    denylist = Denylist(
        domains=c.filter(k % 23 == 0).select(host.alias("deny_domain")),
        ips=c.filter(k % 29 == 0).select(_ip_expr(k).alias("deny_ip")),
        cidrs=spark.createDataFrame(
            [("10.42.0.0/16", 10 * 16777216 + 42 * 65536 + 1, 10 * 16777216 + 42 * 65536 + 65534)],
            "cidr: string, ip_lo: long, ip_hi: long",
        ),
    )
    return targets, dns, denylist


_PUBLISH_CTE = f"""
WITH kept AS (
  SELECT c_custkey AS k,
         row_number() OVER (ORDER BY c_custkey) - 1 AS seq
  FROM customer WHERE c_custkey % 31 <> 0 AND c_custkey % 37 <> 0
), f AS (
  SELECT k, seq, (k % 6) AS form,
         {_IP_SQL.format(k='k')} AS ip_lit,
         {_IP_SQL.format(k='(k+7)')} AS ip_res,
         'host-' || k || '.example.com' AS host,
         1024 + k % 60000 AS goodport,
         (k % 1000 + 1) AS rnk
  FROM kept
), parsed AS (
  SELECT k, seq, form, host, ip_lit, ip_res, goodport, rnk,
    CASE WHEN form IN (2,3,4) THEN host END AS hostname,
    CASE WHEN form IN (0,1,5) THEN ip_lit
         WHEN form IN (2,3,4) AND k % 41 <> 0 THEN ip_res END AS ip,
    CAST(CASE WHEN form IN (1,3) THEN goodport ELSE 443 END AS INTEGER) AS port,
    CAST(CASE WHEN form = 4 THEN rnk ELSE 0 END AS INTEGER) AS tranco_rank,
    CASE WHEN form IN (0,1,5)
         THEN 167772160 + ((k // 65536) % 256) * 65536 + ((k // 256) % 256) * 256 + (k % 256)
         WHEN form IN (2,3,4) AND k % 41 <> 0
         THEN 167772160 + (((k+7) // 65536) % 256) * 65536 + (((k+7) // 256) % 256) * 256 + ((k+7) % 256)
         END AS ip_num
  FROM f
), routed AS (
  SELECT seq, hostname, ip, port, tranco_rank,
    CASE
      WHEN form IN (2,3,4) AND k % 41 = 0 THEN 'UNRESOLVABLE'
      WHEN hostname IN (SELECT 'host-' || c_custkey || '.example.com' FROM customer WHERE c_custkey % 23 = 0)
        OR ip IN (SELECT {_IP_SQL.format(k='c_custkey')} FROM customer WHERE c_custkey % 29 = 0)
        OR (ip_num BETWEEN 167772160 + 42*65536 + 1 AND 167772160 + 42*65536 + 65534)
      THEN 'DENYLISTED'
      ELSE 'TO_BE_EXECUTED'
    END AS status
  FROM parsed
)
"""


def q_publish_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 parse + S6/J3 dns + T3/J1/J2 denylist + T2 routing, per-row."""
    targets, dns, denylist = _publish_inputs(spark, sf_dir)
    routed = parse_and_route(targets, dns, denylist, "bs-q")
    return routed.all_jobs.select(
        "seq", "hostname", "ip", "port", "tranco_rank", "status"
    )


SQL_PUBLISH_ROUTE = _PUBLISH_CTE + "SELECT seq, hostname, ip, port, tranco_rank, status FROM routed"


def q_publish_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — status histogram at publish (PublishBulkScanJob.java:71-86)."""
    targets, dns, denylist = _publish_inputs(spark, sf_dir)
    routed = parse_and_route(targets, dns, denylist, "bs-q")
    return routed.all_jobs.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


SQL_PUBLISH_HISTOGRAM = _PUBLISH_CTE + "SELECT status, count(*) AS n FROM routed GROUP BY status"


def q_tranco_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/O4 — tranco 'rank,host' list, first N kept (rank <= 500)."""
    c = load(spark, sf_dir, "customer")
    csv = c.select(
        F.concat(
            F.col("c_custkey").cast("string"),
            F.lit(",host-"),
            F.col("c_custkey").cast("string"),
            F.lit(".example.com"),
        ).alias("value")
    )
    return tranco_targets(spark, csv, 500)


SQL_TRANCO_TOPN = """
SELECT row_number() OVER (ORDER BY c_custkey) - 1 AS seq,
       c_custkey || ',host-' || c_custkey || '.example.com' AS target
FROM customer WHERE c_custkey <= 500
"""


def q_crux_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — crux 'proto://domain,rank': https-only, rank <= 400, strip proto."""
    p = load(spark, sf_dir, "part")
    proto = F.when(F.col("p_partkey") % 2 == 0, F.lit("https://")).otherwise(F.lit("http://"))
    csv = p.select(
        F.concat(
            proto,
            F.lit("dom-"), F.col("p_partkey").cast("string"), F.lit(".example.org,"),
            F.col("p_partkey").cast("string"),
        ).alias("value")
    )
    return crux_targets(spark, csv, 400)


SQL_CRUX_FILTER = """
SELECT row_number() OVER (ORDER BY p_partkey) - 1 AS seq,
       'dom-' || p_partkey || '.example.org' AS target
FROM part WHERE p_partkey % 2 = 0 AND p_partkey <= 400
"""


def q_mx_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/A6 — MX-record expansion: flatten + first-seen distinct
    (TrancoEmailListProvider.java:37-64)."""
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    csv = n.select(
        F.concat(
            (F.col("n_nationkey") + 1).cast("string"),
            F.lit(",nation-"), F.col("n_nationkey").cast("string"), F.lit(".example.org"),
        ).alias("value")
    )
    tranco = tranco_targets(spark, csv, 100)
    mx_table = (
        s.select(
            F.concat(F.lit("nation-"), F.col("s_nationkey").cast("string"), F.lit(".example.org")).alias("hostname"),
            F.struct(
                F.col("s_suppkey"),
                F.concat(F.lit("mx-"), (F.col("s_suppkey") % 37).cast("string"), F.lit(".mail.test")).alias("mx"),
            ).alias("rec"),
        )
        .groupBy("hostname")
        .agg(F.sort_array(F.collect_list("rec")).alias("recs"))
        .select("hostname", F.col("recs.mx").alias("mx_hosts"))
    )
    return mx_expanded_targets(spark, tranco, mx_table)


SQL_MX_EXPAND = """
WITH tranco AS (
  SELECT n_nationkey + 1 AS rnk,
         row_number() OVER (ORDER BY n_nationkey + 1) - 1 AS seq,
         'nation-' || n_nationkey || '.example.org' AS hostname
  FROM nation WHERE n_nationkey + 1 <= 100
), ex AS (
  SELECT t.seq, s.s_suppkey,
         'mx-' || (s.s_suppkey % 37) || '.mail.test' AS mx
  FROM tranco t JOIN supplier s
    ON 'nation-' || s.s_nationkey || '.example.org' = t.hostname
), pos AS (
  SELECT seq, mx,
         row_number() OVER (PARTITION BY seq ORDER BY s_suppkey) - 1 AS pos
  FROM ex
), first_seen AS (
  SELECT mx AS target, min(seq * 1000000 + pos) AS ord FROM pos GROUP BY mx
)
SELECT row_number() OVER (ORDER BY ord) - 1 AS seq, target FROM first_seen
"""


def q_denylist_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3/J1/J2 — denylist membership as broadcast hash + range joins."""
    s = load(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    df = s.select(
        k.alias("job"),
        F.concat(F.lit("sup-"), k.cast("string"), F.lit(".example.com")).alias("hostname"),
        _ip_expr(k * 7).alias("ip"),
    )
    dl = Denylist(
        domains=s.filter(k % 11 == 0).select(
            F.concat(F.lit("sup-"), k.cast("string"), F.lit(".example.com")).alias("deny_domain")
        ),
        ips=s.filter(k % 13 == 0).select(_ip_expr(k * 7).alias("deny_ip")),
        cidrs=spark.createDataFrame(
            [("10.0.4.0/24", 10 * 16777216 + 4 * 256 + 1, 10 * 16777216 + 4 * 256 + 254)],
            "cidr: string, ip_lo: long, ip_hi: long",
        ),
    )
    return dl.mark(df).select("job", "denylisted")


SQL_DENYLIST_MARK = f"""
WITH s AS (
  SELECT s_suppkey AS k,
         'sup-' || s_suppkey || '.example.com' AS hostname,
         {_IP_SQL.format(k='(s_suppkey*7)')} AS ip,
         167772160 + (((s_suppkey*7) // 65536) % 256) * 65536
                   + (((s_suppkey*7) // 256) % 256) * 256 + ((s_suppkey*7) % 256) AS ip_num
  FROM supplier
)
SELECT k AS job,
       (hostname IN (SELECT 'sup-' || s_suppkey || '.example.com' FROM supplier WHERE s_suppkey % 11 = 0)
        OR ip IN (SELECT {_IP_SQL.format(k='(s_suppkey*7)')} FROM supplier WHERE s_suppkey % 13 = 0)
        OR ip_num BETWEEN 167772160 + 4*256 + 1 AND 167772160 + 4*256 + 254) AS denylisted
FROM s
"""


def q_priority_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O5 — rank-over-window priority queue with per-host politeness
    budget (budget = max(1, floor(10 / crawl_delay)))."""
    o = load(spark, sf_dir, "orders")
    frontier = o.select(
        F.col("o_orderkey").alias("job_id"),
        F.col("o_custkey").cast("string").alias("host"),
        F.split(F.col("o_orderpriority"), "-").getItem(0).cast("int").alias("priority"),
        F.col("o_orderkey").alias("seq"),
        (F.col("o_custkey") % 5 + 1).cast("double").alias("crawl_delay"),
    )
    empty_state = spark.createDataFrame([], "host: string, next_fetch_time: double, crawl_delay: double")
    sel = select_batch(frontier, empty_state, clock=0.0, batch_period=10.0)
    return sel.select("job_id", "host", "priority")


SQL_PRIORITY_BATCH = """
WITH f AS (
  SELECT o_orderkey AS job_id,
         CAST(o_custkey AS VARCHAR) AS host,
         CAST(string_split(o_orderpriority, '-')[1] AS INTEGER) AS priority,
         o_orderkey AS seq,
         (o_custkey % 5 + 1) AS crawl_delay
  FROM orders
)
SELECT job_id, host, priority FROM (
  SELECT job_id, host, priority,
         row_number() OVER (PARTITION BY host ORDER BY priority, seq) AS rn,
         greatest(1, floor(10.0 / crawl_delay)) AS budget
  FROM f
) WHERE rn <= budget
"""


def q_latest_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — most-recent-result-wins (MongoPersistenceProvider.java:362-370)
    over the events log: latest event per user."""
    e = load(spark, sf_dir, "events")
    results = e.select(
        F.col("user_id").alias("job_id"),
        F.col("ts"),
        F.col("event_id").alias("batch_id"),
        F.col("event_type"),
        F.round(F.col("value"), 6).alias("value"),
    )
    return latest_result_per_job(results).select("job_id", "batch_id", "event_type", "value")


SQL_LATEST_RESULT = """
SELECT user_id AS job_id, event_id AS batch_id, event_type, round(value, 6) AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_robots_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 — longest-prefix robots matching; exact host beats wildcard."""
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    df = o.select(
        F.col("o_orderkey").alias("job_id"),
        F.concat(F.lit("h"), (F.col("o_custkey") % 12).cast("string")).alias("host"),
        F.concat(F.lit("/p/"), (F.col("o_orderkey") % 3).cast("string")).alias("path"),
    )
    rules = n.select(
        F.concat(F.lit("h"), (F.col("n_nationkey") % 10).cast("string")).alias("host"),
        F.when(F.col("n_nationkey") < 10, F.lit("/"))
        .when(F.col("n_nationkey") < 20, F.lit("/p/"))
        .otherwise(F.lit("/p/1")).alias("path_prefix"),
        (F.col("n_nationkey") % 4 != 0).alias("allow"),
        (1.0 + F.col("n_nationkey") % 5).alias("crawl_delay"),
    ).unionByName(
        spark.createDataFrame(
            [("*", "/", True, 0.5)],
            "host: string, path_prefix: string, allow: boolean, crawl_delay: double",
        )
    )
    out = robots_match(df, rules, id_col="job_id", path_col="path")
    return out.select("job_id", "robots_allow", "crawl_delay")


SQL_ROBOTS_MATCH = """
WITH df AS (
  SELECT o_orderkey AS job_id,
         'h' || (o_custkey % 12) AS host,
         '/p/' || (o_orderkey % 3) AS path
  FROM orders
), rules AS (
  SELECT 'h' || (n_nationkey % 10) AS host,
         CASE WHEN n_nationkey < 10 THEN '/'
              WHEN n_nationkey < 20 THEN '/p/'
              ELSE '/p/1' END AS path_prefix,
         (n_nationkey % 4 <> 0) AS allow,
         1.0 + (n_nationkey % 5) AS crawl_delay
  FROM nation
  UNION ALL SELECT '*', '/', true, 0.5
), matched AS (
  SELECT d.job_id, r.allow, r.crawl_delay,
         row_number() OVER (
           PARTITION BY d.job_id
           ORDER BY CASE WHEN r.host = '*' THEN 1 ELSE 0 END,
                    length(r.path_prefix) DESC
         ) AS rn
  FROM df d JOIN rules r
    ON (d.host = r.host OR r.host = '*') AND starts_with(d.path, r.path_prefix)
)
SELECT d.job_id,
       coalesce(m.allow, true) AS robots_allow,
       coalesce(m.crawl_delay, 1.0) AS crawl_delay
FROM df d LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m ON d.job_id = m.job_id
"""


def q_canon_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + exact URL-seen grouping (A7 correctness path):
    scheme/host case, default-port elision, duplicate-slash collapse."""
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    base = F.concat(F.lit("p-"), F.floor(k / 4).cast("string"), F.lit(".example.com"))
    url = (
        F.when(k % 4 == 0, F.concat(F.lit("http://"), base, F.lit("/a/b")))
        .when(k % 4 == 1, F.concat(F.lit("HTTP://"), F.upper(base), F.lit(":80/a/b")))
        .when(k % 4 == 2, F.concat(F.lit("https://"), base, F.lit("/x")))
        .otherwise(F.concat(F.lit("http://"), base, F.lit("/a//b")))
    )
    return (
        p.select(canonicalize_urls_udf(url).alias("url_canon"))
        .groupBy("url_canon")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_CANON_DEDUP = """
WITH u AS (
  SELECT CASE WHEN p_partkey % 4 = 2
              THEN 'https://p-' || (p_partkey // 4) || '.example.com/x'
              ELSE 'http://p-' || (p_partkey // 4) || '.example.com/a/b'
         END AS url_canon
  FROM part
)
SELECT url_canon, count(*) AS n FROM u GROUP BY url_canon
"""


def q_progress_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4 — EMA of per-batch done-counts with the reference's exact
    alpha schedule (ProgressMonitor.java:108-114), computed driver-side
    over the tiny per-batch series (one row per day bucket)."""
    e = load(spark, sf_dir, "events")
    series = (
        e.select(F.floor(F.unix_timestamp("ts") / 86400).alias("batch_id"))
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
        .orderBy("batch_id")
        .collect()
    )
    # EMA over v with the reference alpha schedule (n is 1-based); same
    # recurrence as ProgressMonitor.on_done with per-batch values as the
    # "durations" — ema_1 == v_1 because alpha_1 = 2/(1+1) = 1.
    rows, ema = [], -1.0
    for i, r in enumerate(series, start=1):
        alpha = 0.1 if i > 20 else 2.0 / (i + 1)
        ema = alpha * r["v"] + (1 - alpha) * ema if i > 1 else r["v"]
        rows.append((int(r["batch_id"]), round(ema, 6)))
    return spark.createDataFrame(rows, "batch_id: long, ema: double")


SQL_PROGRESS_EMA = """
WITH RECURSIVE b AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS batch_id,
         CAST(count(*) AS DOUBLE) AS v
  FROM events GROUP BY 1
), s AS (
  SELECT row_number() OVER (ORDER BY batch_id) AS n, batch_id, v FROM b
), ema AS (
  SELECT n, batch_id, v, v AS e FROM s WHERE n = 1
  UNION ALL
  SELECT s.n, s.batch_id, s.v,
         (CASE WHEN s.n > 20 THEN 0.1 ELSE 2.0 / (s.n + 1) END) * s.v
         + (1 - CASE WHEN s.n > 20 THEN 0.1 ELSE 2.0 / (s.n + 1) END) * ema.e
  FROM s JOIN ema ON s.n = ema.n + 1
)
SELECT batch_id, round(e, 6) AS ema FROM ema
"""


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed counters (A2 shape): per-day, per-event-type counts and
    value sums — the batch equivalent of the done-notification stream."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.floor(F.unix_timestamp("ts") / 86400).alias("day"),
            "event_type",
            "value",
        )
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
    )


SQL_EVENTS_TUMBLING = """
SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, event_type,
       count(*) AS n, round(sum(value), 4) AS sum_v
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# training-data pipeline: documents + embeddings
# ---------------------------------------------------------------------------

def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring + token counting (native, codegen-friendly)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_col("text").alias("n_tokens"),
        F.round(stopword_ratio_col("text"), 6).alias("stop_ratio"),
        F.round(quality_score_col("text"), 6).alias("quality"),
    )


SQL_DOC_TOKEN_STATS = """
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> x IN ('the','a','and','of','to'))) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS sr
  FROM t
)
SELECT doc_id, n_tokens, round(sr, 6) AS stop_ratio,
       round((1.0 - sr) * least(1.0, n_tokens / 100.0), 6) AS quality
FROM m
"""


def q_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (functions/text.py:BPE_PRETOKEN_RE) beside
    the whitespace count — the token-budget estimate an LLM-training
    pipeline runs over a crawl corpus.  Fully native regexp_extract_all;
    the DuckDB oracle runs the IDENTICAL pattern (RE2 ≡ java.util.regex
    on this lookahead-free ASCII-classed grammar)."""
    from crawler_core_spark.functions.text import bpe_token_count_col

    d = load(spark, sf_dir, "documents")
    n_ws = token_count_col("text")
    n_bpe = bpe_token_count_col("text")
    return d.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(
            F.when(n_ws > 0, n_bpe.cast("double") / n_ws).otherwise(0.0), 6
        ).alias("bpe_per_word"),
    )


SQL_DOC_BPE_TOKENS = """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS BIGINT) AS n_ws,
         CAST(len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^ \\t\\n\\r\\fa-zA-Z0-9'']+|''| ?[ \\t\\n\\r\\f]+'
         )) AS BIGINT) AS n_bpe
  FROM documents
)
SELECT doc_id, n_ws AS n_ws_tokens, n_bpe AS n_bpe_tokens,
       round(CASE WHEN n_ws > 0 THEN CAST(n_bpe AS DOUBLE) / n_ws
             ELSE 0.0 END, 6) AS bpe_per_word
FROM t
"""


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic over marker stopwords (deterministic tie-break)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id_col("text").alias("lang_pred"))


SQL_DOC_LANG_ID = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') AS toks FROM documents
), s AS (
  SELECT doc_id,
         len(list_filter(toks, x -> x IN ('the','a','and'))) AS s_en,
         len(list_filter(toks, x -> x IN ('der','die','und'))) AS s_de,
         len(list_filter(toks, x -> x IN ('le','la','et'))) AS s_fr
  FROM t
)
SELECT doc_id,
       CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
            WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
            WHEN s_fr > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred
FROM s
"""


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content-prefix hash groups: survivor + group size
    (hash-groupBy dedup; the frontier's A7 applied to document text)."""
    d = load(spark, sf_dir, "documents")
    key = F.md5(F.substring(F.col("text"), 1, 30))
    w = Window.partitionBy("dup_key").orderBy("doc_id")
    return (
        d.select("doc_id", key.alias("dup_key"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("group_n", F.count(F.lit(1)).over(Window.partitionBy("dup_key")))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("group_n").cast("long").alias("group_n"))
    )


SQL_DOC_EXACT_DEDUP = """
SELECT doc_id, CAST(group_n AS BIGINT) AS group_n FROM (
  SELECT doc_id,
         row_number() OVER (PARTITION BY md5(substring(text, 1, 30)) ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY md5(substring(text, 1, 30))) AS group_n
  FROM documents
) WHERE rn = 1
"""


def q_doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup scoring for adjacent doc pairs — the
    exact-similarity oracle the MinHash path approximates."""
    d = load(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id"), F.array_distinct(tokens_col("text")).alias("ta"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), F.array_distinct(tokens_col("text")).alias("tb"))
    j = a.join(b, "doc_id")
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    union = F.size(F.array_union("ta", "tb")).cast("double")
    return j.select(
        "doc_id",
        F.round(F.when(union > 0, inter / union).otherwise(0.0), 6).alias("jaccard"),
    )


SQL_DOC_JACCARD_PAIRS = """
WITH t AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS toks
  FROM documents
)
SELECT a.doc_id,
       round(CASE WHEN len(list_distinct(list_concat(a.toks, b.toks))) > 0
             THEN CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.toks, b.toks)))
             ELSE 0.0 END, 6) AS jaccard
FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
"""


def q_doc_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates — scale path (no SQL oracle; the
    exact-Jaccard query above is the correctness anchor, and pytest pins
    bloom/minhash properties). Pure JVM: explode -> xxhash64 per
    permutation -> min -> band -> self-join on (band, signature)."""
    from crawler_core_spark.operators.dedup import minhash_lsh_pairs

    d = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, id_col="doc_id", text_col="text", n_hashes=16, bands=4,
        verify_threshold=0.8,
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: 5 query vectors vs the full
    embeddings table, native F.aggregate/zip_with dot products."""
    from crawler_core_spark.operators.ann import brute_force_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return brute_force_topk(e, queries, k=10)


SQL_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
), sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(
             CAST(q.qvec AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
  FROM sims
) WHERE rn <= 10
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH-bucketed ANN — the scale path (no SQL oracle;
    approximate by construction, pytest checks recall vs brute force)."""
    from crawler_core_spark.operators.ann import lsh_bucket_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return lsh_bucket_topk(e, queries, k=10, n_planes=4)


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + near-dup pairs by Hamming distance.  No SQL
    oracle for THIS query: the fingerprint derivation is xxhash64 bit
    math DuckDB cannot reproduce; pytest pins it against a pure-Python
    reference.  The downstream banding + bit_count-verify machinery
    (hamming_pairs) IS under the exact gate via `phash_hamming_near_dup`,
    which drives the same code over an SQL-derivable fingerprint."""
    from crawler_core_spark.operators.dedup import simhash_pairs

    d = load(spark, sf_dir, "documents")
    return simhash_pairs(d, id_col="doc_id", text_col="text", max_hamming=6)


QUERIES = {
    "publish_route": q_publish_route,
    "publish_histogram": q_publish_histogram,
    "tranco_topn": q_tranco_topn,
    "crux_filter": q_crux_filter,
    "mx_expand": q_mx_expand,
    "denylist_mark": q_denylist_mark,
    "priority_batch": q_priority_batch,
    "latest_result": q_latest_result,
    "robots_match": q_robots_match,
    "canon_dedup": q_canon_dedup,
    "progress_ema": q_progress_ema,
    "events_tumbling": q_events_tumbling,
    "doc_token_stats": q_doc_token_stats,
    "doc_bpe_tokens": q_doc_bpe_tokens,
    "doc_lang_id": q_doc_lang_id,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_jaccard_pairs": q_doc_jaccard_pairs,
    "doc_minhash_lsh": q_doc_minhash_lsh,
    "doc_simhash": q_doc_simhash,
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
}

ORACLE_SQL = {
    "publish_route": SQL_PUBLISH_ROUTE,
    "publish_histogram": SQL_PUBLISH_HISTOGRAM,
    "tranco_topn": SQL_TRANCO_TOPN,
    "crux_filter": SQL_CRUX_FILTER,
    "mx_expand": SQL_MX_EXPAND,
    "denylist_mark": SQL_DENYLIST_MARK,
    "priority_batch": SQL_PRIORITY_BATCH,
    "latest_result": SQL_LATEST_RESULT,
    "robots_match": SQL_ROBOTS_MATCH,
    "canon_dedup": SQL_CANON_DEDUP,
    "progress_ema": SQL_PROGRESS_EMA,
    "events_tumbling": SQL_EVENTS_TUMBLING,
    "doc_token_stats": SQL_DOC_TOKEN_STATS,
    "doc_bpe_tokens": SQL_DOC_BPE_TOKENS,
    "doc_lang_id": SQL_DOC_LANG_ID,
    "doc_exact_dedup": SQL_DOC_EXACT_DEDUP,
    "doc_jaccard_pairs": SQL_DOC_JACCARD_PAIRS,
    "ann_topk": SQL_ANN_TOPK,
    # doc_minhash_lsh / doc_simhash / ann_lsh: non-SQL-expressible
    # (xxhash64 / FNV bit math / approximate) — rows-only driver check;
    # pytest pins them against exact references.
}


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) — the lag/cumulative-sum
    window idiom a crawl-log pipeline uses for per-host visit sessions."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = (
        e.withColumn("new_sess", new_sess)
        .withColumn("session_no", F.sum("new_sess").over(w).cast("long"))
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_v"),
        )
    )


SQL_EVENTS_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, value, ts,
         floor(epoch(ts)) - floor(epoch(lag(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id))) AS gap
  FROM events
), s AS (
  SELECT user_id, event_id, value,
         CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM g
)
SELECT user_id, session_no, count(*) AS n_events, round(sum(value), 4) AS sum_v
FROM s GROUP BY user_id, session_no
"""

QUERIES["events_sessionize"] = q_events_sessionize
ORACLE_SQL["events_sessionize"] = SQL_EVENTS_SESSIONIZE


def q_config_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-config propagation (ControllerTest.java:54-121 pinned): every
    queued job row carries the ScanConfig struct (BulkScanInfo per
    ScanJobDescription) — grouping the frontier by the propagated config
    fields must put EVERY published job in the one configured group."""
    from crawler_core_spark.config import ScanConfig

    targets, dns, denylist = _publish_inputs(spark, sf_dir)
    routed = parse_and_route(targets, dns, denylist, "bs-q")
    cfg = ScanConfig(
        scanner_detail="NORMAL",
        reexecutions=2,
        timeout_ms=5000.0,
        parallel_probes=4,
        excluded_probes=("probe1", "probe2"),
    )
    fr = (
        routed.frontier.withColumn("attempt", F.lit(0))
        .withColumn("scan_config", cfg.as_column())
    )
    return fr.groupBy(
        F.col("scan_config.scanner_detail").alias("scanner_detail"),
        F.col("scan_config.reexecutions").alias("reexecutions"),
        F.col("scan_config.parallel_probes").alias("parallel_probes"),
        F.col("scan_config.timeout_ms").alias("timeout_ms"),
        F.size("scan_config.excluded_probes").alias("n_excluded"),
        F.element_at("scan_config.excluded_probes", 1).alias("first_excluded"),
        F.col("attempt").alias("attempt"),
    ).agg(F.count(F.lit(1)).alias("n_jobs"))


SQL_CONFIG_PROPAGATION = _PUBLISH_CTE + """
SELECT 'NORMAL' AS scanner_detail,
       CAST(2 AS INTEGER) AS reexecutions,
       CAST(4 AS INTEGER) AS parallel_probes,
       CAST(5000.0 AS DOUBLE) AS timeout_ms,
       CAST(2 AS INTEGER) AS n_excluded,
       'probe1' AS first_excluded,
       CAST(0 AS INTEGER) AS attempt,
       count(*) AS n_jobs
FROM routed WHERE status = 'TO_BE_EXECUTED'
"""

QUERIES["config_propagation"] = q_config_propagation
ORACLE_SQL["config_propagation"] = SQL_CONFIG_PROPAGATION


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN with trained centroids — the production
    scale path (no SQL oracle: approximate by construction; pytest pins
    recall >= 0.7 vs brute force on clustered vectors and exact-cosine
    agreement on reported pairs)."""
    from crawler_core_spark.operators.ann import ivf_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ivf_topk(e, queries, k=10, n_centroids=8, n_probe=3, sample=1024)


QUERIES["ann_ivf"] = q_ann_ivf


def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram Jaccard near-dup scoring for adjacent doc pairs —
    the n-gram variant of the token-set path (robust to tokenization),
    fully native: sequence -> transform(substring) -> array_distinct ->
    array_intersect/union."""
    d = load(spark, sf_dir, "documents")

    def tri(colname):
        c = F.col(colname)
        n = F.length(c)
        idx = F.sequence(F.lit(1), F.greatest(F.lit(1), n - 2))
        return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(3))))

    a = d.select("doc_id", tri("text").alias("ga"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), tri("text").alias("gb"))
    j = a.join(b, "doc_id")
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = F.size(F.array_union("ga", "gb")).cast("double")
    return j.select(
        "doc_id",
        F.round(F.when(union > 0, inter / union).otherwise(0.0), 6).alias(
            "ngram_jaccard"
        ),
    )


SQL_DOC_NGRAM_JACCARD = """
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(1, length(text) - 2) + 1),
                                      i -> substring(text, CAST(i AS INTEGER), 3))) AS grams
  FROM documents
)
SELECT a.doc_id,
       round(CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
             THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.grams, b.grams)))
             ELSE 0.0 END, 6) AS ngram_jaccard
FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
"""

QUERIES["doc_ngram_jaccard"] = q_doc_ngram_jaccard
ORACLE_SQL["doc_ngram_jaccard"] = SQL_DOC_NGRAM_JACCARD


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs above a threshold, over a bounded
    id range (brute-force at oracle scale; the LSH/IVF buckets above are
    the 10^10-row path for the same predicate).  Norms are computed ONCE
    per row before the pair join — the naive per-pair cosine recomputes
    both norms |pairs| times (3x the higher-order-function work)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    sq = F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double"),
    )
    dotted = e.select(
        F.col("vec_id"), F.col("embedding"), F.sqrt(sq).alias("nrm")
    )
    a = dotted.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = dotted.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sim = F.round(
        F.when((F.col("na") > 0) & (F.col("nb") > 0), dot / (F.col("na") * F.col("nb")))
        .otherwise(F.lit(0.0)),
        6,
    )
    return (
        pairs.select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.2)
    )


SQL_EMBED_NEAR_DUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 500 AND b.vec_id < 500
  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.2
"""

QUERIES["embed_near_dup"] = q_embed_near_dup
ORACLE_SQL["embed_near_dup"] = SQL_EMBED_NEAR_DUP


def q_embed_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for the embed_near_dup predicate: banded sign-LSH
    candidate mining + exact verify (operators/ann.py:lsh_near_dup_pairs).
    Approximate recall (no SQL oracle — the banding is xxhash64-derived);
    pair-precision is exact by construction (every output pair is
    exact-verified), pinned with the recall gate in pytest."""
    from crawler_core_spark.operators.ann import lsh_near_dup_pairs

    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    # testdata embeddings are near-random (max pair cosine ~0.51), so the
    # query-scale dial is coarse buckets + many bands (p^3 per band at
    # tau=0.4 -> ~0.99 expected recall over 16 bands); production dials
    # for true near-dup corpora sit at tau>=0.8 with 6-8 planes.
    return lsh_near_dup_pairs(e, threshold=0.4, n_planes=3, n_bands=16)


def q_embed_near_dup_lsh_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH near-dup pair mining at n_planes=0: one bucket per band, the
    candidate set is all-pairs, so the SAME machinery (banding, bucket
    self-join, candidate dedup, vector join-back, exact verify) must
    EQUAL the exact all-pairs result — the driver-oracle twin."""
    from crawler_core_spark.operators.ann import lsh_near_dup_pairs

    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return lsh_near_dup_pairs(
        e, threshold=0.2, n_planes=0, n_bands=1, max_bucket=None
    )


def q_embed_near_dup_lsh_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``impl="arrow"`` throughput variant of embed_near_dup_lsh: the
    banding is ONE numpy matmul per Arrow batch instead of
    bands x planes x 4 xxhash expressions per vector element
    (operators/ann.py:arrow_band_buckets_udf).  Rows-only (plane values
    differ from the native path's by design); precision is exact by
    construction (same exact-verify stage) and the arrow-path exhaustive
    twin below is the oracle gate for the shared machinery."""
    from crawler_core_spark.operators.ann import lsh_near_dup_pairs

    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return lsh_near_dup_pairs(
        e, threshold=0.4, n_planes=3, n_bands=16, impl="arrow"
    )


def q_embed_near_dup_lsh_arrow_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-path driver-oracle twin: n_planes=0 short-circuits the UDF to
    one bucket per band, so the full arrow pipeline (pandas UDF ->
    posexplode -> bucket self-join -> dedup -> vector join-back -> exact
    verify) must EQUAL the exact all-pairs result."""
    from crawler_core_spark.operators.ann import lsh_near_dup_pairs

    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return lsh_near_dup_pairs(
        e, threshold=0.2, n_planes=0, n_bands=1, max_bucket=None, impl="arrow"
    )


QUERIES["embed_near_dup_lsh"] = q_embed_near_dup_lsh
QUERIES["embed_near_dup_lsh_exhaustive"] = q_embed_near_dup_lsh_exhaustive
ORACLE_SQL["embed_near_dup_lsh_exhaustive"] = SQL_EMBED_NEAR_DUP
QUERIES["embed_near_dup_lsh_arrow"] = q_embed_near_dup_lsh_arrow
QUERIES["embed_near_dup_lsh_arrow_exhaustive"] = q_embed_near_dup_lsh_arrow_exhaustive
ORACLE_SQL["embed_near_dup_lsh_arrow_exhaustive"] = SQL_EMBED_NEAR_DUP


# DuckDB can compute bit_count(xor(...)) natively, so the banded-Hamming
# miner — the operator the image corpus runs on its phash column
# (operators/dedup.py:phash_near_dup) — gets a FULLY EXACT oracle: the
# fingerprint below is derived from `documents` by plain shifts/xors both
# engines evaluate identically (group base bits 16.., one low perturbation
# bit 0-11, one conditional bit 32 — pairs land at Hamming 0-3 so the
# max_hamming=2 verify filter is exercised), and pigeonhole banding
# (4 chunks > max_hamming) makes the Spark side recall-complete.
SQL_PHASH_NEAR_DUP = """
WITH fp AS (
  SELECT doc_id,
         xor(xor(CAST(doc_id // 8 AS BIGINT) << 16,
                 CAST(1 AS BIGINT) << CAST(doc_id % 12 AS INT)),
             CASE WHEN doc_id % 3 = 0 THEN CAST(1 AS BIGINT) << 32
                  ELSE CAST(0 AS BIGINT) END) AS fp
  FROM documents WHERE doc_id < 1000
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= 2
"""


def q_phash_hamming_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-Hamming near-dup pair mining (operators/dedup.py:
    hamming_pairs) — the SAME machinery the image corpus applies to its
    perceptual-hash column (phash_near_dup), driven here over an
    SQL-derivable synthetic 64-bit fingerprint of `documents` so DuckDB
    verifies it EXACTLY: hamming<=2 pairs share one of four 16-bit
    chunks (pigeonhole), so banding with no bucket cap is
    recall-complete, and bit_count(xor) is exact on both engines."""
    from crawler_core_spark.operators.dedup import hamming_pairs

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    fp = d.select(
        "doc_id",
        F.expr(
            "shiftleft(CAST(doc_id div 8 AS BIGINT), 16)"
            " ^ shiftleft(1L, CAST(doc_id % 12 AS INT))"
            " ^ IF(doc_id % 3 = 0, shiftleft(1L, 32), 0L)"
        ).alias("fp"),
    )
    return hamming_pairs(fp, "doc_id", "fp", max_hamming=2, max_bucket=None)


QUERIES["phash_hamming_near_dup"] = q_phash_hamming_near_dup
ORACLE_SQL["phash_hamming_near_dup"] = SQL_PHASH_NEAR_DUP


# Dedup GROUP ASSIGNMENT: pairs -> connected components (keep one doc per
# duplicate cluster).  DuckDB oracles the iterative Spark algorithm via a
# recursive CTE: the component min M is < every other member, so
# propagating only labels r < receiving-node id loses nothing, and
# min(r) per node is exactly the component min.  Edge set = the same
# SQL-derivable Hamming fingerprint as SQL_PHASH_NEAR_DUP at hamming<=1
# (32 components of sizes 1..34 at sf0.01 — nontrivial merge structure).
SQL_DOC_DUP_COMPONENTS = """
WITH RECURSIVE fp AS (
  SELECT doc_id,
         xor(xor(CAST(doc_id // 8 AS BIGINT) << 16,
                 CAST(1 AS BIGINT) << CAST(doc_id % 12 AS INT)),
             CASE WHEN doc_id % 3 = 0 THEN CAST(1 AS BIGINT) << 32
                  ELSE CAST(0 AS BIGINT) END) AS fp
  FROM documents WHERE doc_id < 1000
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.fp, b.fp)) <= 1
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id < 1000
  UNION
  SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.id
  WHERE reach.r < e.s
)
SELECT id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY id
"""


def q_doc_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: banded-Hamming pair mining feeds
    alternating large-star/small-star connected components
    (operators/components.py — O(log^2 n) rounds, diameter-free, the
    post-pair-mining step every retention policy needs).  An ITERATIVE
    Spark algorithm under the exact driver gate: DuckDB recomputes the
    same components with a recursive CTE."""
    from crawler_core_spark.operators.components import assign_components
    from crawler_core_spark.operators.dedup import hamming_pairs

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    fp = d.select(
        "doc_id",
        F.expr(
            "shiftleft(CAST(doc_id div 8 AS BIGINT), 16)"
            " ^ shiftleft(1L, CAST(doc_id % 12 AS INT))"
            " ^ IF(doc_id % 3 = 0, shiftleft(1L, 32), 0L)"
        ).alias("fp"),
    )
    pairs = hamming_pairs(fp, "doc_id", "fp", max_hamming=1, max_bucket=None)
    return assign_components(d, pairs, "doc_id")


QUERIES["doc_dup_components"] = q_doc_dup_components
ORACLE_SQL["doc_dup_components"] = SQL_DOC_DUP_COMPONENTS


# The full curation pass a training-data user actually runs: quality
# gate -> near-dup clustering -> one survivor per cluster.  Composes
# quality_score_col + hamming_pairs + connected components end-to-end
# under ONE exact oracle (quality filter on the 6-dp ROUNDED score so
# both engines agree at the boundary; survivor == component label since
# the label is the component min).
SQL_DOC_CURATION = """
WITH RECURSIVE t AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') AS toks
  FROM documents WHERE doc_id < 1000
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> x IN ('the','a','and','of','to'))) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS sr
  FROM t
), q AS (
  SELECT doc_id,
         round((1.0 - sr) * least(1.0, n_tokens / 100.0), 6) AS quality
  FROM m
  WHERE round((1.0 - sr) * least(1.0, n_tokens / 100.0), 6) >= 0.35
), fp AS (
  SELECT doc_id,
         xor(xor(CAST(doc_id // 8 AS BIGINT) << 16,
                 CAST(1 AS BIGINT) << CAST(doc_id % 12 AS INT)),
             CASE WHEN doc_id % 3 = 0 THEN CAST(1 AS BIGINT) << 32
                  ELSE CAST(0 AS BIGINT) END) AS fp
  FROM q
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.fp, b.fp)) <= 1
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), reach(id, r) AS (
  SELECT doc_id, doc_id FROM q
  UNION
  SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.id
  WHERE reach.r < e.s
), comp AS (
  SELECT id, min(r) AS component FROM reach GROUP BY id
)
SELECT CAST(component AS BIGINT) AS survivor_doc_id,
       CAST(count(*) AS BIGINT) AS n_members,
       round(min(quality), 6) AS min_quality
FROM comp JOIN q ON q.doc_id = comp.id
GROUP BY component
"""


def q_doc_curation_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pass: quality gate (functions/text.py) ->
    banded-Hamming near-dup edges (operators/dedup.py) -> connected-
    component clusters (operators/components.py) -> one survivor per
    cluster (the component min).  The whole chain — scoring, pair
    mining, iterative clustering, retention — under one exact oracle."""
    from crawler_core_spark.operators.components import assign_components
    from crawler_core_spark.operators.dedup import hamming_pairs

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    q = d.select(
        "doc_id", F.round(quality_score_col("text"), 6).alias("quality")
    ).filter(F.col("quality") >= 0.35)
    fp = q.select(
        "doc_id",
        F.expr(
            "shiftleft(CAST(doc_id div 8 AS BIGINT), 16)"
            " ^ shiftleft(1L, CAST(doc_id % 12 AS INT))"
            " ^ IF(doc_id % 3 = 0, shiftleft(1L, 32), 0L)"
        ).alias("fp"),
    )
    pairs = hamming_pairs(fp, "doc_id", "fp", max_hamming=1, max_bucket=None)
    comp = assign_components(q, pairs, "doc_id")
    return (
        comp.join(q.withColumnRenamed("doc_id", "id"), "id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(F.min("quality"), 6).alias("min_quality"),
        )
        .select(
            F.col("component").alias("survivor_doc_id"),
            "n_members",
            "min_quality",
        )
    )


QUERIES["doc_curation_survivors"] = q_doc_curation_survivors
ORACLE_SQL["doc_curation_survivors"] = SQL_DOC_CURATION


# ---------------------------------------------------------------------------
# exhaustive-parameter twins: the approximate operators driven at
# parameters that collapse them onto an SQL-expressible EXACT result,
# so the driver's oracle gate exercises the same machinery end-to-end.
# The approximate-parameter variants above stay rows-only with their
# pytest recall gates.
# ---------------------------------------------------------------------------

def q_ann_lsh_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN at n_planes=0: every vector lands in the single bucket, so
    the bucket hash join degenerates to the full candidate set and the
    result must EQUAL brute-force top-k — same code path (bucket columns,
    bucket join, per-bucket cosine + window) with an exact oracle."""
    from crawler_core_spark.operators.ann import lsh_bucket_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return lsh_bucket_topk(e, queries, k=10, n_planes=0)


def q_ann_ivf_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN at n_probe = n_centroids: every query probes every cell, so
    the inverted-file join covers the whole corpus and the result must
    EQUAL brute-force top-k — training, cell assignment, probe join and
    ranking all execute with an exact oracle."""
    from crawler_core_spark.operators.ann import ivf_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ivf_topk(e, queries, k=10, n_centroids=8, n_probe=8, sample=1024)


QUERIES["ann_lsh_exhaustive"] = q_ann_lsh_exhaustive
ORACLE_SQL["ann_lsh_exhaustive"] = SQL_ANN_TOPK
QUERIES["ann_ivf_exhaustive"] = q_ann_ivf_exhaustive
ORACLE_SQL["ann_ivf_exhaustive"] = SQL_ANN_TOPK


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (operators/ann.py:ivfpq_topk — Jegou et al. TPAMI'11):
    coarse cells prune, product-quantization codes order survivors from
    ~n_subvectors bytes per row (the probe join never carries vectors),
    exact rerank on the top-``rerank`` only.  Rows-only (approximate by
    construction; pytest pins recall vs brute force); the exhaustive twin
    below is the oracle gate for the full machinery."""
    from crawler_core_spark.operators.ann import ivfpq_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ivfpq_topk(
        e, queries, k=10, n_centroids=8, n_probe=3,
        n_subvectors=4, n_codes=16, rerank=64, sample=1024,
    )


def q_ann_ivfpq_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ at n_probe = n_centroids and rerank >= |corpus|: every cell
    is probed and the rerank cut keeps every candidate, so training, cell
    assignment, PQ ENCODING AND ADC SCORING (rerank=None would let
    Catalyst prune the unused codes column — the approx ordering must
    stay in the plan for the twin to gate it), the codes-only probe join
    and the vector join-back all execute and the result must EQUAL
    brute-force top-k."""
    from crawler_core_spark.operators.ann import ivfpq_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ivfpq_topk(
        e, queries, k=10, n_centroids=8, n_probe=8,
        n_subvectors=4, n_codes=16, rerank=10_000_000, sample=1024,
    )


QUERIES["ann_ivfpq"] = q_ann_ivfpq
QUERIES["ann_ivfpq_exhaustive"] = q_ann_ivfpq_exhaustive
ORACLE_SQL["ann_ivfpq_exhaustive"] = SQL_ANN_TOPK


def q_doc_minhash_exact_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH driven at recall-complete parameters: 16 bands of 1 row
    (a pair is a candidate if ANY of its 16 minhashes collide — miss
    probability (1-j)^16 <= 7e-12 at the j>=0.8 verify threshold, and the
    hashing is deterministic so the result is stable on the fixed test
    tables), no bucket cap, exact-verified output only (id_a, id_b,
    jaccard).  Collapses onto the SQL all-pairs exact Jaccard >= 0.8 —
    the full LSH pipeline (signatures, banding, self-join, verify) runs
    under the driver's oracle gate.

    Bounded to doc_id < 500 (the whole table at the driver's sf0.01):
    single-row bands make EVERY pair with any matching minhash a
    candidate — P(band match) = j itself — so this recall-complete form
    is quadratic by construction and exists only as the oracle-scale
    twin; the production path is the banded+capped doc_minhash_lsh."""
    from crawler_core_spark.operators.dedup import minhash_lsh_pairs

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return minhash_lsh_pairs(
        d, id_col="doc_id", text_col="text", n_hashes=16, bands=16,
        verify_threshold=0.8, max_bucket=None,
    ).select("id_a", "id_b", "jaccard")


SQL_DOC_MINHASH_EXACT_TWIN = """
WITH t AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS toks
  FROM documents WHERE doc_id < 500
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(CASE WHEN len(list_distinct(list_concat(a.toks, b.toks))) > 0
               THEN CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.toks, b.toks)))
               ELSE 0.0 END, 6) AS jaccard
  FROM t a JOIN t b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.8
"""

QUERIES["doc_minhash_exact_twin"] = q_doc_minhash_exact_twin
ORACLE_SQL["doc_minhash_exact_twin"] = SQL_DOC_MINHASH_EXACT_TWIN


def q_doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time dedup: which NEW docs (doc_id in [300, 600)) duplicate
    the EXISTING corpus (doc_id < 300) — banded NEW x CORPUS bucket join,
    never corpus x corpus (operators/dedup.py:incremental_minhash_dedup).
    Production parameters (4 bands x 4 rows, corpus-side bucket cap):
    rows-only; the exhaustive twin below is the oracle gate."""
    from crawler_core_spark.operators.dedup import incremental_minhash_dedup

    d = load(spark, sf_dir, "documents")
    return incremental_minhash_dedup(
        d.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 600)),
        d.filter(F.col("doc_id") < 300),
        n_hashes=16, bands=4, threshold=0.8, max_bucket=64,
    )


def q_doc_incremental_dedup_exact_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-complete parameters (16 bands x 1 row — miss probability
    (1-j)^16 <= 7e-12 at j>=0.8, deterministic hashing => stable on the
    fixed tables; no cap): the full incremental pipeline (two signature
    passes, banding, NEW x CORPUS bucket join, exact verify) collapses
    onto SQL all-CROSS-pairs Jaccard >= 0.8 and runs under the gate."""
    from crawler_core_spark.operators.dedup import incremental_minhash_dedup

    d = load(spark, sf_dir, "documents")
    return incremental_minhash_dedup(
        d.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 600)),
        d.filter(F.col("doc_id") < 300),
        n_hashes=16, bands=16, threshold=0.8, max_bucket=None,
    )


SQL_DOC_INCREMENTAL_DEDUP = """
WITH t AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS toks
  FROM documents
), p AS (
  SELECT n.doc_id AS new_id, c.doc_id AS corpus_id,
         round(CASE WHEN len(list_distinct(list_concat(n.toks, c.toks))) > 0
               THEN CAST(len(list_intersect(n.toks, c.toks)) AS DOUBLE)
                    / len(list_distinct(list_concat(n.toks, c.toks)))
               ELSE 0.0 END, 6) AS jaccard
  FROM t n JOIN t c ON n.doc_id >= 300 AND n.doc_id < 600 AND c.doc_id < 300
)
SELECT new_id, corpus_id, jaccard FROM p WHERE jaccard >= 0.8
"""

QUERIES["doc_incremental_dedup"] = q_doc_incremental_dedup
QUERIES["doc_incremental_dedup_exact_twin"] = q_doc_incremental_dedup_exact_twin
ORACLE_SQL["doc_incremental_dedup_exact_twin"] = SQL_DOC_INCREMENTAL_DEDUP


def q_doc_simhash_exact_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash driven with the SQL-computable polynomial token hash
    (functions/text.py:poly_token_hash_col) instead of xxhash64: the
    ENTIRE pipeline — token explode, 64 bit-sum aggregates, sign math,
    16-bit-chunk banding, bit_count verify — runs under the driver's
    exact oracle gate (max_hamming=3 + max_bucket=None makes banding
    recall-complete by pigeonhole, so the result is exact, not
    approximate).  This closes the last un-oracled fingerprint
    derivation; the production-parameter `doc_simhash` (xxhash64) stays
    rows-only with its pure-Python pytest pin.

    Bounded to doc_id < 500 (the whole table at the driver's sf0.01):
    the polynomial hash tops out below 2^43, so the high 16-bit chunk is
    constant and its band degenerates to all-pairs — quadratic by
    construction, an oracle-scale twin only."""
    from crawler_core_spark.functions.text import poly_token_hash_col
    from crawler_core_spark.operators.dedup import simhash_pairs

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return simhash_pairs(
        d, id_col="doc_id", text_col="text", max_hamming=3,
        max_bucket=None, token_hash=poly_token_hash_col,
    )


def _simhash_twin_sql() -> str:
    """DuckDB oracle for q_doc_simhash_exact_twin, generated from the
    same closed-form constants (k=8 chars, base 31; codepoints reach
    0x10FFFF so max hash < 0x10FFFF*(31^8-1)/30 < 2^55 — bits 55..63 are
    identically zero and are omitted from the SQL; 43 was the Latin-1
    bound and broke on any CJK/emoji token)."""
    k, base, nbits = 8, 31, 55
    poly = " + ".join(
        f"(CASE WHEN length(tok) > {j} THEN ord(substring(tok, {j + 1}, 1)) "
        f"ELSE 0 END) * CAST({base ** (k - 1 - j)} AS BIGINT)"
        for j in range(k)
    )
    bit_sums = ", ".join(f"sum((th >> {j}) & 1) AS b{j}" for j in range(nbits))
    fp_terms = " + ".join(
        f"(CASE WHEN 2 * b{j} > n THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(nbits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS tok
  FROM documents WHERE doc_id < 500
), h AS (
  SELECT doc_id, {poly} AS th FROM toks
), bits AS (
  SELECT doc_id, count(*) AS n, {bit_sums} FROM h GROUP BY doc_id
), fps AS (
  -- LEFT JOIN mirrors the Spark pipeline's tokenless-doc handling:
  -- docs whose text is NULL/empty fingerprint to 0
  SELECT d.doc_id, COALESCE(f.simhash, 0) AS simhash
  FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
  LEFT JOIN (SELECT doc_id, {fp_terms} AS simhash FROM bits) f USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM fps a JOIN fps b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


SQL_DOC_SIMHASH_EXACT_TWIN = _simhash_twin_sql()

QUERIES["doc_simhash_exact_twin"] = q_doc_simhash_exact_twin
ORACLE_SQL["doc_simhash_exact_twin"] = SQL_DOC_SIMHASH_EXACT_TWIN


def q_doc_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (k=4 char grams, window 5):
    the classic dedup/decontamination primitive — any shared substring of
    length >= 8 between two docs yields a shared fingerprint.  Runs the
    vectorized Arrow path (functions/text.py:winnow_fingerprints_pandas_df,
    the bulk-corpus form); the all-native expression twin
    (winnow_fingerprints_df) computes identical values (pytest-pinned)
    and the closed-form polynomial hash lets the SQL oracle reproduce
    both exactly."""
    from crawler_core_spark.functions.text import winnow_fingerprints_pandas_df

    d = load(spark, sf_dir, "documents")
    fps = winnow_fingerprints_pandas_df(d, id_col="doc_id", text_col="text")
    return fps.select("doc_id", F.explode("fps").alias("fp"))


SQL_DOC_WINNOW_FINGERPRINT = """
WITH g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - 3, 0) + 1),
           i -> ord(substring(text, CAST(i AS INTEGER), 1)) * 16974593
              + ord(substring(text, CAST(i + 1 AS INTEGER), 1)) * 66049
              + ord(substring(text, CAST(i + 2 AS INTEGER), 1)) * 257
              + ord(substring(text, CAST(i + 3 AS INTEGER), 1))) AS hs
  FROM documents
), wdw AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(hs) - 4, 0) + 1),
           j -> list_min(hs[CAST(j AS INTEGER):CAST(j + 4 AS INTEGER)]))) AS fps
  FROM g
)
SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM wdw
"""

QUERIES["doc_winnow_fingerprint"] = q_doc_winnow_fingerprint
ORACLE_SQL["doc_winnow_fingerprint"] = SQL_DOC_WINNOW_FINGERPRINT


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination (operators/dedup.py:decontaminate_pairs):
    corpus docs (doc_id >= 100) sharing >= 40 winnowing fingerprints with
    the "benchmark" set (doc_id < 100) — the substring-overlap pass an
    LLM pipeline runs before a corpus ships.  The benchmark fp side is
    broadcast, so the corpus is never shuffled; the closed-form winnow
    hash makes the SQL oracle exact."""
    from crawler_core_spark.operators.dedup import decontaminate_pairs

    d = load(spark, sf_dir, "documents")
    return decontaminate_pairs(
        d.filter(F.col("doc_id") >= 100),
        d.filter(F.col("doc_id") < 100),
        min_shared=40,
    )


SQL_DOC_DECONTAMINATE = """
WITH g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - 3, 0) + 1),
           i -> ord(substring(text, CAST(i AS INTEGER), 1)) * 16974593
              + ord(substring(text, CAST(i + 1 AS INTEGER), 1)) * 66049
              + ord(substring(text, CAST(i + 2 AS INTEGER), 1)) * 257
              + ord(substring(text, CAST(i + 3 AS INTEGER), 1))) AS hs
  FROM documents
), wdw AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(hs) - 4, 0) + 1),
           j -> list_min(hs[CAST(j AS INTEGER):CAST(j + 4 AS INTEGER)]))) AS fps
  FROM g
), f AS (
  SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM wdw
)
SELECT d.doc_id AS doc_id, b.doc_id AS bench_id,
       CAST(count(*) AS BIGINT) AS n_shared
FROM f d JOIN f b ON d.fp = b.fp
WHERE d.doc_id >= 100 AND b.doc_id < 100
GROUP BY 1, 2
HAVING count(*) >= 40
"""

QUERIES["doc_decontaminate"] = q_doc_decontaminate
ORACLE_SQL["doc_decontaminate"] = SQL_DOC_DECONTAMINATE


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 source (r5): REAL robots.txt TEXT -> rules table, distributed
    pandas-UDF parse.  Bodies are synthesized deterministically per host
    (nation) with a decoy UA group, a specific-UA group on every 3rd host
    (consecutive UA lines, wildcard/comment/empty-Disallow lines,
    Crawl-delay), and a '*' fallback group with a $-anchored pattern; the
    oracle constructs the expected rules directly — if the parser mangles
    grouping, precedence, clipping, or delays, the value hash breaks."""
    from crawler_core_spark.sources.robots import robots_rules_from_texts

    n = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    specific = F.concat(
        F.lit(
            "User-agent: TestBot\nUser-agent: megabot\n"
            "Disallow: /private # members\nAllow: /private/pub\n"
            "Disallow: /cgi/*.php\nDisallow:\nCrawl-delay: "
        ),
        (1 + k % 5).cast("string"),
    )
    body = F.concat_ws(
        "\n",
        F.lit("# synthetic robots file"),
        F.lit("User-agent: otherbot\nDisallow: /"),
        F.when(k % 3 == 0, specific).otherwise(F.lit("")),
        F.lit("User-agent: *\nDisallow: /tmp\nDisallow: /end$"),
    )
    bodies = n.select(
        F.concat(F.lit("h"), k.cast("string")).alias("host"),
        body.alias("robots_txt"),
    )
    return robots_rules_from_texts(bodies, user_agent="testbot/1.0").select(
        "host", "path_prefix", "allow",
        F.round("crawl_delay", 4).alias("crawl_delay"),
    )


SQL_ROBOTS_PARSE = """
WITH n AS (
  SELECT n_nationkey AS k, 'h' || n_nationkey AS host FROM nation
)
SELECT host, path_prefix, allow, crawl_delay FROM (
  SELECT host, '/private' AS path_prefix, false AS allow,
         CAST(1 + (k % 5) AS DOUBLE) AS crawl_delay FROM n WHERE k % 3 = 0
  UNION ALL
  SELECT host, '/private/pub', true, CAST(1 + (k % 5) AS DOUBLE)
  FROM n WHERE k % 3 = 0
  UNION ALL
  SELECT host, '/cgi/', false, CAST(1 + (k % 5) AS DOUBLE)
  FROM n WHERE k % 3 = 0
  UNION ALL
  SELECT host, '', true, CAST(1 + (k % 5) AS DOUBLE) FROM n WHERE k % 3 = 0
  UNION ALL
  SELECT host, '/tmp', false, 1.0 FROM n WHERE k % 3 <> 0
  UNION ALL
  SELECT host, '/end', false, 1.0 FROM n WHERE k % 3 <> 0
  UNION ALL
  SELECT host, '', true, 1.0 FROM n WHERE k % 3 <> 0
)
"""

QUERIES["robots_parse"] = q_robots_parse
ORACLE_SQL["robots_parse"] = SQL_ROBOTS_PARSE


def q_ann_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (r5 — Jegou et al. TPAMI'11 §IV): PQ trained on IVF
    RESIDUALS, approximate ordering = query·centroid + ADC(residual
    codes) over the corrected |x̃|².  Same probe shape as ann_ivfpq,
    better recall at identical bytes/row (pytest pins ADC >= raw at the
    same (n_subvectors, n_codes)).  Rows-only; the exhaustive twin below
    is the oracle gate."""
    from crawler_core_spark.operators.ann import ivfpq_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ivfpq_topk(
        e, queries, k=10, n_centroids=8, n_probe=3,
        n_subvectors=4, n_codes=16, rerank=64, sample=1024, residual=True,
    )


def q_ann_ivfadc_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC at n_probe = n_centroids, rerank >= |corpus|: residual
    encoding, the query-side centroid dot, the |c|²+2c·r̃ cross-norm
    lookups and the codes-only join all EXECUTE (a finite rerank keeps
    the approx ordering in the plan) and the result must EQUAL
    brute-force top-k."""
    from crawler_core_spark.operators.ann import ivfpq_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ivfpq_topk(
        e, queries, k=10, n_centroids=8, n_probe=8,
        n_subvectors=4, n_codes=16, rerank=10_000_000, sample=1024,
        residual=True,
    )


QUERIES["ann_ivfadc"] = q_ann_ivfadc
QUERIES["ann_ivfadc_exhaustive"] = q_ann_ivfadc_exhaustive
ORACLE_SQL["ann_ivfadc_exhaustive"] = SQL_ANN_TOPK
