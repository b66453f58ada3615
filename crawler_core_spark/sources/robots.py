"""robots.txt FILE parser (O6 source) — text -> the (host, path_prefix,
allow, crawl_delay) rules table that ``operators.scheduler.robots_match``
consumes.

Reference analogue: the S5 file-ingest pattern
(``denylist/DenylistFileProvider.java:40-58`` -> ``sources/denylist.py``);
the reference itself has no robots support (its unit of work is host:port)
— this is the [EXT] north-rule capability at URL-path granularity.

Semantics follow RFC 9309 (Robots Exclusion Protocol) plus the de-facto
``Crawl-delay`` extension:

- ``#`` starts a comment (to end of line); blank lines are ignored and do
  NOT terminate a group.
- A group = one or more consecutive ``User-agent:`` lines followed by
  rules.  A ``User-agent`` line after a rule line starts a NEW group.
- Group selection for a crawler UA: the matching non-``*`` group with the
  LONGEST agent token wins (case-insensitive substring match, RFC 9309
  §2.2.1); only if none matches does the ``*`` group apply; groups are
  never merged across specificities, but groups with the SAME winning
  specificity merge (RFC: "combine the groups").
- ``Disallow:`` with an empty value is allow-all (no rule emitted); empty
  ``Allow:`` is likewise a no-op.
- ``Crawl-delay: <float>`` applies group-wide; invalid values are ignored.
- Path patterns are reduced to literal prefixes, in the SAFE direction for
  each rule kind.  ``Disallow``: clip at the first ``*``/``$`` — a superset
  prefix that blocks at least as much (over-blocking is the polite
  failure).  ``Allow``: a trailing ``*`` run (optionally ``$``-terminated)
  is exactly prefix semantics and is clipped; any OTHER wildcard/anchor
  (``/private*.html$``, ``/a.html$``) is DROPPED — a clipped superset
  prefix would out-rank an explicit equal-length Disallow downstream and
  over-ALLOW (the unsafe direction), so we under-allow instead.  A pattern
  that reduces to "" is dropped.
- Longest-prefix precedence between Allow and Disallow is the DOWNSTREAM
  matcher's job (``robots_match`` ranks by prefix length, allow winning
  exact-length ties — Google's least-restrictive tie-break); the parser
  only emits the rule set.

Every selected group additionally emits a zero-length baseline row
``("", allow=True, group_delay)``: the empty prefix matches every path but
loses to every real rule (length 0), so paths matched by NO explicit rule
inherit the group's crawl-delay instead of the global default — and a
group consisting solely of ``Crawl-delay`` still takes effect.

Scale shape: parsing is a vectorized pandas UDF over (host, robots_txt)
rows — robots bodies live one-per-host in the warehouse (10^8 hosts at
frontier scale), parse where the text lives, only the tiny rules rows
shuffle.  No driver collect in the distributed form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_CRAWL_DELAY = 1.0

RULES_SCHEMA = "host: string, path_prefix: string, allow: boolean, crawl_delay: double"

_RULE_STRUCT = "array<struct<path_prefix:string, allow:boolean, crawl_delay:double>>"


def _clip_pattern(value: str) -> str:
    """Literal prefix before the first ``*`` or ``$`` (see module doc).
    Safe for Disallow only: the prefix MATCHES A SUPERSET of the pattern."""
    return value.split("*", 1)[0].split("$", 1)[0]


def _safe_allow_prefix(value: str) -> str | None:
    """Allow-side reduction (see module doc): the prefix must match a
    SUBSET of the pattern or the rule is dropped (returns None) — a
    superset Allow prefix can defeat an explicit Disallow downstream."""
    v = value
    if v.endswith("$"):
        v = v[:-1]
        if not v.endswith("*"):
            return None  # exact-match anchor: prefix form would over-allow
    v = v.rstrip("*")
    if "*" in v or "$" in v:
        return None  # interior wildcard/anchor: not expressible as a prefix
    return v


def parse_robots_text(
    text: str | None, user_agent: str = "*"
) -> tuple[list[tuple[str, bool]], float | None]:
    """Pure-python core: robots.txt body -> (rules, crawl_delay) for the
    group RFC-selected for ``user_agent``.

    rules = [(path_prefix, allow)] in file order; crawl_delay is None when
    the selected group sets none.  Missing/empty text -> ([], None): no
    robots.txt means allow-all at default politeness, which is exactly
    what zero rules gives the downstream matcher.
    """
    rules, delay, _ = _parse(text, user_agent)
    return rules, delay


def _parse(
    text: str | None, user_agent: str = "*"
) -> tuple[list[tuple[str, bool]], float | None, bool]:
    """Single-pass parse also reporting whether ANY group matched the UA
    (an empty selected group is distinguishable from no group at all)."""
    if not text:
        return [], None, False
    # robots.txt bodies in the wild often start with a UTF-8 BOM; without
    # stripping it the first line's field reads "﻿user-agent" and the
    # whole leading group silently vanishes (allow-all)
    text = text.lstrip("﻿")
    groups: list[list] = []  # [agent_tokens, rules, delay]
    cur: list | None = None
    in_ua_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, sep, value = line.partition(":")
        if not sep:
            continue
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not value:
                continue
            if not in_ua_run:
                cur = [[], [], None]
                groups.append(cur)
                in_ua_run = True
            cur[0].append(value.lower())
            continue
        in_ua_run = False
        if cur is None:
            continue  # rules before any User-agent line: ignored (RFC)
        if field in ("allow", "disallow"):
            if not value:
                continue  # empty Disallow == allow-all; empty Allow no-op
            if field == "allow":
                prefix = _safe_allow_prefix(value)
            else:
                prefix = _clip_pattern(value)
            if prefix:
                cur[1].append((prefix, field == "allow"))
        elif field == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                continue
            if cur[2] is None:
                cur[2] = delay

    ua = user_agent.lower()
    best_len = -1
    for g in groups:
        for tok in g[0]:
            if tok != "*" and tok in ua and len(tok) > best_len:
                best_len = len(tok)
    if best_len >= 0:
        selected = [
            g
            for g in groups
            if any(tok != "*" and tok in ua and len(tok) == best_len for tok in g[0])
        ]
    else:
        selected = [g for g in groups if "*" in g[0]]
    rules: list[tuple[str, bool]] = []
    delay: float | None = None
    for g in selected:
        rules.extend(g[1])
        if delay is None:
            delay = g[2]
    return rules, delay, bool(selected)


def _rows_for_text(
    text: str | None, user_agent: str, default_delay: float
) -> list[tuple[str, bool, float]]:
    """(path_prefix, allow, crawl_delay) rows incl. the "" baseline row.
    No selected group (no file / no matching UA section) -> NO rows: the
    downstream matcher's coalesce already yields allow-all at the global
    default, and emitting nothing keeps absent-robots hosts free.  A
    matching group with ZERO emitted rules (e.g. only "Disallow:"
    allow-all lines) still pins the baseline at the default delay."""
    rules, delay, group_selected = _parse(text, user_agent)
    if not group_selected:
        return []
    d = default_delay if delay is None else delay
    out = [(p, a, d) for p, a in rules]
    out.append(("", True, d))
    return out


def parse_rules_udf(user_agent: str = "*", default_delay: float = DEFAULT_CRAWL_DELAY):
    """Vectorized parser: STRING robots body -> array<struct<path_prefix,
    allow, crawl_delay>> (Arrow-batched; one python call per batch)."""

    # NOT named _parse: the module-level parser has that name, and a
    # future call to _parse inside this scope must not hit the UDF
    @pandas_udf(_RULE_STRUCT)
    def _parse_batch(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [
                    {"path_prefix": p, "allow": a, "crawl_delay": d}
                    for p, a, d in _rows_for_text(
                        # nulls can surface as float NaN depending on the
                        # batch's pandas dtype — treat any non-str as
                        # no-robots-file, never .splitlines() a float
                        t if isinstance(t, str) else None,
                        user_agent,
                        default_delay,
                    )
                ]
                for t in texts
            ]
        )

    return _parse_batch


def robots_rules_from_texts(
    df: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
    default_delay: float = DEFAULT_CRAWL_DELAY,
) -> DataFrame:
    """Distributed form: (host, robots_txt) rows -> the RULES_SCHEMA table
    ``robots_match`` / ``apply_robots`` consume.  Hosts whose body yields
    no selected group produce no rows (allow-all at global default)."""
    parse = parse_rules_udf(user_agent, default_delay)
    return (
        df.select(F.col(host_col).alias("host"), parse(F.col(text_col)).alias("_rules"))
        .select("host", F.explode("_rules").alias("_r"))
        .select(
            "host",
            F.col("_r.path_prefix").alias("path_prefix"),
            F.col("_r.allow").alias("allow"),
            F.col("_r.crawl_delay").alias("crawl_delay"),
        )
    )


def load_robots_file(
    spark: SparkSession,
    host: str,
    lines: list[str] | None = None,
    path: str | None = None,
    user_agent: str = "*",
    default_delay: float = DEFAULT_CRAWL_DELAY,
) -> DataFrame:
    """S5-style single-file convenience (the ``load_denylist`` shape): one
    robots.txt for one host -> a tiny RULES_SCHEMA DataFrame, broadcast-
    sized by construction."""
    if lines is None:
        if path is None:
            raise ValueError("pass lines or path")
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            text = f.read()
    else:
        text = "\n".join(lines)
    rows = [(host, p, a, d) for p, a, d in _rows_for_text(text, user_agent, default_delay)]
    if not rows:
        return spark.createDataFrame([], RULES_SCHEMA)
    return spark.createDataFrame(rows, RULES_SCHEMA)
