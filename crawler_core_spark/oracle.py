"""Pure-Python reference-semantics oracle (SURVEY.md §7.1 step 1).

Sequentially replays the reference publish/worker semantics (§3.1 + §3.2)
plus the [EXT] contracts (robots, politeness, URL-seen) defined in
operators/scheduler.py, with NO Spark: golden crawl order, URL-seen set,
and per-status counts to assert the engine against.  Shares the parse
(functions/url.py) and codec (functions/image.py) primitives so both
sides compute from the same pinned definitions; everything *relational*
(joins, windows, dedup) is re-derived here with plain dicts/sorts.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field, replace

from crawler_core_spark.functions.url import parse_target_py
from crawler_core_spark.functions.image import decode_image
from crawler_core_spark.operators.publish import UNRANKED_PRIORITY
from crawler_core_spark.sources.denylist import classify_denylist_lines
from crawler_core_spark.functions.net import ipv4_to_long

DEFAULT_CRAWL_DELAY = 1.0


def _xxhash64_spark(canon: str) -> int:
    """Not needed for set-equality tests: the oracle keys the seen set by the
    canonical string; the engine keys by xxhash64(canonical). Equality of the
    *canonical-string sets* implies equality of the key sets."""
    return hash(canon)


def canonical_key(hostname: str | None, ip: str | None, port: int) -> str:
    host = (hostname if hostname is not None else ip) or ""
    host = host.lower()
    if host.endswith("."):  # single trailing-dot strip, same as the engine's regexp
        host = host[:-1]
    return f"{host}:{port}" if host else str(port)


@dataclass
class OracleJob:
    seq: int
    target: str
    hostname: str | None = None
    ip: str | None = None
    port: int = 0
    rank: int = 0
    status: str = "TO_BE_EXECUTED"
    priority: int = UNRANKED_PRIORITY
    url_canon: str = ""
    url_path: str = "/"
    host: str | None = None
    crawl_delay: float = DEFAULT_CRAWL_DELAY
    batch_id: int = -1
    crawl_pos: int = -1
    attempt: int = 0


@dataclass
class OracleRun:
    jobs: list[OracleJob]
    crawl_order: list[OracleJob] = field(default_factory=list)
    url_seen: set = field(default_factory=set)
    batches: list[dict] = field(default_factory=list)
    # intermediate (non-final) reexecution attempts — each persisted its
    # own result row in the engine (append log, O2 latest-wins)
    attempt_rows: list[OracleJob] = field(default_factory=list)

    def status_counts(self) -> dict:
        """Per-RESULT-ROW counts: final job statuses + retried attempts."""
        out: dict[str, int] = {}
        for j in self.jobs:
            out[j.status] = out.get(j.status, 0) + 1
        for j in self.attempt_rows:
            out[j.status] = out.get(j.status, 0) + 1
        return out


def _split_path(line: str) -> tuple[str, str]:
    """Mirror of the engine's native path split (operators/publish.py,
    parse_paths=True): everything from the first '/' after the authority
    is the path; the stripped remainder feeds the reference parse.  A
    '//' only skips as a protocol separator when it is a '<scheme>://'
    prefix or a leading protocol-relative '//' — path-internal '//' is
    path content."""
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*://|//)", line)
    after = line[m.end():] if m else line
    i = after.find("/")
    if i >= 0:
        path = after[i:]
        return line[: len(line) - len(path)], path
    return line, "/"


def publish_oracle(
    lines: list[str],
    dns: dict[str, str | None],
    denylist_lines: list[str],
    robots: list[tuple],
    default_port: int = 443,
    parse_paths: bool = False,
) -> list[OracleJob]:
    """Replay §3.1: filter -> parse -> resolve -> denylist -> robots."""
    domains, ips, cidrs = classify_denylist_lines(denylist_lines)
    dom_set = {d[0] for d in domains}
    ip_set = {i[0] for i in ips}
    cidr_ranges = [(lo, hi) for _, lo, hi in cidrs]
    robots_by_host: dict[str, list] = {}
    for host, prefix, allow, delay in robots:
        robots_by_host.setdefault(host, []).append((prefix, allow, delay))

    jobs: list[OracleJob] = []
    seq = 0
    for line in lines:
        if line.startswith("#") or line == "":
            continue  # TargetFileProvider.java:34-41
        parse_line, url_path = (
            _split_path(line) if parse_paths else (line, "/")
        )
        p = parse_target_py(parse_line, default_port)
        job = OracleJob(seq=seq, target=parse_line, url_path=url_path)
        seq += 1
        if p["parse_status"] == "RESOLUTION_ERROR":
            job.status = "RESOLUTION_ERROR"
            jobs.append(job)
            continue
        hostname, ip = p["hostname"], p["ip"]
        port, rank = p["port_ok"], p["tranco_rank"]
        if p["resolve_host"] is not None:
            resolved = dns.get(p["resolve_host"])
            if resolved is None:  # miss or explicit unresolvable
                job.hostname, job.ip = hostname, None
                job.port, job.rank = p["port_fail"], rank
                job.status = "UNRESOLVABLE"
                jobs.append(job)
                continue
            ip = resolved
        job.hostname, job.ip, job.port, job.rank = hostname, ip, port, rank
        job.priority = rank if rank > 0 else UNRANKED_PRIORITY
        job.url_canon = canonical_key(hostname, ip, port) + (
            job.url_path if job.url_path != "/" else ""
        )
        job.host = hostname if hostname is not None else ip
        # denylist (DenylistFileProvider.java:71-76)
        ipn = ipv4_to_long(ip) if ip else None
        denied = (
            (hostname in dom_set)
            or (ip in ip_set)
            or (ipn is not None and any(lo <= ipn <= hi for lo, hi in cidr_ranges))
        )
        if denied:
            job.status = "DENYLISTED"
            jobs.append(job)
            continue
        # robots [EXT]: exact host beats '*', longest prefix wins over
        # the job's URL path (constant '/' unless parse_paths) — mirrors
        # operators/scheduler.py apply_robots / robots_match
        candidates = [
            (0, prefix, allow, delay)
            for prefix, allow, delay in robots_by_host.get(job.host, [])
            if job.url_path.startswith(prefix)
        ] + [
            (1, prefix, allow, delay)
            for prefix, allow, delay in robots_by_host.get("*", [])
            if job.url_path.startswith(prefix)
        ]
        best = min(candidates, key=lambda c: (c[0], -len(c[1])), default=None)
        if best is not None:
            job.crawl_delay = best[3]
            if not best[2]:
                job.status = "ROBOTS_BLOCKED"
                jobs.append(job)
                continue
        job.status = "TO_BE_EXECUTED"
        jobs.append(job)
    return jobs


def crawl_oracle(
    jobs: list[OracleJob],
    images: dict[str, dict],
    batch_period: float = 10.0,
    scan_timeout_ms: float = 840_000.0,
    reexecutions: int = 3,
) -> OracleRun:
    """Replay the micro-batch loop contract from operators/scheduler.py."""
    run = OracleRun(jobs=jobs)
    pending = [j for j in jobs if j.status == "TO_BE_EXECUTED"]
    next_fetch: dict[str, float] = {}
    clock = 0.0
    batch_id = 0
    pos = 0
    while pending:
        eligible = [j for j in pending if next_fetch.get(j.host, 0.0) <= clock]
        if not eligible:
            clock += batch_period
            continue
        # per-host budgeted selection by (priority, seq)
        by_host: dict[str, list[OracleJob]] = {}
        for j in sorted(eligible, key=lambda x: (x.priority, x.seq)):
            by_host.setdefault(j.host, []).append(j)
        selected: list[OracleJob] = []
        for host, rows in by_host.items():
            budget = max(1, math.floor(batch_period / rows[0].crawl_delay))
            selected.extend(rows[:budget])
        if not selected:
            clock += batch_period
            continue
        selected.sort(key=lambda x: (x.priority, x.seq))
        fetched, deduped = [], []
        batch_seen: set = set()
        for j in selected:
            if j.url_canon in run.url_seen or j.url_canon in batch_seen:
                deduped.append(j)
                j.status = "DEDUPED"
                j.batch_id = batch_id
            else:
                batch_seen.add(j.url_canon)
                fetched.append(j)
        served: dict[str, int] = {}
        retried: set[int] = set()
        for j in fetched:
            j.batch_id = batch_id
            j.crawl_pos = pos
            pos += 1
            served[j.host] = served.get(j.host, 0) + 1
            # fetch statuses (operators/fetch.py contract)
            img_id = _image_id_from_host(j.host)
            img = images.get(img_id)
            if img is None:
                j.status = "EMPTY"
            else:
                try:
                    arr = decode_image(img["bytes"])
                    cost = arr.shape[0] * arr.shape[1]
                    j.status = "CANCELLED" if cost > scan_timeout_ms else "SUCCESS"
                except Exception:
                    j.status = "ERROR"
            # reexecutions (ScanConfig.java:41): a retryable failure below
            # the attempt budget persists its row AND requeues attempt+1;
            # its URL is NOT marked seen (the retry must not self-dedup).
            if j.status in ("ERROR", "CRAWLER_ERROR") and j.attempt < reexecutions:
                run.attempt_rows.append(replace(j))
                run.crawl_order.append(replace(j))
                j.attempt += 1
                retried.add(id(j))
            else:
                run.url_seen.add(j.url_canon)
                run.crawl_order.append(j)
        for host, k in served.items():
            delay = next(x.crawl_delay for x in fetched if x.host == host)
            next_fetch[host] = clock + k * delay
        sel_ids = {id(j) for j in selected} - retried
        pending = [j for j in pending if id(j) not in sel_ids]
        run.batches.append(
            {
                "batch_id": batch_id,
                "fetched": len(fetched),
                "deduped": len(deduped),
                "deferred": len(eligible) - len(selected),
            }
        )
        clock += batch_period
        batch_id += 1
    return run


def _image_id_from_host(host: str) -> str:
    import re

    m = re.match(r"^(img-\d+)\.", (host or "").lower())
    return m.group(1) if m else ""
