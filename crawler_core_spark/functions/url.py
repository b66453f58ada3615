"""Target-string parsing (T1) and URL canonicalization.

``parse_target_py`` is a faithful transliteration of the reference parse
precedence (``data/ScanTarget.java:54-162``), *minus* the two live side
effects, which become relational operators downstream:

- DNS resolution (``ScanTarget.java:78,145``) -> emitted as a
  ``resolve_host`` column consumed by a broadcast join against the dns
  table (SURVEY.md J3).  Because the post-resolve continuation of the
  parse is statically computable, we emit the field values for BOTH the
  resolve-succeeds and resolve-fails branches (``port_ok``/``port_fail``)
  and let the join pick.
- the denylist check (``ScanTarget.java:154-160``) -> broadcast
  anti/semi joins (SURVEY.md J1/J2).

Any exception inside the reference parse is caught by the publisher and
mapped to RESOLUTION_ERROR **with an empty ScanTarget**
(``core/jobs/PublishBulkScanJob.java:135-142``); we reproduce that exactly.

The UDF surface is vectorized (pandas/Arrow, no per-row Python in the
Spark plan): ``parse_targets_udf`` maps a string Series to a struct
column in one Arrow batch.
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PARSE_RESULT_SCHEMA = StructType(
    [
        StructField("hostname", StringType()),
        StructField("ip", StringType()),          # literal or comma-form-provided IP
        StructField("port_ok", IntegerType()),    # port if no resolve needed / resolve succeeds
        StructField("port_fail", IntegerType()),  # port if an early resolve fails
        StructField("tranco_rank", IntegerType()),
        StructField("resolve_host", StringType()),  # non-null => needs DNS (J3 join key)
        StructField("parse_status", StringType()),  # OK | RESOLUTION_ERROR
    ]
)


def _java_split(s: str, sep: str, limit: int = 0) -> list[str]:
    """Mirror java.lang.String#split: limit==0 drops trailing empty strings."""
    parts = s.split(sep)
    if limit == 0:
        while parts and parts[-1] == "":
            parts.pop()
    return parts


def _is_all_digits(s: str) -> bool:
    # Character::isDigit over every char; vacuously true for "" (the
    # subsequent Integer.parseInt("") then throws -> RESOLUTION_ERROR).
    return all(c.isdecimal() for c in s)


def _is_valid_inet(s: str) -> bool:
    """Mirror org.apache.commons.validator InetAddressValidator.isValid."""
    if not s:
        return False
    try:
        ipaddress.ip_address(s)
        return True
    except ValueError:
        return False


_EMPTY = {
    "hostname": None,
    "ip": None,
    "port_ok": 0,
    "port_fail": 0,
    "tranco_rank": 0,
    "resolve_host": None,
    "parse_status": "RESOLUTION_ERROR",
}


def parse_target_py(target_string: str, default_port: int = 443) -> dict:
    """Transliteration of ScanTarget.fromTargetString (ScanTarget.java:54-162)."""
    try:
        return _parse_inner(target_string, default_port)
    except Exception:
        # PublishBulkScanJob.java:135-142: any parse exception -> empty
        # ScanTarget + RESOLUTION_ERROR (parsed fields are discarded).
        return dict(_EMPTY)


def _parse_inner(target_string: str, default_port: int) -> dict:
    hostname: str | None = None
    ip: str | None = None
    port: int = 0  # Java int field default
    rank: int = 0
    resolve_host: str | None = None
    port_fail: int | None = None  # port snapshot if an early resolve fails

    # rank prefix / "hostname,ip" two-part form (ScanTarget.java:62-85)
    if "," in target_string:
        first = _java_split(target_string, ",")[0] if _java_split(target_string, ",") else ""
        if _is_all_digits(first):
            rank = int(first)  # int("") raises, like Integer.parseInt("")
            target_string = _java_split(target_string, ",")[1]  # IndexError == AIOOBE
        else:
            parts = target_string.split(",")  # split(",", -1): keep empties
            if len(parts) == 2:
                hostname_parts = _java_split(parts[0], ":")
                hostname = hostname_parts[0]
                if len(hostname_parts) > 1:
                    # NOTE: reference does NOT range-check this port (java:73)
                    port = int(hostname_parts[1])
                target_string = parts[1]
                if target_string.strip() == "":
                    # early resolve of hostname (java:77-81); failure returns
                    # immediately with fields as of this point.
                    resolve_host = hostname
                    port_fail = port

    # protocol / quote stripping (java:88-93)
    if "//" in target_string:
        target_string = _java_split(target_string, "//")[1]  # IndexError == AIOOBE
    if target_string.startswith('"') and target_string.endswith('"'):
        target_string = target_string.replace('"', "")

    # port extraction (java:97-136)
    if target_string.startswith("[") and "]:" in target_string:
        bracket_end = target_string.index("]:")
        ipv6_address = target_string[1:bracket_end]
        port_string = target_string[bracket_end + 2 :]
        try:
            p = int(port_string)
            port = p if 1 <= p <= 65535 else default_port
        except ValueError:
            port = default_port
        target_string = ipv6_address
    elif ":" in target_string:
        parts = _java_split(target_string, ":")
        if len(parts) == 2 and "::" not in target_string:
            try:
                p = int(parts[1])
                port = p if 1 <= p <= 65535 else default_port
                target_string = parts[0]
            except ValueError:
                port = default_port  # whole string stays as the address
        else:
            port = default_port
    else:
        port = default_port

    # address classification + late resolve (java:138-153)
    if _is_valid_inet(target_string):
        ip = target_string
    elif target_string.strip() != "":
        hostname = target_string
        if resolve_host is None:
            resolve_host = target_string
            port_fail = port
        # (an early resolve pending on a different name cannot coexist with a
        # late resolve: the early form consumed target_string=="" above)

    return {
        "hostname": hostname,
        "ip": ip,
        "port_ok": port,
        "port_fail": port_fail if port_fail is not None else port,
        "tranco_rank": rank,
        "resolve_host": resolve_host,
        "parse_status": "OK",
    }


def parse_targets_udf(default_port: int = 443):
    """Vectorized (Arrow) parse: string Series -> struct column."""

    @pandas_udf(PARSE_RESULT_SCHEMA)
    def _parse(targets: pd.Series) -> pd.DataFrame:
        rows = [parse_target_py(t, default_port) for t in targets]
        df = pd.DataFrame(rows, columns=[f.name for f in PARSE_RESULT_SCHEMA.fields])
        for c in ("port_ok", "port_fail", "tranco_rank"):
            df[c] = df[c].astype("int32")
        return df

    return _parse


# ---------------------------------------------------------------------------
# URL canonicalization [EXT] — feeds xxhash64 for the URL-seen set (A7).
# ---------------------------------------------------------------------------

def _canonicalize_one(url: str, default_scheme: str = "http") -> str:
    """Deterministic canonical form for the URL-seen key.

    scheme lower; host lower + trailing-dot strip; default-port elision
    (http:80 / https:443); fragment strip; empty path -> "/";
    collapse duplicate slashes in the path.
    """
    if url is None:
        return None
    s = url.strip()
    if "://" in s:
        scheme, rest = s.split("://", 1)
        scheme = scheme.lower()
    else:
        scheme, rest = default_scheme, s
    rest = rest.split("#", 1)[0]
    if "/" in rest:
        hostport, path = rest.split("/", 1)
        path = "/" + path
    else:
        hostport, path = rest, "/"
    if hostport.startswith("["):  # ipv6 literal, with or without :port
        if "]:" in hostport:
            host, _, port = hostport.partition("]:")
            port = port or None
        else:
            host, port = hostport, None
        host = "[" + host.strip("[]").lower() + "]"
    elif ":" in hostport:
        host, _, port = hostport.rpartition(":")
        host = host.lower()
    else:
        host, port = hostport.lower(), None
    host = host.rstrip(".") if not host.startswith("[") else host
    default = {"http": "80", "https": "443"}.get(scheme)
    portpart = "" if (port is None or port == default or port == "") else ":" + port
    while "//" in path:
        path = path.replace("//", "/")
    return f"{scheme}://{host}{portpart}{path}"


@pandas_udf(StringType())
def canonicalize_urls_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: _canonicalize_one(u) if u is not None else None)


def canonical_url_col(hostname: str = "hostname", ip: str = "ip", port: str = "port") -> Column:
    """Native (JVM-side) canonical key for parsed scan targets: the reference
    identifies a target by (hostname|ip, port) — ScanTarget.java:176-178.
    No UDF: stays inside whole-stage codegen."""
    host = F.lower(F.coalesce(F.col(hostname), F.col(ip)))
    host = F.regexp_replace(host, r"\.$", "")
    return F.concat_ws(":", host, F.col(port).cast("string"))


def url_key_col(canon: Column) -> Column:
    """64-bit URL-seen key (native xxhash64; north_star: canonicalize then xxhash64)."""
    return F.xxhash64(canon)
