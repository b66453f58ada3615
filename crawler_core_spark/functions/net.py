"""IP / domain / CIDR helpers (pure-Python driver-side + native column exprs).

Mirrors the validator stack the reference uses to *classify* denylist
entries (``denylist/DenylistFileProvider.java:47-58``: DomainValidator,
InetAddressValidator, SubnetUtils) and turns CIDR containment into a
numeric range predicate so the membership test becomes a broadcast range
join (SURVEY.md J2) instead of a per-row subnet loop.
"""

from __future__ import annotations

import ipaddress
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# DomainValidator.isValid approximation: dotted labels, alpha TLD >= 2 chars.
_DOMAIN_RE = re.compile(
    r"^(?=.{1,253}$)([a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?\.)+[a-zA-Z]{2,63}$"
)


def is_valid_domain(s: str) -> bool:
    return bool(_DOMAIN_RE.match(s or ""))


def is_valid_ip(s: str) -> bool:
    try:
        ipaddress.ip_address(s)
        return True
    except ValueError:
        return False


def cidr_bounds(cidr: str) -> tuple[int, int] | None:
    """IPv4 CIDR -> inclusive (lo, hi) uint32 bounds.

    Matches SubnetUtils.isInRange semantics for host addresses: with the
    default (non-inclusive-host-count) mode the network and broadcast
    addresses are NOT in range, so for prefix < 31 we return
    (network+1, broadcast-1); /31 and /32 cover the full block.
    """
    try:
        net = ipaddress.ip_network(cidr, strict=False)
    except ValueError:
        return None
    if net.version != 4:
        return None
    lo = int(net.network_address)
    hi = int(net.broadcast_address)
    if net.prefixlen < 31:
        lo, hi = lo + 1, hi - 1
    return lo, hi


def ipv4_to_long(s: str) -> int | None:
    try:
        a = ipaddress.ip_address(s)
        return int(a) if a.version == 4 else None
    except (ValueError, TypeError):
        return None


def ipv4_num_col(ip: Column) -> Column:
    """Native uint32 of a dotted-quad IPv4 column; NULL for IPv6/invalid.

    Stays in whole-stage codegen: split + cast + arithmetic, no UDF.
    """
    looks_v4 = ip.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    parts = F.split(ip, r"\.")
    octets = [parts.getItem(i).cast("long") for i in range(4)]
    valid = looks_v4
    for o in octets:
        valid = valid & (o <= 255)
    num = ((octets[0] * 16777216) + (octets[1] * 65536) + (octets[2] * 256) + octets[3])
    return F.when(valid, num)
