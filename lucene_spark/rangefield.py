"""Numeric RangeFields: documents ARE n-dimensional ranges.

Reference: ``core/src/java/org/apache/lucene/document/IntRange.java`` /
``LongRange.java`` / ``FloatRange.java`` / ``DoubleRange.java`` (up to 4
dimensions, each a [min, max] interval) queried through
``RangeFieldQuery.java``'s QueryType relations INTERSECTS / WITHIN /
CONTAINS / CROSSES, plus ``InetAddressRange.java`` (IP ranges as 128-bit
integers).

Spark shape: a doc range is (min_1..min_n, max_1..max_n) columns; every
relation is pure interval algebra per dimension — 100% Catalyst column
predicates, sargable against parquet min/max stats (the BKD analog), no
UDFs, no shuffle.  The 2-D LatLon specialization lives in
``geo.box_field_query``; this is the general n-D form.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import DataFrame, functions as F

__all__ = ["RANGE_RELATIONS", "range_field_query", "inet_to_int",
           "inet_to_key", "inet_range_query"]

RANGE_RELATIONS = ("intersects", "within", "contains", "crosses")


def _predicates(min_cols, max_cols, query_mins, query_maxs):
    inter = within = contains = None

    def conj(acc, term):
        return term if acc is None else acc & term

    for mn_c, mx_c, qmn, qmx in zip(min_cols, max_cols, query_mins,
                                    query_maxs):
        dmn, dmx = F.col(mn_c), F.col(mx_c)
        inter = conj(inter, (dmx >= F.lit(qmn)) & (dmn <= F.lit(qmx)))
        within = conj(within, (dmn >= F.lit(qmn)) & (dmx <= F.lit(qmx)))
        contains = conj(contains, (dmn <= F.lit(qmn)) & (dmx >= F.lit(qmx)))
    return inter, within, contains


def range_field_query(
    ranges: DataFrame,
    min_cols,
    max_cols,
    query_mins,
    query_maxs,
    relation: str = "intersects",
    id_col: str = "doc_id",
) -> DataFrame:
    """RangeFieldQuery (document/RangeFieldQuery.java QueryType):

    - intersects: inclusive overlap in every dimension
    - within: doc range inside the query range
    - contains: doc range contains the query range
    - crosses: intersects AND NOT within AND NOT contains
    """
    if relation not in RANGE_RELATIONS:
        raise ValueError(f"relation must be one of {RANGE_RELATIONS}")
    if not (len(min_cols) == len(max_cols) == len(query_mins)
            == len(query_maxs)):
        raise ValueError("dimension arity mismatch")
    inter, within, contains = _predicates(min_cols, max_cols, query_mins,
                                          query_maxs)
    pred = {"intersects": inter, "within": within, "contains": contains,
            "crosses": inter & ~within & ~contains}[relation]
    return ranges.filter(pred).select(id_col)


def inet_to_int(ip: str) -> int:
    """InetAddressRange encoding analog: the reference stores every
    address as a 16-byte (IPv6-mapped) big-endian integer so IPv4 and
    IPv6 ranges compare in one space (document/InetAddressRange.java:
    encode)."""
    addr = ipaddress.ip_address(ip)
    if isinstance(addr, ipaddress.IPv4Address):
        addr = ipaddress.IPv6Address(b"\x00" * 10 + b"\xff\xff"
                                     + addr.packed)
    return int(addr)


def inet_to_key(ip: str) -> str:
    """The 128-bit integer as a fixed-width 32-char lowercase hex string —
    lexicographic string order == numeric order, so the key fits Catalyst
    string comparisons (Spark decimals cap at precision 38 < 2^128)."""
    return f"{inet_to_int(ip):032x}"


def inet_range_query(ranges: DataFrame, lo_ip: str, hi_ip: str,
                     relation: str = "intersects",
                     id_col: str = "doc_id",
                     cols: tuple = ("ip_min", "ip_max")) -> DataFrame:
    """InetAddressRange query: doc IP ranges stored as the hex keys of
    :func:`inet_to_key`, related to [lo_ip, hi_ip]."""
    lo, hi = inet_to_key(lo_ip), inet_to_key(hi_ip)
    return range_field_query(ranges, [cols[0]], [cols[1]], [lo], [hi],
                             relation=relation, id_col=id_col)


def inet_prefix_bounds(ip: str, prefix_length: int) -> tuple[str, str]:
    """InetAddressPoint.newPrefixQuery (document/InetAddressPoint.java:
    newPrefixQuery): a CIDR prefix is the inclusive key range
    [network address, broadcast address] in the 128-bit space; IPv4
    addresses sit behind the ::ffff: mapping, so an IPv4 /p is a /(96+p)
    of the mapped space."""
    v = inet_to_int(ip)
    import ipaddress as _ipa

    if isinstance(_ipa.ip_address(ip), _ipa.IPv4Address):
        if not 0 <= prefix_length <= 32:
            raise ValueError("illegal prefixLength: must be 0-32 for IPv4")
        prefix_length += 96
    elif not 0 <= prefix_length <= 128:
        raise ValueError("illegal prefixLength: must be 0-128 for IPv6")
    host_bits = 128 - prefix_length
    lo = (v >> host_bits) << host_bits
    hi = lo | ((1 << host_bits) - 1)
    return f"{lo:032x}", f"{hi:032x}"


def inet_point_query(points: DataFrame, *, exact: str | None = None,
                     prefix: tuple[str, int] | None = None,
                     lo_ip: str | None = None, hi_ip: str | None = None,
                     id_col: str = "doc_id",
                     col: str = "ip_key") -> DataFrame:
    """InetAddressPoint queries (document/InetAddressPoint.java:
    newExactQuery/newPrefixQuery/newRangeQuery): single-address docs
    stored as one order-preserving hex key; exact = equality, prefix =
    CIDR bounds, range = inclusive BETWEEN — all sargable Catalyst
    predicates (the scan-level filter pushdown the 1-D BKD range gives
    the reference)."""
    c = F.col(col)
    if exact is not None:
        pred = c == inet_to_key(exact)
    elif prefix is not None:
        lo, hi = inet_prefix_bounds(*prefix)
        pred = (c >= lo) & (c <= hi)
    elif lo_ip is not None and hi_ip is not None:
        pred = (c >= inet_to_key(lo_ip)) & (c <= inet_to_key(hi_ip))
    else:
        raise ValueError("one of exact / prefix / (lo_ip, hi_ip) required")
    return points.filter(pred).select(id_col)
