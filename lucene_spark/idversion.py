"""IDVersionPostingsFormat analog — primary-key lookups with versions.

Reference: lucene/sandbox IDVersionPostingsFormat.java:40-80: "A
PostingsFormat optimized for primary keys: every term (the ID) has a
single doc and carries a long version; lookups can pass a minimum
version and fail fast when the stored version is older" —
IDVersionSegmentTermsEnum.seekExact(target, minVersion) returns false
without touching postings when maxVersionInBlock < minVersion.  The use
case is optimistic concurrency / realtime get in a two-phase-commit
indexing pipeline.

Spark shape: the ID-version map is a pk-sorted table (pk, docid,
version) — the same layout contract as the term dictionary, so point
lookups are pushdown isin/equality scans over parquet min/max zones (the
blocktree fast-fail analog), and the min-version gate composes into the
SAME scan predicate: a too-old version never leaves the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MAX_VERSION = (1 << 62) - 1  # IDVersionPostingsFormat.MAX_VERSION (ZigZag)


def build_id_version_index(
    docs: DataFrame,
    pk_col: str = "url",
    version_col: str = "version",
    docid_col: str = "docid",
) -> DataFrame:
    """(pk, docid, version), one row per pk — the HIGHEST version wins on
    duplicates (IndexWriter.updateDocument semantics: only the latest
    revision of a primary key is live; IDVersionPostingsWriter enforces
    one doc per term, :"only allows docFreq == 1").  Versions must be in
    [0, MAX_VERSION] (IDVersionPostingsFormat.MIN_VERSION/MAX_VERSION).
    Sorted by pk so point lookups prune on parquet min/max."""
    v = F.col(version_col).cast("long")
    checked = docs.select(
        F.col(pk_col).alias("pk"),
        F.col(docid_col).cast("long").alias("docid"),
        F.when(
            (v < 0) | (v > MAX_VERSION),
            F.raise_error(F.format_string(
                "version out of bounds [0, %d]: %d", F.lit(MAX_VERSION), v))
        ).otherwise(v).alias("version"),
    )
    w = Window.partitionBy("pk").orderBy(
        F.col("version").desc(), F.col("docid").desc())
    return (
        checked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .sortWithinPartitions("pk")
    )


def seek_exact(
    ividx: DataFrame, pk, min_version: int | None = None
):
    """(docid, version) for one primary key, or None — the
    IDVersionSegmentTermsEnum.seekExact(id, minVersion) surface: when
    ``min_version`` is given, a stored version < min_version returns None
    WITHOUT the row leaving the scan (the predicate is part of the
    pushdown filter, the maxVersionInBlock fast-fail analog)."""
    q = ividx.filter(F.col("pk") == pk)
    if min_version is not None:
        q = q.filter(F.col("version") >= int(min_version))
    rows = q.select("docid", "version").collect()
    return (int(rows[0]["docid"]), int(rows[0]["version"])) if rows else None


def lookup_versions(ividx: DataFrame, pks: DataFrame) -> DataFrame:
    """Batch realtime-get: ``pks`` (pk, min_version) → (pk, docid,
    version, accepted) for every requested pk that exists; accepted =
    version >= min_version.  One broadcast semi-join against the sorted
    map — no shuffle of the map itself."""
    p = F.broadcast(pks.select(
        "pk", F.col("min_version").cast("long").alias("min_version")))
    return (
        ividx.join(p, "pk")
        .select(
            "pk", "docid", "version",
            (F.col("version") >= F.col("min_version")).alias("accepted"),
        )
    )
