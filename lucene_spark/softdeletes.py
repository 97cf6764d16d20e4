"""Soft deletes — doc-values-marked deletes with merge-time retention.

Reference:
- core/src/java/org/apache/lucene/index/SoftDeletesDirectoryReaderWrapper
  .java:46 — "a reader that filters out documents with a value in the
  soft-deletes field": soft-deleted docs stay physically present (their
  postings still exist and collection statistics still count them, exactly
  like hard-tombstoned docs before a merge) but are hidden from every
  search through the wrapper.
- core/src/java/org/apache/lucene/index/SoftDeletesRetentionMergePolicy
  .java:47 — at merge time, soft-deleted documents that MATCH the retention
  query are kept alive (numDeletesToMerge/keepFullyDeletedSegment), while
  the rest are dropped like ordinary deletes.  This is what enables
  "rollback windows" / NRT replication history: deletes become reclaimable
  only once the retention query stops matching them.
- IndexWriter.softUpdateDocument (index/IndexWriter.java) — the marking
  write is a doc-values UPDATE on the soft-deletes field, not a liveDocs
  bit flip.

Engine mapping: the soft-deletes field is a (docid, 1) doc-values frame —
the same shape `docvalues.NumericDocValues` updates produce.  The reader
wrapper is `Index.delete_docs` applied NON-destructively (tombstone view at
read time; the underlying index frames are untouched, mirroring the
wrapper-not-rewrite design).  The merge policy is a set computation: purge
= soft − retention-matches, retain = soft ∩ retention-matches; a subsequent
`streaming.compact_index` fed the purge set as tombstones realizes the
reference's merge behavior (retained docs survive the rewrite and stay
hidden by the wrapper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .index import Index
from .search import match_any_docs


def soft_delete_by_term(index: Index, term: str) -> DataFrame:
    """IndexWriter.softUpdateDocument's marking step for every doc matching
    ``term``: the soft-deletes doc-values frame (docid, value 1).  Distinct
    docids — re-marking an already-soft-deleted doc is idempotent (a DV
    re-update to the same value)."""
    from pyspark.sql import functions as F

    return (match_any_docs(index, [term])
            .select("docid").distinct()
            .withColumn("soft_del", F.lit(1)))


def soft_deletes_wrapper(index: Index, soft_dv: DataFrame) -> Index:
    """SoftDeletesDirectoryReaderWrapper.wrap: a READ-TIME view hiding every
    doc with a value in the soft-deletes field.  Non-destructive —
    Index.delete_docs returns a new Index whose tombstone set is consulted
    by search/count; the wrapped index's own frames are untouched."""
    return index.delete_docs(soft_dv.select("docid"))


def retention_split(index: Index, soft_dv: DataFrame,
                    retention_terms: list[str]) -> tuple[DataFrame, DataFrame]:
    """SoftDeletesRetentionMergePolicy's merge-time decision
    (SoftDeletesRetentionMergePolicy.java:47-120): soft-deleted docs
    matching the retention query are RETAINED through the merge; the rest
    purge like hard deletes.  Returns (retained, purged) docid frames —
    feed ``purged`` to ``streaming.compact_index`` as the tombstone set to
    realize the merge."""
    soft_ids = soft_dv.select("docid")
    keep = match_any_docs(index, retention_terms).select("docid")
    retained = soft_ids.join(keep, "docid", "left_semi")
    purged = soft_ids.join(keep, "docid", "left_anti")
    return retained, purged
