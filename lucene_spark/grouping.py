"""Grouping collectors over a scored match set.

Reference: lucene/grouping/src/java/org/apache/lucene/search/grouping/ —
the module's collector families re-expressed as DataFrame aggregations over
``score_docs`` output (the FacetsCollector-style all-hits primitive):

  GroupingSearch.java / First+SecondPassGroupingCollector  — top-n docs per
      group: already covered by the per-group window in the ``ft_group_top``
      gate (one exchange keyed on the group).
  AllGroupsCollector.java:28-38       — the distinct group values among hits
      (getGroupCount / getGroups)
  AllGroupHeadsCollector.java:37-60   — for every group, the single most
      relevant hit under the sort (the "group head"); retrieveGroupHeads
  DistinctValuesCollector.java:28-35  — per group, the distinct values of a
      second (count) field among hits
  GroupFacetCollector.java:33-41 / TermGroupFacetCollector.java — facet
      counts where each (group, facet-value) pair counts ONCE regardless of
      how many hits the group has (grouped faceting)
  LongRangeGroupSelector.java / DoubleRangeGroupSelector.java — grouping by
      a numeric range bucket instead of a term: pass a bucket expression as
      ``group_col`` (any Column works — Spark subsumes the selector)

All functions take the match set as a (docid, score) DataFrame plus the doc
table carrying the group/value columns, join once on docid (hit-set-sized),
and aggregate with the group as the shuffle key — one exchange each, no
driver traffic, the same plan shape at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hits(matches: DataFrame, docs: DataFrame, id_col: str) -> DataFrame:
    m = matches.withColumnRenamed("docid", id_col) if id_col != "docid" \
        else matches
    return m.join(docs, id_col)


def all_groups(matches: DataFrame, docs: DataFrame,
               group_col: str | Column, id_col: str = "docid") -> DataFrame:
    """AllGroupsCollector: the distinct group values among the hits —
    one column ``group``, one row per group (getGroups); count() of the
    result is getGroupCount.  A null group is a legal group (the reference
    collects it)."""
    return (
        _hits(matches, docs, id_col)
        .select(F.col(group_col).alias("group") if isinstance(group_col, str)
                else group_col.alias("group"))
        .distinct()
    )


def all_group_heads(matches: DataFrame, docs: DataFrame,
                    group_col: str = "group", id_col: str = "docid") -> DataFrame:
    """AllGroupHeadsCollector with the default score sort: for every group,
    the single most relevant hit (score desc, docid asc tiebreak — the
    reference keeps the FIRST competitive doc in docid order).  Returns
    (group, docid, score)."""
    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (
        _hits(matches, docs, id_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(group_col, id_col, "score")
    )


def distinct_values(matches: DataFrame, docs: DataFrame,
                    group_col: str, count_col: str,
                    id_col: str = "docid") -> DataFrame:
    """DistinctValuesCollector: per group, the sorted distinct values of
    ``count_col`` among the hits plus the group's hit count.  Returns
    (group, values array, n_hits)."""
    return (
        _hits(matches, docs, id_col)
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.sort_array(F.collect_set(count_col)).alias("values"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )


def group_facet_counts(matches: DataFrame, docs: DataFrame,
                       group_col: str, facet_col: str,
                       id_col: str = "docid") -> DataFrame:
    """TermGroupFacetCollector: facet counts under grouping — each
    (group, facet value) pair contributes ONE count no matter how many of
    the group's hits carry the value (GroupFacetCollector.java:33-41: 'the
    counts are based on the number of unique groups for a facet value').
    Returns (label, count), count desc then label asc."""
    return (
        _hits(matches, docs, id_col)
        .select(F.col(group_col).alias("g"), F.col(facet_col).alias("label"))
        .distinct()
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("label").asc())
    )


def block_grouping(matches: DataFrame, group_end_docids,
                   k_groups: int = 10, k_in_group: int = 2,
                   id_col: str = "docid") -> DataFrame:
    """BlockGroupingCollector (grouping/BlockGroupingCollector.java:42-75):
    single-pass grouping over doc BLOCKS — documents indexed contiguously
    (IndexWriter.addDocuments), each block delimited by its last ("group
    end") docid.  Each hit maps to the first group-end >= its docid; the
    top ``k_groups`` blocks rank by their best hit's score (the default
    Sort.RELEVANCE group sort) and carry their ``k_in_group`` best hits.

    ``group_end_docids``: sorted array-like of block-final docids (the
    groupEndDocs filter's match set).  It broadcasts to the executors and
    each partition does one vectorized searchsorted — no shuffle is added
    beyond the two group-keyed windows.  Returns (group_end, group_score,
    rank_in_group, docid, score) rows, group_score desc then group_end,
    rank asc within.
    """
    import numpy as np

    ends = np.asarray(sorted(int(x) for x in group_end_docids), dtype=np.int64)
    spark = matches.sparkSession
    bc = spark.sparkContext.broadcast(ends)

    def assign(batches):
        arr = bc.value
        for pdf in batches:
            i = np.searchsorted(arr, pdf[id_col].to_numpy(dtype=np.int64))
            # hits after the last group end belong to no block (the
            # reference silently drops them: no group end -> not collected)
            ok = i < len(arr)
            out = pdf[ok].copy()
            out["group_end"] = arr[i[ok]]
            yield out

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(matches.schema.fields) + [StructField("group_end", LongType())])
    assigned = matches.mapInPandas(assign, schema=schema)
    wg = Window.partitionBy("group_end")
    wr = Window.partitionBy("group_end").orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    ranked = (
        assigned.withColumn("group_score", F.max("score").over(wg))
        .withColumn("rank_in_group", F.row_number().over(wr))
        .filter(F.col("rank_in_group") <= k_in_group)
    )
    top_groups = (
        ranked.select("group_end", "group_score").distinct()
        .orderBy(F.col("group_score").desc(), F.col("group_end").asc())
        .limit(k_groups)
    )
    return (
        ranked.join(F.broadcast(top_groups.select("group_end")), "group_end")
        .select("group_end", "group_score", "rank_in_group", id_col, "score")
        .orderBy(F.col("group_score").desc(), F.col("group_end").asc(),
                 F.col("rank_in_group").asc())
    )
