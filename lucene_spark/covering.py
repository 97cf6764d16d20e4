"""CoveringQuery — per-document DYNAMIC minimumNumberShouldMatch.

Reference: lucene/sandbox/src/java/org/apache/lucene/search/
CoveringQuery.java:42-118 + CoveringScorer.java: a doc matches when the
number of matching sub-queries is >= max(1, minimumNumberMatch(doc)) where
the minimum comes from a per-document LongValuesSource (typically a numeric
doc-values field); the score is the SUM of the matching sub-scorers'
scores.  A per-doc minimum larger than the clause count can never be
satisfied — such docs simply don't match (the reference does not clamp
above, only below at 1).

Spark shape: each clause is scored independently with ``score_docs`` (all
matching docs, distributed), the per-clause frames union and aggregate by
docid (ONE match-sized shuffle — never corpus-sized), and the per-doc
minimum joins in as an ordinary (docid, value) DataFrame — the doc-values
analog.  Docs absent from the values frame read 0 (LongValuesSource
advanceExact=false semantics → the max(1, ·) floor applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index import Index


def covering_query(
    index: Index,
    clauses: list,
    min_match: DataFrame,
    k: int = 10,
    precision: str = "lucene",
    similarity: str = "bm25",
) -> DataFrame:
    """Top-k (docid, score) for CoveringQuery(clauses, min_match).

    ``min_match`` is a (docid, value) DataFrame — the LongValuesSource.
    Ties break by ascending docid (TopScoreDocCollector order).
    """
    from .search import score_docs

    scored = None
    for c in clauses:
        s = score_docs(index, c, precision=precision, similarity=similarity)
        scored = s if scored is None else scored.unionAll(s)
    if scored is None:
        return index.postings.sparkSession.createDataFrame(
            [], "docid long, score double")
    agg = scored.groupBy("docid").agg(
        F.sum("score").alias("score"), F.count("*").alias("n_matched"))
    mm = min_match.select(
        F.col("docid").cast("long").alias("docid"),
        F.col("value").cast("long").alias("mm_value"))
    return (
        agg.join(mm, "docid", "left")
        .filter(F.col("n_matched")
                >= F.greatest(F.lit(1), F.coalesce(F.col("mm_value"),
                                                   F.lit(0))))
        .select("docid", "score")
        .orderBy(F.desc("score"), "docid")
        .limit(k)
    )
