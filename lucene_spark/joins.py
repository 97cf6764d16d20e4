"""Query-time join with score modes — the join module's JoinUtil analog.

Reference: lucene/join/src/java/org/apache/lucene/search/join/
- ``JoinUtil.java:56`` ``createJoinQuery(fromField, multipleValuesPerDocument,
  toField, fromQuery, searcher, scoreMode)``: run ``fromQuery``, collect the
  distinct ``fromField`` values of its hits with per-value aggregated hit
  scores, then match every "to"-side document whose ``toField`` carries one
  of those values, scored by the per-value aggregate.
- ``TermsWithScoreCollector.java:36-120`` — the per-value aggregation:
  Total (sum), Max, Min, Avg (sum/count); ``ScoreMode.java`` — ``None``
  rewrites to a constant-score set query (score 1.0 per to-doc).

Spark-first shape: the from-side hit scores come from
:func:`lucene_spark.search.score_docs` (a distributed (docid, score) frame —
nothing collected), the per-value aggregate is one ``groupBy(fromField)``
over the HIT SET (query-sized, not corpus-sized), and the to-side match is a
broadcast hash join of that small aggregate against the to table — no
corpus shuffle at any step, which is the 10^12-doc version of Lucene's
global-ordinals optimization (the value→score map stays tiny and local to
every executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index import Index
from .search import score_docs

_AGGS = {
    "total": F.sum,
    "max": F.max,
    "min": F.min,
}

SCORE_MODES = ("none", "avg", "max", "total", "min")


def query_time_join(
    index: Index,
    from_query: str | tuple,
    from_docs: DataFrame,
    to_docs: DataFrame,
    from_col: str,
    to_col: str,
    score_mode: str = "avg",
    precision: str = "float64",
    id_col: str = "doc_id",
    similarity: str = "bm25",
) -> DataFrame:
    """JoinUtil.createJoinQuery analog (single value per document — the
    ``multipleValuesPerDocument=false`` shape; array-valued columns can be
    exploded by the caller first).

    Returns the to-side rows whose ``to_col`` value appears among the
    from-query hits' ``from_col`` values, with column ``score`` holding the
    ScoreMode aggregate of the from-hit scores for that value
    (TermsWithScoreCollector.java:36-120); ``score_mode='none'`` gives the
    constant 1.0 (ScoreMode.java None → set semantics).
    """
    if score_mode not in SCORE_MODES:
        raise ValueError(
            f"unknown score_mode {score_mode!r}; one of {SCORE_MODES}"
        )
    hits = score_docs(
        index, from_query, precision=precision, similarity=similarity
    )
    # hit docids -> from-side values (join on the from table's id column;
    # the hit set is query-sized, so it broadcasts)
    vals = from_docs.select(
        F.col(id_col).alias("_jid"), F.col(from_col).alias("_jval")
    ).join(F.broadcast(hits), F.col("_jid") == hits.docid)
    if score_mode == "none":
        agg = vals.select("_jval").distinct().withColumn(
            "score", F.lit(1.0)
        )
    elif score_mode == "avg":
        agg = vals.groupBy("_jval").agg(F.avg("score").alias("score"))
    else:
        agg = vals.groupBy("_jval").agg(
            _AGGS[score_mode]("score").alias("score")
        )
    return to_docs.join(
        F.broadcast(agg), to_docs[to_col] == agg["_jval"]
    ).drop("_jval")
