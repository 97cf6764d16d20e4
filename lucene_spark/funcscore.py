"""FunctionScoreQuery + QueryRescorer analogs — score shaping by doc values.

Reference semantics:

- FunctionScoreQuery (queries/src/java/org/apache/lucene/queries/function/
  FunctionScoreQuery.java:44-103): wraps a query; the DoubleValuesSource
  REPLACES the wrapped query's score ("a source of scores", :55); a document
  the source has no value for scores 0 (class javadoc :41-42).
  ``boostByValue`` (:80) multiplies the wrapped score by the source, with
  missing values preserving the score as-is (MultiplicativeBoostValuesSource,
  javadoc :74-75).  ``boostByQuery`` (:97) multiplies by a constant factor on
  docs that also match a boosting query, preserving the others (:91-96).
- QueryRescorer (core/src/java/org/apache/lucene/search/QueryRescorer.java:
  31-140): re-score the FIRST-PASS top hits with a second query;
  combine(first, secondPassMatches, second) per hit — the sugar API (:175+)
  uses first + weight * second when the second pass matches, first alone
  otherwise; final order is (score desc, docID asc) (:113-127).

Spark-first design: the wrapped query's exhaustive match set comes from
``score_docs`` (a distributed (docid, score) DataFrame — FunctionScoreQuery
runs ScoreMode.COMPLETE, no impact pruning, createWeight at
FunctionScoreQuery.java:107-115, so exhaustive is the faithful mode).  Doc
values live in a columnar side table keyed by docid (the NumericDocValues
analog); the source expression is a Catalyst SQL expression over ``score``
and those columns, so scoring stays JVM-side — no Python touches per-doc
values.  The final top-k is a TakeOrderedAndProject.  Rescoring only ever
scores the first-pass window (an isin-pushdown scan of the second query's
postings), never the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOP_WORDS
from .index import Index
from .search import TopDocs, score_docs


def function_score(
    index: Index,
    query: str | tuple,
    source: str,
    values: DataFrame | None = None,
    k: int = 10,
    precision: str = "lucene",
    k1: float = 1.2,
    b: float = 0.75,
    similarity: str = "bm25",
    analyzer=ENGLISH_STOP_WORDS,
) -> TopDocs:
    """FunctionScoreQuery: top-k of the wrapped ``query``'s match set with
    each hit's score REPLACED by ``source``, a Catalyst SQL expression over
    ``score`` (the wrapped query's score) and the columns of ``values``.

    ``values``: optional DataFrame with a ``docid`` column plus numeric
    columns — the doc-values side table.  A matching doc absent from
    ``values`` sees NULLs; a NULL source result scores 0.0, matching "if the
    DoubleValuesSource doesn't return a value ... that document will be
    given a score of 0" (FunctionScoreQuery.java:41-42).

    The join is keyed on docid and Catalyst prunes ``values`` to the columns
    the expression references, so at scale this is a column-pruned scan of
    the values table joined against the (query-sparse) match set — never a
    corpus-wide materialization.
    """
    scored = score_docs(
        index, query, precision=precision, k1=k1, b=b,
        similarity=similarity, analyzer=analyzer,
    )
    if values is not None:
        scored = scored.join(values, "docid", "left")
    rescored = scored.select(
        "docid",
        F.coalesce(F.expr(source).cast("double"), F.lit(0.0)).alias("score"),
    )
    return _take_topk(rescored, k)


def boost_by_value(
    index: Index,
    query: str | tuple,
    values: DataFrame,
    value_expr: str,
    k: int = 10,
    **kw,
) -> TopDocs:
    """FunctionScoreQuery.boostByValue (FunctionScoreQuery.java:80-82):
    score = wrapped score x ``value_expr``; docs missing from ``values``
    keep their score as-is (MultiplicativeBoostValuesSource contract,
    :74-75) — hence the coalesce-to-1."""
    return function_score(
        index, query, f"score * coalesce(({value_expr}), 1.0)",
        values=values, k=k, **kw,
    )


def boost_by_query(
    index: Index,
    query: str | tuple,
    boost_match: str | tuple,
    boost_value: float,
    k: int = 10,
    precision: str = "lucene",
    k1: float = 1.2,
    b: float = 0.75,
    similarity: str = "bm25",
    analyzer=ENGLISH_STOP_WORDS,
) -> TopDocs:
    """FunctionScoreQuery.boostByQuery (FunctionScoreQuery.java:97-103):
    hits of ``query`` that ALSO match ``boost_match`` score
    score x ``boost_value``; the rest keep their score.  A boost_value in
    (0, 1) demotes (:91-93).  The boosting query's match set is computed
    distributed and semi-joined — only matching docids move."""
    scored = score_docs(
        index, query, precision=precision, k1=k1, b=b,
        similarity=similarity, analyzer=analyzer,
    )
    matches = score_docs(
        index, boost_match, precision=precision, k1=k1, b=b,
        similarity=similarity, analyzer=analyzer,
    ).select("docid", F.lit(True).alias("__boosted"))
    rescored = scored.join(matches, "docid", "left").select(
        "docid",
        F.when(F.col("__boosted"), F.col("score") * F.lit(float(boost_value)))
        .otherwise(F.col("score"))
        .alias("score"),
    )
    return _take_topk(rescored, k)


def diversified_topk(
    index,
    query,
    keys: "DataFrame",
    k: int,
    max_per_key: int,
    key_col: str = "key",
    id_col: str = "docid",
    precision: str = "float64",
) -> "DataFrame":
    """DiversifiedTopDocsCollector analog (misc/search/
    DiversifiedTopDocsCollector.java:67-82): top-``k`` hits with at most
    ``max_per_key`` documents per key (the duplicate-source cap — "find
    the top song hits without over-representing one artist").

    Plan: distributed hit scoring (score_docs), a key join, a per-key
    window keeping the best ``max_per_key`` (score desc, docid asc — the
    per-key queue), then the global (score desc, docid asc) top-``k`` —
    TakeOrderedAndProject, k rows to the driver.  The per-key window
    shuffles only the HIT SET."""
    from pyspark.sql import Window

    from .search import score_docs

    hits = score_docs(index, query, precision=precision)
    joined = hits.join(
        keys.select(F.col(id_col).alias("docid"), F.col(key_col).alias("_k")),
        "docid",
    )
    w = Window.partitionBy("_k").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_key)
        .drop("_rn")
        .withColumnRenamed("_k", key_col)
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )


def rescore(
    index: Index,
    first: TopDocs,
    query: str | tuple,
    top_n: int = 10,
    weight: float = 2.0,
    precision: str = "lucene",
    k1: float = 1.2,
    b: float = 0.75,
    similarity: str = "bm25",
    analyzer=ENGLISH_STOP_WORDS,
) -> TopDocs:
    """QueryRescorer.rescore (search/QueryRescorer.java:49-140, sugar
    combine at :175+): second-pass scores for the FIRST-PASS hits only;
    combined = first + weight x second where the second query matches, first
    alone otherwise; result ordered (score desc, docID asc), cut to top_n.

    The second pass never scans beyond the first-pass window: the window's
    docids push down as an isin filter over the second query's (already
    query-sparse) distributed match set, so the rescoring cost is O(window),
    independent of corpus size."""
    if len(first.docids) == 0:
        return TopDocs(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    window = [int(d) for d in first.docids]
    second = (
        score_docs(index, query, precision=precision, k1=k1, b=b,
                   similarity=similarity, analyzer=analyzer)
        .filter(F.col("docid").isin(window))
        .collect()
    )
    smap = {int(r["docid"]): float(r["score"]) for r in second}
    combined = np.array(
        [
            float(f) + weight * smap[int(d)] if int(d) in smap else float(f)
            for d, f in zip(first.docids, first.scores)
        ],
        dtype=np.float64,
    )
    docids = np.asarray(first.docids, dtype=np.int64)
    order = np.lexsort((docids, -combined))[:top_n]
    return TopDocs(docids[order], combined[order])


def sort_rescore(
    index: Index,
    first: TopDocs,
    values: DataFrame,
    top_n: int = 10,
    ascending: bool = False,
    id_col: str = "doc_id",
    value_col: str = "value",
) -> list[tuple[int, object, float]]:
    """SortRescorer.rescore (search/SortRescorer.java:44-92): re-sort the
    first-pass window by a Sort (here one doc-values column from
    ``values``), ties broken by ascending docID (TopFieldCollector's doc
    tiebreak), cut to ``top_n``; the ORIGINAL first-pass scores ride along
    on the re-sorted hits (:80-88).

    Like :func:`rescore`, the second pass touches only the window: the
    window docids push down as an isin filter over the values frame, so
    cost is O(window) regardless of corpus size.  Returns
    [(docid, sort_value, first_pass_score), ...]."""
    if len(first.docids) == 0:
        return []
    window = [int(d) for d in first.docids]
    smap = {int(d): float(s) for d, s in zip(first.docids, first.scores)}
    vals = (values.filter(F.col(id_col).isin(window))
            .select(id_col, value_col).collect())
    vmap = {int(r[id_col]): r[value_col] for r in vals}
    rows = [(d, vmap.get(d), smap[d]) for d in window]

    def key(r):
        # missing values sort last either direction (SortField missing-last
        # default); numeric negation flips for descending
        if r[1] is None:
            return (1, 0, r[0])
        return (0, r[1] if ascending else -r[1], r[0])

    rows.sort(key=key)
    return rows[:top_n]


def _take_topk(rescored: DataFrame, k: int) -> TopDocs:
    """Global top-k IN SPARK (TakeOrderedAndProject; TopDocs tie contract
    score desc, docID asc — search/TopDocs.java:93-120)."""
    out = rescored.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k).collect()
    if not out:
        return TopDocs(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    docids = np.array([r["docid"] for r in out], dtype=np.int64)
    scores = np.array([r["score"] for r in out], dtype=np.float64)
    order = np.lexsort((docids, -scores))[:k]
    return TopDocs(docids[order], scores[order])


def long_distance_feature(
    docs: DataFrame,
    value_col: str,
    origin: int,
    pivot: int,
    boost: float = 1.0,
    score_name: str = "score",
) -> DataFrame:
    """LongPoint.newDistanceFeatureQuery analog
    (document/LongDistanceFeatureQuery.java:46-61,344-352): score =
    (float)(boost * pivot / (pivot + |value - origin|)) over a numeric
    doc-values column — recency/proximity boosting on longs/dates.  The
    float32 cast is the reference's, kept so a DuckDB twin casting to REAL
    matches bit-for-bit.  Pure Catalyst projection, no shuffle."""
    if pivot <= 0:
        raise ValueError(f"pivotDistance must be > 0, got {pivot}")
    d = F.abs(F.col(value_col).cast("long") - F.lit(int(origin)))
    s = (F.lit(float(boost)) * F.lit(float(pivot))
         / (F.lit(float(pivot)) + d.cast("double"))).cast("float")
    return docs.withColumn(score_name, s)
