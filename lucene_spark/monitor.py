"""Reverse search / percolator: match a stream of documents against STORED
queries — the Lucene monitor module re-expressed as a broadcast join.

Reference: lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java:47
(register queries, match(Document) returns the queries that hit) and
QueryIndex/CandidateMatcher.  Lucene builds an index OVER the queries and runs
each doc as a MemoryIndex against candidate queries; at Spark scale the same
pre-filtering falls out of a broadcast hash join from the (tiny) query-term
table to the exploded document terms — no per-doc index needed.

Scale: the query table is broadcast (thousands of stored queries ≈ KBs);
documents stream through exploded-distinct terms; one narrow aggregation per
(query, doc) candidate pair.  Works identically under Structured Streaming
(the docs side may be a streaming DataFrame feeding foreachBatch).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOP_WORDS, analyze


@dataclass(frozen=True)
class StoredQuery:
    """A registered boolean term query: mode 'all' = conjunction (MUST),
    'any' = disjunction (SHOULD) — Monitor's MonitorQuery analog."""

    qid: str
    text: str
    mode: str = "all"  # 'all' | 'any'


def match_documents(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[StoredQuery],
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords=ENGLISH_STOP_WORDS,
) -> DataFrame:
    """→ (qid, doc_id) for every stored query matching each document.

    A query with no surviving analyzed terms matches nothing (MatchNoDocs
    rewrite, matching the engine's query-side convention).
    """
    qrows = []
    for q in queries:
        terms = sorted(set(analyze(q.text, stopwords)))
        n_required = len(terms) if q.mode == "all" else 1
        for t in terms:
            qrows.append((q.qid, t, n_required))
    if not qrows:
        return spark.createDataFrame([], f"qid string, {id_col} long")
    qdf = spark.createDataFrame(qrows, "qid string, term string, n_required int")

    from .index import tokenize_docs

    toks = tokenize_docs(
        docs.withColumn("docid", F.col(id_col)), text_col=text_col, key_col=id_col
    )
    doc_terms = (
        toks.select(F.col("docid").alias(id_col), F.explode("tokens").alias("term"))
        .distinct()
    )
    return (
        doc_terms.join(F.broadcast(qdf), "term")
        .groupBy("qid", id_col, "n_required")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") >= F.col("n_required"))
        .select("qid", id_col)
    )
