"""kNN text classification over the index.

Reference: lucene/classification KNearestNeighborClassifier
(classification/src/java/org/apache/lucene/classification/
KNearestNeighborClassifier.java:60): build a boolean query from the unseen
text's terms, take the top-k BM25 neighbors, majority-vote their class field.
Ties break toward the lexicographically smallest label (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOP_WORDS, analyze
from .index import Index
from .search import search


def classify_knn(
    index: Index,
    text: str,
    labels: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 10,
    precision: str = "lucene",
    stopwords=ENGLISH_STOP_WORDS,
) -> DataFrame:
    """→ single-row DataFrame (label, votes): majority label of the top-k
    BM25 neighbors of ``text``.  ``labels``: (id_col, label_col) table."""
    spark = labels.sparkSession
    terms = sorted(set(analyze(text, stopwords)))
    if not terms:
        return spark.createDataFrame([], "label string, votes long")
    td = search(index, " ".join(terms), k=k, precision=precision, prune=True)
    if len(td.docids) == 0:
        return spark.createDataFrame([], "label string, votes long")
    ids = [int(d) for d in td.docids]
    return (
        labels.filter(F.col(id_col).isin(ids))
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("votes"))
        .orderBy(F.col("votes").desc(), F.col("label"))
        .limit(1)
    )
