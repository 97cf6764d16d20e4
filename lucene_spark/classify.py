"""Text classification over the index: kNN and Naive Bayes.

References: lucene/classification KNearestNeighborClassifier
(classification/src/java/org/apache/lucene/classification/
KNearestNeighborClassifier.java:60): build a boolean query from the unseen
text's terms, take the top-k BM25 neighbors, majority-vote their class field.
Ties break toward the lexicographically smallest label (deterministic).
SimpleNaiveBayesClassifier (same package, SimpleNaiveBayesClassifier.java:49):
add-1-smoothed multinomial NB whose statistics come from the index itself.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
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


def _term_docids(index: Index, terms: list[str]) -> DataFrame:
    """(term, docid) pairs for the given terms — the distributed analog of
    running one TotalHitCountCollector per (word, class) conjunction
    (SimpleNaiveBayesClassifier.java getWordFreqForClass): decode only the
    matched posting rows, emit the term alongside each global docID so ONE
    scan + ONE join replaces |terms| x |classes| searches."""
    spark = index.postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "term string, docid long")
    seg_size = index.seg_size
    rows = index.postings.filter(F.col("term").isin(sorted(set(terms))))

    def explode(batches):
        from .kernel import TermPostings

        for pdf in batches:
            if len(pdf) == 0:
                continue
            segs = pdf["seg"].to_numpy(dtype=np.int64)
            out_t, out_d = [], []
            for i, (_, row) in enumerate(pdf.iterrows()):
                docids = TermPostings(row, seg_size).decode()[0]
                out_d.append(docids + segs[i] * seg_size)
                out_t.append(np.repeat(np.array([row["term"]], dtype=object), len(docids)))
            yield pd.DataFrame(
                {"term": np.concatenate(out_t), "docid": np.concatenate(out_d)}
            )

    # NOTE: the singleton-pulsing sidecar is additive (pulse_index keeps the
    # underlying posting rows), so scanning index.postings alone is complete.
    return rows.mapInPandas(explode, schema="term string, docid long")


def classify_naive_bayes(
    index: Index,
    text: str,
    labels: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    normalize: bool = False,
    stopwords=ENGLISH_STOP_WORDS,
) -> DataFrame:
    """SimpleNaiveBayesClassifier analog (classification/src/java/org/apache/
    lucene/classification/SimpleNaiveBayesClassifier.java:49) — per class c:

        score(c) = ln(docFreq(c)) - ln(docsWithClass)                 [log prior]
                 + sum_w  ln( (hits(w,c) + 1)
                              / (avgUniqueTermsPerDoc*docFreq(c) + docsWithClass) )

    summed over EVERY analyzed token occurrence w of ``text`` (duplicates
    count, mirroring the reference's loop over tokenizedText), where
    hits(w,c) = #docs of class c containing w (getWordFreqForClass) and
    avgUniqueTermsPerDoc = sumDocFreq/docCount (getTextTermFreqForClass).
    ``normalize=True`` applies the reference's log-sum-exp softmax
    (normClassificationResults) so scores form a 0-1 distribution.

    Distributed shape: one pruned postings scan for the query's terms + one
    join against the (doc, label) table; everything that reaches the driver
    is O(#classes x #distinct query terms) count rows — no per-class search
    jobs, no full-corpus collect.

    ``labels`` must be keyed by the index's GLOBAL docIDs (same contract as
    :func:`classify_knn`); if your label table is keyed by url, join it
    through ``index.docs`` (docid, url) first.

    Returns (label, score) for every class, ordered score desc, label asc.
    """
    spark = labels.sparkSession
    tokens = analyze(text, stopwords)
    lab = labels.filter(F.col(label_col).isNotNull()).select(
        F.col(id_col).alias("docid"), F.col(label_col).alias("label")
    )
    cls_pd = (
        lab.groupBy("label").agg(F.count(F.lit(1)).alias("dwc")).toPandas()
    )
    if len(cls_pd) == 0 or not tokens:
        return spark.createDataFrame([], "label string, score double")
    docs_with_class = int(cls_pd["dwc"].sum())
    # avg # of unique terms per doc: sumDocFreq / docCount over the TEXT
    # field only — on a multi-field index the shared termdict also holds
    # namespaced "field:term" rows, which belong to other fields'
    # statistics (the reference reads per-field Terms.getSumDocFreq for
    # the text field alone)
    sum_doc_freq = int(
        index.termdict.filter(~F.col("term").contains(":"))
        .agg(F.sum("df")).collect()[0][0]
    )
    avg_unique = sum_doc_freq / float(index.doc_count)

    distinct_terms = sorted(set(tokens))
    tok_counts = {t: tokens.count(t) for t in distinct_terms}
    hits_pd = (
        _term_docids(index, distinct_terms)
        .join(lab, "docid")
        .groupBy("term", "label")
        .agg(F.count(F.lit(1)).alias("hits"))
        .toPandas()
    )
    hits = {
        (r.term, r.label): int(r.hits) for r in hits_pd.itertuples(index=False)
    }
    out = []
    for r in cls_pd.itertuples(index=False):
        dwc = int(r.dwc)
        score = math.log(dwc) - math.log(docs_with_class)
        den = avg_unique * dwc + docs_with_class
        for t in distinct_terms:
            num = hits.get((t, r.label), 0) + 1
            score += tok_counts[t] * math.log(num / den)
        out.append((r.label, score))
    if normalize:
        # log-sum-exp softmax (normClassificationResults)
        smax = max(s for _, s in out)
        loga = smax + math.log(sum(math.exp(s - smax) for _, s in out))
        out = [(lb, math.exp(s - loga)) for lb, s in out]
    out.sort(key=lambda p: (-p[1], p[0]))
    return spark.createDataFrame(out, "label string, score double")
