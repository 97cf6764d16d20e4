"""FreeTextSuggester analog — an n-gram language model with stupid backoff.

Reference: lucene/suggest/src/java/org/apache/lucene/search/suggest/
analyzing/FreeTextSuggester.java:

- build (:214-347): analyze the corpus, shingle 1..grams token n-grams
  (ShingleFilter, separator 0x1e → here a space), weight = totalTermFreq;
  ``totTokens`` = Σ unigram counts (:318).
- lookup (:383-576): split the key into (context, trailing fragment) — a
  trailing separator means the fragment is empty; walk model orders HIGH to
  LOW; per order, completions are same-order n-grams extending
  ``context + fragment`` without crossing a separator (the TopNSearcher
  prunes separator arcs, :497-505); score = backoff · count / contextCount
  where contextCount is the context's own model count (totTokens for
  unigrams, :469-489) and backoff multiplies by ALPHA = 0.4 per order step
  (:125, :443-447, :570) — "stupid backoff" (Brants et al., EMNLP 2007,
  cited at :91); a completed LAST TOKEN already produced by a higher order
  is skipped (:507-529 ``seen``); final order value desc then key asc,
  top ``num`` (:578-596).

Spark shape: the model is ONE DataFrame (gram, n, cnt) built with the
engine analyzer + pure-Catalyst shingling (`filters.shingle_col` — no
Python in the corpus pass) and a single groupBy; it can be persisted as
parquet sorted by gram so lookups' prefix LIKEs prune via row-group
min/max stats (the FST analog, as for the term dictionary).  A lookup
touches only `num + |seen|` rows per order (TakeOrderedAndProject).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOP_WORDS, analyze, make_analyze_udf
from .filters import shingle_col

ALPHA = 0.4  # FreeTextSuggester.java:125


@dataclass
class FreeTextModel:
    grams: DataFrame  # (gram string, n int, cnt long)
    tot_tokens: int
    order: int
    stopwords: frozenset


def build_freetext(
    docs: DataFrame,
    text_col: str = "text",
    grams: int = 2,
    stopwords: frozenset = ENGLISH_STOP_WORDS,
) -> FreeTextModel:
    """Build the 1..grams n-gram model (FreeTextSuggester.build :214-347)."""
    if grams < 1:
        raise ValueError("grams must be >= 1")  # :186-188
    toks = docs.select(
        make_analyze_udf(stopwords)(F.col(text_col)).alias("ts")
    )
    parts = []
    for n in range(1, grams + 1):
        col = F.col("ts") if n == 1 else shingle_col("ts", n)
        parts.append(
            toks.select(F.explode(col).alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("n", F.lit(n))
        )
    model = parts[0]
    for p in parts[1:]:
        model = model.unionByName(p)
    tot = model.filter(F.col("n") == 1).agg(F.sum("cnt")).collect()[0][0]
    return FreeTextModel(
        grams=model.select("gram", "n", "cnt"),
        tot_tokens=int(tot or 0),
        order=grams,
        stopwords=stopwords,
    )


def freetext_lookup(
    model: FreeTextModel, key: str, num: int = 10
) -> DataFrame:
    """FreeTextSuggester.lookup (:383-596): returns (gram, score) rows —
    the full completed n-gram text and the stupid-backoff score — ordered
    score desc then gram asc, top ``num``."""
    spark: SparkSession = model.grams.sparkSession
    schema = "gram string, score double"
    ends_complete = key != key.rstrip()
    tokens = analyze(key, model.stopwords)
    fragment = "" if ends_complete else (tokens[-1] if tokens else "")
    context = tokens if ends_complete else tokens[:-1]

    backoff = 1.0
    seen: set[str] = set()
    results: list[tuple[str, float]] = []
    for gram in range(model.order - 1, -1, -1):
        ctx = context[len(context) - gram:] if gram > 0 else []
        if gram > len(context):
            # input didn't have enough tokens for this order (:411-415)
            continue
        if gram == 0 and fragment == "" and key:
            # don't make unigram predictions from empty string (:411-413)
            continue
        prefix = " ".join(ctx + [fragment]) if fragment else " ".join(ctx) + " "
        if gram == 0 and fragment:
            prefix = fragment
        # same-order rows extending the prefix: the fixed separator count
        # of an (gram+1)-gram plays the TopNSearcher's separator-arc prune
        cand = model.grams.filter(
            (F.col("n") == gram + 1) & F.col("gram").startswith(prefix)
        )
        top = (
            cand.orderBy(F.col("cnt").desc(), F.col("gram"))
            .limit(num + len(seen))
            .collect()
        )
        if not top:
            backoff *= ALPHA  # model never saw this context (:443-447)
            continue
        if gram > 0:
            ctx_str = " ".join(ctx)
            row = (
                model.grams.filter(
                    (F.col("n") == gram) & (F.col("gram") == ctx_str)
                ).collect()
            )
            context_count = int(row[0]["cnt"]) if row else model.tot_tokens
        else:
            context_count = model.tot_tokens
        accepted = 0
        for r in top:
            last_token = r["gram"].rsplit(" ", 1)[-1]
            if last_token in seen:
                continue  # higher-order model already predicted it (:520)
            seen.add(last_token)
            results.append(
                (r["gram"], backoff * float(r["cnt"]) / context_count)
            )
            accepted += 1
            if accepted >= num:
                break
        backoff *= ALPHA  # :570
    results.sort(key=lambda t: (-t[1], t[0]))  # :578-591
    return spark.createDataFrame(results[:num] or [], schema)
