"""Search-quality evaluation — the benchmark ``quality`` package re-expressed
as distributed DataFrame aggregation.

Reference:
  benchmark/src/java/org/apache/lucene/benchmark/quality/QualityStats.java
    (addResult:79-101 — precision points, the MRR top-5 quirk, recall,
     average precision at recall points; getPrecisionAt:106-117 — the
     past-end extension numPoints*pAt[numPoints]/n; average:169-209)
  benchmark/src/java/org/apache/lucene/benchmark/quality/trec/TrecJudge.java
    (qrels "qid 0 docName rel" lines; maxRecall = |relevant docs|)
  benchmark/src/java/org/apache/lucene/benchmark/quality/QualityBenchmark.java
    (per-query stats then arithmetic average across queries)

Spark-first shape: one (qid, rank)-windowed cumulative sum over the ranked
results joined against the judgment pairs, then one groupBy(qid) with
conditional aggregates — no per-row Python, no driver-side loops; the
judgment join broadcasts when the qrels side is small (the usual case).

Exactness: alongside the float stats, every per-query row carries integer
intermediates (``good_at`` counts and the AvP numerator scaled by
lcm(1..20) = 232792560) so downstream comparisons can be done in exact
integer arithmetic regardless of float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Number of precision points kept, as in QualityStats.MAX_POINTS.
MAX_POINTS = 20

#: lcm(1..20) — every per-rank precision g/r with r <= 20 is an integer
#: multiple of 1/LCM20, so AvP numerators sum exactly in int64.
LCM20 = 232792560


def trec_judgments(spark: SparkSession, lines) -> DataFrame:
    """TrecJudge analog: parse qrels lines ``qid 0 docName rel`` into a
    (qid, doc) DataFrame of RELEVANT pairs (rel > 0), the judgment input of
    :func:`quality_stats` (trec/TrecJudge.java:54-75)."""
    rows = []
    for ln in lines:
        parts = ln.split()
        if len(parts) != 4:
            raise ValueError(f"bad qrels line: {ln!r}")
        qid, _zero, doc, rel = parts
        if int(rel) > 0:
            rows.append((qid, doc))
    return spark.createDataFrame(rows or [("", "")], "qid string, doc string") \
        .filter(F.col("qid") != "") if not rows else \
        spark.createDataFrame(rows, "qid string, doc string")


def quality_stats(
    results: DataFrame,
    judgments: DataFrame,
    max_points: int = MAX_POINTS,
    mrr_cut: int = 5,
) -> DataFrame:
    """Per-query QualityStats rows.

    ``results``: (qid, doc, rank) — 1-based contiguous ranks per qid (the
    submitted run).  ``qid``/``doc`` may be any equatable type.
    ``judgments``: (qid, doc) relevant pairs (TrecJudge.isRelevant).

    Output, one row per qid appearing in ``results``:
      num_points   — results returned (QualityStats.numPoints)
      num_good     — relevant results returned
      max_good     — total relevant docs for the qid (TrecJudge.maxRecall)
      first_rel_rank — rank of the first relevant hit (null if none)
      mrr          — 1/first_rel_rank, but ONLY when first_rel_rank <=
                     ``mrr_cut`` (QualityStats.addResult:86-88 — the
                     reference sets MRR only "within 5 top scores")
      avp          — sum of precision at each relevant rank / max_good
                     (getAvp; 0 when max_good = 0)
      avp_num      — the same numerator as an EXACT integer, scaled by
                     LCM20: sum(cum_good * LCM20/rank) over relevant ranks
      recall       — num_good / max_good; when max_good = 0 the reference
                     falls back to the running precision (addResult:99)
      good_at      — array[1..max_points] of cumulative relevant counts,
                     clamped at the list end (so good_at[n] = num_good for
                     n > num_points, matching getPrecisionAt's extension)
      p_at         — array[1..max_points] of precision@n = good_at[n]/n
    """
    rel = judgments.select(
        F.col("qid").alias("qid"), F.col("doc").alias("doc"),
        F.lit(1).alias("rel"),
    ).dropDuplicates(["qid", "doc"])
    max_good = rel.groupBy("qid").agg(F.count(F.lit(1)).alias("max_good"))

    w = Window.partitionBy("qid").orderBy("rank")
    scored = (
        results.join(F.broadcast(rel), ["qid", "doc"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .withColumn("cum_good", F.sum("rel").over(w))
    )

    aggs = [
        F.max("rank").alias("num_points"),
        F.sum("rel").alias("num_good"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel_rank"),
        # exact integer AvP numerator: rank <= num_points <= whatever the
        # caller ranked; LCM20/rank is exact for rank <= 20, and relevant
        # hits past MAX_POINTS still contribute (the reference caps only
        # the pAt array, not pReleventSum) — for rank > 20 fall back to
        # float (documented; rankings evaluated here are top-<=20)
        F.sum(
            F.when(
                (F.col("rel") == 1) & (F.col("rank") <= 20),
                F.col("cum_good") * (F.lit(LCM20) / F.col("rank")).cast("long"),
            ).otherwise(0)
        ).cast("long").alias("avp_num"),
        F.sum(
            F.when(F.col("rel") == 1, F.col("cum_good") / F.col("rank"))
            .otherwise(0.0)
        ).alias("p_rel_sum"),
    ]
    for n in range(1, max_points + 1):
        aggs.append(
            F.max(F.when(F.col("rank") <= n, F.col("cum_good")))
            .alias(f"_g{n}")
        )

    per_q = (
        scored.groupBy("qid").agg(*aggs)
        .join(F.broadcast(max_good), "qid", "left")
        .withColumn("max_good", F.coalesce(F.col("max_good"), F.lit(0)))
    )

    good_at = F.array(*[
        F.coalesce(F.col(f"_g{n}"), F.lit(0)).cast("long")
        for n in range(1, max_points + 1)
    ])
    p_at = F.array(*[
        (F.coalesce(F.col(f"_g{n}"), F.lit(0)) / F.lit(float(n)))
        for n in range(1, max_points + 1)
    ])
    out = (
        per_q
        .withColumn("good_at", good_at)
        .withColumn("p_at", p_at)
        .withColumn(
            "mrr",
            F.when(
                F.col("first_rel_rank") <= mrr_cut,
                F.lit(1.0) / F.col("first_rel_rank"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "avp",
            F.when(F.col("max_good") > 0,
                   F.col("p_rel_sum") / F.col("max_good"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "recall",
            F.when(F.col("max_good") > 0,
                   F.col("num_good") / F.col("max_good"))
            .otherwise(F.col("num_good") / F.col("num_points")),
        )
    )
    return out.select(
        "qid", "num_points", "num_good", "max_good", "first_rel_rank",
        "mrr", "avp", "avp_num", "recall", "good_at", "p_at",
    )


def average_stats(per_query: DataFrame, max_points: int = MAX_POINTS) -> DataFrame:
    """QualityStats.average analog — arithmetic mean of every stat across
    queries (QualityStats.java:169-209 averages mrr/recall/pAt/avp and sums
    counters)."""
    aggs = [
        F.count(F.lit(1)).alias("n_queries"),
        F.avg("mrr").alias("mrr"),
        F.avg("avp").alias("avp"),
        F.avg("recall").alias("recall"),
        F.sum("num_points").alias("num_points"),
        F.sum("num_good").alias("num_good"),
        F.sum("max_good").alias("max_good"),
    ]
    for n in range(1, max_points + 1):
        aggs.append(
            F.avg(F.element_at("p_at", n)).alias(f"p_at_{n}")
        )
    return per_query.agg(*aggs)
