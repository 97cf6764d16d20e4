"""Taxonomy facets: hierarchical counts, top-children, drill-down/sideways.

Reference: lucene/facet taxonomy — FacetsCollector gathers the query's match
set (facet/src/java/org/apache/lucene/facet/FacetsCollector.java:50),
FastTaxonomyFacetCounts accumulates per-ordinal counts over it
(facet/taxonomy/FastTaxonomyFacetCounts.java:39), getTopChildren returns the
top-N child labels under a dim/path ordered count desc
(facet/taxonomy/IntTaxonomyFacets.java:165-245; ties break toward the
smaller ordinal — ordinals are taxonomy insertion order, which Spark has no
analog of, so this engine breaks ties by label asc, documented divergence),
and DrillDownQuery conjoins path-prefix filters onto the base query
(facet/DrillDownQuery.java:42).

Spark-first design: a facet path is an ``array<string>`` column; every
operator here is pure Catalyst (slice/element_at/size + one groupBy), so at
100 TB the counts are a map-side-combined aggregation over the match set —
no taxonomy index is needed because Parquet dictionary encoding + the
groupBy play the role of the ordinal map.  The match set arrives as a
DataFrame (docid) — compose with search.match_any_docs / score_docs exactly
like FacetsCollector composes with any query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_path(df: DataFrame, path_col: str | list) -> DataFrame:
    """Accept either an existing array<string> column name or a list of
    level column names to assemble into one (FacetField dim/components)."""
    if isinstance(path_col, str):
        return df.withColumn("__path", F.col(path_col))
    return df.withColumn("__path", F.array(*[F.col(c).cast("string") for c in path_col]))


def top_children(
    matches: DataFrame,
    path_col: str | list,
    path: list[str] | None = None,
    topn: int = 10,
) -> DataFrame:
    """getTopChildren analog (IntTaxonomyFacets.java:165-245): counts of the
    child labels directly under ``path`` (``[]``/None = the dim root), over
    the rows of ``matches``, ordered count desc then label asc, cut to topn.

    Returns (label string, count long)."""
    path = path or []
    depth = len(path)
    df = _with_path(matches, path_col)
    if depth:
        prefix = F.array(*[F.lit(p) for p in path])
        df = df.filter(F.slice(F.col("__path"), 1, depth) == prefix)
    df = df.filter(F.size("__path") > depth)
    return (
        df.groupBy(F.element_at("__path", depth + 1).alias("label"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("label").asc())
        .limit(topn)
    )


def all_counts(matches: DataFrame, path_col: str | list, max_depth: int | None = None) -> DataFrame:
    """Counts for EVERY taxonomy node (all path prefixes) in one pass — the
    whole-taxonomy rollup (getAllDims / getTopChildren over each node).
    Prefix explosion is pure Catalyst: posexplode marks each depth, slice
    rebuilds the prefix.  Returns (depth int, path array<string>, count long)
    ordered depth asc, count desc, path asc."""
    df = _with_path(matches, path_col)
    if max_depth is not None:
        df = df.withColumn("__path", F.slice("__path", 1, max_depth))
    exploded = df.select(
        F.posexplode("__path").alias("__pos", "__label"), "__path"
    ).select((F.col("__pos") + 1).alias("depth"), F.slice("__path", 1, F.col("__pos") + 1).alias("path"))
    return (
        exploded.groupBy("depth", "path")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("depth").asc(), F.col("count").desc(), F.col("path").asc())
    )


def drill_down(df: DataFrame, path_col: str | list, path: list[str]) -> DataFrame:
    """DrillDownQuery analog (facet/DrillDownQuery.java:42): restrict rows to
    those whose facet path starts with ``path`` (a FILTER conjunction — no
    effect on scores, exactly like DrillDownQuery's FILTER occur)."""
    out = _with_path(df, path_col)
    prefix = F.array(*[F.lit(p) for p in path])
    return out.filter(F.slice(F.col("__path"), 1, len(path)) == prefix).drop("__path")


def drill_sideways(
    matches: DataFrame,
    path_col: str | list,
    path: list[str],
    topn: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """DrillSideways analog (facet/DrillSideways.java:56): returns
    (drill-down rows, sibling counts) — the sibling facet counts are computed
    over the match set WITHOUT the last drill-down restriction (but with all
    parent restrictions), so the UI can show "what else is at this level".
    """
    parent = path[:-1]
    scoped = drill_down(matches, path_col, parent) if parent else matches
    return (
        drill_down(matches, path_col, path),
        top_children(scoped, path_col, parent, topn=topn),
    )


def ssdv_facet_counts(
    matches: DataFrame,
    values_col: str,
    topn: int = 10,
) -> DataFrame:
    """SortedSetDocValuesFacetCounts analog (facet/sortedset/
    SortedSetDocValuesFacetCounts.java:57-214): facet over a MULTI-VALUED
    flat string field — each matching doc contributes ONE count per
    DISTINCT value it holds (SORTED_SET semantics: the per-doc ordinal set
    is deduplicated), no taxonomy index involved.  ``values_col`` is an
    ``array<string>`` column on the match rows; returns (label, count)
    ordered count desc then label asc (the reference breaks ties toward
    the smaller ordinal = lexicographic ord order, which IS label asc
    here), cut to topn.

    Spark shape: explode(array_distinct(...)) + one map-side-combined
    groupBy — the dictionary-encoded parquet column plays the ordinal
    map's role, so the count is a single narrow aggregation at any scale.
    """
    return (
        matches.select(
            F.explode(F.array_distinct(F.col(values_col))).alias("label")
        )
        .where(F.col("label").isNotNull())
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("label").asc())
        .limit(topn)
    )


def sum_associations(
    matches: DataFrame,
    path_col: str | list,
    value_col: str,
    path: list[str] | None = None,
    topn: int = 10,
    float_assoc: bool = False,
) -> DataFrame:
    """TaxonomyFacetSumIntAssociations / TaxonomyFacetSumFloatAssociations
    (facet/taxonomy/TaxonomyFacetSumIntAssociations.java:33,
    TaxonomyFacetSumFloatAssociations.java:33): per child label directly
    under ``path``, the SUM of each matching doc's association value —
    ordered sum desc then label asc, cut to topn.

    ``float_assoc`` selects the float accumulator (sum double) vs the int
    one (sum long).  Same map-side-combined one-groupBy shape as
    ``top_children``."""
    path = path or []
    depth = len(path)
    df = _with_path(matches, path_col)
    if depth:
        prefix = F.array(*[F.lit(p) for p in path])
        df = df.filter(F.slice(F.col("__path"), 1, depth) == prefix)
    df = df.filter(F.size("__path") > depth)
    val = F.col(value_col).cast("double" if float_assoc else "long")
    return (
        df.groupBy(F.element_at("__path", depth + 1).alias("label"))
        .agg(F.sum(val).alias("sum"))
        .orderBy(F.col("sum").desc(), F.col("label").asc())
        .limit(topn)
    )


def long_value_facet_counts(
    matches: DataFrame,
    value_col,
    topn: int | None = None,
) -> DataFrame:
    """LongValueFacetCounts (facet/LongValueFacetCounts.java:41-60): a
    count per DISTINCT long value of ``value_col`` among the matching docs
    (the all-values form, getAllChildrenSortByValue — ordered by value
    asc; pass ``topn`` for getTopChildren ordering: count desc, value
    asc).  ``value_col`` may be any numeric Column expression — the
    LongValuesSource analog.  One map-side-combined aggregation."""
    out = (
        matches.select(F.col(value_col).cast("long").alias("value")
                       if isinstance(value_col, str)
                       else value_col.cast("long").alias("value"))
        .where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if topn is not None:
        return out.orderBy(F.col("count").desc(), F.col("value").asc()).limit(topn)
    return out.orderBy(F.col("value").asc())


def sampled_facet_counts(
    matches: DataFrame,
    label_col: str,
    sample_rate: float,
    seed: int = 7,
    id_col: str = "docid",
) -> DataFrame:
    """RandomSamplingFacetsCollector analog (facet/
    RandomSamplingFacetsCollector.java:33-60: facet over a bernoulli
    sample of the hit set, then amortize counts by 1/rate): here the
    sampler is DETERMINISTIC — a doc is sampled when the first 8 hex chars
    of md5(docid:seed) fall below rate * 2^32 — so results are exactly
    reproducible across engines (the reference uses XORShift with a
    per-run seed; determinism replaces the seed contract, the sampling
    distribution is the same uniform-hash bernoulli).  Returns (label,
    sampled count, amortized count) — amortized = sampled/rate floor-cast,
    mirroring the reference's integer amortization (:156-170).

    At scale this is the cheap-facets path: the md5 predicate prunes the
    hit set BEFORE the aggregation shuffle, so the exchange carries only
    the sample."""
    threshold = int(sample_rate * 4294967296.0)
    key = F.conv(F.substring(F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    ), 1, 8), 16, 10).cast("long")
    return (
        matches.filter(key < threshold)
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("sampled"))
        .withColumn(
            "amortized",
            F.floor(F.col("sampled") / F.lit(sample_rate)).cast("long"),
        )
        .orderBy(F.col("sampled").desc(), F.col("label").asc())
    )


def facet_query(
    df: DataFrame,
    path_col: str | list,
    paths: list[list[str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """FacetQuery / MultiFacetQuery (facet/FacetQuery.java:28-44,
    MultiFacetQuery.java:30-49): the standalone-query form of drill-down —
    match docs whose facet path starts with ANY of the given dim paths
    (each path is one drill-down term; several = the disjunction
    MultiFacetQuery builds).  Constant score, sargable equality
    predicates."""
    if not paths:
        raise ValueError("at least one facet path required")
    dfp = _with_path(df, path_col)
    pred = None
    for p in paths:
        c = F.slice(F.col("__path"), 1, len(p)) == F.array(
            *[F.lit(x) for x in p])
        pred = c if pred is None else (pred | c)
    return dfp.filter(pred).select(id_col)


def sum_value_source(
    matches: DataFrame,
    path_col: str | list,
    value,
    path: list[str] | None = None,
    topn: int = 10,
) -> DataFrame:
    """TaxonomyFacetSumValueSource (facet/taxonomy/
    TaxonomyFacetSumValueSource.java:40-60): per child label under
    ``path``, the SUM over matching docs of an arbitrary per-doc
    DoubleValuesSource — here any Catalyst Column expression (field
    arithmetic, query scores joined in, ...).  Same one-groupBy shape as
    the association sums; ordered sum desc, label asc."""
    col = F.col(value) if isinstance(value, str) else value
    tagged = matches.withColumn("__vs", col.cast("double"))
    return sum_associations(tagged, path_col, "__vs", path=path, topn=topn,
                            float_assoc=True)
