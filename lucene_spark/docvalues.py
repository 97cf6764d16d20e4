"""Numeric doc-values updates — IndexWriter.updateNumericDocValue analog.

Reference:
- ``index/IndexWriter.java`` ``updateNumericDocValue(Term, String field,
  long value)`` — every document matching the term gets the new value for
  the field WITHOUT reindexing the document.
- ``index/NumericDocValuesFieldUpdates.java`` / ``BufferedUpdatesStream``
  — updates buffer as (docid → value) packets stamped with a generation;
  readers resolve the LATEST generation per doc on top of the base
  doc-values file (the ``.dvm``/``.dvd`` gen-suffixed sidecars).

Spark analog: the base doc values are any (docid, value) DataFrame (a
column of the docs table, or a standalone side table the function-scoring
path joins by docid); updates accumulate as small (docid, value, gen)
frames.  ``resolve()`` applies latest-gen-wins read-through: the window
shuffle is UPDATE-sized, never corpus-sized, and the final join against
the base is a broadcast when updates are small — the same asymmetry that
makes Lucene's DV updates cheap compared to reindexing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .index import Index


class NumericDocValues:
    """A numeric doc-values field with buffered updates (latest gen wins)."""

    def __init__(self, base: DataFrame, id_col: str = "docid",
                 val_col: str = "value"):
        self.base = base.select(
            F.col(id_col).alias("docid"), F.col(val_col).alias("value")
        )
        self._updates: list[DataFrame] = []
        self._gen = 0

    def update_by_term(self, index: Index, term: str, value: int) -> int:
        """IndexWriter.updateNumericDocValue(Term, field, value): stamp a
        new generation onto every doc matching ``term``.  Returns the
        generation number (BufferedUpdatesStream's packet gen)."""
        from .search import match_any_docs

        self._gen += 1
        docs = match_any_docs(index, [term]).select("docid")
        self._updates.append(
            docs.withColumn("value", F.lit(int(value)).cast("long"))
            .withColumn("gen", F.lit(self._gen))
        )
        return self._gen

    def update_docs(self, docids: DataFrame, value: int) -> int:
        """Update an explicit docid set (the updateDocValues-by-query shape)."""
        self._gen += 1
        self._updates.append(
            docids.select("docid")
            .withColumn("value", F.lit(int(value)).cast("long"))
            .withColumn("gen", F.lit(self._gen))
        )
        return self._gen

    def resolve(self) -> DataFrame:
        """Read-through view (docid, value): base overlaid with the latest
        generation per doc — DocValuesFieldUpdates.Iterator merge order."""
        if not self._updates:
            return self.base
        ups = self._updates[0]
        for u in self._updates[1:]:
            ups = ups.unionByName(u)
        latest = (
            ups.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("docid").orderBy(F.col("gen").desc())
                ),
            )
            .filter(F.col("_rn") == 1)
            .select("docid", F.col("value").alias("_newv"))
        )
        return (
            self.base.join(F.broadcast(latest), "docid", "left")
            .select(
                "docid",
                F.coalesce(F.col("_newv"), F.col("value")).alias("value"),
            )
        )

    def materialize(self) -> "NumericDocValues":
        """Fold all update generations into a new base (the merge that
        rewrites gen'd .dvd sidecars into the segment at forceMerge)."""
        out = NumericDocValues(self.resolve())
        return out


def doc_values_stats(
    dv: DataFrame,
    match: DataFrame | None = None,
    id_col: str = "docid",
    val_col: str = "value",
) -> DataFrame:
    """DocValuesStats collector analog (misc/search/DocValuesStats.java:
    29-141): ONE row of (count, missing, vmin, vmax, vsum, mean, variance,
    stdev) over the matching documents' values — ``missing`` counts matched
    docs with no value (:66-73), ``variance`` is the population variance
    (variance/count, :130-132), stdev its square root.  ``match``: optional
    docid frame (a query's match set, e.g. from ``score_docs`` or a cached
    filter); None = the whole table.

    Pure Catalyst partial aggregation — one narrow scan, a scalar to the
    driver."""
    base = dv.select(F.col(id_col).alias("docid"), F.col(val_col).alias("v"))
    if match is not None:
        base = match.select("docid").distinct().join(base, "docid", "left")
    return base.agg(
        F.count("v").alias("count"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("long").alias("missing"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum("v").alias("vsum"),
        F.avg("v").alias("mean"),
        F.var_pop("v").alias("variance"),
        F.stddev_pop("v").alias("stdev"),
    )


def sorted_doc_values_stats(
    dv: DataFrame,
    match: DataFrame | None = None,
    id_col: str = "docid",
    val_col: str = "value",
) -> DataFrame:
    """SortedDocValuesStats analog (misc/search/DocValuesStats.java:
    213-260, SortedDocValuesStats): ONE row of (count, missing, vmin,
    vmax) over the matching docs' STRING values — min/max by BytesRef
    order (:239-249 compareTo accumulation); ``missing`` counts matched
    docs whose value is null.  Same single partial-aggregation shape as
    the numeric collector."""
    rows = dv
    if match is not None:
        rows = rows.join(match.select(id_col), id_col, "left_semi")
    v = F.col(val_col)
    return rows.agg(
        F.count(v).alias("count"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("long").alias("missing"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )


def sorted_numeric_sort_key(arr_col, selector: str = "min"):
    """SortedNumericSelector.wrap (search/SortedNumericSelector.java:42-73):
    reduce a multi-valued numeric column to the single value the
    SortedNumericSortField compares — MIN/MAX over the sorted values;
    sandbox selectors MIDDLE_MIN/MIDDLE_MAX take the lower/upper middle
    ((n−1)/2 and n/2 of the ascending order).  Pure Catalyst — array_min/
    array_max/element_at on a sorted copy, no UDF."""
    c = F.col(arr_col) if isinstance(arr_col, str) else arr_col
    if selector == "min":
        return F.array_min(c)
    if selector == "max":
        return F.array_max(c)
    if selector in ("middle_min", "middle_max"):
        s = F.array_sort(c)
        n = F.size(s)
        idx = F.floor((n - F.lit(1)) / 2) if selector == "middle_min" \
            else F.floor(n / 2)
        return F.element_at(s, (idx + 1).cast("int"))
    raise ValueError(f"unknown selector {selector!r}")


def sorted_set_sort_key(arr_col, selector: str = "min"):
    """SortedSetSelector.wrap (search/SortedSetSelector.java:49-77): the
    ordinal-space MIN/MAX/MIDDLE_MIN/MIDDLE_MAX of a multi-valued string
    column — BytesRef order == Spark string order, so the same
    sorted-array selection applies."""
    return sorted_numeric_sort_key(arr_col, selector)
