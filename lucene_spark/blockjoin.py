"""ToParentBlockJoinQuery analog — nested-document (parent/child) search.

Reference: lucene/join ToParentBlockJoinQuery.java: documents are indexed in
blocks [child..., child, parent] (IndexWriter.addDocuments keeps a block in
one segment, contiguous docids); a parent hit's score aggregates its
children's scores per ScoreMode (join/ScoreMode.java: None/Avg/Max/Total/Min;
accumulation in double, float cast at the end —
ToParentBlockJoinQuery.java:352-394), and a child that matches the parent
filter itself is an illegal block (":381 Child query must not match same
docs with parent filter").

Spark shape: Lucene guarantees a block never spans a segment (addDocuments
is atomic per DWPT); the docID-range segments here inherit that contract
when ``seg_size`` is a multiple of the block stride (or blocks are packed by
the loader).  The join is therefore segment-local: child hits and parent
docids cogroup by segment and the parent of a child is one searchsorted —
no global shuffle, no broadcast of the parent set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCORE_MODES = ("none", "avg", "max", "total", "min")


def block_join_parents(
    index,
    child_query,
    parents: DataFrame,
    score_mode: str = "avg",
    k: int = 10,
    children: DataFrame | None = None,
    precision: str = "lucene",
) -> pd.DataFrame:
    """Top-k parent docs for a child query.

    ``parents``: DataFrame with a ``docid`` column — the BitSetProducer
    parent filter.  A child's parent is the FIRST parent docid greater than
    the child docid (ParentApproximation, ToParentBlockJoinQuery.java:300-318).
    ``children``: optional docid DataFrame restricting child hits (the role
    the child query's field restriction plays in Lucene); child hits on
    parent docids raise, per the reference contract.

    Returns a pandas frame (parent_docid, score, n_children) sorted
    (score desc, docid asc), cut to k by a Spark TakeOrderedAndProject —
    k rows reach the driver.
    """
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    from .search import score_docs

    hits = score_docs(index, child_query, precision=precision)
    if children is not None:
        hits = hits.join(children.select("docid"), "docid", "left_semi")
    seg_size = index.seg_size
    hits = hits.withColumn("seg", (F.col("docid") / F.lit(seg_size)).cast("long"))
    pseg = parents.select(
        F.col("docid").alias("pdocid"),
        (F.col("docid") / F.lit(seg_size)).cast("long").alias("seg"),
    )
    mode = score_mode
    f32 = precision == "lucene"

    def join_seg(key, hit_pdf: pd.DataFrame, par_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "parent_docid": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
            "n_children": pd.Series(dtype="int64"),
        })
        if len(hit_pdf) == 0 or len(par_pdf) == 0:
            return empty
        c = hit_pdf["docid"].to_numpy(dtype=np.int64)
        s = hit_pdf["score"].to_numpy(dtype=np.float64)
        order = np.argsort(c)
        c, s = c[order], s[order]
        p = np.sort(par_pdf["pdocid"].to_numpy(dtype=np.int64))
        bad = c[np.isin(c, p, assume_unique=False)]
        if len(bad):
            raise ValueError(
                "Child query must not match same docs with parent filter "
                f"(docid={int(bad[0])}) — combine them as must clauses to "
                "find a problem doc (ToParentBlockJoinQuery.java:381)"
            )
        pi = np.searchsorted(p, c, side="right")
        ok = pi < len(p)
        c, s, pi = c[ok], s[ok], pi[ok]
        if len(c) == 0:
            return empty
        parent = p[pi]
        uparents, inverse, counts = np.unique(
            parent, return_inverse=True, return_counts=True
        )
        if mode == "none":
            score = np.zeros(len(uparents), dtype=np.float64)
        elif mode in ("total", "avg"):
            score = np.zeros(len(uparents), dtype=np.float64)
            np.add.at(score, inverse, s)
            if mode == "avg":
                score = score / counts
        elif mode == "max":
            score = np.full(len(uparents), -np.inf)
            np.maximum.at(score, inverse, s)
        else:  # min
            score = np.full(len(uparents), np.inf)
            np.minimum.at(score, inverse, s)
        if f32:
            score = score.astype(np.float32).astype(np.float64)
        return pd.DataFrame({
            "parent_docid": uparents, "score": score,
            "n_children": counts.astype(np.int64),
        })

    out = (
        hits.groupBy("seg")
        .cogroup(pseg.groupBy("seg"))
        .applyInPandas(join_seg, schema="parent_docid long, score double, n_children long")
        .orderBy(F.col("score").desc(), F.col("parent_docid").asc())
        .limit(k)
        .toPandas()
    )
    return out


def block_join_children(
    index,
    parent_query,
    parents: DataFrame,
    k: int = 10,
    filter_to_parents: bool = False,
    precision: str = "lucene",
) -> pd.DataFrame:
    """ToChildBlockJoinQuery analog — the parent→child direction
    (join/ToChildBlockJoinQuery.java:43-260): every parent hit propagates
    its score to ALL its children, the docids strictly between the previous
    parent-filter bit and the parent (blocks are [child..., parent];
    ``childDoc = 1 + parentBits.prevSetBit(parentDoc - 1)`` up to
    ``parentDoc - 1``).  A parent-query hit NOT in the parent filter is an
    illegal query (validateParentDoc, :266-272 INVALID_QUERY_MESSAGE) —
    pass ``filter_to_parents=True`` to apply the reference's suggested
    "+parentQuery +parentFilter" must-clause composition instead (a FILTER
    clause, so scores are unchanged).

    Same segment-local cogroup shape as :func:`block_join_parents`: blocks
    never span docID-range segments, so child expansion is per-segment
    numpy; k rows reach the driver.  → pandas (child_docid, parent_docid,
    score) sorted (score desc, child asc) cut to k.
    """
    from .search import score_docs

    hits = score_docs(index, parent_query, precision=precision)
    if filter_to_parents:
        hits = hits.join(parents.select("docid"), "docid", "left_semi")
    seg_size = index.seg_size
    hits = hits.withColumn("seg", (F.col("docid") / F.lit(seg_size)).cast("long"))
    pseg = parents.select(
        F.col("docid").alias("pdocid"),
        (F.col("docid") / F.lit(seg_size)).cast("long").alias("seg"),
    )

    def join_seg(key, hit_pdf: pd.DataFrame, par_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "child_docid": pd.Series(dtype="int64"),
            "parent_docid": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        })
        if len(hit_pdf) == 0 or len(par_pdf) == 0:
            return empty
        seg_start = int(key[0]) * seg_size
        hp = hit_pdf["docid"].to_numpy(dtype=np.int64)
        hs = hit_pdf["score"].to_numpy(dtype=np.float64)
        order = np.argsort(hp)
        hp, hs = hp[order], hs[order]
        p = np.sort(par_pdf["pdocid"].to_numpy(dtype=np.int64))
        bad = hp[~np.isin(hp, p)]
        if len(bad):
            raise ValueError(
                "Parent query must not match any docs besides parent "
                "filter. Combine them as must (+) and must-not (-) clauses "
                f"to find a problem doc. docID={int(bad[0])} "
                "(ToChildBlockJoinQuery.java:47-50)"
            )
        # first child of parent P = 1 + prevSetBit(P - 1); no previous
        # parent in the leaf -> leaf start (prevSetBit returns -1)
        pi = np.searchsorted(p, hp, side="left")
        first = np.where(pi > 0, p[np.maximum(pi - 1, 0)] + 1, seg_start)
        n_children = hp - first
        keep = n_children > 0  # degenerate parent with no children: skip
        hp, hs, first, n_children = hp[keep], hs[keep], first[keep], n_children[keep]
        if len(hp) == 0:
            return empty
        total = int(n_children.sum())
        news = np.cumsum(n_children) - n_children
        child = (np.arange(total, dtype=np.int64)
                 - np.repeat(news, n_children) + np.repeat(first, n_children))
        return pd.DataFrame({
            "child_docid": child,
            "parent_docid": np.repeat(hp, n_children),
            "score": np.repeat(hs, n_children),
        })

    return (
        hits.groupBy("seg")
        .cogroup(pseg.groupBy("seg"))
        .applyInPandas(
            join_seg, schema="child_docid long, parent_docid long, score double"
        )
        .orderBy(F.col("score").desc(), F.col("child_docid").asc())
        .limit(k)
        .toPandas()
    )


def parent_children(
    index,
    child_query,
    parents: DataFrame,
    parent_docid: int,
    k: int = 10,
    precision: str = "lucene",
) -> pd.DataFrame:
    """ParentChildrenBlockJoinQuery analog (join/ParentChildrenBlockJoin
    Query.java:40-180): the matching child documents of ONE specific parent
    — child-query hits whose docid lies in [firstChild, parentDocId), where
    firstChild = prevSetBit(parent - 1) + 1 within the parent's segment
    (:130-134; the per-leaf bitset floors at the segment start).  Scores
    are the child query's own scores.

    Scale shape: the reference short-circuits every leaf but the parent's
    (:115-118 ``context.ord != readerIndex``); here the single docID-range
    segment is pruned BEFORE postings decode via ``score_docs(segs=[...])``,
    so exactly one segment's postings are scanned no matter the corpus
    size.  Returns pandas (child_docid, score) sorted (score desc, docid
    asc) cut to k — k rows reach the driver.

    Early exits mirror the reference: a parent at its segment start has no
    children (:124-128 ``localParentDocId == 0``), and a parent whose
    previous parent is adjacent has none either (:135-137).
    """
    from .search import score_docs

    empty = pd.DataFrame({
        "child_docid": pd.Series(dtype="int64"),
        "score": pd.Series(dtype="float64"),
    })
    seg_size = index.seg_size
    seg = int(parent_docid) // seg_size
    seg_start = seg * seg_size
    if parent_docid == seg_start:
        return empty
    prev = (
        parents.filter(
            (F.col("docid") >= seg_start) & (F.col("docid") < parent_docid)
        ).agg(F.max("docid")).collect()[0][0]
    )
    first_child = int(prev) + 1 if prev is not None else seg_start
    if first_child == parent_docid:
        return empty
    hits = score_docs(index, child_query, precision=precision, segs=[seg])
    return (
        hits.filter(
            (F.col("docid") >= first_child) & (F.col("docid") < parent_docid)
        )
        .select(F.col("docid").alias("child_docid"), "score")
        .orderBy(F.col("score").desc(), F.col("child_docid").asc())
        .limit(k)
        .toPandas()
    )
