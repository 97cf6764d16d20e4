"""Incremental / near-real-time index maintenance via Structured Streaming.

Reference analog (SURVEY §2.6): Lucene's NRT story — new segments appended by
the writer, readers refresh to see them (index/DirectoryReader.java
openIfChanged, search/SearcherManager.java), background merges compact.

Spark mapping: a ``foreachBatch`` sink appends one *new segment generation*
per micro-batch — each batch's docs get docIDs above the current maxDoc
(batch = a DWPT flush), postings/norms rows are appended under fresh seg ids,
and stats/termdict are refreshed.  ``compact_index`` is the merge policy
analog: rebuilds appended mini-segments into uniform docID-range segments
(SegmentMerger.java:103-136 — here a sorted shuffle, Spark's native merge).

Queries over the live index see a point-in-time snapshot (parquet listing =
the segments_N commit analog).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOP_WORDS
from .index import (
    PARTIALS_SCHEMA,
    _docs_meta_pass,
    _fused_invert_pass,
    build_norms,
    merge_partials_stage,
    read_index,
    segment_rows_stage,
)


def _next_seg_base(spark: SparkSession, out_dir: str, seg_size: int) -> int:
    """First docID of the next fresh segment.

    Every micro-batch opens NEW segment(s) — a (term, seg) postings row is
    written by exactly one batch, exactly like each Lucene flush producing
    its own immutable segment files.  docIDs may therefore have gaps between
    batches (a partially-filled final segment); correctness never depends on
    density, only on docID uniqueness + global order.
    """
    import os

    if not os.path.isdir(f"{out_dir}/docs"):
        return 0
    max_doc = spark.read.parquet(f"{out_dir}/docs").agg(F.max("docid")).collect()[0][0]
    if max_doc is None:
        return 0
    return ((int(max_doc) // seg_size) + 1) * seg_size


def append_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    out_dir: str,
    seg_size: int,
    text_col: str = "text",
    key_col: str = "url",
    with_positions: bool = False,
    stopwords=ENGLISH_STOP_WORDS,
) -> int:
    """Index one micro-batch as new segment(s) appended after maxDoc.

    docIDs continue from the next fresh segment base in batch arrival order
    (Lucene's arrival-order docIDs, IndexingChain.java:583 — the batch is the
    arrival unit).  Returns the number of docs appended.  Uses the same
    packed-partials flush as the batch build.
    """
    max_doc = _next_seg_base(spark, out_dir, seg_size)

    # assign arrival-order ids within the batch (deterministic: sort by key)
    from pyspark.sql.window import Window

    n_batch = batch_df.count()
    if n_batch == 0:
        return 0
    # micro-batches are small (streaming); a single-partition window is the
    # honest arrival-order assignment here, unlike the batch build
    w = Window.orderBy(key_col)
    pages = batch_df.withColumn("docid", F.row_number().over(w) - 1 + F.lit(max_doc))

    key_type = batch_df.schema[key_col].dataType.simpleString()
    docs_meta = pages.select("docid", key_col, text_col).mapInPandas(
        _docs_meta_pass(None, text_col, key_col, stopwords),
        schema=f"docid long, url {key_type}, dl long, norm int",
    ).persist()
    partials = pages.select("docid", text_col).mapInPandas(
        _fused_invert_pass(None, text_col, seg_size, stopwords, with_positions),
        schema=PARTIALS_SCHEMA,
    )
    postings = merge_partials_stage(partials, seg_size)
    postings.sortWithinPartitions("term").write.mode("append").partitionBy("seg").parquet(
        f"{out_dir}/postings"
    )
    docs_meta.write.mode("append").parquet(f"{out_dir}/docs")
    build_norms(docs_meta, seg_size).write.mode("append").parquet(f"{out_dir}/norms")

    # refresh commit point (stats + termdict) — the segments_N publish analog
    full_docs = spark.read.parquet(f"{out_dir}/docs")
    n_docs = full_docs.count()
    sum_ttf = full_docs.agg(F.sum("dl")).collect()[0][0] or 0
    spark.read.parquet(f"{out_dir}/postings").groupBy("term").agg(
        F.sum("df_local").alias("df"), F.sum("cf_local").alias("cf")
    ).write.mode("overwrite").parquet(f"{out_dir}/termdict")
    spark.createDataFrame(
        [(n_docs, int(sum_ttf), seg_size)],
        "doc_count long, sum_total_term_freq long, seg_size long",
    ).write.mode("overwrite").parquet(f"{out_dir}/stats")
    docs_meta.unpersist()
    return n_batch


def start_indexing_stream(
    stream_df: DataFrame,
    out_dir: str,
    seg_size: int = 4096,
    checkpoint_dir: str | None = None,
    text_col: str = "text",
    key_col: str = "url",
    trigger_once: bool = False,
    with_positions: bool = False,
):
    """readStream → foreachBatch(append_batch) → live index directory."""
    spark = stream_df.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(spark, batch_df, out_dir, seg_size, text_col, key_col,
                     with_positions=with_positions)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir or f"{out_dir}/_stream_checkpoint"
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def refresh_reader(spark: SparkSession, out_dir: str):
    """SearcherManager.maybeRefresh analog: reopen the index at the current
    commit point (new parquet listing)."""
    return read_index(spark, out_dir)


def compact_index(spark: SparkSession, in_dir: str, out_dir: str, seg_size: int = 4096):
    """Merge-policy analog (SegmentMerger.java:103-136 / TieredMergePolicy):
    rebuild the appended mini-segments into dense docID-range segments.

    docIDs are remapped dense preserving global order (DocIDMerger.java:32
    docBase remapping); postings are decoded, remapped via a docid join, and
    regrouped by the new segmentation — the sorted shuffle IS the k-way merge.
    No re-tokenization: (term, docid, tf, dl) is fully recoverable from the
    segment rows + norms.
    """
    import numpy as np
    from pyspark import TaskContext

    from .index import _ranged_with_offsets
    from .kernel import TermPostings

    old = read_index(spark, in_dir)
    # dense rank over old docid — scalable form (range partition + offset
    # broadcast, same as index.assign_docids), NOT a global single-partition
    # window: compaction runs over the whole corpus
    parallelism = spark.sparkContext.defaultParallelism
    ranged, offs, _n = _ranged_with_offsets(
        old.docs.select("docid", "url", "dl", "norm"), "docid", parallelism
    )

    def add_new_ids(batches):
        pid_base = None
        seen = 0
        for pdf in batches:
            if pid_base is None:
                pid_base = offs[TaskContext.get().partitionId()]
            pdf = pdf.copy()
            pdf["new_docid"] = np.arange(
                pid_base + seen, pid_base + seen + len(pdf), dtype=np.int64
            )
            seen += len(pdf)
            yield pdf

    url_t = old.docs.schema["url"].dataType.simpleString()
    norm_t = old.docs.schema["norm"].dataType.simpleString()
    remap = ranged.mapInPandas(
        add_new_ids,
        schema=f"docid long, url {url_t}, dl long, norm {norm_t}, new_docid long",
    )

    old_seg_size = old.seg_size

    has_pos = bool(
        old.postings.filter(F.length("pos_blob") > 0).limit(1).count()
    ) if "pos_blob" in old.postings.columns else False

    def explode_rows(batches):
        import numpy as np

        for pdf in batches:
            out_term, out_doc, out_tf, out_dl, out_pos = [], [], [], [], []
            for _, r in pdf.iterrows():
                tp = TermPostings(r, old_seg_size)
                d, f, dls = tp.decode()
                out_term.extend([r["term"]] * len(d))
                out_doc.extend((d + int(r["seg"]) * old_seg_size).tolist())
                out_tf.extend(f.tolist())
                out_dl.extend(dls.tolist())
                if has_pos:
                    # positions survive the merge unchanged — docID remapping
                    # is order-preserving, in-doc positions don't move
                    pos = tp.positions_flat()
                    starts = np.cumsum(f) - f
                    out_pos.extend(
                        pos[s : s + n].tolist()
                        for s, n in zip(starts.tolist(), f.tolist())
                    )
            cols = {"term": out_term, "docid": out_doc, "tf": out_tf, "dl": out_dl}
            if has_pos:
                cols["positions"] = out_pos
            yield pd.DataFrame(cols)

    flat_schema = "term string, docid long, tf long, dl long"
    sel_cols = ["term", F.col("new_docid").alias("docid"), "tf", "dl"]
    if has_pos:
        flat_schema += ", positions array<long>"
        sel_cols.append("positions")
    flat = old.postings.mapInPandas(explode_rows, schema=flat_schema)
    tf = (
        flat.join(remap.select("docid", "new_docid"), "docid")
        .select(*sel_cols)
        .withColumn("seg", (F.col("docid") / F.lit(seg_size)).cast("long"))
    )
    postings = segment_rows_stage(tf, seg_size)
    postings.sortWithinPartitions("term").write.mode("overwrite").partitionBy("seg").parquet(
        f"{out_dir}/postings"
    )
    new_docs = remap.select(F.col("new_docid").alias("docid"), "url", "dl", "norm")
    new_docs.write.mode("overwrite").parquet(f"{out_dir}/docs")
    build_norms(new_docs, seg_size).write.mode("overwrite").parquet(f"{out_dir}/norms")
    new_docs.sparkSession.read.parquet(f"{out_dir}/postings").groupBy("term").agg(
        F.sum("df_local").alias("df"), F.sum("cf_local").alias("cf")
    ).write.mode("overwrite").parquet(f"{out_dir}/termdict")
    n_docs = old.doc_count
    spark.createDataFrame(
        [(n_docs, old.sum_total_term_freq, seg_size)],
        "doc_count long, sum_total_term_freq long, seg_size long",
    ).write.mode("overwrite").parquet(f"{out_dir}/stats")
    return read_index(spark, out_dir)
