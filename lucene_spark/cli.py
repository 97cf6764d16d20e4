"""spark-submit entrypoint (north rule: `spark-submit --py-files` deployment).

  spark-submit --py-files lucene_spark.zip -m lucene_spark.cli ...   # cluster
  python -m lucene_spark.cli build  --input pages.parquet --out /idx \\
         [--text-col text] [--key-col url] [--positions] [--resume]
  python -m lucene_spark.cli build  --input-table cat.db.pages --out /idx
         # catalog source: an Iceberg table (with the Iceberg runtime +
         # spark.sql.catalog.* conf on the cluster), Hive table, or view
  python -m lucene_spark.cli search --index /idx --query 'court AND law' [-k 10]
  python -m lucene_spark.cli bench-queries --index /idx --queries q.txt

On a cluster the session comes from spark-submit's conf (master/executors);
standalone runs fall back to local[*].  The `build --resume` path is the
checkpointed per-segment build with lineage (north rule resumability).
"""

from __future__ import annotations

import argparse
import json
import sys

from .similarity import SIMILARITIES


def _session(app: str):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(app)
    return (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def _analyzer(args):
    if getattr(args, "english_analyzer", False):
        from .analysis import english_analyzer

        return english_analyzer()
    from .analysis import ENGLISH_STOP_WORDS

    return ENGLISH_STOP_WORDS


def cmd_build(args) -> int:
    from .index import build_index, build_or_resume, write_index

    spark = _session("lucene_spark_build")
    if args.input_table:
        # catalog-table source (north rule: Iceberg table of Common-Crawl
        # pages).  spark.table() resolves ANY registered catalog table —
        # with the Iceberg runtime on the cluster classpath and a catalog
        # configured (spark.sql.catalog.<name>=org.apache.iceberg...),
        # `--input-table cat.db.pages` reads the Iceberg snapshot with the
        # same partition pruning / column pruning the parquet path gets;
        # plain Hive tables and temp views resolve identically.
        pages = spark.table(args.input_table)
    else:
        pages = spark.read.parquet(args.input)
    an = _analyzer(args)
    if args.resume:
        summary = build_or_resume(
            spark, pages, args.out, text_col=args.text_col, key_col=args.key_col,
            seg_size=args.seg_size or 4096, with_positions=args.positions,
            stopwords=an,
        )
        print(json.dumps(summary))
        return 0
    idx = build_index(
        spark, pages, text_col=args.text_col, key_col=args.key_col,
        seg_size=args.seg_size, with_positions=args.positions, stopwords=an,
    )
    write_index(idx, args.out)
    print(json.dumps({
        "doc_count": idx.doc_count,
        "sum_total_term_freq": idx.sum_total_term_freq,
        "seg_size": idx.seg_size,
        "out": args.out,
    }))
    return 0


def cmd_search(args) -> int:
    from .index import read_index
    from .search import index_fields, search

    spark = _session("lucene_spark_search")
    idx = read_index(spark, args.index)
    query = args.query
    syntax = getattr(args, "syntax", "classic")
    if syntax == "surround":
        from .surround import parse_surround

        query = parse_surround(args.query, fields=index_fields(idx))
    elif syntax == "simple":
        # SimpleQueryParser (forgiving +/|/-/"..."/*/~ syntax); negation
        # and match-all route through the DataFrame BooleanQuery evaluator
        from .simpleqp import simple_search

        td = simple_search(idx, args.query, k=args.k,
                           precision=args.precision,
                           similarity=args.similarity,
                           analyzer=_analyzer(args))
        for rank, (d, sc) in enumerate(zip(td.docids.tolist(),
                                           td.scores.tolist())):
            print(json.dumps({"rank": rank, "docid": int(d),
                              "score": float(sc)}))
        return 0
    td = search(idx, query, k=args.k, precision=args.precision,
                prune=not args.no_prune, with_urls=True,
                similarity=args.similarity, analyzer=_analyzer(args))
    for rank, (d, s, u) in enumerate(zip(td.docids.tolist(), td.scores.tolist(),
                                         td.urls or [None] * len(td.docids))):
        print(json.dumps({"rank": rank, "docid": int(d), "score": float(s), "url": u}))
    return 0


def cmd_bench_queries(args) -> int:
    import time

    from .index import read_index
    from .search import search_many

    spark = _session("lucene_spark_bench_queries")
    idx = read_index(spark, args.index)
    with open(args.queries) as f:
        qs = {f"q{i}": line.strip() for i, line in enumerate(f) if line.strip()}
    search_many(idx, dict(list(qs.items())[:1]), k=args.k)  # warm-up
    t0 = time.time()
    search_many(idx, qs, k=args.k, precision=args.precision)
    dt = time.time() - t0
    print(json.dumps({"n_queries": len(qs), "wall_sec": round(dt, 3),
                      "queries_per_sec": round(len(qs) / dt, 2)}))
    return 0


def cmd_suggest(args) -> int:
    """Suggest / spell CLI: prefix completions (FST-analog termdict scan),
    DirectSpellChecker corrections, or WordBreak splits."""
    from .index import read_index
    from .suggest import (
        direct_spell_suggest,
        suggest_terms,
        suggest_word_breaks,
    )

    spark = _session("lucene_spark_suggest")
    idx = read_index(spark, args.index)
    if args.mode == "prefix":
        rows = suggest_terms(idx, args.text, args.n).collect()
        out = [{"term": r["term"], "cf": int(r["cf"])} for r in rows]
    elif args.mode == "spell":
        rows = direct_spell_suggest(
            idx, args.text, num_sug=args.n,
            max_query_frequency=float("inf") if args.always else 0.01,
        ).collect()
        out = [
            {"term": r["term"], "df": int(r["df"]), "score": float(r["score"])}
            for r in rows
        ]
    else:  # wordbreak
        rows = suggest_word_breaks(idx, args.text, max_suggestions=args.n).collect()
        out = [
            {"words": list(r["words"]), "freq_max": int(r["freq_max"])}
            for r in rows
        ]
    print(json.dumps(out))
    return 0


def cmd_check(args) -> int:
    """CheckIndex CLI analog (Lucene: java org.apache.lucene.index.CheckIndex
    <dir> — index/CheckIndex.java:79)."""
    from .checkindex import check_index
    from .index import read_index

    spark = _session("lucene_spark_check")
    rep = check_index(read_index(spark, args.index))
    print(json.dumps(rep))
    return 0 if rep["status"] == "ok" else 1


def cmd_term_info(args) -> int:
    """GetTermInfo analog (misc/GetTermInfo.java:30-60: prints docFreq and
    totalTermFreq of a term) — a pushdown point lookup on the termdict."""
    from pyspark.sql import functions as F

    from .index import read_index

    spark = _session("lucene_spark_term_info")
    idx = read_index(spark, args.index)
    rows = (idx.termdict.filter(F.col("term") == args.term)
            .select("df", "cf").collect())
    if rows:
        out = {"term": args.term, "doc_freq": int(rows[0]["df"]),
               "total_term_freq": int(rows[0]["cf"])}
    else:
        out = {"term": args.term, "doc_freq": 0, "total_term_freq": 0}
    print(json.dumps(out))
    return 0


def cmd_merge(args) -> int:
    """IndexMergeTool analog (misc/IndexMergeTool.java:30-60: merges
    multiple indexes into one via addIndexes + forceMerge) — the docBase-
    rebase append-merge followed by a compaction."""
    import shutil
    import tempfile

    from .index import add_indexes, read_index, write_index
    from .streaming import compact_index

    spark = _session("lucene_spark_merge")
    merged = read_index(spark, args.indexes[0])
    for p in args.indexes[1:]:
        merged = add_indexes(merged, read_index(spark, p))
    tmp = tempfile.mkdtemp(prefix="ls_merge_")
    try:
        write_index(merged, tmp)
        out_idx = compact_index(spark, tmp, args.out,
                                seg_size=merged.seg_size)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"out": args.out, "doc_count": int(out_idx.doc_count)}))
    return 0


def cmd_info(args) -> int:
    """Luke/IndexInfo analog (the overview panel of lucene/luke — doc
    counts, vocabulary size, per-segment layout, top terms by docFreq,
    index/CheckIndex.java's Status.SegmentInfoStatus surface as JSON)."""
    from pyspark.sql import functions as F

    from .index import high_freq_terms, read_index

    spark = _session("lucene_spark_info")
    idx = read_index(spark, args.index)
    segs = (
        idx.postings.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("posting_rows"),
             F.sum("df_local").alias("postings"))
        .orderBy("seg")
        .collect()
    )
    top = high_freq_terms(idx, n=args.top_terms, by="df").collect()
    rep = {
        "doc_count": int(idx.doc_count),
        "sum_total_term_freq": int(idx.sum_total_term_freq),
        "vocab_size": int(idx.termdict.count()),
        "seg_size": int(idx.seg_size),
        "n_segments": len(segs),
        "has_tombstones": idx.tombstones is not None,
        "segments": [
            {"seg": int(r["seg"]), "posting_rows": int(r["posting_rows"]),
             "postings": int(r["postings"])}
            for r in segs
        ],
        "top_terms": [
            {"term": r["term"], "df": int(r["df"]), "cf": int(r["cf"])}
            for r in top
        ],
    }
    print(json.dumps(rep))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="lucene_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="batch index build (optionally resumable)")
    src = b.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", default=None, help="parquet path of pages")
    src.add_argument("--input-table", default=None,
                     help="catalog table (Iceberg/Hive/view), e.g. cat.db.pages")
    b.add_argument("--out", required=True)
    b.add_argument("--text-col", default="text")
    b.add_argument("--key-col", default="url")
    b.add_argument("--seg-size", type=int, default=None)
    b.add_argument("--positions", action="store_true")
    b.add_argument("--english-analyzer", action="store_true",
                   help="EnglishAnalyzer chain: possessive strip + Porter stem")
    b.add_argument("--resume", action="store_true",
                   help="checkpointed per-segment build with lineage")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="top-k BM25 query")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--precision", default="lucene", choices=["lucene", "float64"])
    s.add_argument("--no-prune", action="store_true")
    s.add_argument("--syntax", default="classic",
                   choices=["classic", "surround", "simple"],
                   help="query language: classic QueryParser, surround "
                        "proximity syntax (nW/nN distance operators), or "
                        "SimpleQueryParser (+/|/- forgiving syntax)")
    s.add_argument("--similarity", default="bm25",
                   choices=sorted(SIMILARITIES))
    s.add_argument("--english-analyzer", action="store_true",
                   help="analyze the query with the EnglishAnalyzer chain")
    s.set_defaults(fn=cmd_search)

    q = sub.add_parser("bench-queries", help="batched query-log throughput")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True, help="file, one query per line")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--precision", default="lucene", choices=["lucene", "float64"])
    q.set_defaults(fn=cmd_bench_queries)

    g = sub.add_parser("suggest", help="prefix / spell / word-break suggestions")
    g.add_argument("--index", required=True)
    g.add_argument("--text", required=True)
    g.add_argument("--mode", choices=["prefix", "spell", "wordbreak"],
                   default="prefix")
    g.add_argument("-n", type=int, default=5)
    g.add_argument("--always", action="store_true",
                   help="spell: disable the maxQueryFrequency gate")
    g.set_defaults(fn=cmd_suggest)

    c = sub.add_parser("check", help="CheckIndex-style structural audit")
    c.add_argument("--index", required=True)
    c.set_defaults(fn=cmd_check)

    i = sub.add_parser("info", help="Luke-style index overview (stats, "
                                    "segments, top terms) as JSON")
    i.add_argument("--index", required=True)
    i.add_argument("--top-terms", type=int, default=10)
    i.set_defaults(fn=cmd_info)

    t = sub.add_parser("term-info", help="docFreq/totalTermFreq of one term")
    t.add_argument("--index", required=True)
    t.add_argument("--term", required=True)
    t.set_defaults(fn=cmd_term_info)

    m = sub.add_parser("merge", help="merge indexes (addIndexes + compact)")
    m.add_argument("--out", required=True)
    m.add_argument("indexes", nargs="+")
    m.set_defaults(fn=cmd_merge)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
