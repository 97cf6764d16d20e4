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


# ---- full-query Monitor: presearcher filter + MemoryIndex verification


ANYTOKEN = "\x1d__anytoken__"


def presearcher_terms(node) -> set[str]:
    """TermFilteredPresearcher analog (monitor/TermFilteredPresearcher.
    java + QueryAnalyzer.java): a set of terms such that EVERY matching
    document must contain at least one of them.

    - term: itself
    - disjunction: union over children (all must be representable)
    - conjunction: the best single child — the reference's QueryAnalyzer
      picks by TermWeightor; this analog picks the child whose term set
      is smallest (ties: longest terms), the same pruning goal
    - phrase / span: any one member term (the longest)
    - multiterm (wildcard/fuzzy/range), match_all, pure negation:
      unbounded → ANYTOKEN (the query becomes a candidate for every
      document, exactly the reference's fallback token)
    """
    kind = node[0]
    if kind == "term":
        return {node[1]}
    if kind == "boost":
        return presearcher_terms(node[1])
    if kind in ("or", "and"):  # members may be bare terms or sub-nodes
        subs = [({m} if isinstance(m, str) else presearcher_terms(m))
                for m in node[1]]
        if not subs:
            return {ANYTOKEN}
        if kind == "or":
            out = set()
            for t in subs:
                out |= t
            return out
        # conjunction: the best single child (fewest terms, longest text)
        best = None
        for t in subs:
            if ANYTOKEN in t:
                continue
            if best is None or (len(t), -max(len(x) for x in t)) < (
                    len(best), -max(len(x) for x in best)):
                best = t
        return best if best is not None else {ANYTOKEN}
    if kind in ("orn", "dismax"):
        out = set()
        for sub in node[1]:
            out |= presearcher_terms(sub)
        return out
    if kind == "syn":
        return set(node[1])
    if kind == "andn":
        best = None
        for sub in node[1]:
            t = presearcher_terms(sub)
            if ANYTOKEN in t:
                continue
            if best is None or (len(t), -max(len(x) for x in t)) < (
                    len(best), -max(len(x) for x in best)):
                best = t
        return best if best is not None else {ANYTOKEN}
    if kind in ("phrase", "mphrase"):
        members = node[1]
        terms = [t for m in members for t in
                 (m if isinstance(m, (list, tuple)) else [m])
                 if isinstance(t, str)]
        return {max(terms, key=len)} if terms else {ANYTOKEN}
    if kind == "reqopt":
        return presearcher_terms(("and", [node[1][1]])
                                 if isinstance(node[1], tuple)
                                 and node[1][0] == "term" else node[1])
    if kind in ("reqoptn",):
        return presearcher_terms(node[1])
    if kind == "not":
        return presearcher_terms(node[1])  # the required part
    return {ANYTOKEN}


def monitor_match_queries(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords=ENGLISH_STOP_WORDS,
) -> DataFrame:
    """Monitor.match with arbitrary classic-parser queries (phrases,
    wildcards, boolean trees): the reference pipeline re-expressed —
    (1) a presearcher term table filters the document stream to candidate
    (query, doc) pairs via a broadcast join (QueryIndex), (2) every
    candidate is verified by scoring the full query against a
    single-document MemoryIndex (CandidateMatcher.matchQuery), exactly
    like the reference's per-document evaluation.  ``queries``: (qid,
    query_string) pairs.  Returns (qid, doc_id, score) for real matches.

    Scale: the stored-query table broadcasts; only candidate pairs pay
    the per-doc verification, and those run data-parallel in one Arrow
    pass over the doc partitions — no corpus-sized driver traffic."""
    from .search import parse_query, rewrite

    parsed = {}
    pre_rows = []
    for qid, qstring in queries:
        node = rewrite(parse_query(qstring), stopwords)
        if node is None:
            continue  # analyzes to nothing: matches nothing
        parsed[qid] = qstring
        for t in presearcher_terms(node):
            pre_rows.append((qid, t))
    if not pre_rows:
        return spark.createDataFrame(
            [], f"qid string, {id_col} long, score double")
    pre_df = spark.createDataFrame(pre_rows, "qid string, term string")

    from .index import tokenize_docs

    toks = tokenize_docs(
        docs.withColumn("docid", F.col(id_col)), text_col=text_col,
        key_col=id_col, stopwords=stopwords)
    doc_terms = (toks.select(F.col("docid").alias(id_col),
                             F.explode("tokens").alias("term"))
                 .distinct())
    anytoken = pre_df.filter(F.col("term") == ANYTOKEN).select("qid")
    termed = (doc_terms.join(F.broadcast(
        pre_df.filter(F.col("term") != ANYTOKEN)), "term")
        .select(id_col, "qid"))
    all_docs = docs.select(id_col)
    cands = termed.union(
        all_docs.crossJoin(F.broadcast(anytoken)).select(id_col, "qid")
    ).distinct()
    with_text = cands.join(docs.select(id_col, text_col), id_col)

    qmap = dict(parsed)
    stop = frozenset(stopwords)
    schema = f"qid string, {id_col} long, score double"

    def verify(pdfs):
        import pandas as pd

        from .memory import memory_search

        for pdf in pdfs:
            out = {"qid": [], id_col: [], "score": []}
            for _, r in pdf.iterrows():
                score = memory_search(
                    r[text_col] if isinstance(r[text_col], str) else "",
                    qmap[r["qid"]], analyzer=stop)
                if score > 0.0:
                    out["qid"].append(r["qid"])
                    out[id_col].append(r[id_col])
                    out["score"].append(float(score))
            yield pd.DataFrame(out)

    return with_text.mapInPandas(verify, schema)
