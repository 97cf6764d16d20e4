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
    passes: int = 1,
) -> DataFrame:
    """Monitor.match with arbitrary classic-parser queries (phrases,
    wildcards, boolean trees): the reference pipeline re-expressed —
    (1) a presearcher term table filters the document stream to candidate
    (query, doc) pairs via a broadcast join (QueryIndex), (2) every
    candidate is verified by scoring the full query against a
    single-document MemoryIndex (CandidateMatcher.matchQuery), exactly
    like the reference's per-document evaluation.  ``queries``: (qid,
    query_string) pairs.  Returns (qid, doc_id, score) for real matches.

    ``passes`` > 1 selects the MultipassTermFilteredPresearcher analog:
    per query, ``passes`` independent cover sets (conjunctions advanced to
    a different child per pass) and a candidate must hit EVERY pass — same
    final matches, fewer candidate verifications for conjunctive queries.

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
        for pi, pset in enumerate(presearcher_pass_terms(node, passes)):
            for t in pset:
                pre_rows.append((qid, pi, t))
    if not pre_rows:
        return spark.createDataFrame(
            [], f"qid string, {id_col} long, score double")
    pre_df = spark.createDataFrame(pre_rows,
                                   "qid string, pass_id long, term string")

    from .index import tokenize_docs

    toks = tokenize_docs(
        docs.withColumn("docid", F.col(id_col)), text_col=text_col,
        key_col=id_col, stopwords=stopwords)
    doc_terms = (toks.select(F.col("docid").alias(id_col),
                             F.explode("tokens").alias("term"))
                 .distinct())
    # a pass containing ANYTOKEN imposes no constraint; per query, the
    # number of CONSTRAINED passes a candidate must hit
    any_passes = (pre_df.filter(F.col("term") == ANYTOKEN)
                  .select("qid", "pass_id").distinct()
                  .groupBy("qid").agg(F.count("*").alias("n_any")))
    needed = (pre_df.select("qid").distinct()
              .join(any_passes, "qid", "left")
              .select("qid", (F.lit(int(passes))
                              - F.coalesce(F.col("n_any"), F.lit(0)))
                      .alias("needed")))
    termed = (doc_terms.join(F.broadcast(
        pre_df.filter(F.col("term") != ANYTOKEN)), "term")
        .select(id_col, "qid", "pass_id").distinct()
        .groupBy(id_col, "qid").agg(F.countDistinct("pass_id").alias("hit")))
    termed = (termed.join(F.broadcast(needed), "qid")
              .filter(F.col("hit") >= F.col("needed"))
              .select(id_col, "qid"))
    all_needed_zero = needed.filter(F.col("needed") <= 0).select("qid")
    all_docs = docs.select(id_col)
    cands = termed.union(
        all_docs.crossJoin(F.broadcast(all_needed_zero)).select(id_col, "qid")
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
            # column-array iteration: candidate-sized, but iterrows() was a
            # several-fold constant on top of each MemoryIndex verification
            for qid, did, text in zip(pdf["qid"].to_numpy(),
                                      pdf[id_col].to_numpy(),
                                      pdf[text_col].to_numpy()):
                score = memory_search(
                    text if isinstance(text, str) else "",
                    qmap[qid], analyzer=stop)
                if score > 0.0:
                    out["qid"].append(qid)
                    out[id_col].append(did)
                    out["score"].append(float(score))
            yield pd.DataFrame(out)

    return with_text.mapInPandas(verify, schema)


def presearcher_pass_terms(node, passes: int) -> list[set[str]]:
    """MultipassTermFilteredPresearcher analog (monitor/
    MultipassTermFilteredPresearcher.java:36-95): ``passes`` independent
    cover sets — pass i re-collects the query tree with every conjunction
    advanced to its i-th best child (QueryTree.advancePhase; cycling once
    the children run out, like advancePhase going quiet), so a candidate
    document must hit a term from EVERY pass (the MUST-of-TermInSet
    document query the reference builds, :46-58).  Each pass set remains a
    full cover on its own — any conjunction child is — so the intersection
    prefilter is correctness-neutral and strictly tighter for conjunctive
    queries."""

    def ranked(subsets):
        valid = [t for t in subsets if ANYTOKEN not in t]
        valid.sort(key=lambda t: (len(t), -max(len(x) for x in t)))
        return valid

    def nth(n, i):
        kind = n[0]
        if kind == "boost":
            return nth(n[1], i)
        if kind in ("or", "and"):
            subs = [({m} if isinstance(m, str) else nth(m, i))
                    for m in n[1]]
            if not subs:
                return {ANYTOKEN}
            if kind == "or":
                out = set()
                for t in subs:
                    out |= t
                return out
            valid = ranked(subs)
            return valid[i % len(valid)] if valid else {ANYTOKEN}
        if kind in ("orn", "dismax"):
            out = set()
            for sub in n[1]:
                out |= nth(sub, i)
            return out
        if kind == "andn":
            subs = [nth(sub, i) for sub in n[1]]
            valid = ranked(subs)
            return valid[i % len(valid)] if valid else {ANYTOKEN}
        if kind in ("phrase", "mphrase"):
            terms = [t for m in n[1] for t in
                     (m if isinstance(m, (list, tuple)) else [m])
                     if isinstance(t, str)]
            if not terms:
                return {ANYTOKEN}
            terms = sorted(set(terms), key=lambda t: (-len(t), t))
            return {terms[i % len(terms)]}
        if kind == "reqoptn":
            return nth(n[1], i)
        if kind == "not":
            return nth(n[1], i)
        return presearcher_terms(n)

    return [nth(node, i) for i in range(int(passes))]


def decompose_query(node) -> list[tuple]:
    """QueryDecomposer (monitor/QueryDecomposer.java:28-78): split a stored
    query into independently-indexable disjuncts so each gets its own
    presearcher entry —

      - pure-SHOULD booleans and DisMax: union of decomposed children;
      - minimumShouldMatch > 1: atomic;
      - more than one MUST clause, or MUST mixed with SHOULDs: atomic;
      - a lone MUST clause decomposes in place;
      - MUST_NOT exclusions re-attach to every decomposed disjunct;
      - boost != 1 re-wraps every disjunct.

    Returns first-seen-ordered unique nodes (the reference returns a
    Set)."""

    def dedup(items):
        seen = []
        for x in items:
            if x not in seen:
                seen.append(x)
        return seen

    kind = node[0]
    if kind == "or":
        out = []
        for sub in node[1]:
            out.extend(decompose_query(
                ("term", sub) if isinstance(sub, str) else sub))
        return dedup(out)
    if kind == "dismax":
        out = []
        for sub in node[1]:
            out.extend(decompose_query(sub))
        return dedup(out)
    if kind == "boost":
        if node[2] == 1.0:
            return decompose_query(node[1])
        return dedup([("boost", sub, node[2])
                      for sub in decompose_query(node[1])])
    if kind == "msm":
        if node[2] > 1:
            return [node]
        return dedup([("term", t) for t in node[1]])
    if kind in ("and", "andn"):
        members = node[1]
        if len(members) > 1:
            return [node]
        if len(members) == 1:
            m = members[0]
            return decompose_query(
                ("term", m) if isinstance(m, str) else m)
        return [node]
    if kind in ("reqopt", "reqoptn"):
        # a MUST clause alongside SHOULDs is atomic (:40-41)
        return [node]
    if kind in ("not", "notn"):
        subs = decompose_query(node[1])
        return dedup([(kind, sub, node[2]) for sub in subs])
    return [node]
