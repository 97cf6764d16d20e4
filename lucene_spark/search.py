"""Query parsing + distributed top-k search over the index tables.

Lifecycle mirrors IndexSearcher.search (lucene/core/.../search/
IndexSearcher.java:470-511,728-753 — traced in SURVEY §3.1):

  1. parse + analyze the query with the same analyzer
     (queryparser/.../classic/QueryParserBase.java:437 getFieldQuery);
  2. rewrite (drop unknown/stopword-only clauses → MatchNoDocs analog);
  3. "createWeight": look up query terms in the term dictionary — a pushed-down
     isin() filter against the sorted termdict parquet (the FST analog) — and
     build one BM25Scorer per term from global stats (TermStates.build walks
     all segments: index/TermStates.java:95; here stats are global by
     construction);
  4. per-segment execution: postings rows for the query terms are grouped by
     segment and scored by the windowed block-max kernel inside applyInPandas
     — segment == Lucene leaf, executor == searcher thread;
  5. reduce: per-segment top-k merged on the driver with the
     (score desc, docID asc) contract (TopDocs.java:93-120; segments are
     docID ranges so docBase order == docID order).

The driver only ever collects k rows per segment — never postings.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOP_WORDS, analyze
from .index import Index
from .kernel import segment_topk
from .similarity import BM25Scorer, CollectionStats

# --- query AST + parser ---------------------------------------------------------


def parse_query(q: str) -> tuple:
    """Parse the reference query-set syntax (benchmark/conf/query-terms.txt):
    `a AND b`, `a b c` (bare terms = OR), `(a AND b) OR c` — one nesting level.

    Returns ("or", [...]) / ("and", [...]) / ("term", t) nodes with RAW terms;
    call :func:`rewrite` to analyze them.
    """
    q = q.strip()
    # quoted phrase: `"exact phrase"` / `"sloppy phrase"~N` (classic
    # QueryParser syntax, queryparser/.../classic/QueryParser.jj;
    # PhraseQuery.java:71, slop at :89)
    m_slop = re.fullmatch(r'"([^"]*)"~(\d+)', q)
    if m_slop:
        return ("phrase_raw", m_slop.group(1), int(m_slop.group(2)))
    if q.startswith('"') and q.endswith('"') and '"' not in q[1:-1]:
        return ("phrase_raw", q[1:-1])
    # MUST_NOT: `<positive> NOT t1 NOT t2` (BooleanClause.Occur.MUST_NOT)
    if re.search(r"\s+NOT\s+", q):
        parts = re.split(r"\s+NOT\s+", q)
        return ("not", parse_query(parts[0]), [t.strip() for t in parts[1:]])
    # classic `+must should` syntax → ReqOptSumScorer (ReqOptSumScorer.java:30:
    # required clause scores + optional clauses that also match)
    toks = q.split()
    if any(t.startswith("+") and len(t) > 1 for t in toks) and "(" not in q \
            and not re.search(r"\s+(AND|OR)\s+", q):
        req = [t[1:] for t in toks if t.startswith("+") and len(t) > 1]
        opt = [t for t in toks if not t.startswith("+")]
        return ("reqopt", ("and", req) if len(req) > 1 else ("term", req[0]), opt)
    # split top-level OR (respecting parens)
    parts = re.split(r"\s+OR\s+", q) if "(" not in q else _split_parens(q)
    clauses = []
    for part in parts:
        part = part.strip()
        if part.startswith("(") and part.endswith(")"):
            part = part[1:-1].strip()
        if (m := re.fullmatch(r'"([^"]*)"~(\d+)', part)):
            clauses.append(("phrase_raw", m.group(1), int(m.group(2))))
        elif part.startswith('"') and part.endswith('"'):
            clauses.append(("phrase_raw", part[1:-1]))
        elif re.search(r"\s+AND\s+", part):
            terms = [t.strip() for t in re.split(r"\s+AND\s+", part) if t.strip()]
            clauses.append(("and", terms) if len(terms) > 1 else ("term", terms[0]))
        else:
            for t in part.split():
                clauses.append(("term", t))
    if len(clauses) == 1:
        return clauses[0]
    return ("or", clauses)


def _split_parens(q: str) -> list[str]:
    parts, depth, cur = [], 0, []
    i = 0
    while i < len(q):
        if q[i] == "(":
            depth += 1
        elif q[i] == ")":
            depth -= 1
        if depth == 0 and q[i : i + 4] == " OR ":
            parts.append("".join(cur))
            cur = []
            i += 4
            continue
        cur.append(q[i])
        i += 1
    parts.append("".join(cur))
    return parts


def rewrite(node: tuple, stopwords=ENGLISH_STOP_WORDS) -> tuple | None:
    """Analyze every term with the index analyzer; drop empty clauses.

    BooleanQuery.rewrite analog (search/BooleanQuery.java:236+): a query whose
    clauses all vanish (stopword-only) rewrites to MatchNoDocs → None.
    """
    kind = node[0]
    if kind == "phrase_raw":
        # QueryParser analyzes phrase text with the index analyzer, keeping
        # position gaps from removed stopwords (QueryParserBase.java:437 →
        # PhraseQuery with explicit positions; slop → SloppyPhraseMatcher).
        from .analysis import analyze_with_positions

        slop = node[2] if len(node) > 2 else 0
        toks, poss = analyze_with_positions(node[1], stopwords)
        if not toks:
            return None
        if len(toks) == 1:
            return ("term", toks[0])  # 1-term phrase rewrites to TermQuery
        members = list(zip(toks, poss))
        return ("sloppy", members, slop) if slop > 0 else ("phrase", members)
    if kind == "dismax":
        subs = [rewrite(c, stopwords) for c in node[1]]
        subs = [s for s in subs if s is not None]
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
        return ("dismax", subs, node[2])
    if kind == "msm":
        terms: list[str] = []
        for t in node[1]:
            terms.extend(analyze(t, stopwords))
        if len(terms) < node[2]:
            return None  # fewer clauses than minShouldMatch → MatchNoDocs
        return ("msm", terms, node[2])
    if kind == "syn":
        terms = []
        for t in node[1]:
            terms.extend(analyze(t, stopwords))
        if not terms:
            return None
        return ("syn", terms) if len(terms) > 1 else ("term", terms[0])
    if kind == "reqopt":
        req = rewrite(node[1], stopwords)
        if req is None:
            return None  # a MUST clause that analyzes away kills the query
        opt: list[str] = []
        for t in node[2]:
            opt.extend(analyze(t, stopwords))
        return ("reqopt", req, opt) if opt else req
    if kind == "not":
        pos = rewrite(node[1], stopwords)
        if pos is None:
            return None
        neg: list[str] = []
        for t in node[2]:
            neg.extend(analyze(t, stopwords))
        return ("not", pos, neg) if neg else pos
    if kind == "term":
        toks = analyze(node[1], stopwords)
        if not toks:
            return None
        if len(toks) == 1:
            return ("term", toks[0])
        # a "term" that analyzes to several tokens becomes an OR of them
        return ("or", [("term", t) for t in toks])
    if kind == "and":
        terms: list[str] = []
        for t in node[1]:
            toks = analyze(t, stopwords)
            if not toks:
                return None  # Lucene: a MUST clause matching nothing kills the query
            terms.extend(toks)
        return ("and", terms) if len(terms) > 1 else ("term", terms[0])
    subs = [rewrite(c, stopwords) for c in node[1]]
    subs = [s for s in subs if s is not None]
    if not subs:
        return None
    if len(subs) == 1:
        return subs[0]
    flat: list[tuple] = []
    for s in subs:
        flat.extend(s[1] if s[0] == "or" else [s])
    return ("or", flat)


def query_terms(node: tuple) -> list[str]:
    kind = node[0]
    if kind == "term":
        return [node[1]]
    if kind in ("and", "msm", "syn"):
        return list(node[1])
    if kind in ("phrase", "sloppy"):
        return [t for t, _ in node[1]]
    if kind == "not":
        return query_terms(node[1]) + list(node[2])
    if kind == "reqopt":
        return query_terms(node[1]) + list(node[2])
    out: list[str] = []
    for c in node[1]:  # or / dismax
        out.extend(query_terms(c))
    return out


def attach_scorers(
    node: tuple,
    dfs: dict[str, int],
    stats: "CollectionStats",
    k1: float,
    b: float,
    precision: str,
) -> tuple | None:
    """Rewrite AST → executable node: phrase/syn nodes get their multi-term
    scorer (createWeight analog); nodes that provably match nothing → None."""
    kind = node[0]
    if kind in ("phrase", "sloppy"):
        if any(t not in dfs for t, _ in node[1]):
            return None  # a phrase member absent from the index → no match
        scorer = BM25Scorer.for_terms(
            [dfs[t] for t, _ in node[1]], stats, k1=k1, b=b, precision=precision
        )
        if kind == "sloppy":
            return ("sloppy", node[1], node[2], scorer)
        return ("phrase", node[1], scorer)
    if kind == "syn":
        present = [t for t in node[1] if t in dfs]
        if not present:
            return None
        # merged pseudo-term stats: docFreq = max of members
        # (SynonymQuery.java:330-347 blends TermStates the same way)
        scorer = BM25Scorer(
            max(dfs[t] for t in present), stats, k1=k1, b=b, precision=precision
        )
        return ("syn", present, scorer)
    if kind == "dismax":
        subs = [attach_scorers(c, dfs, stats, k1, b, precision) for c in node[1]]
        subs = [s for s in subs if s is not None]
        if not subs:
            return None
        return ("dismax", subs, node[2])
    if kind == "or":
        subs = [attach_scorers(c, dfs, stats, k1, b, precision) for c in node[1]]
        subs = [s for s in subs if s is not None]
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
        return ("or", subs)
    if kind == "not":
        pos = attach_scorers(node[1], dfs, stats, k1, b, precision)
        return ("not", pos, node[2]) if pos is not None else None
    if kind == "reqopt":
        req = attach_scorers(node[1], dfs, stats, k1, b, precision)
        return ("reqopt", req, node[2]) if req is not None else None
    return node


# --- search ---------------------------------------------------------------------


@dataclass
class TopDocs:
    docids: np.ndarray
    scores: np.ndarray
    urls: list[str] | None = None

    def to_pandas(self) -> pd.DataFrame:
        d = {"rank": np.arange(len(self.docids)), "docid": self.docids, "score": self.scores}
        if self.urls is not None:
            d["url"] = self.urls
        return pd.DataFrame(d)


def term_dfs(terms: list[str], termdict: DataFrame) -> dict[str, int]:
    """Term stats lookup — a pushed-down isin() against the sorted termdict
    (the FST/BlockTree lookup analog; TermStates.build, index/TermStates.java:95)."""
    rows = termdict.filter(F.col("term").isin(list(set(terms)))).select("term", "df").collect()
    return {r["term"]: r["df"] for r in rows}


def make_scorers(
    terms: list[str],
    termdict: DataFrame,
    stats: CollectionStats,
    k1: float = 1.2,
    b: float = 0.75,
    precision: str = "lucene",
    boosts: dict[str, float] | None = None,
) -> dict[str, BM25Scorer]:
    """Per-term scorers; ``boosts`` maps term → boost (BoostQuery.java:30 —
    boost folds into weight = boost * idf, BM25Similarity.java:246)."""
    dfs = term_dfs(terms, termdict)
    boosts = boosts or {}
    return {
        t: BM25Scorer(
            dfs[t], stats, k1=k1, b=b, boost=boosts.get(t, 1.0), precision=precision
        )
        for t in set(terms)
        if t in dfs
    }


def search(
    index: Index,
    query: str | tuple,
    k: int = 10,
    precision: str = "lucene",
    prune: bool = True,
    k1: float = 1.2,
    b: float = 0.75,
    with_urls: bool = False,
    boosts: dict[str, float] | None = None,
    filter_docs: DataFrame | None = None,
) -> TopDocs:
    """Distributed top-k BM25 search. ``query``: string or pre-parsed AST
    (term/and/or/not/phrase/dismax/msm/syn nodes).  ``boosts``: per-term boost
    (BoostQuery analog).

    ``filter_docs``: optional DataFrame with a ``docid`` column — the
    BooleanClause.Occur.FILTER analog (search/BooleanQuery.java:40: required
    match, does NOT contribute to the score; IndexOrDocValuesQuery.java:51
    picks columnar execution for such predicates — here the predicate runs as
    a plain Catalyst filter producing the docid set, then cogroups with the
    postings by segment so each kernel masks before ranking)."""
    node = parse_query(query) if isinstance(query, str) else query
    node = rewrite(node)
    empty = TopDocs(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64), [] if with_urls else None)
    if node is None:
        return empty
    terms = sorted(set(query_terms(node)))
    stats = CollectionStats(index.doc_count, index.sum_total_term_freq)
    dfs = term_dfs(terms, index.termdict)
    boosts = boosts or {}
    scorers = {
        t: BM25Scorer(dfs[t], stats, k1=k1, b=b, boost=boosts.get(t, 1.0), precision=precision)
        for t in terms
        if t in dfs
    }
    node = attach_scorers(node, dfs, stats, k1, b, precision)
    if node is None:
        return empty
    if node[0] == "and" and any(t not in scorers for t in terms):
        return empty
    if not scorers:
        return empty

    rows = index.postings.filter(F.col("term").isin([t for t in terms if t in scorers]))

    # per-segment execution: posting rows are self-contained (inline dls), so
    # the only shuffle is the query's own rows grouped by seg — segment ==
    # Lucene leaf, executor == searcher slice; the driver collects k rows/seg.
    seg_size = index.seg_size
    node_b, kparam, prec, pr = node, k, precision, prune
    out_schema = "seg long, docid long, score double"

    def _run(post_pdf: pd.DataFrame, allow: np.ndarray | None) -> pd.DataFrame:
        if len(post_pdf) == 0:
            return pd.DataFrame({"seg": pd.Series(dtype="int64"),
                                 "docid": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        seg = int(post_pdf["seg"].iloc[0])
        term_rows = {r["term"]: r for _, r in post_pdf.iterrows()}
        d, s = segment_topk(
            node_b, term_rows, scorers, seg_size, kparam,
            precision=prec, prune=pr, allow=allow,
        )
        return pd.DataFrame({"seg": seg, "docid": d + seg * seg_size, "score": s})

    # NOTE: applyInPandas dispatches on function arity — a second parameter
    # would be interpreted as the grouping key — so the no-filter entrypoint
    # must be strictly single-argument.
    def run_segment(post_pdf: pd.DataFrame) -> pd.DataFrame:
        return _run(post_pdf, None)

    # deletes applied at read (LiveDocsFormat analog): fold tombstones into
    # the allow set when a FILTER is present, else run the deny-mask path
    deny_docs = None
    if index.tombstones is not None:
        if filter_docs is not None:
            filter_docs = filter_docs.join(
                index.tombstones.select("docid"), "docid", "left_anti"
            )
        else:
            deny_docs = index.tombstones

    if deny_docs is not None:
        ddf = deny_docs.select(
            F.col("docid"), (F.col("docid") / F.lit(seg_size)).cast("long").alias("seg")
        )

        def run_denied(key, post_pdf: pd.DataFrame, deny_pdf: pd.DataFrame) -> pd.DataFrame:
            seg = int(key[0])
            if len(post_pdf) == 0:
                return pd.DataFrame({"seg": pd.Series(dtype="int64"),
                                     "docid": pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float64")})
            deny = np.sort(deny_pdf["docid"].to_numpy(dtype=np.int64) - seg * seg_size)

            def _run_deny(pdf):
                term_rows = {r["term"]: r for _, r in pdf.iterrows()}
                d, s = segment_topk(node_b, term_rows, scorers, seg_size, kparam,
                                    precision=prec, prune=pr, deny=deny)
                return pd.DataFrame({"seg": seg, "docid": d + seg * seg_size, "score": s})

            return _run_deny(post_pdf)

        per_seg = (
            rows.groupBy("seg")
            .cogroup(ddf.groupBy("seg"))
            .applyInPandas(run_denied, schema=out_schema)
        )
    elif filter_docs is not None:
        fdf = filter_docs.select(
            F.col("docid"), (F.col("docid") / F.lit(seg_size)).cast("long").alias("seg")
        )

        def run_filtered(key, post_pdf: pd.DataFrame, filt_pdf: pd.DataFrame) -> pd.DataFrame:
            seg = int(key[0])
            allow = np.sort(
                filt_pdf["docid"].to_numpy(dtype=np.int64) - seg * seg_size
            )
            if len(allow) == 0 or len(post_pdf) == 0:
                return pd.DataFrame({"seg": pd.Series(dtype="int64"),
                                     "docid": pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float64")})
            return _run(post_pdf, allow)

        per_seg = (
            rows.groupBy("seg")
            .cogroup(fdf.groupBy("seg"))
            .applyInPandas(run_filtered, schema=out_schema)
        )
    else:
        per_seg = rows.groupBy("seg").applyInPandas(run_segment, schema=out_schema)
    # hierarchical reduce: the per-segment top-k rows are cut to a global
    # top-k IN SPARK (TakeOrderedAndProject — per-partition heaps + a k-row
    # merge) before anything reaches the driver.  At 10^12 docs / 10^6-doc
    # segments a flat collect would ship k x 10^6 rows; this ships k.
    # (TopDocs.merge contract: score desc, docID asc — TopDocs.java:93-120.)
    out = (
        per_seg.orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
        .collect()
    )
    if not out:
        return empty
    docids = np.array([r["docid"] for r in out], dtype=np.int64)
    scores = np.array([r["score"] for r in out], dtype=np.float64)
    order = np.lexsort((docids, -scores))[:k]
    docids, scores = docids[order], scores[order]
    urls = None
    if with_urls:
        url_rows = index.docs.filter(F.col("docid").isin(docids.tolist())).select(
            "docid", "url"
        ).collect()
        umap = {r["docid"]: r["url"] for r in url_rows}
        urls = [umap.get(int(d)) for d in docids]
    return TopDocs(docids, scores, urls)


def score_docs(
    index: Index,
    query: str | tuple,
    precision: str = "lucene",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ALL matching docs scored, returned as a distributed DataFrame
    (docid, score) — the collector-chaining primitive behind facets/grouping
    (FacetsCollector.java:46 collects every hit; grouping's first pass
    likewise).  Nothing is collected: downstream aggregations (facet counts,
    per-group top-n windows) stay in Spark.  Tombstones are masked."""
    node = rewrite(parse_query(query) if isinstance(query, str) else query)
    spark = index.postings.sparkSession
    empty = spark.createDataFrame([], "docid long, score double")
    if node is None:
        return empty
    terms = sorted(set(query_terms(node)))
    stats = CollectionStats(index.doc_count, index.sum_total_term_freq)
    dfs = term_dfs(terms, index.termdict)
    scorers = {
        t: BM25Scorer(dfs[t], stats, k1=k1, b=b, precision=precision)
        for t in terms if t in dfs
    }
    node = attach_scorers(node, dfs, stats, k1, b, precision)
    if node is None or not scorers:
        return empty
    if node[0] == "and" and any(t not in scorers for t in terms):
        return empty
    rows = index.postings.filter(F.col("term").isin(sorted(scorers)))
    seg_size, node_b, prec = index.seg_size, node, precision

    def _score(post_pdf: pd.DataFrame, deny: np.ndarray | None) -> pd.DataFrame:
        from .kernel import TermPostings, _phrase_member_terms, score_query_node

        if len(post_pdf) == 0:
            return pd.DataFrame({"docid": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        seg = int(post_pdf["seg"].iloc[0])
        tps = {r["term"]: TermPostings(r, seg_size) for _, r in post_pdf.iterrows()}
        pbt = {t: tp.decode() for t, tp in tps.items()}
        phrase_terms = _phrase_member_terms(node_b)
        pos_by_term = {
            t: tps[t].positions_flat() for t in phrase_terms if t in tps
        } if phrase_terms else None
        if deny is not None:
            masked = {}
            for t, (d, f, dl) in pbt.items():
                m = ~np.isin(d, deny, assume_unique=True)
                masked[t] = (d[m], f[m], dl[m])
                if pos_by_term is not None and t in pos_by_term:
                    pos_by_term[t] = pos_by_term[t][np.repeat(m, f)]
            pbt = masked
        d, s = score_query_node(node_b, pbt, scorers, prec, pos_by_term)
        return pd.DataFrame({"docid": d + seg * seg_size, "score": s})

    if index.tombstones is not None:
        ddf = index.tombstones.select(
            F.col("docid"), (F.col("docid") / F.lit(seg_size)).cast("long").alias("seg")
        )

        def run_denied(key, post_pdf: pd.DataFrame, deny_pdf: pd.DataFrame) -> pd.DataFrame:
            seg = int(key[0])
            deny = np.sort(deny_pdf["docid"].to_numpy(dtype=np.int64) - seg * seg_size)
            return _score(post_pdf, deny)

        return (
            rows.groupBy("seg").cogroup(ddf.groupBy("seg"))
            .applyInPandas(run_denied, schema="docid long, score double")
        )

    def run_segment(post_pdf: pd.DataFrame) -> pd.DataFrame:
        return _score(post_pdf, None)

    return rows.groupBy("seg").applyInPandas(run_segment, schema="docid long, score double")


def count_hits(index: Index, query: str | tuple) -> int:
    """Distributed TotalHitCountCollector
    (search/TotalHitCountCollector.java:28): per-segment match COUNTS are
    computed inside the kernel (no scoring) and summed by a Spark
    aggregation — only one number per segment ever moves, never hits.
    Tombstoned docs are excluded (liveDocs semantics)."""
    node = parse_query(query) if isinstance(query, str) else query
    node = rewrite(node)
    if node is None:
        return 0
    terms = sorted(set(query_terms(node)))
    stats = CollectionStats(index.doc_count, index.sum_total_term_freq)
    dfs = term_dfs(terms, index.termdict)
    node = attach_scorers(node, dfs, stats, 1.2, 0.75, "float64")
    if node is None:
        return 0
    if node[0] == "and" and any(t not in dfs for t in terms):
        return 0
    present = [t for t in terms if t in dfs]
    if not present:
        return 0
    rows = index.postings.filter(F.col("term").isin(present))
    seg_size, node_b = index.seg_size, node

    def _count(post_pdf: pd.DataFrame, deny: np.ndarray | None) -> pd.DataFrame:
        from .kernel import TermPostings, match_docids

        if len(post_pdf) == 0:
            return pd.DataFrame({"n": pd.Series(dtype="int64")})
        tps = {r["term"]: TermPostings(r, seg_size) for _, r in post_pdf.iterrows()}
        postings_by_term = {t: tp.decode() for t, tp in tps.items()}
        if deny is not None:
            postings_by_term = {
                t: (d[m], f[m], dl[m])
                for t, (d, f, dl) in postings_by_term.items()
                for m in [~np.isin(d, deny, assume_unique=True)]
            }
        from .kernel import _phrase_member_terms

        phrase_terms = _phrase_member_terms(node_b)
        pos_by_term = None
        if phrase_terms:
            pos_by_term = {t: tps[t].positions_flat() for t in phrase_terms if t in tps}
            if deny is not None:
                for t in list(pos_by_term):
                    d, f, _ = tps[t].decode()
                    m = ~np.isin(d, deny, assume_unique=True)
                    pos_by_term[t] = pos_by_term[t][np.repeat(m, f)]
        d = match_docids(node_b, postings_by_term, pos_by_term)
        return pd.DataFrame({"n": [len(d)]})

    if index.tombstones is not None:
        ddf = index.tombstones.select(
            F.col("docid"), (F.col("docid") / F.lit(seg_size)).cast("long").alias("seg")
        )

        def run_denied(key, post_pdf: pd.DataFrame, deny_pdf: pd.DataFrame) -> pd.DataFrame:
            seg = int(key[0])
            deny = np.sort(deny_pdf["docid"].to_numpy(dtype=np.int64) - seg * seg_size)
            return _count(post_pdf, deny)

        per_seg = (
            rows.groupBy("seg").cogroup(ddf.groupBy("seg"))
            .applyInPandas(run_denied, schema="n long")
        )
    else:

        def run_segment(post_pdf: pd.DataFrame) -> pd.DataFrame:
            return _count(post_pdf, None)

        per_seg = rows.groupBy("seg").applyInPandas(run_segment, schema="n long")
    total = per_seg.agg(F.sum("n")).collect()[0][0]
    return int(total or 0)


def search_many(
    index: Index,
    queries: dict[str, str | tuple],
    k: int = 10,
    precision: str = "lucene",
    prune: bool = True,
    k1: float = 1.2,
    b: float = 0.75,
    ks: dict[str, int] | None = None,
) -> dict[str, TopDocs]:
    """Run MANY queries in ONE Spark job — the throughput path.
    ``ks`` optionally overrides ``k`` per query id.

    Lucene amortizes per-query cost across a query log (benchmark byTask
    ReadTask loop); Spark's analog is batching: a single postings scan +
    shuffle for the union of all query terms, with every segment kernel
    evaluating every query against its local rows.  Per-query driver work is
    microseconds; the fixed job-scheduling cost (~0.5 s in local mode) is
    paid once for the whole batch instead of per query.
    """
    stats = CollectionStats(index.doc_count, index.sum_total_term_freq)
    empty = TopDocs(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))

    prepared: dict[str, tuple] = {}
    all_terms: set[str] = set()
    for qid, q in queries.items():
        node = rewrite(parse_query(q) if isinstance(q, str) else q)
        if node is not None:
            prepared[qid] = node
            all_terms.update(query_terms(node))
    if not prepared:
        return {qid: empty for qid in queries}

    dfs = term_dfs(sorted(all_terms), index.termdict)
    exec_nodes: dict[str, tuple] = {}
    needed_terms: set[str] = set()
    for qid, node in prepared.items():
        node = attach_scorers(node, dfs, stats, k1, b, precision)
        if node is None:
            continue
        terms = [t for t in query_terms(node) if t in dfs]
        if node[0] == "and" and len(terms) < len(query_terms(node)):
            continue
        if terms:
            exec_nodes[qid] = node
            needed_terms.update(terms)
    if not exec_nodes:
        return {qid: empty for qid in queries}

    scorers = {
        t: BM25Scorer(dfs[t], stats, k1=k1, b=b, precision=precision)
        for t in needed_terms
    }
    rows = index.postings.filter(F.col("term").isin(sorted(needed_terms)))
    seg_size = index.seg_size
    ks = {qid: (ks or {}).get(qid, k) for qid in exec_nodes}
    nodes_b, kmap, prec, pr = exec_nodes, ks, precision, prune
    many_schema = "qid string, docid long, score double"

    def _run_many(post_pdf: pd.DataFrame, deny: np.ndarray | None) -> pd.DataFrame:
        from .kernel import TermPostings, segment_topk

        if len(post_pdf) == 0:
            return pd.DataFrame({"qid": pd.Series(dtype=object),
                                 "docid": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        seg = int(post_pdf["seg"].iloc[0])
        # shared decoded postings across the whole query batch
        term_rows = {
            r["term"]: TermPostings(r, seg_size) for _, r in post_pdf.iterrows()
        }
        out_q, out_d, out_s = [], [], []
        for qid, node in nodes_b.items():
            sub = {t: term_rows[t] for t in query_terms(node) if t in term_rows}
            if not sub:
                continue
            d, s = segment_topk(node, sub, scorers, seg_size, kmap[qid],
                                precision=prec, prune=pr, deny=deny)
            out_q.extend([qid] * len(d))
            out_d.append(d + seg * seg_size)
            out_s.append(s)
        return pd.DataFrame({
            "qid": out_q,
            "docid": np.concatenate(out_d) if out_d else np.empty(0, dtype=np.int64),
            "score": np.concatenate(out_s) if out_s else np.empty(0, dtype=np.float64),
        })

    def run_segment(post_pdf: pd.DataFrame) -> pd.DataFrame:
        return _run_many(post_pdf, None)

    if index.tombstones is not None:
        # same read-time LiveDocs deny mask as search() — batched queries must
        # not resurrect deleted docs (Lucene: every scorer sees liveDocs)
        ddf = index.tombstones.select(
            F.col("docid"), (F.col("docid") / F.lit(seg_size)).cast("long").alias("seg")
        )

        def run_denied(key, post_pdf: pd.DataFrame, deny_pdf: pd.DataFrame) -> pd.DataFrame:
            seg = int(key[0])
            deny = np.sort(deny_pdf["docid"].to_numpy(dtype=np.int64) - seg * seg_size)
            return _run_many(post_pdf, deny)

        per_seg = (
            rows.groupBy("seg")
            .cogroup(ddf.groupBy("seg"))
            .applyInPandas(run_denied, schema=many_schema)
        )
    else:
        per_seg = rows.groupBy("seg").applyInPandas(run_segment, schema=many_schema)

    # hierarchical per-query reduce in Spark: rank per qid and keep k before
    # collect — ships sum(k_q) rows to the driver instead of k x num_segments
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("docid").asc())
    kmax = max(ks.values())
    collected = (
        per_seg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(kmax))
        .collect()
    )
    by_q: dict[str, list] = {}
    for r in collected:
        by_q.setdefault(r["qid"], []).append((r["docid"], r["score"]))
    out: dict[str, TopDocs] = {}
    for qid in queries:
        pairs = by_q.get(qid)
        if not pairs:
            out[qid] = empty
            continue
        docids = np.array([p[0] for p in pairs], dtype=np.int64)
        scores = np.array([p[1] for p in pairs], dtype=np.float64)
        order = np.lexsort((docids, -scores))[: ks.get(qid, k)]
        out[qid] = TopDocs(docids[order], scores[order])
    return out


def explain(
    index: Index,
    query: str | tuple,
    docid: int,
    precision: str = "lucene",
    k1: float = 1.2,
    b: float = 0.75,
    boosts: dict[str, float] | None = None,
) -> pd.DataFrame:
    """Per-term score breakdown for one document — the IndexSearcher.explain
    analog (search/IndexSearcher.java:714-726; BM25Similarity.explain,
    BM25Similarity.java:261-297).  Returns a pandas frame with one row per
    query term present in the doc: (term, df, tf, dl, weight, score)."""
    node = rewrite(parse_query(query) if isinstance(query, str) else query)
    cols = ["term", "df", "tf", "dl", "weight", "score"]
    if node is None:
        return pd.DataFrame(columns=cols)
    terms = sorted(set(query_terms(node)))
    stats = CollectionStats(index.doc_count, index.sum_total_term_freq)
    dfs = term_dfs(terms, index.termdict)
    boosts = boosts or {}
    seg = docid // index.seg_size
    local = docid - seg * index.seg_size
    rows = index.postings.filter(
        (F.col("seg") == seg) & F.col("term").isin([t for t in terms if t in dfs])
    ).collect()
    from .kernel import TermPostings

    out = []
    for r in rows:
        d, f, dl = TermPostings(r.asDict(), index.seg_size).decode()
        pos = np.searchsorted(d, local)
        if pos >= len(d) or d[pos] != local:
            continue
        scorer = BM25Scorer(
            dfs[r["term"]], stats, k1=k1, b=b,
            boost=boosts.get(r["term"], 1.0), precision=precision,
        )
        s = scorer.score_from_dl(f[pos : pos + 1], dl[pos : pos + 1])[0]
        out.append(
            (r["term"], dfs[r["term"]], int(f[pos]), int(dl[pos]),
             float(scorer.weight), float(s))
        )
    return pd.DataFrame(sorted(out), columns=cols)


def more_like_this_terms(
    index: Index,
    text: str,
    max_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    stopwords=ENGLISH_STOP_WORDS,
) -> list[str]:
    """Interesting-term selection from a seed text — the MoreLikeThis queue
    (queries/src/java/org/apache/lucene/queries/mlt/MoreLikeThis.java:622-668:
    score = tf * idf with ClassicSimilarity idf = ln((docCount+1)/(df+1)) + 1,
    ClassicSimilarity.java:55-64; defaults minTermFreq=2, minDocFreq=5).
    Ties break (score desc, term asc) for determinism."""
    import collections
    import math

    tf = collections.Counter(analyze(text, stopwords))
    cands = [t for t, c in tf.items() if c >= min_term_freq]
    if not cands:
        return []
    dfs = term_dfs(cands, index.termdict)
    n = index.doc_count
    scored = [
        (tf[t] * (math.log((n + 1.0) / (dfs[t] + 1.0)) + 1.0), t)
        for t in cands
        if t in dfs and dfs[t] >= min_doc_freq
    ]
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [t for _, t in scored[:max_terms]]


def more_like_this(
    index: Index,
    text: str,
    k: int = 10,
    max_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    precision: str = "lucene",
    prune: bool = True,
) -> TopDocs:
    """MoreLikeThis: select interesting terms, run them as a disjunction
    (MoreLikeThis.java:587-607 createQuery builds the boolean SHOULD query)."""
    terms = more_like_this_terms(index, text, max_terms, min_term_freq, min_doc_freq)
    if not terms:
        return TopDocs(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    return search(index, ("or", [("term", t) for t in terms]), k=k,
                  precision=precision, prune=prune)


# --- MultiTermQuery family (expansion against the term dictionary) ---------------


MAX_EXPANSIONS = 1024  # IndexSearcher max clause count (IndexSearcher.java:97)


def expand_terms(
    index: Index,
    like: str | None = None,
    rlike: str | None = None,
    fuzzy: tuple[str, int] | None = None,
    lower: str | None = None,
    upper: str | None = None,
    max_expansions: int = MAX_EXPANSIONS,
) -> list[str]:
    """Expand a Prefix/Wildcard/Regexp/Fuzzy/TermRange query against the term
    dictionary (MultiTermQuery.java:53 rewrites via term-enum intersection;
    PrefixQuery.java:29, WildcardQuery.java:38, RegexpQuery.java:44,
    FuzzyQuery.java:52, TermRangeQuery.java:37).  The termdict is sorted by
    term, so parquet min/max stats prune LIKE/range scans (the FST analog)."""
    td = index.termdict
    if like is not None:
        td = td.filter(F.col("term").like(like))
    if rlike is not None:
        td = td.filter(F.col("term").rlike(rlike))
    if fuzzy is not None:
        term, max_edits = fuzzy
        td = td.filter(F.levenshtein(F.col("term"), F.lit(term)) <= max_edits)
    if lower is not None:
        td = td.filter(F.col("term") >= lower)
    if upper is not None:
        td = td.filter(F.col("term") <= upper)
    rows = td.select("term").orderBy("term").limit(max_expansions).collect()
    return [r["term"] for r in rows]


def match_any_docs(index: Index, terms: list[str]) -> DataFrame:
    """docIDs matching ANY of ``terms`` — the CONSTANT_SCORE rewrite of an
    expanded MultiTermQuery / TermInSetQuery (search/TermInSetQuery.java:74):
    decode only the matched postings rows, distributed, then distinct."""
    spark = index.postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "docid long")
    seg_size = index.seg_size
    rows = index.postings.filter(F.col("term").isin(list(set(terms))))

    def explode(batches):
        from .kernel import TermPostings

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            segs = pdf["seg"].to_numpy(dtype=np.int64)
            for i, (_, row) in enumerate(pdf.iterrows()):
                docids = TermPostings(row, seg_size).decode()[0]
                out.append(docids + segs[i] * seg_size)
            yield pd.DataFrame({"docid": np.concatenate(out)})

    return rows.mapInPandas(explode, schema="docid long").distinct()
