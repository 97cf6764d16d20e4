"""XML query parser — the CoreParser element set mapped to the engine AST.

Reference: ``queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java:37-115`` registers per-element builders; this module maps
the same elements onto the engine's raw query AST (the same node shapes
:func:`lucene_spark.search.parse_query` emits, so ``rewrite`` /
``expand_multiterm`` / ``search`` consume XML queries unchanged):

=====================  =====================================================
element                engine node
=====================  =====================================================
<TermQuery>            ("term", text)  (+ ("field", f, ...) routing)
<TermsQuery>           SHOULD of the text's terms (TermsQueryBuilder.java:35;
                       analysis deferred to search.rewrite)
<BooleanQuery>         must/should/mustNot <Clause> composition — the same
                       combine logic as the classic parser (BooleanQuery
                       .Builder semantics)
<DisjunctionMaxQuery>  ("dismax", subs, tieBreaker)
<RangeQuery>           ("range_raw", lo, hi, incl, incl)
                       (RangeQueryBuilder.java:32 TermRangeQuery)
<UserQuery>            classic QueryParser string (UserInputQueryBuilder)
<MatchAllDocsQuery>    ("match_all_raw",) — consumed by BooleanQuery
                       composition as a no-op MUST (its only reference use)
<SpanTerm>             ("sterm", text)
<SpanOr> / <SpanOrTerms>  ("span_or", [terms])
<SpanNear>             ("span_near", subs, slopFactor, inOrder)
<SpanFirst>            ("span_first", sub, end)
<SpanNot>              ("span_not", include, exclude)
=====================  =====================================================

Any element may carry ``boost`` (DOMUtils.getAttribute(e, "boost", 1.0f))
→ ("boost", node, b).  Documented subset: ConstantScoreQuery /
PointRangeQuery / BoostingTermQuery / FuzzyLikeThisQuery / LikeThisQuery /
SpanPositionRange raise ``ValueError`` naming the unsupported element
rather than mis-parse.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .analysis import ENGLISH_STOP_WORDS

_UNSUPPORTED = {
    "ConstantScoreQuery", "PointRangeQuery", "BoostingTermQuery",
    "FuzzyLikeThisQuery", "LikeThisQuery", "SpanPositionRange",
}

_SPAN_TAGS = {"SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear", "SpanFirst",
              "SpanNot"}


def parse_xml_query(
    xml: str,
    default_field: str = "text",
    fields=None,
    stopwords=ENGLISH_STOP_WORDS,
) -> tuple:
    """Parse a CoreParser XML query document → raw engine AST (call
    ``search.rewrite`` + ``search.expand_multiterm`` next, or just pass the
    XML straight to ``search`` — it accepts pre-parsed tuples)."""
    root = ET.fromstring(xml)
    node = _build(root, default_field, fields or [], stopwords)
    if node is None:
        return ("match_none",)
    if node == ("match_all_raw",) or (
        node[0] == "boost" and node[1] == ("match_all_raw",)
    ):
        raise ValueError(
            "standalone MatchAllDocsQuery is not executable here; it only "
            "composes as a BooleanQuery must clause (documented subset)")
    return node


def _boost(el: ET.Element, node: tuple | None) -> tuple | None:
    if node is None:
        return None
    b = el.get("boost")
    return ("boost", node, float(b)) if b is not None else node


def _field_route(el: ET.Element, node: tuple | None, default_field: str,
                 fields) -> tuple | None:
    if node is None:
        return None
    f = el.get("fieldName")
    if f is None or f == default_field:
        return node
    if f in fields:
        return ("field", f, node)
    return ("match_none",)  # unindexed field: empty postings


def _text(el: ET.Element) -> str:
    return (el.text or "").strip()


def _build(el: ET.Element, default_field: str, fields, stopwords):
    tag = el.tag
    if tag in _UNSUPPORTED:
        raise ValueError(f"XML element <{tag}> is not supported "
                         "(documented CoreParser subset)")
    if tag == "TermQuery":
        # TermQueryBuilder.java:33: raw text term; the engine pipeline
        # analyzes raw AST terms in search.rewrite, like parse_query output
        t = _text(el)
        node = ("term", t) if t else None
        return _boost(el, _field_route(el, node, default_field, fields))
    if tag == "TermsQuery":
        # TermsQueryBuilder.java:35-60: SHOULD of the text's terms;
        # analysis deferred to search.rewrite (engine pipeline contract)
        words = _text(el).split()
        if not words:
            return None
        node = ("term", words[0]) if len(words) == 1 else (
            "or", [("term", w) for w in words])
        return _boost(el, _field_route(el, node, default_field, fields))
    if tag == "MatchAllDocsQuery":
        return _boost(el, ("match_all_raw",))
    if tag == "UserQuery":
        from .search import parse_query

        return _boost(el, parse_query(_text(el), default_field, fields))
    if tag == "RangeQuery":
        lo = el.get("lowerTerm")
        hi = el.get("upperTerm")
        inc_lo = el.get("includeLower", "true").lower() == "true"
        inc_hi = el.get("includeUpper", "true").lower() == "true"
        node = ("range_raw",
                lo.lower() if lo else None,
                hi.lower() if hi else None, inc_lo, inc_hi)
        return _boost(el, _field_route(el, node, default_field, fields))
    if tag == "DisjunctionMaxQuery":
        tie = float(el.get("tieBreaker", "0"))
        subs = [s for c in el
                if (s := _build(c, default_field, fields, stopwords))
                is not None]
        if not subs:
            return None
        return _boost(el, ("dismax", subs, tie))
    if tag == "BooleanQuery":
        from .search import MUST, MUST_NOT, SHOULD

        occur_map = {"must": MUST, "should": SHOULD, "mustNot": MUST_NOT}
        clauses = []
        for c in el:
            if c.tag != "Clause":
                raise ValueError(f"<BooleanQuery> children must be <Clause>,"
                                 f" got <{c.tag}>")
            occ = occur_map.get(c.get("occurs", "should"))
            if occ is None:
                raise ValueError(f"bad occurs={c.get('occurs')!r}")
            kids = list(c)
            if len(kids) != 1:
                raise ValueError("<Clause> must hold exactly one query")
            sub = _build(kids[0], default_field, fields, stopwords)
            if sub == ("match_all_raw",):
                # MatchAllDocs as a MUST is a no-op conjunct; as SHOULD or
                # MUST_NOT it has no engine execution path — refuse
                if occ != MUST:
                    raise ValueError(
                        "MatchAllDocsQuery only composes as a must clause")
                continue
            clauses.append((occ, sub))
        from .search import _Parser

        # reuse the classic parser's BooleanQuery.Builder composition
        # (combine is stateless — same must/should/mustNot algebra)
        return _boost(
            el, _Parser("", default_field, fields)._combine(clauses))
    if tag in _SPAN_TAGS:
        return _boost(el, _build_span(el, stopwords))
    raise ValueError(f"unknown XML query element <{tag}>")


def _span_sub(el: ET.Element, stopwords):
    if el.tag not in _SPAN_TAGS:
        raise ValueError(f"<{el.tag}> is not a span element")
    return _build_span(el, stopwords)


def _build_span(el: ET.Element, stopwords):
    tag = el.tag
    if tag == "SpanTerm":
        t = _text(el)
        return ("sterm", t) if t else None
    if tag in ("SpanOr", "SpanOrTerms"):
        if tag == "SpanOrTerms":
            # SpanOrTermsBuilder.java:40: the text's terms as term spans
            # (analysis deferred to rewrite, engine pipeline contract)
            terms = _text(el).split()
        else:
            terms = []
            for c in el:
                s = _span_sub(c, stopwords)
                if s is None:
                    continue
                if s[0] != "sterm":
                    raise ValueError(
                        "engine span_or takes term spans only (subset)")
                terms.append(s[1])
        return ("span_or", terms) if terms else None
    if tag == "SpanNear":
        slop = int(el.get("slopFactor", "0"))
        ordered = el.get("inOrder", "true").lower() == "true"
        subs = [s for c in el if (s := _span_sub(c, stopwords)) is not None]
        return ("span_near", subs, slop, ordered) if subs else None
    if tag == "SpanFirst":
        end = int(el.get("end", "1"))
        kids = list(el)
        if len(kids) != 1:
            raise ValueError("<SpanFirst> holds exactly one span")
        sub = _span_sub(kids[0], stopwords)
        return ("span_first", sub, end) if sub is not None else None
    if tag == "SpanNot":
        kids = list(el)
        if len(kids) != 2:
            raise ValueError("<SpanNot> holds include then exclude spans")
        inc = _span_sub(kids[0], stopwords)
        exc = _span_sub(kids[1], stopwords)
        if inc is None:
            return None
        if exc is None:
            return inc
        return ("span_not", inc, exc, 0, 0)
    raise ValueError(f"unknown span element <{tag}>")
