"""Flexible (Standard) query parser — the node-processor pipeline analog.

Reference: ``queryparser/src/java/org/apache/lucene/queryparser/flexible/
standard/StandardQueryParser.java`` — the flexible framework parses the
same classic syntax (``StandardSyntaxParser``), then runs the node tree
through a configurable ``QueryNodeProcessorPipeline`` before building
queries.  The capabilities that pipeline adds over the classic parser,
re-expressed here Spark-first:

- **Default operator** (``StandardQueryConfigHandler.Operator.AND`` /
  ``setDefaultOperator``): bare clauses become MUST; an explicit ``OR``
  demotes both its operands to SHOULD (``BooleanQuery2ModifierNodeProcessor``
  semantics).
- **PointsConfig** (``config/PointsConfig.java`` +
  ``processors/PointQueryNodeProcessor.java``): a range on a configured
  numeric field becomes a numeric point predicate instead of a lexicographic
  term range.  Lucene executes those as PointRangeQuery /
  IndexOrDocValuesQuery (``search/IndexOrDocValuesQuery.java:51`` picks the
  columnar side under a selective lead iterator); the Spark-first execution
  IS the columnar side — the predicate compiles to a Catalyst filter over a
  doc-metadata table (parquet min/max pruning + predicate pushdown = the
  BKD tree's role) whose docid set feeds ``search(filter_docs=...)``, the
  BooleanClause.Occur.FILTER path.  Documented subset: point ranges are
  supported in required (top-level conjunct) position — the overwhelmingly
  common shape ``text AND field:[a TO b]``; SHOULD / MUST_NOT / boosted /
  pure-filter positions raise with a message naming the limitation.
- **Multi-field expansion** (``processors/MultiFieldQueryNodeProcessor.java``
  + ``setMultiFields``): every unqualified term/phrase/fuzzy/wildcard clause
  expands to a SHOULD disjunction over the configured fields, with optional
  per-field boosts (``MultiFieldQueryParser.java:60`` boost map semantics).

No reference code is copied (the reference is Java); the classic grammar is
reused from :class:`lucene_spark.search._Parser` — the flexible parser
parses the SAME syntax by design.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import MUST, MUST_NOT, SHOULD, _Parser


@dataclass
class StandardConfig:
    """StandardQueryConfigHandler subset."""

    default_operator: str = "OR"          # "OR" | "AND"
    points_config: dict[str, str] = field(default_factory=dict)  # field→dtype
    multi_fields: list[tuple[str, float]] | None = None  # [(field, boost)]
    phrase_slop: int = 0                  # setPhraseSlop default


class _StdParser(_Parser):
    """Classic grammar with the flexible default-operator semantics."""

    def __init__(self, q, default_field, fields, default_and):
        super().__init__(q, default_field, fields)
        self.default_and = default_and

    def _parse_level(self):
        if not self.default_and:
            return super()._parse_level()
        # AND-default rewiring (BooleanQuery2ModifierNodeProcessor): bare
        # clauses are MUST; OR demotes its neighbors to SHOULD
        clauses: list[tuple[int, tuple]] = []
        next_occur = None
        pending_or = False
        while True:
            kind, text = self.peek()
            if kind in ("eof", "rp"):
                break
            if kind == "andop":
                self.next()
                if clauses and clauses[-1][0] == SHOULD:
                    clauses[-1] = (MUST, clauses[-1][1])
                pending_or = False
                continue
            if kind == "orop":
                self.next()
                if clauses and clauses[-1][0] == MUST:
                    clauses[-1] = (SHOULD, clauses[-1][1])
                pending_or = True
                continue
            if kind in ("notop", "minus"):
                self.next()
                next_occur = MUST_NOT
                continue
            if kind == "plus":
                self.next()
                next_occur = MUST
                continue
            atom = self._parse_atom()
            if atom is None:
                continue
            occur = next_occur if next_occur is not None else (
                SHOULD if pending_or else MUST)
            clauses.append((occur, atom))
            next_occur = None
            pending_or = False
        return self._combine(clauses)


def _is_point(node, points) -> bool:
    return (isinstance(node, tuple) and node[0] == "field"
            and node[1] in points and isinstance(node[2], tuple)
            and node[2][0] == "range_raw")


def _assert_no_points(node, points, where: str):
    if not isinstance(node, tuple):
        return
    if _is_point(node, points):
        raise ValueError(
            f"PointsConfig range on '{node[1]}' in {where} position — the "
            "documented subset supports point ranges as required top-level "
            "conjuncts only")
    for sub in node:
        if isinstance(sub, tuple):
            _assert_no_points(sub, points, where)
        elif isinstance(sub, list):
            for s in sub:
                _assert_no_points(s, points, where)


def _point_pred(node, dtype: str):
    _, fld, (_, lo, hi, inc_lo, inc_hi) = node
    cast = int if dtype in ("int", "long", "bigint") else float
    return (fld, None if lo is None else cast(lo),
            None if hi is None else cast(hi), inc_lo, inc_hi, dtype)


def _extract_points(node, points):
    """Split the raw AST into (scoring-node, [point predicates]).  Points
    are legal as the whole required side of the top level; anything else
    raises (documented subset)."""
    if node is None or not isinstance(node, tuple):
        return node, []
    tag = node[0]
    if _is_point(node, points):
        raise ValueError(
            "pure point-range query has no scoring clause; evaluate it as a "
            "plain Catalyst filter (points_filter) instead of search() — "
            "documented subset")
    if tag == "andn":
        keep, preds = [], []
        for sub in node[1]:
            if _is_point(sub, points):
                preds.append(_point_pred(sub, points[sub[1]]))
            else:
                _assert_no_points(sub, points, "nested")
                keep.append(sub)
        if not preds:
            return node, []
        if not keep:
            raise ValueError(
                "pure point-range conjunction has no scoring clause — pass "
                "it to points_filter directly (documented subset)")
        if len(keep) == 1:
            return keep[0], preds
        if all(s[0] == "term" for s in keep):
            return ("and", [s[1] for s in keep]), preds
        return ("andn", keep), preds
    if tag in ("reqoptn", "reqopt"):
        req, preds = _extract_points(node[1], points)
        for s in node[2]:
            _assert_no_points(s if isinstance(s, tuple) else ("term", s),
                              points, "optional (SHOULD)")
        if req is None:
            raise ValueError("point filter consumed the whole required side")
        return (tag, req, node[2]), preds
    if tag in ("not", "notn"):
        pos, preds = _extract_points(node[1], points)
        for s in node[2]:
            _assert_no_points(s if isinstance(s, tuple) else ("term", s),
                              points, "MUST_NOT")
        return (tag, pos, node[2]), preds
    _assert_no_points(node, points, "non-conjunct")
    return node, []


_EXPANDABLE = {"term", "phrase_raw", "fuzzy_raw", "wildcard_raw",
               "mphrase_raw", "sprefix_raw", "range_raw"}


def _expand_multifield(node, multi_fields, default_field):
    """MultiFieldQueryNodeProcessor: unqualified leaf clauses become a
    SHOULD disjunction over the configured fields with per-field boosts."""
    if node is None or not isinstance(node, tuple):
        return node
    tag = node[0]
    if tag == "field":
        return node  # explicitly qualified: left alone (reference behavior)
    if tag in _EXPANDABLE:
        subs = []
        for f, b in multi_fields:
            sub = node if f == default_field else ("field", f, node)
            subs.append(("boost", sub, float(b)) if b != 1.0 else sub)
        return subs[0] if len(subs) == 1 else ("or", subs)
    out = []
    for part in node:
        if isinstance(part, tuple):
            out.append(_expand_multifield(part, multi_fields, default_field))
        elif isinstance(part, list):
            out.append([
                _expand_multifield(p, multi_fields, default_field)
                if isinstance(p, tuple) else p for p in part])
        else:
            out.append(part)
    return tuple(out)


def parse_standard(q: str, config: StandardConfig | None = None,
                   default_field: str = "text", fields=None):
    """StandardQueryParser.parse: classic syntax → processor pipeline →
    (engine AST, point predicates).  Feed the predicates to
    :func:`points_filter` and pass the result as ``search(filter_docs=)``.
    """
    cfg = config or StandardConfig()
    points = cfg.points_config
    known = set(fields or ()) | set(points)
    node = _StdParser(q, default_field, known,
                      cfg.default_operator.upper() == "AND").parse()
    node, preds = _extract_points(node, points)
    if cfg.multi_fields:
        node = _expand_multifield(node, cfg.multi_fields, default_field)
    return node, preds


def points_filter(meta: DataFrame, preds, docid_col: str = "docid",
                  ) -> DataFrame | None:
    """Compile point predicates to one Catalyst filter over the metadata
    table → the FILTER-clause docid set.  The predicate reaches the parquet
    scan (PushedFilters min/max pruning — the BKD role), so at 100 TB this
    is a pruned columnar scan, not a join against postings."""
    if not preds:
        return None
    cond = F.lit(True)
    for fld, lo, hi, inc_lo, inc_hi, dtype in preds:
        c = F.col(fld).cast("double" if dtype in ("float", "double")
                            else "long")
        if lo is not None:
            cond = cond & (c >= lo if inc_lo else c > lo)
        if hi is not None:
            cond = cond & (c <= hi if inc_hi else c < hi)
    return meta.where(cond).select(F.col(docid_col).alias("docid"))
