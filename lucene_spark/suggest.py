"""Autocomplete / suggest over the term dictionary.

Reference: lucene/suggest module — FSTCompletionLookup / AnalyzingSuggester
(suggest/src/java/org/apache/lucene/search/suggest/analyzing/
AnalyzingSuggester.java:121) rank completions of a prefix by weight.  Here the
weight is collection term frequency (cf) from the termdict; the sorted-by-term
parquet layout makes the prefix scan a pruned range read (the FST analog,
SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index import Index


def suggest_terms(index: Index, prefix: str, n: int = 10) -> DataFrame:
    """Top-n completions of ``prefix`` by (cf desc, term asc)."""
    # escape LIKE metacharacters (default escape char is backslash) so
    # prefixes containing '_' or '%' match literally
    safe = prefix.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    return (
        index.termdict.filter(F.col("term").like(safe + "%"))
        .select("term", "cf")
        .orderBy(F.col("cf").desc(), F.col("term"))
        .limit(n)
    )


def suggest_fuzzy(index: Index, text: str, max_edits: int = 1, n: int = 10) -> DataFrame:
    """Spell-correct style suggestions: terms within edit distance, ranked by
    cf (suggest/spell DirectSpellChecker analog)."""
    return (
        index.termdict.filter(F.levenshtein(F.col("term"), F.lit(text)) <= max_edits)
        .select("term", "cf")
        .orderBy(F.col("cf").desc(), F.col("term"))
        .limit(n)
    )
