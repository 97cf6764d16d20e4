"""StandardAnalyzer-equivalent analysis chain for PySpark.

Pipeline (reference: lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardAnalyzer.java:84-96): UAX#29-style word-break tokenization
(StandardTokenizer.java:38-57, grammar StandardTokenizerImpl.jflex:95-245) →
per-code-point lowercasing (LowerCaseFilter.java:36-44) → stopword removal
(StopFilter.java:24,96).  StandardAnalyzer's default stop set is EMPTY; the
engine wires in EnglishAnalyzer's 33-word list per the north rule
(analysis/common/.../en/EnglishAnalyzer.java:46-52).

Tokenizer semantics implemented (subset of UAX#29 covering the reference's
TestStandardAnalyzer goldens that our corpus exercises):
  - runs of letters/digits/underscore form one token (ALPHANUM/NUM/HANGUL…);
  - medial apostrophe between letters joins (O'Reilly, don't);
  - medial '.' between letters or digits joins (21.35, 216.239.63.104,
    example.com — UAX#29 MidNumLet);
  - medial ',' between digits joins (4,600 — MidNum);
  - '-', '/', ',', whitespace, and other punctuation split;
  - CJK ideographs and hiragana emit one token per character; katakana runs;
  - emoji sequences (ZWJ chains, skin-tone modifiers, flags) are one token;
  - tokens longer than max_token_length (255) are SKIPPED entirely
    (StandardTokenizer.java:144-168 — not truncated).

This runs row-at-a-time inside Arrow-batched pandas UDFs (the regex engine is
C; there is no per-token Python loop on the hot path beyond list building).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (EnglishAnalyzer.java:46-52).
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:37 DEFAULT_MAX_TOKEN_LENGTH

# --- character classes -------------------------------------------------------
# CJK chars handled by dedicated rules, excluded from generic word runs.
_IDEO = (
    "〆〇〡-〩〸-〺"
    "㐀-䶿一-鿿豈-﫿"
    "\U00020000-\U0002fa1f"
)
_HIRA = "ぁ-ゖゝ-ゟ"
_KATA = "ァ-ヺー-ヿㇰ-ㇿｦ-ﾝ"
_CJK = _IDEO + _HIRA + _KATA

# word char = \w minus CJK; letter = word char minus digits/underscore
_WC = rf"[^\W{_CJK}]"
_LETTER = rf"[^\W\d_{_CJK}]"


def _mark_ranges() -> str:
    """Regex class body for every BMP combining mark (categories Mn/Mc/Me).
    UAX#29 WB4 treats these as Extend: they glue to the preceding word char
    and never start a word — without this, Indic words split at every vowel
    sign and Arabic words at every harakat (Python's \\w excludes marks,
    unlike the reference StandardTokenizer).  ZWNJ/ZWJ (Format) get the
    same WB4 treatment in the token pattern itself: Persian "می‌روم" and
    Bengali khanda-ta "ত্‍" stay single tokens, as in the reference."""
    import unicodedata

    parts, start, prev = [], None, None
    for cp in range(0x10000):
        if unicodedata.category(chr(cp)).startswith("M"):
            if start is None:
                start = prev = cp
            elif cp == prev + 1:
                prev = cp
            else:
                parts.append((start, prev))
                start = prev = cp
    if start is not None:
        parts.append((start, prev))
    return "".join(
        chr(a) if a == b else f"{chr(a)}-{chr(b)}" for a, b in parts)


_EXTEND = _mark_ranges()

_EMOJI_BASE = "\U0001f000-\U0001faff☀-➿⬀-⯿←-⇿"
_EMOJI = (
    rf"(?:[\U0001f1e6-\U0001f1ff]{{2}}|[{_EMOJI_BASE}])"
    rf"(?:[\U0001f3fb-\U0001f3ff️])*"
    rf"(?:‍(?:[{_EMOJI_BASE}])(?:[\U0001f3fb-\U0001f3ff️])*)*"
)

_WORD = (
    rf"{_WC}"
    rf"(?:{_WC}"
    rf"|[{_EXTEND}‌‍]"
    rf"|(?<={_LETTER})['’ʼ](?={_LETTER})"
    rf"|(?<={_LETTER})\.(?={_LETTER})"
    rf"|(?<=\d)\.(?=\d)"
    rf"|(?<=\d),(?=\d)"
    rf")*"
)

_TOKEN_RE = re.compile(
    "|".join(
        [
            _WORD,
            rf"[{_KATA}]+",
            rf"[{_HIRA}]",
            rf"[{_IDEO}]",
            _EMOJI,
        ]
    )
)


def tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """UAX#29-style word-break tokens; over-long tokens skipped, not split."""
    if not text:
        return []
    return [t for t in _TOKEN_RE.findall(text) if len(t) <= max_token_length]


class Analyzer:
    """Configurable analysis chain (the Analyzer + TokenFilter stack analog,
    analysis/Analyzer.java:93-119): char_filters → tokenize → pre_filters →
    lowercase → stop-filter → post_filters.

    ``char_filters`` are text→text transforms applied BEFORE tokenization
    (the CharFilter slot, analysis/CharFilter.java:35).  Offset correction
    (CharFilter.correctOffset) works when every char filter exposes
    ``filter_with_offsets`` (the BaseCharFilter delta map —
    ``filters.HTMLStripCharFilter``); plain ``str -> str`` filters like
    ``filters.html_strip`` are rejected at the offsets entry point rather
    than report wrong spans.

    ``pre_filters`` run BEFORE the stop check (EnglishPossessiveFilter's slot
    in EnglishAnalyzer.java:110-118 — "it's" must strip to "it" and then be
    stopped); ``post_filters`` run after it (PorterStemFilter's slot).  Each
    filter is ``str -> str | None``; None removes the token and leaves a
    position gap (FilteringTokenFilter semantics).

    Every ``analyze*`` entry point accepts an Analyzer wherever it accepts a
    stopword set, so ``build_index(..., stopwords=english_analyzer())``
    builds a stemmed index with zero extra plumbing.
    """

    __slots__ = ("stopwords", "pre_filters", "post_filters",
                 "max_token_length", "char_filters", "stream_filters",
                 "graph_filters", "tokenizer", "lowercase")

    def __init__(self, stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
                 pre_filters=(), post_filters=(), char_filters=(),
                 max_token_length: int = MAX_TOKEN_LENGTH,
                 stream_filters=(), graph_filters=(),
                 tokenizer=None, lowercase: bool = True):
        self.stopwords = stopwords
        self.pre_filters = tuple(pre_filters)
        self.post_filters = tuple(post_filters)
        self.char_filters = tuple(char_filters)
        self.max_token_length = max_token_length
        # the Tokenizer slot (analysis/Tokenizer.java): None = the standard
        # UAX#29 regex tokenizer; else a callable ``str -> list[str]`` or
        # ``str -> (tokens, positions)`` (tokenizers.py — path-hierarchy
        # tokenizers emit every token at the same position, matching
        # PathHierarchyTokenizer's posInc 1,0,0,... contract)
        self.tokenizer = tokenizer
        # WhitespaceAnalyzer/KeywordAnalyzer have no LowerCaseFilter —
        # lowercase=False drops that stage from run_token
        self.lowercase = lowercase
        # graph filters see the RAW (original-case, pre-stop) token stream
        # straight off the tokenizer — the slot for filters that must see
        # case and may expand one token into several positions
        # (WordDelimiterGraphFilter runs before LowerCaseFilter in the
        # reference chain for exactly this reason)
        self.graph_filters = tuple(graph_filters)
        # stream filters see the WHOLE emitted (tokens, positions) stream —
        # the slot for graph/merging filters a per-token fn can't express
        # (CJKBigramFilter combines adjacent tokens; ShingleFilter would
        # also live here)
        self.stream_filters = tuple(stream_filters)

    def run_text(self, text: str) -> str:
        """Apply the CharFilter stack to the raw text (pre-tokenizer)."""
        for f in self.char_filters:
            text = f(text)
        return text

    def run_token(self, raw: str) -> str | None:
        """One raw tokenizer output → emitted term or None (removed)."""
        if len(raw) > self.max_token_length:
            return None
        t = raw.lower() if self.lowercase else raw
        for f in self.pre_filters:
            t = f(t)
            if t is None:
                return None
        if t in self.stopwords:
            return None
        for f in self.post_filters:
            t = f(t)
            if t is None:
                return None
        return t

    def analyze_text(self, text: str) -> tuple[list[str], list[int]]:
        """Whole chain over one text → (tokens, positions).  Positions are
        raw-tokenizer indexes (removed tokens leave gaps); stream filters
        run last and may merge/renumber."""
        toks: list[str] = []
        poss: list[int] = []
        if text:
            filtered = self.run_text(text)
            if self.tokenizer is not None:
                out = self.tokenizer(filtered)
                if isinstance(out, tuple):
                    raw_toks, raw_poss = list(out[0]), list(out[1])
                else:
                    raw_toks = list(out)
                    raw_poss = list(range(len(raw_toks)))
            else:
                raw_toks = _TOKEN_RE.findall(filtered)
                raw_poss = list(range(len(raw_toks)))
            for gf in self.graph_filters:
                raw_toks, raw_poss = gf(raw_toks, raw_poss)
            for raw, i in zip(raw_toks, raw_poss):
                t = self.run_token(raw)
                if t is None:
                    continue
                toks.append(t)
                poss.append(i)
        for sf in self.stream_filters:
            toks, poss = sf(toks, poss)
        return toks, poss


def english_analyzer(stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
                     stemmer: str = "porter") -> Analyzer:
    """EnglishAnalyzer.java:104-119 chain: StandardTokenizer →
    EnglishPossessiveFilter → LowerCaseFilter → StopFilter →
    PorterStemFilter (keyword marking not applicable — no per-field types).

    ``stemmer="porter2"`` swaps the final stage for the English Snowball
    stemmer (SnowballFilter(in, "English") — snowball/SnowballFilter
    .java:47 → org/tartarus/snowball/ext/EnglishStemmer.java), the
    Porter2 variant most production English chains configure;
    ``stemmer="kstem"`` swaps in the dictionary-gated KStemFilter analog
    (en/KStemFilter.java:49)."""
    from .filters import porter_stem, strip_possessive
    from .stemmers import porter2_stem

    if stemmer == "kstem":
        from .kstem import kstem as stem
    else:
        stem = {"porter": porter_stem, "porter2": porter2_stem}[stemmer]
    return Analyzer(stopwords, pre_filters=(strip_possessive,),
                    post_filters=(stem,))


def analyze(
    text: str,
    stopwords: "frozenset[str] | Analyzer" = ENGLISH_STOP_WORDS,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[str]:
    """Full chain: tokenize → lowercase → stop-filter (or the full custom
    chain when ``stopwords`` is an :class:`Analyzer`).

    The returned list length is the BM25 field length (FieldInvertState.length
    counts only tokens *emitted* by the full chain — IndexingChain.java:1216,
    StopFilter removes tokens entirely).
    """
    if isinstance(stopwords, Analyzer):
        return stopwords.analyze_text(text)[0]
    return [
        lt
        for t in tokenize(text, max_token_length)
        if (lt := t.lower()) not in stopwords
    ]


def analyze_with_positions(
    text: str,
    stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> tuple[list[str], list[int]]:
    """Full chain, also returning each emitted token's POSITION.

    Position = index in the raw tokenizer output: both skipped over-long
    tokens (StandardTokenizer.java:144-168 bumps the increment) and removed
    stopwords (StopFilter.java:96 via FilteringTokenFilter) leave gaps, which
    is what makes phrase queries across removed stopwords behave like Lucene
    (PhraseQuery honors position increments).
    """
    toks: list[str] = []
    poss: list[int] = []
    if not text:
        return toks, poss
    if isinstance(stopwords, Analyzer):
        return stopwords.analyze_text(text)
    for i, t in enumerate(_TOKEN_RE.findall(text)):
        if len(t) > max_token_length:
            continue
        lt = t.lower()
        if lt in stopwords:
            continue
        toks.append(lt)
        poss.append(i)
    return toks, poss


def analyze_series(texts: pd.Series, stopwords: frozenset[str] = ENGLISH_STOP_WORDS) -> pd.Series:
    """pandas-UDF body: Series[str] → Series[list[str]]."""
    return texts.map(lambda t: analyze(t if isinstance(t, str) else "", stopwords))


def make_analyze_udf(stopwords: frozenset[str] = ENGLISH_STOP_WORDS):
    """Arrow-vectorized pandas UDF: text:string → tokens:array<string>."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def analyze_udf(texts: pd.Series) -> pd.Series:
        return analyze_series(texts, stopwords)

    return analyze_udf


def analyze_with_offsets(
    text: str,
    stopwords: "frozenset[str] | Analyzer" = ENGLISH_STOP_WORDS,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> tuple[list[str], list[int], list[int], list[int]]:
    """Full chain, returning (terms, positions, start_offsets, end_offsets).

    Offsets are CHARACTER spans of the ORIGINAL token in the source text
    (OffsetAttribute contract, analysis/tokenattributes/OffsetAttribute.java:
    26-38): filters may rewrite the term (stemming, folding) but offsets keep
    pointing at the raw text span — which is what highlighting needs.
    """
    toks: list[str] = []
    poss: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    if not text:
        return toks, poss, starts, ends
    an = stopwords if isinstance(stopwords, Analyzer) else None
    corrections = []  # innermost-filter first, applied outside-in
    if an is not None and an.char_filters:
        # CharFilter.correctOffset chain (analysis/CharFilter.java:35-77):
        # each filter exposes (filtered_text, offsets, diffs); token spans
        # over the FILTERED text map back through every correction,
        # innermost last — requires offset-aware filters
        for f in an.char_filters:
            fo = getattr(f, "filter_with_offsets", None)
            if fo is None:
                raise ValueError(
                    f"char filter {f!r} has no filter_with_offsets — "
                    "correctOffset needs the BaseCharFilter delta map "
                    "(use filters.HTMLStripCharFilter for HTML)"
                )
            text, offs, diffs = fo(text)
            corrections.append((f, offs, diffs))
    if an is not None and an.stream_filters:
        raise ValueError(
            "stream filters merge tokens; offsets over merged spans are "
            "not implemented"
        )
    if an is not None and an.graph_filters:
        raise ValueError(
            "graph filters split tokens; per-part offset adjustment "
            "(WordDelimiterGraphFilter adjustInternalOffsets) is not "
            "implemented — index without graph filters for highlighting"
        )
    if an is not None and an.tokenizer is not None:
        raise ValueError(
            "custom tokenizers do not expose character spans; offsets "
            "need the standard tokenizer (finditer spans)"
        )
    for i, m in enumerate(_TOKEN_RE.finditer(text)):
        raw = m.group(0)
        if an is not None:
            t = an.run_token(raw)
            if t is None:
                continue
        else:
            if len(raw) > max_token_length:
                continue
            t = raw.lower()
            if t in stopwords:
                continue
        toks.append(t)
        poss.append(i)
        starts.append(m.start())
        ends.append(m.end())
    # map filtered-text spans back to raw-text spans, outermost correction
    # first is innermost filter last (corrections[k] maps filter k's output
    # offsets to filter k's INPUT offsets)
    for f, offs, diffs in reversed(corrections):
        starts = [int(f.correct_offset(s, offs, diffs)) for s in starts]
        ends = [int(f.correct_offset(e, offs, diffs)) for e in ends]
    return toks, poss, starts, ends


def cjk_analyzer(stopwords: frozenset[str] = ENGLISH_STOP_WORDS) -> Analyzer:
    """CJKAnalyzer chain analog (analysis/cjk/CJKAnalyzer.java:42-50:
    StandardTokenizer → CJKWidthFilter → LowerCaseFilter → CJKBigramFilter →
    StopFilter): ideograph/hiragana runs bigram, Latin text analyzes
    normally.  Width folding is covered by the tokenizer's full-width
    ranges; the stop check runs before the bigram merge here — single CJK
    chars are never in the stop set, so emissions agree."""
    from .filters import cjk_bigrams

    return Analyzer(stopwords, stream_filters=(cjk_bigrams,))


class RoutingAnalyzer(Analyzer):
    """Per-document analyzer routing — the PerFieldAnalyzerWrapper idea
    applied per ROW: web corpora carry a ``lang`` column, but the analyze
    entry points see only text, so routing keys on SCRIPT DETECTION (the
    deterministic function of the text itself; the lang tag and the script
    agree on real corpora).  ``routes`` maps route keys to Analyzers;
    ``detect(text)`` returns a key (default: 'cjk' when the text contains
    any Han/hiragana char, else 'default').

    ``for_lang(tag)`` gives explicit lang-column routing when the caller
    HAS the tag (e.g. pre-partitioned per-language builds)."""

    __slots__ = ("routes", "default", "detect")

    def __init__(self, routes: dict | None = None,
                 default: "Analyzer | None" = None, detect=None):
        super().__init__()
        self.default = default or Analyzer()
        self.routes = dict(routes) if routes else {"cjk": cjk_analyzer()}
        if detect is None:
            import re as _re

            cjk_re = _re.compile(rf"[{_IDEO}{_HIRA}]")
            detect = lambda text: "cjk" if cjk_re.search(text) else None  # noqa: E731
        self.detect = detect

    def for_lang(self, tag: str) -> Analyzer:
        return self.routes.get(tag, self.default)

    def analyze_text(self, text: str):
        key = self.detect(text) if text else None
        a = self.routes.get(key, self.default) if key is not None else self.default
        return a.analyze_text(text)


def query_auto_stop_words(index, delegate: "Analyzer | None" = None,
                          max_doc_freq: int | None = None,
                          max_percent_docs: float | None = None
                          ) -> "Analyzer":
    """QueryAutoStopWordAnalyzer analog (analysis/query/
    QueryAutoStopWordAnalyzer.java:79,94): wrap ``delegate`` with extra
    stopwords for every index term whose document frequency exceeds
    ``max_doc_freq`` (absolute) or ``max_percent_docs`` (fraction of the
    doc count).  The df scan is a Catalyst filter over the termdict;
    only the resulting stop set (bounded by construction) reaches the
    driver."""
    from pyspark.sql import functions as F

    if (max_doc_freq is None) == (max_percent_docs is None):
        raise ValueError("exactly one of max_doc_freq/max_percent_docs")
    if max_percent_docs is not None:
        max_doc_freq = int(index.doc_count * max_percent_docs)
    rows = (index.termdict.filter(F.col("df") > max_doc_freq)
            .select("term").collect())
    auto = frozenset(r["term"] for r in rows)
    base = delegate if delegate is not None else english_analyzer()
    import copy

    out = copy.copy(base)
    out.stopwords = frozenset(base.stopwords) | auto
    return out
