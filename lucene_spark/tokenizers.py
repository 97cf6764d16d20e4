"""Alternative tokenizers for the Analyzer tokenizer slot.

Reference (lucene/analysis/common/src/java/org/apache/lucene/analysis/...):
  core/WhitespaceTokenizer.java      — runs of non-whitespace
  core/KeywordTokenizer.java         — whole input as one token
  core/LetterTokenizer.java          — runs of Character.isLetter chars
  core/SimpleAnalyzer.java           — LetterTokenizer + LowerCaseFilter
  core/WhitespaceAnalyzer.java       — WhitespaceTokenizer alone (no casing)
  core/KeywordAnalyzer.java:26-34    — KeywordTokenizer alone (no casing)
  core/StopAnalyzer.java:33-41       — LetterTokenizer + lowercase + stop
  path/PathHierarchyTokenizer.java:110-180 — cumulative path prefixes,
      posInc 1,0,0,... (all prefixes share one position), ``skip`` leading
      segments dropped with the boundary delimiter kept on emitted tokens
  path/ReversePathHierarchyTokenizer.java  — path suffixes (domain-style),
      ``skip`` trailing segments dropped
  standard/UAX29URLEmailTokenizer.java     — StandardTokenizer plus <URL>
      and <EMAIL> token types kept whole (documented SUBSET here: the
      reference implements the full RFC 3986/5321 grammars via generated
      JFlex tables; this module recognizes scheme://… , www.… and
      local@domain.tld shapes, which covers web-corpus link/contact text)

Each tokenizer is a plain callable ``str -> list[str]`` (or
``str -> (tokens, positions)`` when the position contract is not
one-position-per-token) that plugs into ``Analyzer(tokenizer=...)``.
Tokenization runs inside Arrow-batched pandas UDFs at index-build time, so
these stay pure-Python per text but vectorized per batch — same execution
shape as the standard chain.
"""

from __future__ import annotations

import re

from .analysis import Analyzer, ENGLISH_STOP_WORDS, _TOKEN_RE

_WS_RE = re.compile(r"\S+")
_LETTER_RE = re.compile(r"[^\W\d_]+")

# UAX29URLEmailTokenizer subset: full URLs (scheme:// or www.) and emails
# win over the standard word rules at the same start position, exactly like
# the reference grammar's longest-match precedence.
_URL_PAT = r"(?:(?:https?|ftp)://|www\.)[^\s<>\"'()]+[^\s<>\"'().,;!?]"
_EMAIL_PAT = r"[A-Za-z0-9._%+\-]+@(?:[A-Za-z0-9\-]+\.)+[A-Za-z]{2,}"
_URLEMAIL_RE = re.compile(
    "|".join([_URL_PAT, _EMAIL_PAT, _TOKEN_RE.pattern]))


def whitespace_tokenize(text: str) -> list[str]:
    """WhitespaceTokenizer.java: maximal runs of non-whitespace."""
    return _WS_RE.findall(text) if text else []


def keyword_tokenize(text: str) -> list[str]:
    """KeywordTokenizer.java: the entire input is one token."""
    return [text] if text else []


def letter_tokenize(text: str) -> list[str]:
    """LetterTokenizer.java: maximal runs of letters (digits/_ split)."""
    return _LETTER_RE.findall(text) if text else []


def url_email_tokenize(text: str) -> list[str]:
    """UAX29URLEmailTokenizer subset: URLs and emails stay whole, all
    other text follows the standard UAX#29 word rules."""
    return _URLEMAIL_RE.findall(text) if text else []


def path_hierarchy_tokenizer(delimiter: str = "/", replacement: str | None = None,
                             skip: int = 0):
    """PathHierarchyTokenizer.java:110-180: '/a/b/c' → '/a', '/a/b',
    '/a/b/c'; a trailing delimiter yields one more token ('/a/b/c/');
    ``skip`` drops that many leading segments and emitted tokens then start
    with the (replacement) delimiter: skip=1 on '/a/b/c' → '/b', '/b/c'.
    All tokens share one position (posInc 1,0,0,...)."""
    rep = delimiter if replacement is None else replacement

    def tok(text: str):
        if not text:
            return [], []
        segs = text.split(delimiter)
        if segs[0] == "":
            segs = segs[1:]
            lead = rep
        else:
            lead = ""
        if skip > 0:
            segs = segs[skip:]
            lead = rep
        toks = [lead + rep.join(segs[:i]) for i in range(1, len(segs) + 1)]
        toks = [t for t in toks if t]
        return toks, [0] * len(toks)

    return tok


def reverse_path_hierarchy_tokenizer(delimiter: str = "/",
                                     replacement: str | None = None,
                                     skip: int = 0):
    """ReversePathHierarchyTokenizer.java: '/a/b/c' → '/a/b/c', 'a/b/c',
    'b/c', 'c' (every suffix after a delimiter); ``skip`` drops the last
    ``skip`` segments and emitted tokens keep the trailing delimiter:
    skip=1 on '/a/b/c' → '/a/b/', 'a/b/', 'b/'."""
    rep = delimiter if replacement is None else replacement

    def tok(text: str):
        if not text:
            return [], []
        if skip > 0:
            segs = text.split(delimiter)
            if segs and segs[-1] == "":
                segs = segs[:-1]
            segs = segs[: len(segs) - skip]
            if not segs and not text.startswith(delimiter):
                return [], []
            text = delimiter.join(segs) + delimiter
        out = text if rep == delimiter else text.replace(delimiter, rep)
        toks = [out]
        for i, c in enumerate(text):
            if c == delimiter and i + 1 < len(text):
                toks.append(out[i + 1:])
        return toks, [0] * len(toks)

    return tok


# --- ClassicTokenizer (classic/ClassicTokenizerImpl.jflex grammar) ----------
# Longest match wins at each position; ties break by rule priority, the
# jflex file's order (ClassicTokenizerImpl.jflex:116-127).  ALPHANUM is
# letters+digits minus '_' and minus the CJ ranges (jflex LETTER =
# [:letter:] ! CJ, line 109-112); CJ chars emit one single-char token each.
# The NUM alternation (jflex:93-98) keeps joined product codes where every
# OTHER segment carries a digit (1-2-3, a1-b-c3) while plain slashed pairs
# split (ac/dc).  ACRONYM_DEP (trailing-dot host like 1.2.3.) re-types to
# HOST with the extra '.' removed (ClassicTokenizer.java:147-149).

_CT_CJ = ("㄀-ㄯ぀-ゟ゠-ヿㇰ-ㇿ"
          "㌀-㍿㐀-䶿一-鿿豈-﫿"
          "･-ﾟ")
_CT_ANC = rf"(?:(?![{_CT_CJ}])[^\W_])"       # ALPHANUM char (letter|digit)
_CT_A = rf"{_CT_ANC}+"                       # ALPHANUM
_CT_ALPHA = rf"(?:(?![{_CT_CJ}])[^\W\d_])+"  # ALPHA (letters only)
_CT_D = rf"(?={_CT_ANC}*\d){_CT_ANC}+"       # HAS_DIGIT
_CT_P = r"[-_/.,]"                           # punctuation joiner
_CT_RULES = [
    ("ALPHANUM", re.compile(_CT_A)),
    ("APOSTROPHE", re.compile(rf"{_CT_ALPHA}(?:'{_CT_ALPHA})+")),
    ("ACRONYM", re.compile(r"[^\W\d_]\.(?:[^\W\d_]\.)+")),
    ("COMPANY", re.compile(rf"{_CT_ALPHA}[&@]{_CT_ALPHA}")),
    ("EMAIL", re.compile(
        rf"{_CT_A}(?:[-._]{_CT_A})*@{_CT_A}(?:[-.]{_CT_A})+")),
    ("HOST", re.compile(rf"{_CT_A}(?:\.{_CT_A})+")),
    # NUM as two branches (digits in odd / in even segments) so the rule
    # loop's max-length pick reproduces flex longest-match exactly.
    ("NUM", re.compile(
        rf"{_CT_A}{_CT_P}{_CT_D}(?:{_CT_P}{_CT_A}{_CT_P}{_CT_D})*"
        rf"(?:{_CT_P}{_CT_A})?")),
    ("NUM", re.compile(
        rf"{_CT_D}{_CT_P}{_CT_A}(?:{_CT_P}{_CT_D}{_CT_P}{_CT_A})*"
        rf"(?:{_CT_P}{_CT_D})?")),
    ("CJ", re.compile(rf"[{_CT_CJ}]")),
    ("ACRONYM_DEP", re.compile(rf"{_CT_A}\.(?:{_CT_A}\.)+")),
]


def classic_tokenize(text: str, max_token_length: int = 255,
                     with_types: bool = False):
    """ClassicTokenizer: the pre-UAX#29 StandardTokenizer grammar — emails,
    acronyms (U.S.A.), company names (AT&T, Excite@Home), hosts
    (www.nutch.org, 216.239.63.104, 21.35), apostrophe words (O'Reilly),
    digit-bearing joined products (1-2-3, a1-b-c3), CJ chars one-by-one,
    plain alphanumerics.  Tokens longer than ``max_token_length`` are
    discarded (ClassicTokenizer.java:141 checks the raw match length)."""
    toks, types = [], []
    i, n = 0, len(text)
    while i < n:
        best, best_type = None, None
        for name, rx in _CT_RULES:
            m = rx.match(text, i)
            if m and (best is None or len(m.group(0)) > len(best)):
                best, best_type = m.group(0), name
        if best is None:
            i += 1
            continue
        width = len(best)
        if best_type == "ACRONYM_DEP":       # → HOST, strip the extra '.'
            best, best_type = best[:-1], "HOST"
        if width <= max_token_length:
            toks.append(best)
            types.append(best_type)
        i += width
    return (toks, types) if with_types else toks


def classic_filter(token: str, token_type: str) -> str:
    """ClassicFilter.java: strip dots from ACRONYM tokens and a trailing
    's (apostrophe-s) from APOSTROPHE tokens."""
    if token_type == "ACRONYM":
        return token.replace(".", "")
    if token_type == "APOSTROPHE" and token.lower().endswith("'s"):
        return token[:-2]
    return token


def classic_analyzer(stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
                     max_token_length: int = 255) -> Analyzer:
    """ClassicAnalyzer.java: ClassicTokenizer → ClassicFilter →
    LowerCaseFilter → StopFilter."""
    def tok(text: str) -> list[str]:
        toks, types = classic_tokenize(text, max_token_length, True)
        return [classic_filter(t, ty) for t, ty in zip(toks, types)]

    return Analyzer(stopwords=stopwords, tokenizer=tok)


def whitespace_analyzer() -> Analyzer:
    """WhitespaceAnalyzer.java: WhitespaceTokenizer, no filters, no casing."""
    return Analyzer(stopwords=frozenset(), tokenizer=whitespace_tokenize,
                    lowercase=False)


def simple_analyzer() -> Analyzer:
    """SimpleAnalyzer.java: LetterTokenizer + LowerCaseFilter."""
    return Analyzer(stopwords=frozenset(), tokenizer=letter_tokenize)


def keyword_analyzer(max_token_length: int = 1 << 20) -> Analyzer:
    """KeywordAnalyzer.java:26-34: whole field = one term, verbatim (the
    exact-match ID-field analyzer)."""
    return Analyzer(stopwords=frozenset(), tokenizer=keyword_tokenize,
                    lowercase=False, max_token_length=max_token_length)


def stop_analyzer(stopwords: frozenset[str] = ENGLISH_STOP_WORDS) -> Analyzer:
    """StopAnalyzer.java:33-41: LetterTokenizer + lowercase + stop filter."""
    return Analyzer(stopwords=stopwords, tokenizer=letter_tokenize)


def url_email_analyzer(stopwords: frozenset[str] = ENGLISH_STOP_WORDS) -> Analyzer:
    """UAX29URLEmailAnalyzer.java: URL/email-aware tokenizer + lowercase +
    stop filter."""
    return Analyzer(stopwords=stopwords, tokenizer=url_email_tokenize)


# --------------------------------------- round-4 analysis/common closures

# Unicode White_Space property (UnicodeProps.WHITESPACE — what
# UnicodeWhitespaceTokenizer splits on; differs from Java
# Character.isWhitespace by INCLUDING U+00A0/U+2007/U+202F and excluding
# the U+001C-001F separators)
_UNICODE_WS = ("\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0 "
               "         "
               "      　")
_UNICODE_WS_SET = frozenset(_UNICODE_WS) - frozenset("\x1c\x1d\x1e\x1f")


def unicode_whitespace_tokenize(text: str) -> list[str]:
    """UnicodeWhitespaceTokenizer (core/UnicodeWhitespaceTokenizer.java:
    28-60): maximal runs of characters without the Unicode White_Space
    property (so NBSP U+00A0 splits here but not in WhitespaceTokenizer)."""
    out, cur = [], []
    for c in text or "":
        if c in _UNICODE_WS_SET:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(c)
    if cur:
        out.append("".join(cur))
    return out


def pattern_tokenize(text: str, pattern: str, group: int = -1):
    """PatternTokenizer (pattern/PatternTokenizer.java:43-120): group >= 0
    emits that capture group of every match; group == -1 splits on matches
    (Java String.split semantics — but unlike split, trailing empties are
    dropped because empty tokens are never emitted).  Returns (tokens,
    (start, end) offsets)."""
    import re as _re

    rx = _re.compile(pattern)
    text = text or ""
    toks, offs = [], []
    if group >= 0:
        if group > (rx.groups or 0):
            raise ValueError(
                f"invalid group specified: pattern only has: {rx.groups}"
                " capturing groups")
        for m in rx.finditer(text):
            s, e = m.start(group), m.end(group)
            if s == -1 or s == e:
                continue
            toks.append(text[s:e])
            offs.append((s, e))
    else:
        last = 0
        for m in rx.finditer(text):
            if m.start() > last:
                toks.append(text[last:m.start()])
                offs.append((last, m.start()))
            last = m.end()
            if m.start() == m.end():  # zero-width match: avoid livelock
                last = max(last, m.end())
        if last < len(text):
            toks.append(text[last:])
            offs.append((last, len(text)))
    return toks, offs


def simple_pattern_tokenize(text: str, pattern: str):
    """SimplePatternTokenizer (pattern/SimplePatternTokenizer.java:40-130):
    emit every maximal non-overlapping match of the pattern (the reference
    runs a deterministic automaton; re.finditer over the same
    regular-language pattern yields the same tokens)."""
    import re as _re

    return [m.group() for m in _re.finditer(pattern, text or "")
            if m.group()]


def simple_pattern_split_tokenize(text: str, pattern: str):
    """SimplePatternSplitTokenizer (pattern/SimplePatternSplitTokenizer.
    java:38-120): the matches are the separators; emit the non-empty text
    between them."""
    import re as _re

    out, last = [], 0
    text = text or ""
    for m in _re.finditer(pattern, text):
        if m.start() > last:
            out.append(text[last:m.start()])
        last = max(last, m.end())
        if m.start() == m.end():
            break  # zero-width separator would livelock; stop like a DFA
    if last < len(text):
        out.append(text[last:])
    return out
