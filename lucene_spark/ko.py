"""Korean morphological analysis — a nori-lite lattice tokenizer.

Reference (under /root/reference/lucene/analysis/nori/src/java/org/apache/
lucene/analysis/ko/):

- ``KoreanTokenizer.java`` — Viterbi lattice over mecab-ko-dic entries;
  dictionary rows carry a MORPHEME DECOMPOSITION (an inflected eojeol like
  입니다 decomposes to 이/VCP + ᄇ니다/EF; a compound like 동계올림픽대회 to
  its noun parts), emitted per DecompoundMode — the analyzer default
  DISCARD keeps only the parts.
- ``KoreanPartOfSpeechStopFilter.java:36-56`` — DEFAULT_STOP_TAGS: E
  (all verbal endings), IC, J (all particles), MAG, MAJ, MM, SP, SSC,
  SSO, SC, SE, XPN, XSA, XSN, XSV, UNA, NA, VSV.
- ``KoreanAnalyzer.java`` — tokenizer(DISCARD) → POS stop → readings →
  lowercase.

Like :mod:`lucene_spark.ja`, this is NOT a mecab-ko-dic port (no
dictionary data in the container): the lexicon is a curated public
vocabulary whose entries carry the same (cost, POS, decomposition) row
shape, and the reference's own TestKoreanAnalyzer goldens that the
lexicon covers segment identically (tests/test_ko.py):
한국은 대단한 나라입니다 → 한국 대단 나라 이; 2018 평창 동계올림픽대회 →
2018 평창 동계 올림픽 대회.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass

# KoreanPartOfSpeechStopFilter.java:36-56 (Tag.E covers the EC/EF/EP/
# ETM/ETN ending family; Tag.J the JC/JKB/.../JX particle family)
KO_STOP_TAG_EXACT = frozenset(
    "IC MAG MAJ MM SP SSC SSO SC SE XPN XSA XSN XSV UNA NA VSV".split())


def _is_stop_tag(tag: str) -> bool:
    return tag in KO_STOP_TAG_EXACT or tag.startswith(("E", "J"))


# curated lexicon: surface -> (cost, [(morpheme, tag), ...]).  A plain
# entry decomposes to itself; an inflected/compound entry carries its
# mecab-ko-dic-style morpheme list (KoreanTokenizer's
# DictionaryToken.getMorphemes analog).
KO_LEXICON: dict[str, tuple[int, list[tuple[str, str]]]] = {
    # nouns
    "한국": (2800, [("한국", "NNP")]),
    "나라": (3000, [("나라", "NNG")]),
    "평창": (2800, [("평창", "NNP")]),
    "동계": (3000, [("동계", "NNG")]),
    "올림픽": (3000, [("올림픽", "NNG")]),
    "대회": (3000, [("대회", "NNG")]),
    "언어": (3000, [("언어", "NNG")]),
    "프로그래밍": (3200, [("프로그래밍", "NNG")]),
    "검색": (3000, [("검색", "NNG")]),
    "엔진": (3000, [("엔진", "NNG")]),
    # compounds: the analyzer's DISCARD mode emits only the parts
    "동계올림픽대회": (6000, [("동계", "NNG"), ("올림픽", "NNG"), ("대회", "NNG")]),
    "검색엔진": (4500, [("검색", "NNG"), ("엔진", "NNG")]),
    # particles (J*)
    "은": (400, [("은", "JX")]), "는": (400, [("는", "JX")]),
    "이": (450, [("이", "JKS")]), "가": (400, [("가", "JKS")]),
    "을": (400, [("을", "JKO")]), "를": (400, [("를", "JKO")]),
    "에": (400, [("에", "JKB")]), "의": (400, [("의", "JKG")]),
    "도": (450, [("도", "JX")]), "로": (450, [("로", "JKB")]),
    "와": (450, [("와", "JC")]), "과": (450, [("과", "JC")]),
    # inflected forms with their decompositions
    "대단한": (3200, [("대단", "XR"), ("하", "XSA"), ("ᆫ", "ETM")]),
    "입니다": (1200, [("이", "VCP"), ("ᄇ니다", "EF")]),
    "합니다": (1500, [("하", "VV"), ("ᄇ니다", "EF")]),
    "있다": (1500, [("있", "VA"), ("다", "EF")]),
    "했다": (1600, [("하", "VV"), ("었", "EP"), ("다", "EF")]),
    # punctuation
    ".": (100, [(".", "SF")]), ",": (100, [(",", "SC")]),
}

_MAX_WORD = max(len(s) for s in KO_LEXICON)


def _char_class(ch: str) -> str:
    o = ord(ch)
    if 0xAC00 <= o <= 0xD7A3 or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F:
        return "hangul"
    if ch.isascii() and ch.isalpha():
        return "latin"
    if ch.isdigit():
        return "digit"
    if ch.isspace():
        return "space"
    return "other"


@dataclass
class KoToken:
    surface: str
    pos: str
    start: int
    end: int


def ko_tokenize(text: str, decompound: str = "discard") -> list[KoToken]:
    """Viterbi lattice segmentation with mecab-ko-dic-shaped rows.
    ``decompound``: 'discard' emits only a decomposition's morphemes (the
    analyzer default), 'none' emits the surface with its FIRST morpheme's
    tag (KoreanTokenizer DecompoundMode.NONE keeps the compound)."""
    if decompound not in ("discard", "none"):
        raise ValueError("decompound must be 'discard' or 'none'")
    n = len(text)
    INF = float("inf")
    best = [INF] * (n + 1)
    back: list[tuple | None] = [None] * (n + 1)
    best[0] = 0.0

    for i in range(n):
        if best[i] == INF:
            continue
        cls = _char_class(text[i])
        if cls == "space":
            if best[i] < best[i + 1]:
                best[i + 1] = best[i]
                back[i + 1] = (i, None, None)
            continue
        # dictionary arcs
        for ln in range(1, min(_MAX_WORD, n - i) + 1):
            s = text[i:i + ln]
            if s in KO_LEXICON:
                cost, morphs = KO_LEXICON[s]
                # a word boundary bonus: an arc ending at a space or the
                # end of the eojeol is preferred (eojeol-final inflections)
                j = i + ln
                edge = 0 if (j == n or _char_class(text[j]) == "space"
                             or s in KO_LEXICON) else 200
                total = best[i] + cost + edge
                if total < best[j]:
                    best[j] = total
                    back[j] = (i, s, morphs)
        # unknown arcs: class runs (hangul run = unknown noun, latin run =
        # SL, digit run = SN — nori's CharacterDefinition); for hangul,
        # shorter prefixes of the run are also candidates at the SAME
        # per-char rate so a known particle can split off an unknown stem
        # (서울은 → 서울 + 은).  A full known-arc parse always wins because
        # lexicon costs sit far below the unknown rate.
        j = i + 1
        while j < n and _char_class(text[j]) == cls:
            j += 1
        run = text[i:j]
        tag = {"hangul": "NNG", "latin": "SL", "digit": "SN"}.get(cls, "SY")
        ends = [j]
        if cls == "hangul":
            # every proper prefix of the run is a candidate at the same
            # per-char rate, so a known particle/ending can split off an
            # unknown stem of ANY length (서울은 → 서울 + 은); runs are
            # eojeol-bounded so this stays O(|eojeol|) arcs per position
            ends.extend(range(i + 1, j))
        for e in ends:
            s = text[i:e]
            total = best[i] + 8000 + 2000 * len(s)
            if total < best[e]:
                best[e] = total
                back[e] = (i, s, [(s, tag)])

    toks: list[KoToken] = []
    j = n
    while j > 0:
        i, s, morphs = back[j]
        if s is not None:
            if decompound == "none":
                toks.append(KoToken(s, morphs[0][1], i, j))
            elif len(morphs) == 1:
                toks.append(KoToken(morphs[0][0], morphs[0][1], i, j))
            else:
                for m, t in reversed(morphs):
                    toks.append(KoToken(m, t, i, j))
        j = i
    toks.reverse()
    return toks


# --- KoreanNumberFilter (nori KoreanNumberFilter.java) ----------------------
# identical grammar to the kuromoji number filter, hangul char sets

_KN_DIGITS = {**{chr(ord("0") + d): d for d in range(10)},
              **{chr(ord("０") + d): d for d in range(10)},
              "영": 0, "일": 1, "이": 2, "삼": 3, "사": 4,
              "오": 5, "육": 6, "칠": 7, "팔": 8, "구": 9}
_KN_MID = {"십": 10, "백": 100, "천": 1000}
_KN_LARGE = {"만": 10 ** 4, "억": 10 ** 8, "조": 10 ** 12,
             "경": 10 ** 16, "해": 10 ** 20}
KO_NUMERAL_CHARS = (set(_KN_DIGITS) | set(_KN_MID) | set(_KN_LARGE)
                    | {".", "．", ",", "，"})


def parse_korean_number(s: str) -> str | None:
    """KoreanNumberFilter.java's numeral grammar — hangul digits 영…구,
    mid powers 십/백/천 (dumb-sum: 십십 = 20), large powers 만/억/조/경/해
    with implicit-1 groups (해경조억만천백십일 = 100010001000100011111),
    separators and exact decimals — via the shared grammar core."""
    from .ja import _parse_cjk_number

    return _parse_cjk_number(s, _KN_DIGITS, _KN_MID, _KN_LARGE,
                             KO_NUMERAL_CHARS)


def ko_analyze(text: str) -> list[str]:
    """KoreanAnalyzer chain (KoreanAnalyzer.java: tokenizer(DISCARD) →
    KoreanPartOfSpeechStopFilter(default tags) → lowercase)."""
    out = []
    for t in ko_tokenize(text, decompound="discard"):
        if _is_stop_tag(t.pos):
            continue
        s = unicodedata.normalize("NFKC", t.surface).lower()
        if s and t.pos not in ("SF", "SY"):
            out.append(s)
    return out


class KoreanAnalyzer:
    """Analyzer-interface wrapper for RoutingAnalyzer ``for_lang("ko")``."""

    __slots__ = ()

    def analyze_text(self, text: str) -> tuple[list[str], list[int]]:
        toks = ko_tokenize(text, decompound="discard")
        out, poss = [], []
        for pos, t in enumerate(toks):
            if _is_stop_tag(t.pos) or t.pos in ("SF", "SY"):
                continue
            s = unicodedata.normalize("NFKC", t.surface).lower()
            if s:
                out.append(s)
                poss.append(pos)
        return out, poss
