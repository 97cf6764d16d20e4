"""Property-fuzz of the kuromoji-lite unknown-word (character-class) path
against the reference's UnknownDictionary semantics
(analysis/kuromoji/src/java/org/apache/lucene/analysis/ja/
JapaneseTokenizer.java:975-1012 + dict/CharacterDefinition.isGroup/isInvoke,
IPADIC char.def flags):

  - GROUPED classes (KATAKANA, ALPHA, NUMERIC, HIRAGANA): one unknown arc
    spans the whole same-class run;
  - non-grouped KANJI: length-1 arcs only, so OOV kanji segment per char
    (the reference's testSurrogates golden);
  - invoke=0 classes (KANJI, HIRAGANA): unknown arcs added only when no
    dictionary entry starts at the position.

Plus new reference goldens beyond the original five sentences
(TestJapaneseTokenizer.java testSurrogates:409, testSearchModeNbest:197-202,
testNormalMode:161).
"""

import random

from lucene_spark.ja import JA_LEXICON, _char_class, ja_tokenize


def seg(t, mode="search"):
    return [x.surface for x in ja_tokenize(t, mode=mode)]


def seg_nopunct(t, mode="search"):
    # discardPunctuation=true (the reference tokenizer's default): the
    # analyzer drops 記号 tokens via the POS stop filter
    return [x.surface for x in ja_tokenize(t, mode=mode)
            if not x.pos.startswith("記号")]


# ---------------------------------------------------------------- goldens


def test_surrogates_reference_golden():
    # TestJapaneseTokenizer.testSurrogates:409 — rare (incl. supplementary-
    # plane) kanji are unknown, KANJI is not grouped → one token per char
    assert seg("𩬅艱鍟䇹愯瀛") == ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]


def test_search_mode_nbest_base_golden():
    # TestJapaneseTokenizer.testSearchModeNbest:202 (nBestCost=0 baseline)
    assert seg_nopunct("成田空港、米原油流出") == [
        "成田", "空港", "米", "原油", "流出"]
    # testNormalModeNbest:191 (nBestCost=0): normal mode keeps the compound
    assert seg_nopunct("成田空港、米原油流出", "normal") == [
        "成田空港", "米", "原油", "流出"]


def test_punctuation_discard_golden():
    # TestJapaneseTokenizer.java:813 — 羽田。空港 → 羽田 / 空港 with the
    # punctuation dropped (discardPunctuation); 羽田 is OOV kanji here so
    # the faithful non-grouped path yields per-char tokens
    assert seg_nopunct("東京。大学", "normal") == ["東京", "大学"]


# ------------------------------------------------------------ fuzz helpers

KATAKANA = "ガギグゲゴザジズゼゾダヂヅデドバビブベボパピプペポ"
HIRAGANA = "ぱぴぷぺぽゃゅょっぁぃぅぇぉ"
KANJI_RARE = [chr(c) for c in range(0x3400, 0x3460)]  # CJK ext A, not in lexicon
LATIN = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
DIGITS = "0123456789"

_LEX_SUBSTRINGS = set(JA_LEXICON)


def _clean(s: str) -> bool:
    """No lexicon entry occurs anywhere inside s (pure unknown input)."""
    return not any(w in s for w in _LEX_SUBSTRINGS if w)


def _runs(s: str):
    out, cur, cls = [], "", None
    for ch in s:
        c = _char_class(ch)
        if c == cls:
            cur += ch
        else:
            if cur:
                out.append((cls, cur))
            cur, cls = ch, c
    if cur:
        out.append((cls, cur))
    return out


# ---------------------------------------------------------------- fuzz


def test_fuzz_grouped_classes_group_whole_run():
    """KATAKANA / ALPHA / NUMERIC / HIRAGANA runs with no dictionary hits
    come back as exactly ONE token (CharacterDefinition GROUP flag)."""
    rng = random.Random(42)
    alphabets = [KATAKANA, LATIN, DIGITS, HIRAGANA]
    for trial in range(300):
        alpha = alphabets[trial % 4]
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        if not _clean(s):
            continue
        toks = ja_tokenize(s)
        assert [t.surface for t in toks] == [s], (s, toks)


def test_fuzz_kanji_never_grouped():
    """OOV kanji runs segment per character — length-1 unknown arcs only
    (JapaneseTokenizer.java:976-977: !isGroup → unknownWordLength = 1)."""
    rng = random.Random(43)
    for _ in range(300):
        s = "".join(rng.choice(KANJI_RARE) for _ in range(rng.randint(1, 8)))
        if not _clean(s):
            continue
        toks = ja_tokenize(s)
        assert [t.surface for t in toks] == list(s), (s, toks)


def test_fuzz_script_boundaries_break_unknown_tokens():
    """Mixed-script OOV text: every class run is one token for grouped
    classes, per-char for kanji; tokens tile the input exactly."""
    rng = random.Random(44)
    alphabets = {"katakana": KATAKANA, "latin": LATIN, "digit": DIGITS,
                 "kanji": "".join(KANJI_RARE)}
    for _ in range(200):
        parts = []
        prev = None
        for _ in range(rng.randint(2, 5)):
            cls = rng.choice([c for c in alphabets if c != prev])
            prev = cls
            parts.append((cls, "".join(rng.choice(alphabets[cls])
                                       for _ in range(rng.randint(1, 5)))))
        s = "".join(p for _, p in parts)
        if not _clean(s):
            continue
        expected = []
        for cls, run in parts:
            if cls == "kanji":
                expected.extend(run)
            else:
                expected.append(run)
        toks = ja_tokenize(s)
        assert [t.surface for t in toks] == expected, (s, toks)


def test_fuzz_tokens_tile_text_with_lexicon_words():
    """Arbitrary mixes of lexicon words, unknown runs, spaces and
    punctuation: surfaces always tile the input — offsets contiguous per
    token, concatenation equals the input minus whitespace."""
    rng = random.Random(45)
    lex = [w for w in JA_LEXICON if w]
    for _ in range(200):
        pieces = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            if r < 0.4:
                pieces.append(rng.choice(lex))
            elif r < 0.6:
                pieces.append("".join(rng.choice(KATAKANA)
                                      for _ in range(rng.randint(1, 4))))
            elif r < 0.75:
                pieces.append(rng.choice(KANJI_RARE))
            elif r < 0.85:
                pieces.append(" ")
            else:
                pieces.append(rng.choice("、。「」"))
        s = "".join(pieces)
        toks = ja_tokenize(s)
        # offsets: strictly increasing, within bounds, surface == slice
        pos = 0
        for t in toks:
            assert t.start >= pos
            assert s[t.start:t.end] == t.surface
            # skipped gap must be whitespace only
            assert s[pos:t.start].strip() == ""
            pos = t.end
        assert s[pos:].strip() == ""
        assert "".join(t.surface for t in toks) == "".join(s.split())


def test_fuzz_invoke_gate_dictionary_positions():
    """invoke=0 (KANJI): where a dictionary word starts, no unknown arc is
    added — a lexicon kanji word never splits even when surrounded by OOV
    kanji neighbours."""
    rng = random.Random(46)
    words = [w for w, (tag, _, _) in JA_LEXICON.items()
             if len(w) >= 2 and all(_char_class(c) == "kanji" for c in w)
             and tag.startswith("名詞")]
    for _ in range(100):
        w = rng.choice(words)
        s = rng.choice(KANJI_RARE) + w + rng.choice(KANJI_RARE)
        if not _clean(s[:1]) or not _clean(s[-1:]):
            continue
        surfaces = seg(s, "normal")
        assert w in surfaces, (s, surfaces)
