"""Property-fuzz of the nori-lite unknown-word path
(analysis/nori/src/java/org/apache/lucene/analysis/ko/
KoreanTokenizer.java:848-880 + dict/CharacterDefinition): latin (SL) and
digit (SN) runs group whole; unknown hangul runs may split only so a known
particle/suffix can separate (the prefix-arc rule); tokens always tile the
input."""

import random

from lucene_spark.ko import KO_LEXICON, ko_tokenize


def surf(t, **kw):
    return [x.surface for x in ko_tokenize(t, **kw)]


HANGUL = [chr(c) for c in range(0xAC00, 0xAC60)]  # 가..곟 block slice
LATIN = "abcdefghijklmnopqrstuvwxyzXYZ"
DIGITS = "0123456789"

_LEX = set(KO_LEXICON)


def _clean(s):
    return not any(w in s for w in _LEX if w)


def test_fuzz_latin_digit_runs_group_whole():
    rng = random.Random(52)
    for trial in range(300):
        alpha = LATIN if trial % 2 else DIGITS
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        toks = ko_tokenize(s)
        assert [t.surface for t in toks] == [s], (s, toks)
        assert toks[0].pos == ("SL" if trial % 2 else "SN")


def test_fuzz_unknown_hangul_particle_splits():
    """An unknown hangul stem followed by a lexicon particle: the particle
    splits off (the reference resolves 서울은 via the unknown NNG arc +
    dictionary JX arc)."""
    rng = random.Random(53)
    particles = [w for w, (_, m) in KO_LEXICON.items()
                 if len(w) == 1 and m[0][1].startswith("J")]
    for _ in range(150):
        stem = "".join(rng.choice(HANGUL) for _ in range(rng.randint(2, 4)))
        if not _clean(stem):
            continue
        p = rng.choice(particles)
        s = stem + p
        got = surf(s)
        assert got[-1] == p, (s, got)
        assert "".join(got) == s


def test_fuzz_tokens_tile_text():
    rng = random.Random(54)
    lex = [w for w in KO_LEXICON if w not in (".", ",")]
    for _ in range(200):
        pieces = []
        for _ in range(rng.randint(1, 7)):
            r = rng.random()
            if r < 0.4:
                pieces.append(rng.choice(lex))
            elif r < 0.6:
                pieces.append("".join(rng.choice(HANGUL)
                                      for _ in range(rng.randint(1, 3))))
            elif r < 0.75:
                pieces.append("".join(rng.choice(LATIN)
                                      for _ in range(rng.randint(1, 4))))
            else:
                pieces.append(" ")
        s = "".join(pieces)
        toks = ko_tokenize(s, decompound="none")
        pos = 0
        for t in toks:
            assert t.start >= pos
            assert s[t.start:t.end] == t.surface
            assert s[pos:t.start].strip() == ""
            pos = t.end
        assert s[pos:].strip() == ""
