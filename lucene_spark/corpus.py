"""Deterministic Common-Crawl-style synthetic corpus (FIXTURES.md §1-2).

Pure function of (seed, row index): every run, every scale prefix-consistent.
Shapes exercised (mirroring the reference's analysis + BM25 machinery):
Zipf(s≈1.1) term draws over ~10k stems (head-term skew for the salting path),
the 33-word English stop list at natural frequency, lognormal doc lengths
5..2000 (SmallFloat norm buckets — exact <40, quantized above), and a
deterministic sprinkle of analyzer edge cases from TestStandardAnalyzer
(mixed case, numbers, apostrophes, hyphens, CJK, emoji, >255-char token).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analysis import ENGLISH_STOP_WORDS

_SPECIALS = [
    "FooBar mixed Case TEXT",
    "pi is 3.14 and R2D2 C3PO serial 216.239.63.104",
    "don't O'Reilly's you're she's",
    "some-dashed-phrase ac/dc dogs,chase,cats",
    "john.doe@example.com http://example.org/path",
    "我是中国人 ﾃｽﾄ カタカナ ひらがな",
    "emoji 🏀 here 💩 and 👩‍❤️‍👩 flags 🇺🇸",
    "longtoken" + "x" * 300,  # > 255 chars → must be skipped by the analyzer
]


def _vocab(n_stems: int = 10_000) -> np.ndarray:
    """~10k deterministic lowercase stems: w0000..w9999 style plus the
    benchmark query-terms words so reference-style queries hit real postings
    (benchmark/conf/query-terms.txt)."""
    base = [
        "court", "law", "trains", "planes", "automobiles", "ships", "greatest",
        "guitarists", "news", "world", "report", "market", "science", "music",
        "water", "river", "field", "stone", "light", "night",
    ]
    gen = [f"w{i:05d}" for i in range(n_stems - len(base))]
    return np.array(base + gen, dtype=object)


def generate_pages(
    n_docs: int,
    seed: int = 42,
    n_stems: int = 10_000,
    zipf_s: float = 1.1,
    specials_every: int = 997,
) -> pd.DataFrame:
    """pages(url, warc_ts, html, text, lang) — FIXTURES.md §1 contract."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(n_stems)
    stops = np.array(sorted(ENGLISH_STOP_WORDS), dtype=object)

    # doc lengths: lognormal clipped to 5..2000
    dl = np.clip(rng.lognormal(mean=4.0, sigma=1.0, size=n_docs), 5, 2000).astype(np.int64)

    # Zipf ranks via inverse-CDF on a power law (bounded, vectorized)
    ranks = np.arange(1, n_stems + 1, dtype=np.float64)
    probs = ranks ** (-zipf_s)
    probs /= probs.sum()
    cdf = np.cumsum(probs)

    total_tokens = int(dl.sum())
    draws = np.searchsorted(cdf, rng.random(total_tokens))
    is_stop = rng.random(total_tokens) < 0.25  # natural stopword frequency
    stop_idx = rng.integers(0, len(stops), total_tokens)

    tokens = np.where(is_stop, stops[stop_idx], vocab[draws])
    offsets = np.concatenate([[0], np.cumsum(dl)])

    texts = []
    for i in range(n_docs):
        words = tokens[offsets[i] : offsets[i + 1]]
        t = " ".join(words.tolist())
        if i % specials_every == 0:
            t = t + " " + _SPECIALS[(i // specials_every) % len(_SPECIALS)]
        texts.append(t)

    urls = [f"https://example{i % 97}.org/p/{i:08d}" for i in range(n_docs)]
    warc_ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(np.arange(n_docs), unit="s")
    lang = np.where(
        np.arange(n_docs) % 40 == 17, "de", np.where(np.arange(n_docs) % 40 == 33, "fr", "en")
    )
    html = [b"<html><body>" + t.encode("utf-8") + b"</body></html>" for t in texts]
    return pd.DataFrame(
        {"url": urls, "warc_ts": warc_ts, "html": html, "text": texts, "lang": lang}
    )


def generate_queries(seed: int = 42) -> pd.DataFrame:
    """~60 reference-style queries (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocab()
    head = [str(v) for v in vocab[:8]]
    mid = [str(vocab[30 + i]) for i in range(8)]
    tail = [f"w{int(i):05d}" for i in rng.integers(2000, 9000, 8)]
    rows = []

    def add(q, mode, k):
        rows.append({"qid": len(rows), "query": q, "mode": mode, "k": k})

    for t in head + mid + [*tail[:4]]:
        add(t, "OR", 10)
    for i in range(15):
        terms = rng.choice(head + mid, size=2 + i % 4, replace=False)
        add(" ".join(terms), "OR", 10 if i % 2 else 100)
    for i in range(15):
        terms = rng.choice(head + mid, size=2 + i % 3, replace=False)
        add(" AND ".join(terms), "AND", 10 if i % 2 else 100)
    add("(court AND law) OR ships", "MIXED", 10)
    add("(planes AND trains AND automobiles) OR ships", "MIXED", 10)
    add("(water AND river) OR (light AND night)", "MIXED", 10)
    add("(market AND report) OR news", "MIXED", 100)
    add("(science AND music) OR w00042", "MIXED", 10)
    # edge cases
    add("the and of", "OR", 10)  # stopword-only → empty
    add("zzzznotaterm", "OR", 10)  # unknown term
    add("court court court", "OR", 10)  # duplicates
    add("x" * 300, "OR", 10)  # >255-char term → skipped → empty
    add("COURT Law", "OR", 10)  # case folding
    return pd.DataFrame(rows)
