"""BM25NBClassifier + KNearestFuzzyClassifier analogs
(classification/BM25NBClassifier.java:43-231,
KNearestFuzzyClassifier.java:44-148)."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.classify import classify_bm25_nb, classify_knn_fuzzy
from lucene_spark.index import build_index


ROWS = [
    ("u0", "spark shuffle partition executor", "tech"),
    ("u1", "spark executor memory shuffle", "tech"),
    ("u2", "partition shuffle spark", "tech"),
    ("u3", "pasta tomato basil olive", "food"),
    ("u4", "basil olive pasta", "food"),
    ("u5", "tomato pasta sauce", "food"),
]


@pytest.fixture(scope="module")
def nb_setup(spark):
    docs = spark.createDataFrame(
        [(u, t) for u, t, _ in ROWS], "url string, text string")
    idx = build_index(spark, docs, seg_size=4)
    url2lab = {u: lab for u, _, lab in ROWS}
    labels = idx.docs.select("docid", "url").withColumn(
        "label", F.udf(lambda u: url2lab[u])("url")
    ).select(F.col("docid").alias("doc_id"), F.col("label").alias("lang"))
    return idx, labels


def _brute_bm25_nb(tokens, want_label):
    """Reference algorithm in plain python over ROWS (float64 BM25,
    k1=1.2, b=0.75) — the duel oracle."""
    texts = [t.split() for _, t, _ in ROWS]
    labs = [lab for _, _, lab in ROWS]
    n = len(texts)
    dls = [len(t) for t in texts]
    avgdl = sum(dls) / n
    k1, b = 1.2, 0.75

    def bm25(term, i):
        df = sum(1 for t in texts if term in t)
        if df == 0 or term not in texts[i]:
            return 0.0
        w = math.log(1 + (n - df + 0.5) / (df + 0.5))
        tf = texts[i].count(term)
        inv = 1.0 / (k1 * ((1 - b) + b * dls[i] / avgdl))
        return w - w / (1 + tf * inv)

    out = {}
    for c in sorted(set(labs)):
        dfc = labs.count(c)
        wc = math.log(1 + (n - dfc + 0.5) / (dfc + 0.5))
        cs = wc - wc / (1 + 1.0 / (k1 * ((1 - b) + b)))
        score = math.log(cs)
        for w_ in tokens:
            mx = max((bm25(w_, i) for i in range(n) if labs[i] == c),
                     default=0.0)
            score += math.log(cs + mx)
        out[c] = score
    smax = max(out.values())
    loga = smax + math.log(sum(math.exp(s - smax) for s in out.values()))
    return {c: math.exp(s - loga) for c, s in out.items()}


def test_bm25_nb_matches_reference_algorithm(spark, nb_setup):
    idx, labels = nb_setup
    got = {r["label"]: r["score"]
           for r in classify_bm25_nb(idx, "spark shuffle", labels).collect()}
    want = _brute_bm25_nb(["spark", "shuffle"], "tech")
    assert set(got) == set(want)
    for c in want:
        assert abs(got[c] - want[c]) < 1e-12, c
    assert max(got, key=got.get) == "tech"
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_bm25_nb_repeated_tokens_and_other_class(spark, nb_setup):
    idx, labels = nb_setup
    got = {r["label"]: r["score"]
           for r in classify_bm25_nb(idx, "pasta pasta tomato",
                                     labels).collect()}
    want = _brute_bm25_nb(["pasta", "pasta", "tomato"], "food")
    for c in want:
        assert abs(got[c] - want[c]) < 1e-12, c
    assert max(got, key=got.get) == "food"


def test_knn_fuzzy_classifies_typos(spark, nb_setup):
    idx, labels = nb_setup
    # 'spark'/'shuffle' misspelled within 1 Damerau edit
    row = classify_knn_fuzzy(idx, "sparc shufle", labels, k=3).collect()
    assert row and row[0]["label"] == "tech"
    row = classify_knn_fuzzy(idx, "pazta tomaot", labels, k=3).collect()
    assert row and row[0]["label"] == "food"
    assert classify_knn_fuzzy(idx, "zzzzzzz", labels, k=3).collect() == []


# ---------------------------------------------------------------- perceptron


PERC_ROWS = [
    ("u0", "spark shuffle partition executor spark", True),
    ("u1", "pasta tomato basil olive pasta pasta", False),
    ("u2", "spark executor memory", True),
    ("u3", "basil olive sauce", False),
    ("u4", "spark shuffle executor partition", True),
    ("u5", "tomato pasta sauce olive basil tomato", False),
]


def _brute_perceptron(rows, query_tokens, batch_size):
    """BooleanPerceptronClassifier.java:58-235 replayed in plain python:
    weights init = cf, bias = sttf/doccount, FST snapshot refreshed on
    misclassification when batchCount % batchSize == 0."""
    texts = [t.split() for _, t, _ in rows]
    cf = {}
    for toks in texts:
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
    bias = sum(len(t) for t in texts) / len(texts)
    fst = dict(cf)
    weights = dict(cf)
    batch_count = 0
    for toks, (_, _, cls) in zip(texts, rows):
        out = sum(fst.get(t, 0) for t in toks)
        assigned = out >= bias
        modifier = int(cls) - int(assigned)
        if modifier != 0:
            tfd = {}
            for t in toks:
                tfd[t] = tfd.get(t, 0) + 1
            for t, tf in tfd.items():
                prev = fst.get(t)
                weights[t] = 0 if prev is None else max(0, prev + modifier * tf)
            if batch_count % batch_size == 0:
                fst = dict(weights)
        batch_count += 1
    out = sum(fst.get(t, 0) for t in query_tokens)
    return out >= bias, out, 1.0 - math.exp(-abs(bias - out) / bias)


@pytest.mark.parametrize("batch_size", [1, 3])
def test_boolean_perceptron_duel(spark, batch_size):
    from lucene_spark.classify import classify_boolean_perceptron

    docs = spark.createDataFrame(
        [(u, t) for u, t, _ in PERC_ROWS], "url string, text string")
    idx = build_index(spark, docs, seg_size=4)
    u2c = {u: c for u, _, c in PERC_ROWS}
    train = idx.docs.select("docid", "url").withColumn(
        "cls", F.udf(lambda u: u2c[u], "boolean")("url")
    ).join(docs, "url").select(F.col("docid").alias("doc_id"), "text", "cls")
    for q in ["spark shuffle", "pasta tomato basil", "unseen words only"]:
        got = classify_boolean_perceptron(
            idx, train, q, batch_size=batch_size, stopwords=frozenset()
        ).collect()[0]
        want_cls, want_out, want_score = _brute_perceptron(
            PERC_ROWS, q.split(), batch_size)
        assert (got["assigned"], got["output"]) == (want_cls, want_out), q
        assert abs(got["score"] - want_score) < 1e-12, q
