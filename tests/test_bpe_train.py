"""BPE merge training duel: the distributed implementation vs a direct
transcription of Sennrich et al. (ACL 2016) Algorithm 1."""

import pytest

from lucene_spark.textops import bpe_train

EOW = "</w>"


def naive_bpe(word_freqs: dict[str, int], num_merges: int,
              min_pair_count: int = 2):
    vocab = {tuple(list(w) + [EOW]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_pair_count:
            break
        merges.append((left, right, n))
        new_vocab = {}
        for syms, f in vocab.items():
            s, i, res = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + f
        vocab = new_vocab
    return merges


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _corpus_df(spark, word_freqs, n_docs=4):
    # spread the words across documents to exercise the corpus->vocab reduce
    bag = [w for w, f in sorted(word_freqs.items()) for _ in range(f)]
    rows = [(i, " ".join(bag[i::n_docs])) for i in range(n_docs)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_sennrich_example(spark):
    got = bpe_train(_corpus_df(spark, SENNRICH), num_merges=8)
    assert got == naive_bpe(SENNRICH, 8)
    # the classic first merges: (e,s) then (es,t) then (est,</w>)
    assert got[0] == ("e", "s", 9)
    assert got[1] == ("es", "t", 9)
    assert got[2] == ("est", EOW, 9)


def test_bpe_overlapping_pairs(spark):
    # 'aaaa' has three (a,a) positions; after merging, 'aa','aa' remains
    freqs = {"aaaa": 4, "ab": 3}
    got = bpe_train(_corpus_df(spark, freqs, n_docs=2), num_merges=3,
                    min_pair_count=1)
    assert got == naive_bpe(freqs, 3, min_pair_count=1)
    assert got[0] == ("a", "a", 12)  # 3 positions x freq 4


def test_bpe_min_pair_count_stops(spark):
    freqs = {"xy": 1}
    got = bpe_train(_corpus_df(spark, freqs, n_docs=1), num_merges=5,
                    min_pair_count=2)
    assert got == []


@pytest.mark.parametrize("seed", [7, 19])
def test_bpe_random_duel(spark, seed):
    import random

    rnd = random.Random(seed)
    alphabet = "abcde"
    freqs = {
        "".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 6))):
        rnd.randint(1, 9)
        for _ in range(12)
    }
    got = bpe_train(_corpus_df(spark, freqs), num_merges=6)
    assert got == naive_bpe(freqs, 6)


def test_bpe_encode_duel(spark):
    from lucene_spark.textops import bpe_encode

    merges = naive_bpe(SENNRICH, 8)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    def enc(w):
        s = list(w) + [EOW]
        while len(s) > 1:
            cand = [(ranks.get((a, b), len(ranks)), i)
                    for i, (a, b) in enumerate(zip(s, s[1:]))]
            rk, i = min(cand)
            if rk == len(ranks):
                break
            s[i:i + 2] = [s[i] + s[i + 1]]
        return s

    df = _corpus_df(spark, SENNRICH)
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
           for r in bpe_encode(df, merges).collect()}
    for r in df.collect():
        want = [t for w in r["text"].split() for t in enc(w)]
        assert got[r["doc_id"]] == (want, len(want))
    # unseen word degrades to the longest learned pieces, never crashes
    df2 = spark.createDataFrame([(9, "lowest Newish 42")],
                                "doc_id long, text string")
    row = bpe_encode(df2, merges).collect()[0]
    assert list(row["tokens"]) == ["low", "est</w>",
                                   "n", "ew", "i", "s", "h", "</w>"]
