"""LRUQueryCache + UsageTrackingQueryCachingPolicy analogs
(search/LRUQueryCache.java, UsageTrackingQueryCachingPolicy.java)."""

import pytest

from lucene_spark.index import build_index
from lucene_spark.querycache import (
    LRUQueryCache,
    UsageTrackingQueryCachingPolicy,
)
from lucene_spark.search import search


@pytest.fixture(scope="module")
def qidx(spark):
    docs = spark.createDataFrame(
        [(i, f"spark window {'join ' * (i % 3)}word{i % 5}", "en")
         for i in range(40)],
        "doc_id long, text string, lang string")
    return build_index(spark, docs, text_col="text", key_col="doc_id",
                       docid_col="doc_id")


def test_policy_frequencies():
    p = UsageTrackingQueryCachingPolicy()
    q_or = ("or", [("term", "a"), ("term", "b")])
    # compound queries cache at 4 uses (:128-136)
    for i in range(3):
        p.on_use(q_or)
        assert not p.should_cache(q_or)
    p.on_use(q_or)
    assert p.should_cache(q_or)
    # costly at 2
    q_set = ("term_set", ["a", "b"])
    p.on_use(q_set)
    assert not p.should_cache(q_set)
    p.on_use(q_set)
    assert p.should_cache(q_set)
    # TermQuery never cached (:55-63)
    q_t = ("term", "a")
    for _ in range(10):
        p.on_use(q_t)
    assert not p.should_cache(q_t)
    # ring-buffer history bounds frequencies (256 entries)
    p2 = UsageTrackingQueryCachingPolicy(history_size=4)
    for _ in range(4):
        p2.on_use(q_or)
    assert p2.frequency(q_or) == 4
    for _ in range(4):
        p2.on_use(q_set)
    assert p2.frequency(q_or) == 0  # aged out of the ring


def test_cache_hit_and_same_results(qidx):
    cache = LRUQueryCache()
    q = ("or", [("term", "join"), ("term", "word1")])
    dfs = [cache.get_filter(qidx, q) for _ in range(5)]
    assert cache.hit_count == 1 and cache.miss_count == 4
    assert cache.cache_count == 1
    want = sorted(r.docid for r in dfs[0].collect())
    assert sorted(r.docid for r in dfs[-1].collect()) == want
    # filtered search through the cached filter == uncached
    td1 = search(qidx, "spark", k=5, precision="float64",
                 filter_docs=cache.get_filter(qidx, q))
    td2 = search(qidx, "spark", k=5, precision="float64",
                 filter_docs=cache._compute(qidx, q))
    assert td1.docids.tolist() == td2.docids.tolist()
    assert td1.scores.tolist() == td2.scores.tolist()


def test_lru_eviction(qidx):
    cache = LRUQueryCache(max_count=1)
    q1 = ("or", [("term", "join"), ("term", "word1")])
    q2 = ("or", [("term", "join"), ("term", "word2")])
    for _ in range(4):
        cache.get_filter(qidx, q1)
    for _ in range(4):
        cache.get_filter(qidx, q2)
    assert cache.eviction_count == 1
    assert len(cache._cache) == 1
    cache.clear()
    assert len(cache._cache) == 0
