"""Filter caching — LRUQueryCache + UsageTrackingQueryCachingPolicy analogs.

Reference:
- ``search/LRUQueryCache.java`` — caches per-segment DocIdSets of FILTER
  clauses, LRU-evicted by entry count / RAM; exposes hitCount/missCount/
  cacheCount/evictionCount.
- ``search/UsageTrackingQueryCachingPolicy.java`` — a 256-entry ring
  buffer of recently-used filter hashes; a filter becomes cacheable once
  seen minFrequencyToCache times: 2 for costly queries (MultiTermQuery /
  TermInSetQuery / point queries, :45-52,124-127), 4 for compound
  (Boolean/DisjunctionMax, :128-137), 5 otherwise; TermQuery /
  MatchAllDocs / empty compounds are never cached (:55-97).

Spark analog: the cached artifact is the query's MATCH-SET DataFrame
(docid rows) **persisted** (``StorageLevel.MEMORY_AND_DISK``) — the
DocIdSet bitset analog; eviction unpersists.  The cached frame plugs into
``search(filter_docs=...)`` — the BooleanClause.Occur.FILTER path.  At
cluster scale the persisted match set lives partitioned across executors,
exactly where the postings partitions that produced it live, so reuse
skips the posting-decode stage entirely (the same work LRUQueryCache
saves Lucene).
"""

from __future__ import annotations

from collections import Counter, OrderedDict, deque

from pyspark.sql import DataFrame

from .index import Index

_COSTLY_KINDS = {"multiterm", "prefix", "wildcard", "regexp", "fuzzy",
                 "range", "term_set", "point"}
_COMPOUND_KINDS = {"and", "or", "andn", "reqopt", "reqoptn", "not", "notn",
                   "dismax", "msm"}
_NEVER_KINDS = {"term", "match_all"}


def _node_kind(query) -> str:
    if isinstance(query, tuple) and query:
        return str(query[0])
    return "parsed"  # string queries are classified after parsing


def _canonical(query) -> str:
    return repr(query)


class UsageTrackingQueryCachingPolicy:
    """UsageTrackingQueryCachingPolicy.java:28-160 over query ASTs."""

    HISTORY_SIZE = 256

    def __init__(self, history_size: int = HISTORY_SIZE):
        self._ring: deque[str] = deque(maxlen=history_size)
        self._freq: Counter = Counter()

    def on_use(self, query) -> None:
        key = _canonical(query)
        if len(self._ring) == self._ring.maxlen:
            old = self._ring[0]
            self._freq[old] -= 1
            if self._freq[old] <= 0:
                del self._freq[old]
        self._ring.append(key)
        self._freq[key] += 1

    def frequency(self, query) -> int:
        return self._freq.get(_canonical(query), 0)

    def min_frequency_to_cache(self, query) -> int:
        kind = _node_kind(query)
        if kind in _COSTLY_KINDS:
            return 2  # :124-127
        if kind in _COMPOUND_KINDS:
            return 4  # :128-136 (5 - 1 for compound queries)
        return 5

    def should_cache(self, query) -> bool:
        kind = _node_kind(query)
        if kind in _NEVER_KINDS:
            return False  # TermQuery etc. are "already plenty fast" :55-63
        if kind in _COMPOUND_KINDS and isinstance(query, tuple) and len(
            query
        ) > 1 and isinstance(query[1], (list, tuple)) and not query[1]:
            return False  # empty compound :79-95
        return self.frequency(query) >= self.min_frequency_to_cache(query)


class LRUQueryCache:
    """LRUQueryCache.java at match-set granularity: ``get_filter`` returns
    the (possibly cached) docid DataFrame for a filter query; pass it to
    ``search(..., filter_docs=...)``."""

    def __init__(
        self,
        max_count: int = 1000,
        policy: UsageTrackingQueryCachingPolicy | None = None,
    ):
        self.max_count = max_count
        self.policy = policy or UsageTrackingQueryCachingPolicy()
        self._cache: OrderedDict[str, DataFrame] = OrderedDict()
        self.hit_count = 0
        self.miss_count = 0
        self.cache_count = 0
        self.eviction_count = 0

    def _compute(self, index: Index, query) -> DataFrame:
        from .search import score_docs

        return score_docs(index, query, precision="float64").select("docid")

    def get_filter(self, index: Index, query) -> DataFrame:
        """The QueryCache.doCache wrapper: record the use, serve from cache
        on hit, cache on miss once the policy approves.

        The cache key includes the Index identity — Lucene's LRUQueryCache
        keys per segment core and drops entries with the reader
        (LRUQueryCache.java ``onDocIdSetCache`` / ``clearCoreCacheKey``);
        Index objects here are immutable handles (mutation returns a NEW
        Index), so ``id(index)`` is the coreCacheKey analog and a cache
        shared across indexes can never serve a stale match set."""
        self.policy.on_use(query)
        key = f"{id(index)}::{_canonical(query)}"
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            self.hit_count += 1
            return hit
        self.miss_count += 1
        df = self._compute(index, query)
        if self.policy.should_cache(query):
            df = df.persist()
            self._cache[key] = df
            self.cache_count += 1
            while len(self._cache) > self.max_count:
                _, evicted = self._cache.popitem(last=False)
                evicted.unpersist()
                self.eviction_count += 1
        return df

    def clear(self) -> None:
        for df in self._cache.values():
            df.unpersist()
        self._cache.clear()
