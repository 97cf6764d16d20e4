"""HNSW graph ANN — per-segment graphs, Lucene's serving-quality option.

Reference: ``lucene/core/src/java/org/apache/lucene/util/hnsw/
HnswGraphBuilder.java`` (insertion: greedy descent + beam + diverse
neighbor selection), ``HnswGraphSearcher.java`` (search: ef=1 greedy on
upper levels, beam ``ef`` at level 0) and
``lucene/core/src/java/org/apache/lucene/codecs/lucene90/
Lucene90HnswVectorsWriter.java`` (per-SEGMENT graphs, merged at search
time like any other per-segment top-k).  Algorithm per Malkov &
Yashunin, "Efficient and robust approximate nearest neighbor search
using Hierarchical Navigable Small World graphs" (TPAMI 2018) — public
paper, public Lucene source; no reference code is copied (the reference
is Java; this is numpy).

Spark-first shape (the 100 TB story):

- The corpus is split into docid-range **segments** (``seg = vec_id %
  n_segments`` here; any deterministic bounded-size split works).  One
  task builds one segment's graph inside ``applyInPandas`` — graph
  construction is O(n·ef_construction·log n) *segment-local* work with
  memory bounded by the segment, exactly Lucene's DWPT→segment
  parallelism.  No shuffle crosses segments.
- The graph is written as partition-pruned parquet (``partitionBy(seg)``):
  rows ``(node, level, neighbors)`` plus one ``level = -1`` meta row per
  segment carrying the entry point and max level.
- Search fans the query out to every segment (a parquet scan of graph +
  vectors cogrouped by ``seg``), runs the beam walk per segment — the
  per-task cost is O(ef·M·log n) vector reads, NOT a segment scan — and
  merges the per-segment top-k with one tiny global sort, Lucene's
  ``TopDocs.merge``.  A 1000-executor cluster holds 1000+ segments and
  each query touches each graph once; nothing driver-side ever sees more
  than ``segments × k`` rows.

Determinism (required by the driver's hash-compare gates): node levels
come from a splitmix64 hash of the vec_id (not an RNG — Lucene seeds a
``SplittableRandom`` per graph at ``HnswGraphBuilder.java:77``; a
node-keyed hash gives the same level regardless of partitioning),
insertion order is ascending vec_id, and every candidate ordering
tie-breaks on vec_id.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _hash_uniform(ids: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer → uniform in (0, 1], keyed by vec_id."""
    x = ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _MASK64
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _MASK64
    x = x ^ (x >> np.uint64(31))
    return (x.astype(np.float64) + 1.0) / 18446744073709551616.0


def assign_levels(ids: np.ndarray, m: int) -> np.ndarray:
    """HnswGraphBuilder.getRandomGraphLevel: floor(-ln(u) * ml),
    ml = 1/ln(M) — but keyed on vec_id for partitioning invariance."""
    ml = 1.0 / np.log(m)
    return np.floor(-np.log(_hash_uniform(ids)) * ml).astype(np.int64)


def _unit(vecs: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(vecs, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return vecs / n


def _search_layer(adj, vecs, q, eps, ef, visited):
    """Beam search one layer (HnswGraphSearcher.searchLevel): candidates
    max-heap by sim, bounded result set of size ef.  Returns [(sim, node)]
    sorted sim desc, vec_id asc on ties."""
    results = []  # min-heap of (sim, -node): worst kept on top
    cand = []     # max-heap of (-sim, node)
    for e in eps:
        if e in visited:
            continue
        visited.add(e)
        s = float(vecs[e] @ q)
        heapq.heappush(cand, (-s, e))
        heapq.heappush(results, (s, -e))
        if len(results) > ef:
            heapq.heappop(results)
    while cand:
        negs, c = heapq.heappop(cand)
        if len(results) >= ef and -negs < results[0][0]:
            break
        nbrs = [n for n in adj.get(c, ()) if n not in visited]
        if not nbrs:
            continue
        visited.update(nbrs)
        sims = vecs[nbrs] @ q
        for n, s in zip(nbrs, sims):
            s = float(s)
            if len(results) < ef or s > results[0][0]:
                heapq.heappush(cand, (-s, n))
                heapq.heappush(results, (s, -n))
                if len(results) > ef:
                    heapq.heappop(results)
    return sorted(((s, -negid) for s, negid in results),
                  key=lambda t: (-t[0], t[1]))


def _select_diverse(cands, vecs, m):
    """HnswGraphBuilder.selectAndLinkDiverse: take candidates in sim-desc
    order; keep one iff it is closer to the new node than to every
    already-selected neighbor."""
    out = []
    for s, c in cands:
        if len(out) >= m:
            break
        if not out or np.all(vecs[[o for _, o in out]] @ vecs[c] < s):
            out.append((s, c))
    return out


def build_segment_graph(ids: np.ndarray, vecs: np.ndarray, m: int = 16,
                        ef_construction: int = 100):
    """Build one segment's graph (HnswGraphBuilder.build / addGraphNode).

    ``ids`` are global vec_ids (level hash + tie-break key); graph nodes
    are local row indices.  Returns (adj_per_level, entry, max_level)
    where adj_per_level[lvl][node] = list of local neighbor indices.
    Level 0 keeps 2*M links, upper levels M (Malkov §4 / Lucene M,
    beamWidth defaults).
    """
    order = np.argsort(ids, kind="stable")
    ids, vecs = ids[order], _unit(vecs[order].astype(np.float64))
    # local node j corresponds to the j-th smallest vec_id from here on
    levels = assign_levels(ids, m)
    n = len(ids)
    adj: list[dict[int, list[int]]] = []
    entry, max_level = -1, -1
    for i in range(n):
        lvl = int(levels[i])
        while len(adj) <= lvl:
            adj.append({})
        if entry < 0:
            entry, max_level = i, lvl
            for l in range(lvl + 1):
                adj[l][i] = []
            continue
        q = vecs[i]
        # greedy ef=1 descent over levels above the node's level
        cur = entry
        cur_sim = float(vecs[cur] @ q)
        for l in range(max_level, lvl, -1):
            moved = True
            while moved:
                moved = False
                nbrs = adj[l].get(cur, ())
                if nbrs:
                    sims = vecs[nbrs] @ q
                    j = int(np.argmax(sims))
                    if sims[j] > cur_sim:
                        cur, cur_sim, moved = nbrs[j], float(sims[j]), True
        # beam + diverse link on each level the node occupies
        eps = [cur]
        for l in range(min(lvl, max_level), -1, -1):
            cands = _search_layer(adj[l], vecs, q, eps, ef_construction,
                                  set())
            maxc = 2 * m if l == 0 else m
            sel = _select_diverse(cands, vecs, maxc)
            adj[l][i] = [c for _, c in sel]
            for s, c in sel:
                lst = adj[l].setdefault(c, [])
                lst.append(i)
                if len(lst) > maxc:
                    # overflow: re-run the diversity heuristic over the
                    # M+1 links (addAndEnsureDiversity semantics)
                    sims = vecs[lst] @ vecs[c]
                    ranked = sorted(zip(sims.tolist(), lst),
                                    key=lambda t: (-t[0], t[1]))
                    adj[l][c] = [x for _, x in
                                 _select_diverse(ranked, vecs, maxc)]
            eps = [c for _, c in cands] or eps
        if lvl > max_level:
            for l in range(max_level + 1, lvl + 1):
                adj[l][i] = []
            entry, max_level = i, lvl
    return adj, entry, max_level


def search_segment_graph(adj, entry, max_level, vecs, q, k, ef):
    """HnswGraphSearcher.search: ef=1 greedy descent to level 1, beam
    ``ef`` at level 0; top-k by sim."""
    if entry < 0 or not adj:
        return []
    q = np.asarray(q, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / qn if qn else q
    cur, cur_sim = entry, float(vecs[entry] @ q)
    for l in range(max_level, 0, -1):
        moved = True
        while moved:
            moved = False
            nbrs = adj[l].get(cur, ())
            if nbrs:
                sims = vecs[nbrs] @ q
                j = int(np.argmax(sims))
                if sims[j] > cur_sim:
                    cur, cur_sim, moved = nbrs[j], float(sims[j]), True
    out = _search_layer(adj[0], vecs, q, [cur], max(ef, k), set())
    return out[:k]


def write_hnsw_index(emb: DataFrame, out_dir: str, m: int = 16,
                     ef_construction: int = 100, n_segments: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     ) -> None:
    """Materialize per-segment HNSW graphs as partition-pruned parquet.

    One applyInPandas task per segment builds that segment's graph —
    the build is embarrassingly parallel across segments and nothing
    shuffles except the segment-key exchange of the vectors themselves
    (one narrow hash partitioning, same shape as the IVF index build).
    Layout: ``graph/`` rows (node=global id, level, neighbors=global
    ids; one level=-1 row per segment: node=entry id, neighbors=[max
    level]) and ``vectors/``, both partitionBy(seg).
    """
    seg = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        (F.pmod(F.col(id_col), F.lit(n_segments))).cast("int").alias("seg"),
    )

    def build_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        vecs = np.stack(pdf["vec"].to_numpy())
        adj, entry, max_level = build_segment_graph(
            ids, vecs, m=m, ef_construction=ef_construction)
        gids = np.sort(ids)  # local node j = j-th smallest vec_id
        rows = []
        for lvl, layer in enumerate(adj):
            for node, nbrs in layer.items():
                rows.append((int(pdf["seg"].iloc[0]), int(gids[node]), lvl,
                             [int(gids[x]) for x in nbrs]))
        rows.append((int(pdf["seg"].iloc[0]),
                     int(gids[entry]) if entry >= 0 else -1, -1,
                     [int(max_level)]))
        return pd.DataFrame(rows, columns=["seg", "node", "level",
                                           "neighbors"])

    (seg.groupBy("seg")
        .applyInPandas(build_fn,
                       "seg int, node long, level int, neighbors array<long>")
        .write.mode("overwrite").partitionBy("seg")
        .parquet(out_dir + "/graph"))
    (seg.write.mode("overwrite").partitionBy("seg")
        .parquet(out_dir + "/vectors"))


def _fold_cosine(v: np.ndarray, q: np.ndarray) -> float:
    """Sequential-fold cosine, bit-identical to the Catalyst/DuckDB
    ``aggregate(zip_with(...))`` expression the exact ANN paths emit
    (ann._cosine_expr) — numpy's pairwise-summed ``dot`` differs in the
    last ulp, which matters to hash-compared quantized scores."""
    num = 0.0
    for a, b in zip(v.tolist(), q.tolist()):
        num += a * b
    nv = 0.0
    for a in v.tolist():
        nv += a * a
    nq = 0.0
    for b in q.tolist():
        nq += b * b
    import math

    return num / (math.sqrt(nv) * math.sqrt(nq))


def _seg_search_builder(queries, k, ef):
    """Per-segment cogrouped searcher: rebuild the adjacency from the
    stored rows, walk the graph once per query, emit (qid, vec_id, cosine)
    — segments × k × n_queries rows total reach the merge.  The walk ranks
    by normalized-dot; the EMITTED score is the fold-cosine over the raw
    vectors so scores are layout-invariant and oracle-exact."""

    def fn(_key, gpdf: pd.DataFrame, vpdf: pd.DataFrame) -> pd.DataFrame:
        if gpdf.empty or vpdf.empty:
            return pd.DataFrame(columns=["qid", "vec_id", "cosine"])
        vp = vpdf.sort_values("vec_id")
        gids = vp["vec_id"].to_numpy(dtype=np.int64)
        raw = np.stack(vp["vec"].to_numpy()).astype(np.float64)
        vecs = _unit(raw)
        local = {int(g): i for i, g in enumerate(gids)}
        meta = gpdf[gpdf["level"] < 0].iloc[0]
        entry = local.get(int(meta["node"]), -1)
        max_level = int(meta["neighbors"][0])
        adj: list[dict[int, list[int]]] = [
            {} for _ in range(max_level + 1)]
        for row in gpdf[gpdf["level"] >= 0].itertuples(index=False):
            adj[row.level][local[int(row.node)]] = [
                local[int(x)] for x in row.neighbors]
        out = []
        for qid, q in queries:
            for _s, node in search_segment_graph(
                    adj, entry, max_level, vecs, q, k, ef):
                out.append((int(qid), int(gids[node]),
                            _fold_cosine(raw[node], q)))
        return pd.DataFrame(out, columns=["qid", "vec_id", "cosine"])

    return fn


def hnsw_topk_many(spark: SparkSession, out_dir: str, queries, k: int = 10,
                   ef: int = 100) -> DataFrame:
    """Batched multi-query search over a written HNSW index: per-segment
    graph walks (cogrouped applyInPandas) + one per-qid window top-k —
    Lucene's per-segment searcher + TopDocs.merge."""
    from .ann import _topk_per_query

    qlist = [(int(qid), np.asarray(q, dtype=np.float64)) for qid, q in queries]
    g = spark.read.parquet(out_dir + "/graph")
    v = spark.read.parquet(out_dir + "/vectors")
    hits = (
        g.groupBy("seg").cogroup(v.groupBy("seg"))
        .applyInPandas(_seg_search_builder(qlist, k, ef),
                       "qid long, vec_id long, cosine double")
    )
    return _topk_per_query(hits, k, "vec_id")


def hnsw_topk(spark: SparkSession, out_dir: str, qvec, k: int = 10,
              ef: int = 100) -> DataFrame:
    """Single-query convenience wrapper over :func:`hnsw_topk_many`;
    adds a 0-based ``rank`` (k rows — the window is driver-trivial)."""
    from pyspark.sql import Window

    out = hnsw_topk_many(spark, out_dir, [(0, qvec)], k=k, ef=ef).drop("qid")
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return out.withColumn("rank", F.row_number().over(w) - 1)
