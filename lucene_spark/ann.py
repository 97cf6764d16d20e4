"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k with JVM-side arithmetic (F.aggregate /
zip_with — no Python in the hot path; the fold is sequential left-to-right,
replicable bit-exactly by DuckDB's DOUBLE[] list_cosine_similarity).
Scale path: LSH via random hyperplanes (sign buckets) — candidates only from
matching buckets, then exact re-rank; probes trade recall for fan-in.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cosine_expr(vec_col: str, qlit: str) -> str:
    """Sequential-fold cosine between a DOUBLE[] column and a literal array."""
    return (
        f"aggregate(zip_with({vec_col}, {qlit}, (x, y) -> x * y), 0D, (s, v) -> s + v) / "
        f"(sqrt(aggregate({vec_col}, 0D, (s, x) -> s + x * x)) * "
        f"sqrt(aggregate({qlit}, 0D, (s, x) -> s + x * x)))"
    )


def _vec_literal(q: np.ndarray) -> str:
    return "array(" + ",".join(f"CAST({float(x)!r} AS DOUBLE)" for x in q) + ")"


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: scan + TakeOrderedAndProject (no shuffle of vectors;
    Catalyst plans a per-partition top-k then a k-row merge)."""
    q = _vec_literal(np.asarray(query_vec, dtype=np.float64))
    dvec = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    return (
        embeddings.select(
            F.col(id_col), F.expr(_cosine_expr(dvec, q)).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector (sign bit per plane)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    terms = []
    for i, p in enumerate(planes):
        lit = _vec_literal(p)
        dot = f"aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), {lit}, (x,y) -> x*y), 0D, (s,v) -> s+v)"
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return embeddings.select(F.col(id_col), F.col(vec_col), F.expr(" + ".join(terms)).alias("bucket"))


def lsh_topk(
    embeddings: DataFrame,
    query_vec: np.ndarray,
    k: int = 10,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: restrict to buckets within ``multiprobe_hamming`` bit flips
    of the query's bucket, then exact cosine re-rank.  At 100 TB the bucketed
    table is written partitioned by bucket → partition-pruned scans."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ qv) >= 0))
    probes = [qbucket]
    if multiprobe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(n_planes)]
    bucketed = hyperplane_buckets(embeddings, n_planes, dim, seed, id_col, vec_col)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, qv, k, id_col, vec_col)
