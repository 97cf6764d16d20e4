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


def rademacher_planes(n_planes: int, dim: int, seed: int = 5) -> np.ndarray:
    """Deterministic ±1 (Rademacher) projection planes derived from md5 —
    sign-LSH needs only random signs (Charikar hyperplane rounding works for
    any symmetric distribution), and an md5 derivation is reproducible
    bit-exactly by the SQL oracle, unlike a Mersenne-Twister draw."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.float64)
    for i in range(n_planes):
        for j in range(dim):
            h = hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()
            out[i, j] = 1.0 if (h[0] & 1) else -1.0
    return out


def hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
) -> DataFrame:
    """Hyperplane-LSH bucket per vector (sign bit per plane).

    Default planes are deterministic Rademacher (:func:`rademacher_planes`);
    dots are sequential-fold JVM expressions so DuckDB replicates the bucket
    assignment bit-exactly."""
    if planes is None:
        planes = rademacher_planes(n_planes, dim, seed)
    terms = []
    for i, p in enumerate(planes):
        lit = _vec_literal(p)
        dot = f"aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), {lit}, (x,y) -> x*y), 0D, (s,v) -> s+v)"
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return embeddings.select(F.col(id_col), F.col(vec_col), F.expr(" + ".join(terms)).alias("bucket"))


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest (max-dot) centroid — one Arrow pass,
    X @ C.T argmax in numpy."""
    import pandas as pd

    C = np.ascontiguousarray(centroids, dtype=np.float64)

    def run(batches):
        for pdf in batches:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cl = np.argmax(X @ C.T, axis=1)
            out = pdf[[id_col, vec_col]].copy()
            out["cluster"] = cl.astype(np.int32)
            yield out

    vec_type = embeddings.schema[vec_col].dataType.simpleString()
    return embeddings.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, {vec_col} {vec_type}, cluster int"
    )


def ivf_train(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Coarse quantizer via distributed Lloyd iterations.

    Deterministic init (first ``n_centroids`` vectors by id); each iteration
    computes per-partition partial (sum, count) per cluster inside mapInPandas
    and combines the tiny partials on the driver — no vector ever shuffles,
    which is the property that matters at 10^12 rows.
    """
    import pandas as pd

    seed_rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    )
    C = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seed_rows])
    dim = C.shape[1]

    for _ in range(iters):
        Cb = np.ascontiguousarray(C)

        def partials(batches):
            sums = np.zeros((n_centroids, dim))
            counts = np.zeros(n_centroids, dtype=np.int64)
            for pdf in batches:
                X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                cl = np.argmax(X @ Cb.T, axis=1)
                np.add.at(sums, cl, X)
                np.add.at(counts, cl, 1)
            yield pd.DataFrame(
                {
                    "cluster": np.arange(n_centroids),
                    "count": counts,
                    "vsum": [row.tolist() for row in sums],
                }
            )

        rows = embeddings.select(vec_col).mapInPandas(
            partials, schema="cluster int, count long, vsum array<double>"
        ).collect()
        sums = np.zeros((n_centroids, dim))
        counts = np.zeros(n_centroids, dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["vsum"])
            counts[r["cluster"]] += r["count"]
        nonzero = counts > 0
        C[nonzero] = sums[nonzero] / counts[nonzero, None]
    return C


def ivf_topk(
    embeddings: DataFrame,
    query_vec: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` nearest inverted lists, exact re-rank.

    At 100 TB the assigned table is written partitioned by cluster, so probing
    is a partition-pruned scan of nprobe/n_centroids of the data.  Pass
    ``centroids`` (from :func:`ivf_train`, trained once) to skip training.
    """
    if centroids is None:
        centroids = ivf_train(embeddings, n_centroids, iters, id_col, vec_col)
    qv = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(-(centroids @ qv), kind="stable")[:nprobe]
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("cluster").isin([int(c) for c in order]))
    return brute_force_topk(cand, qv, k, id_col, vec_col)


def _probe_buckets(
    planes: np.ndarray, query_vec: np.ndarray, multiprobe_hamming: int
) -> list[int]:
    qv = np.asarray(query_vec, dtype=np.float64)
    # math.fsum-free sequential fold mirrors the engine/oracle arithmetic;
    # plane dots are far from 0 for real vectors so rounding mode is moot
    qbucket = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ qv) >= 0))
    probes = [qbucket]
    if multiprobe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(len(planes))]
    if multiprobe_hamming >= 2:
        n = len(planes)
        probes += [
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n) for j in range(i + 1, n)
        ]
    return probes


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
    planes: np.ndarray | None = None,
) -> DataFrame:
    """ANN top-k: restrict to buckets within ``multiprobe_hamming`` bit flips
    of the query's bucket, then exact cosine re-rank.  One-shot form — the
    scale path is :func:`write_lsh_index` + :func:`lsh_topk_indexed`
    (bucket-partitioned parquet, partition-pruned probes)."""
    if planes is None:
        planes = rademacher_planes(n_planes, dim, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    probes = _probe_buckets(planes, qv, multiprobe_hamming)
    bucketed = hyperplane_buckets(embeddings, n_planes, dim, seed, id_col, vec_col, planes)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, qv, k, id_col, vec_col)


# ------------------------------------------------- materialized ANN indexes
#
# The 100 TB contract: bucketing/assignment runs ONCE at build time and is
# written partitionBy(cluster|bucket); every query is then a partition-pruned
# scan of nprobe/n_centroids (or (1+planes)/2^planes) of the corpus plus a
# TakeOrderedAndProject re-rank.  No per-query re-assignment of the corpus.


def write_ivf_index(
    embeddings: DataFrame,
    out_dir: str,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Train (deterministic) + assign + write cluster-partitioned parquet.
    Returns the centroids (also persisted alongside the data)."""
    spark = embeddings.sparkSession
    if centroids is None:
        centroids = ivf_train(embeddings, n_centroids, iters, id_col, vec_col)
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(f"{out_dir}/vectors")
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{out_dir}/centroids")
    return centroids


def read_ivf_centroids(spark, out_dir: str) -> np.ndarray:
    rows = spark.read.parquet(f"{out_dir}/centroids").orderBy("cluster").collect()
    return np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])


def ivf_topk_indexed(
    spark,
    out_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a materialized IVF index: centroid shortlist on the driver
    (tiny), then a cluster-partition-pruned scan + exact re-rank.  The plan
    must show PartitionFilters on ``cluster`` — asserted by the test suite."""
    centroids = read_ivf_centroids(spark, out_dir)
    qv = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(-(centroids @ qv), kind="stable")[:nprobe]
    vectors = spark.read.parquet(f"{out_dir}/vectors")
    cand = vectors.filter(F.col("cluster").isin([int(c) for c in order]))
    return brute_force_topk(cand, qv, k, id_col, vec_col)


def write_lsh_index(
    embeddings: DataFrame,
    out_dir: str,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Bucket + write bucket-partitioned parquet; returns the planes."""
    planes = rademacher_planes(n_planes, dim, seed)
    bucketed = hyperplane_buckets(embeddings, n_planes, dim, seed, id_col, vec_col, planes)
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(f"{out_dir}/vectors")
    return planes


def lsh_topk_indexed(
    spark,
    out_dir: str,
    planes: np.ndarray,
    query_vec: np.ndarray,
    k: int = 10,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a materialized LSH index: bucket shortlist on the driver, then a
    bucket-partition-pruned scan + exact re-rank."""
    qv = np.asarray(query_vec, dtype=np.float64)
    probes = _probe_buckets(planes, qv, multiprobe_hamming)
    vectors = spark.read.parquet(f"{out_dir}/vectors")
    cand = vectors.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, qv, k, id_col, vec_col)


def _queries_df(spark, queries, qid_col: str = "qid"):
    """Small query batch → broadcastable DataFrame (qid, qv DOUBLE[])."""
    rows = [(int(q), [float(x) for x in v]) for q, v in queries]
    return F.broadcast(
        spark.createDataFrame(rows, f"{qid_col} long, qv array<double>")
    )


_PAIR_COS = (
    "aggregate(zip_with(dv, qv, (x, y) -> x * y), 0D, (s, v) -> s + v) / "
    "(sqrt(aggregate(dv, 0D, (s, x) -> s + x * x)) * "
    "sqrt(aggregate(qv, 0D, (s, x) -> s + x * x)))"
)


def _topk_per_query(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    """Per-query top-k (cosine desc, id asc).  The rank window carries a
    rk <= k predicate, which Spark plans as WindowGroupLimit: each task
    keeps only k rows per qid BEFORE the qid shuffle — the hierarchical
    TopDocs.merge shape, k x n_queries rows ever cross the wire."""
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def brute_force_topk_many(
    embeddings: DataFrame,
    queries: list,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of queries [(qid, vector), ...]:
    broadcast the tiny query table, one scan of the corpus scores every
    (vector, query) pair JVM-side, WindowGroupLimit reduces to k rows per
    query.  → (qid, vec_id, cosine)."""
    qdf = _queries_df(embeddings.sparkSession, queries)
    scored = (
        embeddings.select(
            F.col(id_col), F.expr(f"CAST({vec_col} AS ARRAY<DOUBLE>)").alias("dv")
        )
        .crossJoin(qdf)
        .withColumn("cosine", F.expr(_PAIR_COS))
        .select("qid", id_col, "cosine")
    )
    return _topk_per_query(scored, k, id_col)


def ivf_topk_many(
    embeddings: DataFrame,
    queries: list,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Batched IVF: train/assign ONCE, per-query centroid shortlists on the
    driver (tiny), broadcast (qid, cluster) probe pairs joined against the
    assigned corpus, exact re-rank per query.  One corpus pass serves the
    whole query batch — the query-log shape at 10^12 rows."""
    spark = embeddings.sparkSession
    if centroids is None:
        centroids = ivf_train(embeddings, n_centroids, iters, id_col, vec_col)
    probe_rows = []
    for qid, qv in queries:
        order = np.argsort(-(centroids @ np.asarray(qv, dtype=np.float64)),
                           kind="stable")[:nprobe]
        probe_rows += [(int(qid), int(c)) for c in order]
    probes = F.broadcast(spark.createDataFrame(probe_rows, "qid long, cluster int"))
    qdf = _queries_df(spark, queries)
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    scored = (
        assigned.join(probes, "cluster")
        .join(qdf, "qid")
        .withColumn("dv", F.expr(f"CAST({vec_col} AS ARRAY<DOUBLE>)"))
        .withColumn("cosine", F.expr(_PAIR_COS))
        .select("qid", id_col, "cosine")
    )
    return _topk_per_query(scored, k, id_col)


def table_planes(n_tables: int, n_planes: int, dim: int, seed: int = 5) -> list:
    """L independent Rademacher plane sets (seed+t per table) — classic
    multi-table LSH: a near neighbor split by one table's planes is caught
    by another; recall = 1 - (1 - p^b)^L for per-plane agreement p."""
    return [rademacher_planes(n_planes, dim, seed + t) for t in range(n_tables)]


def _bucket_expr(planes: np.ndarray, vec_col: str) -> str:
    terms = []
    for i, p in enumerate(planes):
        lit = _vec_literal(p)
        dot = (f"aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), {lit}, "
               f"(x,y) -> x*y), 0D, (s,v) -> s+v)")
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(terms)


def lsh_topk_many(
    embeddings: DataFrame,
    queries: list,
    k: int = 10,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
    planes: np.ndarray | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """Batched hyperplane-LSH: bucket the corpus ONCE (all ``n_tables``
    bucket columns in one projection pass), per-query probe buckets on the
    driver, broadcast (qid, table, bucket) probes joined against the
    bucketed corpus, candidates deduped across tables, exact re-rank per
    query.  Multi-table is the recall lever on weakly-clustered corpora —
    a neighbor split by one table's hyperplanes is caught by another."""
    spark = embeddings.sparkSession
    if planes is not None:
        plane_sets = [planes]
    else:
        plane_sets = table_planes(n_tables, n_planes, dim, seed)
    probe_rows = []
    for qid, qv in queries:
        for t, ps in enumerate(plane_sets):
            for b in _probe_buckets(ps, qv, multiprobe_hamming):
                probe_rows.append((int(qid), int(t), int(b)))
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "qid long, tbl int, bucket long")
    )
    qdf = _queries_df(spark, queries)
    # one corpus pass computes every table's bucket, then stacks to
    # (id, vec, tbl, bucket) rows
    cols = [F.col(id_col), F.col(vec_col)]
    for t, ps in enumerate(plane_sets):
        cols.append(F.expr(_bucket_expr(ps, vec_col)).cast("long").alias(f"b{t}"))
    wide = embeddings.select(*cols)
    stack = ", ".join(f"{t}, b{t}" for t in range(len(plane_sets)))
    bucketed = wide.selectExpr(
        id_col, vec_col,
        f"stack({len(plane_sets)}, {stack}) AS (tbl, bucket)",
    )
    cand = (
        bucketed.join(probes, ["tbl", "bucket"])
        .dropDuplicates(["qid", id_col])
    )
    scored = (
        cand.join(qdf, "qid")
        .withColumn("dv", F.expr(f"CAST({vec_col} AS ARRAY<DOUBLE>)"))
        .withColumn("cosine", F.expr(_PAIR_COS))
        .select("qid", id_col, "cosine")
    )
    return _topk_per_query(scored, k, id_col)


def embcos_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (a, b) with a < b and
    cosine >= threshold.  QUADRATIC baseline (all-pairs self-join) — correct
    at any scale but O(n^2) comparisons; use :func:`embcos_pairs_lsh` for a
    corpus-scale run.  The cosine is a JVM-side sequential fold (zip_with /
    aggregate), bit-replicable by DuckDB's list_cosine_similarity."""
    dv = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    a = embeddings.select(F.col(id_col).alias("a"), F.expr(dv).alias("va"))
    b = embeddings.select(F.col(id_col).alias("b"), F.expr(dv).alias("vb"))
    cos = (
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (s, v) -> s + v) / "
        "(sqrt(aggregate(va, 0D, (s, x) -> s + x * x)) * "
        "sqrt(aggregate(vb, 0D, (s, x) -> s + x * x)))"
    )
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cosine", F.expr(cos))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def embcos_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: candidates restricted to
    equal hyperplane-LSH sign buckets (Charikar rounding — vectors at angle
    θ collide per plane with probability 1 - θ/π, so near-duplicates almost
    always share a bucket), then EXACT cosine verification.  The join is
    bucket-equality — a hash-partitioned equi-join on ~2^n_planes keys, not
    an all-pairs product, which is what survives 10^9 vectors.  Deterministic
    Rademacher planes keep the bucket assignment DuckDB-replicable.

    Recall is approximate (a near-dup pair split by some plane is missed);
    the recall lever is ``n_tables`` — L independent plane sets (seed+t),
    candidate pairs unioned across tables and deduped BEFORE the exact
    verification (classic banded LSH: recall = 1 - (1 - p^b)^L).  The join
    stays bucket-equality per table — L hash-partitioned equi-joins, never
    an all-pairs product."""
    if n_tables <= 1:
        plane_sets = [rademacher_planes(n_planes, dim, seed)]
    else:
        plane_sets = table_planes(n_tables, n_planes, dim, seed)
    cols = [F.col(id_col), F.expr(f"CAST({vec_col} AS ARRAY<DOUBLE>)").alias("dv")]
    for t, ps in enumerate(plane_sets):
        cols.append(F.expr(_bucket_expr(ps, vec_col)).cast("long").alias(f"b{t}"))
    wide = embeddings.select(*cols)
    stack = ", ".join(f"{t}, b{t}" for t in range(len(plane_sets)))
    bucketed = wide.selectExpr(
        id_col, "dv", f"stack({len(plane_sets)}, {stack}) AS (tbl, bucket)"
    )
    a = bucketed.select(F.col(id_col).alias("a"), F.col("dv").alias("va"),
                        "tbl", "bucket")
    b = bucketed.select(F.col(id_col).alias("b"), F.col("dv").alias("vb"),
                        "tbl", "bucket")
    cos = (
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (s, v) -> s + v) / "
        "(sqrt(aggregate(va, 0D, (s, x) -> s + x * x)) * "
        "sqrt(aggregate(vb, 0D, (s, x) -> s + x * x)))"
    )
    return (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn("cosine", F.expr(cos))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


# ---------------------------------------------------------------- product
# quantization (ADC) — the embedding-compression scale path: M bytes per
# vector instead of 4*dim, scored against a query via per-subspace lookup
# tables.  (Jegou, Douze, Schmid, "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011 — public method; this reference ships no
# PQ, so this is a pipeline addition, not a parity row.)


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace codebooks (m, k, dim/m) — deterministic init (the
    first ``k`` vectors' subvectors by id), then ``iters`` distributed
    Lloyd rounds per subspace with L2 assignment.  Same partial-sums
    shape as :func:`ivf_train`: per-partition (sum, count) per (subspace,
    code) — no vector ever shuffles."""
    import pandas as pd

    seed_rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    C = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seed_rows])
    dim = C.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = np.stack([C[:, j * sub:(j + 1) * sub] for j in range(m)])  # (m,k,sub)

    for _ in range(iters):
        Bb = np.ascontiguousarray(books)

        def partials(batches):
            sums = np.zeros((m, k, sub))
            counts = np.zeros((m, k), dtype=np.int64)
            for pdf in batches:
                X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                for j in range(m):
                    Xj = X[:, j * sub:(j + 1) * sub]
                    d = ((Xj[:, None, :] - Bb[j][None, :, :]) ** 2).sum(axis=2)
                    cl = np.argmin(d, axis=1)
                    np.add.at(sums[j], cl, Xj)
                    np.add.at(counts[j], cl, 1)
            yield pd.DataFrame({
                "m": np.repeat(np.arange(m), k),
                "code": np.tile(np.arange(k), m),
                "count": counts.ravel(),
                "vsum": [r.tolist() for r in sums.reshape(m * k, sub)],
            })

        rows = embeddings.select(vec_col).mapInPandas(
            partials, schema="m int, code int, count long, vsum array<double>"
        ).collect()
        sums = np.zeros((m, k, sub))
        counts = np.zeros((m, k), dtype=np.int64)
        for r in rows:
            sums[r["m"], r["code"]] += np.asarray(r["vsum"])
            counts[r["m"], r["code"]] += r["count"]
        nz = counts > 0
        books[nz] = sums[nz] / counts[nz][:, None]
    return books


def _pq_codes_np(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) → (n, m) int32 codes: per-subspace argmin L2, ties to the
    lowest code id (np.argmin contract)."""
    m, k, sub = books.shape
    out = np.empty((X.shape[0], m), dtype=np.int32)
    for j in range(m):
        Xj = X[:, j * sub:(j + 1) * sub]
        d = ((Xj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        out[:, j] = np.argmin(d, axis=1)
    return out


def pq_encode(
    embeddings: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — the compressed representation (m small
    ints per vector; parquet dictionary-encodes them to ~m bytes)."""
    import pandas as pd

    Bb = np.ascontiguousarray(books)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            codes = _pq_codes_np(X, Bb)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "codes": [c.tolist() for c in codes],
            })

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, codes array<int>")


def pq_topk(
    embeddings: DataFrame,
    books: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Top-k by ADC (asymmetric distance computation): the query builds
    one (m, k) lookup table of subspace dot products; every vector scores
    as the SUM of its codes' LUT entries — a gather + sum per row, never
    a full dot product.  Pass ``codes`` (from :func:`pq_encode`,
    persisted) for the materialized-index path; otherwise codes are
    computed on the fly.  → (id, score) DataFrame cut to k.

    At 10^12 vectors the materialized path reads m ints per row instead
    of the embedding column — the whole point of PQ.
    """
    import pandas as pd

    m, kk, sub = books.shape
    q = np.asarray(query, dtype=np.float64)
    lut = np.stack([
        books[j] @ q[j * sub:(j + 1) * sub] for j in range(m)
    ])  # (m, k)

    if codes is None:
        Bb = np.ascontiguousarray(books)

        def score_vec(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                cd = _pq_codes_np(X, Bb)
                s = lut[np.arange(m)[None, :], cd].sum(axis=1)
                yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "score": s})

        scored = embeddings.select(id_col, vec_col).mapInPandas(
            score_vec, schema=f"{id_col} long, score double")
    else:
        def score_codes(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cd = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
                s = lut[np.arange(m)[None, :], cd].sum(axis=1)
                yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "score": s})

        scored = codes.mapInPandas(
            score_codes, schema=f"{id_col} long, score double")
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
