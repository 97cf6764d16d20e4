"""Benchmark harness (driver contract): ONE JSON line on stdout.

Workload (BASELINE.md): batch index build over a synthesized Common-Crawl-style
corpus (FIXTURES.md) sized by SF, then the headline BM25 query suite (term /
disjunction / conjunction / mixed, k=10 and 100) on the built index.
Reports wall seconds (value), per-query seconds, and docs/sec throughput.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) — only used to derive
SF; the fulltext corpus is engine-synthesized per FIXTURES.md since the
driver's TPC-H-ish tables are not a web corpus (BASELINE.md "bench tiers").
SPARK_GRAFT_CPUS (default 32) — local[N] parallelism.

Scaling evidence (north rule N vs 4N executors): run `python bench.py --cpus 8`
and `--cpus 32` on the same SF; scale_bench.py automates both and writes
BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time


HEADLINE_QUERIES = {
    "q_term_head": ("court", 10),
    "q_term_tail": ("w04321", 10),
    "q_or2": ("court law", 10),
    "q_or4": ("planes trains automobiles ships", 10),
    "q_or4_k100": ("planes trains automobiles ships", 100),
    "q_and2": ("court AND law", 10),
    "q_and3": ("planes AND trains AND automobiles", 10),
    "q_mixed": ("(planes AND trains AND automobiles) OR ships", 10),
    "q_mixed2": ("(court AND law) OR (market AND report)", 100),
    "q_not": ("court NOT law", 10),
}


def make_session(cpus: int, shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"lucene_spark_bench_{cpus}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "20000"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions",
                os.environ.get("SPARK_GRAFT_JAVA_OPTS", ""))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _ceiling_probe(spark) -> float:
    """Spark-harness ceiling: a fixed single-threaded-numpy job in the SAME
    session — what a perfectly-parallel Spark workload gets from this box
    right now.  Engine efficiency normalized by this ratio isolates engine
    scaling from host/JVM-harness effects."""
    import numpy as _np
    import pandas as _pd

    def _burn(batches):
        for _ in batches:
            x = _np.arange(50_000, dtype=_np.float64)
            s = 0.0
            for _i in range(1500):
                s += float((x * 1.0001 + 0.5).sum())
            yield _pd.DataFrame({"v": [s]})

    probe_df = spark.range(64).repartition(64)
    tp0 = time.time()
    probe_df.mapInPandas(_burn, "v double").count()
    return time.time() - tp0


def run_bench(cpus: int, n_docs: int, sf: float, k1_queries=HEADLINE_QUERIES,
              repeat: int = 1, build_only: bool = False) -> dict:
    from lucene_spark.corpus import generate_pages
    from lucene_spark.index import build_index
    from lucene_spark.search import search

    spark = make_session(cpus)
    try:
        pages_pdf = generate_pages(n_docs, seed=42)
        pages = spark.createDataFrame(pages_pdf).repartition(max(cpus, 4))
        pages = pages.persist()
        pages.count()  # corpus materialization excluded from build timing

        # warm-up build on a slice: Python-worker spin-up + JVM JIT excluded,
        # like the query warm-up (the sandbox VM also has bursty host CPU;
        # `repeat` > 1 takes the best timed run to measure the engine, not
        # the host scheduler)
        warm = spark.createDataFrame(pages_pdf.head(2000)).repartition(max(cpus, 4))
        build_index(spark, warm).postings.count()

        # A-B-A pairing: ceiling probes IMMEDIATELY before and after the
        # timed build measure the host in the same minutes the engine ran
        # (one warm probe first — probe workers spin up like any stage)
        _ceiling_probe(spark)
        ceiling_pre_s = _ceiling_probe(spark)

        build_s = None
        for r in range(max(1, repeat)):
            t0 = time.time()
            idx = build_index(spark, pages)
            idx.postings = idx.postings.persist()
            idx.termdict = idx.termdict.persist()
            # one job materializes BOTH caches: the termdict aggregation scans
            # postings, so the postings cache fills as a side effect and the
            # subsequent counts are cache-local (norms was already materialized
            # inside build_index by the sum_ttf rollup)
            idx.termdict.count()
            n_posting_rows = idx.postings.count()
            idx.norms.count()
            run_s = time.time() - t0
            build_s = run_s if build_s is None else min(build_s, run_s)
            if r < max(1, repeat) - 1:
                idx.postings.unpersist()
                idx.termdict.unpersist()
                idx.norms.unpersist()

        ceiling_post_s = _ceiling_probe(spark)
        if build_only:
            return {
                "metric": "index-build throughput (A-B-A paired ceiling)",
                "value": round(build_s, 3),
                "unit": "sec",
                "queries": {},
                "sf": sf,
                "n_docs": n_docs,
                "cpus": cpus,
                "index_build_sec": round(build_s, 3),
                "docs_per_sec": round(n_docs / build_s, 1),
                "ceiling_probe_pre_sec": round(ceiling_pre_s, 3),
                "ceiling_probe_post_sec": round(ceiling_post_s, 3),
            }

        q_times: dict[str, float] = {}
        # warm-up every query shape once (JIT/UDF worker spin-up excluded)
        for wq in ("court", "court law", "court AND law"):
            search(idx, wq, k=10)
        # best-of-N per query: this sandbox is a shared host with bursty CPU
        # steal (a bare postings.count() job floor swings 0.15-1.1 s run to
        # run); the MIN over q_repeat runs measures the engine, the same way
        # the build takes the best of `repeat` runs
        q_repeat = int(os.environ.get("SPARK_GRAFT_QUERY_REPEAT", "5"))
        for name, (q, k) in k1_queries.items():
            best = None
            for _ in range(max(1, q_repeat)):
                tq = time.time()
                search(idx, q, k=k, precision="lucene", prune=True)
                dt = time.time() - tq
                best = dt if best is None else min(best, dt)
            q_times[name] = round(best, 4)

        # batched path: the whole suite in ONE Spark job (search_many) —
        # the throughput number a query log would see
        from lucene_spark.search import search_many

        tb = time.time()
        search_many(
            idx,
            {n: q for n, (q, _) in k1_queries.items()},
            k=10,
            ks={n: k for n, (_, k) in k1_queries.items()},
            precision="lucene",
            prune=True,
        )
        batch_s = time.time() - tb

        # post-queries ceiling probe (kept for round-over-round continuity;
        # the A-B-A paired numbers are ceiling_probe_pre/post_sec above)
        ceiling_probe_s = _ceiling_probe(spark)

        # positional kernel: head-bigram sloppy phrase over a
        # positions-enabled build (separate index so the headline build
        # number stays comparable round-over-round), plus a driver-side
        # scalar-walk vs lockstep-batch duel on the SAME decoded postings
        # the executor kernel sees — the evidence that the vectorized
        # 2-term sloppy path beats the per-doc Python walk
        tpos0 = time.time()
        pidx = build_index(spark, pages, with_positions=True)
        pidx.postings = pidx.postings.persist()
        pidx.postings.count()
        pos_build_s = time.time() - tpos0
        search(pidx, '"court law"~2', k=10, precision="lucene", prune=True)
        sloppy_best = None
        for _ in range(max(1, q_repeat)):
            tq = time.time()
            search(pidx, '"court law"~2', k=10, precision="lucene", prune=True)
            dt = time.time() - tq
            sloppy_best = dt if sloppy_best is None else min(sloppy_best, dt)

        # TermAutomatonQuery on the same positions index: the synonym-graph
        # shape 0 -court-> ACC | 0 -court-> s1 -law-> ACC (single token or
        # bigram), same head terms as the sloppy query for comparability
        from lucene_spark.termautomaton import TermAutomatonQuery

        taq = TermAutomatonQuery()
        ta1, ta2 = taq.create_state(), taq.create_state()
        taq.add_transition(0, ta2, "court")
        taq.add_transition(0, ta1, "court")
        taq.add_transition(ta1, ta2, "law")
        taq.set_accept(ta2, True)
        ta_node = taq.finish()
        search(pidx, ta_node, k=10, precision="lucene", prune=True)
        termauto_best = None
        for _ in range(max(1, q_repeat)):
            tq = time.time()
            search(pidx, ta_node, k=10, precision="lucene", prune=True)
            dt = time.time() - tq
            termauto_best = dt if termauto_best is None else min(termauto_best, dt)

        import numpy as np

        from lucene_spark.kernel import (
            TermPostings,
            _sloppy_freqs_2term_batch,
            lucene_sloppy_freq,
        )

        prow = {}
        for r in pidx.postings.filter(
            "term in ('court', 'law')"
        ).orderBy("term", "seg").collect():
            t = r["term"]
            tp = TermPostings(r.asDict(), pidx.seg_size)
            d, f, dl = tp.decode()
            g = d + int(r["seg"]) * pidx.seg_size
            pos = tp.positions_flat()
            if t in prow:
                d0, f0, dl0, p0 = prow[t]
                prow[t] = (np.concatenate([d0, g]), np.concatenate([f0, f]),
                           np.concatenate([dl0, dl]), np.concatenate([p0, pos]))
            else:
                prow[t] = (g, f, dl, pos)
        arrs = []
        for t, off in (("court", 0), ("law", 1)):
            d, f, dl, pos = prow[t]
            arrs.append((d, f, dl, pos, np.cumsum(f) - f))
        cand = arrs[0][0][np.isin(arrs[0][0], arrs[1][0], assume_unique=True)]
        ts0 = time.time()
        scal = np.empty(len(cand))
        for ci, doc in enumerate(cand):
            adjs = []
            for (d, f, dl, pos, pstart), off in zip(arrs, (0, 1)):
                j = int(np.searchsorted(d, doc))
                s0, c0 = int(pstart[j]), int(f[j])
                adjs.append(pos[s0:s0 + c0] - off)
            scal[ci] = lucene_sloppy_freq(adjs, [0, 1], ["court", "law"], 2, True)
        sloppy_scalar_s = time.time() - ts0
        tb0 = time.time()
        batc = _sloppy_freqs_2term_batch(arrs, [0, 1], cand, 2, True)
        sloppy_batch_s = time.time() - tb0
        assert np.array_equal(scal, batc), "sloppy batch != scalar walk"

        total = build_s + sum(q_times.values())
        return {
            "metric": "index-build + headline BM25 query suite wall time",
            "value": round(total, 3),
            "unit": "sec",
            "queries": q_times,
            "sf": sf,
            "n_docs": n_docs,
            "cpus": cpus,
            "index_build_sec": round(build_s, 3),
            "docs_per_sec": round(n_docs / build_s, 1),
            "posting_rows": n_posting_rows,
            "sum_ttf": idx.sum_total_term_freq,
            "query_p50_sec": round(sorted(q_times.values())[len(q_times) // 2], 4),
            "batched_suite_sec": round(batch_s, 3),
            "batched_queries_per_sec": round(len(k1_queries) / batch_s, 2),
            "spark_ceiling_probe_sec": round(ceiling_probe_s, 3),
            "ceiling_probe_pre_sec": round(ceiling_pre_s, 3),
            "ceiling_probe_post_sec": round(ceiling_post_s, 3),
            "positions_build_sec": round(pos_build_s, 3),
            "q_sloppy_head_sec": round(sloppy_best, 4),
            "q_termauto_sec": round(termauto_best, 4),
            "sloppy_candidates": int(len(cand)),
            "sloppy_scalar_walk_sec": round(sloppy_scalar_s, 4),
            "sloppy_batch_sec": round(sloppy_batch_s, 4),
            "sloppy_batch_speedup": round(sloppy_scalar_s / max(sloppy_batch_s, 1e-9), 1),
        }
    finally:
        spark.stop()


def run_tier_1m(cpus: int, n_docs: int = 1_000_000,
                q_repeat: int = 3) -> dict:
    """Scale tier ABOVE the job floor (r3 VERDICT #7): at sf0.1 the
    headline queries sit at the local-mode job floor (~0.5 s), so
    round-over-round engine deltas vanish into harness noise.  This tier
    builds a 1M-doc corpus and reruns the 10 headline queries plus the
    positional q_sloppy_head, where per-query work dominates the floor.
    One timed build (no best-of-N — the tier bounds driver-bench time),
    best-of-``q_repeat`` per query like the headline suite."""
    from lucene_spark.corpus import generate_pages
    from lucene_spark.index import build_index
    from lucene_spark.search import search

    spark = make_session(cpus)
    try:
        pages_pdf = generate_pages(n_docs, seed=42)
        pages = spark.createDataFrame(pages_pdf).repartition(max(cpus, 4))
        pages = pages.persist()
        pages.count()
        warm = spark.createDataFrame(pages_pdf.head(2000)).repartition(max(cpus, 4))
        build_index(spark, warm).postings.count()
        del pages_pdf

        t0 = time.time()
        idx = build_index(spark, pages)
        idx.postings = idx.postings.persist()
        idx.termdict = idx.termdict.persist()
        idx.termdict.count()
        idx.postings.count()
        idx.norms.count()
        build_s = time.time() - t0

        q_times: dict[str, float] = {}
        for wq in ("court", "court law", "court AND law"):
            search(idx, wq, k=10)
        for name, (q, k) in HEADLINE_QUERIES.items():
            best = None
            for _ in range(max(1, q_repeat)):
                tq = time.time()
                search(idx, q, k=k, precision="lucene", prune=True)
                dt = time.time() - tq
                best = dt if best is None else min(best, dt)
            q_times[name] = round(best, 4)

        tpos0 = time.time()
        pidx = build_index(spark, pages, with_positions=True)
        pidx.postings = pidx.postings.persist()
        pidx.postings.count()
        pos_build_s = time.time() - tpos0
        search(pidx, '"court law"~2', k=10, precision="lucene", prune=True)
        sloppy_best = None
        for _ in range(max(1, q_repeat)):
            tq = time.time()
            search(pidx, '"court law"~2', k=10, precision="lucene", prune=True)
            dt = time.time() - tq
            sloppy_best = dt if sloppy_best is None else min(sloppy_best, dt)

        return {
            "n_docs": n_docs,
            "index_build_sec": round(build_s, 3),
            "docs_per_sec": round(n_docs / build_s, 1),
            "queries": q_times,
            "query_p50_sec": round(sorted(q_times.values())[len(q_times) // 2], 4),
            "positions_build_sec": round(pos_build_s, 3),
            "q_sloppy_head_sec": round(sloppy_best, 4),
        }
    finally:
        spark.stop()


def run_workload_tiers(cpus: int) -> dict:
    """Percolation + dedup workload tiers (r4 VERDICT #9): the headline
    suite is pure BM25, so the Monitor full-query percolation path and the
    minhash-LSH near-dup pipeline could regress invisibly between rounds.
    Two end-to-end timings pin them in the driver artifact:

    - percolation: 50k docs x 100 stored queries (AND / OR / phrase mix)
      through the multipass presearcher + MemoryIndex verification
      (monitor.monitor_match_queries) — one timed Spark job after a
      warm-up;
    - dedup: minhash signatures (64 perms, 16 bands, JVM md5) + LSH banding
      + bucket self-join candidate pairs at 400k docs
      (textops.minhash_lsh_candidates).
    """
    from pyspark.sql import functions as F

    from lucene_spark.corpus import generate_pages
    from lucene_spark.monitor import monitor_match_queries
    from lucene_spark.textops import minhash_lsh_candidates

    spark = make_session(cpus)
    try:
        out: dict = {}

        # realistic stored-query mix: percolation registries are dominated
        # by SELECTIVE alerts (rare-term conjunctions), with some broader
        # disjunctions and phrase alerts — 34 tail-AND, 33 tail-OR, 33
        # common+tail phrases (candidates stay presearcher-pruned; the
        # MemoryIndex verification pays only for real candidate pairs)
        tail = [f"w{1000 + 37 * i:05d}" for i in range(70)]
        common = ["court", "law", "market", "report", "planes", "trains",
                  "automobiles", "ships"]
        queries: list[tuple[str, str]] = []
        for i in range(34):
            queries.append((f"qa{i}", f"{tail[i]} AND {tail[i + 1]}"))
        for i in range(33):
            queries.append((f"qo{i}", f"{tail[34 + i]} {tail[35 + i]}"))
        for i in range(33):
            queries.append(
                (f"qp{i}", f'"{common[i % 8]} {tail[2 * i % 70]}"'))

        pages = (spark.createDataFrame(generate_pages(50_000, seed=42))
                 .repartition(max(cpus, 4)))
        docs = pages.select(
            F.monotonically_increasing_id().alias("doc_id"),
            "text").persist()
        docs.count()
        # warm-up: worker spin-up + parse path, tiny query set
        monitor_match_queries(spark, docs, queries[:4]).count()
        t0 = time.time()
        n_matches = monitor_match_queries(spark, docs, queries).count()
        perc_s = time.time() - t0
        out["percolation"] = {
            "n_docs": 50_000,
            "n_queries": len(queries),
            "wall_sec": round(perc_s, 3),
            "matches": int(n_matches),
            "docs_x_queries_per_sec": round(50_000 * len(queries) / perc_s, 0),
        }
        docs.unpersist()

        big = (spark.createDataFrame(generate_pages(400_000, seed=42))
               .repartition(max(cpus, 4)))
        bdocs = big.select(
            F.monotonically_increasing_id().alias("doc_id"), "text").persist()
        bdocs.count()
        t0 = time.time()
        n_pairs = minhash_lsh_candidates(bdocs).count()
        dedup_s = time.time() - t0
        out["dedup_minhash"] = {
            "n_docs": 400_000,
            "num_perm": 64,
            "bands": 16,
            "wall_sec": round(dedup_s, 3),
            "candidate_pairs": int(n_pairs),
            "docs_per_sec": round(400_000 / dedup_s, 1),
        }
        return out
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-docs", type=int, default=None)
    ap.add_argument("--repeat", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BUILD_REPEAT", "3")))
    ap.add_argument("--build-only", action="store_true",
                    help="time only the build + paired A-B-A ceiling probes")
    ap.add_argument("--tier1m-docs", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_TIER1M_DOCS", "1000000")),
                    help="doc count for the above-the-floor tier (0 disables)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_docs = args.n_docs or max(int(500_000 * sf), 1000)

    result = run_bench(args.cpus, n_docs, sf, repeat=args.repeat,
                       build_only=args.build_only)
    # the 1M tier runs only in the full driver configuration (sf0.1,
    # no explicit --n-docs, not build-only) so ad-hoc small runs stay fast
    if (not args.build_only and args.n_docs is None and sf >= 0.1
            and args.tier1m_docs > 0):
        result["tier1m"] = run_tier_1m(args.cpus, args.tier1m_docs)
        # percolation + dedup workload tiers ride the same full-driver
        # configuration (r4 VERDICT #9)
        result.update(run_workload_tiers(args.cpus))
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
