"""Fixed-cost decomposition for the 8→32 scaling residual.

The A-B-A ladders show the engine's raw 8→32 efficiency rising with corpus
size while the paired perfectly-parallel ceiling sits at ~1.0 — the classic
Amdahl signature of a parallelism-independent fixed cost per build, not a
shuffle/skew defect.  This probe measures that fixed cost directly, per
parallelism level, in one fresh JVM each:

- ``job_overhead_sec``: median wall time of a trivial 1-partition job
  (``spark.range(1).count()``) — pure driver job-submission + scheduling.
- ``tiny_shuffle_sec``: a 1000-row groupBy — the smallest AQE-planned
  exchange; driver planning + stage barrier cost.
- ``pyworker_stage_sec``: a 1-row-per-partition mapInPandas over cpus
  partitions AFTER warmup — per-stage Python-worker round-trip cost.

The engine build schedules ~10 such jobs/stages (invert, pack, shuffle,
termdict agg, three cache materializations, norms rollup); multiply the
medians by that count and you get the serial seconds the two-point Amdahl
fit predicts from the ladder itself (BENCH.md).  Usage:
``python amdahl_probe.py`` → one JSON line.
"""

from __future__ import annotations

import json
import statistics
import time

from bench import make_session


def probe_level(cpus: int, reps: int = 7) -> dict:
    import pandas as pd

    spark = make_session(cpus)
    try:
        # warm everything once: JIT, scheduler, Python workers
        spark.range(1).count()
        df = spark.range(1000).repartition(cpus)
        df.groupBy((df.id % 10).alias("k")).count().collect()

        def noop(batches):
            for b in batches:
                yield pd.DataFrame({"v": [len(b)]})

        spark.range(cpus).repartition(cpus).mapInPandas(
            noop, "v long").count()

        def med(fn):
            ts = []
            for _ in range(reps):
                t0 = time.time()
                fn()
                ts.append(time.time() - t0)
            return round(statistics.median(ts), 4)

        return {
            "cpus": cpus,
            "job_overhead_sec": med(lambda: spark.range(1).count()),
            "tiny_shuffle_sec": med(
                lambda: df.groupBy((df.id % 10).alias("k")).count()
                .collect()),
            "pyworker_stage_sec": med(
                lambda: spark.range(cpus).repartition(cpus)
                .mapInPandas(noop, "v long").count()),
        }
    finally:
        spark.stop()


def main() -> None:
    out = {str(c): probe_level(c) for c in (8, 32)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
