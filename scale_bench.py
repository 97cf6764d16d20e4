"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

Sandbox stand-in (BASELINE.md): the same index-build job at local[8] and
local[32] on identical input; efficiency = throughput(32) / (4 x throughput(8)).
Writes BENCH.md and prints a JSON summary.  Run: python scale_bench.py
"""

from __future__ import annotations

import json
import subprocess
import sys
import time


def run_at(cpus: int, n_docs: int) -> dict:
    # fresh JVM per parallelism level so executor-thread count is honest
    out = subprocess.run(
        [sys.executable, "bench.py", "--cpus", str(cpus), "--n-docs", str(n_docs)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    results = {}
    for cpus in (8, 32):
        t0 = time.time()
        results[cpus] = run_at(cpus, n_docs)
        results[cpus]["wall_total_sec"] = round(time.time() - t0, 1)

    tput8 = results[8]["docs_per_sec"]
    tput32 = results[32]["docs_per_sec"]
    eff = tput32 / (4 * tput8)
    summary = {
        "n_docs": n_docs,
        "throughput_local8_docs_per_sec": tput8,
        "throughput_local32_docs_per_sec": tput32,
        "scaling_efficiency": round(eff, 3),
        "meets_north_rule_0.8": eff >= 0.8,
    }

    lines = [
        "# BENCH — measured results (local sandbox)",
        "",
        "North-rule scaling criterion evidenced per BASELINE.md: same index-build",
        "job at two parallelism levels (local[8] vs local[32] = N vs 4N executor",
        "stand-in), identical input, efficiency = tput(4N) / (4 x tput(N)).",
        "",
        "| config | n_docs | build sec | docs/sec | query p50 sec |",
        "|---|---|---|---|---|",
    ]
    for cpus in (8, 32):
        r = results[cpus]
        lines.append(
            f"| local[{cpus}] | {r['n_docs']} | {r['index_build_sec']} | "
            f"{r['docs_per_sec']} | {r['query_p50_sec']} |"
        )
    lines += [
        "",
        f"**Scaling efficiency: {summary['scaling_efficiency']}** "
        f"({'meets' if summary['meets_north_rule_0.8'] else 'BELOW'} the >=0.8 north-rule bar)",
        "",
        "Per-query seconds at local[32]:",
        "",
        "```json",
        json.dumps(results[32]["queries"], indent=2),
        "```",
    ]
    with open("BENCH.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
