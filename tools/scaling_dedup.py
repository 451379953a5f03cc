"""Executor-mode scaling matrix for the DEDUP stage (round 5).

The north rule's N→4N executor criterion is evidenced on the CDC
rule-application stage (BASELINE.md, round 4); this tool runs the same
protocol on the training-data side's signature workload — MinHash-LSH
near-dup pair generation over a realistic-vocabulary corpus — so the
scaling story covers both halves of the engine. Same harness shape as
``bench.py --scaling``: real executor JVMs via
``local-cluster[N,1,4096]``, identical deterministic input at both
levels, best-of-K and mean-of-K reported with every run.

The job: generate `n_docs` realistic docs (deterministic expressions,
no RNG — generation is part of the measured job, identically at both
levels), run ``minhash_lsh_pairs(threshold=0.8).count()``. The work is
shingle/signature hashing + one banded shuffle — compute-shaped, so it
should scale until the host byte wall, unlike the byte-bound merge
path.

Usage: python tools/scaling_dedup.py [n_docs] [runs_per_level]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _mk_spark(n_exec: int):
    from pyspark.sql import SparkSession

    mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "4096"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return (SparkSession.builder
            .master(f"local-cluster[{n_exec},1,{mem_mb}]")
            .appName("dedup-scaling")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.shuffle.partitions", str(max(n_exec * 2, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "8g")
            .config("spark.executorEnv.PYTHONPATH", repo)
            .getOrCreate())


def worker(n_exec: int, n_docs: int) -> None:
    import time

    from bench_similarity_corpus import realistic_docs
    from embulk_filter_column_spark.operators import minhash_lsh_pairs

    spark = _mk_spark(n_exec)
    spark.sparkContext.setLogLevel("ERROR")
    # untimed warm-up at 1/8 size: JIT, codegen cache, executor spin-up
    warm = realistic_docs(spark, max(n_docs // 8, 1000))
    minhash_lsh_pairs(warm, threshold=0.8).count()
    docs = realistic_docs(spark, n_docs)
    t0 = time.monotonic()
    n_pairs = minhash_lsh_pairs(docs, threshold=0.8).count()
    dt = time.monotonic() - t0
    print(json.dumps({"n_exec": n_exec, "sec": round(dt, 2),
                      "docs_per_sec": round(n_docs / dt, 1),
                      "n_pairs": n_pairs}))
    spark.stop()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo, hi = (int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALING_EXECS", "1,4").split(","))
    rates: dict = {}
    for n_exec in (lo, hi):
        rates[n_exec] = []
        for i in range(runs):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(n_exec), str(n_docs)],
                capture_output=True, text=True)
            if proc.returncode != 0:
                # surface the worker's Spark traceback and keep the
                # runs already measured instead of an opaque abort
                print(f"worker ({n_exec} exec, run {i + 1}) FAILED:\n"
                      f"{proc.stderr[-4000:]}", file=sys.stderr)
                continue
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            print(f"  {n_exec} exec run {i + 1}: {r['docs_per_sec']:.0f}"
                  f" docs/s ({r['sec']}s, {r['n_pairs']} pairs)",
                  file=sys.stderr)
            rates[n_exec].append(r["docs_per_sec"])
    if not rates[lo] or not rates[hi]:
        print(json.dumps({"error": "no successful runs at a level",
                          "all_runs": rates}))
        sys.exit(1)
    best = {k: max(v) for k, v in rates.items()}
    mean = {k: sum(v) / len(v) for k, v in rates.items()}
    print(json.dumps({
        "metric": f"dedup_scaling_efficiency_{lo}_to_{hi}_exec",
        "value": round((best[hi] / best[lo]) / (hi / lo), 3),
        "value_mean": round((mean[hi] / mean[lo]) / (hi / lo), 3),
        "unit": "ratio", "n_docs": n_docs, "runs_per_level": runs,
        "all_runs": {str(k): [round(x, 1) for x in v]
                     for k, v in rates.items()},
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
