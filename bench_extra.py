"""Per-query measurement harness for the optimization round (guide §1).

``bench.py`` is the frozen driver contract; this file is the builder's
own instrumentation: it times any subset of the declared queries with
the same noop-sink methodology, labels jobs, and can dump
``explain("formatted")`` plans to ``plans/<tag>/<query>_<suffix>.txt``.

Usage::

    python bench_extra.py [--plans r06 --suffix before] [--reps N] [q1 q2 ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32) — identical to bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--plans", default=None,
                    help="dump explain('formatted') under plans/<tag>/")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--skip-warmup", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bench._mk_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = args.queries or [q for q in bench.BENCH_QUERIES]
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if not args.skip_warmup:
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        # one small untimed replay warms the JVM/codegen/python pool the
        # same way bench.py does
        bench.cdc_replay(spark, 100_000, chunks_per_batch=8)

    plans_dir = None
    if args.plans:
        plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "plans", args.plans)
        os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        samples = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            samples.append(round(dt, 3))
            if plans_dir and rep == 0:
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                p = os.path.join(plans_dir, f"{name}_{args.suffix}.txt")
                with open(p, "w") as fh:
                    fh.write(buf.getvalue())
            spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(f"  {name}: {samples}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cores": cores, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
