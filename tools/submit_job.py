"""spark-submit entry point: mini CDC replay proving --py-files
deployment (north rule: "run via spark-submit --py-files on a
multi-executor cluster").

Usage:
    python tools/make_pyfiles_zip.py dist/efcs.zip
    spark-submit --master 'local[8]' --py-files dist/efcs.zip \
        tools/submit_job.py <n_events> <work_dir>

Prints one JSON line with events/sec.
"""

import json
import sys
import time


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/efcs_submit"

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("efcs-submit")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # package must resolve from the shipped --py-files zip
    from embulk_filter_column_spark.cdc import CDCPipeline
    from embulk_filter_column_spark.sources import (
        web_change_events,
        write_wal,
    )

    events = web_change_events(spark, n_events, n_domains=50,
                               pages_per_domain=100, seed=42)
    write_wal(events, f"{work}/wal", chunk_rows=max(n_events // 4, 1))
    t0 = time.monotonic()
    pipe = CDCPipeline(spark, f"{work}/wal", f"{work}/lake",
                       f"{work}/cp", num_buckets=32, chunks_per_batch=2)
    results = pipe.run()
    dt = time.monotonic() - t0
    merged = sum(r.rows_in for r in results)
    live = pipe.table().read().count()
    print(json.dumps({"events": merged, "sec": round(dt, 2),
                      "events_per_sec": round(merged / dt, 1),
                      "live_urls": live}))
    spark.stop()


if __name__ == "__main__":
    main()
