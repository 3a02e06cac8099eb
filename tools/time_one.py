#!/usr/bin/env python
"""Time one or more catalog queries in isolation via the noop sink.

Usage::

    python tools/time_one.py [-n REPS] QUERY [QUERY ...]

Prints per-rep seconds and the min (the bench's steady-state metric,
see bench.py run_query).  Reads $SPARK_GRAFT_SF_DIR (default sf0.1).
Used during optimization rounds to isolate a single plan's cost without
paying a full bench sweep; jobs are labelled so the history server /
event log attributes stages to the query under test.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geospatial_etl_pipeline_spark.plans import catalog  # noqa: E402
from geospatial_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    catalog.load_all_plans()
    spark = get_spark("time-one")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM + parquet footers + python worker pool + the
    # DataFrame->RDD bridge (fan_out/localCheckpoint ride it; first
    # .rdd access pays ~0.95 s of session setup)
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(8).rdd.getNumPartitions()
    for name in names:
        spec = catalog.QUERIES[name]
        ts = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(ts):.3f}  " + " ".join(f"{t:.3f}" for t in ts),
            flush=True,
        )


if __name__ == "__main__":
    main()
