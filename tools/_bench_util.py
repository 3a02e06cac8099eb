"""Shared sentinels for the ops benchmarks (stream/ingest/CLI).

r8 verdict, next-round item 2: stream/ingest micro-batch throughput sat
~35% below r6 for two rounds on byte-identical code, and the only
defense was a prose host note — unfalsifiable, because those benches
had no sentinel.  bench.py's CPU sentinel can't help: micro-batch cost
is NOT CPU-bound, it is per-batch fixed cost — query planning, state
checkpoint commits (many tiny files + renames), small-file parquet
write/read.  This module provides a MICRO-BATCH sentinel that exercises
exactly that path with a fixed, data-independent workload, so each
bench can report throughput normalized by the host's micro-batch
capacity on the day:

    normalized_value = raw_value * (sentinel_median / REF not needed)
                     = rows/sec * sentinel_sec   ("rows per sentinel")

A host phase that slows checkpoint fsyncs slows the sentinel by the
same factor, and the product cancels it.  Reporting BOTH sentinels (CPU
and micro-batch) additionally separates "the box's CPUs are busy" from
"the box's small-file IO path is degraded" — the two failure modes the
r6→r7/r8 anomaly could not distinguish.
"""

from __future__ import annotations

import os
import shutil
import statistics
import tempfile
import time

_SENT_FILES = 8
_SENT_ROWS = 400_000  # 8 files x 50k rows: big enough to be stable,
# small enough that the run is dominated by per-batch fixed cost —
# which is the noise term we want to measure.


def run_microbatch_sentinel(spark) -> float:
    """One fixed availableNow file-stream: 8 parquet files consumed one
    per trigger through an identity projection into a checkpointed
    foreachBatch parquet sink.  8 micro-batches of planning + commit +
    small-file IO; data content is constant."""
    work = tempfile.mkdtemp(prefix="mb_sentinel_")
    src = os.path.join(work, "src")
    sink = os.path.join(work, "sink")
    ckpt = os.path.join(work, "ckpt")
    try:
        spark.range(_SENT_ROWS).repartition(_SENT_FILES).write.mode(
            "overwrite"
        ).parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )

        def _sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(sink)

        t0 = time.perf_counter()
        q = (
            stream.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def microbatch_sentinel_series(spark, runs: int = 3) -> dict:
    """Median-of-N sentinel record to embed in a bench artifact."""
    series = [round(run_microbatch_sentinel(spark), 3) for _ in range(runs)]
    return {
        "plan": f"{_SENT_FILES} parquet files -> availableNow file stream, "
        "1 file/trigger, identity -> checkpointed foreachBatch parquet",
        "runs": series,
        "median_sec": round(statistics.median(series), 3),
    }


def cpu_sentinel_median(spark, runs: int = 3) -> float:
    """bench.py's pure-JVM CPU probe, for the CPU-vs-IO split."""
    import bench  # local import: tools/ callers add repo root to path

    return round(
        statistics.median(bench.run_sentinel(spark) for _ in range(runs)), 3
    )
