"""Task-metric decomposition of the index build at one parallelism
level: run one timed build with the Spark event log enabled, then sum
per-stage executorRunTime / executorCpuTime / jvmGcTime /
shuffle+serialization components from the log.  Comparing N=1 vs 4N=4
shows whether the 4-slot level loses wall time to inflated CPU
(memory-bandwidth / allocator contention), GC, or scheduler gaps —
i.e. WHERE the scaling-efficiency loss lives.

Usage: python tools/build_task_metrics.py <cpus> [cycles]
"""
from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

cpus = int(sys.argv[1])
cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 96
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
evdir = tempfile.mkdtemp(prefix="spark_ev_")

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName("task_metrics")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "64g")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.eventLog.enabled", "true")
         .config("spark.eventLog.compress", "false")
         .config("spark.eventLog.dir", evdir)
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from bench import cycled_docs  # noqa: E402
from lucene_clj_spark import create_index  # noqa: E402

docs, n = cycled_docs(spark, sf_dir, cycles)
# warm attempt (JIT, python workers), then the measured attempt
for attempt in range(2):
    spark.catalog.clearCache()
    docs.cache()
    docs.count()
    if attempt == 1:
        marker_start = time.time()
        spark.sparkContext.setJobGroup("measured", "measured build")
    t0 = time.time()
    idx = create_index(
        spark, docs,
        {"text": "text", "lang": "keyword", "source": "keyword",
         "n_chars": "long"},
        id_column="doc_id",
    )
    idx.terms.count()
    idx.docs.count()
    print(f"attempt {attempt}: {time.time()-t0:.2f}s")
wall = time.time() - marker_start
spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
spark.stop()

# --- parse the event log -------------------------------------------
paths = []
for p in glob.glob(f"{evdir}/*"):
    if os.path.isdir(p):  # rolling event-log v2 layout
        paths.extend(sorted(glob.glob(f"{p}/events_*")))
    elif os.path.basename(p).startswith("local-"):
        paths.append(p)
stages = {}  # stage_id -> metric sums
stage_jobgroup = {}


def _lines():
    for p in paths:
        with open(p) as f:
            yield from f


stage_span = {}
if True:
    for line in _lines():
        ev = json.loads(line)
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
            for sid in ev.get("Stage IDs", []):
                stage_jobgroup[sid] = grp
        elif k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            if stage_jobgroup.get(sid) == "measured" and \
                    si.get("Submission Time"):
                stage_span[sid] = (si["Submission Time"],
                                   si["Completion Time"])
        elif k == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            if stage_jobgroup.get(sid) != "measured":
                continue
            m = ev.get("Task Metrics") or {}
            s = stages.setdefault(sid, {
                "tasks": 0, "run_ms": 0, "cpu_ms": 0, "gc_ms": 0,
                "deser_ms": 0, "ser_ms": 0, "sched_delay_proxy": 0})
            s["tasks"] += 1
            s["run_ms"] += m.get("Executor Run Time", 0)
            s["cpu_ms"] += m.get("Executor CPU Time", 0) / 1e6
            s["gc_ms"] += m.get("JVM GC Time", 0)
            s["deser_ms"] += m.get("Executor Deserialize Time", 0)
            s["ser_ms"] += m.get("Result Serialization Time", 0)

tot = {"run_ms": 0, "cpu_ms": 0, "gc_ms": 0, "tasks": 0}
print(f"\nwall (measured attempt): {wall:.2f}s   cpus={cpus}")
print(f"{'stage':>6} {'tasks':>5} {'run_s':>8} {'cpu_s':>8} "
      f"{'gc_s':>6} {'wait_s':>8} {'span_s':>8}")
span_sum = 0.0
prev_end = None
gap_sum = 0.0
for sid in sorted(stages):
    s = stages[sid]
    wait = (s["run_ms"] - s["cpu_ms"] - s["gc_ms"]) / 1000
    span = ""
    if sid in stage_span:
        sub, comp = stage_span[sid]
        span_s = (comp - sub) / 1000
        span_sum += span_s
        if prev_end is not None and sub > prev_end:
            gap_sum += (sub - prev_end) / 1000
        prev_end = comp
        span = f"{span_s:>8.2f}"
    print(f"{sid:>6} {s['tasks']:>5} {s['run_ms']/1000:>8.2f} "
          f"{s['cpu_ms']/1000:>8.2f} {s['gc_ms']/1000:>6.2f} "
          f"{wait:>8.2f} {span}")
    for kk in ("run_ms", "cpu_ms", "gc_ms"):
        tot[kk] += s[kk]
    tot["tasks"] += s["tasks"]
print(f"sum of stage spans: {span_sum:.2f}s; "
      f"inter-stage driver gaps: {gap_sum:.2f}s; "
      f"wall - spans - gaps = {wall - span_sum - gap_sum:.2f}s "
      f"(pre-first-stage driver time incl. plan/analysis)")
print(f"{'TOTAL':>6} {tot['tasks']:>5} {tot['run_ms']/1000:>8.2f} "
      f"{tot['cpu_ms']/1000:>8.2f} {tot['gc_ms']/1000:>6.2f} "
      f"{(tot['run_ms']-tot['cpu_ms']-tot['gc_ms'])/1000:>8.2f}")
print("RESULT " + json.dumps({
    "cpus": cpus, "wall_s": round(wall, 2),
    "sum_run_s": round(tot["run_ms"] / 1000, 2),
    "sum_cpu_s": round(tot["cpu_ms"] / 1000, 2),
    "sum_gc_s": round(tot["gc_ms"] / 1000, 2),
}))
