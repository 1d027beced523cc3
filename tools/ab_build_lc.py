"""One timed index build on a local-cluster master — REAL separate
executor JVMs (own heap, GC, and Python workers per executor), the
closest in-sandbox analogue of "N vs 4N executors" in the north rule.

Usage:
  python tools/ab_build_lc.py <n_executors> <cores_per_exec> <cycles>
Prints one RESULT json line (best of SPARK_GRAFT_BUILD_ATTEMPTS).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

n_exec = int(sys.argv[1])
cores = int(sys.argv[2])
cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 96
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
total_cores = n_exec * cores

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder
         .master(f"local-cluster[{n_exec},{cores},8192]")
         .appName("ab_build_lc")
         .config("spark.sql.shuffle.partitions", str(total_cores))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.executor.memory", "7g")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.executorEnv.PYTHONPATH", "/root/repo")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from bench import cycled_docs  # noqa: E402
from lucene_clj_spark import create_index  # noqa: E402

docs, n = cycled_docs(spark, sf_dir, cycles)

best = None
times = []
for _ in range(int(os.environ.get("SPARK_GRAFT_BUILD_ATTEMPTS", "3"))):
    spark.catalog.clearCache()
    docs.cache()
    docs.count()
    t0 = time.time()
    idx = create_index(
        spark, docs,
        {"text": "text", "lang": "keyword", "source": "keyword",
         "n_chars": "long"},
        id_column="doc_id",
    )
    idx.terms.count()
    idx.docs.count()
    dt = time.time() - t0
    times.append(round(dt, 2))
    best = dt if best is None else min(best, dt)

print("RESULT " + json.dumps({
    "n_executors": n_exec, "cores_per_exec": cores, "n_docs": n,
    "build_sec": round(best, 3), "attempts": times,
    "docs_per_sec": round(n / best, 1),
}))
