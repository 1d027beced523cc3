"""One timed index build in a fresh JVM with configurable knobs —
used for matched-window A/B of session-level settings (cache
compression, arrow batch size) on the build hot path.

Usage:
  python tools/ab_build.py <cpus> <cycles> [key=val ...]
Prints one RESULT json line (best of SPARK_GRAFT_BUILD_ATTEMPTS).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

cpus = int(sys.argv[1])
cycles = int(sys.argv[2])
conf = dict(kv.split("=", 1) for kv in sys.argv[3:])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession  # noqa: E402

b = (SparkSession.builder.master(f"local[{cpus}]")
     .appName("ab_build")
     .config("spark.sql.shuffle.partitions", str(cpus))
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.driver.memory", "64g")
     .config("spark.sql.session.timeZone", "UTC")
     .config("spark.ui.enabled", "false")
     .config("spark.sql.execution.arrow.pyspark.enabled", "true"))
for k, v in conf.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from bench import cycled_docs  # noqa: E402
from lucene_clj_spark import create_index  # noqa: E402

docs, n = cycled_docs(spark, sf_dir, cycles)

best = None
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
    best = dt if best is None else min(best, dt)

print("RESULT " + json.dumps({
    "cpus": cpus, "n_docs": n, "conf": conf,
    "build_sec": round(best, 3),
    "docs_per_sec": round(n / best, 1),
}))
