"""Phase-level profile of the bench build at one parallelism level —
used to locate the serial (Amdahl) tail that caps N->4N scaling
efficiency after the r04 kernel vectorization made the parallel part
~2.5x faster.

Usage: python tools/profile_build_phases.py <cpus> [cycles]
Prints one RESULT json line with per-phase wall times.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

cpus = int(sys.argv[1])
cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 96
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from bench import build_session, cycled_docs  # noqa: E402

spark = build_session(cpus)
spark.sparkContext.setLogLevel("ERROR")
docs, n = cycled_docs(spark, sf_dir, cycles)

from lucene_clj_spark.indexer import (  # noqa: E402
    _build_tables, _suggest_union, normalize_field_specs,
)
from lucene_clj_spark.analysis import resolve_analyzer, STANDARD  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

best = None
for attempt in range(2):
    spark.catalog.clearCache()
    # clearCache() UNREGISTERS the input cache — re-mark + re-pin
    docs.cache()
    docs.count()
    phases = {}
    t_total = time.time()

    t0 = time.time()
    specs = normalize_field_specs(
        {"text": "text", "lang": "keyword", "source": "keyword",
         "n_chars": "long"})
    default_an = resolve_analyzer(None, STANDARD)
    analyzers = {None: default_an}
    d = docs.withColumn("doc_id", F.col("doc_id").cast("long"))
    phases["plan_setup"] = time.time() - t0

    t0 = time.time()
    raw, postings, terms, terms_full, stats, n_docs = _build_tables(
        d, specs, analyzers, default_an, cache=True)
    phases["build_tables_call"] = time.time() - t0  # includes stats collect

    t0 = time.time()
    suggest_df = _suggest_union(d, specs, analyzers, default_an)
    phases["suggest_union_plan"] = time.time() - t0

    t0 = time.time()
    terms.count()
    phases["terms_count"] = time.time() - t0

    t0 = time.time()
    stored = d.select("doc_id", "text", "lang", "source", "n_chars").cache()
    stored.count()
    phases["docs_count"] = time.time() - t0

    phases["total"] = time.time() - t_total
    print(f"attempt {attempt} local[{cpus}]:",
          json.dumps({k: round(v, 3) for k, v in phases.items()}))
    if best is None or phases["total"] < best["total"]:
        best = phases
    stored.unpersist()

print("RESULT " + json.dumps(
    {"cpus": cpus, "n_docs": n,
     **{k: round(v, 3) for k, v in best.items()}}))
