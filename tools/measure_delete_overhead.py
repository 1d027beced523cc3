"""Measure the tombstone-mask cost on the query paths.

Builds a disk index + segments over the sf docs, then times the same
queries with 0 / 1k / 100k tombstones:

- kernel path (wand_topk): the mask is a sorted-searchsorted probe
  over each chunk's candidates inside _push_topk;
- DataFrame path: literal NOT-IN under TOMBSTONE_LITERAL_MAX (4096)
  ids, broadcast anti-join above it.

Deleted ids are chosen AWAY from the query terms' result sets so the
timing isolates mask overhead rather than result-set change. Prints
one JSON line; paste the table into BENCH/BASELINE.md.

Usage: python tools/measure_delete_overhead.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
RUNS = 7


def timed(fn):
    for _ in range(3):  # JIT warm-up (see bench.py)
        fn()
    samples = []
    for _ in range(RUNS):
        t = time.time()
        fn()
        samples.append(time.time() - t)
    return round(min(samples), 4)


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from lucene_clj_spark import create_index
    from lucene_clj_spark.segments import build_segments
    from lucene_clj_spark.wand import wand_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    max_id = docs.agg({"doc_id": "max"}).collect()[0][0]
    root = tempfile.mkdtemp(prefix="delbench") + "/idx"
    idx = create_index(
        spark, docs, {"text": "text", "lang": "keyword"},
        id_column="doc_id", index_type="disk", path=root,
        ignore_extra_columns=True,
    )
    build_segments(idx)

    terms = ["merge", "window", "dup"]
    hit_ids = {
        r.doc_id
        for r in wand_topk(idx, "text", terms, k=200).collect()
    }

    def non_hits(n):
        # real non-hit ids first (exercise actual masking), padded
        # past max_id when the corpus is smaller than n (the probe
        # cost is the same — the array is what the kernel searches)
        out, i = [], 0
        while len(out) < n and i <= max_id:
            if i not in hit_ids:
                out.append(i)
            i += 1
        out.extend(range(max_id + 1, max_id + 1 + (n - len(out))))
        return out

    results = {"sf_dir": SF_DIR, "n_docs": n_docs, "cpus": CPUS,
               "runs": RUNS}

    def q_kernel():
        wand_topk(idx, "text", terms, k=10).collect()

    def q_df():
        idx.search(
            {"text": set(terms)}, results_per_page=10,
            with_hit=False, strategy="dataframe",
        ).collect()

    base_expected = [
        (r.doc_id, round(r.score, 6))
        for r in wand_topk(idx, "text", terms, k=10).collect()
    ]
    results["kernel_0"] = timed(q_kernel)
    results["df_0"] = timed(q_df)
    for n in (1000, 100_000):
        idx.tombstones = frozenset()  # reset in-memory (bench-only)
        for a in ("_docs_all", "_post_all"):
            if hasattr(idx, a):
                delattr(idx, a)
        idx.docs = spark.read.parquet(f"{root}/docs")
        idx.postings = spark.read.parquet(f"{root}/postings")
        idx.delete_documents(non_hits(n))
        got = [
            (r.doc_id, round(r.score, 6))
            for r in wand_topk(idx, "text", terms, k=10).collect()
        ]
        assert got == base_expected, "mask changed unrelated results"
        results[f"kernel_{n}"] = timed(q_kernel)
        results[f"df_{n}"] = timed(q_df)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
