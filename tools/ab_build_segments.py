"""Matched-window A/B: build_segments with physical-partition-pruned
bucket scans (r04) vs the r03 recomputed-pmod scans (S full postings
scans). Interleaves variants within one session so host steal noise
hits both sides equally; reports best-of-N per variant.

Usage: python tools/ab_build_segments.py [cycles] [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def recomputed_bucket_postings(index, b: int, n_buckets: int):
    """The r03 behavior: recompute pmod(xxhash64(term), S) as a fresh
    column — unprunable, so every bucket job scans the full table."""
    post = index.postings
    if "bucket" in post.columns:
        post = post.drop("bucket")
    return (
        post.withColumn(
            "__seg_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
        )
        .filter(F.col("__seg_bucket") == b)
        .drop("__seg_bucket")
    )


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import bench
    from lucene_clj_spark import create_index, segments

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = bench.build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs, n_docs = bench.cycled_docs(spark, bench.SF_DIR, cycles)

    work = tempfile.mkdtemp(prefix="ab_segbuild_")
    idx = create_index(
        spark, docs,
        {"text": "text", "lang": "keyword", "source": "keyword",
         "n_chars": "long"},
        id_column="doc_id", path=f"{work}/idx", index_type="disk",
        re_create=True, cache=False,
    )

    pruned_fn = segments._bucket_postings
    results: dict[str, list[float]] = {"pruned": [], "recomputed": []}
    try:
        for t in range(trials):
            for name, fn in (("pruned", pruned_fn),
                             ("recomputed", recomputed_bucket_postings)):
                segments._bucket_postings = fn
                out = f"{work}/seg_{name}_{t}"
                t0 = time.time()
                segments.build_segments(
                    idx, path=out, n_buckets=16, chunk_span=1 << 14,
                    resume=False,
                )
                dt = time.time() - t0
                results[name].append(round(dt, 3))
                print(f"trial {t} {name}: {dt:.2f}s", file=sys.stderr)
                shutil.rmtree(out, ignore_errors=True)
    finally:
        segments._bucket_postings = pruned_fn
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({
        "n_docs": n_docs,
        "cpus": cpus,
        "trials": trials,
        "pruned_samples": results["pruned"],
        "recomputed_samples": results["recomputed"],
        "pruned_best": min(results["pruned"]),
        "recomputed_best": min(results["recomputed"]),
        "speedup_best": round(
            min(results["recomputed"]) / min(results["pruned"]), 3
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
