"""spark-submit entry point: build a disk index (+ compressed segments)
over a web-pages or documents parquet table.

    spark-submit --py-files lucene_clj_spark.zip tools/build_index.py \
        --input /data/webpages --output /data/index \
        --text-col text --id-col doc_id [--resume] [--buckets 64]

Packaging: ``cd /root/repo && zip -r lucene_clj_spark.zip
lucene_clj_spark`` produces the --py-files artifact. On a cluster the
same script runs unchanged at N or 4N executors; the bucket-granular
segment build checkpoints per-bucket manifests, so a killed build
resumes with --resume without recomputing finished buckets.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default=None)
    ap.add_argument("--order-by", default=None,
                    help="column for deterministic dense doc ids when "
                         "no --id-col (e.g. url)")
    ap.add_argument("--keyword-cols", default="",
                    help="comma-separated keyword columns")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--chunk-span", type=int, default=1 << 17)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--append", action="store_true",
                    help="add --input's documents to the EXISTING index "
                         "at --output (repeated index!; doc ids must "
                         "not collide); segments are rebuilt after")
    ap.add_argument("--no-segments", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_clj_spark import create_index
    from lucene_clj_spark.segments import build_segments

    spark = (
        SparkSession.builder.appName("lucene-clj-spark-build")
        # instants are stored/compared as UTC wall clocks; pin the
        # session so string->timestamp parsing etc. never drift
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)
    fields = {args.text_col: "text"}
    for c in filter(None, args.keyword_cols.split(",")):
        fields[c] = "keyword"
    extra = set(docs.columns) - set(fields) - {args.id_col}

    import os

    from lucene_clj_spark.indexer import Index

    t0 = time.time()
    # The base index commits its _stats.json sidecar LAST (after all
    # tables + _field_specs.json), so its presence means the base build
    # completed: --resume then LOADS it and only resumes the segment
    # build. A kill before that point leaves an incomplete base, which
    # is rebuilt from scratch (base tables are one atomic-enough job;
    # per-bucket checkpointing applies to the segment encode).
    base_done = os.path.exists(os.path.join(args.output, "_stats.json"))
    if args.append:
        if not base_done:
            raise SystemExit(
                f"--append: no completed index at {args.output}"
            )
        idx = Index.load(spark, args.output)
        idx.add_documents(docs, id_column=args.id_col or "doc_id",
                          ignore_extra_columns=bool(extra))
        print(f"appended {args.input} to {args.output} "
              f"in {time.time()-t0:.1f}s")
    elif args.resume and base_done:
        idx = Index.load(spark, args.output)
        print(f"base index loaded from {args.output} (resume)")
    else:
        idx = create_index(
            spark,
            docs,
            fields,
            id_column=args.id_col,
            order_by=[args.order_by] if args.order_by else None,
            path=args.output,
            index_type="disk",
            re_create=True,
            ignore_extra_columns=bool(extra),
            cache=False,
        )
        print(f"index written to {args.output} in {time.time()-t0:.1f}s")
    if not args.no_segments:
        t0 = time.time()
        build_segments(
            idx,
            n_buckets=args.buckets,
            chunk_span=args.chunk_span,
            resume=args.resume,
            lineage={"source": args.input},
            log=print,
        )
        print(f"segments built in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
