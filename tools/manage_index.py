"""spark-submit entry point: index maintenance operations.

    spark-submit --py-files lucene_clj_spark.zip tools/manage_index.py \
        --index /data/index <subcommand> [args]

Subcommands (the ops a recrawling deployment runs on a cadence):

    delete --ids 7,42,99           tombstone documents by id
    delete --field url --terms U1,U2
                                   tombstone by delete key (recrawl)
    purge                          physical purge (forceMergeDeletes):
                                   rewrite tables, exact stats, rebuild
                                   segments — the compaction bill
    merge                          compact base + delta segments
                                   (segments.merge_segments)
    info                           print index stats, tombstone count,
                                   segment generation/deltas as JSON

Deletes are sidecar writes (cheap, per recrawl batch); `purge` and
`merge` are the two compactions — schedule them, don't run them per
batch. See indexer.delete_documents / purge_deletes docstrings for the
full contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("delete")
    d.add_argument("--ids", help="comma-separated doc_ids")
    d.add_argument("--field", help="delete-key field (with --terms)")
    d.add_argument("--terms", help="comma-separated verbatim keys")

    sub.add_parser("purge")
    sub.add_parser("merge")
    sub.add_parser("info")

    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("lucene_clj_spark-manage")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from lucene_clj_spark.indexer import Index

    idx = Index.load(spark, args.index)

    if args.cmd == "delete":
        if args.ids:
            ids = [int(x) for x in args.ids.split(",") if x]
            idx.delete_documents(ids)
        elif args.field and args.terms:
            idx.delete_by_terms(
                args.field, *[t for t in args.terms.split(",") if t]
            )
        else:
            ap.error("delete needs --ids or --field + --terms")
        print(json.dumps({"tombstones": len(idx.tombstones)}))
    elif args.cmd == "purge":
        n = len(idx.tombstones)
        idx.purge_deletes()
        print(json.dumps({"purged": n, "n_docs": idx.docs.count()}))
    elif args.cmd == "merge":
        from lucene_clj_spark.segments import merge_segments

        merge_segments(idx)
        print(json.dumps({"merged": True}))
    elif args.cmd == "info":
        from lucene_clj_spark.segments import segments_meta

        out = {
            "path": args.index,
            "n_docs_live": idx.docs.count(),
            "tombstones": len(idx.tombstones),
            "stats": idx.stats,
            "n_buckets": idx.buckets,
        }
        try:
            meta = segments_meta(args.index)
            out["segments"] = {
                k: meta.get(k)
                for k in ("format", "generation", "n_buckets",
                          "chunk_span", "block_size")
            }
        except Exception:
            out["segments"] = None
        print(json.dumps(out))


if __name__ == "__main__":
    main()
