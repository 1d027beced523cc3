"""spark-submit entry point: query a built index.

    spark-submit --py-files lucene_clj_spark.zip tools/query_index.py \
        --index /data/index --field text --query "merge window" \
        [--mode auto|wand|dataframe] [--k 10] [--fuzzy] [--page N] \
        [--dsl]

``--dsl`` parses the query with the classic QueryParser grammar —
booleans, parens at any depth, boosts, phrases, fuzzy:
``--dsl --query '((merge AND window) OR (dup AND scan)) NOT compact'``.
With ``--mode auto`` (the default for --dsl) eligible shapes route to
the segment kernels; ``--explain`` prints which execution path served
the query.

``--batch log.tsv`` replays a query LOG (one ``query_id<TAB>dsl``
line per query) as ONE Spark job via search_batch — the throughput
path for offline eval; emits (query_id, doc_id, score) JSON lines."""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--field", default="text")
    ap.add_argument("--query")
    ap.add_argument("--batch",
                    help="file of 'query_id<TAB>dsl_query' lines — "
                         "the whole log runs as ONE Spark job "
                         "(batch.py:search_batch); emits JSON lines "
                         "(query_id, doc_id, score)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["auto", "dataframe", "wand"],
                    default=None)
    ap.add_argument("--wand-mode", choices=["or", "and"], default="or")
    ap.add_argument("--fuzzy", action="store_true")
    ap.add_argument("--page", type=int, default=None)
    ap.add_argument("--dsl", action="store_true",
                    help="parse --query with the QueryParser grammar "
                         "(nested parens, AND/OR/NOT, ^boosts, "
                         "phrases, ~fuzzy)")
    ap.add_argument("--explain", action="store_true",
                    help="print the execution path (kernel vs "
                         "DataFrame) to stderr")
    args = ap.parse_args()
    if (args.query is None) == (args.batch is None):
        ap.error("exactly one of --query / --batch is required")
    if args.mode is None:
        args.mode = "auto" if args.dsl else "dataframe"

    from pyspark.sql import SparkSession

    from lucene_clj_spark import Index
    from lucene_clj_spark.wand import wand_topk

    spark = (
        SparkSession.builder.appName("lucene-clj-spark-query")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    idx = Index.load(spark, args.index)

    t0 = time.time()
    if args.batch:
        from lucene_clj_spark.query import parse_dsl

        qs = {}
        with open(args.batch) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                qid, _, q = line.partition("\t")
                qs[qid] = parse_dsl(q, args.field, idx.specs,
                                    idx.analyzers)
        out = idx.search_batch(qs, results_per_page=args.k)
        rows = out.collect()
        dt = time.time() - t0
        for r in rows:
            print(json.dumps({"query_id": r["query_id"],
                              "doc_id": r["doc_id"],
                              "score": r["score"]}))
        print(f"# {len(rows)} hits for {len(qs)} queries in "
              f"{dt:.3f}s (one job)", file=sys.stderr)
        return
    if args.dsl:
        from lucene_clj_spark.query import parse_dsl

        ast = parse_dsl(args.query, args.field, idx.specs, idx.analyzers)
        out = idx.search(ast, results_per_page=args.k, page=args.page,
                         with_hit=False, strategy=args.mode)
    elif args.mode == "wand":
        terms = idx.analyzer_for(args.field).tokens(args.query)
        out = wand_topk(idx, args.field, terms, k=args.k,
                        mode=args.wand_mode)
    elif args.fuzzy:
        out = idx.search({args.field: args.query}, fuzzy=True,
                         results_per_page=args.k, with_hit=False)
    else:
        out = idx.search(args.query, field_name=args.field,
                         results_per_page=args.k, page=args.page,
                         with_hit=False, strategy=args.mode)
    if args.explain:
        plan = out._jdf.queryExecution().executedPlan().toString()
        path = ("segment kernel (MapInPandas)"
                if "MapInPandas" in plan else "DataFrame plan")
        print(f"# path: {path}", file=sys.stderr)
    rows = out.collect()
    dt = time.time() - t0
    for r in rows:
        print(json.dumps({"doc_id": r["doc_id"], "score": r["score"]}))
    print(f"# {len(rows)} hits in {dt:.3f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
