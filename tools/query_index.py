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
the query."""

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
    ap.add_argument("--query", required=True)
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
