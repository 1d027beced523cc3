"""sf1 validation (VERDICT r03 item 6): correctness + timing at 10x
the per-round bench scale — 1.6M documents (sf0.1's 5,000 docs cycled
x320 with offset doc_ids, the same derivation bench.py uses at x32).

Runs the INDEX-SIDE oracle queries (everything backed by the documents
index: term/bool/phrase/fuzzy/DSL/pagination/suggest/segment kernels,
plus the row-wise text functions) on Spark AND DuckDB over the SAME
materialized sf1 tables, and records build/build_segments wall times.

Deliberately excluded: the dedup/near-dup/ANN pair queries — a corpus
manufactured by verbatim duplication has QUADRATIC true near-dup pairs
(320 copies of every doc = 51k intra-group pairs per source doc), so a
cycled corpus is the wrong input for pair-finding ops; their
correctness is gated at sf0.01 by the driver and their scale design
(bucketed joins, no cross join) by plan-shape tests. events/webpages/
multimodal queries don't read the documents table at all.

Usage: python tools/sf1_check.py [--cycles N] [out_dir]
Writes a markdown report to stdout (redirect to BENCH/sf1.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
CYCLES = 320
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

INDEX_QUERIES = [
    "term_topk", "term_topk_rare", "term_page2", "bool_and_topk",
    "bool_or_topk", "phrase_topk", "phrase3_topk", "fuzzy_topk",
    "fuzzy_bool_topk", "keyword_lang_topk", "typed_exact_nchars",
    "corpus_stats", "term_stats_top20", "search_after",
    "dsl_boost_topk", "dsl_grouped_topk", "dsl_nested_topk",
    "hit_fn_topk", "multi_field_and_topk", "incremental_add_topk",
    "suggest_prefix", "suggest_context", "suggest_fuzzy",
    "wand_or_topk", "wand_search_after", "wand_tree_topk",
    "wand_group_topk", "wand_group_not_topk", "wand_phrase_bool_topk",
    "wand_tree_phrase_topk", "wand_multi_field_topk",
    "wand_fuzzy_bool_topk",
    "token_stats", "fingerprint", "lang_id",
    # round-4 multi-term DSL family: wildcard/range/regexp/match-all
    # constant-score rewrites and the sloppy-phrase greedy (its DuckDB
    # twin is a recursive CTE — at sf1 that's 1.6M state machines, a
    # stress test for the oracle as much as the engine)
    "dsl_wildcard_topk", "dsl_typed_range_topk", "dsl_term_range_topk",
    "dsl_matchall_not_topk", "dsl_sloppy_phrase_topk",
    "dsl_regexp_topk",
    # round-4 BooleanQuery extras: minimumNumberShouldMatch and the
    # unscored FILTER occur
    "bool_msm_topk", "bool_filter_topk",
    # round-4 collector family: full-match-set count/facets, stored-
    # field sort, per-term BM25 explain, deterministic highlighting
    "count_hits_and", "facet_lang_term", "sort_by_field_topk",
    "explain_topdoc", "highlight_topk",
    # round-4 continuation: DisjunctionMaxQuery, SpanFirstQuery,
    # field collapse (grouping module)
    "dismax_topk", "span_first_topk", "collapse_lang_topk",
    "constant_score_topk", "facet_ranges_nchars",
    # round-4 continuation: TermInSetQuery, MultiPhraseQuery, and the
    # delete family (stale-stats tombstone search at 1.6M docs with
    # ~229k tombstones — well past the broadcast anti-join threshold —
    # and the post-purge rebuild: a full-table rewrite at sf1)
    "term_in_set_topk", "multi_phrase_topk", "spell_suggest",
    "span_near_ordered_topk", "span_near_unordered_topk",
    # round-4 continuation: the rest of the span family, stored-field
    # value boosting, and the BPE-ish token-count estimators
    "span_or_topk", "wand_span_or_topk", "span_not_topk",
    "function_score_topk",
    # round-5 late kernels: sloppy phrase + minimumNumberShouldMatch
    # on the segment kernels (same oracles as their DataFrame twins —
    # the sloppy CTE replays 1.6M greedy state machines a second time)
    "wand_sloppy_phrase_topk", "wand_msm_topk",
    "token_counts", "quality_flags", "url_parts", "host_stats",
    "tfidf_top_terms",
    "sample_mix_stats", "shuffle_head",
    "delete_search_topk", "purge_search_topk",
    # round-4 batch family LAST: a 4-query log in one job, the
    # DataFrame-shaped log variant, and MoreLikeThis (40 query docs x
    # top-5). MLT on THIS corpus is a by-construction worst case —
    # 31-term vocab + 320 verbatim copies of every doc make the
    # candidate set corpus-sized (it OOM-killed a 64g JVM once) — so
    # it runs after everything else has reported, and the loop
    # rebuilds the session if the JVM dies.
    "batch_topk", "batch_df_topk", "mlt_topk",
]


def materialize(spark, out: str, cycles: int) -> int:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    base = spark.read.parquet(f"{SRC}/documents.parquet")
    n = base.count()
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        for i in range(cycles)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(CPUS * 4).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        src = f"{SRC}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)
    return n * cycles


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=CYCLES)
    ap.add_argument("out_dir", nargs="?", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    import bench
    from tools.check_oracle import normalize

    spark = bench.build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    sf1 = args.out_dir or os.path.join(
        tempfile.mkdtemp(prefix="sf1_"), "sf1"
    )
    t0 = time.time()
    n_docs = materialize(spark, sf1, args.cycles)
    t_mat = time.time() - t0
    print(f"# BENCH/sf1 — {n_docs:,} docs (sf0.1 x{args.cycles}), "
          f"local[{CPUS}]", flush=True)
    print(f"\nmaterialize: {t_mat:.1f}s -> {sf1}")

    # --- build + segments wall time at sf1 -----------------------------
    from lucene_clj_spark import create_index
    from lucene_clj_spark.segments import build_segments

    docs = spark.read.parquet(f"{sf1}/documents.parquet")
    t0 = time.time()
    didx = create_index(
        spark, docs,
        {"text": "text", "lang": "keyword", "source": "keyword",
         "n_chars": "long"},
        id_column="doc_id", path=f"{sf1}/_idx", index_type="disk",
        re_create=True, cache=False,
    )
    t_build = time.time() - t0
    t0 = time.time()
    build_segments(didx, n_buckets=16, chunk_span=1 << 17)
    t_seg = time.time() - t0
    print(f"\n| phase | wall s | rate |\n|---|---|---|")
    print(f"| create_index (disk, 4 fields, positions) | {t_build:.1f} "
          f"| {n_docs / t_build:,.0f} docs/s |")
    print(f"| build_segments (16 buckets) | {t_seg:.1f} "
          f"| {n_docs / t_seg:,.0f} docs/s |")

    # --- oracle gate ----------------------------------------------------
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf1}/{t}.parquet'"
        )
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf1}/documents.parquet/*.parquet'"
    )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    print("\n| query | spark s | duckdb s | rows | match |\n|---|---|---|---|---|")
    failures = []
    def run_spark(fn):
        sdf = fn(spark, sf1)
        return sdf.columns, [tuple(r) for r in sdf.collect()]

    for name in INDEX_QUERIES:
        fn = qs[name]
        t0 = time.time()
        try:
            s_cols, s_rows = run_spark(fn)
        except Exception as e:  # pragma: no cover - report path
            msg = str(e)
            dead = (
                "Connection refused" in msg
                or "Py4JNetworkError" in type(e).__name__ + msg
                or "Answer from Java side is empty" in msg
            )
            if dead:
                # the JVM died (a query OOM'd it) — rebuild the
                # session, drop the cached indexes bound to the dead
                # JVM, and retry this query ONCE
                try:
                    spark.stop()
                except Exception:
                    pass
                entry._INDEX_CACHE.clear()
                spark = bench.build_session(CPUS)
                spark.sparkContext.setLogLevel("ERROR")
                t0 = time.time()
                try:
                    s_cols, s_rows = run_spark(fn)
                except Exception as e2:
                    failures.append(name)
                    print(f"| {name} | SPARK ERROR after session "
                          f"rebuild: {e2} | | | FAIL |", flush=True)
                    continue
            else:
                failures.append(name)
                print(f"| {name} | SPARK ERROR: {e} | | | FAIL |",
                      flush=True)
                continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"| {name} | {t_spark:.2f} | — | {len(s_rows)} "
                  f"| rows-only |")
            continue
        t0 = time.time()
        try:
            pdf = con.sql(oracles[name]).df()
        except Exception as e:  # pragma: no cover
            failures.append(name)
            print(f"| {name} | {t_spark:.2f} | DUCKDB ERROR: {e} | | FAIL |")
            continue
        t_duck = time.time() - t0
        d_cols = list(pdf.columns)
        d_rows = [tuple(r) for r in pdf.itertuples(index=False)]
        sc, sr = normalize(s_rows, s_cols)
        dc, dr = normalize(d_rows, d_cols)
        ok = sc == dc and len(sr) == len(dr) and sr == dr
        if not ok:
            failures.append(name)
        print(f"| {name} | {t_spark:.2f} | {t_duck:.2f} | {len(sr)} "
              f"| {'ok' if ok else 'FAIL'} |", flush=True)

    print()
    if failures:
        print(f"**{len(failures)} FAILURES**: {failures}")
        sys.exit(1)
    print(f"**all {len(INDEX_QUERIES)} sf1 queries match the DuckDB "
          "oracle** (rows + columns + strict values).")
    spark.stop()


if __name__ == "__main__":
    main()
