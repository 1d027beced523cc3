"""BM25 correctness: SmallFloat quantization, Column/numpy/SQL parity,
and rank-identity of engine top-k against an independent brute-force
Python oracle (SURVEY.md §7.1 step 2-3)."""

import math

import numpy as np
import pytest

from lucene_clj_spark import bm25


# --- SmallFloat semantics ---------------------------------------------

def test_int4_roundtrip_small_values_exact():
    # numBits < 4 -> identity (subnormal path)
    for i in range(8):
        assert int(bm25.int4_to_int(bm25.int_to_int4(i))) == i


def test_int4_quantizes_to_top4_bits():
    for i in [9, 17, 100, 255, 1000, 12345, 2**20 + 12345]:
        q = int(bm25.int4_to_int(bm25.int_to_int4(i)))
        # q keeps the top 4 significant bits of i
        nbits = i.bit_length()
        shift = max(nbits - 4, 0)
        assert q == (i >> shift) << shift
        assert q <= i < q + (1 << shift) + (1 << shift)


def test_norm_byte_fits_uint8():
    arr = np.array([0, 1, 7, 8, 255, 10**6, 2**31 - 1])
    b = bm25.norm_byte_np(arr)
    assert b.dtype == np.uint8
    assert int(b.max()) <= 255


def test_length_table_monotone():
    lt = bm25.LENGTH_TABLE
    assert lt[0] == 0 and lt[1] == 1
    assert np.all(np.diff(lt[:232]) >= 0)


# --- three implementations agree --------------------------------------

def test_column_vs_numpy_quantization(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    lengths = [0, 1, 5, 8, 13, 100, 101, 128, 255, 256, 1000, 65535]
    df = spark.createDataFrame([(x,) for x in lengths], ["dl"])
    got = [
        r["q"]
        for r in df.select(
            bm25.quantized_dl_col(F.col("dl")).alias("q")
        ).collect()
    ]
    want = bm25.quantize_length_np(np.array(lengths)).tolist()
    assert got == want


def test_sql_vs_numpy_quantization():
    import duckdb

    lengths = [0, 1, 5, 8, 13, 100, 101, 128, 255, 256, 1000, 65535]
    q = bm25.quantized_dl_sql("dl")
    got = duckdb.sql(
        f"SELECT {q} AS q FROM (SELECT unnest({lengths}) AS dl)"
    ).fetchall()
    want = bm25.quantize_length_np(np.array(lengths)).tolist()
    assert [r[0] for r in got] == want


def test_score_col_vs_sql(spark):
    import duckdb
    from pyspark.sql import functions as F

    rows = [(1, 100, 3), (2, 128, 7), (5, 1000, 2), (1, 48, 1)]
    n_docs, avgdl = 500, 123.456
    df = spark.createDataFrame(rows, ["tf", "dl", "df"])
    got = [
        r["s"]
        for r in df.select(
            F.round(
                bm25.score_col(
                    F.col("tf"), F.col("dl"), F.col("df"),
                    F.lit(n_docs), F.lit(avgdl),
                ),
                6,
            ).alias("s")
        ).collect()
    ]
    sql = bm25.score_sql("tf", "dl", "df", str(n_docs), repr(avgdl))
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT round(" + sql + ", 6) FROM (SELECT "
            "unnest([1,2,5,1]) AS tf, unnest([100,128,1000,48]) AS dl, "
            "unnest([3,7,2,1]) AS df)"
        ).fetchall()
    ]
    assert got == pytest.approx(want, abs=1e-9)


# --- rank identity vs an independent oracle ----------------------------

def _oracle_bm25(corpus_tokens, query_terms, k1=1.2, b=0.75):
    """Independent float32 BM25 with quantized norms, computed the way
    Lucene's BM25Scorer does (per-term weight, norm cache)."""
    N = len(corpus_tokens)
    avgdl = sum(len(t) for t in corpus_tokens) / N
    scores = {}
    for term in query_terms:
        df = sum(1 for toks in corpus_tokens if term in toks)
        if df == 0:
            continue
        idf = np.float32(math.log(1 + (N - df + 0.5) / (df + 0.5)))
        for doc_id, toks in enumerate(corpus_tokens):
            tf = toks.count(term)
            if tf == 0:
                continue
            norm = bm25.norm_byte_np(np.array([len(toks)]))[0]
            s = bm25.score_np(
                np.array([tf]), np.array([norm]), df, N, avgdl, k1, b
            )[0]
            scores[doc_id] = scores.get(doc_id, np.float32(0)) + s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_engine_rank_identical_to_oracle(sample_index):
    from lucene_clj_spark.analysis import STANDARD
    from tests.conftest import SAMPLE_ROWS

    corpus = [STANDARD.tokens(r[5]) for r in SAMPLE_ROWS]
    for query in (["love"], ["antics"], ["love", "antics"], ["strong", "peace"]):
        want = _oracle_bm25(corpus, query)
        got = sample_index.search(
            {"bio": set(query)}, results_per_page=13, with_hit=False
        ).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in want], query
        # scores agree to float32 precision
        for r, (_, s) in zip(got, want):
            assert r["score"] == pytest.approx(float(s), rel=1e-5)
