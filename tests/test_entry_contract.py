"""Driver-contract guard: a fast subset of __spark_entry__ queries
checked against their DuckDB oracles inside pytest (the full sweep is
tools/check_oracle.py). Mirrors the driver's comparison: column names,
row count, order-insensitive values."""

import duckdb
import pytest

import __spark_entry__ as entry
from tools.check_oracle import TABLES, normalize

SF_DIR = "/root/testdata/sf0.01"

# fast, structurally-diverse subset (full sweep in tools/check_oracle.py)
SUBSET = [
    "term_topk",
    "bool_and_topk",
    "phrase_topk",
    "fuzzy_topk",
    "keyword_lang_topk",
    "suggest_prefix",
    "corpus_stats",
    "dedup_exact",
    "token_stats",
    "ann_cosine_topk",
    "events_value_exact",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = entry.queries()[name](spark, SF_DIR)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    rel = duck.sql(entry.oracle_sql()[name])
    d_cols, d_rows = rel.columns, rel.fetchall()
    sc, sr = normalize(s_rows, s_cols)
    dc, dr = normalize(d_rows, d_cols)
    assert sc == dc
    assert len(sr) == len(dr)
    assert sr == dr


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "doc_id" in df.columns and "score" in df.columns


def test_every_query_has_callable_and_most_have_oracles(spark):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 20
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle without query: {missing}"
    # rows-only exceptions are deliberate and few
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {"lang_id"}
