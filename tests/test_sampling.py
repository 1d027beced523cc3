"""Deterministic sampling + shuffle (functions/sampling.py) — the
training-mix operators. Decisions key on portable md5 bits, so the
same rows survive on every engine, run, and partition layout (Spark's
sampleBy draws per-partition RNG streams and is layout-dependent —
the property these ops exist to remove)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.functions.sampling import (
    SAMPLE_BUCKETS,
    deterministic_shuffle,
    sample_sql_predicate,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet")


def test_fractions_hold_and_strata_drop(docs):
    frac = {"en": 0.8, "de": 0.4, "fr": 1.0}
    s = stratified_sample(docs, "lang", frac, seed=7)
    got = {r["lang"]: r["c"] for r in
           s.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    tot = {r["lang"]: r["c"] for r in
           docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert set(got) == {"en", "de", "fr"}  # es/zh dropped
    assert got["fr"] == tot["fr"]  # fraction 1.0 keeps everything
    for k in ("en", "de"):
        # binomial tolerance on a few-hundred-row stratum
        assert abs(got[k] / tot[k] - frac[k]) < 0.15, (k, got, tot)


def test_sampling_is_layout_independent(docs):
    frac = {"en": 0.5, "zh": 0.5}
    a = sorted(r[0] for r in stratified_sample(
        docs, "lang", frac, seed=3).select("doc_id").collect())
    b = sorted(r[0] for r in stratified_sample(
        docs.repartition(13), "lang", frac, seed=3)
        .select("doc_id").collect())
    assert a == b and a


def test_sampling_matches_sql_predicate(spark, docs):
    import duckdb

    frac = {"en": 0.8, "de": 0.4, "fr": 1.0}
    s_ids = sorted(r[0] for r in stratified_sample(
        docs, "lang", frac, seed=7).select("doc_id").collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.01/documents.parquet'")
    pred = sample_sql_predicate("lang", "doc_id", frac, seed=7)
    d_ids = sorted(r[0] for r in con.execute(
        f"SELECT doc_id FROM documents WHERE {pred}").fetchall())
    assert s_ids == d_ids


def test_sampling_plan_is_shuffle_free(docs):
    plan = stratified_sample(
        docs, "lang", {"en": 0.5}, seed=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shuffle_deterministic_and_reseedable(docs):
    h1 = [r["doc_id"] for r in deterministic_shuffle(docs, seed=1)
          .orderBy("shuffle_key", "doc_id").limit(8).collect()]
    h1b = [r["doc_id"] for r in deterministic_shuffle(
        docs.repartition(9), seed=1)
        .orderBy("shuffle_key", "doc_id").limit(8).collect()]
    h2 = [r["doc_id"] for r in deterministic_shuffle(docs, seed=2)
          .orderBy("shuffle_key", "doc_id").limit(8).collect()]
    assert h1 == h1b  # layout-independent
    assert h1 != h2   # new seed = independent epoch order
    # row set preserved
    n = docs.count()
    assert deterministic_shuffle(docs, seed=5).count() == n


def test_validation(docs):
    with pytest.raises(ValidationError):
        stratified_sample(docs, "lang", {})
    with pytest.raises(ValidationError):
        stratified_sample(docs, "lang", {"en": 1.5})
    with pytest.raises(ValidationError):
        stratified_sample(docs, "lang", {"en": -0.1})
    assert SAMPLE_BUCKETS == 1 << 20
