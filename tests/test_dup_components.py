"""Duplicate clusters — connected components over the near-dup pair
graph (dedup.duplicate_components / resolve_duplicates): min-label
propagation with localCheckpoint-truncated lineage, edge-sized
shuffles per round, a convergence fence, and the keep/drop
resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.functions.dedup import (
    duplicate_components,
    resolve_duplicates,
)


def test_components_chain_clique_pair(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (11, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    comp = {r["doc_id"]: r["component"]
            for r in duplicate_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10,
                    20: 20, 21: 20}


def test_resolution_keeps_canonical(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (30, 31)], ["doc_a", "doc_b"])
    res = {r["doc_id"]: r["duplicate_of"]
           for r in resolve_duplicates(pairs).collect()}
    # canonical members (5, 30) get no row; everything else points at
    # its cluster minimum
    assert res == {9: 5, 7: 5, 31: 30}


def test_long_chain_converges_without_lineage_blowup(spark):
    # 30-hop chain: 30 propagation rounds — the case that stack-
    # overflowed Catalyst before lineage truncation (localCheckpoint)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["doc_a", "doc_b"])
    comp = {r["doc_id"]: r["component"]
            for r in duplicate_components(chain).collect()}
    assert set(comp.values()) == {0} and len(comp) == 31


def test_convergence_fence_raises(spark):
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["doc_a", "doc_b"])
    with pytest.raises(ValidationError, match="converge"):
        duplicate_components(chain, max_iterations=3)


def test_end_to_end_dedup_against_corpus(spark):
    # anti-joining the resolution against the corpus IS the dedup:
    # canonical members + isolated docs survive
    from lucene_clj_spark.functions.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, n=5, threshold=0.5,
                                max_shingle_df=10**9)
    res = resolve_duplicates(pairs)
    kept = docs.join(res, "doc_id", "left_anti")
    n, k, d = docs.count(), kept.count(), res.count()
    assert k == n - d and d > 0
    # every component representative survived
    reps = {r["duplicate_of"] for r in res.collect()}
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert reps <= kept_ids
