"""Document deletion — Lucene's tombstone model on parquet.

The reference surface stops at ``clear!`` (indexer.clj:68-77,
deleteAll); per-document deletes are the beyond-reference operator a
recrawling web pipeline needs (delete/update by url). Semantics pinned
here, all Lucene contracts:

- ``delete_documents`` masks immediately on EVERY query path
  (DataFrame plans get filtered docs/postings views; segment kernels
  mask candidates pre-heap) without touching a table;
- statistics stay STALE until purge — survivors keep their exact
  pre-delete scores, like Lucene's docFreq counting deleted docs until
  merge;
- ``purge_deletes`` (forceMergeDeletes) rewrites the tables with
  marker-exact stats arithmetic: post-purge scores are identical to a
  from-scratch build over the live docs, segments are re-encoded, the
  suggest table is rebuilt;
- re-adding a tombstoned id is refused until purge (user-keyed doc_ids
  would collide with their tombstoned postings); ``update_documents``
  is delete + purge + add in one call;
- crash-journal: a surviving ``_purge_pending.json`` is refused by
  load, append, and every segment operation.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lucene_clj_spark import create_index
from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.indexer import (
    PURGE_PENDING,
    TOMBSTONES_FILE,
    Index,
    _tombstone_view,
)

ROWS = [
    (0, "the app store sells apps", "u0"),
    (1, "the application store is busy", "u1"),
    (2, "app nothing here store", "u2"),
    (3, "store app the the", "u2"),
    (4, "unrelated words only", "u4"),
    (5, "a store b store", "u5"),
]


@pytest.fixture()
def idx(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text", "url"])
    return create_index(
        spark, df, {"text": "text", "url": "keyword"},
        id_column="doc_id",
    )


def _hits(out):
    return [(r["doc_id"], round(r["score"], 6)) for r in out.collect()]


def test_delete_masks_and_keeps_stale_scores(spark, idx):
    before = dict(_hits(idx.search(
        "store", field_name="text", with_hit=False,
        results_per_page=10)))
    idx.delete_documents([0, 5])
    after = dict(_hits(idx.search(
        "store", field_name="text", with_hit=False,
        results_per_page=10)))
    assert set(after) == set(before) - {0, 5}
    # Lucene live-docs contract: survivors keep their exact
    # pre-delete scores (df/avgdl still count the deleted docs)
    for d, s in after.items():
        assert s == before[d]


def test_delete_noop_and_idempotent(idx):
    assert idx.delete_documents([]) is idx
    idx.delete_documents([4])
    t = idx.tombstones
    idx.delete_documents([4])  # re-delete: no change
    assert idx.tombstones == t
    # deleting a nonexistent id is accepted (Lucene: delete by a
    # term that matches nothing)
    idx.delete_documents([999])
    assert 999 in idx.tombstones


def test_delete_by_terms_keyword(idx):
    # the recrawl pattern: delete by url key; u2 matches docs 2 AND 3
    idx.delete_by_terms("url", "u2", "u4")
    assert idx.tombstones == frozenset({2, 3, 4})
    got = _hits(idx.search("store", field_name="text",
                           with_hit=False, results_per_page=10))
    assert {d for d, _ in got} == {0, 1, 5}


def test_purge_matches_fresh_build(spark, idx):
    idx.delete_documents([0, 5])
    idx.purge_deletes()
    assert idx.tombstones == frozenset()
    live = [r for r in ROWS if r[0] not in (0, 5)]
    fresh = create_index(
        spark, spark.createDataFrame(live, ["doc_id", "text", "url"]),
        {"text": "text", "url": "keyword"}, id_column="doc_id",
    )
    for q in ("store", "app", "the"):
        a = _hits(idx.search(q, field_name="text", with_hit=False,
                             results_per_page=10))
        b = _hits(fresh.search(q, field_name="text", with_hit=False,
                               results_per_page=10))
        assert a == b, q
    # term dictionary df updated exactly
    df_store = idx.terms.filter(
        (F.col("field") == "text") & (F.col("term") == "store")
    ).collect()[0]["df"]
    assert df_store == 3  # docs 1, 2, 3


def test_purge_without_tombstones_is_noop(idx):
    docs_before = idx.docs
    assert idx.purge_deletes() is idx
    assert idx.docs is docs_before


def test_readd_refused_until_purge_then_update_works(spark, idx):
    idx.delete_documents([1])
    batch = spark.createDataFrame(
        [(1, "replacement text", "u1")], ["doc_id", "text", "url"]
    )
    with pytest.raises(ValidationError, match="TOMBSTONED"):
        idx.add_documents(batch)
    # update_documents = delete + purge + add
    idx.update_documents(spark.createDataFrame(
        [(1, "store store store", "u1"), (99, "new store doc", "u9")],
        ["doc_id", "text", "url"],
    ))
    assert idx.tombstones == frozenset()
    got = dict(_hits(idx.search("store", field_name="text",
                                with_hit=False, results_per_page=10)))
    assert 1 in got and 99 in got
    # doc 1's new content dominates (tf 3)
    assert got[1] == max(got.values())


def test_append_after_delete_keeps_mask(spark, idx):
    idx.delete_documents([0])
    idx.add_documents(spark.createDataFrame(
        [(50, "store fresh append", "u50")],
        ["doc_id", "text", "url"],
    ))
    got = {d for d, _ in _hits(idx.search(
        "store", field_name="text", with_hit=False,
        results_per_page=10))}
    assert 50 in got and 0 not in got
    # the full-table stash grew with the batch: purge keeps the
    # appended doc and drops only the tombstoned one
    idx.purge_deletes()
    assert idx.docs.filter(F.col("doc_id") == 50).count() == 1
    assert idx.docs.filter(F.col("doc_id") == 0).count() == 0


def test_truncate_clears_tombstones(idx):
    idx.delete_documents([0])
    idx.truncate()
    assert idx.tombstones == frozenset()
    assert not hasattr(idx, "_docs_all")


def test_tombstone_view_anti_join_branch(spark):
    # above TOMBSTONE_LITERAL_MAX the view switches to a broadcast
    # anti-join; correctness must be identical
    df = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long"
    )
    big = frozenset(range(5, 5 + 5000))
    out = sorted(r[0] for r in _tombstone_view(df, big).collect())
    assert out == [0, 1, 2, 3, 4]
    assert "Join" in _tombstone_view(df, big)._jdf.queryExecution() \
        .executedPlan().toString()


# --- disk lifecycle -----------------------------------------------------


@pytest.fixture()
def disk_idx(spark, tmp_path):
    from lucene_clj_spark.segments import build_segments

    df = spark.createDataFrame(ROWS, ["doc_id", "text", "url"])
    idx = create_index(
        spark, df, {"text": "text", "url": "keyword"},
        id_column="doc_id", index_type="disk",
        path=str(tmp_path / "idx"),
    )
    build_segments(idx, n_buckets=2, chunk_span=4)
    return idx


def test_disk_delete_persists_and_kernel_masks(spark, disk_idx):
    from lucene_clj_spark.wand import wand_topk

    before = _hits(wand_topk(disk_idx, "text", ["store", "app"], k=10))
    victims = [before[0][0]]
    disk_idx.delete_documents(victims)
    after = _hits(wand_topk(disk_idx, "text", ["store", "app"], k=10))
    assert all(d not in victims for d, _ in after)
    # survivors keep exact scores and relative order (stale stats)
    assert after == [x for x in before if x[0] not in victims]
    # reopen: the tombstone sidecar round-trips into both paths
    idx2 = Index.load(spark, disk_idx.path)
    assert idx2.tombstones == frozenset(victims)
    assert _hits(wand_topk(idx2, "text", ["store", "app"], k=10)) \
        == after
    assert all(
        d not in victims
        for d, _ in _hits(idx2.search(
            {"text": {"store", "app"}}, with_hit=False,
            results_per_page=10))
    )


def test_disk_purge_rebuilds_everything(spark, disk_idx):
    from lucene_clj_spark.wand import wand_topk

    disk_idx.delete_documents([0, 5])
    disk_idx.purge_deletes()
    root = disk_idx.path
    assert not os.path.exists(os.path.join(root, TOMBSTONES_FILE))
    assert not os.path.exists(os.path.join(root, PURGE_PENDING))
    live = [r for r in ROWS if r[0] not in (0, 5)]
    fresh = create_index(
        spark, spark.createDataFrame(live, ["doc_id", "text", "url"]),
        {"text": "text", "url": "keyword"}, id_column="doc_id",
    )
    a = _hits(wand_topk(disk_idx, "text", ["store", "app"], k=10))
    b = _hits(fresh.search({"text": {"store", "app"}},
                           with_hit=False, results_per_page=10))
    assert a == b
    # a cold reopen sees the purged state end-to-end
    idx2 = Index.load(spark, root)
    assert idx2.tombstones == frozenset()
    assert _hits(wand_topk(idx2, "text", ["store", "app"], k=10)) == a


def test_purge_pending_marker_fences_everything(spark, disk_idx):
    from lucene_clj_spark.segments import build_segments, merge_segments

    marker = os.path.join(disk_idx.path, PURGE_PENDING)
    with open(marker, "w") as f:
        f.write("{}")
    try:
        with pytest.raises(ValidationError, match="interrupted purge"):
            Index.load(spark, disk_idx.path)
        with pytest.raises(ValidationError, match="interrupted purge"):
            disk_idx.add_documents(disk_idx.spark.createDataFrame(
                [(77, "x", "u77")], ["doc_id", "text", "url"]))
        with pytest.raises(ValidationError, match="interrupted purge"):
            build_segments(disk_idx, resume=False)
        with pytest.raises(ValidationError, match="interrupted purge"):
            disk_idx.delete_documents([1])
    finally:
        os.remove(marker)


def test_delete_is_rank_stable_filtering(spark):
    # the stale-stats contract, stated as an invariant: for ANY
    # tombstone set, post-delete results == the full ranking with the
    # tombstoned rows REMOVED (never re-ranked) — across term, OR,
    # AND, phrase, and fuzzy shapes
    import random

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    idx = create_index(spark, docs, {"text": "text"},
                       id_column="doc_id", ignore_extra_columns=True)
    queries = [
        ("merge", {}),
        ({"text": {"merge", "window", "dup"}}, {}),
        (["merge", "window"], {}),
        ("merge window", {}),
        ({"text": "merg"}, {"fuzzy": True}),
    ]
    full = []
    for q, kw in queries:
        full.append([
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search(q, field_name="text", with_hit=False,
                                results_per_page=50, **kw).collect()
        ])
    rng = random.Random(7)
    victims = rng.sample(
        [r[0] for r in docs.select("doc_id").collect()], 60)
    idx.delete_documents(victims)
    vs = set(victims)
    for (q, kw), ranking in zip(queries, full):
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search(q, field_name="text", with_hit=False,
                                results_per_page=20, **kw).collect()
        ]
        want = [x for x in ranking if x[0] not in vs][:20]
        # the full ranking only reaches 50 deep; compare the overlap
        n = min(len(got), len(want))
        assert got[:n] == want[:n], q


def test_write_carries_tombstones(spark, idx, tmp_path):
    # Index.write persists the FULL tables plus the tombstone sidecar
    # (writing the filtered view would purge rows while leaving stats
    # stale — a state no Lucene index can be in); a reopen masks again
    idx.delete_documents([0, 5])
    target = str(tmp_path / "persisted")
    idx.write(target, n_buckets=2)
    assert os.path.exists(os.path.join(target, TOMBSTONES_FILE))
    idx2 = Index.load(spark, target)
    assert idx2.tombstones == frozenset({0, 5})
    assert idx2.all_docs().count() == len(ROWS)
    assert idx2.docs.count() == len(ROWS) - 2
    got = {d for d, _ in _hits(idx2.search(
        "store", field_name="text", with_hit=False,
        results_per_page=10))}
    assert got == {1, 2, 3}


def test_recreate_wipes_stale_state(spark, tmp_path):
    # re_create must WIPE the directory (the documented contract):
    # a stale tombstone sidecar would silently mask doc_ids of the
    # NEW corpus, and a stale purge journal would make the rebuilt
    # index refuse to load — the prescribed recovery for a crashed
    # purge is exactly this rebuild
    from lucene_clj_spark.segments import build_segments

    root = str(tmp_path / "idx")
    df = spark.createDataFrame(ROWS, ["doc_id", "text", "url"])
    idx = create_index(
        spark, df, {"text": "text", "url": "keyword"},
        id_column="doc_id", index_type="disk", path=root,
    )
    build_segments(idx, n_buckets=2, chunk_span=4)
    idx.delete_documents([1, 3])
    with open(os.path.join(root, PURGE_PENDING), "w") as f:
        f.write("{}")  # simulate a crashed purge
    idx2 = create_index(
        spark, df, {"text": "text", "url": "keyword"},
        id_column="doc_id", index_type="disk", path=root,
        re_create=True,
    )
    assert idx2.tombstones == frozenset()
    assert not os.path.exists(os.path.join(root, TOMBSTONES_FILE))
    assert not os.path.exists(os.path.join(root, PURGE_PENDING))
    # stale segments (built from the OLD corpus) are gone too — the
    # kernel route cannot serve pre-rebuild data
    assert not os.path.isdir(os.path.join(root, "manifests"))
    got = {d for d, _ in _hits(idx2.search(
        "store", field_name="text", with_hit=False,
        results_per_page=10))}
    assert got == {0, 1, 2, 3, 5}


def test_purge_rebuilds_suggest(spark, sample_docs):
    # Pinki is the only P* first name; deleting + purging her doc must
    # drop the completion (the suggest table is rebuilt from live docs)
    rows = [(i, *r) for i, r in enumerate(sample_docs.collect())]
    df = spark.createDataFrame(
        rows, ["doc_id"] + sample_docs.columns
    )
    specs = {
        "first_name": {"type": "text", "suggest": {}},
        "bio": "text",
    }
    idx = create_index(
        spark, df.select("doc_id", "first_name", "bio"), specs,
        id_column="doc_id",
    )
    assert idx.suggest_("first_name", "Pin").count() == 1
    pinki = df.filter(F.col("first_name") == "Pinki") \
        .collect()[0]["doc_id"]
    idx.delete_documents([pinki])
    idx.purge_deletes()
    assert idx.suggest_("first_name", "Pin").count() == 0
    assert idx.suggest_("first_name", "S").count() > 0
