"""SearchSession — pinned stable snapshot (reference session.clj:10-29).

The reference's session is one DirectoryReader snapshot shared by
searcher + suggester + stored-fields + deserialized field specs, so
repeated search/suggest calls see a single consistent view; it is
Closeable and reusable (contract_test.clj:153-157).

Spark analogue: materialize (cache + count) the index's DataFrames so
every query in the session reads one pinned, in-memory columnar copy —
an immutable snapshot regardless of later writes to the underlying
parquet. ``close()`` unpersists. Works as a context manager, mirroring
the reference's ``with-open`` usage (lucene.clj:42-45).

Pinning scope: the DataFrame execution path (and everything it feeds —
stored-field hits, suggest, stats) is fully pinned. The SEGMENT-KERNEL
path reads the compressed segment files per query, so within a session
it behaves like a near-real-time-refreshed Lucene reader: a concurrent
``add_documents`` delta becomes visible to kernel-routed queries
(scored with the session's pinned corpus stats), and a concurrent
``merge_segments`` is safe because the merge swaps a generation
POINTER and keeps the previous generation on disk as a grace window
(segments.py) — in-flight kernel queries never see a half-merged or
missing directory. Pass ``strategy="dataframe"`` per query for a
strictly frozen view of a mutating index.
"""

from __future__ import annotations

from lucene_clj_spark.indexer import Index


class SearchSession:
    def __init__(self, index: Index):
        src = index
        self.index = Index(
            spark=src.spark,
            specs=src.specs,
            analyzers=src.analyzers,
            docs=src.docs.cache(),
            postings=src.postings.cache(),
            terms=src.terms.cache(),
            stats=src.stats,
            suggest=src.suggest.cache() if src.suggest is not None else None,
            path=src.path,
            buckets=src.buckets,
        )
        # pin: force materialization now so later underlying-file changes
        # cannot leak into this session's view
        self.index.postings.count()
        self.index.docs.count()
        self._closed = False

    def search(self, query, **opts):
        return self.index.search(query, **opts)

    def suggest(self, field, prefix, **opts):
        return self.index.suggest_(field, prefix, **opts)

    def close(self) -> None:
        if not self._closed:
            for df in (
                self.index.docs,
                self.index.postings,
                self.index.terms,
                self.index.suggest,
            ):
                if df is not None:
                    df.unpersist()
            self._closed = True

    def __enter__(self) -> "SearchSession":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def open_session(index: Index) -> SearchSession:
    """Reference lucene.clj:26-30."""
    return SearchSession(index)
