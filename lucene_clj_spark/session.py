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
