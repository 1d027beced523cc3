"""Parity pin: the mapInArrow build kernel must emit EXACTLY the same
postings row set as the original mapInPandas kernel.

The arrow kernel (_udfs.flat_postings_arrow_generator) replaces the
per-doc Python dict inversion with a batch-level factorize + stable
argsort and builds its output columns as arrow arrays (zero-copy list
offsets for positions). Row ORDER may differ (groups come out sorted
by (doc, term-code) with markers appended, instead of doc-interleaved)
— order is free downstream because everything consumes postings
through aggregates/sorts — but the SET of rows, including the
stats-marker rows (term=NULL, dl=token count) and per-group ascending
positions, must be identical. Exercised over the hard cases: nulls,
empty strings, multi-valued text, keyword fields (incl. multi-valued
with in-row duplicates), the non-ASCII regex analyzer path, and
repeated terms with interleaved positions."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from lucene_clj_spark._udfs import (
    POSTINGS_SCHEMA,
    flat_postings_arrow_generator,
    flat_postings_generator,
)
from lucene_clj_spark.analysis import Analyzer

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("body", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("lang", T.StringType()),
        T.StructField("cats", T.ArrayType(T.StringType())),
    ]
)

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog the fox",
     ["alpha beta", "beta gamma"], "en", ["a", "b", "a"]),
    (1, "", ["one two", None, "two three"], None, None),
    (2, None, None, "de", ["x"]),
    (3, "MIXED Case O'Neill's 3,141 домен 東京都 désolé",
     ["δ ε"], "el", ["y", None]),
    (4, "aaa aaa aaa bbb aaa", [], "en", []),
    (5, "solo", ["tag only"], "fr", ["z", "z"]),
]

TEXT_FIELDS = [("body", False), ("tags", True)]
KW_FIELDS = [("lang", False), ("cats", True)]


def _rowset(df):
    out = set()
    for r in df.collect():
        out.add(
            (
                r["field"],
                r["term"],
                r["doc_id"],
                r["tf"],
                r["dl"],
                tuple(r["positions"]) if r["positions"] is not None
                else None,
            )
        )
    return out


@pytest.mark.parametrize("kind", ["standard", "simple"])
def test_arrow_kernel_rowset_identical(spark, kind):
    an = Analyzer(kind=kind)
    docs = spark.createDataFrame(ROWS, DOCS_SCHEMA).repartition(3)
    pandas_emit = flat_postings_generator(
        TEXT_FIELDS, KW_FIELDS, {}, an
    )
    arrow_emit = flat_postings_arrow_generator(
        TEXT_FIELDS, KW_FIELDS, {}, an
    )
    sel = docs.select("doc_id", "body", "tags", "lang", "cats")
    old = _rowset(sel.mapInPandas(pandas_emit, POSTINGS_SCHEMA))
    new = _rowset(sel.mapInArrow(arrow_emit, POSTINGS_SCHEMA))
    assert new == old
    # sanity on the pin itself: markers present for every (text field,
    # doc) and positions ascending
    markers = [r for r in new if r[1] is None]
    assert len(markers) == 2 * len(ROWS)
    for r in new:
        if r[5] is not None:
            assert list(r[5]) == sorted(r[5])
            assert r[3] == len(r[5])  # tf == len(positions)


def test_arrow_kernel_rowset_identical_on_corpus(spark):
    """Same pin over real web text (sf0.001 documents)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang")
        .repartition(4)
    )
    an = Analyzer()
    tf = [("text", False)]
    kw = [("lang", False)]
    old = _rowset(
        docs.mapInPandas(
            flat_postings_generator(tf, kw, {}, an), POSTINGS_SCHEMA
        )
    )
    new = _rowset(
        docs.mapInArrow(
            flat_postings_arrow_generator(tf, kw, {}, an),
            POSTINGS_SCHEMA,
        )
    )
    assert new == old
    assert len(new) > 1000
