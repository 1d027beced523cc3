"""Analyzer semantics — mirrors reference analyzers.clj behavior and
pins the per-row byte-identical-tokens invariant (BASELINE.json
input_hint)."""

import pandas as pd
import pytest

from lucene_clj_spark.analysis import (
    ENGLISH_STOP_WORDS,
    KEYWORD,
    SIMPLE,
    STANDARD,
    WHITESPACE,
    Analyzer,
    standard_analyzer,
)


def test_standard_basic():
    assert STANDARD.tokens("Hello World") == ["hello", "world"]


def test_standard_keeps_apostrophes_and_numbers():
    # UAX#29 WB6/7: MidNumLet/single-quote joins letters
    assert STANDARD.tokens("You'll enjoy his antics.") == [
        "you'll", "enjoy", "his", "antics",
    ]
    assert STANDARD.tokens("pi is 3.14, price 1,000") == [
        "pi", "is", "3.14", "price", "1,000",
    ]


def test_standard_default_has_no_stopwords():
    # reference analyzers.clj:16 passes an EMPTY stop set
    assert STANDARD.tokens("the quick and the dead") == [
        "the", "quick", "and", "the", "dead",
    ]


def test_standard_with_stopwords():
    an = standard_analyzer(ENGLISH_STOP_WORDS)
    assert an.tokens("the quick and the dead") == ["quick", "dead"]


def test_standard_splits_on_underscore_and_punct():
    assert STANDARD.tokens("foo_bar baz-qux") == ["foo", "bar", "baz", "qux"]


def test_letter_comma_splits_but_digit_comma_joins():
    assert STANDARD.tokens("a,b 1,2") == ["a", "b", "1,2"]


def test_cjk_han_single_char_tokens():
    assert STANDARD.tokens("日本語 test") == ["日", "本", "語", "test"]


def test_max_token_length_chunks():
    an = Analyzer("standard", max_token_length=5)
    assert an.tokens("abcdefghijk") == ["abcde", "fghij", "k"]


def test_simple_splits_at_non_letters():
    # reference doc/LuceneNotes.org:17 — split at non-letters
    assert SIMPLE.tokens("abc123def GHI") == ["abc", "def", "ghi"]


def test_keyword_verbatim():
    assert KEYWORD.tokens("Hello World!") == ["Hello World!"]


def test_whitespace():
    assert WHITESPACE.tokens(" a  b\tc ") == ["a", "b", "c"]


def test_none_and_empty():
    for an in (STANDARD, SIMPLE, WHITESPACE):
        assert an.tokens(None) == []
        assert an.tokens("") == []


def test_series_path_matches_scalar_path():
    texts = [
        "Hello World", "You'll enjoy", "a,b 1,2", "日本語 test", "", None,
        "the fast key order sort table scan",
    ]
    s = STANDARD.tokens_series(pd.Series(texts))
    for txt, got in zip(texts, s):
        assert list(got) == STANDARD.tokens(txt or "")


def test_column_jvm_path_matches_python_on_simple_text(spark):
    texts = ["the fast key order", "spark group query row", "a b  c", ""]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    from pyspark.sql import functions as F

    got = df.select(STANDARD.column("text").alias("t")).collect()
    for txt, row in zip(texts, got):
        assert list(row["t"]) == STANDARD.tokens(txt)


def test_udf_path_matches_python(spark):
    texts = ["Hello World", "You'll enjoy his antics.", "pi is 3.14"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = df.select(STANDARD.udf()("text").alias("t")).collect()
    for txt, row in zip(texts, got):
        assert list(row["t"]) == STANDARD.tokens(txt)


@pytest.mark.parametrize("kind", ["standard", "simple", "whitespace"])
def test_property_no_empty_tokens(kind):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    an = Analyzer(kind)

    @settings(max_examples=60, deadline=None)
    @given(st.text(max_size=80))
    def check(s):
        toks = an.tokens(s)
        assert all(t for t in toks)
        if kind == "standard":
            assert all(len(t) <= 255 for t in toks)
            assert all(t == t.lower() for t in toks)

    check()


def test_tokens_arrow_fast_matches_str_split():
    """The arrow fast path must be byte-identical to tokens_series on
    the rows it accepts — including arrow's empty-token-at-boundary
    behavior that Python's str.split() doesn't have."""
    import numpy as np
    import pyarrow as pa

    an = Analyzer("standard")
    rows = [
        "", " ", "   ", "a", " a", "a ", "  a  ", "a  b", "ab 9 c  ",
        "x" * 255, ("a " * 40).strip(), None,
    ]
    res = an.tokens_arrow_fast(pa.array(rows, type=pa.string()))
    assert res is not None
    flat, lens = res
    expected = [(r or "").split() for r in rows]
    assert list(lens) == [len(e) for e in expected]
    assert flat.to_pylist() == [t for e in expected for t in e]


def test_tokens_arrow_fast_property_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import pyarrow as pa

    an = Analyzer("standard")

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.text(alphabet="ab 01", max_size=40), max_size=20))
    def check(rows):
        res = an.tokens_arrow_fast(pa.array(rows, type=pa.string()))
        assert res is not None
        flat, lens = res
        expected = [r.split() for r in rows]
        assert list(lens) == [len(e) for e in expected]
        assert flat.to_pylist() == [t for e in expected for t in e]

    check()


def test_tokens_arrow_fast_rejects_rows_needing_full_analysis():
    import pyarrow as pa

    an = Analyzer("standard")
    # uppercase / punctuation / CJK / >255 alnum run -> full UAX#29 path
    for bad in ["Hello", "a.b", "中文", "x" * 256]:
        assert an.tokens_arrow_fast(pa.array(["ok", bad])) is None
    # non-standard kinds and configured analyzers never take it
    assert Analyzer("simple").tokens_arrow_fast(pa.array(["a"])) is None
    assert Analyzer("whitespace").tokens_arrow_fast(pa.array(["a"])) is None
    assert Analyzer(
        "standard", stop_words=frozenset({"a"})
    ).tokens_arrow_fast(pa.array(["a"])) is None
    assert Analyzer(
        "standard", max_token_length=10
    ).tokens_arrow_fast(pa.array(["a"])) is None
