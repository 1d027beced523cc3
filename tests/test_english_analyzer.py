"""The ``english`` analyzer kind — Lucene EnglishAnalyzer's pipeline
(StandardTokenizer -> lowercase -> possessive strip -> English stop
set -> PorterStemFilter) with a from-the-paper Porter stemmer
(stem.py; M.F. Porter 1980). Goldens below are the canonical
vocabulary/output pairs from the published algorithm."""

from __future__ import annotations

import pytest

from lucene_clj_spark import create_index
from lucene_clj_spark.analysis import ENGLISH_STOP_WORDS, Analyzer
from lucene_clj_spark.stem import porter_stem

PORTER_GOLDENS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed",
    "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop",
    "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "radically": "radic",
    "differently": "differ", "analogously": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formality": "formal",
    "sensitivity": "sensit", "sensibility": "sensibl",
    "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electricity": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun",
    "activate": "activ", "effective": "effect", "rate": "rate",
    "cease": "ceas", "controlling": "control", "rolling": "roll",
    "generalizations": "gener", "oscillators": "oscil",
}


def test_porter_goldens():
    for w, want in PORTER_GOLDENS.items():
        assert porter_stem(w) == want, w


def test_pipeline_possessive_stop_stem():
    an = Analyzer("english")
    assert an.stop_words == ENGLISH_STOP_WORDS
    assert an.tokens("The node's effective generalizations") == [
        "node", "effect", "gener",
    ]
    # custom stop set overrides the default
    an2 = Analyzer("english", stop_words=frozenset({"node"}))
    assert an2.tokens("the node runs") == ["the", "run"]
    # an EXPLICIT empty set disables stop removal entirely (Lucene
    # EnglishAnalyzer(CharArraySet.EMPTY_SET)) — only None means
    # "kind default"
    an3 = Analyzer("english", stop_words=frozenset())
    assert an3.tokens("the cats") == ["the", "cat"]


def test_tokens_series_matches_tokens(spark):
    import pandas as pd

    an = Analyzer("english")
    rows = ["The cats were motoring", "a node's conditional rollout"]
    got = an.tokens_series(pd.Series(rows)).tolist()
    assert got == [an.tokens(r) for r in rows]


def test_english_index_stemmed_recall(spark, tmp_path):
    from lucene_clj_spark.indexer import Index

    rows = [
        (0, "the generalizations of the oscillators were effective"),
        (1, "a generalized oscillator is effectively controlled"),
        (2, "unrelated words entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = create_index(
        spark, df, {"text": "text"}, id_column="doc_id",
        per_field_analyzers={"text": Analyzer("english")},
        index_type="disk", path=str(tmp_path / "idx"),
    )
    # morphological variants meet at the stem on BOTH sides
    got = {r["doc_id"] for r in idx.search(
        "generalizing", field_name="text", with_hit=False).collect()}
    assert got == {0, 1}
    # stop words never indexed: 'the' matches nothing
    assert idx.search("the", field_name="text",
                      with_hit=False).count() == 0
    # full analyzer config round-trips through the sidecar
    idx2 = Index.load(spark, idx.path)
    an = idx2.analyzers["text"]
    assert an.kind == "english"
    assert an.stop_words == ENGLISH_STOP_WORDS
    got2 = {r["doc_id"] for r in idx2.search(
        "generalizing", field_name="text", with_hit=False).collect()}
    assert got2 == {0, 1}
